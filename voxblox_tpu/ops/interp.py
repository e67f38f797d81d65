"""Trilinear interpolation + gradients over voxel layers.

Gather-based reformulation of the reference ``Interpolator<VoxelType>``
(voxblox interpolator/interpolator.h:15-105, interpolator_inl.h):

- 8-corner lookup around the query point with cross-block resolution
  (setIndexes, interpolator_inl.h:156-198) — here a plain vectorized hash
  gather over global voxel indices;
- trilinear weights via the Q-vector formulation (interpolator.h:56-63);
- gradients either analytically (exact derivative of the trilinear
  function — autodiff-consistent) or by central differences of interpolated
  values (reference getGradient semantics, interpolator_inl.h:46-75);
- nearest-neighbor fallback (getVoxel / getDistance(interp=false)).

All functions are vmappable/jittable; queries are float32 [Q,3].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer

# Corner offsets in x-fastest order matching trilinear weight construction.
_CORNERS = np.asarray(
    [
        [0, 0, 0],
        [1, 0, 0],
        [0, 1, 0],
        [1, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [0, 1, 1],
        [1, 1, 1],
    ],
    np.int32,
)


def _corner_setup(points, voxel_size):
    """Lower-corner voxel index + fractional position within the corner cell.

    The lower corner is the voxel whose *center* lies at or below the point
    on every axis (interpolator_inl.h:156-198): floor((p - 0.5*vox)/vox).
    """
    inv = 1.0 / voxel_size
    low = jnp.floor(points * inv - 0.5 + grid.EPS).astype(jnp.int32)
    low_center = (low.astype(jnp.float32) + 0.5) * voxel_size
    frac = (points - low_center) * inv  # in [0,1)
    return low, frac


def _trilinear_weights(frac):
    """[...,3] -> [...,8] weights (Q-vector, interpolator.h:56-63)."""
    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    return jnp.stack(
        [
            gx * gy * gz,
            fx * gy * gz,
            gx * fy * gz,
            fx * fy * gz,
            gx * gy * fz,
            fx * gy * fz,
            gx * fy * fz,
            fx * fy * fz,
        ],
        axis=-1,
    )


def _gather_corners(layer, channel: str, low):
    """Gather the 8 corner values + per-corner validity for queries [Q,3]."""
    corners = low[..., None, :] + _CORNERS  # [Q,8,3]
    vals, found = vlayer.get_voxels(layer, channel, corners)
    return vals, found, corners


def _corner_validity(layer, corners, found, min_weight: float):
    """Validity per corner: block present AND voxel observed.

    TSDF: weight > min_weight (utils/meshing_utils.h:11-36 semantics);
    ESDF: observed flag; occupancy: observed flag.
    """
    if layer.layer_type == "tsdf":
        w, _ = vlayer.get_voxels(layer, "weight", corners)
        return found & (w > min_weight)
    if layer.layer_type == "esdf":
        f, _ = vlayer.get_voxels(layer, "esdf_flags", corners, fill=0)
        return found & ((f.astype(jnp.uint8) & vlayer.ESDF_OBSERVED) != 0)
    if layer.layer_type == "occupancy":
        f, _ = vlayer.get_voxels(layer, "occ_observed", corners, fill=0)
        return found & (f.astype(jnp.uint8) != 0)
    return found


def _distance_channel(layer) -> str:
    return {"tsdf": "tsdf", "esdf": "esdf", "occupancy": "log_odds"}[
        layer.layer_type
    ]


def interpolate(layer, points, channel: str | None = None,
                min_weight: float = 1e-6):
    """Trilinear interpolation at world points [Q,3].

    Returns (values [Q], valid [Q]); valid requires all 8 corners observed
    (reference getDistance(interp=true), interpolator_inl.h:15-23).
    """
    channel = channel or _distance_channel(layer)
    low, frac = _corner_setup(points, layer.voxel_size)
    vals, found, corners = _gather_corners(layer, channel, low)
    ok = _corner_validity(layer, corners, found, min_weight)
    w = _trilinear_weights(frac)
    out = jnp.sum(w * vals, axis=-1)
    return out, jnp.all(ok, axis=-1)


def nearest(layer, points, channel: str | None = None, min_weight: float = 1e-6):
    """Nearest-voxel value (reference getDistance(interp=false))."""
    channel = channel or _distance_channel(layer)
    gvi = grid.point_to_grid_index(points, 1.0 / layer.voxel_size)
    vals, found = vlayer.get_voxels(layer, channel, gvi)
    ok = _corner_validity(layer, gvi, found, min_weight)
    return vals, ok


def interpolate_with_gradient(layer, points, channel: str | None = None,
                              min_weight: float = 1e-6):
    """Value + analytic trilinear gradient at world points [Q,3].

    The gradient is the exact spatial derivative of the trilinear
    interpolant (piecewise-linear per axis) — consistent with autodiff
    through ``interpolate``.
    Returns (values [Q], grads [Q,3], valid [Q]).
    """
    channel = channel or _distance_channel(layer)
    low, frac = _corner_setup(points, layer.voxel_size)
    vals, found, corners = _gather_corners(layer, channel, low)
    ok = _corner_validity(layer, corners, found, min_weight)
    w = _trilinear_weights(frac)
    out = jnp.sum(w * vals, axis=-1)

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    gx, gy, gz = 1.0 - fx, 1.0 - fy, 1.0 - fz
    inv = 1.0 / layer.voxel_size
    # d/dx: difference along x of the 4 yz-bilinear pairs.
    dx = (
        (vals[..., 1] - vals[..., 0]) * gy * gz
        + (vals[..., 3] - vals[..., 2]) * fy * gz
        + (vals[..., 5] - vals[..., 4]) * gy * fz
        + (vals[..., 7] - vals[..., 6]) * fy * fz
    ) * inv
    dy = (
        (vals[..., 2] - vals[..., 0]) * gx * gz
        + (vals[..., 3] - vals[..., 1]) * fx * gz
        + (vals[..., 6] - vals[..., 4]) * gx * fz
        + (vals[..., 7] - vals[..., 5]) * fx * fz
    ) * inv
    dz = (
        (vals[..., 4] - vals[..., 0]) * gx * gy
        + (vals[..., 5] - vals[..., 1]) * fx * gy
        + (vals[..., 6] - vals[..., 2]) * gx * fy
        + (vals[..., 7] - vals[..., 3]) * fx * fy
    ) * inv
    grad = jnp.stack([dx, dy, dz], axis=-1)
    return out, grad, jnp.all(ok, axis=-1)


def gradient_central(layer, points, channel: str | None = None,
                     min_weight: float = 1e-6):
    """Reference-style gradient: central differences of *interpolated*
    values at +-voxel_size along each axis (interpolator_inl.h:46-75).
    Returns (grads [Q,3], valid [Q])."""
    channel = channel or _distance_channel(layer)
    h = layer.voxel_size
    grads = []
    valid = None
    for ax in range(3):
        off = jnp.zeros((3,), jnp.float32).at[ax].set(h)
        up, vu = interpolate(layer, points + off, channel, min_weight)
        dn, vd = interpolate(layer, points - off, channel, min_weight)
        grads.append((up - dn) / (2.0 * h))
        v = vu & vd
        valid = v if valid is None else (valid & v)
    return jnp.stack(grads, axis=-1), valid


def adaptive_distance_and_gradient(layer, points, channel: str | None = None,
                                   min_weight: float = 1e-6):
    """Adaptive distance + gradient with one-sided fallbacks
    (reference getAdaptiveDistanceAndGradient, interpolator_inl.h:77-154).

    Degrades gracefully where the 8-corner stencil is incomplete (map
    borders, partially observed regions) instead of returning invalid:

    1. nearest-voxel distance must be valid (else the query fails);
    2. trilinear distance + central-difference-of-interpolants gradient
       when all stencils are complete;
    3. otherwise a per-axis nearest-mode finite difference: central
       where both sides are observed, one-sided where only one is,
       invalid only when an axis has NO observed neighbor;
    4. a missing trilinear distance is reconstructed from the gradient:
       nearest + (pos - voxel_center) . grad.

    Returns (distances [Q], grads [Q,3], valid [Q]). Vectorized — the
    reference's per-point early exits become masked selects.
    """
    channel = channel or _distance_channel(layer)
    h = layer.voxel_size
    nn, nn_ok = nearest(layer, points, channel, min_weight)
    interp_d, interp_ok = interpolate(layer, points, channel, min_weight)
    grad_i, grad_i_ok = gradient_central(layer, points, channel, min_weight)

    # Fallback: per-axis finite differences of NEAREST-mode values
    # (interpolator_inl.h:115-140).
    g_fb = []
    fb_ok = nn_ok
    for ax in range(3):
        off = jnp.zeros((3,), jnp.float32).at[ax].set(h)
        right, r_ok = nearest(layer, points + off, channel, min_weight)
        left, l_ok = nearest(layer, points - off, channel, min_weight)
        g_ax = jnp.where(
            l_ok & r_ok,
            (right - left) / (2.0 * h),
            jnp.where(
                l_ok, (nn - left) / h,
                jnp.where(r_ok, (right - nn) / h, 0.0),
            ),
        )
        fb_ok = fb_ok & (l_ok | r_ok)
        g_fb.append(g_ax)
    g_fb = jnp.stack(g_fb, axis=-1)

    use_interp_grad = interp_ok & grad_i_ok
    grad = jnp.where(use_interp_grad[..., None], grad_i, g_fb)

    # Reconstruct the distance from the gradient when the trilinear
    # stencil was incomplete (interpolator_inl.h:142-151).
    gvi = grid.point_to_grid_index(points, 1.0 / h)
    vox_center = (gvi.astype(jnp.float32) + 0.5) * h
    est = nn + jnp.sum((points - vox_center) * grad, axis=-1)
    dist = jnp.where(interp_ok, interp_d, est)
    valid = nn_ok & (use_interp_grad | fb_ok)
    return dist, grad, valid


def interpolate_trilinear_color(layer, points):
    """Trilinear color (tsdf layers); returns (rgb [Q,3], valid [Q])."""
    low, frac = _corner_setup(points, layer.voxel_size)
    corners = low[..., None, :] + _CORNERS
    vals, found = vlayer.get_voxels(layer, "color", corners)
    w = _trilinear_weights(frac)
    out = jnp.sum(w[..., None] * vals, axis=-2)
    # found has a trailing broadcast dim for the color channels.
    return out, jnp.all(found[..., 0], axis=-1)

"""ICP scan-to-map alignment against the TSDF.

Equivalent of the reference ICP (voxblox alignment/icp.{h,cc}): instead of
kd-tree correspondences, each point's match is synthesized from the TSDF
field:  target = p - d(p) * normalize(grad d(p))  (icp.cc:140-146), with
the nearest-voxel distance corrected along the gradient
(icp.cc:137-145). Transforms come from weighted Kabsch over matched pairs
(Umeyama, 2-dof yaw-only by default or full 3-dof,
icp.h:139-173 / icp.cc:20-75), blended against the running prior with the
information-vector weighting  delta <- exp(w .* log(delta)),
w = est_info / (base_info + est_info)  (icp.cc:186-215).

Mini-batches are processed *sequentially* via lax.scan (the sequential
information accumulation is the algorithm; each batch's heavy work — the
field lookups — is vectorized). The reference's thread race on the shared
pose is replaced by a deterministic batch order.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import grid
from ..core.config import IcpConfig
from ..utils import lie
from . import interp


class IcpResult(NamedTuple):
    R: jax.Array  # [3,3] refined rotation R_G_C
    t: jax.Array  # [3]
    num_updates: jax.Array  # int32[] batches that produced an update


def _rotation_from_matched(src_d, tgt_d, w, refine_roll_pitch: bool):
    """Weighted Kabsch on demeaned points (icp.cc:20-75).

    2-dof mode constrains rotation to yaw (about +z), as
    getRotationFromMatchedPoints<2> does.
    """
    if refine_roll_pitch:
        H = (src_d * w[:, None]).T @ tgt_d
        u, s, vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(vt.T @ u.T))
        D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(d)
        return vt.T @ D @ u.T
    # Yaw only: 2D cross-covariance in the xy plane.
    sxy = src_d[:, :2]
    txy = tgt_d[:, :2]
    a = jnp.sum(w * (sxy[:, 0] * txy[:, 1] - sxy[:, 1] * txy[:, 0]))
    b = jnp.sum(w * (sxy[:, 0] * txy[:, 0] + sxy[:, 1] * txy[:, 1]))
    yaw = jnp.arctan2(a, b)
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.asarray([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _match_batch(layer, pts_sensor, R, t, min_grad_mag: float = 0.1):
    """matchPoints (icp.cc:103-150): nearest-voxel distance + central-diff
    gradient, gradient-corrected to the query point."""
    p_tsdf = pts_sensor @ R.T + t
    d_nn, valid_d = interp.nearest(layer, p_tsdf)
    g, valid_g = interp.gradient_central(layer, p_tsdf)
    gnorm2 = jnp.sum(g * g, axis=-1)
    ok = valid_d & valid_g & (gnorm2 > min_grad_mag)
    ghat = g / jnp.sqrt(jnp.maximum(gnorm2, 1e-12))[:, None]
    voxel_center = grid.grid_index_to_center_point(
        grid.point_to_grid_index(p_tsdf, 1.0 / layer.voxel_size),
        layer.voxel_size,
    )
    dist = d_nn + jnp.sum(ghat * (p_tsdf - voxel_center), axis=-1)
    tgt = p_tsdf - dist[:, None] * ghat
    # Information vector (addNormalizedPointInfo, icp.cc:78-100).
    rel = p_tsdf - t
    nn = ghat * ghat
    info_t = 2.0 * jnp.sum(jnp.where(ok[:, None], nn, 0.0), axis=0)
    rr = rel * rel
    info_r = 2.0 * jnp.stack(
        [
            jnp.sum(jnp.where(ok, rr[:, 1] * nn[:, 2] + rr[:, 2] * nn[:, 1], 0.0)),
            jnp.sum(jnp.where(ok, rr[:, 0] * nn[:, 2] + rr[:, 2] * nn[:, 0], 0.0)),
            jnp.sum(jnp.where(ok, rr[:, 0] * nn[:, 1] + rr[:, 1] * nn[:, 0], 0.0)),
        ]
    )
    info = jnp.concatenate([info_t, info_r]) + grid.FLOAT_EPS
    return p_tsdf, tgt, ok, info


@partial(jax.jit, static_argnames=("cfg",))
def run_icp(layer, points_C, T_G_C_init, cfg: IcpConfig = IcpConfig()):
    """Refine T_G_C against the TSDF layer. points_C f32[N,3] (padded rows
    with zeros/NaN are dropped by the field-validity mask).

    Returns IcpResult. Mirrors ICP::runICP with deterministic batch order;
    the initial prior information is inital_*_weighting * num_points
    (icp.cc:232-239).
    """
    if isinstance(T_G_C_init, tuple):
        R0, t0 = T_G_C_init
    else:
        R0, t0 = T_G_C_init[:3, :3], T_G_C_init[:3, 3]
    n = points_C.shape[0]
    bs = cfg.mini_batch_size
    n_batches = max(1, int(n * cfg.subsample_keep_ratio) // bs)

    # Deterministic shuffle (the reference shuffles with a caller seed,
    # icp.cc:230-234) so each mini batch sees spatially diverse points.
    perm = jax.random.permutation(jax.random.PRNGKey(0), n)
    points_C = points_C[perm]

    base_info = jnp.concatenate(
        [
            jnp.full((3,), cfg.inital_translation_weighting),
            jnp.full((3,), cfg.inital_rotation_weighting),
        ]
    )

    def step(carry, start):
        R, t, base_info, n_upd = carry
        pts = jax.lax.dynamic_slice(points_C, (start, 0), (bs, 3))
        src, tgt, ok, est_info = _match_batch(layer, pts, R, t)
        w = ok.astype(jnp.float32)
        n_ok = jnp.sum(w)
        enough = n_ok >= jnp.maximum(3.0, bs * cfg.min_match_ratio)
        wsum = jnp.maximum(n_ok, 1.0)
        src_c = jnp.sum(src * w[:, None], 0) / wsum
        tgt_c = jnp.sum(tgt * w[:, None], 0) / wsum
        src_d = jnp.where(ok[:, None], src - src_c, 0.0)
        tgt_d = jnp.where(ok[:, None], tgt - tgt_c, 0.0)
        dR = _rotation_from_matched(src_d, tgt_d, w, cfg.refine_roll_pitch)
        dt = tgt_c - dR @ src_c
        # delta in the *current sensor pose* frame (icp.cc:199-203).
        Tcur = (R, t)
        delta_world = (dR, dt)
        delta = lie.compose(
            lie.inverse(Tcur), lie.compose(delta_world, Tcur)
        )
        xi = lie.se3_log(*delta)
        weight = est_info / (base_info + est_info)
        dRw, dtw = lie.se3_exp(weight * xi)
        R_new, t_new = lie.compose(Tcur, (dRw, dtw))
        R = jnp.where(enough, R_new, R)
        t = jnp.where(enough, t_new, t)
        base_info = jnp.where(enough, base_info + est_info, base_info)
        n_upd = n_upd + enough.astype(jnp.int32)
        return (R, t, base_info, n_upd), None

    starts = jnp.arange(n_batches) * bs
    (R, t, _, n_upd), _ = jax.lax.scan(step, (R0, t0, base_info, jnp.int32(0)),
                                       starts)
    return IcpResult(R=R, t=t, num_updates=n_upd)

"""Planning utilities: sphere marking + robot-position clearing.

Equivalent of the reference utils/planning_utils{.h,_inl.h} and
EsdfIntegrator::addNewRobotPosition (esdf_integrator.cc:20-92):

- ``sphere_voxel_mask``: per-pool-voxel mask of a world-space sphere after
  allocating its covering blocks;
- ``fill_sphere`` / ``clear_sphere``: hallucinated occupied/free voxel
  edits (planning_utils fillSphereAroundPoint / clearSphereAroundPoint);
- ``add_new_robot_position``: clear-sphere (unknown -> free hallucinated)
  + occupied crust sphere (unknown -> occupied hallucinated), marking
  blocks ESDF-dirty so the next sweep propagates;
- ``map_bounds``: block-granular map extent.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from ..core.config import EsdfIntegratorConfig
from ..ops.esdf import FIX, HALL, OBS


def _allocate_sphere(layer, center, radius):
    """Allocate all blocks intersecting the sphere; returns layer."""
    bs = layer.block_size
    r_blocks = int(np.ceil(radius / bs)) + 1
    offs = np.stack(
        np.meshgrid(*([np.arange(-r_blocks, r_blocks + 1)] * 3),
                    indexing="ij"), -1
    ).reshape(-1, 3)
    center_block = np.floor(np.asarray(center) / bs).astype(np.int32)
    cand = jnp.asarray(center_block[None] + offs, jnp.int32)
    # Keep blocks whose nearest point to center is within radius.
    lo = cand.astype(jnp.float32) * bs
    hi = lo + bs
    nearest = jnp.clip(jnp.asarray(center, jnp.float32), lo, hi)
    keep = jnp.linalg.norm(nearest - jnp.asarray(center), axis=-1) <= radius
    layer, overflow = vlayer.allocate_blocks(layer, cand, keep)
    return layer, overflow


def sphere_voxel_mask(layer, center, radius):
    """bool[max_blocks, vpb] (flat voxel order) of voxels whose center is
    in the sphere."""
    v = layer.vps
    lin = jnp.arange(layer.voxels_per_block)
    local = grid.linear_to_local(lin, v)  # [vpb, 3] in (x, y, z)
    centers = (
        layer.block_ijk[:, None, :] * v + local[None]
    ).astype(jnp.float32)
    centers = (centers + 0.5) * layer.voxel_size
    dist = jnp.linalg.norm(centers - jnp.asarray(center, jnp.float32), axis=-1)
    return (dist <= radius) & layer.active_mask()[:, None]


def fill_sphere(layer, center, radius, max_distance_m):
    """Mark a sphere occupied: distance = -max_distance_m, hallucinated
    (planning_utils_inl.h fillSphereAroundPoint semantics, esdf layers)."""
    layer, overflow = _allocate_sphere(layer, center, radius)
    m = sphere_voxel_mask(layer, center, radius)
    ch = dict(layer.channels)
    ch["esdf"] = jnp.where(m, -abs(max_distance_m), ch["esdf"])
    ch["esdf_flags"] = jnp.where(
        m, (OBS | HALL | FIX), ch["esdf_flags"]
    ).astype(jnp.uint8)
    layer = dataclasses.replace(layer, channels=ch)
    rows = jnp.arange(layer.max_blocks)
    touched = jnp.any(m, axis=1)
    return vlayer.mark_dirty(layer, rows, touched, vlayer.DIRTY_ALL), overflow


def clear_sphere(layer, center, radius, max_distance_m):
    """Mark a sphere free: distance = +max_distance_m, hallucinated."""
    layer, overflow = _allocate_sphere(layer, center, radius)
    m = sphere_voxel_mask(layer, center, radius)
    ch = dict(layer.channels)
    ch["esdf"] = jnp.where(m, abs(max_distance_m), ch["esdf"])
    ch["esdf_flags"] = jnp.where(m, (OBS | HALL), ch["esdf_flags"]).astype(
        jnp.uint8
    )
    layer = dataclasses.replace(layer, channels=ch)
    rows = jnp.arange(layer.max_blocks)
    touched = jnp.any(m, axis=1)
    return vlayer.mark_dirty(layer, rows, touched, vlayer.DIRTY_ALL), overflow


def add_new_robot_position(
    esdf_layer, position, cfg: EsdfIntegratorConfig
):
    """Robot-position prior (esdf_integrator.cc:20-92): unknown voxels in
    the clear sphere become free hallucinated (+default distance); unknown
    voxels in the larger occupied sphere become occupied hallucinated
    (-default distance). Observed voxels are untouched."""
    layer, ovf1 = _allocate_sphere(
        esdf_layer, position, cfg.occupied_sphere_radius
    )
    flags = layer.channels["esdf_flags"]
    observed = (flags & OBS) != 0
    hall = (flags & HALL) != 0

    clear_m = sphere_voxel_mask(layer, position, cfg.clear_sphere_radius)
    occ_m = sphere_voxel_mask(layer, position, cfg.occupied_sphere_radius)
    clearable = clear_m & (~observed | hall)
    occupiable = occ_m & ~observed & ~clearable

    d = layer.channels["esdf"]
    d = jnp.where(clearable, cfg.default_distance_m, d)
    d = jnp.where(occupiable, -cfg.default_distance_m, d)
    new_flags = jnp.where(
        clearable | occupiable, (OBS | HALL), flags
    ).astype(jnp.uint8)
    ch = dict(layer.channels)
    ch["esdf"] = d
    ch["esdf_flags"] = new_flags
    layer = dataclasses.replace(layer, channels=ch)
    rows = jnp.arange(layer.max_blocks)
    touched = jnp.any(clearable | occupiable, axis=1)
    return vlayer.mark_dirty(layer, rows, touched, vlayer.DIRTY_ALL), ovf1


def map_bounds(layer):
    """(lower, upper) world bounds of allocated blocks
    (computeMapBoundsFromLayer)."""
    active = np.asarray(layer.active_mask())
    if not active.any():
        return np.zeros(3), np.zeros(3)
    bijk = np.asarray(layer.block_ijk)[active]
    lo = bijk.min(0) * layer.block_size
    hi = (bijk.max(0) + 1) * layer.block_size
    return lo, hi

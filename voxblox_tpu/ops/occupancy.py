"""Occupancy (log-odds) integration + occupancy -> ESDF.

Equivalents of the reference OccupancyIntegrator
(voxblox integrator/occupancy_integrator.h:21-200, Octomap-style) and
EsdfOccIntegrator (integrator/esdf_occ_integrator.{h,cc}):

- per scan, rays mark every traversed voxel *free* and the endpoint voxel
  *occupied* (rays beyond max range clear up to max_ray_length); each cell
  is updated AT MOST ONCE per scan and occupied wins over free
  (occupancy_integrator.h:131-140) — realized here with scatter-OR masks
  over the pool instead of the reference's per-scan hash sets;
- the log-odds update adds logodds(p_hit)/logodds(p_miss) with clamping to
  [logodds(th_min), logodds(th_max)] (occupancy_integrator.h:60-76);
- occupancy -> ESDF: occupied (log_odds > 0) voxels seed distance 0 fixed,
  other observed voxels start at default_distance, then the shared
  parallel lower sweep runs (esdf_occ_integrator.cc:40-120; batch only,
  like the reference).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from ..core.config import EsdfIntegratorConfig, OccupancyIntegratorConfig
from . import raycast
from .esdf import lower_sweep, OBS, FIX
from .tsdf import allocate_for_rays, transform_points


@partial(jax.jit, static_argnames=("cfg",))
def integrate_pointcloud(
    layer: vlayer.VoxelLayer,
    T_G_C,
    points_C,
    cfg: OccupancyIntegratorConfig,
):
    """Integrate one posed scan into an occupancy layer.

    Returns (layer, overflowed).
    """
    points_G, origin = transform_points(T_G_C, points_C)
    norm = jnp.linalg.norm(points_C, axis=-1)
    finite = jnp.all(jnp.isfinite(points_C), axis=-1)
    valid = finite & (norm >= cfg.min_ray_length_m)
    clearing = valid & (norm > cfg.max_ray_length_m)

    delta = points_G - origin
    unit = delta / jnp.maximum(
        jnp.linalg.norm(delta, axis=-1, keepdims=True), grid.FLOAT_EPS
    )
    end_G = jnp.where(
        clearing[:, None], origin + cfg.max_ray_length_m * unit, points_G
    )

    inv = 1.0 / layer.voxel_size
    start_scaled = jnp.broadcast_to(origin, end_G.shape) * inv
    end_scaled = end_G * inv
    si = grid.scaled_point_to_grid_index(start_scaled)
    ei = grid.scaled_point_to_grid_index(end_scaled)
    num_steps = jnp.sum(jnp.abs(ei - si), axis=-1).astype(jnp.int32)
    setup = raycast.RaySetup(start_scaled, end_scaled, num_steps)

    max_steps = cfg.max_steps or raycast.max_steps_hint(
        cfg.max_ray_length_m, 0.0, layer.voxel_size, True
    )
    layer, overflowed = allocate_for_rays(layer, setup, valid, max_steps)

    voxels, mask = raycast.cast_rays(setup, max_steps, valid)
    step_idx = jnp.arange(mask.shape[0], dtype=jnp.int32)[:, None]
    is_last = step_idx == setup.num_steps[None, :]
    # Rays of <= 2 voxels don't update (occupancy_integrator.h:119-121).
    long_enough = (setup.num_steps + 1 > 2)[None, :]
    occupied_mark = mask & is_last & ~clearing[None, :] & long_enough
    free_mark = mask & ~occupied_mark & long_enough

    n_flat = layer.max_blocks * layer.voxels_per_block
    flat, found = vlayer.global_voxel_to_flat(layer, voxels)
    occ_idx = jnp.where(occupied_mark & found, flat, n_flat).reshape(-1)
    free_idx = jnp.where(free_mark & found, flat, n_flat).reshape(-1)
    occ_mask = jnp.zeros((n_flat,), bool).at[occ_idx].set(True, mode="drop")
    free_mask = jnp.zeros((n_flat,), bool).at[free_idx].set(True, mode="drop")
    free_mask = free_mask & ~occ_mask  # occupied wins (h:131-137)

    prob_hit_log = float(np.log(cfg.probability_hit / (1 - cfg.probability_hit)))
    prob_miss_log = float(
        np.log(cfg.probability_miss / (1 - cfg.probability_miss))
    )
    clamp_min = float(np.log(cfg.threshold_min / (1 - cfg.threshold_min)))
    clamp_max = float(np.log(cfg.threshold_max / (1 - cfg.threshold_max)))

    lo = layer.channels["log_odds"].reshape(-1)
    obs = layer.channels["occ_observed"].reshape(-1)
    update = jnp.where(occ_mask, prob_hit_log,
                       jnp.where(free_mask, prob_miss_log, 0.0))
    touched = occ_mask | free_mask
    new_lo = jnp.clip(lo + update, clamp_min, clamp_max)
    # Reference skips updates already saturated in the update direction
    # (h:64-71) — equivalent to the clamp here.
    lo = jnp.where(touched, new_lo, lo)
    obs = jnp.where(touched, np.uint8(1), obs)

    ch = dict(layer.channels)
    ch["log_odds"] = lo.reshape(ch["log_odds"].shape)
    ch["occ_observed"] = obs.reshape(ch["occ_observed"].shape)
    layer = dataclasses.replace(layer, channels=ch)

    # Dirty-mark touched blocks.
    slot = jnp.where(
        (occupied_mark | free_mark) & found,
        flat // layer.voxels_per_block,
        layer.max_blocks,
    )
    flags = layer.block_flags.at[slot.reshape(-1)].set(
        vlayer.ACTIVE | vlayer.DIRTY_ALL, mode="drop"
    )
    return dataclasses.replace(layer, block_flags=flags), overflowed


@partial(jax.jit, static_argnames=("cfg",))
def esdf_from_occupancy_batch(
    esdf_layer: vlayer.VoxelLayer,
    occ_layer: vlayer.VoxelLayer,
    cfg: EsdfIntegratorConfig,
):
    """Batch ESDF from an occupancy layer (esdf_occ_integrator.cc:19-120):
    occupied -> 0 fixed; observed free -> +default; lower sweep."""
    ch = dict(esdf_layer.channels)
    ch["esdf"] = jnp.zeros_like(ch["esdf"])
    ch["esdf_flags"] = jnp.zeros_like(ch["esdf_flags"])
    ch["parent"] = jnp.zeros_like(ch["parent"])
    esdf_layer = dataclasses.replace(esdf_layer, channels=ch)

    rows_mask = occ_layer.active_mask()
    esdf_layer, overflow = vlayer.allocate_blocks(
        esdf_layer, occ_layer.block_ijk, rows_mask
    )

    occ_slot = vlayer.lookup_blocks(occ_layer, esdf_layer.block_ijk)
    sel = esdf_layer.active_mask() & (occ_slot >= 0)
    safe = jnp.where(sel, occ_slot, 0)
    vpb = esdf_layer.voxels_per_block
    mbe = esdf_layer.max_blocks
    lo = occ_layer.channels["log_odds"].reshape(-1, vpb)[safe]
    obs = occ_layer.channels["occ_observed"].reshape(-1, vpb)[safe] != 0
    obs = obs & sel[:, None]
    occupied = obs & (lo > 0.0)

    d = jnp.where(occupied, 0.0, cfg.default_distance_m)
    d = jnp.where(obs, d, 0.0)
    flags = jnp.where(
        obs, OBS | jnp.where(occupied, FIX, np.uint8(0)).astype(jnp.uint8),
        np.uint8(0),
    ).astype(jnp.uint8)

    ch = dict(esdf_layer.channels)
    ch["esdf"] = d.reshape(ch["esdf"].shape)
    ch["esdf_flags"] = flags.reshape(ch["esdf_flags"].shape)
    esdf_layer = dataclasses.replace(esdf_layer, channels=ch)

    esdf_layer, iters, region_ovf, _ = lower_sweep(esdf_layer, cfg)
    return esdf_layer, overflow | region_ovf, iters


def occupancy_probability(layer: vlayer.VoxelLayer):
    """Per-voxel occupancy probability [max_blocks, vpb] (flat order)."""
    return grid.probability_from_log_odds(layer.channels["log_odds"])

"""Intensity (thermal) integration onto the TSDF surface.

Equivalent of the reference IntensityIntegrator
(voxblox integrator/intensity_integrator.{h,cc}): sphere-trace bearing
vectors to the TSDF surface, splat the intensity into the intensity layer
at the intersection voxel with a running weighted mean (weight += 1 capped
at max_weight = 100), and fill *unobserved* voxels within
``intensity_prop_voxel_radius`` voxels along the ray with the same value.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from .render import surface_distance_along_rays


@partial(
    jax.jit,
    static_argnames=("max_distance", "max_weight", "prop_voxel_radius"),
)
def add_intensity_bearing_vectors(
    intensity_layer: vlayer.VoxelLayer,
    tsdf_layer: vlayer.VoxelLayer,
    origin,
    bearing_vectors,
    intensities,
    max_distance: float = 30.0,
    max_weight: float = 100.0,
    prop_voxel_radius: int = 2,
):
    """Returns (intensity_layer, hits).

    origin f32[3]; bearing_vectors f32[R,3]; intensities f32[R].
    """
    origins = jnp.broadcast_to(origin, bearing_vectors.shape)
    t, hit = surface_distance_along_rays(
        tsdf_layer, origins, bearing_vectors, max_distance
    )
    dirs = bearing_vectors / jnp.linalg.norm(
        bearing_vectors, axis=-1, keepdims=True
    )
    surf = origins + t[:, None] * dirs
    vs = intensity_layer.voxel_size

    # Allocate blocks at the splat sites (+ the along-ray neighborhood).
    offsets = jnp.arange(
        -prop_voxel_radius, prop_voxel_radius + 1, dtype=jnp.float32
    )
    probe = surf[None, :, :] + offsets[:, None, None] * vs * dirs[None, :, :]
    probe_blocks = grid.point_to_grid_index(
        probe, 1.0 / intensity_layer.block_size
    ).reshape(-1, 3)
    probe_valid = jnp.broadcast_to(hit[None, :], probe.shape[:2]).reshape(-1)
    intensity_layer, _ = vlayer.allocate_blocks(
        intensity_layer, probe_blocks, probe_valid
    )

    n_flat = intensity_layer.max_blocks * intensity_layer.voxels_per_block
    gvi = grid.point_to_grid_index(surf, 1.0 / vs)
    flat, found = vlayer.global_voxel_to_flat(intensity_layer, gvi)
    ok = hit & found
    idx = jnp.where(ok, flat, n_flat)

    ival = intensity_layer.channels["intensity"].reshape(-1)
    wval = intensity_layer.channels["intensity_weight"].reshape(-1)
    d_n = jnp.zeros((n_flat,), jnp.float32).at[idx].add(
        jnp.where(ok, 1.0, 0.0), mode="drop"
    )
    d_i = jnp.zeros((n_flat,), jnp.float32).at[idx].add(
        jnp.where(ok, intensities, 0.0), mode="drop"
    )
    touched = d_n > 0
    new_w = wval + d_n
    new_i = (ival * wval + d_i) / jnp.maximum(new_w, 1e-12)
    ival = jnp.where(touched, new_i, ival)
    wval = jnp.where(touched, jnp.minimum(new_w, max_weight), wval)

    # Neighborhood fill: only where still unobserved (weight < eps).
    pgvi = grid.point_to_grid_index(probe, 1.0 / vs)
    pflat, pfound = vlayer.global_voxel_to_flat(intensity_layer, pgvi)
    pok = probe_valid.reshape(pgvi.shape[:2]) & pfound
    unobserved = wval.at[jnp.where(pok, pflat, 0)].get() < 1e-6
    pok = pok & unobserved
    pidx = jnp.where(pok, pflat, n_flat).reshape(-1)
    pint = jnp.broadcast_to(intensities[None, :], pok.shape).reshape(-1)
    fill_i = jnp.full((n_flat,), jnp.nan, jnp.float32).at[pidx].set(
        pint, mode="drop"
    )
    fill_mask = ~jnp.isnan(fill_i) & (wval < 1e-6)
    ival = jnp.where(fill_mask, fill_i, ival)
    wval = jnp.where(fill_mask, 1.0, wval)

    ch = dict(intensity_layer.channels)
    ch["intensity"] = ival.reshape(ch["intensity"].shape)
    ch["intensity_weight"] = wval.reshape(ch["intensity_weight"].shape)
    return dataclasses.replace(intensity_layer, channels=ch), hit

"""Map objects: layer + query API.

Equivalents of the reference map classes:
- TsdfMap (core/tsdf_map.h:20-107): TSDF layer + interpolated queries +
  plane-slice batch extraction + weight queries;
- EsdfMap (core/esdf_map.h:21-130): batched distance / distance+gradient
  queries — the planner-facing API (batch is the native mode on TPU);
- OccupancyMap (core/occupancy_map.h:15-66).

All maps are thin pytree wrappers over VoxelLayer; queries are jittable
and vectorized over [Q,3] position batches (the reference exposes the same
batch signatures for its pybind layer, esdf_map.h:93-106).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import grid
from ..core import layer as vlayer
from ..core.config import MapConfig
from ..ops import interp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["layer"],
    meta_fields=["config"],
)
@dataclasses.dataclass
class TsdfMap:
    layer: vlayer.VoxelLayer
    config: MapConfig

    @classmethod
    def create(cls, config: MapConfig = MapConfig()) -> "TsdfMap":
        return cls(
            layer=vlayer.make_layer(
                "tsdf",
                config.voxel_size,
                vps=config.voxels_per_side,
                max_blocks=config.max_blocks,
                table_capacity=config.table_capacity,
            ),
            config=config,
        )

    def get_distance_at_position(self, positions, interpolate: bool = True):
        """f32[Q,3] -> (distances [Q], valid [Q]) (tsdf_map.h weight/dist
        query API)."""
        if interpolate:
            return interp.interpolate(self.layer, positions)
        return interp.nearest(self.layer, positions)

    def get_weight_at_position(self, positions, interpolate: bool = True):
        if interpolate:
            return interp.interpolate(self.layer, positions, channel="weight")
        gvi = grid.point_to_grid_index(positions, 1.0 / self.layer.voxel_size)
        return vlayer.get_voxels(self.layer, "weight", gvi)

    def coord_plane_slice(self, free_plane_index: int, height: float,
                          extent: float = 10.0, step: float | None = None):
        """Extract (positions, distances, weights) on an axis-aligned plane
        (getTsdfMapSlice semantics, tsdf_map.h:60-89)."""
        step = step or self.layer.voxel_size
        n = int(2 * extent / step)
        u = (jnp.arange(n) - n // 2) * step
        uu, vv = jnp.meshgrid(u, u, indexing="ij")
        hh = jnp.full_like(uu, height)
        cols = [uu, vv]
        cols.insert(free_plane_index, hh)
        pts = jnp.stack(cols, -1).reshape(-1, 3)
        d, ok = interp.interpolate(self.layer, pts)
        w, _ = interp.interpolate(self.layer, pts, channel="weight")
        return pts, d, w, ok

    def block_size(self):
        return self.layer.block_size

    def memory_bytes(self):
        return self.layer.memory_bytes()


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["layer"],
    meta_fields=["config"],
)
@dataclasses.dataclass
class EsdfMap:
    layer: vlayer.VoxelLayer
    config: MapConfig

    @classmethod
    def create(cls, config: MapConfig = MapConfig()) -> "EsdfMap":
        return cls(
            layer=vlayer.make_layer(
                "esdf",
                config.voxel_size,
                vps=config.voxels_per_side,
                max_blocks=config.max_blocks,
                table_capacity=config.table_capacity,
            ),
            config=config,
        )

    def get_distance_at_position(self, positions, interpolate: bool = True):
        """Batch distance query (esdf_map.h:55-67 / batch variant :93-99)."""
        if interpolate:
            return interp.interpolate(self.layer, positions)
        return interp.nearest(self.layer, positions)

    def get_distance_and_gradient_at_position(self, positions,
                                              interpolate: bool = True,
                                              adaptive: bool = False):
        """Batch distance+gradient (esdf_map.h:69-77, batch :100-106).

        Gradient is the analytic trilinear derivative; pass
        interpolate=False for nearest-voxel distance + central-difference
        gradient (the reference's uninterpolated mode). ``adaptive=True``
        selects the reference's getAdaptiveDistanceAndGradient
        (esdf_map.cc:35-43 -> interpolator_inl.h:77-154): one-sided /
        partial-stencil fallbacks so queries near map borders degrade
        gracefully instead of going invalid."""
        if adaptive:
            return interp.adaptive_distance_and_gradient(
                self.layer, positions
            )
        if interpolate:
            return interp.interpolate_with_gradient(self.layer, positions)
        d, ok = interp.nearest(self.layer, positions)
        g, gok = interp.gradient_central(self.layer, positions)
        return d, g, ok & gok

    def is_observed(self, positions):
        gvi = grid.point_to_grid_index(positions, 1.0 / self.layer.voxel_size)
        f, found = vlayer.get_voxels(self.layer, "esdf_flags", gvi, fill=0)
        return found & ((f.astype(jnp.uint8) & vlayer.ESDF_OBSERVED) != 0)

    def traversable_points(self, traversability_radius: float):
        """World positions of observed ESDF voxels whose distance exceeds
        the robot radius — the EsdfServer traversable cloud
        (voxblox_ros/src/esdf_server.cc:136-142). Host-side extraction
        (an export/publish path, not a latency path). Returns numpy
        (points f32[N,3], distances f32[N])."""
        import numpy as np

        layer = self.layer
        flags = np.asarray(layer.channels["esdf_flags"])
        d = np.asarray(layer.channels["esdf"])
        active = np.asarray(layer.active_mask())
        obs = ((flags & vlayer.ESDF_OBSERVED) != 0) & active[:, None]
        m = obs & (d > traversability_radius)
        rows, vox = np.nonzero(m)
        local = np.asarray(
            grid.linear_to_local(
                jnp.arange(layer.voxels_per_block), layer.vps
            )
        )
        gvi = np.asarray(layer.block_ijk)[rows] * layer.vps + local[vox]
        pts = ((gvi + 0.5) * layer.voxel_size).astype(np.float32)
        return pts, d[rows, vox]

    def coord_plane_slice(self, free_plane_index: int, height: float,
                          extent: float = 10.0, step: float | None = None):
        """coordPlaneSliceGetDistance (esdf_map.cc:112-196)."""
        step = step or self.layer.voxel_size
        n = int(2 * extent / step)
        u = (jnp.arange(n) - n // 2) * step
        uu, vv = jnp.meshgrid(u, u, indexing="ij")
        hh = jnp.full_like(uu, height)
        cols = [uu, vv]
        cols.insert(free_plane_index, hh)
        pts = jnp.stack(cols, -1).reshape(-1, 3)
        d, ok = interp.interpolate(self.layer, pts)
        return pts, d, ok


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["layer"],
    meta_fields=["config"],
)
@dataclasses.dataclass
class OccupancyMap:
    layer: vlayer.VoxelLayer
    config: MapConfig

    @classmethod
    def create(cls, config: MapConfig = MapConfig()) -> "OccupancyMap":
        return cls(
            layer=vlayer.make_layer(
                "occupancy",
                config.voxel_size,
                vps=config.voxels_per_side,
                max_blocks=config.max_blocks,
                table_capacity=config.table_capacity,
            ),
            config=config,
        )

    def occupancy_probability(self, positions):
        gvi = grid.point_to_grid_index(positions, 1.0 / self.layer.voxel_size)
        lo, found = vlayer.get_voxels(self.layer, "log_odds", gvi)
        return grid.probability_from_log_odds(lo), found

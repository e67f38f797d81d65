"""Mapper services: the ROS-free equivalents of the reference server layer.

- ``TsdfServer``  <- voxblox_ros TsdfServer (tsdf_server.{h,cc}): consumes
  posed point clouds, optional ICP pose refinement, TSDF integration,
  periodic meshing, distant-block pruning, save/load/clear services.
- ``EsdfServer``  <- EsdfServer (esdf_server.{h,cc}): adds incremental or
  batch ESDF updates, clear spheres on new poses, multi-layer map files.
- ``IntensityServer`` <- intensity_server.{h,cc}: projects intensity
  images/bearing sets onto the TSDF surface.
- ``SimulationServer`` <- simulation_server.cc: the self-contained
  end-to-end synthetic benchmark (render -> integrate -> esdf -> evaluate).

Instead of ROS topics/TF, inputs arrive as explicit (pose, points, colors)
calls or dataset iterators; "publishing" maps to PLY/npz artifact dumps.
Per-stage timers use the reference tag taxonomy (utils/timing.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import layer as vlayer
from ..core.config import (
    EsdfIntegratorConfig,
    IcpConfig,
    MapConfig,
    MeshIntegratorConfig,
    TsdfIntegratorConfig,
)
from ..io import layer_io, npz_io, ply
from ..ops import esdf as esdf_ops
from ..ops import icp as icp_ops
from ..ops import intensity as intensity_ops
from ..ops import mesh as mesh_ops
from ..ops import tsdf as tsdf_ops
from ..utils import planning, timing


class TsdfServer:
    """Point-cloud -> TSDF mapping service (tsdf_server.cc)."""

    def __init__(
        self,
        map_config: MapConfig = MapConfig(),
        integrator_config: TsdfIntegratorConfig = TsdfIntegratorConfig(),
        mesh_config: MeshIntegratorConfig = MeshIntegratorConfig(),
        method: str = "fast",
        enable_icp: bool = False,
        icp_config: IcpConfig = IcpConfig(),
        max_block_distance_from_body: float = 0.0,
        max_points: Optional[int] = None,
        # method="projective": virtual range-image parameters.
        projective_resolution=(320, 240),
        projective_fov_deg: float = 90.0,
        projective_kind: str = "pinhole",
        # Organized fast path: source-raster (fx, fy, cx, cy) + min-pool
        # factor. When set, [H, W, 3] raster-ordered clouds bin via the
        # scatter-free organized min-pool (PCL "organized" clouds — the
        # reference's cow-and-lady subscription).
        projective_intrinsics=None,
        projective_pool: int = 1,
        # Throughput budgets (None = safe unbounded; see ops/projective).
        projective_max_visible_blocks: int = 512,
        projective_max_mixed_slabs: Optional[int] = None,
        projective_max_free_slabs: Optional[int] = None,
        # Pool-overflow detection cadence: 1 = synchronously after every
        # scan (a device->host readback — a full pipeline sync, ~25-70 ms
        # through a remote-TPU tunnel). Larger values accumulate the
        # overflow flag on device and check every Nth scan, letting
        # consecutive scans pipeline; overflow then raises up to N-1
        # scans late (updates from overflowed scans are dropped, never
        # corrupted).
        overflow_check_interval: int = 1,
    ):
        self.map_config = map_config
        self.cfg = integrator_config
        self.mesh_config = mesh_config
        self.method = method
        self.projective_resolution = tuple(projective_resolution)
        self.projective_fov = float(np.deg2rad(projective_fov_deg))
        self.projective_kind = projective_kind
        self.projective_intrinsics = (
            tuple(float(v) for v in projective_intrinsics)
            if projective_intrinsics is not None else None
        )
        self.projective_pool = int(projective_pool)
        self.projective_budgets = dict(
            max_visible_blocks=projective_max_visible_blocks,
            max_mixed_slabs=projective_max_mixed_slabs,
            max_free_slabs=projective_max_free_slabs,
        )
        self.enable_icp = enable_icp
        self.icp_config = icp_config
        self.max_block_distance = max_block_distance_from_body
        self.max_points = max_points
        self.layer = vlayer.make_layer(
            "tsdf",
            map_config.voxel_size,
            vps=map_config.voxels_per_side,
            max_blocks=map_config.max_blocks,
            table_capacity=map_config.table_capacity,
        )
        self.fast_state = tsdf_ops.make_fast_state()
        # Mesh state is DEVICE-resident (ops/mesh.MeshPool): update_mesh
        # runs one jitted march+compact+scatter program and transfers
        # nothing; the host MeshLayer below is only a cache filled on
        # export (generate_mesh / export_mesh_layer).
        self.mesh_pool = mesh_ops.make_mesh_pool(
            map_config.max_blocks, mesh_config.device_tri_cap
        )
        self.mesh_layer = mesh_ops.MeshLayer(self.layer.block_size)
        self._mesh_more = None  # device flag: dirty rows beyond the bucket
        self.num_scans = 0
        self.icp_corrected = (jnp.eye(3), jnp.zeros(3))
        self.overflow_check_interval = max(1, int(overflow_check_interval))
        self._overflow_acc = None  # device-side accumulated overflow flag
        # Projective grow-and-retry state: overflow is TRANSACTIONAL (an
        # overflowed scan applies NOTHING — ops/projective withholds the
        # value fold), so scans since the last check are kept with their
        # device-side budget-overflow flag and the flagged ones are
        # replayed at grown budget rungs by check_overflow. The analogue
        # of the reference's never-drop dynamic allocation
        # (tsdf_integrator.cc:91-147). Entries drain at every check, so
        # overflow_check_interval bounds the buffer.
        self._pending_scans: list = []

    # -- input path (processPointCloudMessageAndInsert, :213-323) ----------
    def _pad(self, points, colors):
        n = points.shape[0]
        cap = self.max_points or n
        if n < cap:
            pad = cap - n
            points = jnp.concatenate(
                [points, jnp.zeros((pad, 3), jnp.float32)]
            )
            colors = jnp.concatenate(
                [colors, jnp.zeros((pad, 3), jnp.float32)]
            )
        elif n > cap:
            points, colors = points[:cap], colors[:cap]
        return points, colors

    def insert_pointcloud(self, T_G_C, points_C, colors=None):
        """Integrate one posed scan. Returns the (possibly ICP-refined)
        pose actually used."""
        points_C = jnp.asarray(points_C, jnp.float32)
        if colors is None:
            colors = jnp.zeros_like(points_C)
        colors = jnp.asarray(colors, jnp.float32)
        points_C, colors = self._pad(points_C, colors)
        if not isinstance(T_G_C, tuple):
            T_G_C = (jnp.asarray(T_G_C[:3, :3]), jnp.asarray(T_G_C[:3, 3]))

        if self.enable_icp and self.num_scans > 0:
            with timing.timer("icp"):
                res = icp_ops.run_icp(
                    self.layer, points_C, T_G_C, self.icp_config
                )
                T_G_C = (res.R, res.t)
                self.icp_corrected = T_G_C

        with timing.timer(f"integrate/{self.method}"):
            if self.method == "projective":
                from ..ops import projective as projective_ops

                self.layer, overflow, budget_ovf = (
                    projective_ops.integrate_pointcloud_projective(
                        self.layer, T_G_C, points_C, colors, self.cfg,
                        resolution=self.projective_resolution,
                        fov_h_rad=self.projective_fov,
                        kind=self.projective_kind,
                        **self.projective_budgets,
                    )
                )
                self._record_scan(T_G_C, points_C, colors, budget_ovf)
            else:
                self.layer, self.fast_state, overflow = (
                    tsdf_ops.integrate_pointcloud(
                        self.layer,
                        T_G_C,
                        points_C,
                        colors,
                        self.cfg,
                        method=self.method,
                        state=self.fast_state,
                    )
                )
        self._overflow_acc = (
            overflow if self._overflow_acc is None
            else self._overflow_acc | overflow
        )
        if (self.num_scans + 1) % self.overflow_check_interval == 0:
            self.check_overflow()

        if self.max_block_distance > 0.0:
            with timing.timer("remove_distant_blocks"):
                self.layer = vlayer.remove_distant_blocks(
                    self.layer, T_G_C[1], self.max_block_distance
                )
                self.mesh_layer.clear_distant(
                    np.asarray(T_G_C[1]), self.max_block_distance
                )
        self.num_scans += 1
        return T_G_C

    # -- projective grow-and-retry -----------------------------------------
    def _record_scan(self, T_G_C, points_C, colors, budget_ovf,
                     fused: bool = False):
        self._pending_scans.append(
            (T_G_C, points_C, colors, budget_ovf, fused)
        )

    def _grow_projective_budgets(self) -> bool:
        """Advance the projective budgets one ladder rung, SLAB budgets
        first (double; they jump to None = safe unbounded once they
        cover every slab of the visible set) and the visible-row budget
        only once the slab budgets are exhausted — slab overflow is by
        far the common case, and inflating the row budget multiplies
        the whole per-scan chain. Each rung is a new static config ->
        one recompile, paid once and kept. Returns False when everything
        is already at its safe maximum."""
        from ..ops.projective import _slab_shape

        b = self.projective_budgets
        n_slabs = _slab_shape(self.layer.vps)[2]
        changed = False
        for key in ("max_mixed_slabs", "max_free_slabs"):
            v = b[key]
            if v is not None:
                cap = b["max_visible_blocks"] * n_slabs
                b[key] = None if 2 * v >= cap else 2 * v
                changed = True
        if not changed:
            mvb = b["max_visible_blocks"]
            if mvb < self.layer.max_blocks:
                b["max_visible_blocks"] = min(
                    2 * mvb, self.layer.max_blocks
                )
                changed = True
        return changed

    def _replay_scan(self, T_G_C, points_C, colors, fused: bool):
        """Re-dispatch one budget-overflowed scan until it applies (its
        original dispatch applied nothing), growing the budget ladder on
        each fresh overflow. The first attempt runs at the CURRENT
        budgets — the recorded flag may date from an older rung that an
        earlier scan's replay already grew past."""
        from ..ops import projective as projective_ops

        first = True
        while True:
            if not first and not self._grow_projective_budgets():
                raise MemoryError(
                    "projective scan overflows even at the maximum "
                    "budgets; increase MapConfig.max_blocks"
                )
            first = False
            if fused:
                iters = self._fused_step(T_G_C, points_C, colors,
                                         record=False)
                pool_b, budget_b = jax.device_get(
                    (self._overflow_acc, self._last_fused_budget)
                )
            else:
                self.layer, pool_ovf, budget_ovf = (
                    projective_ops.integrate_pointcloud_projective(
                        self.layer, T_G_C, points_C, colors, self.cfg,
                        resolution=self.projective_resolution,
                        fov_h_rad=self.projective_fov,
                        kind=self.projective_kind,
                        **self.projective_budgets,
                    )
                )
                pool_b, budget_b = jax.device_get((pool_ovf, budget_ovf))
            if pool_b:
                raise MemoryError(
                    "block pool overflow; increase MapConfig.max_blocks"
                )
            if not budget_b:
                return

    def _drain_pending_scans(self):
        """Resolve the recorded scans' budget flags (one batched
        device_get) and replay the flagged ones at grown budgets."""
        if not self._pending_scans:
            return
        pending, self._pending_scans = self._pending_scans, []
        flags = jax.device_get([r[3] for r in pending])
        for (T, pts, cols, _, fused), ovf in zip(pending, flags):
            if ovf:
                self._replay_scan(T, pts, cols, fused)

    def check_overflow(self):
        """Synchronously resolve all deferred overflow flags: budget
        overflows replay their scans at grown budgets (no dropped
        updates); pool overflow raises (device->host readback; full
        pipeline sync)."""
        self._drain_pending_scans()
        if self._overflow_acc is None:
            return
        ovf = bool(self._overflow_acc)
        self._overflow_acc = None
        if ovf:
            raise MemoryError(
                "block pool overflow; increase MapConfig.max_blocks"
            )

    # -- services (tsdf_server.cc:115-127, :580-618) ----------------------
    def update_mesh(self):
        """Incremental mesh update (updateMeshEvent, tsdf_server.cc:493-520)
        — one device program over the kMesh-dirty rows, mesh stays in HBM
        (no host transfer; export with generate_mesh/export_mesh_layer)."""
        with timing.timer("mesh/update"):
            self.layer, self.mesh_pool, more = mesh_ops.update_mesh_pool(
                self.layer, self.mesh_pool, self.mesh_config,
                bucket=self.mesh_config.update_bucket, only_updated=True,
            )
        self._mesh_more = (
            more if self._mesh_more is None else self._mesh_more | more
        )

    def _drain_mesh_updates(self):
        """Mesh every remaining dirty row. The march bucket stays small
        (the [B,cubes,5,3,3] march intermediates tile-pad their (3,3)
        minor dims ~42x in HBM — large buckets OOM a 16 GB chip); the
        dirty count is read ONCE so the loop runs without per-iteration
        readbacks, then a single ``more`` check catches stragglers."""
        bucket = self.mesh_config.update_bucket
        while True:
            n_dirty = int(np.asarray(
                vlayer.dirty_mask(self.layer, vlayer.DIRTY_MESH)
            ).sum())
            if n_dirty == 0:
                self._mesh_more = None
                return
            more = None
            for _ in range(-(-n_dirty // bucket)):
                self.layer, self.mesh_pool, more = (
                    mesh_ops.update_mesh_pool(
                        self.layer, self.mesh_pool, self.mesh_config,
                        bucket=bucket, only_updated=True,
                    )
                )
            self._mesh_more = None
            if not bool(more):
                return

    def publish_mesh_msg(self, drain: bool = True) -> bytes:
        """Serialize the incremental mesh delta since the last publish
        (the updateMeshEvent -> mesh pub path, tsdf_server.cc:493-520 +
        generateVoxbloxMeshMsg): every row re-marched since the last
        call ships as a uint16-quantized MeshBlock message. Returns the
        wire bytes (io/mesh_msg framing)."""
        from ..io import mesh_msg as mesh_msg_io

        if drain:
            self._drain_mesh_updates()
        with timing.timer("mesh/publish"):
            msg, self.layer = mesh_msg_io.encode_mesh_msg(
                self.layer, self.mesh_pool,
                use_color=self.mesh_config.use_color,
            )
            return mesh_msg_io.serialize_mesh_msg(msg)

    def export_mesh_layer(self) -> mesh_ops.MeshLayer:
        """Drain pending mesh updates and transfer the device mesh pool
        into the host MeshLayer cache."""
        self._drain_mesh_updates()
        with timing.timer("mesh/export"):
            mesh_ops.pool_to_mesh_layer(
                self.layer, self.mesh_pool, self.mesh_layer,
                self.mesh_config,
            )
        return self.mesh_layer

    def generate_mesh(self, path: Optional[str] = None):
        """Full re-mesh (+ optional PLY export, generate_mesh service)."""
        with timing.timer("mesh/generate"):
            # Mark every active block mesh-dirty, then drain + export.
            rows = jnp.arange(self.layer.max_blocks, dtype=jnp.int32)
            self.layer = vlayer.mark_dirty(
                self.layer, rows, self.layer.active_mask(),
                vlayer.DIRTY_MESH,
            )
            self.export_mesh_layer()
        if path:
            ply.mesh_layer_to_ply(self.mesh_layer, path)
        return self.mesh_layer

    def save_map(self, path: str):
        # Resolve any deferred overflow before persisting the map.
        self.check_overflow()
        if path.endswith(".npz"):
            npz_io.save_npz(self.layer, path)
        else:
            layer_io.save_layer(self.layer, path)

    def load_map(self, path: str):
        if path.endswith(".npz"):
            self.layer = npz_io.load_npz(path)
        else:
            self.layer = layer_io.load_layer(
                path, "tsdf", max_blocks=self.map_config.max_blocks
            )

    def clear(self):
        self.layer = vlayer.make_layer(
            "tsdf",
            self.map_config.voxel_size,
            vps=self.map_config.voxels_per_side,
            max_blocks=self.map_config.max_blocks,
        )
        self.mesh_pool = mesh_ops.make_mesh_pool(
            self.map_config.max_blocks, self.mesh_config.device_tri_cap
        )
        self.mesh_layer = mesh_ops.MeshLayer(self.layer.block_size)
        self._mesh_more = None
        self.fast_state = tsdf_ops.make_fast_state()
        self.num_scans = 0
        self._pending_scans = []
        self._overflow_acc = None

    def stats(self):
        return {
            "num_scans": self.num_scans,
            "num_blocks": int(self.layer.num_blocks),
            "memory_bytes": self.layer.memory_bytes(),
            "timing": timing.as_dict(),
        }


from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=("tcfg", "ecfg", "resolution", "fov_h_rad", "kind",
                     "mvb", "mms", "mfs", "intrinsics", "pool"),
)
def _fused_scan_jit(layer, esdf_layer, R, t, points_C, colors, tcfg, ecfg,
                    resolution, fov_h_rad, kind, mvb, mms, mfs,
                    intrinsics=None, pool=1):
    """One device program: projective integrate + incremental ESDF
    (EsdfServer.insert_pointcloud_and_update_esdf). ``ecfg`` must
    already be bucketed (esdf._bucketed_cfg) — overflow flags come back
    as device scalars for deferred checking. With ``intrinsics`` set and
    a raster-ordered [H, W, 3] cloud, binning is the scatter-free
    organized min-pool (the unstructured scatter binner's ~3 random
    memory ops/point cost ~7 ms/scan on the fused-step trace; organized
    clouds are what the reference's cow-and-lady pipeline subscribes
    to)."""
    from ..ops import projective as projective_ops

    if intrinsics is not None and points_C.ndim == 3:
        layer, t_ovf, t_budget = projective_ops.integrate_organized_projective(
            layer, (R, t), points_C, colors, tcfg,
            intrinsics=intrinsics, pool=pool,
            max_visible_blocks=mvb, max_mixed_slabs=mms,
            max_free_slabs=mfs,
        )
    else:
        layer, t_ovf, t_budget = projective_ops.integrate_pointcloud_projective(
            layer, (R, t), points_C, colors, tcfg,
            resolution=resolution, fov_h_rad=fov_h_rad, kind=kind,
            max_visible_blocks=mvb, max_mixed_slabs=mms,
            max_free_slabs=mfs,
        )
    esdf_layer, layer, e_ovf, region_ovf, iters = esdf_ops._incremental_jit(
        esdf_layer, layer, ecfg
    )
    return layer, esdf_layer, t_ovf, t_budget, e_ovf, region_ovf, iters


class EsdfServer(TsdfServer):
    """TsdfServer + incremental ESDF (esdf_server.{h,cc})."""

    def __init__(
        self,
        map_config: MapConfig = MapConfig(),
        integrator_config: TsdfIntegratorConfig = TsdfIntegratorConfig(),
        esdf_config: EsdfIntegratorConfig = EsdfIntegratorConfig(),
        clear_sphere_for_planning: bool = False,
        **kw,
    ):
        super().__init__(map_config, integrator_config, **kw)
        self.esdf_cfg = esdf_config
        self.clear_sphere_for_planning = clear_sphere_for_planning
        self._esdf_region_ovf = None
        self._esdf_pool_ovf = None
        self.esdf_layer = vlayer.make_layer(
            "esdf",
            map_config.voxel_size,
            vps=map_config.voxels_per_side,
            max_blocks=map_config.max_blocks,
        )

    def insert_pointcloud(self, T_G_C, points_C, colors=None):
        T = super().insert_pointcloud(T_G_C, points_C, colors)
        if self.clear_sphere_for_planning:
            # newPoseCallback -> addNewRobotPosition (esdf_server.cc:222-231)
            with timing.timer("esdf/clear_radius"):
                self.esdf_layer, _ = planning.add_new_robot_position(
                    self.esdf_layer, jnp.asarray(T[1]), self.esdf_cfg
                )
        return T

    def insert_pointcloud_and_update_esdf(self, T_G_C, points_C,
                                          colors=None):
        """Fused online step: integrate + incremental ESDF in ONE device
        program per scan (the tsdf_server.cc:407-414 + esdf_server.cc:
        192-197 cadence with the two dispatches fused — through a
        remote-TPU tunnel each dispatch costs ~25 ms of latency, so the
        fusion halves the per-scan floor). Projective method only; ICP
        and clear-sphere stay on the two-dispatch path. Overflow flags
        accumulate on device exactly like the deferred
        (overflow_check_interval > 1) mode — call check_overflow to
        resolve them."""
        assert self.method == "projective", "fused step is projective-only"
        points_C = jnp.asarray(points_C, jnp.float32)
        if colors is None:
            colors = jnp.zeros_like(points_C)
        colors = jnp.asarray(colors, jnp.float32)
        organized = (
            points_C.ndim == 3 and self.projective_intrinsics is not None
        )
        if not organized:
            points_C, colors = self._pad(points_C, colors)
        if not isinstance(T_G_C, tuple):
            T_G_C = (jnp.asarray(T_G_C[:3, :3]), jnp.asarray(T_G_C[:3, 3]))
        iters = self._fused_step(T_G_C, points_C, colors)
        self.num_scans += 1
        if self.num_scans % self.overflow_check_interval == 0:
            self.check_overflow()
        return iters

    def _fused_step(self, T_G_C, points_C, colors, record: bool = True):
        """One fused dispatch + device-side overflow accounting. With
        ``record`` the scan is kept for the grow-and-retry drain (a
        budget-overflowed fused scan applied NO tsdf update and hence no
        new dirty bits — replaying the whole fused step is exact)."""
        run_cfg = esdf_ops._bucketed_cfg(
            self.esdf_cfg, self.esdf_layer, self.layer
        )
        b = self.projective_budgets
        organized = (
            points_C.ndim == 3 and self.projective_intrinsics is not None
        )
        with timing.timer("fused_scan"):
            (self.layer, self.esdf_layer, t_ovf, t_budget, e_ovf,
             region_ovf, iters) = _fused_scan_jit(
                self.layer, self.esdf_layer, T_G_C[0], T_G_C[1],
                points_C, colors, self.cfg, run_cfg,
                self.projective_resolution, self.projective_fov,
                self.projective_kind, b["max_visible_blocks"],
                b["max_mixed_slabs"], b["max_free_slabs"],
                intrinsics=(self.projective_intrinsics if organized
                            else None),
                pool=self.projective_pool,
            )
        self._overflow_acc = (
            t_ovf if self._overflow_acc is None
            else self._overflow_acc | t_ovf
        )
        self._last_fused_budget = t_budget
        self._esdf_pool_ovf = (
            e_ovf if getattr(self, "_esdf_pool_ovf", None) is None
            else self._esdf_pool_ovf | e_ovf
        )
        self._esdf_region_ovf = (
            region_ovf if self._esdf_region_ovf is None
            else self._esdf_region_ovf | region_ovf
        )
        if record:
            self._record_scan(T_G_C, points_C, colors, t_budget,
                              fused=True)
        return iters

    def update_esdf(self):
        """Incremental ESDF update (esdf_server.cc:192-197).

        With ``overflow_check_interval > 1`` the working-set overflow
        flag accumulates on device and is resolved lazily by
        ``check_overflow`` (a bool() readback per update is a full
        pipeline sync); on a late-detected sweep overflow the field is
        restored exactly by growing the bucket and re-running the batch
        update. Returns the outer-iteration count (device scalar in
        deferred mode)."""
        if self.overflow_check_interval > 1:
            with timing.timer("esdf/update_esdf"):
                (self.esdf_layer, self.layer, overflow, region_ovf,
                 iters) = esdf_ops.update_from_tsdf_incremental_deferred(
                    self.esdf_layer, self.layer, self.esdf_cfg
                )
            # ESDF *pool* overflow is tracked separately from the TSDF
            # block-pool accumulator so check_overflow can raise the
            # right "grow which pool" message.
            self._esdf_pool_ovf = (
                overflow if getattr(self, "_esdf_pool_ovf", None) is None
                else self._esdf_pool_ovf | overflow
            )
            self._esdf_region_ovf = (
                region_ovf if self._esdf_region_ovf is None
                else self._esdf_region_ovf | region_ovf
            )
            return iters
        with timing.timer("esdf/update_esdf"):
            self.esdf_layer, self.layer, overflow, iters = (
                esdf_ops.update_from_tsdf_incremental(
                    self.esdf_layer, self.layer, self.esdf_cfg
                )
            )
            jax.block_until_ready(self.esdf_layer.channels["esdf"])
        if bool(overflow):
            raise MemoryError("ESDF pool overflow")
        return int(iters)

    def check_overflow(self):
        # Budget overflows first: flagged scans replay at grown budgets
        # (transactional — nothing was applied, nothing double counts).
        self._drain_pending_scans()
        # ONE device_get for all pending flags: each bool() readback is
        # a full pipeline sync (~25-70 ms through a remote-TPU tunnel),
        # so the three accumulators transfer together.
        flags = {}
        if self._overflow_acc is not None:
            flags["tsdf_pool"] = self._overflow_acc
        if getattr(self, "_esdf_pool_ovf", None) is not None:
            flags["esdf_pool"] = self._esdf_pool_ovf
        if getattr(self, "_esdf_region_ovf", None) is not None:
            flags["region"] = self._esdf_region_ovf
        if not flags:
            return
        vals = jax.device_get(flags)
        self._overflow_acc = None
        self._esdf_pool_ovf = None
        self._esdf_region_ovf = None
        if vals.get("tsdf_pool"):
            raise MemoryError(
                "block pool overflow; increase MapConfig.max_blocks"
            )
        if vals.get("esdf_pool"):
            raise MemoryError(
                "ESDF pool overflow; increase MapConfig.max_blocks"
            )
        if vals.get("region"):
            # Some rows went unseeded/unswept and their dirty bits are
            # gone: grow the bucket and rebuild the exact field.
            esdf_ops.grow_bucket_cache(self.esdf_cfg, self.esdf_layer)
            self.update_esdf_batch()

    def update_esdf_batch(self):
        with timing.timer("esdf/update_esdf_batch"):
            self.esdf_layer, overflow, iters = esdf_ops.update_from_tsdf_batch(
                self.esdf_layer, self.layer, self.esdf_cfg
            )
            jax.block_until_ready(self.esdf_layer.channels["esdf"])
        if bool(overflow):
            raise MemoryError("ESDF pool overflow")
        return int(iters)

    def save_map(self, path: str):
        """TSDF + ESDF appended in one file (esdf_server.cc:172-190)."""
        # Resolve any deferred overflow before persisting the map.
        self.check_overflow()
        if path.endswith(".npz"):
            npz_io.save_npz(self.layer, path)
            npz_io.save_npz(self.esdf_layer, path + ".esdf.npz")
        else:
            layer_io.save_layer(self.layer, path)
            layer_io.save_layer(self.esdf_layer, path, append=True)

    def load_map(self, path: str):
        super().load_map(path)
        if not path.endswith(".npz"):
            try:
                self.esdf_layer = layer_io.load_layer(
                    path, "esdf", max_blocks=self.map_config.max_blocks
                )
            except ValueError:
                # No ESDF layer in file: regenerate (tsdf_to_esdf tool).
                self.update_esdf_batch()


class IntensityServer(EsdfServer):
    """Thermal projection service (intensity_server.{h,cc})."""

    def __init__(self, *a, intensity_max_distance: float = 30.0,
                 prop_voxel_radius: int = 2, **kw):
        super().__init__(*a, **kw)
        self.intensity_max_distance = intensity_max_distance
        self.prop_voxel_radius = prop_voxel_radius
        self.intensity_layer = vlayer.make_layer(
            "intensity",
            self.map_config.voxel_size,
            vps=self.map_config.voxels_per_side,
            max_blocks=self.map_config.max_blocks,
        )

    def insert_intensity(self, origin, bearing_vectors, intensities):
        with timing.timer("intensity/integrate"):
            self.intensity_layer, hits = (
                intensity_ops.add_intensity_bearing_vectors(
                    self.intensity_layer,
                    self.layer,
                    jnp.asarray(origin, jnp.float32),
                    jnp.asarray(bearing_vectors, jnp.float32),
                    jnp.asarray(intensities, jnp.float32),
                    max_distance=self.intensity_max_distance,
                    prop_voxel_radius=self.prop_voxel_radius,
                )
            )
        return int(jnp.sum(hits))

    def insert_intensity_image(self, T_G_C, image, intrinsics,
                               subsample: int = 4):
        """Thermal image front end (intensity_server.cc:50-120): subsample
        pixels, build bearing rays through the intrinsics, rotate to world,
        splat onto the TSDF surface."""
        image = np.asarray(image, np.float32)
        h, w = image.shape
        fx, fy, cx, cy = intrinsics
        us, vs = np.meshgrid(
            np.arange(0, w, subsample), np.arange(0, h, subsample)
        )
        rays_C = np.stack(
            [(us - cx) / fx, (vs - cy) / fy, np.ones_like(us, np.float32)],
            -1,
        ).reshape(-1, 3).astype(np.float32)
        rays_C /= np.linalg.norm(rays_C, axis=1, keepdims=True)
        R, t = T_G_C
        rays_G = rays_C @ np.asarray(R).T
        vals = image[vs.astype(int), us.astype(int)].reshape(-1)
        return self.insert_intensity(t, rays_G, vals)


class SimulationServer:
    """End-to-end synthetic benchmark (simulation_server.cc): random
    viewpoints -> render -> integrate TSDF (and, with
    ``generate_occupancy``, occupancy; simulation_server.cc:235-237) ->
    ESDF from the TSDF (+ from occupancy in batch mode, cc:265-269) ->
    evaluate every built layer vs GT (cc:279-287)."""

    def __init__(
        self,
        world,
        voxel_size: float = 0.1,
        vps: int = 16,
        max_blocks: int = 4096,
        tsdf_config: Optional[TsdfIntegratorConfig] = None,
        esdf_config: Optional[EsdfIntegratorConfig] = None,
        method: str = "merged",
        camera_res=(320, 240),
        fov_h_deg: float = 90.0,
        max_dist: float = 10.0,
        incremental_esdf: bool = True,
        generate_occupancy: bool = False,
    ):
        from ..core.config import derive_defaults

        self.world = world
        self.objects = world.freeze()
        tcfg, ecfg = derive_defaults(voxel_size, tsdf_config, esdf_config)
        self.tsdf_cfg = dataclasses.replace(tcfg, max_ray_length_m=max_dist)
        self.esdf_cfg = esdf_config or ecfg
        self.method = method
        self.camera_res = camera_res
        self.fov = np.deg2rad(fov_h_deg)
        self.max_dist = max_dist
        self.incremental_esdf = incremental_esdf
        self.voxel_size = voxel_size
        self.tsdf_layer = vlayer.make_layer(
            "tsdf", voxel_size, vps=vps, max_blocks=max_blocks
        )
        self.esdf_layer = vlayer.make_layer(
            "esdf", voxel_size, vps=vps, max_blocks=max_blocks
        )
        self.generate_occupancy = generate_occupancy
        if generate_occupancy:
            from ..core.config import OccupancyIntegratorConfig

            self.occ_cfg = OccupancyIntegratorConfig(
                max_ray_length_m=max_dist
            )
            self.occ_layer = vlayer.make_layer(
                "occupancy", voxel_size, vps=vps, max_blocks=max_blocks
            )
            self.esdf_occ_layer = vlayer.make_layer(
                "esdf", voxel_size, vps=vps, max_blocks=max_blocks
            )
        self.fast_state = tsdf_ops.make_fast_state()

    def generate_poses(self, n: int, radius: float = 0.8, seed: int = 0):
        """Random plausible viewpoints looking at the world center
        (simulation_server.cc:161-197 style)."""
        from ..sim import world as sw

        rng = np.random.default_rng(seed)
        lo, hi = self.world.min_bound, self.world.max_bound
        center = (np.asarray(lo) + np.asarray(hi)) / 2.0
        poses = []
        for _ in range(n):
            # Rejection-sample free-space viewpoints (the reference checks
            # "plausible" viewpoints the same way, simulation_server.cc:161+).
            for _attempt in range(64):
                pos = rng.uniform(lo + 0.05 * (hi - lo), hi - 0.05 * (hi - lo))
                d, _ = sw.distance_to_point(
                    self.objects, jnp.asarray(pos, jnp.float32), 1e6
                )
                if float(d) > 0.5:
                    break
            fwd = center - pos
            fwd = fwd / np.linalg.norm(fwd)
            z = fwd
            aux = np.array([0.0, 0.0, 1.0])
            if abs(np.dot(z, aux)) > 0.95:
                aux = np.array([1.0, 0.0, 0.0])
            x = np.cross(z, aux)
            x /= np.linalg.norm(x)
            y = np.cross(z, x)
            R = np.stack([x, y, z], 1).astype(np.float32)
            poses.append(
                (jnp.asarray(R), jnp.asarray(pos, jnp.float32))
            )
        return poses

    def integrate_viewpoint(self, pose, noise_key=None, noise_sigma=0.0):
        from ..sim import world as sw

        with timing.timer("sim/render"):
            pts_G, colors, valid = sw.pointcloud_from_transform(
                self.objects, pose, self.camera_res, self.fov, self.max_dist,
                noise_sigma=noise_sigma, noise_key=noise_key,
            )
            pts_C = sw.world_points_to_sensor(pose, pts_G, valid)
        with timing.timer(f"integrate/{self.method}"):
            if self.method == "projective":
                from ..ops import projective as projective_ops

                self.tsdf_layer, p_ovf, b_ovf = (
                    projective_ops.integrate_pointcloud_projective(
                        self.tsdf_layer, pose, pts_C, colors, self.tsdf_cfg,
                        resolution=self.camera_res, fov_h_rad=float(self.fov),
                    )
                )
                overflow = p_ovf | b_ovf
            else:
                self.tsdf_layer, self.fast_state, overflow = (
                    tsdf_ops.integrate_pointcloud(
                        self.tsdf_layer, pose, pts_C, colors, self.tsdf_cfg,
                        method=self.method, state=self.fast_state,
                    )
                )
            jax.block_until_ready(self.tsdf_layer.channels["tsdf"])
        assert not bool(overflow), "pool overflow"
        if self.generate_occupancy:
            from ..ops import occupancy as occupancy_ops

            with timing.timer("integrate/occupancy"):
                self.occ_layer, occ_ovf = occupancy_ops.integrate_pointcloud(
                    self.occ_layer, pose, pts_C, self.occ_cfg
                )
                jax.block_until_ready(self.occ_layer.channels["log_odds"])
            assert not bool(occ_ovf), "occupancy pool overflow"
        if self.incremental_esdf:
            with timing.timer("esdf/update_esdf"):
                self.esdf_layer, self.tsdf_layer, overflow, _ = (
                    esdf_ops.update_from_tsdf_incremental(
                        self.esdf_layer, self.tsdf_layer, self.esdf_cfg
                    )
                )
                jax.block_until_ready(self.esdf_layer.channels["esdf"])

    def run(self, n_viewpoints: int = 20, seed: int = 0):
        from ..sim import world as sw
        from ..utils import evaluation

        for pose in self.generate_poses(n_viewpoints, seed=seed):
            self.integrate_viewpoint(pose)
        if not self.incremental_esdf:
            self.esdf_layer, _, _ = esdf_ops.update_from_tsdf_batch(
                self.esdf_layer, self.tsdf_layer, self.esdf_cfg
            )
        gt_tsdf = sw.generate_gt_layer(
            self.objects, "tsdf", self.voxel_size, self.world.min_bound,
            self.world.max_bound,
            max_dist=self.tsdf_cfg.default_truncation_distance,
            vps=self.tsdf_layer.vps,
            max_blocks=2 * self.tsdf_layer.max_blocks,
        )
        gt_esdf = sw.generate_gt_layer(
            self.objects, "esdf", self.voxel_size, self.world.min_bound,
            self.world.max_bound, max_dist=self.esdf_cfg.max_distance_m,
            vps=self.esdf_layer.vps, max_blocks=2 * self.esdf_layer.max_blocks,
        )
        tsdf_eval = evaluation.evaluate_layers_rmse(
            gt_tsdf, self.tsdf_layer, ignore_behind_test_surface=True
        )
        esdf_eval = evaluation.evaluate_layers_rmse(
            gt_esdf, self.esdf_layer, ignore_behind_test_surface=True
        )
        result = {"tsdf": tsdf_eval, "esdf": esdf_eval}
        if self.generate_occupancy:
            from ..ops import occupancy as occupancy_ops

            self.esdf_occ_layer, _, _ = (
                occupancy_ops.esdf_from_occupancy_batch(
                    self.esdf_occ_layer, self.occ_layer, self.esdf_cfg
                )
            )
            # Occupancy row: voxelwise classification vs the GT SDF sign
            # (excluding the +-1-voxel band where the threshold is
            # ambiguous); the reference publishes the occupancy cloud
            # and evaluates only the two SDF layers, so this adds a
            # quantitative stand-in for the visual check.
            occ = self.occ_layer
            vpb = occ.voxels_per_block
            slot_gt = vlayer.lookup_blocks(gt_esdf, occ.block_ijk)
            sel = occ.active_mask() & (slot_gt >= 0)
            safe = jnp.where(sel, slot_gt, 0)
            gt_d = gt_esdf.channels["esdf"].reshape(-1, vpb)[safe]
            lo = occ.channels["log_odds"].reshape(-1, vpb)
            obs = (
                occ.channels["occ_observed"].reshape(-1, vpb) != 0
            ) & sel[:, None]
            m = obs & (jnp.abs(gt_d) > self.voxel_size)
            wrong = (lo > 0.0) != (gt_d <= 0.0)
            n_eval = int(jnp.sum(m))
            n_wrong = int(jnp.sum(m & wrong))
            result["occ"] = {
                "misclassified_frac": n_wrong / max(1, n_eval),
                "num_evaluated_voxels": n_eval,
            }
            result["esdf_occ"] = evaluation.evaluate_layers_rmse(
                gt_esdf, self.esdf_occ_layer,
                ignore_behind_test_surface=True,
            )
        result["timing"] = timing.as_dict()
        return result

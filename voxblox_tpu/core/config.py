"""Configuration dataclasses.

Knob names and defaults mirror the reference's config structs so users can
port configs 1:1:
- TsdfIntegratorConfig  <- TsdfIntegratorBase::Config (tsdf_integrator.h:56-89)
- EsdfIntegratorConfig  <- EsdfIntegrator::Config (esdf_integrator.h:29-78)
- OccupancyIntegratorConfig <- OccupancyIntegrator::Config
  (occupancy_integrator.h:24-37)
- MeshIntegratorConfig  <- mesh_integrator.h
- MapConfig             <- TsdfMap::Config (core/tsdf_map.h:25-31)

ROS-layer derived defaults (ros_params.h:66-67, :136-137) are provided via
``derive_defaults``. All configs are hashable frozen dataclasses -> usable
as jit static args.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class MapConfig:
    voxel_size: float = 0.2
    voxels_per_side: int = 16
    # Pool sizing (TPU-specific: shape-stable device allocation).
    max_blocks: int = 4096
    table_capacity: Optional[int] = None

    @property
    def block_size(self) -> float:
        return self.voxel_size * self.voxels_per_side


@dataclasses.dataclass(frozen=True)
class TsdfIntegratorConfig:
    default_truncation_distance: float = 0.1
    max_weight: float = 10000.0
    voxel_carving_enabled: bool = True
    min_ray_length_m: float = 0.1
    max_ray_length_m: float = 5.0
    use_const_weight: bool = False
    allow_clear: bool = True
    use_weight_dropoff: bool = True
    use_sparsity_compensation_factor: bool = False
    sparsity_compensation_factor: float = 1.0
    # merged-integrator option (tsdf_integrator.h:80-82)
    enable_anti_grazing: bool = False
    # fast-integrator options (tsdf_integrator.h:83-89)
    start_voxel_subsampling_factor: float = 2.0
    max_consecutive_ray_collisions: int = 2
    clear_checks_every_n_frames: int = 1
    # TPU-specific: static DDA step budget override (None = derived).
    max_steps: Optional[int] = None
    # Max point batch per integrate call (rays are padded to this).
    max_points: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class EsdfIntegratorConfig:
    full_euclidean_distance: bool = False
    max_distance_m: float = 2.0
    min_distance_m: float = 0.2
    default_distance_m: float = 2.0
    min_diff_m: float = 0.001
    min_weight: float = 1e-6
    num_buckets: int = 20  # kept for config parity; sweeps don't use it
    multi_queue: bool = False
    # Batch mode: seed unobserved voxels of processed blocks as
    # hallucinated occupied (-default_distance_m) so unknown space acts
    # as an obstacle (esdf_integrator.cc:155-163).
    add_occupied_crust: bool = False
    clear_sphere_radius: float = 1.5
    occupied_sphere_radius: float = 5.0
    # TPU-specific sweep scheduling: inner relaxations per halo rebuild.
    # 8 measured fastest on a v5e (vs 4: fewer halo rebuilds; vs 16: less
    # converged-region oversweep).
    inner_sweeps: int = 8
    # Hard cap on outer sweep iterations per update (convergence guard).
    max_outer_sweeps: int = 64
    # Static budget of pool rows materialized per sweep (None = whole
    # pool). Sweep work scales with this, not with max_blocks; rows beyond
    # the budget are reported via the overflow flag.
    max_active_blocks: Optional[int] = None
    # Run the fused Pallas relaxation kernel (TPU; quasi-euclidean only —
    # full-euclidean keeps the XLA path). Interpreted on other backends.
    use_pallas_kernel: bool = False
    # Pallas-path stride schedule per halo exchange (overrides
    # inner_sweeps when set). Stride-k relaxations take k-voxel jumps of
    # cost k*step — valid chamfer paths, so values stay upper bounds of
    # the fixpoint — crossing a block in log passes instead of 16; the
    # trailing 1s keep the exact fixpoint. Jumps are gated PER VOXEL on
    # the Chebyshev ball of radius k-1 being observed, non-fixed and
    # sign-uniform (jumps would otherwise tunnel across unobserved
    # pockets or surfaces and permanently under-estimate); elsewhere
    # only the unit sweeps act. E.g. (8, 4, 2, 1).
    sweep_strides: Optional[tuple] = None
    # Incremental-update outer-sweep cap with carried convergence debt
    # (None = relax to convergence per update, the reference's
    # semantics). When set, each incremental update runs at most this
    # many outer iterations and rows still changing at the cap carry a
    # SWEEP_DEBT flag that re-enters the next update's sweep region —
    # the fixpoint is monotone, so the field converges across scans
    # while per-scan latency stays bounded. Staleness is bounded by
    # (outers deficit) x inner_sweeps x voxel_size of propagation
    # distance; a final uncapped update (or batch rebuild) settles the
    # exact field.
    max_outer_sweeps_incremental: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class OccupancyIntegratorConfig:
    probability_hit: float = 0.65
    probability_miss: float = 0.4
    threshold_min: float = 0.12
    threshold_max: float = 0.97
    threshold_occupancy: float = 0.7
    min_ray_length_m: float = 0.1
    max_ray_length_m: float = 5.0
    max_steps: Optional[int] = None
    max_points: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class MeshIntegratorConfig:
    use_color: bool = True
    min_weight: float = 1e-4
    # TPU-specific (device-resident mesh pool): per-block triangle
    # capacity of the HBM mesh pool (rows that exceed it are flagged and
    # re-meshed through the dense host fallback on export), and how many
    # dirty rows one incremental update program marches (rows beyond the
    # bucket stay dirty for the next update).
    device_tri_cap: int = 512
    update_bucket: int = 64
    # Cap on COMPACTED surface cubes per update program (None = every
    # cube may survive: bucket * tri_cap). The whole post-compaction
    # chain — corner taps, edge lerps, color selects, content scatter —
    # scales with this budget, and typical scenes keep far fewer cubes
    # than the worst case; rows whose cubes spill past the budget are
    # flagged overflow and re-meshed through the dense fallback on
    # export AND on the wire path (io/mesh_msg encodes them dense-side),
    # so a tight budget can never corrupt the mesh.
    march_cube_budget: "int | None" = None


@dataclasses.dataclass(frozen=True)
class IcpConfig:
    # alignment/icp.h:74-110
    refine_roll_pitch: bool = False
    mini_batch_size: int = 20
    min_match_ratio: float = 0.8
    subsample_keep_ratio: float = 0.5
    inital_translation_weighting: float = 100.0
    inital_rotation_weighting: float = 100.0


def derive_defaults(
    voxel_size: float,
    tsdf: TsdfIntegratorConfig | None = None,
    esdf: EsdfIntegratorConfig | None = None,
):
    """ROS-layer derived defaults: truncation = 4 * voxel_size
    (ros_params.h:66-67), esdf min_distance = truncation / 2 but at least
    the struct default (ros_params.h:136-137)."""
    tsdf = tsdf or TsdfIntegratorConfig()
    truncation = 4.0 * voxel_size
    tsdf = dataclasses.replace(tsdf, default_truncation_distance=truncation)
    esdf = esdf or EsdfIntegratorConfig()
    esdf = dataclasses.replace(
        esdf, min_distance_m=max(truncation / 2.0, esdf.min_distance_m)
    )
    return tsdf, esdf

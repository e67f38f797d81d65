#!/usr/bin/env python
"""Benchmark: TSDF integration throughput (points/s) on one chip.

Headline metric mirrors BASELINE.md's derived north-star: the reference's
fast integrator at 5 cm voxels does 640x480 (~300k-point) Kinect scans in
23 ms on a quad-core i7 => ~13 M points/s. We integrate 640x480 (307k
point) scans from varied viewpoints of the cylinder+ground world (the
test_sdf_integrators scene) at 5 cm voxels with the projective
(voxel-centric) integrator and report steady-state points/s.
vs_baseline = ours / 13e6.

Prints ONE JSON line; extra detail goes to stderr.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from voxblox_tpu.core import layer as vlayer
    from voxblox_tpu.core.config import (
        EsdfIntegratorConfig,
        TsdfIntegratorConfig,
    )
    from voxblox_tpu.ops import esdf as esdf_ops
    from voxblox_tpu.ops import projective
    from voxblox_tpu.ops import render as render_ops
    from voxblox_tpu.ops import tsdf as tsdf_ops
    from voxblox_tpu.sim import world as sw

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    # Scene: cylinder + ground (test_sdf_integrators.cc world).
    w = sw.SimulationWorld()
    w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
    w.add_ground_level(0.0)
    objs = w.freeze()

    res = (640, 480)  # sensor resolution (matches the baseline's Kinect)
    virt = (320, 240)  # virtual range-image resolution of the integrator
    n_points = res[0] * res[1]
    voxel = 0.05
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=4 * voxel, max_ray_length_m=5.0
    )

    # Pre-render scans from a circle of poses (device arrays). The sensor
    # delivers ORGANIZED (raster-ordered) clouds — like the Kinect's PCL
    # organized clouds the reference's cow-and-lady pipeline subscribes
    # to — enabling the scatter-free min-pool binning path. One jitted
    # function covers the render (eager chains are slow to warm through
    # the remote-compile path).
    n_poses = 16
    fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
    intrinsics = (fx, fx, res[0] / 2.0, res[1] / 2.0)

    @jax.jit
    def make_scan(origin, view):
        R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
        pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(
            objs, (R, origin), res, np.deg2rad(60.0), 8.0
        )
        return R, pts_C, colors

    scans = []
    print("rendering scans (first-compile can take minutes)...",
          file=sys.stderr)
    for i in range(n_poses):
        a = 2 * np.pi * i / n_poses
        pos = jnp.asarray(
            [4.0 * np.cos(a), 4.0 * np.sin(a), 2.0], jnp.float32
        )
        view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
        R, pts_C, colors = make_scan(pos, view)
        scans.append((R, pos, pts_C, colors))
    jax.block_until_ready(scans[-1][2])

    # Throughput mode: 16 scans per dispatch (associative accumulation
    # makes this exactly sequential-equivalent; one dispatch per round
    # amortizes the remote-dispatch overhead).
    K = 16
    batches = []
    for s0 in range(0, n_poses, K):
        group = scans[s0 : s0 + K]
        batches.append((
            jnp.stack([g[0] for g in group]),
            jnp.stack([g[1] for g in group]),
            jnp.stack([g[2] for g in group]),
            jnp.stack([g[3] for g in group]),
        ))

    def run_epoch(layer, n_rounds):
        for _ in range(n_rounds):
            for Rs, ts, pts, cols in batches:
                layer, _ = projective.integrate_organized_projective_batch(
                    layer, Rs, ts, pts, cols, cfg,
                    intrinsics=intrinsics, pool=res[0] // virt[0],
                    max_visible_blocks=256, max_mixed_slabs=2048,
                    max_free_slabs=512,
                )
        # Force a device->host readback: through the remote-TPU tunnel,
        # block_until_ready alone can under-wait; reading a scalar derived
        # from the result guarantees the full chain executed.
        float(jnp.sum(layer.channels["weight"][:1]))
        return layer

    # Warmup (compile + allocate).
    print("warmup epoch (integrator compile)...", file=sys.stderr)
    layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
    layer = run_epoch(layer, 1)
    print("timing...", file=sys.stderr)

    # Steady state: re-integrating a live map from varied viewpoints with
    # the projective (voxel-centric) integrator — the TPU-native fast path.
    rounds = 4
    t0 = time.perf_counter()
    layer = run_epoch(layer, rounds)
    dt = time.perf_counter() - t0
    scans_done = rounds * n_poses
    points_per_sec = scans_done * n_points / dt
    ms_per_scan = dt / scans_done * 1e3

    baseline = 13e6  # reference fast integrator, 5 cm (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "tsdf_integration_points_per_sec",
                "value": round(points_per_sec),
                "unit": "points/s",
                "vs_baseline": round(points_per_sec / baseline, 2),
            }
        ),
        flush=True,
    )

    # Secondary numbers (stderr only; best-effort).
    try:
        _secondary(jax, jnp, np, layer, voxel, esdf_ops, render_ops,
                   points_per_sec, ms_per_scan)
    except Exception as e:  # pragma: no cover
        print(f"secondary metrics failed: {e}", file=sys.stderr)


def _secondary(jax, jnp, np, layer, voxel, esdf_ops, render_ops,
               points_per_sec, ms_per_scan):
    import time
    import sys
    from voxblox_tpu.core import layer as vlayer
    from voxblox_tpu.core.config import EsdfIntegratorConfig

    # Fused Pallas relaxation, 4 unit sweeps per halo exchange (123 ms vs
    # 133 ms for the XLA path). The jump-flooding stride schedule
    # (sweep_strides) is NOT used here: its soundness gate restricts
    # jumps to fully-observed sign-uniform blocks, and on this
    # partially-observed (frustum-carved) map almost no block qualifies,
    # so it degenerates to one unit sweep per exchange.
    ecfg = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=2 * voxel,
        max_active_blocks=1024, use_pallas_kernel=True, inner_sweeps=4,
    )
    esdf_layer = vlayer.make_layer("esdf", voxel, vps=16, max_blocks=4096)
    esdf_layer, _, _ = esdf_ops.update_from_tsdf_batch(esdf_layer, layer, ecfg)
    jax.block_until_ready(esdf_layer.channels["esdf"])
    t0 = time.perf_counter()
    esdf_layer2, _, iters = esdf_ops.update_from_tsdf_batch(
        esdf_layer, layer, ecfg
    )
    jax.block_until_ready(esdf_layer2.channels["esdf"])
    esdf_ms = (time.perf_counter() - t0) * 1e3

    n_rays = 65536
    ang = np.linspace(-0.4, 0.4, n_rays).astype(np.float32)
    dirs = jnp.asarray(
        np.stack([np.sin(ang), np.cos(ang), np.zeros(n_rays)], -1)
    )
    origins = jnp.broadcast_to(jnp.asarray([0.0, -4.0, 2.0]), dirs.shape)
    depth, hit = render_ops.render_depth(layer, origins, dirs, 8.0)
    jax.block_until_ready(depth)
    # Median of 3 timed groups: single groups occasionally catch leftover
    # tunnel/compile turbulence (measured 25x outliers right after an
    # unrelated first-compile; isolated reruns are stable within 3%).
    times = []
    for g in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            # Vary the origin per call: identical inputs can be memoized
            # somewhere in the remote-TPU path (see CLAUDE.md).
            depth, hit = render_ops.render_depth(
                layer, origins + np.float32(1e-4 * (4 * g + i + 1)), dirs, 8.0
            )
        float(depth[0])  # readback-forced sync
        times.append(time.perf_counter() - t0)
    rays_per_sec = 4 * n_rays / sorted(times)[1]

    print(
        f"tsdf projective: {ms_per_scan:.3f} ms/scan ({points_per_sec/1e6:.1f} M "
        f"points/s); esdf batch: {esdf_ms:.1f} ms ({int(iters)} sweeps); "
        f"render: {rays_per_sec/1e6:.2f} M rays/s; "
        f"blocks: {int(layer.num_blocks)}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()

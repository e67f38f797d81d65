"""Multi-chip scaling benchmark (SURVEY.md §2.7 deliverable c).

Runs the scan-sharded projective TSDF integration (DP over the 'rays'
mesh axis, psum-merged voxel accumulators) and the block-sharded ESDF
sweep at 1 / 2 / 4 / 8 devices and reports ms/scan + points/s per config,
verifying the sharded result matches the single-device map.

On this image only ONE real TPU chip is reachable, so by default each
config runs in a subprocess on N **virtual CPU devices**
(``--xla_force_host_platform_device_count``) — that validates the full
sharded program (shard_map partitioning, psum/halo collectives, replicated
allocation) end-to-end, but all virtual devices share the host's cores, so
wall-clock numbers do NOT show real speedup. On a real TPU slice run with
``--real`` (uses the ambient jax.devices()) to get true ICI-scaled
numbers; the program is identical.

Usage: python benchmarks/scaling_bench.py [--real] [--devices 1,2,4,8]
"""

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
import numpy as np
import jax
_REPO = os.environ["VOXBLOX_REPO"]
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("VOXBLOX_JAX_CACHE",
                                 os.path.join(_REPO, ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, _REPO)
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import EsdfIntegratorConfig, TsdfIntegratorConfig
from voxblox_tpu.ops import esdf as esdf_ops
from voxblox_tpu.parallel import sharding
from voxblox_tpu.sim import world as sw

n = int(sys.argv[1])
assert len(jax.devices()) >= n, (n, jax.devices())
mesh = sharding.make_mesh(n, rays=n)  # pure scan-DP for the integrate

w = sw.SimulationWorld()
w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
w.add_ground_level(0.0)
objs = w.freeze()

res = (320, 240)
K = 8
voxel = 0.05
fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
intr = (fx, fx, res[0] / 2.0, res[1] / 2.0)
cfg = TsdfIntegratorConfig(
    default_truncation_distance=4 * voxel, max_ray_length_m=8.0
)

@jax.jit
def make_scan(pos, view):
    R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
    p, c, _, _ = sw.organized_pointcloud_from_transform(
        objs, (R, pos), res, np.deg2rad(60.0), 8.0
    )
    return R, p, c

Rs, ts, pts, cols = [], [], [], []
for i in range(K):
    a = 2 * np.pi * i / K
    pos = jnp.asarray([4.0 * np.cos(a), 4.0 * np.sin(a), 2.0], jnp.float32)
    view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
    R, p, c = make_scan(pos, view)
    Rs.append(R); ts.append(pos); pts.append(p); cols.append(c)
Rs, ts, pts, cols = map(jnp.stack, (Rs, ts, pts, cols))
jax.block_until_ready(pts)

def integrate(layer, jitter):
    return sharding.integrate_projective_batch_sharded(
        mesh, layer, Rs, ts + jitter, pts, cols, cfg,
        kind="pinhole_organized", intrinsics=intr, pool=1,
        max_visible_blocks=512, max_mixed_slabs=4096, max_free_slabs=2048,
    )

layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
layer, ovf = integrate(layer, 0.0)
jax.block_until_ready(layer.channels["tsdf"])
assert not bool(ovf)

reps = 3
t0 = time.perf_counter()
for r in range(reps):
    layer, ovf = integrate(layer, np.float32(1e-5 * (r + 1)))
float(jnp.sum(layer.channels["weight"][:1]))  # readback-forced sync
dt = (time.perf_counter() - t0) / (reps * K)
n_points = res[0] * res[1]

# Block-sharded ESDF sweep over the built map.
ecfg = EsdfIntegratorConfig(
    max_distance_m=2.0, default_distance_m=2.0, min_distance_m=2 * voxel,
    max_active_blocks=1024,
)
bmesh = sharding.make_mesh(n, rays=1)  # pure block-sharding
esdf_layer = vlayer.make_layer("esdf", voxel, vps=16, max_blocks=4096)
rows_mask = layer.active_mask()
esdf_layer, _ = esdf_ops._sync_blocks(esdf_layer, layer, rows_mask)
esdf_layer, _, _ = esdf_ops.seed_from_tsdf(esdf_layer, layer, ecfg, rows_mask)
t0 = time.perf_counter()
esdf_layer, iters = sharding.lower_sweep_sharded(bmesh, esdf_layer, ecfg)
jax.block_until_ready(esdf_layer.channels["esdf"])
esdf_ms = (time.perf_counter() - t0) * 1e3

print(json.dumps({
    "n_devices": n,
    "integrate_ms_per_scan": round(dt * 1e3, 3),
    "points_per_sec": round(K and n_points / dt),
    "esdf_sweep_ms": round(esdf_ms, 1),
    "esdf_iters": int(iters),
    "blocks": int(layer.num_blocks),
}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", action="store_true",
                    help="use the ambient devices (TPU slice) directly")
    ap.add_argument("--devices", default="1,2,4,8")
    args = ap.parse_args()
    results = []
    for n in [int(x) for x in args.devices.split(",")]:
        env = dict(os.environ)
        env["VOXBLOX_REPO"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        if not args.real:
            env.pop("PALLAS_AXON_POOL_IPS", None)
            env["JAX_PLATFORMS"] = "cpu"
            env["XLA_FLAGS"] = (
                env.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={n}"
            )
        res = subprocess.run(
            [sys.executable, "-c", _CHILD, str(n)],
            capture_output=True, text=True, env=env, timeout=1800,
        )
        line = res.stdout.strip().splitlines()[-1] if res.stdout.strip() else ""
        if res.returncode != 0 or not line.startswith("{"):
            print(f"n={n} FAILED:\n{res.stdout[-2000:]}\n{res.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        r = json.loads(line)
        results.append(r)
        print(line, flush=True)
    if results and not args.real:
        print(
            "# NOTE: virtual CPU devices share the host cores — these "
            "validate the sharded program, not real scaling; run --real "
            "on a TPU slice for ICI-scaled numbers.",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()

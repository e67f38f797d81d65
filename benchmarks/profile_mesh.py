"""Trace the device-resident incremental mesh update (dev tool)."""
import os, sys, time
import numpy as np
import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, _REPO)
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import MeshIntegratorConfig, TsdfIntegratorConfig
from voxblox_tpu.ops import mesh as mesh_ops
from voxblox_tpu.ops import projective
from voxblox_tpu.sim import world as sw

w = sw.SimulationWorld()
w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
w.add_ground_level(0.0)
objs = w.freeze()

res = (640, 480)
voxel = 0.05
cfg = TsdfIntegratorConfig(
    default_truncation_distance=4 * voxel, max_ray_length_m=5.0
)
fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
intrinsics = (fx, fx, res[0] / 2.0, res[1] / 2.0)

@jax.jit
def make_scan(origin, view):
    R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
    pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(
        objs, (R, origin), res, np.deg2rad(60.0), 8.0
    )
    return R, pts_C, colors

K = 16
scans = []
for i in range(K):
    a = 2 * np.pi * i / K
    pos = jnp.asarray([4.0 * np.cos(a), 4.0 * np.sin(a), 2.0], jnp.float32)
    view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
    scans.append(make_scan(pos, view) + (pos,))
layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
layer, _ = projective.integrate_organized_projective_batch(
    layer, jnp.stack([s[0] for s in scans]), jnp.stack([s[3] for s in scans]),
    jnp.stack([s[1] for s in scans]), jnp.stack([s[2] for s in scans]), cfg,
    intrinsics=intrinsics, pool=2,
    max_visible_blocks=256, max_mixed_slabs=2048, max_free_slabs=512,
)
jax.block_until_ready(layer.channels["tsdf"])
print("blocks:", int(layer.num_blocks), file=sys.stderr)

mcfg = MeshIntegratorConfig(march_cube_budget=8192)
pool = mesh_ops.make_mesh_pool(layer.max_blocks, mcfg.device_tri_cap)
active_rows = np.nonzero(np.asarray(layer.active_mask()))[0]
bucket = 64

import functools, dataclasses

@functools.partial(jax.jit, donate_argnums=(1,))
def _mark_and_update(layer, pool, rows_j):
    layer = vlayer.mark_dirty(
        layer, rows_j, jnp.ones(rows_j.shape[0], bool), vlayer.DIRTY_MESH
    )
    flags, pool, _ = mesh_ops._update_mesh_pool_jit(
        layer, pool, mcfg.min_weight, True, bucket, True,
        cube_budget=mcfg.march_cube_budget,
    )
    return flags, pool

def one_update(layer, pool, rows):
    flags, pool = _mark_and_update(layer, pool, jnp.asarray(rows, jnp.int32))
    return dataclasses.replace(layer, block_flags=flags), pool

for s in range(0, len(active_rows), bucket):
    layer, pool = one_update(layer, pool, active_rows[s : s + bucket])
float(jnp.sum(pool.counts[:1]))

rng = np.random.default_rng(0)
# timed, untraced (median-of-5 sanity number)
times = []
for g in range(5):
    rows = rng.choice(active_rows, size=min(bucket, len(active_rows)),
                      replace=False)
    t0 = time.perf_counter()
    layer, pool = one_update(layer, pool, rows)
    float(jnp.sum(pool.counts[:1]))
    times.append((time.perf_counter() - t0) * 1e3)
print("untraced ms:", [round(t, 1) for t in times], file=sys.stderr)

with jax.profiler.trace("/tmp/vbx_trace_mesh"):
    for g in range(3):
        rows = rng.choice(active_rows, size=min(bucket, len(active_rows)),
                          replace=False)
        layer, pool = one_update(layer, pool, rows)
    float(jnp.sum(pool.counts[:1]))
print("trace done", file=sys.stderr)

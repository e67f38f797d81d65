"""Capture a device trace of the orbit-bench batched projective integrate.

Writes an xplane trace under /tmp/vbx_trace; parse with
benchmarks/parse_trace.py. Not part of the bench suite — a development
tool (CLAUDE.md: use jax.profiler.trace and look at op-level splits
before guessing).
"""
import sys, time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import projective
from voxblox_tpu.sim import world as sw

w = sw.SimulationWorld()
w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
w.add_ground_level(0.0)
objs = w.freeze()

res = (640, 480)
virt = (320, 240)
voxel = 0.05
cfg = TsdfIntegratorConfig(
    default_truncation_distance=4 * voxel, max_ray_length_m=5.0
)
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
for i in range(n_poses):
    a = 2 * np.pi * i / n_poses
    pos = jnp.asarray([4.0 * np.cos(a), 4.0 * np.sin(a), 2.0], jnp.float32)
    view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
    scans.append(make_scan(pos, view) + (pos,))
jax.block_until_ready(scans[-1][1])
Rs = jnp.stack([s[0] for s in scans])
ts = jnp.stack([s[3] for s in scans])
pts = jnp.stack([s[1] for s in scans])
cols = jnp.stack([s[2] for s in scans])

def run(layer, i):
    layer, _ = projective.integrate_organized_projective_batch(
        layer, Rs, ts + i * 1e-5, pts, cols, cfg,
        intrinsics=intrinsics, pool=res[0] // virt[0],
        max_visible_blocks=256, max_mixed_slabs=2048, max_free_slabs=512,
    )
    return layer

layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
layer = run(layer, 0)
layer = run(layer, 1)
float(jnp.sum(layer.channels["weight"][:1]))
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/vbx_trace"):
    layer = run(layer, 2)
    layer = run(layer, 3)
    float(jnp.sum(layer.channels["weight"][:1]))
dt = time.perf_counter() - t0
print(f"traced 2 batch calls: {dt*1e3/32:.3f} ms/scan", file=sys.stderr)

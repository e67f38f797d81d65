"""Steady-state timing of the orbit batched integrate (dev tool).

Usage: python benchmarks/time_orbit.py  -> prints ms/scan.
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

MODE = sys.argv[1] if len(sys.argv) > 1 else "batch"
MVB = int(sys.argv[2]) if len(sys.argv) > 2 else 256
MMS = int(sys.argv[3]) if len(sys.argv) > 3 else 2048
MFS = int(sys.argv[4]) if len(sys.argv) > 4 else 512
if MODE == "sharded1":
    from voxblox_tpu.parallel import sharding
    mesh1 = sharding.make_mesh(1, rays=1)

    def run(layer, i):
        layer, ovf = sharding.integrate_projective_batch_sharded(
            mesh1, layer, Rs, ts + i * 1e-5, pts, cols, cfg,
            kind="pinhole_organized",
            intrinsics=intrinsics, pool=res[0] // virt[0],
            max_visible_blocks=MVB, max_mixed_slabs=MMS, max_free_slabs=MFS,
        )
        return layer, ovf
else:
    def run(layer, i):
        layer, ovf = projective.integrate_organized_projective_batch(
            layer, Rs, ts + i * 1e-5, pts, cols, cfg,
            intrinsics=intrinsics, pool=res[0] // virt[0],
            max_visible_blocks=MVB, max_mixed_slabs=MMS, max_free_slabs=MFS,
        )
        return layer, ovf

layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
t0 = time.perf_counter()
layer, ovf = run(layer, 0)
float(jnp.sum(layer.channels["weight"][:1]))
print(f"first call (compile): {time.perf_counter()-t0:.1f} s", file=sys.stderr)
layer, ovf = run(layer, 1)
float(jnp.sum(layer.channels["weight"][:1]))
reps = 8
t0 = time.perf_counter()
for i in range(reps):
    layer, ovf = run(layer, i + 2)
float(jnp.sum(layer.channels["weight"][:1]))
dt = (time.perf_counter() - t0) / (reps * n_poses)
print(f"orbit: {dt*1e3:.3f} ms/scan ({res[0]*res[1]/dt/1e6:.1f} M pts/s) overflow={bool(ovf)}")

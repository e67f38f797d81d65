"""Trace the differentiable renderer on the orbit map (dev tool)."""
import sys, time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import projective, render as render_ops
from voxblox_tpu.sim import world as sw

w = sw.SimulationWorld()
w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
w.add_ground_level(0.0)
objs = w.freeze()
res = (640, 480)
voxel = 0.05
cfg = TsdfIntegratorConfig(default_truncation_distance=4 * voxel,
                           max_ray_length_m=5.0)
fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
intr = (fx, fx, res[0] / 2.0, res[1] / 2.0)

@jax.jit
def mk(o, v):
    R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), v)
    p, c, _, _ = sw.organized_pointcloud_from_transform(
        objs, (R, o), res, np.deg2rad(60.0), 8.0)
    return R, p, c

S = [mk(jnp.asarray([4*np.cos(a), 4*np.sin(a), 2.0], jnp.float32),
        jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32))
     + (jnp.asarray([4*np.cos(a), 4*np.sin(a), 2.0], jnp.float32),)
     for a in [2*np.pi*i/16 for i in range(16)]]
layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
layer, _ = projective.integrate_organized_projective_batch(
    layer, jnp.stack([s[0] for s in S]), jnp.stack([s[3] for s in S]),
    jnp.stack([s[1] for s in S]), jnp.stack([s[2] for s in S]), cfg,
    intrinsics=intr, pool=2, max_visible_blocks=256, max_mixed_slabs=2048,
    max_free_slabs=512)
jax.block_until_ready(layer.channels["tsdf"])

n_rays = 65536
ang = np.linspace(-0.4, 0.4, n_rays).astype(np.float32)
dirs = jnp.asarray(np.stack([np.sin(ang), np.cos(ang), np.zeros(n_rays)], -1))
origins = jnp.broadcast_to(jnp.asarray([0.0, -4.0, 2.0]), dirs.shape)
depth, hit = render_ops.render_depth(layer, origins, dirs, 8.0)
jax.block_until_ready(depth)
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/render_trace"):
    for i in range(2):
        depth, hit = render_ops.render_depth(
            layer, origins + np.float32(1e-4 * (i + 1)), dirs, 8.0)
    float(depth[0])
print(f"{2*n_rays/(time.perf_counter()-t0)/1e6:.2f} M rays/s",
      file=sys.stderr)

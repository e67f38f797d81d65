"""Trace the batch ESDF update on the orbit map (dev tool)."""
import sys, time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import EsdfIntegratorConfig, TsdfIntegratorConfig
from voxblox_tpu.ops import esdf as esdf_ops
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

ecfg = EsdfIntegratorConfig(
    max_distance_m=2.0, default_distance_m=2.0, min_distance_m=2 * voxel,
    max_active_blocks=1024, use_pallas_kernel=True, inner_sweeps=4, max_outer_sweeps=40,
)
esdf_layer = vlayer.make_layer("esdf", voxel, vps=16, max_blocks=4096)
esdf_layer, _, _ = esdf_ops.update_from_tsdf_batch(esdf_layer, layer, ecfg)
jax.block_until_ready(esdf_layer.channels["esdf"])
t0 = time.perf_counter()
with jax.profiler.trace("/tmp/esdf_trace"):
    esdf_layer, _, iters = esdf_ops.update_from_tsdf_batch(
        esdf_layer, layer, ecfg
    )
    jax.block_until_ready(esdf_layer.channels["esdf"])
print(f"esdf batch: {(time.perf_counter()-t0)*1e3:.1f} ms, "
      f"{int(iters)} outers", file=sys.stderr)

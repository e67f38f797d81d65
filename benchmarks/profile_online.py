"""Trace the fused online step (integrate + incremental ESDF; dev tool)."""
import os, sys, time
import numpy as np
import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, _REPO)
from voxblox_tpu.core.config import (EsdfIntegratorConfig, MapConfig,
                                     TsdfIntegratorConfig)
from voxblox_tpu.ops import esdf as esdf_ops
from voxblox_tpu.server.mapper import EsdfServer
from voxblox_tpu.sim import world as sw

w = sw.SimulationWorld()
w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
w.add_ground_level(0.0)
objs = w.freeze()
res = (640, 480); virt = (320, 240); voxel = 0.05
cfg = TsdfIntegratorConfig(default_truncation_distance=4 * voxel,
                           max_ray_length_m=5.0)

@jax.jit
def make_scan(origin, view):
    R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
    pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(
        objs, (R, origin), res, np.deg2rad(60.0), 8.0
    )
    return R, pts_C, colors

scans = []
for i in range(16):
    a = 2 * np.pi * i / 16
    pos = jnp.asarray([4.0*np.cos(a), 4.0*np.sin(a), 2.0], jnp.float32)
    view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
    R, p, c = make_scan(pos, view)
    scans.append((R, pos, p, c))
jax.block_until_ready(scans[-1][2])

fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
srv = EsdfServer(
    map_config=MapConfig(voxel_size=voxel, max_blocks=4096),
    integrator_config=cfg,
    esdf_config=EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0,
        min_distance_m=2*voxel, max_active_blocks=1024,
        use_pallas_kernel=True, inner_sweeps=4,
    ),
    method="projective", projective_resolution=virt,
    projective_fov_deg=60.0,
    projective_intrinsics=(fx, fx, res[0] / 2.0, res[1] / 2.0),
    projective_pool=res[0] // virt[0],
    projective_max_visible_blocks=256,
    projective_max_mixed_slabs=2048, projective_max_free_slabs=512,
    overflow_check_interval=10_000,
)
esdf_ops.presize_bucket(srv.esdf_cfg, srv.esdf_layer, 373)

def step(i):
    R, pos, pts_C, cols = scans[i % 16]
    srv.insert_pointcloud_and_update_esdf((R, pos), pts_C, cols)

for i in range(16):
    step(i)
srv.check_overflow()
for i in range(4):
    step(i)
float(jnp.sum(srv.esdf_layer.channels["esdf"][:1]))

t0 = time.perf_counter()
for i in range(8):
    step(4 + i)
float(jnp.sum(srv.esdf_layer.channels["esdf"][:1]))
print(f"untraced: {(time.perf_counter()-t0)*1e3/8:.1f} ms/scan",
      file=sys.stderr)

with jax.profiler.trace("/tmp/online_trace"):
    for i in range(4):
        step(12 + i)
    float(jnp.sum(srv.esdf_layer.channels["esdf"][:1]))
print("trace done", file=sys.stderr)

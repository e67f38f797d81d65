"""Velodyne-style long-range spherical integration bench (KITTI table).

Reference (BASELINE.md): KITTI velodyne, 0.2 m voxels / 50 m range:
44 ms/scan (merged, i7 quad-core). Scene: street-like world, 2048x64
beam scans from a moving viewpoint.
"""
import sys, time
import numpy as np, jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import projective as P
from voxblox_tpu.sim import world as sw

w = sw.SimulationWorld()
w.add_ground_level(0.0)
# Street canyon: two wall planes + poles/trees.
w.add_plane((0.0, 12.0, 5.0), (0.0, -1.0, 0.0), color=(180, 160, 140))
w.add_plane((0.0, -12.0, 5.0), (0.0, 1.0, 0.0), color=(140, 160, 180))
rng = np.random.RandomState(0)
for i in range(12):
    x = rng.uniform(-40, 40)
    y = rng.uniform(-9, 9)
    w.add_cylinder((x, y, 2.5), rng.uniform(0.2, 1.0), 5.0,
                   color=(30, 200, 30))
objs = w.freeze()

RESO = (2048, 64)
N_PTS = RESO[0] * RESO[1]
VOXEL = 0.2
cfg = TsdfIntegratorConfig(
    default_truncation_distance=4 * VOXEL, max_ray_length_m=50.0,
    voxel_carving_enabled=False,
)

@jax.jit
def make_scan(pos):
    R = jnp.eye(3)
    pts_C, cols, valid = sw.spherical_pointcloud_from_transform(
        objs, (R, pos), RESO, fov_up_deg=3.0, fov_down_deg=-25.0,
        max_dist=50.0,
    )
    return pts_C, cols

K = 16
poses = [jnp.asarray([-20.0 + 2.5 * i, 0.0, 2.0], jnp.float32)
         for i in range(K)]
scans = [make_scan(p) for p in poses]
jax.block_until_ready(scans[-1][0])
Rs = jnp.stack([jnp.eye(3)] * K)
ts_ = jnp.stack(poses)
pts = jnp.stack([s[0] for s in scans])
cols = jnp.stack([s[1] for s in scans])

MVB = int(sys.argv[1]) if len(sys.argv) > 1 else 3072
MMS = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
MFS = int(sys.argv[3]) if len(sys.argv) > 3 else 512

layer = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=16384)

def run(layer, i):
    layer, ovf = P.integrate_pointcloud_projective_batch(
        layer, Rs, ts_ + i * 1e-5, pts, cols, cfg,
        resolution=(2048, 64), kind="spherical_organized",
        fov_up_deg=3.0, fov_down_deg=-25.0,
        max_visible_blocks=MVB, max_mixed_slabs=MMS, max_free_slabs=MFS,
    )
    return layer, ovf

print("compiling...", file=sys.stderr)
layer, ovf = run(layer, 0)
jax.block_until_ready(layer.channels["tsdf"])
print("blocks:", int(layer.num_blocks), "overflow:", bool(ovf),
      file=sys.stderr)
TRACE = "--trace" in sys.argv
if TRACE:
    import jax.profiler
    with jax.profiler.trace("/tmp/velo_trace"):
        layer, ovf = run(layer, 1)
        float(jnp.sum(layer.channels["weight"][:1]))
t0 = time.perf_counter()
reps = 3
for i in range(reps):
    layer, ovf = run(layer, i + 1 + (1 if TRACE else 0))
float(jnp.sum(layer.channels["weight"][:1]))
dt = (time.perf_counter() - t0) / (reps * K)
print(f"velodyne 0.2m/50m: {dt*1e3:.2f} ms/scan "
      f"({N_PTS/dt/1e6:.1f} M pts/s) vs reference 44 ms "
      f"(x{44/(dt*1e3):.1f}); overflow={bool(ovf)}")

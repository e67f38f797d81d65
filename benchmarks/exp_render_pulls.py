"""A/B the refinement pull schedule: (nearest_pulls, trilinear_pulls).

Each 8-corner trilinear pass costs ~5-7 ms per 65k rays (per-corner
gathers at the ~60 M idx/s random-gather rate); nearest passes cost 1/8
of that. The final Newton step corrects sub-voxel error with the local
gradient, so the settling pulls may be partly redundant.
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


S = [mk(jnp.asarray([4 * np.cos(a), 4 * np.sin(a), 2.0], jnp.float32),
        jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32))
     + (jnp.asarray([4 * np.cos(a), 4 * np.sin(a), 2.0], jnp.float32),)
     for a in [2 * np.pi * i / 16 for i in range(16)]]
layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
layer, _ = projective.integrate_organized_projective_batch(
    layer, jnp.stack([s[0] for s in S]), jnp.stack([s[3] for s in S]),
    jnp.stack([s[1] for s in S]), jnp.stack([s[2] for s in S]), cfg,
    intrinsics=intr, pool=2, max_visible_blocks=256, max_mixed_slabs=2048,
    max_free_slabs=512)
jax.block_until_ready(layer.channels["tsdf"])

n_rays = 65536
rng = np.random.RandomState(7)
ang = np.linspace(-0.4, 0.4, n_rays).astype(np.float32)
elev = rng.uniform(-0.25, 0.1, n_rays).astype(np.float32)
d = np.stack([np.sin(ang) * np.cos(elev), np.cos(ang) * np.cos(elev),
              np.sin(elev)], -1).astype(np.float32)
dirs = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
origins = jnp.broadcast_to(jnp.asarray([0.0, -4.0, 2.0]), dirs.shape)

# Analytic ground truth from the simulation world's exact ray casting.
from voxblox_tpu.sim import objects as sim_objects

t_all = sim_objects.object_ray_intersections(objs, origins, dirs)  # [P,N]
gt_t = np.asarray(jnp.min(t_all, axis=-1))
gt_hit = np.isfinite(gt_t) & (gt_t <= 8.0)
gt_t = np.where(gt_hit, gt_t, 8.0)

dim = render_ops.fit_dense_grid_dim(layer)
print(f"grid dim {dim}; gt hit rate {gt_hit.mean():.3f}")


def run(np_, tp_, p1=10):
    def call(eps):
        return render_ops.render_depth(
            layer, origins + eps, dirs, 8.0, dense_grid_dim=dim,
            nearest_pulls=np_, trilinear_pulls=tp_, phase1_iters=p1)
    depth, hit = call(np.float32(0.0))
    jax.block_until_ready(depth)
    times = []
    for g in range(3):
        t0 = time.perf_counter()
        for i in range(4):
            depth, hit = call(np.float32(1e-4 * (4 * g + i + 1)))
        float(depth[0])
        times.append(time.perf_counter() - t0)
    ms = sorted(times)[1] / 4 * 1e3
    dep = np.asarray(call(np.float32(0.0))[0])
    hit_n = np.asarray(call(np.float32(0.0))[1])
    both = hit_n & gt_hit & (gt_t < 7.5)
    err = np.abs(dep - gt_t)[both]
    print(f"({np_},{tp_},p1={p1}): {ms:.2f} ms = {n_rays/ms*1e3/1e6:.2f} M rays/s"
          f" | vs GT: med {np.median(err)*1e3:.1f} mm, p95 "
          f"{np.percentile(err, 95)*1e3:.1f} mm, hits {both.sum()}")
    return dep, hit_n


base_dep, base_hit = run(4, 1)
for np_, tp_, p1 in [(4, 1, 6), (4, 1, 4), (4, 1, 3), (4, 1, 2)]:
    dep, hit = run(np_, tp_, p1)
    b = base_hit & hit
    dd = np.abs(dep - base_dep)[b]
    print(f"    vs base: med {np.median(dd)*1e3:.2f} mm, p99 "
          f"{np.percentile(dd, 99)*1e3:.1f} mm, hit match "
          f"{(hit == base_hit).mean():.4f}")

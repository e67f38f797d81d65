"""ESDF stage profile on TPU: kernel vs halo vs full update."""
import sys, time, dataclasses
from functools import partial
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig, EsdfIntegratorConfig
from voxblox_tpu.ops import projective as P
from voxblox_tpu.ops import esdf as E
from voxblox_tpu.ops.pallas import esdf_relax as PK
from voxblox_tpu.sim import world as sw

w = sw.SimulationWorld(); w.add_cylinder((0,0,2.0),2.0,4.0,color=(0,255,0)); w.add_ground_level(0.0)
objs = w.freeze()
res=(640,480); voxel=0.05
cfg=TsdfIntegratorConfig(default_truncation_distance=4*voxel, max_ray_length_m=5.0)
fx=res[0]/(2*np.tan(np.deg2rad(60.0)/2)); intr=(fx,fx,res[0]/2,res[1]/2)

@jax.jit
def make_scan(origin, view):
    R = sw.rotation_from_two_vectors(jnp.asarray([0.,0.,1.]), view)
    pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(objs,(R,origin),res,np.deg2rad(60.0),8.0)
    return R, pts_C, colors
n=16
scans=[make_scan(jnp.asarray([4*np.cos(2*np.pi*i/n),4*np.sin(2*np.pi*i/n),2.0],jnp.float32),
                 jnp.asarray([-np.cos(2*np.pi*i/n),-np.sin(2*np.pi*i/n),0.0],jnp.float32)) for i in range(n)]
Rs=jnp.stack([s[0] for s in scans]); pts=jnp.stack([s[1] for s in scans]); cols=jnp.stack([s[2] for s in scans])
ts_=jnp.stack([jnp.asarray([4*np.cos(2*np.pi*i/n),4*np.sin(2*np.pi*i/n),2.0],jnp.float32) for i in range(n)])
lay = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)
lay,_=P.integrate_organized_projective_batch(lay,Rs,ts_,pts,cols,cfg,intrinsics=intr,pool=2,
                                             max_visible_blocks=320,max_mixed_slabs=2304,max_free_slabs=512)
print("blocks:", int(lay.num_blocks), file=sys.stderr)

K = 1024
ecfg = EsdfIntegratorConfig(max_distance_m=2.0, default_distance_m=2.0,
                            min_distance_m=2*voxel, max_active_blocks=K,
                            use_pallas_kernel=True)
el = vlayer.make_layer("esdf", voxel, vps=16, max_blocks=4096)
el, _, _ = E.update_from_tsdf_batch(el, lay, ecfg)
jax.block_until_ready(el.channels["esdf"])

def tfull(ecfg, label, nrep=3):
    el2, _, it = E.update_from_tsdf_batch(el, lay, ecfg)
    jax.block_until_ready(el2.channels["esdf"])
    t0=time.perf_counter()
    for i in range(nrep):
        el2, _, it = E.update_from_tsdf_batch(el2, lay, ecfg)
    float(jnp.sum(el2.channels["esdf"][:1]))
    dt=(time.perf_counter()-t0)/nrep
    print(f"{label}: {dt*1e3:7.1f} ms ({int(it)} outer iters)")
    return el2

el2 = tfull(ecfg, "full batch K=1024 pallas  ")
tfull(dataclasses.replace(ecfg, max_active_blocks=512), "full batch K=512 pallas   ")
tfull(dataclasses.replace(ecfg, use_pallas_kernel=False), "full batch K=1024 xla     ")
tfull(dataclasses.replace(ecfg, use_pallas_kernel=False, max_active_blocks=512), "full batch K=512 xla      ")

# Standalone kernel timing: build a padded working set once.
d = jnp.asarray(np.random.RandomState(0).uniform(-2, 2, (K, 18, 18, 18)), jnp.float32)
obs = jnp.ones((K, 18, 18, 18), jnp.float32)
upd = jnp.zeros((K, 18, 18, 18), jnp.float32).at[:, 1:-1, 1:-1, 1:-1].set(1.0)

@partial(jax.jit, static_argnames=("sweeps",))
def krun(d, sweeps):
    return PK.relax_padded(d, obs, upd, sweeps, voxel, 2.0, 1e-3)

out = krun(d, 8); jax.block_until_ready(out)
t0=time.perf_counter()
for i in range(4):
    out = krun(out, 8)
float(out[0,1,1,1])
print(f"kernel 8 sweeps K={K}: {(time.perf_counter()-t0)/4*1e3:7.2f} ms")

# halo rebuild timing
nbr = E.neighbor_slot_table(el2)
vals = el2.channels["esdf"]
@jax.jit
def halo(vals):
    return E.build_padded(el2, vals, nbr, jnp.float32(0.0))
hp = halo(vals); jax.block_until_ready(hp)
t0=time.perf_counter()
for i in range(4):
    hp = halo(vals + 1e-6*i)
float(hp[0,0,0,0])
print(f"halo rebuild [4096 rows]: {(time.perf_counter()-t0)/4*1e3:7.2f} ms")

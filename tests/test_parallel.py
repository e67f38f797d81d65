"""Multi-chip sharding on a virtual 8-device CPU mesh.

Runs in a subprocess so the 8-device env doesn't slow the rest of the
suite (SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # 8-virtual-device subprocess: minutes

_SCRIPT = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import EsdfIntegratorConfig, TsdfIntegratorConfig
from voxblox_tpu.ops import tsdf as tsdf_ops
from voxblox_tpu.ops import esdf as esdf_ops
from voxblox_tpu.parallel import sharding
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import evaluation

assert len(jax.devices()) == 8, jax.devices()
mesh = sharding.make_mesh(8, rays=4)
assert mesh.shape == {"rays": 4, "blocks": 2}

w = sw.SimulationWorld()
w.add_sphere((0.0, 0.0, 2.0), 1.5, color=(255, 0, 0))
w.add_ground_level(0.0)
objs = w.freeze()
R = sw.rotation_from_two_vectors(jnp.asarray([0.,0.,1.]), jnp.asarray([0.,1.,0.]))
t = jnp.asarray([0.0, -4.0, 2.0])
pts_G, colors, valid = sw.pointcloud_from_viewpoint(
    objs, t, jnp.asarray([0.,1.,0.]), (32, 24), np.deg2rad(60.0), 8.0
)
pts_C = sw.world_points_to_sensor((R, t), pts_G, valid)

cfg = TsdfIntegratorConfig(default_truncation_distance=0.4, max_ray_length_m=8.0)

# Single-device reference: same sharded code path on a 1x1 mesh, so the
# comparison isolates sharding (compile fusion can legally flip grazing
# voxels at cell boundaries between different jit granularities).
mesh1 = sharding.make_mesh(1, rays=1)
layer1 = vlayer.make_layer("tsdf", 0.1, vps=16, max_blocks=1024)
layer1, _ = sharding.integrate_pointcloud_sharded(
    mesh1, layer1, (R, t), pts_C, colors, cfg
)

# Ray-sharded.
layer8 = vlayer.make_layer("tsdf", 0.1, vps=16, max_blocks=1024)
layer8, overflow = sharding.integrate_pointcloud_sharded(
    mesh, layer8, (R, t), pts_C, colors, cfg
)
assert not bool(overflow)

def to_host(l):
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), l)
layer1h, layer8h = to_host(layer1), to_host(layer8)
det = evaluation.evaluate_layers_rmse(layer1h, layer8h)
assert det.num_evaluated_voxels > 1000
# Accumulation is associative; differences are float-summation-order noise,
# amplified only at voxels whose total weight is ~epsilon. Compare strictly
# on well-observed voxels and loosely overall.
assert det.rmse < 1e-4, f"sharded vs single rmse {det}"
w1 = np.asarray(layer1.channels["weight"]).reshape(-1)
d1 = np.asarray(layer1.channels["tsdf"]).reshape(-1)
s8 = np.asarray(
    vlayer.lookup_blocks(layer8h, layer1h.block_ijk)
)
ok_rows = np.asarray(layer1.active_mask()) & (s8 >= 0)
vpb = layer1.voxels_per_block
d8 = np.asarray(layer8.channels["tsdf"]).reshape(-1, vpb)[s8[ok_rows]]
d1r = np.asarray(layer1.channels["tsdf"]).reshape(-1, vpb)[ok_rows]
w1r = np.asarray(layer1.channels["weight"]).reshape(-1, vpb)[ok_rows]
mask = w1r > 1e-3
assert np.abs(np.where(mask, d1r - d8, 0.0)).max() < 1e-4, (
    np.abs(np.where(mask, d1r - d8, 0.0)).max()
)
print("ray-sharded integrate OK", det.rmse)

# Block-sharded ESDF sweep.
ecfg = EsdfIntegratorConfig(max_distance_m=2.0, default_distance_m=2.0,
                            min_distance_m=0.2)
esdf1 = vlayer.make_layer("esdf", 0.1, vps=16, max_blocks=1024)
esdf1, _, _ = esdf_ops.update_from_tsdf_batch(esdf1, layer8h, ecfg)

esdf8 = vlayer.make_layer("esdf", 0.1, vps=16, max_blocks=1024)
# Seed identically, sweep sharded.
rows_mask = layer8h.active_mask()
esdf8, _ = esdf_ops._sync_blocks(esdf8, layer8h, rows_mask)
esdf8, _, _ = esdf_ops.seed_from_tsdf(esdf8, layer8h, ecfg, rows_mask)
esdf8, iters = sharding.lower_sweep_sharded(mesh, esdf8, ecfg)
det = evaluation.evaluate_layers_rmse(to_host(esdf1), to_host(esdf8))
# Sweeps converge to the same fixpoint within the min_diff tolerance.
assert det.rmse < 1e-2, f"sharded esdf rmse {det}"
print("block-sharded esdf OK", det.rmse, "iters", int(iters))

# Scan-sharded projective integration == unsharded batch (up to float
# summation order): the multi-chip DP mode of the TPU fast path.
from voxblox_tpu.ops import projective as P
res = (32, 24)
K = 8
fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
intr = (fx, fx, res[0] / 2.0, res[1] / 2.0)
Rs_l, ts_l, pts_l, cols_l = [], [], [], []
for i in range(K):
    a = 2 * np.pi * i / K
    pos = jnp.asarray([3.0 * np.cos(a), 3.0 * np.sin(a), 2.0], jnp.float32)
    view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
    Ri = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
    p, c, v_, _ = sw.organized_pointcloud_from_transform(
        objs, (Ri, pos), res, np.deg2rad(60.0), 8.0
    )
    Rs_l.append(Ri); ts_l.append(pos); pts_l.append(p); cols_l.append(c)
Rs_s, ts_s, pts_s, cols_s = map(jnp.stack, (Rs_l, ts_l, pts_l, cols_l))
pl1 = vlayer.make_layer("tsdf", 0.1, vps=16, max_blocks=1024)
pl1, povf1 = P.integrate_organized_projective_batch(
    pl1, Rs_s, ts_s, pts_s, cols_s, cfg, intrinsics=intr, pool=2,
    max_visible_blocks=256,
)
pl8 = vlayer.make_layer("tsdf", 0.1, vps=16, max_blocks=1024)
pl8, povf8 = sharding.integrate_projective_batch_sharded(
    mesh, pl8, Rs_s, ts_s, pts_s, cols_s, cfg, kind="pinhole_organized",
    intrinsics=intr, pool=2, max_visible_blocks=256,
)
assert not bool(povf1) and not bool(povf8)
# Identical allocation order (phase 1 replays the same sequence).
assert np.array_equal(np.asarray(pl1.block_ijk), np.asarray(pl8.block_ijk))
det = evaluation.evaluate_layers_rmse(to_host(pl1), to_host(pl8))
assert det.num_evaluated_voxels > 5000
assert det.rmse < 1e-5, det
wd = np.abs(np.asarray(pl1.channels["weight"])
            - np.asarray(pl8.channels["weight"])).max()
assert wd < 1e-3, wd
print("scan-sharded projective OK", det.rmse, wd)

# Ray-sharded differentiable render gradient == single-device gradient.
n_rays = 64
ang = np.linspace(-0.2, 0.2, n_rays).astype(np.float32)
dirs = np.stack([np.sin(ang), np.cos(ang), np.zeros(n_rays)], -1).astype(np.float32)
origins = np.tile([0.0, -4.0, 2.0], (n_rays, 1)).astype(np.float32)
target = np.full((n_rays,), 2.5, np.float32)

loss8, grad8 = sharding.render_loss_grad_sharded(
    mesh, layer8, jnp.asarray(origins), jnp.asarray(dirs),
    jnp.asarray(target), 8.0
)

from voxblox_tpu.ops import render
import dataclasses
def loss_fn(ch):
    lyr = dataclasses.replace(layer8h, channels={**layer8h.channels, "tsdf": ch})
    depth, hit = render.render_depth(lyr, jnp.asarray(origins), jnp.asarray(dirs), 8.0)
    err = jnp.where(hit, depth - jnp.asarray(target), 0.0)
    return jnp.sum(err * err)
loss1, grad1 = jax.value_and_grad(loss_fn)(layer8h.channels["tsdf"])
assert abs(float(loss8) - float(loss1)) < 1e-3 * max(1.0, abs(float(loss1)))
gd = float(jnp.max(jnp.abs(jnp.asarray(np.asarray(grad8)) - grad1)))
assert gd < 1e-4, gd
print("sharded render grad OK", float(loss1), gd)
print("ALL_PARALLEL_OK")
"""


def test_parallel_8_device_mesh():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert "ALL_PARALLEL_OK" in res.stdout, (
        f"STDOUT:\n{res.stdout[-4000:]}\nSTDERR:\n{res.stderr[-4000:]}"
    )

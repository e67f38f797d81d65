"""Stage profile of the projective TSDF path on the real TPU.

Times jitted variants that stop at successive pipeline stages, always on
varied inputs with a scalar readback (per CLAUDE.md timing rules).
"""
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import projective as P
from voxblox_tpu.sim import world as sw

dev = jax.devices()[0]
print("device:", dev, file=sys.stderr)

w = sw.SimulationWorld()
w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
w.add_ground_level(0.0)
objs = w.freeze()

res = (640, 480)
voxel = 0.05
cfg = TsdfIntegratorConfig(default_truncation_distance=4 * voxel,
                           max_ray_length_m=5.0)
n_poses = 16
fx = res[0] / (2.0 * np.tan(np.deg2rad(60.0) / 2.0))
intr = (fx, fx, res[0] / 2.0, res[1] / 2.0)


@jax.jit
def make_scan(origin, view):
    R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
    pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(
        objs, (R, origin), res, np.deg2rad(60.0), 8.0)
    return R, pts_C, colors

scans = []
for i in range(n_poses):
    a = 2 * np.pi * i / n_poses
    pos = jnp.asarray([4.0 * np.cos(a), 4.0 * np.sin(a), 2.0], jnp.float32)
    view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
    scans.append(make_scan(pos, view))
jax.block_until_ready(scans[-1][1])
Rs = jnp.stack([s[0] for s in scans])
ts_ = jnp.stack([jnp.asarray([4.0 * np.cos(2*np.pi*i/n_poses),
                              4.0 * np.sin(2*np.pi*i/n_poses), 2.0],
                             jnp.float32) for i in range(n_poses)])
pts = jnp.stack([s[1] for s in scans])
cols = jnp.stack([s[2] for s in scans])

MVB, MMS = 320, 3072
POOL = 2


def timeit(fn, layer, n=4, label=""):
    # warm
    layer = fn(layer, 0)
    jax.block_until_ready(jax.tree_util.tree_leaves(layer)[0])
    t0 = time.perf_counter()
    for i in range(n):
        layer = fn(layer, i + 1)
    lv = jax.tree_util.tree_leaves(layer)
    float(jnp.sum(lv[0].ravel()[:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"{label:42s} {dt*1e3/n_poses:7.3f} ms/scan  ({dt*1e3:7.2f} ms/batch16)")
    return layer


def fresh():
    return vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)


# --- full path ---
def full(layer, i):
    layer, _ = P.integrate_organized_projective_batch(
        layer, Rs, ts_ + i * 1e-5, pts, cols, cfg, intrinsics=intr,
        pool=POOL, max_visible_blocks=MVB, max_mixed_slabs=MMS)
    return layer

lay = fresh()
lay = timeit(full, lay, label="full (K=16, mms=3072)")

# --- full, tiny mixed budget: isolates the mixed-gather cost ---
def full_small_mms(layer, i):
    layer, _ = P.integrate_organized_projective_batch(
        layer, Rs, ts_ + i * 1e-5, pts, cols, cfg, intrinsics=intr,
        pool=POOL, max_visible_blocks=MVB, max_mixed_slabs=128)
    return layer

timeit(full_small_mms, fresh(), label="full (mms=128)")

# --- binning only ---
@jax.jit
def bin_only(acc, i):
    def body(c, scan):
        p, cl = scan
        img = P.build_pinhole_range_image_organized(p, cl, POOL, intr)
        return c + jnp.sum(jnp.where(jnp.isfinite(img.rng), img.rng, 0.0)), None
    acc, _ = jax.lax.scan(body, acc, (pts + i * 1e-6, cols))
    return acc

timeit(bin_only, jnp.float32(0.0), label="binning only")


# --- binning + feat image + hiz ---
@jax.jit
def feat_hiz(acc, i):
    def body(c, scan):
        p, cl = scan
        img = P.build_pinhole_range_image_organized(p, cl, POOL, intr)
        feat = P._feat_image(img, cfg.default_truncation_distance)
        hiz = P._hiz_tables(P._pix_eff(img, cfg))
        return c + jnp.sum(feat[::97, 0]) + jnp.sum(hiz[0][::31, 0]), None
    acc, _ = jax.lax.scan(body, acc, (pts + i * 1e-6, cols))
    return acc

timeit(feat_hiz, jnp.float32(0.0), label="binning + feat + hiz")


# --- up to candidate blocks + alloc + compaction (geometry only) ---
@jax.jit
def cand_alloc(layer, i):
    geom = layer
    def body(g, scan):
        R, t, p, cl = scan
        img = P.build_pinhole_range_image_organized(p, cl, POOL, intr)
        cand, ok = P._candidate_blocks(g, img, R, t, cfg)
        n_cand = cand.shape[0]
        max_cand = min(2 * MVB, n_cand)
        cidx = jnp.nonzero(ok, size=max_cand, fill_value=n_cand)[0]
        c_ok = cidx < n_cand
        cand = cand[jnp.where(c_ok, cidx, 0)]
        g, _ = vlayer.allocate_blocks(g, cand, c_ok)
        slots = vlayer.lookup_blocks(g, cand)
        sel = jnp.where(c_ok, slots, -1)
        rows = jnp.nonzero(
            jnp.zeros((g.max_blocks,), bool).at[
                jnp.where(sel >= 0, sel, 0)].set(sel >= 0),
            size=MVB, fill_value=-1)[0]
        return g, jnp.sum(rows)
    geom, s = jax.lax.scan(body, geom, (Rs, ts_ + i * 1e-5, pts, cols))
    return geom

import dataclasses
timeit(cand_alloc, dataclasses.replace(fresh(), channels={}),
       label="bin + cand + alloc + row-compact")


# --- add classification ---
@jax.jit
def classify(layer, i):
    geom = layer
    def body(g, scan):
        R, t, p, cl = scan
        img = P.build_pinhole_range_image_organized(p, cl, POOL, intr)
        cand, ok = P._candidate_blocks(g, img, R, t, cfg)
        n_cand = cand.shape[0]
        max_cand = min(2 * MVB, n_cand)
        cidx = jnp.nonzero(ok, size=max_cand, fill_value=n_cand)[0]
        c_ok = cidx < n_cand
        cand = cand[jnp.where(c_ok, cidx, 0)]
        g, _ = vlayer.allocate_blocks(g, cand, c_ok)
        slots = vlayer.lookup_blocks(g, cand)
        sel = jnp.where(c_ok, slots, -1)
        rows = jnp.nonzero(
            jnp.zeros((g.max_blocks,), bool).at[
                jnp.where(sel >= 0, sel, 0)].set(sel >= 0),
            size=MVB, fill_value=-1)[0]
        row_ok = rows >= 0
        safe_rows = jnp.where(row_ok, rows, 0)
        hiz = P._hiz_tables(P._pix_eff(img, cfg))
        free_s, mixed_s, z_est = P._classify_slabs(
            g, safe_rows, row_ok, R, t, img, hiz, cfg)
        return g, jnp.sum(mixed_s)
    geom, s = jax.lax.scan(body, geom, (Rs, ts_ + i * 1e-5, pts, cols))
    return dataclasses.replace(geom, num_blocks=geom.num_blocks + 0 * s[0])

timeit(classify, dataclasses.replace(fresh(), channels={}),
       label="... + hiz + classify")

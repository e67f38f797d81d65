"""Finer stage profile of the batched projective path (DCE-proof)."""
import sys
import time
import dataclasses
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

scans = [make_scan(
    jnp.asarray([4.0*np.cos(2*np.pi*i/n_poses), 4.0*np.sin(2*np.pi*i/n_poses),
                 2.0], jnp.float32),
    jnp.asarray([-np.cos(2*np.pi*i/n_poses), -np.sin(2*np.pi*i/n_poses), 0.0],
                jnp.float32)) for i in range(n_poses)]
jax.block_until_ready(scans[-1][1])
Rs = jnp.stack([s[0] for s in scans])
ts_ = jnp.stack([jnp.asarray([4.0*np.cos(2*np.pi*i/n_poses),
                              4.0*np.sin(2*np.pi*i/n_poses), 2.0], jnp.float32)
                 for i in range(n_poses)])
pts = jnp.stack([s[1] for s in scans])
cols = jnp.stack([s[2] for s in scans])

MVB, MMS, POOL = 320, 3072, 2
trunc = cfg.default_truncation_distance


def make_img(p, c):
    return P.build_pinhole_range_image_organized(p, c, POOL, intr)


def build_all(points_C, colors):
    def build_one(p, c):
        img = make_img(p, c)
        feat = P._feat_image(img, trunc)
        flat, offs, widths, max_lvl = P._hiz_tables(P._pix_eff(img, cfg))
        return img.rng, img.color, img.params, feat, flat
    return jax.vmap(build_one)(points_C, colors)


@partial(jax.jit, static_argnames=("stage",))
def run(layer, Rs, ts, points_C, colors, stage: str):
    rngs, colors_i, params_i, feats, hiz_flats = build_all(points_C, colors)
    _, hiz_offs, hiz_widths, hiz_max_lvl = P._hiz_tables(
        jnp.zeros(rngs.shape[1:], jnp.float32))
    if stage == "images":
        return (jnp.sum(rngs[:, ::7, ::13]) + jnp.sum(feats[:, ::97, 0])
                + jnp.sum(hiz_flats[:, ::31, 0]))
    geom = dataclasses.replace(layer, channels={})

    def body(carry, scan):
        geom, chk = carry
        R, t, rng_i, col_i, par_i, feat_i, hflat_i = scan
        img = P.RangeImage(rng=rng_i, color=col_i, params=par_i,
                           kind="pinhole")
        hiz = (hflat_i, hiz_offs, hiz_widths, hiz_max_lvl)
        cand, ok = P._candidate_blocks(geom, img, R, t, cfg, hiz=hiz)
        n_cand = cand.shape[0]
        max_cand = min(2 * MVB, n_cand)
        cidx = jnp.nonzero(ok, size=max_cand, fill_value=n_cand)[0]
        c_ok = cidx < n_cand
        cand = cand[jnp.where(c_ok, cidx, 0)]
        geom, _ = vlayer.allocate_blocks(geom, cand, c_ok)
        slots = vlayer.lookup_blocks(geom, cand)
        sel = jnp.where(c_ok, slots, -1)
        rows = jnp.nonzero(
            jnp.zeros((geom.max_blocks,), bool).at[
                jnp.where(sel >= 0, sel, 0)].set(sel >= 0),
            size=MVB, fill_value=-1)[0]
        row_ok = rows >= 0
        safe_rows = jnp.where(row_ok, rows, 0)
        if stage == "alloc":
            return (geom, chk + jnp.sum(rows)), None
        free_s, mixed_s, z_est = P._classify_slabs(
            geom, safe_rows, row_ok, R, t, img, hiz, cfg)
        if stage == "classify":
            return (geom, chk + jnp.sum(mixed_s) + jnp.sum(free_s)
                    + jnp.sum(z_est[::17])), None
        return (geom, chk), None

    (geom, chk), _ = jax.lax.scan(
        body, (geom, jnp.float32(0.0)),
        (Rs, ts, rngs, colors_i, params_i, feats, hiz_flats))
    return chk + jnp.sum(geom.block_ijk[::53].astype(jnp.float32))


def fresh():
    return vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=4096)


_lay0 = fresh()
_lay0, _ = P.integrate_organized_projective_batch(
    _lay0, Rs, ts_, pts, cols, cfg, intrinsics=intr, pool=POOL,
    max_visible_blocks=MVB, max_mixed_slabs=3072)
_ts_variants = [jnp.asarray(ts_ + (i + 1) * 1e-5) for i in range(8)]
jax.block_until_ready(_ts_variants[-1])


def timeit_stage(stage, n=4):
    out = run(_lay0, Rs, ts_, pts, cols, stage)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(n):
        out = run(_lay0, Rs, _ts_variants[i], pts, cols, stage)
    float(out)
    dt = (time.perf_counter() - t0) / n
    print(f"stage {stage:10s} {dt*1e3/n_poses:7.3f} ms/scan "
          f"({dt*1e3:7.2f} ms/batch16)")


def timeit_full(mms, n=4, label=""):
    lay = fresh()
    lay, _ = P.integrate_organized_projective_batch(
        lay, Rs, ts_, pts, cols, cfg, intrinsics=intr, pool=POOL,
        max_visible_blocks=MVB, max_mixed_slabs=mms, max_free_slabs=512)
    jax.block_until_ready(lay.channels["tsdf"])
    t0 = time.perf_counter()
    for i in range(n):
        lay, _ = P.integrate_organized_projective_batch(
            lay, Rs, ts_ + (i + 1) * 1e-5, pts, cols, cfg, intrinsics=intr,
            pool=POOL, max_visible_blocks=MVB, max_mixed_slabs=mms, max_free_slabs=512)
    float(jnp.sum(lay.channels["weight"][:1]))
    dt = (time.perf_counter() - t0) / n
    print(f"full mms={mms:5d} {dt*1e3/n_poses:7.3f} ms/scan "
          f"({dt*1e3:7.2f} ms/batch16)")


timeit_stage("images")
timeit_stage("alloc")
timeit_stage("classify")
timeit_full(1)
timeit_full(2304)

# Also: count actual slab classes on the warmed map.
for mms in (1792, 2048, 2304):
    lay = fresh()
    for rep in range(2):
        lay, ovf = P.integrate_organized_projective_batch(
            lay, Rs, ts_, pts, cols, cfg, intrinsics=intr, pool=POOL,
            max_visible_blocks=MVB, max_mixed_slabs=mms, max_free_slabs=512)
    print("mms", mms, "overflowed:", bool(ovf), "blocks:", int(lay.num_blocks))

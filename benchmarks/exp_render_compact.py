"""A/B experiment: packed 67 MB single-gather march vs a two-level
march whose operands are small enough for XLA to stage in VMEM.

Hypothesis (CLAUDE.md): random gathers run ~4x faster when the operand
is VMEM-staged. The packed dense field is dim^3 * vpb f32 = 67 MB at
dim=16 (unstageable), but the actual payload blocks (active, within one
block of a surface) number only a few hundred rows. Splitting into
  grid2  [dim^3] i32   (16 KB: compact slot or -(skip+1) code)
  field2 [n_surf, vpb] (f32 8 MB / f16 4 MB: SDF or unobserved sentinel)
doubles the serial gather chain but may cut per-gather cost ~4x.
Run standalone on the TPU; prints march-only + full-render timings.
"""
import sys, time
from functools import partial

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from voxblox_tpu.core import grid, layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import projective, render as render_ops
from voxblox_tpu.ops.compaction import cumsum_lanes
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
ang = np.linspace(-0.4, 0.4, n_rays).astype(np.float32)
dirs = jnp.asarray(np.stack([np.sin(ang), np.cos(ang), np.zeros(n_rays)], -1))
origins = jnp.broadcast_to(jnp.asarray([0.0, -4.0, 2.0]), dirs.shape)

UNOBS = np.float32(3e4)
N_SURF = 512


@partial(jax.jit, static_argnames=("dim", "max_steps", "field_dtype"))
def march_two_level(layer, origins, dirs, max_distance, dim=16,
                    max_steps=160, field_dtype=jnp.float32):
    vs = layer.voxel_size
    bs = layer.block_size
    v = layer.vps
    vpb = layer.voxels_per_block
    active = layer.active_mask()
    surface_block = jnp.any(
        (layer.channels["weight"] > 1e-6)
        & (jnp.abs(layer.channels["tsdf"]) < 2.0 * vs), axis=1) & active
    big = jnp.int32(1 << 20)
    origin_blk = jnp.min(
        jnp.where(active[:, None], layer.block_ijk, big), axis=0)
    origin_blk = jnp.where(jnp.any(active), origin_blk, 0)
    max_blk = jnp.max(
        jnp.where(active[:, None], layer.block_ijk, -big), axis=0)
    max_blk = jnp.where(jnp.any(active), max_blk, 0)
    rel = layer.block_ijk - origin_blk
    ing = jnp.all((rel >= 0) & (rel < dim), axis=-1)
    inside = ing & surface_block
    addr = (rel[:, 0] * dim + rel[:, 1]) * dim + rel[:, 2]
    nbk = dim * dim * dim
    surf_cell = jnp.zeros((nbk,), bool).at[
        jnp.where(inside, addr, nbk)].set(True, mode="drop")
    max_cheb = 8
    surf3 = surf_cell.reshape(dim, dim, dim)
    cheb = jnp.where(surf3, 0.0, float(max_cheb))
    for _ in range(max_cheb - 1):
        nmin = cheb
        for ax in range(3):
            win = [1, 1, 1]
            win[ax] = 3
            nmin = -jax.lax.reduce_window(
                -nmin, -jnp.inf, jax.lax.max, tuple(win), (1, 1, 1), "SAME")
        cheb = jnp.minimum(cheb, nmin + 1.0)
    chb_flat = cheb.reshape(-1)
    chb_row = chb_flat[jnp.where(ing, addr, 0)]
    near_r = ing & active & (chb_row <= 1.0)  # [mb] payload rows

    # Compact slot per payload row + the compact field.
    pad = (-near_r.shape[0]) % 128
    incl = cumsum_lanes(
        jnp.pad(near_r, (0, pad)).astype(jnp.int32)[None, :])[0][
        : near_r.shape[0]]
    slot_r = incl - 1
    n_over = incl[-1] > N_SURF
    rows_ids = jnp.full((N_SURF,), layer.max_blocks, jnp.int32).at[
        jnp.where(near_r & (incl <= N_SURF), slot_r,
                  N_SURF + jnp.arange(near_r.shape[0]))
    ].set(jnp.arange(near_r.shape[0], dtype=jnp.int32), mode="drop",
          unique_indices=True)
    safe_rows = jnp.clip(rows_ids, 0, layer.max_blocks - 1)
    fr = jnp.where(layer.channels["weight"][safe_rows] > 1e-6,
                   layer.channels["tsdf"][safe_rows], UNOBS)
    fr = jnp.where((rows_ids < layer.max_blocks)[:, None], fr, UNOBS)
    field2 = fr.astype(field_dtype).reshape(-1)

    # grid2: slot if payload cell else -(1 + blocks-to-skip).
    skip_code = -(1 + jnp.maximum(chb_flat - 1.0, 0.0).astype(jnp.int32))
    grid2 = skip_code.at[
        jnp.where(near_r & (incl <= N_SURF), addr, nbk)
    ].set(slot_r, mode="drop", unique_indices=True)

    inv_dirs = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    bbox_lo = origin_blk.astype(jnp.float32) * bs
    bbox_hi = (max_blk + 1).astype(jnp.float32) * bs
    ta = (bbox_lo[None] - origins) * inv_dirs
    tb = (bbox_hi[None] - origins) * inv_dirs
    t_enter = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t_leave = jnp.min(jnp.maximum(ta, tb), axis=-1)
    miss = (t_enter > t_leave) | (t_leave < 0.0)
    t_stop_at = jnp.minimum(t_leave + 0.5 * vs, max_distance)

    def one(state):
        t, done, it = state
        x = origins + t[:, None] * dirs
        gvi = grid.point_to_grid_index(x, 1.0 / vs)
        block, local = grid.split_global(gvi, v)
        relb = block - origin_blk
        inb = jnp.all((relb >= 0) & (relb < dim), axis=-1)
        a = (relb[:, 0] * dim + relb[:, 1]) * dim + relb[:, 2]
        g = grid2.at[jnp.where(inb, a, 0)].get(
            mode="fill", fill_value=-1)
        g = jnp.where(inb, g, -1)
        lin = grid.local_to_linear(local, v)
        val = field2.at[
            jnp.where(g >= 0, g * vpb + lin, 0)
        ].get(mode="fill", fill_value=UNOBS).astype(jnp.float32)
        val = jnp.where(g >= 0, val, UNOBS)
        corner = (block + (dirs > 0.0).astype(jnp.int32)).astype(
            jnp.float32) * bs
        t_exit = jnp.min((corner - x) * inv_dirs, axis=-1)
        far = jnp.maximum(-g - 1, 0).astype(jnp.float32) * bs
        skip = jnp.maximum(t_exit, 0.0) + far + 0.05 * vs
        real = val < UNOBS
        adv = jnp.where(real, jnp.maximum(val, 0.9 * vs),
                        jnp.where(g >= 0, vs, jnp.maximum(skip, vs)))
        hit_now = val < 0.9 * vs
        t = jnp.where(done | hit_now, t, t + adv)
        done = done | hit_now | (t >= t_stop_at)
        return t, done, it + 1

    def step8(state):
        for _ in range(8):
            state = one(state)
        return state

    t0 = jnp.maximum(jnp.where(miss, t_stop_at, t_enter), 0.0)
    t, done, _ = jax.lax.while_loop(
        lambda st: (~jnp.all(st[1])) & (st[2] < max_steps),
        step8, (t0, miss | (t0 >= t_stop_at), jnp.int32(0)))
    t = jnp.where(t >= t_stop_at, max_distance, t)
    return t, done, n_over


def bench(fn, tag, reps=4, groups=3):
    out = fn(np.float32(0.0))
    jax.block_until_ready(out)
    times = []
    for g in range(groups):
        t0 = time.perf_counter()
        for i in range(reps):
            out = fn(np.float32(1e-4 * (g * reps + i + 1)))
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / reps)
    ms = sorted(times)[len(times) // 2] * 1e3
    print(f"{tag}: {ms:.2f} ms/call = {n_rays/ms*1e3/1e6:.2f} M rays/s "
          f"({[round(t*1e3,1) for t in times]})")
    return ms


_UNOBS_P = np.float32(5e5)
_SKIP0_P = np.float32(1e6)


@partial(jax.jit, static_argnames=("dim", "max_steps"))
def march_packed_only(layer, origins, dirs, max_distance, dim=16,
                      max_steps=160):
    """The product's packed single-gather march, without refinement —
    isolates the march share of render_depth's wall time."""
    vs = layer.voxel_size
    bs = layer.block_size
    v = layer.vps
    vpb = layer.voxels_per_block
    active = layer.active_mask()
    surface_block = jnp.any(
        (layer.channels["weight"] > 1e-6)
        & (jnp.abs(layer.channels["tsdf"]) < 2.0 * vs), axis=1) & active
    big = jnp.int32(1 << 20)
    origin_blk = jnp.min(
        jnp.where(active[:, None], layer.block_ijk, big), axis=0)
    origin_blk = jnp.where(jnp.any(active), origin_blk, 0)
    max_blk = jnp.max(
        jnp.where(active[:, None], layer.block_ijk, -big), axis=0)
    max_blk = jnp.where(jnp.any(active), max_blk, 0)
    rel = layer.block_ijk - origin_blk
    ing = jnp.all((rel >= 0) & (rel < dim), axis=-1)
    inside = ing & surface_block
    addr = (rel[:, 0] * dim + rel[:, 1]) * dim + rel[:, 2]
    nbk = dim * dim * dim
    surf_cell = jnp.zeros((nbk,), bool).at[
        jnp.where(inside, addr, nbk)].set(True, mode="drop")
    max_cheb = 8
    surf3 = surf_cell.reshape(dim, dim, dim)
    cheb = jnp.where(surf3, 0.0, float(max_cheb))
    for _ in range(max_cheb - 1):
        nmin = cheb
        for ax in range(3):
            win = [1, 1, 1]
            win[ax] = 3
            nmin = -jax.lax.reduce_window(
                -nmin, -jnp.inf, jax.lax.max, tuple(win), (1, 1, 1), "SAME")
        cheb = jnp.minimum(cheb, nmin + 1.0)
    skipv = _SKIP0_P + jnp.maximum(cheb.reshape(-1) - 1.0, 0.0)
    chb_row = cheb.reshape(-1)[jnp.where(ing, addr, 0)]
    write = ing & active & (chb_row <= 1.0)
    field_rows = jnp.where(layer.channels["weight"] > 1e-6,
                           layer.channels["tsdf"], _UNOBS_P)
    dense_field = jnp.broadcast_to(skipv[:, None], (nbk, vpb))
    dense_field = dense_field.at[
        jnp.where(write, addr, nbk)
    ].set(field_rows, mode="drop", unique_indices=True).reshape(-1)

    inv_dirs = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)
    bbox_lo = origin_blk.astype(jnp.float32) * bs
    bbox_hi = (max_blk + 1).astype(jnp.float32) * bs
    ta = (bbox_lo[None] - origins) * inv_dirs
    tb = (bbox_hi[None] - origins) * inv_dirs
    t_enter = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t_leave = jnp.min(jnp.maximum(ta, tb), axis=-1)
    miss = (t_enter > t_leave) | (t_leave < 0.0)
    t_stop_at = jnp.minimum(t_leave + 0.5 * vs, max_distance)

    def one(state):
        t, done, it = state
        x = origins + t[:, None] * dirs
        gvi = grid.point_to_grid_index(x, 1.0 / vs)
        block, local = grid.split_global(gvi, v)
        relb = block - origin_blk
        inb = jnp.all((relb >= 0) & (relb < dim), axis=-1)
        lin = grid.local_to_linear(local, v)
        a = ((relb[:, 0] * dim + relb[:, 1]) * dim + relb[:, 2]) * vpb + lin
        val = dense_field.at[jnp.where(inb, a, 0)].get(
            mode="fill", fill_value=_SKIP0_P)
        val = jnp.where(inb, val, _SKIP0_P)
        corner = (block + (dirs > 0.0).astype(jnp.int32)).astype(
            jnp.float32) * bs
        t_exit = jnp.min((corner - x) * inv_dirs, axis=-1)
        real = val < _UNOBS_P
        unobs = (val >= _UNOBS_P) & (val < _SKIP0_P)
        skip = (jnp.maximum(t_exit, 0.0)
                + jnp.maximum(val - _SKIP0_P, 0.0) * bs + 0.05 * vs)
        adv = jnp.where(real, jnp.maximum(val, 0.9 * vs),
                        jnp.where(unobs, vs, jnp.maximum(skip, vs)))
        hit_now = val < 0.9 * vs
        t = jnp.where(done | hit_now, t, t + adv)
        done = done | hit_now | (t >= t_stop_at)
        return t, done, it + 1

    def step8(state):
        for _ in range(8):
            state = one(state)
        return state

    t0 = jnp.maximum(jnp.where(miss, t_stop_at, t_enter), 0.0)
    t, done, _ = jax.lax.while_loop(
        lambda st: (~jnp.all(st[1])) & (st[2] < max_steps),
        step8, (t0, miss | (t0 >= t_stop_at), jnp.int32(0)))
    t = jnp.where(t >= t_stop_at, max_distance, t)
    return t, done


# Current packed full render (the product path).
dim = render_ops.fit_dense_grid_dim(layer)
print(f"dense grid dim = {dim}")
bench(lambda eps: render_ops.render_depth(
    layer, origins + eps, dirs, 8.0, dense_grid_dim=dim)[0],
    "A: packed full render")

bench(lambda eps: march_packed_only(
    layer, origins + eps, dirs, 8.0, dim=dim)[0],
    "A2: packed march only")

# Two-level march only (f32 + f16 fields).
t_a, _, ovf = march_two_level(layer, origins, dirs, 8.0, dim=dim)
print("two-level overflow:", bool(ovf))
bench(lambda eps: march_two_level(
    layer, origins + eps, dirs, 8.0, dim=dim)[0],
    "B: two-level march f32")
bench(lambda eps: march_two_level(
    layer, origins + eps, dirs, 8.0, dim=dim,
    field_dtype=jnp.float16)[0],
    "C: two-level march f16")

# Sanity: agreement of the two-level march vs the packed render's t_raw
# is indirect (render refines); compare hit depth coarsely.
d_a, h_a = render_ops.render_depth(layer, origins, dirs, 8.0,
                                   dense_grid_dim=dim)
both = np.asarray(h_a) & (np.asarray(t_a) < 7.9)
err = np.abs(np.asarray(t_a) - np.asarray(d_a))[both]
print(f"march-vs-render depth |err|: median {np.median(err):.4f} "
      f"p99 {np.percentile(err, 99):.4f} (voxel={voxel})")

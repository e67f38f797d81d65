"""Sphere tracing: surface queries + a differentiable depth/color renderer.

Two layers of functionality:

1. ``surface_distance_along_rays`` — vectorized port of the reference's
   ``getSurfaceDistanceAlongRay`` stepping rules
   (voxblox utils/distance_utils.h:16-78): advance by one voxel through
   unallocated/unobserved space, advance by the voxel's stored distance
   when it exceeds a voxel, declare a hit at or just before the surface.
   Used by the intensity integrator (intensity_integrator.cc:15-66).

2. ``render_depth`` — the differentiable extension (SURVEY.md §2.3 #30
   "north star"): the march itself is gradient-stopped, then one Newton
   correction step with trilinear SDF sampling makes the output depth
   differentiable w.r.t. the voxel SDF values by the implicit function
   theorem:  t* = stop(t) - sdf(x_t) / stop(<grad sdf, d>).
   Gradients reach voxel sdf (and colors via trilinear color sampling)
   through plain XLA gather adjoints (scatter-add in the backward), so
   depth images and pixel losses backpropagate into the map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from . import interp


def _nearest_voxel(layer, points):
    """Nearest-voxel (distance, weight, found) at world points."""
    gvi = grid.point_to_grid_index(points, 1.0 / layer.voxel_size)
    d, found = vlayer.get_voxels(layer, "tsdf", gvi)
    w, _ = vlayer.get_voxels(layer, "weight", gvi)
    return d, w, found


@partial(jax.jit, static_argnames=("max_steps", "max_distance"))
def surface_distance_along_rays(
    layer: vlayer.VoxelLayer,
    origins,
    bearing_vectors,
    max_distance: float,
    max_steps: int = 0,
):
    """Reference stepping rules, lockstep over rays.

    origins/bearing_vectors: f32[R,3] (bearings need not be normalized).
    Returns (t f32[R], hit bool[R]); surface point = origin + t * dir.
    """
    dirs = bearing_vectors / jnp.linalg.norm(
        bearing_vectors, axis=-1, keepdims=True
    )
    vs = layer.voxel_size
    if not max_steps:
        max_steps = int(max_distance / vs * 1.05) + 8

    def body(_, state):
        t, hit, done = state
        x = origins + t[:, None] * dirs
        d, w, found = _nearest_voxel(layer, x)
        observed = found & (w > 1e-6)
        # Rule order mirrors distance_utils.h:35-69.
        step_unobs = ~observed
        step_far = observed & (d > vs)
        hit_neg = observed & (d < 0.0)
        hit_near = observed & (d >= 0.0) & (d < vs)
        # "Default case" (d == vs exactly): advance one voxel.
        dt = jnp.where(step_unobs, vs, jnp.where(step_far, d, vs))
        dt = jnp.where(hit_near, d, dt)
        newly_hit = ~done & (hit_neg | hit_near)
        t = jnp.where(done, t, t + jnp.where(hit_neg, 0.0, dt))
        hit = hit | newly_hit
        done = done | newly_hit | (t >= max_distance)
        return t, hit, done

    r = origins.shape[0] if origins.ndim > 1 else dirs.shape[0]
    t0 = jnp.zeros((dirs.shape[0],), jnp.float32)
    t, hit, _ = jax.lax.fori_loop(
        0, max_steps, body, (t0, jnp.zeros_like(t0, bool),
                             jnp.zeros_like(t0, bool))
    )
    return t, hit


# Payload codes of the packed dense voxel field (march fast path): a
# cell holds either a real SDF sample (< _UNOBS), the unobserved
# sentinel, or _SKIP0 + k meaning "no surface within k blocks" (the
# block-level Chebyshev skip folded into the same array). Real SDF
# magnitudes are bounded by the truncation/max-distance (metres), far
# below _UNOBS.
_UNOBS = np.float32(5e5)
_SKIP0 = np.float32(1e6)


@partial(jax.jit, static_argnames=("max_steps", "with_color", "max_distance",
                                   "dense_grid_dim", "nearest_pulls",
                                   "trilinear_pulls", "phase1_iters"))
def render_depth(
    layer: vlayer.VoxelLayer,
    origins,
    dirs,
    max_distance: float,
    max_steps: int = 0,
    with_color: bool = False,
    dense_grid_dim: int = 64,
    nearest_pulls: int = 4,
    trilinear_pulls: int = 1,
    phase1_iters: int = 10,
):
    """Differentiable depth (and color) along rays.

    origins/dirs f32[R,3], dirs unit. Returns (depth [R], hit [R]) or
    (depth, color [R,3], hit). ``depth`` carries gradients to the voxel
    SDF channel; color to the color channel.

    ``dense_grid_dim``: side of the dense block->slot acceleration grid
    (see below); maps larger than dense_grid_dim blocks per axis treat
    out-of-grid blocks as empty (rays over them report max_distance
    misses). Callers with concrete layers should size it with
    ``fit_dense_grid_dim`` (``render_depth_image`` does so
    automatically). Maps fitting a <= 32-block grid march through a
    PACKED dense voxel field — one payload gather per step (SDF,
    unobserved sentinel and block-skip code share the array) instead of
    the two dependent gathers (block grid, then field) of the general
    path; the march is gather-latency-bound, so this halves its serial
    chain.
    """
    vs = layer.voxel_size
    bs = layer.block_size
    if not max_steps:
        # Block-level skipping shortens typical rays to a few block hops
        # plus near-surface voxel steps; keep a generous bound.
        max_steps = int(max_distance / vs * 0.6) + int(max_distance / bs) + 16

    # March acceleration structures, built once per call (a dense pass
    # over the pool — cheap next to per-ray-step random access):
    # - a dense block->slot grid over the active map's bounding box with
    #   the "may contain a surface" test folded in: value = pool slot if
    #   the block has an observed voxel within 2 voxels of the zero
    #   crossing, else -1 (skip whole block by its AABB exit — identical
    #   treatment for unallocated and allocated-but-surface-free blocks);
    # - a packed march field: sdf where observed else +inf.
    # Each march step then costs TWO random gathers (grid + field) — no
    # hash probing (the hash path costs ~13 gathers/step: two probe loops
    # of 3 gathers per probe plus the channel reads).
    dim = dense_grid_dim
    active = layer.active_mask()
    surface_block = jnp.any(
        (layer.channels["weight"] > 1e-6)
        & (jnp.abs(layer.channels["tsdf"]) < 2.0 * vs),
        axis=1,
    ) & active
    big = jnp.int32(1 << 20)
    origin_blk = jnp.min(
        jnp.where(active[:, None], layer.block_ijk, big), axis=0
    )
    origin_blk = jnp.where(jnp.any(active), origin_blk, 0)
    max_blk = jnp.max(
        jnp.where(active[:, None], layer.block_ijk, -big), axis=0
    )
    max_blk = jnp.where(jnp.any(active), max_blk, 0)
    rel = layer.block_ijk - origin_blk
    ing = jnp.all((rel >= 0) & (rel < dim), axis=-1)
    inside = ing & surface_block
    addr = (rel[:, 0] * dim + rel[:, 1]) * dim + rel[:, 2]
    dense = jnp.full((dim * dim * dim,), -1, jnp.int32).at[
        jnp.where(inside, addr, dim * dim * dim)
    ].set(
        jnp.arange(layer.max_blocks, dtype=jnp.int32), mode="drop",
        unique_indices=True,
    )
    # Block-level Chebyshev distance to the nearest surface block
    # (min-dilation passes over the dense grid; capped). Marching through
    # empty space then jumps (D-1) whole blocks past the current block's
    # exit per step instead of one block: moving a distance block_size
    # changes each block coordinate by at most 1, so a point in a block
    # at Chebyshev distance D can advance (D-1)*block_size beyond its
    # block exit without entering a surface block.
    max_cheb = 8
    surf3 = (dense >= 0).reshape(dim, dim, dim)
    cheb = jnp.where(surf3, 0.0, float(max_cheb))
    for _ in range(max_cheb - 1):
        # Chebyshev min-dilation is separable: three 1-D 3-window mins
        # instead of one 27-point window (~9x fewer compares).
        nmin = cheb
        for ax in range(3):
            win = [1, 1, 1]
            win[ax] = 3
            nmin = -jax.lax.reduce_window(
                -nmin, -jnp.inf, jax.lax.max, tuple(win), (1, 1, 1), "SAME"
            )
        cheb = jnp.minimum(cheb, nmin + 1.0)
    # Pack: surface block -> pool slot (>= 0); else -(cheb distance).
    gridv = jnp.where(
        surf3.reshape(-1), dense, -cheb.astype(jnp.int32).reshape(-1)
    )
    field = jnp.where(
        layer.channels["weight"] > 1e-6, layer.channels["tsdf"], jnp.inf
    ).reshape(-1)

    v = layer.vps
    vpb = layer.voxels_per_block
    # Packed dense voxel field (maps up to 32^3 blocks; 32^3 * 4096 f32
    # = 537 MB): every dense cell holds its block's skip code
    # (_SKIP0 + max(cheb-1, 0)); rows of active blocks within one block
    # of a surface (cheb <= 1 — the only blocks the refinement can ever
    # sample: the march stops within a voxel of a surface-block zero
    # crossing and pulls clamp to +-2 voxels) overwrite with real
    # SDF / _UNOBS payloads via one contiguous row scatter. The march
    # then needs ONE gather per step, with no serial dependence between
    # a block lookup and a field read.
    packed = dim <= 32
    if packed:
        nbk = dim * dim * dim
        skipv = _SKIP0 + jnp.maximum(
            cheb.reshape(-1) - 1.0, 0.0
        )  # [dim^3]
        chb_row = cheb.reshape(-1)[jnp.where(ing, addr, 0)]
        write = ing & active & (chb_row <= 1.0)
        field_rows = jnp.where(
            layer.channels["weight"] > 1e-6, layer.channels["tsdf"],
            _UNOBS,
        )
        dense_field = jnp.broadcast_to(skipv[:, None], (nbk, vpb))
        dense_field = dense_field.at[
            jnp.where(write, addr, nbk)
        ].set(field_rows, mode="drop", unique_indices=True).reshape(-1)
    else:
        dense_field = None
    inv_dirs = 1.0 / jnp.where(jnp.abs(dirs) < 1e-12, 1e-12, dirs)

    # Clip rays to the active-map bounding box: start at its entry and
    # retire them at its exit (the dense grid covers everything between;
    # beyond it no surface can exist).
    bbox_lo = origin_blk.astype(jnp.float32) * bs
    bbox_hi = (max_blk + 1).astype(jnp.float32) * bs
    ta = (bbox_lo[None] - origins) * inv_dirs
    tb = (bbox_hi[None] - origins) * inv_dirs
    t_enter = jnp.max(jnp.minimum(ta, tb), axis=-1)
    t_leave = jnp.min(jnp.maximum(ta, tb), axis=-1)
    miss = (t_enter > t_leave) | (t_leave < 0.0)
    t_stop_at = jnp.minimum(t_leave + 0.5 * vs, max_distance)

    def make_step(o, d, inv_d, stop_at):
        def step_packed(state):
            t, done, it = state
            x = o + t[:, None] * d
            gvi = grid.point_to_grid_index(x, 1.0 / vs)
            block, local = grid.split_global(gvi, v)
            relb = block - origin_blk
            inb = jnp.all((relb >= 0) & (relb < dim), axis=-1)
            lin = grid.local_to_linear(local, v)
            a = (
                (relb[:, 0] * dim + relb[:, 1]) * dim + relb[:, 2]
            ) * vpb + lin
            val = dense_field.at[jnp.where(inb, a, 0)].get(
                mode="fill", fill_value=_SKIP0
            )
            val = jnp.where(inb, val, _SKIP0)
            corner = (block + (d > 0.0).astype(jnp.int32)).astype(
                jnp.float32
            ) * bs
            t_exit = jnp.min((corner - x) * inv_d, axis=-1)
            real = val < _UNOBS
            unobs = (val >= _UNOBS) & (val < _SKIP0)
            skip = (jnp.maximum(t_exit, 0.0)
                    + jnp.maximum(val - _SKIP0, 0.0) * bs + 0.05 * vs)
            adv = jnp.where(
                real, jnp.maximum(val, 0.9 * vs),
                jnp.where(unobs, vs, jnp.maximum(skip, vs)),
            )
            hit_now = val < 0.9 * vs  # only real payloads are this small
            t = jnp.where(done | hit_now, t, t + adv)
            done = done | hit_now | (t >= stop_at)
            return t, done, it + 1

        def step(state):
            t, done, it = state
            x = o + t[:, None] * d
            gvi = grid.point_to_grid_index(x, 1.0 / vs)
            block, local = grid.split_global(gvi, v)
            rel = block - origin_blk
            inb = jnp.all((rel >= 0) & (rel < dim), axis=-1)
            addr = (rel[:, 0] * dim + rel[:, 1]) * dim + rel[:, 2]
            g = gridv.at[jnp.where(inb, addr, 0)].get(
                mode="fill", fill_value=-1
            )
            g = jnp.where(inb, g, -1)
            has_surface = g >= 0
            # AABB exit distance of the current block along the ray, plus
            # (cheb-1) whole blocks when provably far from any surface.
            corner = (block + (d > 0.0).astype(jnp.int32)).astype(
                jnp.float32
            ) * bs
            t_exit = jnp.min((corner - x) * inv_d, axis=-1)
            far = jnp.maximum(-g - 1, 0).astype(jnp.float32) * bs
            skip = jnp.maximum(t_exit, 0.0) + far + 0.05 * vs

            lin = grid.local_to_linear(local, v)
            flat = jnp.where(has_surface,
                             g * layer.voxels_per_block + lin, -1)
            s = field.at[flat].get(mode="fill", fill_value=jnp.inf)
            observed = jnp.isfinite(s)
            adv_vox = jnp.where(observed, jnp.maximum(s, 0.9 * vs), vs)
            adv = jnp.where(has_surface, adv_vox, jnp.maximum(skip, vs))
            hit_now = has_surface & observed & (s < 0.9 * vs)
            t = jnp.where(done | hit_now, t, t + adv)
            done = done | hit_now | (t >= stop_at)
            return t, done, it + 1

        one = step_packed if packed else step

        def step8(state):
            # 8 march steps per while iteration: amortizes the loop's
            # all-done reduction and per-iteration overhead (measured ~2x
            # on a v5e vs one step per iteration).
            for _ in range(8):
                state = one(state)
            return state

        return step8

    # Phase 1: full-width march for a bounded number of iterations —
    # covers the typical ray (empty-space skips + ~20 near-surface
    # steps). Phase 2: the few survivors (grazing rays creeping at the
    # min step) are COMPACTED into an n/8 buffer and marched to
    # completion there, so the long tail no longer runs every lane
    # (lockstep tail measured ~5x the median ray length). If survivors
    # overflow the buffer (adversarial geometry), fall back to finishing
    # at full width.
    n = dirs.shape[0]
    step8_full = make_step(origins, dirs, inv_dirs, t_stop_at)
    phase1_iters = min(phase1_iters, max_steps)
    t0 = jnp.maximum(jnp.where(miss, t_stop_at, t_enter), 0.0)
    t1, done1, _ = jax.lax.while_loop(
        lambda st: (~jnp.all(st[1])) & (st[2] < phase1_iters * 8),
        step8_full,
        (t0, miss | (t0 >= t_stop_at), jnp.int32(0)),
    )

    n2 = max(128, n // 8)
    if n2 >= n:
        t_raw, done, _ = jax.lax.while_loop(
            lambda st: (~jnp.all(st[1])) & (st[2] < max_steps),
            step8_full, (t1, done1, jnp.int32(0)),
        )
    else:
        alive = ~done1
        ids = jnp.nonzero(alive, size=n2, fill_value=n)[0]
        overflow = jnp.sum(alive) > n2

        def finish_compact(args):
            t1, done1 = args
            safe = jnp.where(ids < n, ids, 0)
            o2 = origins[safe]
            d2 = dirs[safe]
            step8_c = make_step(o2, d2, inv_dirs[safe], t_stop_at[safe])
            t2, dn2, _ = jax.lax.while_loop(
                lambda st: (~jnp.all(st[1])) & (st[2] < max_steps),
                step8_c,
                (t1[safe], ids >= n, jnp.int32(0)),
            )
            return (
                t1.at[ids].set(t2, mode="drop", unique_indices=True),
                done1.at[ids].set(dn2, mode="drop", unique_indices=True),
            )

        def finish_full(args):
            t1, done1 = args
            t2, dn2, _ = jax.lax.while_loop(
                lambda st: (~jnp.all(st[1])) & (st[2] < max_steps),
                step8_full, (t1, done1, jnp.int32(0)),
            )
            return t2, dn2

        t_raw, done = jax.lax.cond(
            overflow, finish_full, finish_compact, (t1, done1)
        )
    # Rays that exited the map unhit report max_distance.
    t_raw = jnp.where(t_raw >= t_stop_at, max_distance, t_raw)

    # Fast trilinear sampling through the dense block grid: 2 gathers per
    # corner (grid + field) instead of the hash interpolator's per-corner
    # probe loops + separate weight lookup (~4x the gathers; the
    # refinement below samples 9 times, so this dominated the render).
    # ``field`` is built by a where() from the tsdf channel, so values
    # gathered from it remain differentiable w.r.t. the map.
    dense_all = None if packed else jnp.full(
        (dim * dim * dim,), -1, jnp.int32
    ).at[
        jnp.where(ing & active, addr, dim * dim * dim)
    ].set(
        jnp.arange(layer.max_blocks, dtype=jnp.int32), mode="drop",
        unique_indices=True,
    )

    def corner_vals(x):
        """8-corner field values [Q,8] + fractional coords + validity."""
        inv = 1.0 / vs
        low = jnp.floor(x * inv - 0.5 + grid.EPS).astype(jnp.int32)
        frac = (x - (low.astype(jnp.float32) + 0.5) * vs) * inv
        corners = low[:, None, :] + jnp.asarray(interp._CORNERS)  # [Q,8,3]
        block, local = grid.split_global(corners, v)
        relc = block - origin_blk
        inb = jnp.all((relc >= 0) & (relc < dim), axis=-1)
        a = (relc[..., 0] * dim + relc[..., 1]) * dim + relc[..., 2]
        lin = grid.local_to_linear(local, v)
        if packed:
            vals = dense_field.at[
                jnp.where(inb, a * vpb + lin, 0)
            ].get(mode="fill", fill_value=_SKIP0)
            vals = jnp.where(inb, vals, _SKIP0)
            valid = jnp.all(vals < _UNOBS, axis=-1)
            return jnp.where(vals < _UNOBS, vals, 0.0), frac, valid
        slot = dense_all.at[jnp.where(inb, a, 0)].get(
            mode="fill", fill_value=-1
        )
        slot = jnp.where(inb, slot, -1)
        flat = jnp.where(slot >= 0, slot * layer.voxels_per_block + lin, -1)
        vals = field.at[flat].get(mode="fill", fill_value=jnp.inf)
        valid = jnp.all(jnp.isfinite(vals), axis=-1)
        return jnp.where(jnp.isfinite(vals), vals, 0.0), frac, valid

    def fast_value(x):
        vals, frac, valid = corner_vals(x)
        w8 = interp._trilinear_weights(frac)
        return jnp.sum(w8 * vals, axis=-1), valid

    def _tri_val_grad(vals, frac):
        w8 = interp._trilinear_weights(frac)
        val = jnp.sum(w8 * vals, axis=-1)
        fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
        gxw, gyw, gzw = 1.0 - fx, 1.0 - fy, 1.0 - fz

        # corner index = cx + 2*cy + 4*cz (x fastest, _CORNERS order)
        def axis_grad(wa0, wa1, wb0, wb1, pick):
            # d/dfx-style: sum over the other two axes of
            # w_other * (val[hi] - val[lo]).
            tot = 0.0
            for cb in (0, 1):
                for ca in (0, 1):
                    wa = (wa1 if ca else wa0)
                    wb = (wb1 if cb else wb0)
                    hi, lo = pick(ca, cb)
                    tot = tot + wa * wb * (vals[:, hi] - vals[:, lo])
            return tot

        gx = axis_grad(gyw, fy, gzw, fz,
                       lambda cy, cz: (1 + 2 * cy + 4 * cz,
                                       0 + 2 * cy + 4 * cz))
        gy = axis_grad(gxw, fx, gzw, fz,
                       lambda cx, cz: (2 + cx + 4 * cz, cx + 4 * cz))
        gz = axis_grad(gxw, fx, gyw, fy,
                       lambda cx, cy: (4 + cx + 2 * cy, cx + 2 * cy))
        gvec = jnp.stack([gx, gy, gz], axis=-1) / vs
        return val, gvec

    def fast_value_grad(x):
        vals, frac, valid = corner_vals(x)
        val, gvec = _tri_val_grad(vals, frac)
        return val, gvec, valid

    def nearest_value(x):
        """March-field value of the containing voxel."""
        gvi = grid.point_to_grid_index(x, 1.0 / vs)
        block, local = grid.split_global(gvi, v)
        relv = block - origin_blk
        inb = jnp.all((relv >= 0) & (relv < dim), axis=-1)
        a = (relv[:, 0] * dim + relv[:, 1]) * dim + relv[:, 2]
        lin = grid.local_to_linear(local, v)
        if packed:
            s = dense_field.at[
                jnp.where(inb, a * vpb + lin, 0)
            ].get(mode="fill", fill_value=_SKIP0)
            s = jnp.where(inb, s, _SKIP0)
            return jnp.where(s < _UNOBS, s, 0.0), s < _UNOBS
        slot = dense_all.at[jnp.where(inb, a, 0)].get(
            mode="fill", fill_value=-1
        )
        slot = jnp.where(inb, slot, -1)
        flat = jnp.where(slot >= 0, slot * layer.voxels_per_block + lin, -1)
        s = field.at[flat].get(mode="fill", fill_value=jnp.inf)
        return s, jnp.isfinite(s)

    # Gradient-stopped refinements pull the stop point into the correct
    # interpolation cell before the differentiable Newton step (the march
    # stops within ~0.9 voxel; each pull clamps to +-2 voxels). The first
    # pulls use the NEAREST-voxel value — 2 gathers of R elements instead
    # of the trilinear pass's 2x8R corner gathers (each 8-corner pass
    # measured 7.4 ms per 65k rays: the corner gathers, not the march,
    # dominate the renderer) — converging t to voxel-center accuracy;
    # ONE trilinear pull then settles into the final interpolation cell
    # before the Newton pass (a second pull measured +17% wall for the
    # same GT accuracy — p95 11.8 vs 10.6 mm at 5 cm voxels — and
    # replacing the pull with in-cell frac-tracking from stale corners
    # doubled the tail error; pass counts are tunable per call).
    t_stop = jax.lax.stop_gradient(t_raw)
    for _ in range(nearest_pulls):
        x_r = origins + t_stop[:, None] * dirs
        s_r, v_r = nearest_value(x_r)
        t_stop = jax.lax.stop_gradient(
            jnp.where(v_r, t_stop + jnp.clip(s_r, -2 * vs, 2 * vs), t_stop)
        )
    for _ in range(trilinear_pulls):
        x_r = origins + t_stop[:, None] * dirs
        s_r, v_r = fast_value(x_r)
        t_stop = jax.lax.stop_gradient(
            jnp.where(v_r, t_stop + jnp.clip(s_r, -2 * vs, 2 * vs), t_stop)
        )
    x_stop = origins + t_stop[:, None] * dirs
    s, g, valid = fast_value_grad(x_stop)
    denom = jnp.sum(jax.lax.stop_gradient(g) * dirs, axis=-1)
    # Along-ray SDF slope ~1 near a surface; clamp away from 0 for safety.
    denom = jnp.where(jnp.abs(denom) < 0.3,
                      jnp.where(denom < 0.0, -0.3, 0.3), denom)
    # Newton step: differentiable in the map through s.
    depth = t_stop - s / denom
    hit = valid & (t_stop < max_distance) & (jnp.abs(s) < 2.0 * vs)
    depth = jnp.where(hit, depth, max_distance)
    if with_color:
        # Differentiable sample position: pixel color reaches the SDF
        # channel through the moving hit point (d color/d sdf), and the
        # color channel through the trilinear weights.
        x_surf = origins + depth[:, None] * dirs
        color, cvalid = interp.interpolate_trilinear_color(layer, x_surf)
        color = jnp.where(hit[:, None] & cvalid[:, None], color, 0.0)
        return depth, color, hit
    return depth, hit


def fit_dense_grid_dim(layer, dense_grid_dim: int = 64) -> int:
    """Size render_depth's dense acceleration grid to the ACTIVE map.

    The grid is anchored at the min active block; active blocks at
    relative coordinate >= dense_grid_dim would silently be treated as
    empty. This host-side helper (one device->host readback) returns the
    active bbox extent rounded up to a multiple of 16 (minimum 16) —
    the rounding bounds jit recompiles as the map grows, and maps
    fitting <= 32 blocks/axis get render_depth's packed single-gather
    march. ``dense_grid_dim`` caps nothing; it is kept for signature
    compatibility.
    """
    active = np.asarray(layer.active_mask())
    if not active.any():
        return 16
    ijk = np.asarray(layer.block_ijk)[active]
    extent = int((ijk.max(axis=0) - ijk.min(axis=0)).max()) + 1
    return max(16, ((extent + 15) // 16) * 16)


def render_depth_image(layer, T_G_C, intrinsics, resolution, max_distance,
                      **kw):
    """Render a pinhole depth image. intrinsics = (fx, fy, cx, cy);
    resolution = (W, H). Returns depth [H, W] (+ color, hit).

    Auto-sizes the dense acceleration grid to the active map unless the
    caller passes an explicit ``dense_grid_dim``."""
    if "dense_grid_dim" not in kw:
        kw["dense_grid_dim"] = fit_dense_grid_dim(layer)
    w, h = resolution
    fx, fy, cx, cy = intrinsics
    us = jnp.arange(w, dtype=jnp.float32)
    vcoords = jnp.arange(h, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vcoords, indexing="xy")
    rays_C = jnp.stack(
        [(uu - cx) / fx, (vv - cy) / fy, jnp.ones_like(uu)], axis=-1
    ).reshape(-1, 3)
    rays_C = rays_C / jnp.linalg.norm(rays_C, axis=-1, keepdims=True)
    R, tr = T_G_C
    rays_G = rays_C @ R.T
    origins = jnp.broadcast_to(tr, rays_G.shape)
    out = render_depth(layer, origins, rays_G, max_distance, **kw)
    if len(out) == 3:
        depth, color, hit = out
        return (
            depth.reshape(h, w),
            color.reshape(h, w, 3),
            hit.reshape(h, w),
        )
    depth, hit = out
    return depth.reshape(h, w), hit.reshape(h, w)

"""Pallas TPU kernel: fused ESDF 26-neighbor relaxation.

The XLA sweep (ops/esdf.py _relax_once) re-reads the padded distance array
from HBM for each of 26 shifted neighbors, every inner iteration:
~52 HBM passes per relaxation. This kernel keeps a tile of blocks resident
in VMEM and runs ``inner_sweeps`` full 26-neighbor relaxations per HBM
round trip (2 passes), with the quasi-euclidean metric and the sign
handling of the reference wavefront (esdf_integrator.cc:371-496).

Data layout inside the kernel: padded blocks [B, 18, 18, 18] are viewed as
2D vregs [B*18 (z-major sublanes), 18*18 (y*18+x lanes, padded to 512)].
Neighbor shifts become lane rolls (x: +-1, y: +-18) and sublane rolls
(z: +-18... implemented as roll over the flattened sublane dim with
block-boundary masks); the pad ring carries the halo so no roll crosses a
block incorrectly.

The kernel handles the quasi-euclidean default; full-euclidean mode stays
on the XLA path (parent bookkeeping).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 18  # padded block side
LANES = P * P  # 324 (padded to LANE_PAD)
LANE_PAD = 384  # next multiple of 128; 512 measured ~25% slower (pure pad)

_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if (dx, dy, dz) != (0, 0, 0)
]
_DIST = {o: float(np.linalg.norm(o)) for o in _OFFSETS}


# Finite validity sentinel. inf would also work numerically, but finite
# keeps every lane's arithmetic NaN-free (inf - inf paths) — pad/halo
# lanes flow through the full sweep math and are discarded by ``upd``.
BIG = np.float32(1e9)


def _relax_kernel(strides: tuple, voxel_size: float, max_distance: float,
                  min_diff: float):
    """26-neighbor relaxation, mask-free at stride 1.

    Boundary masks are unnecessary at stride 1: only interior voxels
    (x,y,z in [1,16]) carry ``upd``; their +-1 neighbors live at [0,17],
    so a lane roll never carries x across a y-row (lane = y*P + x with
    x+-1 within [0,17]) and a sublane roll never crosses a block's 18-row
    group. Lanes whose reads DO wrap (halo ring, pad lanes >= 324)
    produce garbage that ``upd`` discards. Source validity (observed and
    inside the max-distance window) is pre-packed into the values:
    invalid voxels become +-BIG, which loses every min/max against a real
    candidate. This halves the rolls (no separate validity shift) and
    removes all iota/divide mask math from the hot loop; the z-roll is
    hoisted per dz group (2 sublane rolls per array per sweep instead
    of 26).

    ``strides``: one relaxation per entry, at that step multiple — a
    stride-k jump decomposes into k unit steps of the same direction
    (cost k*unit), so it is a valid chamfer path and strided sweeps stay
    UPPER bounds of the fixpoint while crossing a 16-voxel block in log
    passes instead of 16 (jump-flooding-style warm start; the trailing
    stride-1 sweeps keep the exact fixpoint). SOUNDNESS: the decomposed
    path's k-1 INTERMEDIATE voxels must be traversable (observed, NOT
    fixed — a fixed voxel may hold a value above its relaxation bound,
    breaking the path induction — and same sign) or the jump would
    tunnel through unobserved pockets / across surfaces and permanently
    UNDER-estimate (monotone relaxation cannot
    raise values back). Jumps at stride k are gated PER VOXEL by the
    admissibility codes ``stride_codes`` = (code_pos, code_neg): a
    center's code reaches level L(k) iff the whole Chebyshev ball of
    radius k-1 around it is traversable on that sign's side (the ball
    covers every intermediate of every direction; see stride_radii /
    ops/esdf._stride_codes_2d for the halo-synchronized erosion that
    builds the codes — observedness and signs are static across
    sweeps, so they are computed once per update). Strided candidates
    are additionally rejected above max_distance (the traversability
    induction needs in-window fixpoint values along the path).
    Strided reads also need in-block validity masks (iota-derived); the
    sign-flip rule runs only at stride 1 (it caps |d| at the INTERFACE
    step length).
    """
    strided = any(k > 1 for k in strides)
    level_of = {
        k: i + 1.0
        for i, k in enumerate(sorted({int(k) for k in strides if k > 1}))
    }

    def kernel(*refs):
        act_ref = refs[-2]
        refs = refs[:-2] + refs[-1:]
        if strided:
            d_ref, obs_ref, upd_ref, cp_ref, cn_ref, out_ref = refs
        else:
            d_ref, obs_ref, upd_ref, out_ref = refs

        # Tile-level activity gate: blocks whose 1-ring didn't change in
        # the previous outer iteration provably cannot change in this
        # one (their padded state is bit-identical; sweeps are
        # deterministic) — skip the whole 26-offset pipeline and copy
        # through. The kernel is VPU-compute-bound, so converged tiles
        # become ~free; on a batch rebuild the active set is the
        # outward-moving front shell.
        @pl.when(jnp.max(act_ref[:]) < 0.5)
        def _copy_through():
            out_ref[:] = d_ref[:]

        @pl.when(jnp.max(act_ref[:]) >= 0.5)
        def _run_sweeps():
            _sweeps(refs)

    def _sweeps(refs):
        if strided:
            d_ref, obs_ref, upd_ref, cp_ref, cn_ref, out_ref = refs
            code_pos = cp_ref[:]
            code_neg = cn_ref[:]
        else:
            d_ref, obs_ref, upd_ref, out_ref = refs
        d = d_ref[:]
        obs = obs_ref[:] > 0.5
        upd = upd_ref[:] > 0.5
        rows = d.shape[0]
        # In-block coordinate fields for strided-read masks (Pallas can't
        # capture array constants; iota-derived, computed once per call).
        if strided:
            col = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE_PAD), 1)
            lane_x = col % P
            lane_y = col // P
            row_z = jax.lax.broadcasted_iota(
                jnp.int32, (rows, LANE_PAD), 0
            ) % P

        # Offsets grouped by step length (1, sqrt2, sqrt3 voxels): the
        # sign-flip cap only needs WHICH step group tripped (3 booleans),
        # not a per-offset f32 min accumulation.
        by_step: dict = {}
        for o in _OFFSETS:
            by_step.setdefault(round(_DIST[o], 6), []).append(o)

        def one_sweep(d, k):
            flips = k == 1
            src = obs & (jnp.abs(d) < max_distance)
            pos = d > 0.0
            if k > 1:
                # Per-voxel jump gates, evaluated at the CENTER: the
                # radius-(k-1) traversability ball covers every
                # intermediate voxel of every direction — no rolls.
                lvl = level_of[k] - 0.5
                gate_pos = code_pos > lvl
                gate_neg = code_neg > lvl
            # Validity-packed one-sided fields.
            dp = jnp.where(src & pos, d, BIG)
            dn = jnp.where(src & ~pos, d, -BIG)
            best_pos = jnp.full_like(d, BIG)
            best_neg = jnp.full_like(d, -BIG)
            trips = []
            zrolled = {
                dz: (
                    pltpu.roll(dp, (-dz * k) % rows, 0) if dz else dp,
                    pltpu.roll(dn, (-dz * k) % rows, 0) if dz else dn,
                )
                for dz in (-1, 0, 1)
            }
            for dist_vox, offs in sorted(by_step.items()):
                step = np.float32(dist_vox * voxel_size * k)
                # Per-GROUP aggregates instead of per-offset updates:
                # step is constant within a group, so the +-step adds
                # hoist out of the offset loop (min(a+s, b+s) ==
                # min(a,b)+s exactly — f32 addition is monotone), and
                # the sign-flip trip test reduces to two threshold
                # compares on validity-masked extrema per group instead
                # of ~10 ops per offset (measured ~15% kernel time).
                gp = jnp.full_like(d, BIG)
                gn = jnp.full_like(d, -BIG)
                if flips:
                    # Sign-flip thresholds (esdf_integrator.cc:458-496):
                    # an opposite-sign neighbor whose projected value
                    # disagrees by > step caps |d| at step. Sign
                    # structure kills half the reference's |.| test: a
                    # valid negative-side neighbor can never EXCEED a
                    # positive center (and mirrored), so only the
                    # one-sided comparisons remain:
                    #   pos center: exists valid ndn < d - 2*step
                    #   neg center: exists valid ndp > d + 2*step
                    # The +-BIG invalid sentinels would satisfy those
                    # tests, so the trip extrema re-mask them to the
                    # LOSING side (gp/gn need no mask: their sentinels
                    # already lose the min/max).
                    tvn = jnp.full_like(d, BIG)
                    tvp = jnp.full_like(d, -BIG)
                for (dx, dy, dz) in offs:
                    ndp, ndn = zrolled[dz]
                    ls = (-(dx + P * dy) * k) % LANE_PAD
                    if ls:
                        ndp = pltpu.roll(ndp, ls, 1)
                        ndn = pltpu.roll(ndn, ls, 1)
                    if k > 1:
                        # Strided reads can leave the 18^3 block (mask
                        # by in-block validity of the source coordinate)
                        # and only fire where the center's admissibility
                        # code covers radius k-1 (see docstring); the
                        # candidate must land inside the max-distance
                        # window for the path induction to hold.
                        m = (
                            (lane_x + k * dx >= 0)
                            & (lane_x + k * dx <= P - 1)
                            & (lane_y + k * dy >= 0)
                            & (lane_y + k * dy <= P - 1)
                            & (row_z + k * dz >= 0)
                            & (row_z + k * dz <= P - 1)
                        )
                        ndp = jnp.where(
                            m & gate_pos & (ndp + step < max_distance),
                            ndp, BIG,
                        )
                        ndn = jnp.where(
                            m & gate_neg & (ndn - step > -max_distance),
                            ndn, -BIG,
                        )
                    gp = jnp.minimum(gp, ndp)
                    gn = jnp.maximum(gn, ndn)
                    if flips:
                        tvn = jnp.minimum(
                            tvn, jnp.where(ndn > -BIG / 2, ndn, BIG)
                        )
                        tvp = jnp.maximum(
                            tvp, jnp.where(ndp < BIG / 2, ndp, -BIG)
                        )
                best_pos = jnp.minimum(best_pos, gp + step)
                best_neg = jnp.maximum(best_neg, gn - step)
                if flips:
                    trip = ((tvn < d - 2 * step) & pos) | (
                        (tvp > d + 2 * step) & ~pos
                    )
                    trips.append((step, trip))
            cand = jnp.where(
                pos, jnp.minimum(d, best_pos), jnp.maximum(d, best_neg)
            )
            sgn = jnp.where(pos, 1.0, -1.0)
            # Apply flip caps largest step first so the smallest tripped
            # step wins (min over tripped groups).
            for step, trip in reversed(trips):
                cand = jnp.where(
                    trip & (jnp.abs(cand) > step), sgn * step, cand
                )
            improved = jnp.abs(cand - d) > min_diff
            return jnp.where(upd & improved, cand, d)

        for k in strides:
            d = one_sweep(d, int(k))
        out_ref[:] = d

    return kernel


def to_2d(x_pad, block_tile: int = 8):
    """[B, 18, 18, 18] padded blocks -> kernel layout [BT*18, LANE_PAD]
    (rows = (block, z), lanes = y*18+x, block count padded to a tile
    multiple, lanes zero-padded)."""
    b = x_pad.shape[0]
    bt = -(-b // block_tile) * block_tile
    x = jnp.pad(x_pad, ((0, bt - b), (0, 0), (0, 0), (0, 0)))
    x = x.reshape(bt * P, P * P)
    return jnp.pad(x, ((0, 0), (0, LANE_PAD - P * P)))


def from_2d(x2, b: int):
    """Kernel layout back to [b, 18, 18, 18]."""
    return x2[: b * P, : P * P].reshape(-1, P, P, P)[:b]


_SPREAD_NP = None


def _spread_matrix():
    """One-hot f32[256, LANE_PAD]: interior lane y*16+x -> padded lane
    (1+y)*18+(1+x)."""
    global _SPREAD_NP
    if _SPREAD_NP is None:
        y, x = np.meshgrid(np.arange(16), np.arange(16), indexing="ij")
        dst = ((1 + y) * P + (1 + x)).reshape(-1)
        m = np.zeros((256, LANE_PAD), np.float32)
        m[np.arange(256), dst] = 1.0
        _SPREAD_NP = m
    return _SPREAD_NP


def interior_to_2d(values, block_tile: int = 8):
    """[B, 16, 16, 16] unpadded blocks -> kernel layout [BT*18, LANE_PAD]
    with a ZERO halo ring, via one one-hot MXU spread per z-row.

    The to_2d(_padded(...)) route materializes [B, 18, 18, 18] cubes
    whose minor dim 18 tile-pads 18 -> 128 (7x HBM; the padded-cube
    assembly measured ~8 ms/scan on the fused online trace). Here the
    only intermediates are [B*16, 256] / [.., LANE_PAD] flats. Follow
    with one _halo_exchange_2d to fill the ring from neighbors (missing
    neighbors keep the 0 ring = the pad fill); update masks that need a
    zero ring use the result directly."""
    b = values.shape[0]
    flat = values.reshape(b * 16, 256).astype(jnp.float32)
    rows2 = jnp.dot(flat, jnp.asarray(_spread_matrix()),
                    precision=jax.lax.Precision.HIGHEST)
    cube = rows2.reshape(b, 16, LANE_PAD)
    bt = -(-b // block_tile) * block_tile
    cube = jnp.pad(cube, ((0, bt - b), (1, 1), (0, 0)))
    return cube.reshape(bt * P, LANE_PAD)


def stride_radii(strides) -> tuple:
    """Erosion radii the admissibility codes must capture, in LEVEL
    order: level i+1 of the codes corresponds to radii()[i] = k_i - 1
    for the i-th distinct stride > 1 (the same ordering _relax_kernel
    derives its per-stride gate levels from)."""
    return tuple(k - 1 for k in sorted({int(k) for k in strides if k > 1}))


def interior_mask_2d(rows: int):
    """f32[rows, LANE_PAD]: 1.0 on interior cells (x,y,z in [1,16]),
    0 on the halo ring and the lane padding."""
    lane = np.arange(LANE_PAD)
    lx = lane % P
    ly = lane // P
    lm = (lx >= 1) & (lx <= P - 2) & (ly >= 1) & (ly <= P - 2) & (lane < LANES)
    z = np.arange(rows) % P
    zm = (z >= 1) & (z <= P - 2)
    return jnp.asarray(
        (zm[:, None] & lm[None, :]).astype(np.float32)
    )


def erode1_2d(m, interior):
    """One Chebyshev (3^3 box) erosion step in kernel layout: separable
    min over x (lane +-1), y (lane +-18), z (sublane +-1). Ring cells
    and pad lanes are zeroed (conservative) — callers re-fill the ring
    from neighbor blocks between steps (halo-synchronized erosion)."""
    mm = jnp.minimum(m, jnp.minimum(jnp.roll(m, 1, 1), jnp.roll(m, -1, 1)))
    mm = jnp.minimum(
        mm, jnp.minimum(jnp.roll(mm, P, 1), jnp.roll(mm, -P, 1))
    )
    mm = jnp.minimum(
        mm, jnp.minimum(jnp.roll(mm, 1, 0), jnp.roll(mm, -1, 0))
    )
    return mm * interior


def relax_2d(d2, o2, u2, inner_sweeps: int, voxel_size: float,
             max_distance: float, min_diff: float,
             interpret: bool = False, block_tile: int = 8,
             strides=None, stride_codes=None, active=None):
    """Run relaxations directly on kernel-layout state ([BT*18, LANE_PAD]
    from ``to_2d``) — callers that keep the sweep state 2D across outer
    iterations skip the per-call cube<->2D relayouts (~5 ms per call at
    512 blocks). ``strides``: per-relaxation step multiples (default
    ``(1,) * inner_sweeps``); strided schedules REQUIRE ``stride_codes``
    = (code_pos, code_neg) — the per-voxel jump-admissibility levels
    (see _relax_kernel and ops/esdf._stride_codes_2d). ``active``:
    optional f32/bool[BT] per-block activity — TILES whose blocks are
    all inactive copy through instead of sweeping (the caller must set
    a block active whenever it or a 1-ring neighbor changed in the
    previous outer iteration; see the kernel's soundness note)."""
    strides = tuple(strides) if strides else (1,) * inner_sweeps
    strided = any(k > 1 for k in strides)
    if strided and stride_codes is None:
        raise ValueError("strided schedules require stride_codes "
                         "(per-voxel admissibility; see stride_radii)")
    rows = d2.shape[0]
    bt = rows // P
    kern = _relax_kernel(strides, voxel_size, max_distance, min_diff)
    rows_tile = block_tile * P
    grid = (bt // block_tile,)
    spec = pl.BlockSpec((rows_tile, LANE_PAD), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if active is None:
        act2 = jnp.ones((rows, 128), jnp.float32)
    else:
        # Row-replicated so the activity tile keeps a sublane dim
        # divisible by 8 for any block_tile (Mosaic block constraint).
        act2 = jnp.broadcast_to(
            active.astype(jnp.float32)[:, None, None], (bt, P, 128)
        ).reshape(rows, 128)
    act_spec = pl.BlockSpec((rows_tile, 128), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    args = (d2, o2, u2) + (tuple(stride_codes) if strided else ())
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, LANE_PAD), jnp.float32),
        grid=grid,
        in_specs=[spec] * len(args) + [act_spec],
        out_specs=spec,
        interpret=interpret,
    )(*args, act2)


@partial(
    jax.jit,
    static_argnames=("inner_sweeps", "voxel_size", "max_distance",
                     "min_diff", "interpret", "block_tile", "strides"),
)
def relax_padded(d_pad, obs_pad, upd_pad, inner_sweeps: int,
                 voxel_size: float, max_distance: float, min_diff: float,
                 interpret: bool = False, block_tile: int = 8,
                 strides=None):
    """Run inner_sweeps relaxations on padded blocks.

    d_pad: f32[B, 18, 18, 18] distances (with halo ring).
    obs_pad: f32[B, 18, 18, 18] 1.0 where observed.
    upd_pad: f32[B, 18, 18, 18] 1.0 where the CENTER voxel may update
             (interior only; the halo ring must be 0).
    Returns the updated padded array (only interior cells change).
    """
    b = d_pad.shape[0]
    d2 = to_2d(d_pad, block_tile)
    o2 = to_2d(obs_pad, block_tile)
    u2 = to_2d(upd_pad, block_tile)
    codes = None
    if strides and any(k > 1 for k in strides):
        # Standalone blocks (no neighbor table): erode without halo
        # refresh — erode1_2d zeroes the ring each step, so codes are
        # conservative within radius-r of block borders (jumps simply
        # don't fire there). Traversability = updatable (the upd
        # contract already excludes the ring and fixed voxels), split
        # by the static voxel sign.
        interior2 = jnp.tile(interior_mask_2d(d2.shape[0]), (2, 1))
        trav = u2 > 0.5
        m = jnp.concatenate(
            [(trav & (d2 > 0.0)).astype(jnp.float32),
             (trav & (d2 <= 0.0)).astype(jnp.float32)], axis=0
        ) * interior2
        code = jnp.zeros_like(m)
        done = 0
        for r in stride_radii(strides):
            for _ in range(r - done):
                m = erode1_2d(m, interior2)
            done = r
            code = code + m
        rows = d2.shape[0]
        codes = (code[:rows], code[rows:])
    out = relax_2d(
        d2, o2, u2, inner_sweeps, voxel_size,
        max_distance, min_diff, interpret=interpret, block_tile=block_tile,
        strides=strides, stride_codes=codes,
    )
    return from_2d(out, b)

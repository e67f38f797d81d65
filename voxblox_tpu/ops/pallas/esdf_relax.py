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
    path's k-1 INTERMEDIATE voxels must be traversable (observed, same
    sign) or the jump would tunnel through unobserved pockets / across
    surfaces and permanently UNDER-estimate (monotone relaxation cannot
    raise values back). Jumps are therefore gated per block by
    ``stride_ok`` — the block's full 18^3 padded cube (ring included) is
    entirely observed and sign-uniform, which covers every jump ending
    in the cube since observedness and signs are static across sweeps.
    Strided reads also need in-block validity masks (iota-derived); the
    sign-flip rule runs only at stride 1 (it caps |d| at the INTERFACE
    step length).
    """
    strided = any(k > 1 for k in strides)

    def kernel(*refs):
        if strided:
            d_ref, obs_ref, upd_ref, sok_ref, out_ref = refs
            stride_ok = sok_ref[:] > 0.5
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
                # Sign-flip thresholds (esdf_integrator.cc:458-496): an
                # opposite-sign neighbor whose projected value disagrees
                # by > step caps |d| at step. Sign structure kills half
                # the reference's |.| test: a valid negative-side
                # neighbor can never EXCEED a positive center (and
                # mirrored), so only the one-sided comparisons remain:
                #   pos center: ndn < d - 2*step
                #   neg center: ndp > d + 2*step
                if flips:
                    lo = d - 2 * step
                    hi = d + 2 * step
                trip = None
                for (dx, dy, dz) in offs:
                    ndp, ndn = zrolled[dz]
                    ls = (-(dx + P * dy) * k) % LANE_PAD
                    if ls:
                        ndp = pltpu.roll(ndp, ls, 1)
                        ndn = pltpu.roll(ndn, ls, 1)
                    if k > 1:
                        # Strided reads can leave the 18^3 block (mask
                        # by in-block validity of the source coordinate)
                        # and must only fire in fully-observed
                        # sign-uniform blocks (see docstring).
                        m = (
                            stride_ok
                            & (lane_x + k * dx >= 0)
                            & (lane_x + k * dx <= P - 1)
                            & (lane_y + k * dy >= 0)
                            & (lane_y + k * dy <= P - 1)
                            & (row_z + k * dz >= 0)
                            & (row_z + k * dz <= P - 1)
                        )
                        ndp = jnp.where(m, ndp, BIG)
                        ndn = jnp.where(m, ndn, -BIG)
                    best_pos = jnp.minimum(best_pos, ndp + step)
                    best_neg = jnp.maximum(best_neg, ndn - step)
                    if flips:
                        # (invalid sentinels +-BIG would satisfy the
                        # one-sided tests, so the validity guard stays.)
                        t = ((ndn > -BIG / 2) & (ndn < lo) & pos) | (
                            (ndp < BIG / 2) & (ndp > hi) & ~pos
                        )
                        trip = t if trip is None else (trip | t)
                if flips:
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


def stride_ok_2d(d2, o2, block_tile: int = 8):
    """Per-block strided-jump gate in kernel layout (see _relax_kernel):
    1.0 on every row/lane of a block whose INTERIOR 16^3 is entirely
    observed AND sign-uniform. Only the interior matters: a jump's k-1
    intermediate voxels lie strictly between an interior center and the
    source, hence are always interior; ring-cell ENDPOINTS are already
    guarded by the +-BIG source packing. (Requiring the ring too
    disabled jumps in nearly every block of a shell-shaped active set —
    any block with a missing neighbor — and regressed the batch sweep to
    one effective unit sweep per exchange.) Observedness and signs are
    static across sweeps, so compute once per update from the seeded
    state."""
    rows = d2.shape[0]
    bt = rows // P
    lane = np.arange(LANE_PAD)
    lx = lane % P
    ly = lane // P
    z = np.arange(P)
    interior = (
        ((z >= 1) & (z <= P - 2))[:, None]
        & ((lx >= 1) & (lx <= P - 2) & (ly >= 1) & (ly <= P - 2))[None, :]
    )  # [P, LANE_PAD]
    m3 = jnp.asarray(interior[None])
    o3 = (o2 > 0.5).reshape(bt, P, LANE_PAD)
    obs_b = jnp.all(jnp.where(m3, o3, True), axis=(1, 2))
    pos3 = (d2 > 0.0).reshape(bt, P, LANE_PAD)
    uniform = (
        jnp.all(jnp.where(m3, pos3, True), axis=(1, 2))
        | jnp.all(jnp.where(m3, ~pos3, True), axis=(1, 2))
    )
    ok = (obs_b & uniform).astype(jnp.float32)
    return jnp.broadcast_to(
        jnp.repeat(ok, P)[:, None], (rows, LANE_PAD)
    )


def relax_2d(d2, o2, u2, inner_sweeps: int, voxel_size: float,
             max_distance: float, min_diff: float,
             interpret: bool = False, block_tile: int = 8,
             strides=None, stride_ok=None):
    """Run relaxations directly on kernel-layout state ([BT*18, LANE_PAD]
    from ``to_2d``) — callers that keep the sweep state 2D across outer
    iterations skip the per-call cube<->2D relayouts (~5 ms per call at
    512 blocks). ``strides``: per-relaxation step multiples (default
    ``(1,) * inner_sweeps``); strided schedules REQUIRE ``stride_ok``
    (stride_ok_2d) — the per-block jump-soundness gate."""
    strides = tuple(strides) if strides else (1,) * inner_sweeps
    strided = any(k > 1 for k in strides)
    if strided and stride_ok is None:
        raise ValueError("strided schedules require stride_ok "
                         "(see stride_ok_2d)")
    rows = d2.shape[0]
    bt = rows // P
    kern = _relax_kernel(strides, voxel_size, max_distance, min_diff)
    rows_tile = block_tile * P
    grid = (bt // block_tile,)
    spec = pl.BlockSpec((rows_tile, LANE_PAD), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    args = (d2, o2, u2) + ((stride_ok,) if strided else ())
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, LANE_PAD), jnp.float32),
        grid=grid,
        in_specs=[spec] * len(args),
        out_specs=spec,
        interpret=interpret,
    )(*args)


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
    sok = (
        stride_ok_2d(d2, o2, block_tile)
        if strides and any(k > 1 for k in strides) else None
    )
    out = relax_2d(
        d2, o2, to_2d(upd_pad, block_tile), inner_sweeps, voxel_size,
        max_distance, min_diff, interpret=interpret, block_tile=block_tile,
        strides=strides, stride_ok=sok,
    )
    return from_2d(out, b)

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
LANE_PAD = 512

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


def _relax_kernel(inner_sweeps: int, voxel_size: float, max_distance: float,
                  min_diff: float):
    """26-neighbor relaxation, mask-free.

    Boundary masks are unnecessary: only interior voxels (x,y,z in
    [1,16]) carry ``upd``; their +-1 neighbors live at [0,17], so a lane
    roll never carries x across a y-row (lane = y*P + x with x+-1 within
    [0,17]) and a sublane roll never crosses a block's 18-row group.
    Lanes whose reads DO wrap (halo ring, pad lanes >= 324) produce
    garbage that ``upd`` discards. Source validity (observed and inside
    the max-distance window) is pre-packed into the values: invalid
    voxels become +-BIG, which loses every min/max against a real
    candidate. This halves the rolls (no separate validity shift) and
    removes all iota/divide mask math from the hot loop; the z-roll is
    hoisted per dz group (2 sublane rolls per array per sweep instead
    of 26).
    """

    def kernel(d_ref, obs_ref, upd_ref, out_ref):
        d = d_ref[:]
        obs = obs_ref[:] > 0.5
        upd = upd_ref[:] > 0.5
        rows = d.shape[0]

        def one_sweep(_, d):
            src = obs & (jnp.abs(d) < max_distance)
            pos = d > 0.0
            # Validity-packed one-sided fields.
            dp = jnp.where(src & pos, d, BIG)
            dn = jnp.where(src & ~pos, d, -BIG)
            best_pos = jnp.full_like(d, BIG)
            best_neg = jnp.full_like(d, -BIG)
            flip_len = jnp.full_like(d, BIG)
            for dz in (-1, 0, 1):
                dpz = pltpu.roll(dp, (-dz) % rows, 0) if dz else dp
                dnz = pltpu.roll(dn, (-dz) % rows, 0) if dz else dn
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if (dx, dy, dz) == (0, 0, 0):
                            continue
                        step = np.float32(
                            _DIST[(dx, dy, dz)] * voxel_size
                        )
                        ls = (-(dx + P * dy)) % LANE_PAD
                        ndp = pltpu.roll(dpz, ls, 1) if ls else dpz
                        ndn = pltpu.roll(dnz, ls, 1) if ls else dnz
                        best_pos = jnp.minimum(best_pos, ndp + step)
                        best_neg = jnp.maximum(best_neg, ndn - step)
                        # Sign-flip rule (esdf_integrator.cc:458-496):
                        # an opposite-sign neighbor whose projected value
                        # disagrees by > step caps |d| at step. Positive
                        # centers test negative neighbors and vice versa.
                        disc_n = (ndn > -BIG / 2) & (
                            jnp.abs(ndn + step - d) > step
                        )
                        disc_p = (ndp < BIG / 2) & (
                            jnp.abs(ndp - step - d) > step
                        )
                        # (no jnp.where on i1 vectors — Mosaic can't
                        # lower the i8->i1 select truncation)
                        tripped = (pos & disc_n) | (~pos & disc_p)
                        flip_len = jnp.where(
                            tripped, jnp.minimum(flip_len, step), flip_len
                        )
            cand = jnp.where(
                pos, jnp.minimum(d, best_pos), jnp.maximum(d, best_neg)
            )
            sgn = jnp.where(pos, 1.0, -1.0)
            cand = jnp.where(
                (flip_len < BIG / 2) & (jnp.abs(cand) > flip_len),
                sgn * flip_len, cand,
            )
            improved = jnp.abs(cand - d) > min_diff
            return jnp.where(upd & improved, cand, d)

        out_ref[:] = jax.lax.fori_loop(0, inner_sweeps, one_sweep, d)

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


def relax_2d(d2, o2, u2, inner_sweeps: int, voxel_size: float,
             max_distance: float, min_diff: float,
             interpret: bool = False, block_tile: int = 8):
    """Run inner_sweeps relaxations directly on kernel-layout state
    ([BT*18, LANE_PAD] from ``to_2d``) — callers that keep the sweep
    state 2D across outer iterations skip the per-call cube<->2D
    relayouts (~5 ms per call at 512 blocks)."""
    rows = d2.shape[0]
    bt = rows // P
    kern = _relax_kernel(inner_sweeps, voxel_size, max_distance, min_diff)
    rows_tile = block_tile * P
    grid = (bt // block_tile,)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((rows, LANE_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows_tile, LANE_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, LANE_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_tile, LANE_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows_tile, LANE_PAD), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(d2, o2, u2)


@partial(
    jax.jit,
    static_argnames=("inner_sweeps", "voxel_size", "max_distance",
                     "min_diff", "interpret", "block_tile"),
)
def relax_padded(d_pad, obs_pad, upd_pad, inner_sweeps: int,
                 voxel_size: float, max_distance: float, min_diff: float,
                 interpret: bool = False, block_tile: int = 8):
    """Run inner_sweeps relaxations on padded blocks.

    d_pad: f32[B, 18, 18, 18] distances (with halo ring).
    obs_pad: f32[B, 18, 18, 18] 1.0 where observed.
    upd_pad: f32[B, 18, 18, 18] 1.0 where the CENTER voxel may update
             (interior only; the halo ring must be 0).
    Returns the updated padded array (only interior cells change).
    """
    b = d_pad.shape[0]
    out = relax_2d(
        to_2d(d_pad, block_tile), to_2d(obs_pad, block_tile),
        to_2d(upd_pad, block_tile), inner_sweeps, voxel_size,
        max_distance, min_diff, interpret=interpret, block_tile=block_tile,
    )
    return from_2d(out, b)

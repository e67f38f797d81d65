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


def _shift(arr, dx, dy, dz, fill):
    """Shift the [B*P, LANE_PAD] view so each voxel sees its neighbor at
    (+dx, +dy, +dz); out-of-block lanes/sublanes become ``fill``.

    arr rows are (block, z), lanes are y*P + x.
    """
    rows, lanes = arr.shape
    out = arr
    # x/y shift: lane roll by dx + P*dy (roll requires non-negative shift;
    # rolling by size-shift goes the other way). Voxel at lane l reads
    # l + dx + P*dy.
    lane_shift = (-(dx + P * dy)) % LANE_PAD
    if lane_shift:
        out = pltpu.roll(out, lane_shift, 1)
    # z shift: sublane roll within each block's P-row group.
    if dz:
        out = pltpu.roll(out, (-dz) % rows, 0)
    # Validity masks.
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE_PAD), 1)
    x = lane_ids % P
    y = lane_ids // P  # includes pad lanes (y >= P invalid anyway)
    ok = (y < P)
    if dx:
        xs = x + dx
        ok = ok & (xs >= 0) & (xs < P)
    if dy:
        ys = y + dy
        ok = ok & (ys >= 0) & (ys < P)
    if dz:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANE_PAD), 0)
        z = row_ids % P
        zs = z + dz
        ok = ok & (zs >= 0) & (zs < P)
    return jnp.where(ok, out, fill)


def _relax_kernel(inner_sweeps: int, voxel_size: float, max_distance: float,
                  min_diff: float):
    def kernel(d_ref, obs_ref, upd_ref, out_ref):
        d = d_ref[:]
        obs = obs_ref[:] > 0.5
        upd = upd_ref[:] > 0.5

        def one_sweep(_, d):
            src = obs & (jnp.abs(d) < max_distance)
            src_f = jnp.where(src, 1.0, 0.0)
            pos = d > 0.0
            best_pos = jnp.full_like(d, jnp.inf)
            best_neg = jnp.full_like(d, -jnp.inf)
            flip_len = jnp.full_like(d, jnp.inf)
            for (dx, dy, dz) in _OFFSETS:
                step = np.float32(_DIST[(dx, dy, dz)] * voxel_size)
                nd = _shift(d, dx, dy, dz, np.float32(0.0))
                n_ok = _shift(src_f, dx, dy, dz, np.float32(0.0)) > 0.5
                n_pos = nd > 0.0
                best_pos = jnp.minimum(
                    best_pos, jnp.where(n_ok & n_pos, nd + step, jnp.inf)
                )
                best_neg = jnp.maximum(
                    best_neg, jnp.where(n_ok & ~n_pos, nd - step, -jnp.inf)
                )
                diff_sign = n_pos != pos
                potential = nd - jnp.where(n_pos, step, -step)
                discrepant = jnp.abs(potential - d) > step
                flip_len = jnp.minimum(
                    flip_len,
                    jnp.where(n_ok & diff_sign & discrepant, step, jnp.inf),
                )
            cand = jnp.where(
                pos, jnp.minimum(d, best_pos), jnp.maximum(d, best_neg)
            )
            sgn = jnp.where(pos, 1.0, -1.0)
            cand = jnp.where(
                jnp.isfinite(flip_len) & (jnp.abs(cand) > flip_len),
                sgn * flip_len, cand,
            )
            improved = jnp.abs(cand - d) > min_diff
            return jnp.where(upd & improved, cand, d)

        out_ref[:] = jax.lax.fori_loop(0, inner_sweeps, one_sweep, d)

    return kernel


@partial(
    jax.jit,
    static_argnames=("inner_sweeps", "voxel_size", "max_distance",
                     "min_diff", "interpret"),
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
    # Pad block count to a tile multiple and lanes to LANE_PAD.
    bt = -(-b // block_tile) * block_tile

    def to2d(x):
        x = jnp.pad(x, ((0, bt - b), (0, 0), (0, 0), (0, 0)))
        x = x.reshape(bt * P, P * P)
        return jnp.pad(x, ((0, 0), (0, LANE_PAD - P * P)))

    d2 = to2d(d_pad)
    o2 = to2d(obs_pad)
    u2 = to2d(upd_pad)

    kern = _relax_kernel(inner_sweeps, voxel_size, max_distance, min_diff)
    rows_tile = block_tile * P
    grid = (bt // block_tile,)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((bt * P, LANE_PAD), jnp.float32),
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
    out = out[: b * P, : P * P].reshape(b, P, P, P)
    return out

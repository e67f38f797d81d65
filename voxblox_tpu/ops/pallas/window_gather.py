"""Pallas TPU kernel: coherent image gather via per-group windows.

Round-2 groundwork for the projective integrator's remaining bottleneck:
its mixed-block voxels each gather one 8-channel pixel from the range
image, and XLA lowers that to ~100 M random accesses/s (~8 ms/scan).

The coherent structure — 128 consecutive voxels of a block project into a
small image window — lets a kernel fetch one (16, 256)-pixel window per
group through a *scalar-prefetch-driven BlockSpec index_map* (the
sanctioned dynamic-window mechanism; raw multi-dim ``pl.ds`` with dynamic
starts crashes the Mosaic compile on this stack) and resolve the per-lane
gather with two one-hot contractions:

  rowsel[l, u, c] = sum_v onehotV[v, l] * window[v, u, c]   (MXU matmul)
  out[l, c]       = sum_u onehotU[l, u] * rowsel[l, u, c]   (VPU reduce)

The image is pre-tiled into OVERLAPPING windows (row stride 8, col stride
128, window 16 x 256) so every group with v-span < 8 and u-span < 128
fits one window; groups that don't (very close / grazing blocks) are
reported for an XLA fallback gather over their (compacted) lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_V = 16
WIN_U = 256
STRIDE_V = 8
STRIDE_U = 128
# No-return / out-of-image sentinel. The one-hot contraction multiplies
# every window entry by 0 or 1, so inf entries would poison results with
# 0*inf = NaN; images are sanitized to this finite value instead.
BIG = np.float32(1e30)


def build_windows(image):
    """image f32[H, W, C] -> windows f32[HB, WB, C, WIN_V, WIN_U].

    Overlapping tiles: window (hb, wb) covers rows [hb*8, hb*8+16) and
    cols [wb*128, wb*128+256) of the (padded) image. PLANAR channel
    layout: the kernel contracts each [16, 256] channel plane on the MXU
    separately (Mosaic cannot reshape across a small trailing channel
    dim).
    """
    h, w, c = image.shape
    hb = max(1, -(-(h - WIN_V) // STRIDE_V) + 1)
    wb = max(1, -(-(w - WIN_U) // STRIDE_U) + 1)
    pad_h = (hb - 1) * STRIDE_V + WIN_V - h
    pad_w = (wb - 1) * STRIDE_U + WIN_U - w
    image = jnp.where(jnp.isfinite(image), image, BIG)
    img = jnp.pad(image, ((0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0)),
                  constant_values=BIG)
    img = img.transpose(2, 0, 1)  # [C, H, W]
    rows = []
    for i in range(hb):
        cols = []
        for j in range(wb):
            cols.append(
                img[:, i * STRIDE_V : i * STRIDE_V + WIN_V,
                    j * STRIDE_U : j * STRIDE_U + WIN_U]
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [HB, WB, C, 16, 256]


def _gather_kernel(c: int):
    def kernel(vb_ref, ub_ref, win_ref, vloc_ref, uloc_ref, out_ref):
        del vb_ref, ub_ref  # consumed by the index_map
        vloc = vloc_ref[0, 0]  # [128]
        uloc = uloc_ref[0, 0]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (128, WIN_V), 1)
        onehot_v = (iota_v == vloc[:, None]).astype(jnp.float32)  # [128,16]
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (128, WIN_U), 1)
        onehot_u = (iota_u == uloc[:, None]).astype(jnp.float32)  # [128,256]
        for ci in range(c):
            window = win_ref[0, 0, ci]  # [16, 256]
            rowsel = jax.lax.dot_general(
                onehot_v, window,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # HIGHEST: the default MXU pass rounds the window values
                # to bf16 — a gather must return exact f32 bits.
                precision=jax.lax.Precision.HIGHEST,
            )  # [128, 256]
            out_ref[0, ci] = jnp.sum(rowsel * onehot_u, axis=1)

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def window_gather(windows, vb, ub, vloc, uloc, interpret: bool = False):
    """Gather image values for G groups of 128 lanes.

    windows: f32[HB, WB, C, 16, 256] from build_windows.
    vb, ub: int32[G] window tile index per group.
    vloc, uloc: int32[G, 128] in-window coordinates per lane
                (callers must pre-clip to [0,16) / [0,256)).
    Returns f32[G, C, 128] (planar channels — matches the integrator's
    [C, S, 128] gather layout up to the leading transpose).

    Sort groups by (vb, wb) before calling when possible: Pallas skips
    the window DMA when consecutive grid steps map to the same block.
    """
    g = vb.shape[0]
    c = windows.shape[2]
    # Coordinates travel as [G, 1, 128]: a (1, 1, 128) block's trailing
    # dims equal the array's, which Mosaic accepts ((1, 128) blocks of a
    # [G, 128] array do not lower — second-minor must be a multiple of 8
    # or the full dimension).
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, c, WIN_V, WIN_U),
                lambda i, vb_ref, ub_ref: (vb_ref[i], ub_ref[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 128), lambda i, vb_ref, ub_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda i, vb_ref, ub_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, 128), lambda i, vb_ref, ub_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _gather_kernel(c),
        out_shape=jax.ShapeDtypeStruct((g, c, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(vb, ub, windows, vloc[:, None, :], uloc[:, None, :])


# ---------------------------------------------------------------------------
# Batched variant: GPB groups per grid step.
#
# The per-group kernel above is GRID-STEP-bound on real hardware
# (measured 34 ms for 16384 groups vs 18 ms for the XLA gather — ~2 us
# of fixed cost per step dwarfs the tiny per-group compute). The batched
# variant sorts groups by window id and processes GPB consecutive groups
# per step against ONE shared window, cutting the step count ~GPB-fold;
# groups that straddle a window boundary inside a step lose their
# out-of-window lanes to the caller's fallback mask (same contract as
# span overflow). Channels must be bf16-REPRESENTABLE values: the MXU
# one-hot contraction runs at default precision, which rounds operands
# to bf16 (exact f32 channels travel as hi/lo bf16 splits — see
# split_bf16).
# ---------------------------------------------------------------------------


def split_bf16(x):
    """f32 -> (hi, lo) bf16-representable f32 pair with hi + lo ~= x
    (|err| <= 2^-9 |lo|): both halves pass through a default-precision
    MXU contraction bit-exactly."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    lo = (x - hi).astype(jnp.bfloat16).astype(jnp.float32)
    return hi, lo


def _batched_kernel(c: int, gpb: int):
    n = gpb * 128

    def kernel(vb_ref, ub_ref, win_ref, vloc_ref, uloc_ref, out_ref):
        del vb_ref, ub_ref  # consumed by the index_map
        vloc = vloc_ref[0, 0]  # [gpb*128]
        uloc = uloc_ref[0, 0]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (n, WIN_V), 1)
        onehot_v = (iota_v == vloc[:, None]).astype(jnp.float32)
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (n, WIN_U), 1)
        onehot_u = (iota_u == uloc[:, None]).astype(jnp.float32)
        for ci in range(c):
            window = win_ref[0, 0, ci]  # [16, 256]
            rowsel = jax.lax.dot_general(
                onehot_v, window,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [n, 256] — default precision: operands must be
            # bf16-representable (0/1 one-hots and split channels are).
            out_ref[0, ci] = jnp.sum(rowsel * onehot_u, axis=1)

    return kernel


def plan_steps(vi, ui, valid, hb: int, wb: int, gpb: int,
               n_steps: int | None = None):
    """Sort groups by window and pack them GPB per grid step.

    Returns (vb_s, ub_s int32[n_steps]; vloc_s, uloc_s
    int32[n_steps, 1, gpb*128]; flat_of int32[G] (group -> step*gpb +
    slot, for unsorting the kernel output); in_window bool[G, 128] in
    ORIGINAL group order — lanes outside their step's window, including
    boundary-straddling groups, must take the caller's fallback path).
    ``n_steps`` defaults to the worst case G//gpb + hb*wb (one ragged
    step per window).
    """
    g = vi.shape[0]
    big = jnp.int32(1 << 20)
    vmin = jnp.min(jnp.where(valid, vi, big), axis=1)
    umin = jnp.min(jnp.where(valid, ui, big), axis=1)
    any_valid = jnp.any(valid, axis=1)
    vmin = jnp.where(any_valid, vmin, 0)
    umin = jnp.where(any_valid, umin, 0)
    vb = jnp.clip(vmin // STRIDE_V, 0, hb - 1).astype(jnp.int32)
    ub = jnp.clip(umin // STRIDE_U, 0, wb - 1).astype(jnp.int32)
    wid = vb * wb + ub

    order = jnp.argsort(wid).astype(jnp.int32)
    wid_s = wid[order]
    idx = jnp.arange(g, dtype=jnp.int32)
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), wid_s[1:] != wid_s[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_seg, idx, 0)
    )
    pos_in_seg = idx - seg_start
    new_step = new_seg | (pos_in_seg % gpb == 0)
    step_id = jnp.cumsum(new_step.astype(jnp.int32)) - 1
    slot = pos_in_seg % gpb
    if n_steps is None:
        n_steps = g // gpb + hb * wb
    flat_sorted = step_id * gpb + slot  # [G] position in step layout

    step_wid = jnp.zeros((n_steps,), jnp.int32).at[step_id].max(
        wid_s, mode="drop"
    )
    vb_s = step_wid // wb
    ub_s = step_wid % wb

    vloc = vi - (vb * STRIDE_V)[:, None]
    uloc = ui - (ub * STRIDE_U)[:, None]
    in_window = (
        valid
        & (vloc >= 0) & (vloc < WIN_V)
        & (uloc >= 0) & (uloc < WIN_U)
    )
    vloc = jnp.clip(vloc, 0, WIN_V - 1).astype(jnp.int32)
    uloc = jnp.clip(uloc, 0, WIN_U - 1).astype(jnp.int32)

    vloc_s = jnp.zeros((n_steps * gpb, 128), jnp.int32).at[
        flat_sorted
    ].set(vloc[order], mode="drop", unique_indices=True)
    uloc_s = jnp.zeros((n_steps * gpb, 128), jnp.int32).at[
        flat_sorted
    ].set(uloc[order], mode="drop", unique_indices=True)
    flat_of = jnp.zeros((g,), jnp.int32).at[order].set(
        flat_sorted, unique_indices=True
    )
    # Steps never span window segments, so a packed group always meets
    # its own window — but with a too-small n_steps cap trailing groups
    # fall off the step layout: mark their lanes for fallback.
    dropped = flat_of >= n_steps * gpb
    in_window = in_window & ~dropped[:, None]
    return (
        vb_s, ub_s,
        vloc_s.reshape(n_steps, 1, gpb * 128),
        uloc_s.reshape(n_steps, 1, gpb * 128),
        flat_of, in_window,
    )


@partial(jax.jit, static_argnames=("interpret",))
def window_gather_batched(windows, vb_s, ub_s, vloc_s, uloc_s,
                          interpret: bool = False):
    """Batched gather: one grid step per GPB groups (see plan_steps).

    windows: f32[HB, WB, C, 16, 256] of bf16-REPRESENTABLE values.
    Returns f32[n_steps, C, gpb*128]; recover per-group rows with
    ``out.reshape(n_steps * gpb? ...)`` — callers index through
    plan_steps' ``flat_of`` (see gather_packed)."""
    n_steps = vb_s.shape[0]
    c = windows.shape[2]
    n = vloc_s.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, c, WIN_V, WIN_U),
                lambda i, vb_ref, ub_ref: (vb_ref[i], ub_ref[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, n), lambda i, vb_ref, ub_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, vb_ref, ub_ref: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, c, n), lambda i, vb_ref, ub_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _batched_kernel(c, n // 128),
        out_shape=jax.ShapeDtypeStruct((n_steps, c, n), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(vb_s, ub_s, windows, vloc_s, uloc_s)


def gather_packed(out_steps, flat_of, gpb: int):
    """Kernel output [n_steps, C, gpb*128] -> per-group [G, C, 128]
    via the plan_steps group map (one row gather per group)."""
    n_steps, c, n = out_steps.shape
    rows = out_steps.transpose(0, 2, 1).reshape(n_steps * gpb, 128, c)
    return rows[flat_of].transpose(0, 2, 1)  # [G, C, 128]


def plan_groups(vi, ui, valid, hb: int, wb: int):
    """Group-plan lanes [G, 128] of integer pixel coords.

    Returns (vb, ub, vloc, uloc, in_window): groups whose span exceeds the
    window report in_window=False lanes (XLA fallback). Invalid lanes are
    pointed at the group window origin (gathered value is discarded).
    """
    big = jnp.int32(1 << 20)
    vmin = jnp.min(jnp.where(valid, vi, big), axis=1)
    umin = jnp.min(jnp.where(valid, ui, big), axis=1)
    any_valid = jnp.any(valid, axis=1)
    vmin = jnp.where(any_valid, vmin, 0)
    umin = jnp.where(any_valid, umin, 0)
    vb = jnp.clip(vmin // STRIDE_V, 0, hb - 1)
    ub = jnp.clip(umin // STRIDE_U, 0, wb - 1)
    vloc = vi - (vb * STRIDE_V)[:, None]
    uloc = ui - (ub * STRIDE_U)[:, None]
    in_window = (
        valid
        & (vloc >= 0) & (vloc < WIN_V)
        & (uloc >= 0) & (uloc < WIN_U)
    )
    vloc = jnp.clip(vloc, 0, WIN_V - 1)
    uloc = jnp.clip(uloc, 0, WIN_U - 1)
    return vb.astype(jnp.int32), ub.astype(jnp.int32), vloc, uloc, in_window

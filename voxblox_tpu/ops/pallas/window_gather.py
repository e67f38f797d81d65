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
    """image f32[H, W, C] -> windows f32[HB, WB, WIN_V, WIN_U, C].

    Overlapping tiles: window (hb, wb) covers rows [hb*8, hb*8+16) and
    cols [wb*128, wb*128+256) of the (padded) image.
    """
    h, w, c = image.shape
    hb = max(1, -(-(h - WIN_V) // STRIDE_V) + 1)
    wb = max(1, -(-(w - WIN_U) // STRIDE_U) + 1)
    pad_h = (hb - 1) * STRIDE_V + WIN_V - h
    pad_w = (wb - 1) * STRIDE_U + WIN_U - w
    image = jnp.where(jnp.isfinite(image), image, BIG)
    img = jnp.pad(image, ((0, max(pad_h, 0)), (0, max(pad_w, 0)), (0, 0)),
                  constant_values=BIG)
    rows = []
    for i in range(hb):
        cols = []
        for j in range(wb):
            cols.append(
                img[i * STRIDE_V : i * STRIDE_V + WIN_V,
                    j * STRIDE_U : j * STRIDE_U + WIN_U]
            )
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)  # [HB, WB, 16, 256, C]


def _gather_kernel(c: int):
    def kernel(vb_ref, ub_ref, win_ref, vloc_ref, uloc_ref, out_ref):
        del vb_ref, ub_ref  # consumed by the index_map
        window = win_ref[0, 0]  # [16, 256, C]
        vloc = vloc_ref[0]  # [128]
        uloc = uloc_ref[0]
        iota_v = jax.lax.broadcasted_iota(jnp.int32, (WIN_V, 128), 0)
        onehot_v = (iota_v == vloc[None, :]).astype(jnp.float32)  # [16,128]
        rowsel = jax.lax.dot_general(
            onehot_v,
            window.reshape(WIN_V, WIN_U * c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [128, 256*C]
        rowsel = rowsel.reshape(128, WIN_U, c)
        iota_u = jax.lax.broadcasted_iota(jnp.int32, (128, WIN_U), 1)
        onehot_u = (iota_u == uloc[:, None]).astype(jnp.float32)
        out = jnp.sum(rowsel * onehot_u[:, :, None], axis=1)  # [128, C]
        out_ref[0] = out

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def window_gather(windows, vb, ub, vloc, uloc, interpret: bool = False):
    """Gather image values for G groups of 128 lanes.

    windows: f32[HB, WB, 16, 256, C] from build_windows.
    vb, ub: int32[G] window tile index per group.
    vloc, uloc: int32[G, 128] in-window coordinates per lane
                (callers must pre-clip to [0,16) / [0,256)).
    Returns f32[G, 128, C].
    """
    g = vb.shape[0]
    c = windows.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, 1, WIN_V, WIN_U, c),
                lambda i, vb_ref, ub_ref: (vb_ref[i], ub_ref[i], 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 128), lambda i, vb_ref, ub_ref: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda i, vb_ref, ub_ref: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 128, c), lambda i, vb_ref, ub_ref: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _gather_kernel(c),
        out_shape=jax.ShapeDtypeStruct((g, 128, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(vb, ub, windows, vloc, uloc)


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

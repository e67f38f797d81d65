"""Layer merge / rigid transform / resample.

Equivalent of the reference merge_integration.h + utils/voxel_utils.cc:

- ``merge_layers``: voxel-wise merge of co-located layers
  (mergeLayerAintoLayerB, merge_integration.h:20-54) with the
  per-type rules of mergeVoxelAIntoVoxelB (voxel_utils.cc:9-39): TSDF =
  weighted average, ESDF = plain average, occupancy = log-odds sum;
- ``transform_layer``: rigid-transform resample (merge_integration.h:
  145-220): conservative target block cover from the transformed source
  bounds, then inverse-warp trilinear sampling at T^-1 * voxel centers —
  a batched grid-sample on TPU.

Grids may differ in voxel size between source and target for
``transform_layer`` (that's the resample path).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from . import interp


def merge_layers(target: vlayer.VoxelLayer, source: vlayer.VoxelLayer):
    """Merge source into target (same voxel_size/vps). Returns target'."""
    assert target.vps == source.vps
    assert abs(target.voxel_size - source.voxel_size) < 1e-9
    assert target.layer_type == source.layer_type

    src_active = source.active_mask()
    target, overflow = vlayer.allocate_blocks(
        target, source.block_ijk, src_active
    )
    tgt_slot = vlayer.lookup_blocks(target, source.block_ijk)
    sel = src_active & (tgt_slot >= 0)
    safe_t = jnp.where(sel, tgt_slot, target.max_blocks)

    vpb = target.voxels_per_block
    ch = {k: v for k, v in target.channels.items()}
    lt = target.layer_type

    def scatter_rows(arr, rows, vals):
        return arr.at[rows].set(vals, mode="drop")

    if lt == "tsdf":
        tw = ch["weight"].at[safe_t].get(mode="fill", fill_value=0.0)
        sw_ = source.channels["weight"]
        tot = jnp.maximum(tw + sw_, 1e-12)
        new_d = (
            ch["tsdf"].at[safe_t].get(mode="fill", fill_value=0.0) * tw
            + source.channels["tsdf"] * sw_
        ) / tot
        # Color is interleaved [mb, vpb*3]: lane-repeat the per-voxel
        # weights to line up with the rgb triplets.
        tw3 = jnp.repeat(tw, 3, axis=-1)
        sw3 = jnp.repeat(sw_, 3, axis=-1)
        new_c = (
            ch["color"].at[safe_t].get(mode="fill", fill_value=0.0) * tw3
            + source.channels["color"] * sw3
        ) / jnp.repeat(tot, 3, axis=-1)
        ch["tsdf"] = scatter_rows(ch["tsdf"], safe_t, new_d)
        ch["color"] = scatter_rows(ch["color"], safe_t, new_c)
        ch["weight"] = scatter_rows(ch["weight"], safe_t, tw + sw_)
    elif lt == "esdf":
        te = ch["esdf"].at[safe_t].get(mode="fill", fill_value=0.0)
        tf = ch["esdf_flags"].at[safe_t].get(mode="fill", fill_value=0)
        se = source.channels["esdf"]
        sf = source.channels["esdf_flags"]
        t_obs = (tf & vlayer.ESDF_OBSERVED) != 0
        s_obs = (sf & vlayer.ESDF_OBSERVED) != 0
        new_e = jnp.where(
            t_obs & s_obs, (te + se) / 2.0, jnp.where(s_obs, se, te)
        )
        ch["esdf"] = scatter_rows(ch["esdf"], safe_t, new_e)
        ch["esdf_flags"] = scatter_rows(ch["esdf_flags"], safe_t, tf | sf)
    elif lt == "occupancy":
        tl = ch["log_odds"].at[safe_t].get(mode="fill", fill_value=0.0)
        to = ch["occ_observed"].at[safe_t].get(mode="fill", fill_value=0)
        ch["log_odds"] = scatter_rows(
            ch["log_odds"], safe_t, tl + source.channels["log_odds"]
        )
        ch["occ_observed"] = scatter_rows(
            ch["occ_observed"], safe_t, to | source.channels["occ_observed"]
        )
    elif lt == "intensity":
        tw = ch["intensity_weight"].at[safe_t].get(mode="fill", fill_value=0.0)
        sw_ = source.channels["intensity_weight"]
        tot = jnp.maximum(tw + sw_, 1e-12)
        new_i = (
            ch["intensity"].at[safe_t].get(mode="fill", fill_value=0.0) * tw
            + source.channels["intensity"] * sw_
        ) / tot
        ch["intensity"] = scatter_rows(ch["intensity"], safe_t, new_i)
        ch["intensity_weight"] = scatter_rows(
            ch["intensity_weight"], safe_t, tw + sw_
        )
    else:
        raise ValueError(lt)

    return dataclasses.replace(target, channels=ch), overflow


def transform_layer(
    source: vlayer.VoxelLayer,
    T_out_in,
    out_voxel_size: float | None = None,
    out_vps: int | None = None,
    max_blocks: int | None = None,
):
    """Rigid-transform (and optionally resample) a layer.

    Returns a NEW layer with ``layer_out(x) = layer_in(T_out_in^-1 x)``
    via inverse-warp trilinear interpolation (merge_integration.h:145-220).
    Only TSDF layers carry full channel semantics; other types warp their
    primary channel + observedness.
    """
    R, t = T_out_in
    out_voxel_size = out_voxel_size or source.voxel_size
    out_vps = out_vps or source.vps
    max_blocks = max_blocks or source.max_blocks
    out = vlayer.make_layer(
        source.layer_type, out_voxel_size, vps=out_vps, max_blocks=max_blocks
    )

    # Conservative target block cover: transform the 8 corners of every
    # active source block, dilate by one target block.
    src_active = np.asarray(source.active_mask())
    rows = np.nonzero(src_active)[0]
    if len(rows) == 0:
        return out, jnp.asarray(False)
    bijk = np.asarray(source.block_ijk)[rows]
    corners = np.stack(
        np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
    ).reshape(-1, 3)
    pts = (
        (bijk[:, None, :] + corners[None, :, :]) * source.block_size
    ).reshape(-1, 3)
    Rn, tn = np.asarray(R), np.asarray(t)
    tpts = pts @ Rn.T + tn
    out_block_size = out_voxel_size * out_vps
    lo = np.floor(tpts.min(0) / out_block_size).astype(np.int64) - 1
    hi = np.floor(tpts.max(0) / out_block_size).astype(np.int64) + 1
    # Enumerate candidate blocks in the cover's bounding box but only keep
    # those whose center maps back near an active source block.
    bx = np.arange(lo[0], hi[0] + 1)
    by = np.arange(lo[1], hi[1] + 1)
    bz = np.arange(lo[2], hi[2] + 1)
    cand = np.stack(np.meshgrid(bx, by, bz, indexing="ij"), -1).reshape(-1, 3)
    centers = (cand + 0.5) * out_block_size
    back = (centers - tn) @ Rn
    src_block = np.floor(back / source.block_size).astype(np.int32)
    # Keep candidates whose back-projected center block (or a neighbor)
    # exists in the source.
    keep = np.zeros(len(cand), bool)
    srcset = {tuple(b) for b in bijk}
    for i, b in enumerate(src_block):
        for d in corners * 2 - 1:  # 8 diagonal probes
            if tuple(b) in srcset or tuple(b + d) in srcset:
                keep[i] = True
                break
    cand = cand[keep]
    if len(cand) == 0:
        return out, jnp.asarray(False)

    out, overflow = vlayer.allocate_blocks(
        out, jnp.asarray(cand, jnp.int32), jnp.ones(len(cand), bool)
    )

    # Inverse-warp every voxel of the allocated blocks.
    slots = np.asarray(vlayer.lookup_blocks(out, jnp.asarray(cand, jnp.int32)))
    lin = jnp.arange(out_vps**3)
    local = grid.linear_to_local(lin, out_vps)

    R_inv = jnp.asarray(Rn.T, jnp.float32)
    t_j = jnp.asarray(tn, jnp.float32)

    @jax.jit
    def warp_block(block_ijk):
        gvi = block_ijk[None, :] * out_vps + local
        centers = grid.grid_index_to_center_point(gvi, out_voxel_size)
        src_pts = (centers - t_j) @ R_inv.T
        if source.layer_type == "tsdf":
            d, ok = interp.interpolate(source, src_pts)
            w, _ = interp.interpolate(source, src_pts, channel="weight")
            c, cok = interp.interpolate_trilinear_color(source, src_pts)
            return d, jnp.where(ok, w, 0.0), c
        ch = {"esdf": "esdf", "occupancy": "log_odds",
              "intensity": "intensity"}[source.layer_type]
        d, ok = interp.interpolate(source, src_pts, channel=ch)
        return d, ok.astype(jnp.float32), jnp.zeros(centers.shape)

    d, w, c = jax.vmap(warp_block)(jnp.asarray(cand, jnp.int32))
    vpb = out_vps**3
    ch = dict(out.channels)
    sl = jnp.asarray(slots)
    if source.layer_type == "tsdf":
        ch["tsdf"] = ch["tsdf"].reshape(-1, vpb).at[sl].set(d).reshape(
            ch["tsdf"].shape
        )
        ch["weight"] = ch["weight"].reshape(-1, vpb).at[sl].set(w).reshape(
            ch["weight"].shape
        )
        ch["color"] = ch["color"].reshape(-1, vpb, 3).at[sl].set(c).reshape(
            ch["color"].shape
        )
    elif source.layer_type == "esdf":
        ch["esdf"] = ch["esdf"].reshape(-1, vpb).at[sl].set(d).reshape(
            ch["esdf"].shape
        )
        flags = (w > 0.5).astype(jnp.uint8) * vlayer.ESDF_OBSERVED
        ch["esdf_flags"] = ch["esdf_flags"].reshape(-1, vpb).at[sl].set(
            flags
        ).reshape(ch["esdf_flags"].shape)
    elif source.layer_type == "occupancy":
        ch["log_odds"] = ch["log_odds"].reshape(-1, vpb).at[sl].set(d).reshape(
            ch["log_odds"].shape
        )
        ch["occ_observed"] = ch["occ_observed"].reshape(-1, vpb).at[sl].set(
            (w > 0.5).astype(jnp.uint8)
        ).reshape(ch["occ_observed"].shape)
    else:
        ch["intensity"] = ch["intensity"].reshape(-1, vpb).at[sl].set(
            d
        ).reshape(ch["intensity"].shape)
        ch["intensity_weight"] = ch["intensity_weight"].reshape(
            -1, vpb
        ).at[sl].set(w).reshape(ch["intensity_weight"].shape)
    return dataclasses.replace(out, channels=ch), overflow


def naive_transform_layer(
    source: vlayer.VoxelLayer,
    T_out_in,
    max_blocks: int | None = None,
):
    """Forward nearest-neighbor layer transform (naiveTransformLayer,
    merge_integration.h:94-138): every source voxel's VALUE is copied to
    the output voxel containing its forward-transformed center — one
    batched scatter instead of the inverse-warp resample. Much cheaper
    than ``transform_layer`` but degraded, exactly like the reference:
    rotations alias (a target voxel can receive several source voxels —
    an arbitrary one wins the scatter — while its neighbor receives none
    and stays unobserved). Same voxel size/vps as the source (the
    reference's NN copy has no resample semantics worth keeping).

    Returns (layer_out, overflow).
    """
    R, t = T_out_in
    max_blocks = max_blocks or source.max_blocks
    out = vlayer.make_layer(
        source.layer_type, source.voxel_size, vps=source.vps,
        max_blocks=max_blocks,
    )
    src_active = np.asarray(source.active_mask())
    rows = np.nonzero(src_active)[0]
    if len(rows) == 0:
        return out, jnp.asarray(False)
    rows_j = jnp.asarray(rows, jnp.int32)
    vps = source.vps
    vpb = source.voxels_per_block
    lin = jnp.arange(vpb)
    local = grid.linear_to_local(lin, vps)  # [vpb, 3]

    Rj = jnp.asarray(np.asarray(R), jnp.float32)
    tj = jnp.asarray(np.asarray(t), jnp.float32)

    # Forward-map every source voxel center -> output global voxel index.
    gvi_in = (source.block_ijk[rows_j][:, None, :] * vps
              + local[None, :, :])  # [B, vpb, 3]
    centers = grid.grid_index_to_center_point(gvi_in, source.voxel_size)
    world = centers @ Rj.T + tj
    gvi_out = jnp.floor(world / source.voxel_size).astype(jnp.int32)
    out_bijk = jnp.floor(
        gvi_out.astype(jnp.float32) / vps
    ).astype(jnp.int32)  # works for negatives (floor division)

    out, overflow = vlayer.allocate_blocks(
        out, out_bijk.reshape(-1, 3),
        jnp.ones(len(rows) * vpb, bool),
    )
    slots = vlayer.lookup_blocks(out, out_bijk.reshape(-1, 3))
    local_out = gvi_out.reshape(-1, 3) - out_bijk.reshape(-1, 3) * vps
    lin_out = (local_out[:, 2] * vps + local_out[:, 1]) * vps + local_out[:, 0]
    ok = slots >= 0
    flat = jnp.where(ok, slots * vpb + lin_out, out.max_blocks * vpb)

    ch = dict(out.channels)
    for name, arr in source.channels.items():
        extra = vlayer.channel_extra(source, name)
        src = arr[rows_j].reshape((len(rows) * vpb,) + extra)
        tgt = ch[name].reshape((out.max_blocks * vpb,) + extra)
        ch[name] = tgt.at[flat].set(src, mode="drop").reshape(
            ch[name].shape
        )
    return dataclasses.replace(out, channels=ch), overflow

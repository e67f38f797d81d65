"""ESDF propagation: parallel 26-neighbor relaxation sweeps.

TPU-native replacement for the reference's queue-driven wavefront
integrator (voxblox src/integrator/esdf_integrator.cc, the IROS'17 paper
algorithm). The reference pops voxels off a bucketed priority queue and
relaxes 26 neighbors per pop (processOpenSet, cc:371-496), with a raise
BFS over parent pointers for retracted surfaces (processRaiseSet,
cc:305-369). Queues serialize; on TPU we compute the same fixpoint with
data-parallel *sweeps*:

- **Seeding** (<- propagate pass, cc:124-302): every observed TSDF voxel is
  classified. Fixed band |d_tsdf| < min_distance_m copies the TSDF distance
  and is locked (cc:178-184); all others start at sign * default_distance_m.
- **Lower sweep**: masked Bellman-Ford over the 26-neighborhood with
  quasi-Euclidean edge lengths voxel_size * {1, sqrt2, sqrt3}
  (neighbor_tools.h distances), iterated to convergence. Positive and
  negative sides relax independently (min outside / max inside), with the
  reference's sign-flip rule (cc:458-496) applied per sweep.
- **Raise**: instead of parent-pointer BFS, voxels whose support
  disappeared are handled by *resetting every non-fixed voxel within the
  influence radius (max_distance_m) of changed blocks* to sign * default
  and re-lowering. Influence is bounded by max_distance_m, so this is
  exact w.r.t. the fixpoint (values farther than the reset radius cannot
  be affected by the change), at the cost of re-relaxing the region.

Cross-block neighbor access uses an 18^3 halo-padded copy of each block,
rebuilt from face/edge/corner neighbor slots between groups of
``inner_sweeps`` relaxations (SURVEY.md §7 "batch ESDF sweeps per halo
exchange").

The fixpoint of these sweeps equals the Dijkstra result for this metric
(all edge weights positive, relaxation monotone), so distances are
allclose to the reference's; update *order* differs, which only matters
below min_diff_m.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from ..core.config import EsdfIntegratorConfig

# 26-neighborhood offsets and quasi-euclidean lengths (voxel units),
# mirroring NeighborhoodLookupTables (utils/neighbor_tools.h:10-114).
_OFFSETS = np.array(
    [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ],
    np.int32,
)
_DISTANCES = np.linalg.norm(_OFFSETS.astype(np.float64), axis=1).astype(
    np.float32
)

OBS = vlayer.ESDF_OBSERVED
FIX = vlayer.ESDF_FIXED
HALL = vlayer.ESDF_HALLUCINATED


# ---------------------------------------------------------------------------
# Halo machinery
# ---------------------------------------------------------------------------


_OFFS27 = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
     for dz in (-1, 0, 1)],
    np.int32,
)  # [27,3], center at index 13


def neighbor_slot_table(layer: vlayer.VoxelLayer):
    """int32[max_blocks, 27] pool rows of each block's 3x3x3 neighborhood
    (slot -1 where absent). Recomputed per update; allocation is fixed
    during sweeps."""
    nbr_ijk = layer.block_ijk[:, None, :] + _OFFS27[None, :, :]
    slots = vlayer.lookup_blocks(layer, nbr_ijk)
    active = layer.active_mask()
    # Inactive rows get no neighbors; also mask out neighbors that are
    # inactive rows (tombstoned lookups already return -1).
    return jnp.where(active[:, None], slots, -1)


def probe_neighbor_rows(layer: vlayer.VoxelLayer, rows, row_ok):
    """int32[N, 27] pool slots of the SELECTED rows' 3x3x3 neighborhoods
    (27*N hash probes). The full-pool table costs 27*max_blocks probes —
    ~6 ms/update at mb=4096 for a few-hundred-block map, measured on the
    batch-ESDF xplane trace — so budgeted paths probe only their working
    set."""
    safe = jnp.where(row_ok, rows, 0)
    nbr_ijk = layer.block_ijk[safe][:, None, :] + _OFFS27[None, :, :]
    slots = vlayer.lookup_blocks(layer, nbr_ijk)
    return jnp.where(row_ok[:, None], slots, -1)


def build_padded(layer, values, nbr_slots, fill):
    """values: [max_blocks, V,V,V] cube view -> padded
    [max_blocks, V+2,V+2,V+2].

    The halo ring is gathered from the 26 neighbors through ``nbr_slots``;
    absent neighbors contribute ``fill``.
    """
    v = layer.vps
    mb = layer.max_blocks
    # Row mb is a dedicated fill block.
    ext = jnp.concatenate(
        [values, jnp.full((1, v, v, v), fill, values.dtype)], axis=0
    )
    safe = jnp.where(nbr_slots < 0, mb, nbr_slots)  # [mb, 27]
    padded = jnp.full((mb, v + 2, v + 2, v + 2), fill, values.dtype)
    padded = padded.at[:, 1:-1, 1:-1, 1:-1].set(values)

    def src_slice(o):
        # Neighbor at offset o contributes its face/edge/corner nearest us.
        return slice(v - 1, v) if o == -1 else (slice(0, 1) if o == 1 else slice(0, v))

    def dst_slice(o):
        return slice(0, 1) if o == -1 else (slice(v + 1, v + 2) if o == 1 else slice(1, v + 1))

    # Pool cubes are laid out [z, y, x] (see core/layer.py docstring): the
    # dx component of a neighbor offset maps to the LAST padded axis.
    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) == (0, 0, 0):
                    k += 1
                    continue
                rows = ext[safe[:, k]]
                padded = padded.at[
                    :, dst_slice(dz), dst_slice(dy), dst_slice(dx)
                ].set(rows[:, src_slice(dz), src_slice(dy), src_slice(dx)])
                k += 1
    return padded


# ---------------------------------------------------------------------------
# Seeding (propagate pass)
# ---------------------------------------------------------------------------


def _sync_blocks(esdf_layer, tsdf_layer, rows_mask):
    """Allocate in the ESDF layer every TSDF block selected by rows_mask
    (bool over tsdf pool rows)."""
    blocks = tsdf_layer.block_ijk
    esdf_layer, overflow = vlayer.allocate_blocks(esdf_layer, blocks, rows_mask)
    return esdf_layer, overflow


def _propagate_classify(t_d, t_w, e_d, e_f, row_mask, cfg,
                        crust: bool = False):
    """The propagate-pass voxel classification (cc:124-302), shared by
    the full-pool and compacted seeding paths. Rows (t/e arrays
    [N, vpb]) where ``row_mask`` is False are left untouched.

    ``crust`` (batch mode only, cc:155-163 add_occupied_crust): seed
    UNOBSERVED voxels of processed rows as hallucinated occupied
    (-default_distance_m, observed, not fixed) so the unknown-space
    boundary acts as a surface — the sweep's sign-flip rule caps the
    crust voxel at the interface step and negative distances propagate
    into the unknown region, exactly the reference's push-model effect.

    Returns (out_d, out_f, update, raised)."""
    observed_t = (t_w >= cfg.min_weight) & row_mask[:, None]
    tsdf_fixed = observed_t & (jnp.abs(t_d) < cfg.min_distance_m)
    sgn = jnp.where(t_d >= 0.0, 1.0, -1.0)  # signum with 0 -> +
    seed_d = jnp.where(tsdf_fixed, t_d, sgn * cfg.default_distance_m)

    was_obs = (e_f & OBS) != 0
    was_fixed = (e_f & FIX) != 0
    was_hall = (e_f & HALL) != 0

    new_voxel = observed_t & (~was_obs | was_hall)

    # Existing voxels: classify lower/raise/flip (cc:211-279).
    exist = observed_t & was_obs & ~was_hall
    either_fixed = tsdf_fixed | was_fixed
    # (1a) unfix -> raise with sign*default.
    unfix = exist & either_fixed & ~tsdf_fixed
    # lower/raise while fixed: adopt tsdf value when tsdf_fixed.
    lower = exist & either_fixed & tsdf_fixed & (
        ((e_d > 0.0) & (t_d + cfg.min_diff_m < e_d))
        | ((e_d <= 0.0) & (t_d - cfg.min_diff_m > e_d))
    )
    raise_ = exist & either_fixed & tsdf_fixed & (
        ((e_d > 0.0) & (t_d - cfg.min_diff_m > e_d))
        | ((e_d <= 0.0) & (t_d + cfg.min_diff_m < e_d))
    )
    # sign flip for non-fixed voxels (cc:255-275).
    flip = exist & ~either_fixed & (jnp.sign(t_d) != jnp.sign(e_d))

    update = new_voxel | unfix | lower | raise_ | flip
    out_d = jnp.where(update, seed_d, e_d)
    # A raise happened where the value moved away from the surface —
    # including a hallucinated (crust) voxel replaced by real data
    # (cc:178-181).
    raised = unfix | raise_ | (flip & (t_d >= e_d)) | (new_voxel & was_hall)

    new_flags = (
        OBS
        | jnp.where(tsdf_fixed, FIX, np.uint8(0)).astype(jnp.uint8)
    )
    out_f = jnp.where(
        observed_t,
        new_flags,  # observed voxels: flags fully re-derived from TSDF
        e_f,
    ).astype(jnp.uint8)
    if crust:
        crust_v = ~observed_t & row_mask[:, None]
        out_d = jnp.where(crust_v, -cfg.default_distance_m, out_d)
        out_f = jnp.where(
            crust_v, np.uint8(OBS | HALL), out_f
        ).astype(jnp.uint8)
        update = update | crust_v
    return out_d, out_f, update, raised


def seed_from_tsdf(
    esdf_layer: vlayer.VoxelLayer,
    tsdf_layer: vlayer.VoxelLayer,
    cfg: EsdfIntegratorConfig,
    tsdf_rows_mask,
    crust: bool = False,
):
    """Propagate-pass (cc:124-302) over the selected TSDF rows.

    Returns (esdf_layer, changed_rows bool[max_blocks_esdf]) where
    changed_rows flags ESDF rows whose fixed band moved (drives the
    raise-region reset).
    """
    v = esdf_layer.vps
    vpb = esdf_layer.voxels_per_block
    mbe = esdf_layer.max_blocks

    # Map esdf rows -> tsdf rows for the selected set.
    tsdf_slot_of_esdf = vlayer.lookup_blocks(tsdf_layer, esdf_layer.block_ijk)
    sel_t = tsdf_rows_mask.at[
        jnp.where(tsdf_slot_of_esdf >= 0, tsdf_slot_of_esdf, 0)
    ].get()
    sel = esdf_layer.active_mask() & (tsdf_slot_of_esdf >= 0) & sel_t
    safe_t = jnp.where(sel, tsdf_slot_of_esdf, 0)

    t_d = tsdf_layer.channels["tsdf"].reshape(-1, vpb)[safe_t]
    t_w = tsdf_layer.channels["weight"].reshape(-1, vpb)[safe_t]
    e_d = esdf_layer.channels["esdf"].reshape(mbe, vpb)
    e_f = esdf_layer.channels["esdf_flags"].reshape(mbe, vpb)

    out_d, out_f, update, raised = _propagate_classify(
        t_d, t_w, e_d, e_f, sel, cfg, crust=crust
    )

    changed = jnp.any(update | (jnp.abs(out_d - e_d) > cfg.min_diff_m), axis=1)
    raised_rows = jnp.any(raised, axis=1)

    ch = dict(esdf_layer.channels)
    ch["esdf"] = out_d.reshape(ch["esdf"].shape)
    ch["esdf_flags"] = out_f.reshape(ch["esdf_flags"].shape)
    # Seeded/reclassified voxels reset their parent (cc: parent.setZero()).
    par_shape = ch["parent"].shape
    par = ch["parent"].reshape(mbe, vpb, 3)
    ch["parent"] = jnp.where(
        update[..., None], np.int8(0), par
    ).reshape(par_shape)
    esdf_layer = dataclasses.replace(esdf_layer, channels=ch)
    return esdf_layer, changed, raised_rows


def _seed_compact(esdf_layer, tsdf_layer, cfg, tsdf_rows_mask, k: int,
                  crust: bool = False):
    """seed_from_tsdf restricted to a compacted working set of <= k rows.

    The propagate pass touches only rows whose TSDF counterpart is
    selected; full-pool seeding pays pool-extent passes over every
    channel (measured ~30 ms device at mb=16384 for a 357-block map).
    Returns (esdf_layer, changed_rows, raised_rows, overflow) — overflow
    means the selected set exceeded k (some rows unseeded; the public
    entry points retry with a doubled bucket, like the sweep's
    region_overflow).
    """
    vpb = esdf_layer.voxels_per_block
    mbe = esdf_layer.max_blocks

    tsdf_slot_of_esdf = vlayer.lookup_blocks(tsdf_layer, esdf_layer.block_ijk)
    sel_t = tsdf_rows_mask.at[
        jnp.where(tsdf_slot_of_esdf >= 0, tsdf_slot_of_esdf, 0)
    ].get()
    sel = esdf_layer.active_mask() & (tsdf_slot_of_esdf >= 0) & sel_t
    overflow = jnp.sum(sel) > k
    rows = jnp.nonzero(sel, size=k, fill_value=-1)[0]
    ok = rows >= 0
    safe = jnp.where(ok, rows, 0)
    safe_t = jnp.where(ok, tsdf_slot_of_esdf[safe], 0)

    t_d = tsdf_layer.channels["tsdf"].reshape(-1, vpb)[safe_t]
    t_w = tsdf_layer.channels["weight"].reshape(-1, vpb)[safe_t]
    e_d = esdf_layer.channels["esdf"].reshape(mbe, vpb)[safe]
    e_f = esdf_layer.channels["esdf_flags"].reshape(mbe, vpb)[safe]

    out_d, out_f, update, raised = _propagate_classify(
        t_d, t_w, e_d, e_f, ok, cfg, crust=crust
    )

    wr = jnp.where(ok, rows, mbe)
    ch = dict(esdf_layer.channels)
    ch["esdf"] = ch["esdf"].reshape(mbe, vpb).at[wr].set(
        out_d, mode="drop", unique_indices=True
    ).reshape(ch["esdf"].shape)
    ch["esdf_flags"] = ch["esdf_flags"].reshape(mbe, vpb).at[wr].set(
        out_f, mode="drop", unique_indices=True
    ).reshape(ch["esdf_flags"].shape)
    # Parent reset through the flat interleaved view + lane-repeat of the
    # update mask (a [k, vpb, 3] intermediate would tile 3 -> 128 lanes).
    pf = ch["parent"].reshape(mbe, vpb * 3)
    upd3 = jnp.repeat(update, 3, axis=1)
    out_p = jnp.where(upd3, np.int8(0), pf[safe])
    ch["parent"] = pf.at[wr].set(
        out_p, mode="drop", unique_indices=True
    ).reshape(ch["parent"].shape)

    changed_r = jnp.any(
        update | (jnp.abs(out_d - e_d) > cfg.min_diff_m), axis=1
    ) & ok
    raised_r = jnp.any(raised, axis=1) & ok
    changed_rows = jnp.zeros((mbe + 1,), bool).at[wr].set(
        changed_r, mode="drop"
    )[:-1]
    raised_rows = jnp.zeros((mbe + 1,), bool).at[wr].set(
        raised_r, mode="drop"
    )[:-1]
    esdf_layer = dataclasses.replace(esdf_layer, channels=ch)
    return esdf_layer, changed_rows, raised_rows, overflow


# ---------------------------------------------------------------------------
# Lower sweep
# ---------------------------------------------------------------------------


def _pack_parent(px, py, pz):
    """Parent offset vector (int, [-126, 126] per axis) -> packed int32."""
    return (
        ((px + 128) << 16) | ((py + 128) << 8) | (pz + 128)
    ).astype(jnp.int32)


def _unpack_parent(p):
    return (p >> 16) - 128, ((p >> 8) & 0xFF) - 128, (p & 0xFF) - 128


# Packed (0,0,0): (128<<16)|(128<<8)|128. Plain int — no device arrays at
# import time (the TPU tunnel hook makes import-time backend init hazardous).
_PARENT_ZERO = (128 << 16) | (128 << 8) | 128


def _relax_once(d_pad, obs_pad, src_pad, d, upd_mask, voxel_size, cfg,
                parent_pad=None, parent=None):
    """One 26-neighbor relaxation on padded arrays.

    d_pad/obs_pad/src_pad: [mb, V+2,V+2,V+2] distance/observed/source-ok.
    d: [mb,V,V,V] current center values; upd_mask: non-fixed & observed &
    in-region center voxels. Returns new center distances (and, in
    full-euclidean mode, updated packed parent vectors).

    Quasi-euclidean (default): the neighbor edge length voxel_size *
    {1, sqrt2, sqrt3}. Full-euclidean (cc:415-426 semantics): each voxel
    carries the offset vector to its seed; the candidate cost increment is
    voxel_size * (|parent + offset| - |parent|), which telescopes to the
    true euclidean distance from the seed.
    """
    v = d.shape[1]
    full_euclid = parent_pad is not None
    pos = d > 0.0
    best_pos = jnp.full_like(d, jnp.inf)
    best_neg = jnp.full_like(d, -jnp.inf)
    flip_len = jnp.full_like(d, jnp.inf)
    if full_euclid:
        best_pos_par = jnp.full(d.shape, _PARENT_ZERO, jnp.int32)
        best_neg_par = jnp.full(d.shape, _PARENT_ZERO, jnp.int32)

    for k in range(26):
        dx, dy, dz = (int(_OFFSETS[k, 0]), int(_OFFSETS[k, 1]),
                      int(_OFFSETS[k, 2]))
        step = np.float32(_DISTANCES[k]) * voxel_size
        # Cube layout is [z, y, x] — dz indexes the first spatial axis.
        sl = (
            slice(None),
            slice(1 + dz, 1 + dz + v),
            slice(1 + dy, 1 + dy + v),
            slice(1 + dx, 1 + dx + v),
        )
        nd = d_pad[sl]
        n_ok = obs_pad[sl] & src_pad[sl]
        n_pos = nd > 0.0
        if full_euclid:
            px, py, pz = _unpack_parent(parent_pad[sl])
            # The source voxel sits at center + OFFSET; walking back to the
            # center extends the source's seed vector by +OFFSET.
            cx = jnp.clip(px + dx, -126, 126)
            cy = jnp.clip(py + dy, -126, 126)
            cz = jnp.clip(pz + dz, -126, 126)
            norm_n = jnp.sqrt(
                (px * px + py * py + pz * pz).astype(jnp.float32)
            )
            norm_c = jnp.sqrt(
                (cx * cx + cy * cy + cz * cz).astype(jnp.float32)
            )
            inc = (norm_c - norm_n) * voxel_size
            inc = jnp.maximum(inc, 0.0)  # reference skips negative increments
            cand_par = _pack_parent(cx, cy, cz)
        else:
            inc = step
        cp = jnp.where(n_ok & n_pos, nd + inc, jnp.inf)
        cn = jnp.where(n_ok & ~n_pos, nd - inc, -jnp.inf)
        if full_euclid:
            take_p = cp < best_pos
            best_pos_par = jnp.where(take_p, cand_par, best_pos_par)
            best_pos = jnp.where(take_p, cp, best_pos)
            take_n = cn > best_neg
            best_neg_par = jnp.where(take_n, cand_par, best_neg_par)
            best_neg = jnp.where(take_n, cn, best_neg)
        else:
            best_pos = jnp.minimum(best_pos, cp)
            best_neg = jnp.maximum(best_neg, cn)
        # Sign-flip rule (cc:458-496): neighbor with opposite sign whose
        # projected value disagrees strongly caps |d| at the step length.
        diff_sign = n_pos != pos
        potential = nd - jnp.where(n_pos, step, -step)
        discrepant = jnp.abs(potential - d) > step
        flip_len = jnp.minimum(
            flip_len, jnp.where(n_ok & diff_sign & discrepant, step, jnp.inf)
        )

    cand = jnp.where(pos, jnp.minimum(d, best_pos), jnp.maximum(d, best_neg))
    # Apply flip cap where a discrepant opposite-sign neighbor exists.
    sgn = jnp.where(pos, 1.0, -1.0)
    cand = jnp.where(
        jnp.isfinite(flip_len) & (jnp.abs(cand) > flip_len),
        sgn * flip_len,
        cand,
    )
    improved = jnp.abs(cand - d) > cfg.min_diff_m
    take = upd_mask & improved
    d_out = jnp.where(take, cand, d)
    if full_euclid:
        new_par = jnp.where(pos, best_pos_par, best_neg_par)
        # Only adopt the neighbor's parent when its candidate won (not the
        # flip cap, which restarts at the interface: parent resets to 0).
        from_nbr = take & jnp.where(
            pos, cand == best_pos, cand == best_neg
        )
        flip_take = take & ~from_nbr
        parent_out = jnp.where(from_nbr, new_par, parent)
        parent_out = jnp.where(flip_take, _PARENT_ZERO, parent_out)
        return d_out, parent_out
    return d_out


def lower_sweep(
    esdf_layer: vlayer.VoxelLayer,
    cfg: EsdfIntegratorConfig,
    region_rows=None,
):
    """Relax to convergence (or cfg.max_outer_sweeps). region_rows:
    bool[max_blocks] rows allowed to change (None = all active rows).
    Returns (layer, outer_iters, region_overflow, unconverged) where
    ``unconverged`` flags rows still changing when the loop hit the
    outer cap (empty on a converged run).

    With ``cfg.max_active_blocks`` set, the sweep materializes only the
    region rows plus their 1-ring neighbor sources in a compact working
    set, so per-sweep cost scales with the active map, not the pool.
    ``region_overflow`` flags a working set larger than the budget (some
    rows were NOT swept — the public entry points retry with a bigger
    budget).
    """
    v = esdf_layer.vps
    mb = esdf_layer.max_blocks
    active = esdf_layer.active_mask()
    if region_rows is None:
        region_rows = active
    region_rows = region_rows & active

    k = cfg.max_active_blocks
    if k is None or k >= mb:
        nbr = neighbor_slot_table(esdf_layer)
        layer_out, iters, unconverged = _sweep_on(
            esdf_layer, esdf_layer.channels["esdf"],
            esdf_layer.channels["esdf_flags"], nbr, region_rows, cfg,
            write_back_rows=None,
            parent8=esdf_layer.channels["parent"],
        )
        return layer_out, iters, jnp.asarray(False), unconverged

    # Compact working set: region rows + their neighbor sources. Both
    # probe passes run on <= k rows (probe_neighbor_rows), never the
    # full pool. If the region alone exceeds k, the truncated probe may
    # under-build in_set, but sum(in_set) >= sum(region) > k flags
    # overflow regardless and the caller retries with a bigger budget.
    reg_rows = jnp.nonzero(region_rows, size=k, fill_value=-1)[0]
    reg_ok = reg_rows >= 0
    nbr_r = probe_neighbor_rows(esdf_layer, reg_rows, reg_ok)  # [k, 27]
    in_set = region_rows | jnp.zeros((mb + 1,), bool).at[
        jnp.where(nbr_r >= 0, nbr_r, mb)
    ].set(True, mode="drop")[:-1]
    in_set = in_set & active
    region_overflow = (jnp.sum(in_set) > k) | (jnp.sum(region_rows) > k)
    rows = jnp.nonzero(in_set, size=k, fill_value=-1)[0]
    r_ok = rows >= 0
    # Morton-order the working set: pool-slot order is hash-random, so
    # the kernel's 8-block tiles mix unrelated regions and the per-tile
    # activity gate never fires (any of 8 random blocks active keeps the
    # tile active). Sorted by interleaved block coordinates, a tile is a
    # ~2x2x2 spatial chunk whose blocks converge together. The compact
    # remap below handles any ordering; cost = one [k] sort per update.
    bijk_ws = esdf_layer.block_ijk[jnp.where(r_ok, rows, 0)]
    base = jnp.min(
        jnp.where(r_ok[:, None], bijk_ws, jnp.int32(1 << 20)), axis=0
    )
    code = _morton10(jnp.clip(bijk_ws - base, 0, 1023))
    rows = rows[jnp.argsort(
        jnp.where(r_ok, code, jnp.int32(0x7FFFFFFF))
    )]
    r_ok = rows >= 0
    safe = jnp.where(r_ok, rows, 0)
    inv = jnp.full((mb + 1,), -1, jnp.int32).at[
        jnp.where(r_ok, rows, mb)
    ].set(jnp.arange(k, dtype=jnp.int32), mode="drop")
    # Probe the compacted rows' neighborhoods, remapped to compact ids.
    nbr_k = probe_neighbor_rows(esdf_layer, rows, r_ok)  # [k, 27]
    nbr_c = inv[jnp.where(nbr_k >= 0, nbr_k, mb)]
    nbr_c = jnp.where(r_ok[:, None], nbr_c, -1)

    d_c = esdf_layer.channels["esdf"][safe]
    f_c = esdf_layer.channels["esdf_flags"][safe]
    f_c = jnp.where(r_ok[:, None], f_c, np.uint8(0))
    region_c = region_rows[safe] & r_ok

    out_layer, iters, unconverged = _sweep_on(
        esdf_layer, d_c, f_c, nbr_c, region_c, cfg,
        write_back_rows=(rows, r_ok),
        parent8=esdf_layer.channels["parent"][safe],
    )
    return out_layer, iters, region_overflow, unconverged


def _morton10(rel):
    """Interleave 3x10-bit non-negative coords [N, 3] -> int32 Morton
    codes (spatial sort keys for the sweep working set)."""

    def part1by2(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & 0x30000FF
        x = (x | (x << 8)) & 0x300F00F
        x = (x | (x << 4)) & 0x30C30C3
        x = (x | (x << 2)) & 0x9249249
        return x

    return (
        part1by2(rel[:, 0])
        | (part1by2(rel[:, 1]) << 1)
        | (part1by2(rel[:, 2]) << 2)
    )


def _sweep_on(esdf_layer, d, flags, nbr, region_rows, cfg,
              write_back_rows, parent8=None):
    """Core relaxation loop over FLAT arrays d/flags [N, vpb] with
    neighbor table nbr [N, 27] indexing the SAME arrays (-1 missing). If
    write_back_rows is (rows, ok), results scatter back into the layer.
    parent8: int8[N, vpb*3] interleaved seed-offset vectors
    (full-euclidean). Cube views are materialized only inside the sweep
    (gathered-subset reshapes; the stored channels stay flat).

    Returns (layer, iters, unconverged bool[max_blocks]): rows whose
    LAST outer iteration still changed a voxel > min_diff — empty when
    the loop converged, the still-active front when it exited at
    cfg.max_outer_sweeps (the incremental debt-carry consumes this)."""
    v = esdf_layer.vps
    n_rows = d.shape[0]
    obs = (flags & OBS) != 0
    fixed = (flags & FIX) != 0
    upd_mask = obs & ~fixed & region_rows[:, None]
    obs_f = obs.astype(jnp.float32)
    full_euclid = cfg.full_euclidean_distance

    view = dataclasses.replace(
        esdf_layer,
        channels={"esdf": d, "esdf_flags": flags,
                  "parent": esdf_layer.channels["parent"][:1]},
    )
    # _padded reads vps + takes the row count from the value array.

    if full_euclid:
        p8 = parent8.reshape(n_rows, -1, 3)
        p0 = _pack_parent(
            p8[..., 0].astype(jnp.int32),
            p8[..., 1].astype(jnp.int32),
            p8[..., 2].astype(jnp.int32),
        ).reshape(n_rows, v, v, v)
    else:
        p0 = jnp.zeros((1,), jnp.int32)  # placeholder carry

    def outer_cond(state):
        dd, pp, rc, it = state
        return jnp.any(rc) & (it < cfg.max_outer_sweeps)

    use_pallas = (
        cfg.use_pallas_kernel and not full_euclid
        and esdf_layer.vps == 16
    )
    if use_pallas:
        # Fully 2D pipeline: state stays in the kernel layout across
        # outer iterations (the per-call cube<->2D relayouts cost ~5 ms
        # per outer at 512 blocks), the distance halo is exchanged
        # directly in 2D (_halo_exchange_2d), and the INITIAL state is
        # assembled interior-only in 2D + one exchange — the padded-cube
        # route ([.., 18] minor dims tile-pad 18 -> 128, 7x HBM) cost
        # ~8 ms/scan of dynamic-update-slices on the online trace.
        import jax as _jax

        from .pallas import esdf_relax as _pk

        pallas_interpret = _jax.default_backend() != "tpu"
        u2 = _pk.interior_to_2d(upd_mask.astype(jnp.float32))
        bt = u2.shape[0] // 18
        nbr_pad = jnp.concatenate(
            [nbr, jnp.full((bt - n_rows, 27), -1, nbr.dtype)], axis=0
        ) if bt > n_rows else nbr
        o2 = _halo_exchange_2d(
            _pk.interior_to_2d(obs_f), nbr_pad, bt
        )
        d20 = _halo_exchange_2d(
            _pk.interior_to_2d(d), nbr_pad, bt
        )
        # Strided-jump soundness gates: observedness, fixedness and
        # voxel signs are static across sweeps, so the per-voxel
        # admissibility codes are computed once from the seeded state.
        codes = None
        if cfg.sweep_strides and any(k > 1 for k in cfg.sweep_strides):
            f2 = _halo_exchange_2d(
                _pk.interior_to_2d(fixed.astype(jnp.float32)),
                nbr_pad, bt,
            )
            codes = _stride_codes_2d(
                d20, o2, f2, nbr_pad, bt, cfg.sweep_strides,
            )

        def outer_cond2(state):
            d2, rc, it = state
            return jnp.any(rc) & (it < cfg.max_outer_sweeps)

        def outer_body2(state):
            d2, rc, it = state
            # Per-tile activity gate for the kernel: a block can change
            # this outer only if it or a 1-ring neighbor changed in the
            # previous one (state flows <= 1 block per halo exchange) —
            # converged tiles copy through inside the kernel, so sweep
            # cost follows the moving front, not the working set.
            act = rc | jnp.any(
                jnp.where(
                    nbr_pad >= 0,
                    rc[jnp.clip(nbr_pad, 0, bt - 1)], False,
                ),
                axis=1,
            )
            d2a = _pk.relax_2d(
                d2, o2, u2, cfg.inner_sweeps, esdf_layer.voxel_size,
                cfg.max_distance_m, cfg.min_diff_m,
                interpret=pallas_interpret, strides=cfg.sweep_strides,
                stride_codes=codes, active=act,
            )
            # Per-row last-outer change mask: the loop's own convergence
            # test AND the unconverged-front output, at no extra passes.
            rc = jnp.any(
                (jnp.abs(d2a - d2) > cfg.min_diff_m).reshape(bt, -1),
                axis=1,
            )
            d2b = _halo_exchange_2d(d2a, nbr_pad, bt)
            return d2b, rc, it + 1

        d2f, rcf, iters = jax.lax.while_loop(
            outer_cond2, outer_body2,
            (d20, jnp.ones((bt,), bool), jnp.int32(0)),
        )
        d_out = _pk.from_2d(d2f, n_rows)[:, 1:-1, 1:-1, 1:-1].reshape(
            n_rows, -1
        )
        unc_c = rcf[:n_rows]
        ch = dict(esdf_layer.channels)
        if write_back_rows is None:
            ch["esdf"] = d_out
            unconverged = unc_c
        else:
            rows, ok = write_back_rows
            wr = jnp.where(ok, rows, esdf_layer.max_blocks)
            ch["esdf"] = ch["esdf"].at[wr].set(
                d_out, mode="drop", unique_indices=True
            )
            unconverged = jnp.zeros(
                (esdf_layer.max_blocks + 1,), bool
            ).at[wr].set(unc_c & ok, mode="drop")[:-1]
        return (dataclasses.replace(esdf_layer, channels=ch), iters,
                unconverged)

    # XLA fallback path: the observed halo does not change across outer
    # iterations — build it once, outside the while loop (only the
    # distance halo must be re-exchanged per outer). This path works on
    # cube views (reshaped from the flat working set once, up front).
    obs_c = obs_f.reshape(n_rows, v, v, v)
    upd_mask = upd_mask.reshape(n_rows, v, v, v)
    d = d.reshape(n_rows, v, v, v)
    obs_pad = _padded(view, obs_c, nbr, jnp.float32(0.0)) > 0.5

    def outer_body(state):
        dd, pp, _, it = state
        d_pad = _padded(view, dd, nbr, jnp.float32(0.0))
        d0 = dd

        if full_euclid:
            p_pad = _padded(view, pp, nbr, jnp.int32(_PARENT_ZERO))

        def inner(i, carry):
            di, pi = carry
            dpi = d_pad.at[:, 1:-1, 1:-1, 1:-1].set(di)
            # Recompute source validity from the CURRENT values: a voxel
            # relaxed in sweep i must become a source in sweep i+1, else
            # fronts crossing the max-distance window advance only one
            # voxel per outer iteration (measured 38 vs 7 outers).
            src_pad = obs_pad & (jnp.abs(dpi) < cfg.max_distance_m)
            if full_euclid:
                ppi = p_pad.at[:, 1:-1, 1:-1, 1:-1].set(pi)
                di, pi = _relax_once(
                    dpi, obs_pad, src_pad, di, upd_mask,
                    esdf_layer.voxel_size, cfg,
                    parent_pad=ppi, parent=pi,
                )
            else:
                di = _relax_once(
                    dpi, obs_pad, src_pad, di, upd_mask,
                    esdf_layer.voxel_size, cfg,
                )
            return di, pi

        dd, pp = jax.lax.fori_loop(0, cfg.inner_sweeps, inner, (dd, pp))
        rc = jnp.any(
            jnp.abs(dd - d0) > cfg.min_diff_m, axis=(1, 2, 3)
        )
        return dd, pp, rc, it + 1

    d_out, p_out, rcf, iters = jax.lax.while_loop(
        outer_cond, outer_body,
        (d, p0, jnp.ones((n_rows,), bool), jnp.int32(0)),
    )
    d_out = d_out.reshape(n_rows, -1)
    ch = dict(esdf_layer.channels)
    if full_euclid:
        px, py, pz = _unpack_parent(p_out)
        par8 = jnp.stack([px, py, pz], -1).astype(jnp.int8).reshape(
            n_rows, -1
        )
    if write_back_rows is None:
        ch["esdf"] = d_out
        unconverged = rcf
        if full_euclid:
            ch["parent"] = par8
    else:
        rows, ok = write_back_rows
        wr = jnp.where(ok, rows, esdf_layer.max_blocks)
        ch["esdf"] = ch["esdf"].at[wr].set(
            d_out, mode="drop", unique_indices=True
        )
        unconverged = jnp.zeros(
            (esdf_layer.max_blocks + 1,), bool
        ).at[wr].set(rcf & ok, mode="drop")[:-1]
        if full_euclid:
            ch["parent"] = ch["parent"].at[wr].set(
                par8, mode="drop", unique_indices=True
            )
    return dataclasses.replace(esdf_layer, channels=ch), iters, unconverged


def _halo_exchange_2d(d2, nbr_pad, bt: int):
    """Refresh the 1-voxel halo ring directly in the kernel's 2D layout.

    d2: f32[bt*18, LANE_PAD] (rows = (block, z), lanes = y*18+x); the
    interior (x,y,z in [1,16]) is authoritative, ring cells are
    reassembled from each 26-neighbor's interior boundary layer through
    ``nbr_pad`` (int32[bt, 27] compact-row neighbor slots, -1 missing;
    offset k = ((dx+1)*3+(dy+1))*3+(dz+1)).

    Every ring cell has exactly one owner offset; in-plane (dz == 0)
    owners update via full-width masked selects (they live on 16/18 of
    the rows), the two z-ring rows via per-block row assembly + one
    scatter. Cells with a missing neighbor keep their old value — the
    static observed-halo mask already excludes them as sources.
    """
    P = 18
    lp = d2.shape[1]
    rows = bt * P
    ext2 = jnp.concatenate([d2, jnp.zeros((P, lp), d2.dtype)], axis=0)

    lane = np.arange(lp)
    lx = lane % P
    ly = lane // P

    def lane_mask(dx, dy):
        mx = (lx == 0) if dx == -1 else (
            (lx == P - 1) if dx == 1 else ((lx >= 1) & (lx <= P - 2)))
        my = (ly == 0) if dy == -1 else (
            (ly == P - 1) if dy == 1 else ((ly >= 1) & (ly <= P - 2)))
        return jnp.asarray((mx & my & (ly < P))[None, :])

    def koff(dx, dy, dz):
        return ((dx + 1) * 3 + (dy + 1)) * 3 + (dz + 1)

    z_of = jnp.arange(rows, dtype=jnp.int32) % P
    b_of = jnp.arange(rows, dtype=jnp.int32) // P
    z_interior = ((z_of >= 1) & (z_of <= P - 2))[:, None]

    # In-plane owners (dz == 0): faces and vertical edges.
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if (dx, dy) == (0, 0):
                continue
            nv = nbr_pad[:, koff(dx, dy, 0)]
            nvr = nv[b_of]
            srow = jnp.where(nvr >= 0, nvr, bt) * P + z_of
            g = ext2[srow]
            rolled = jnp.roll(g, 16 * (dx + P * dy), axis=1)
            m = lane_mask(dx, dy) & z_interior & (nvr >= 0)[:, None]
            d2 = jnp.where(m, rolled, d2)

    # z-ring rows (dz == +-1): per-block assembly + one row scatter.
    for dz in (-1, 1):
        dst_z = 0 if dz == -1 else P - 1
        src_z = P - 2 if dz == -1 else 1
        dst_rows = jnp.arange(bt, dtype=jnp.int32) * P + dst_z
        content = d2[dst_rows]
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                nv = nbr_pad[:, koff(dx, dy, dz)]
                srow = jnp.where(nv >= 0, nv, bt) * P + src_z
                g = ext2[srow]
                if (dx, dy) != (0, 0):
                    g = jnp.roll(g, 16 * (dx + P * dy), axis=1)
                m = lane_mask(dx, dy) & (nv >= 0)[:, None]
                content = jnp.where(m, g, content)
        d2 = d2.at[dst_rows].set(content, unique_indices=True)
    return d2


def _stride_codes_2d(d20, o2, f2, nbr_pad, bt: int, strides):
    """Per-voxel strided-jump admissibility codes for the Pallas sweep.

    Returns (code_pos, code_neg) in kernel 2D layout: a voxel's code
    reaches level i+1 iff the Chebyshev ball of radius
    ``stride_radii(strides)[i]`` around it is entirely traversable on
    that sign's side — observed, NOT fixed (a fixed intermediate may
    hold a value above its relaxation bound, breaking the chamfer-path
    induction; see _relax_kernel's soundness note) and sign-matching.
    Built by halo-synchronized Chebyshev erosion: one erode1_2d step
    (which zeroes the ring) followed by one 2D halo exchange (which
    refills it from neighbor interiors) per unit radius, so
    admissibility flows correctly across block borders; blocks with
    missing neighbors stay conservative (ring = 0). The pos/neg masks
    are stacked along the block axis so each step is ONE erode + ONE
    exchange. Observedness, fixedness and signs are static across
    sweeps (the stride-1 flip rule caps magnitudes, never flips a
    sign), so callers compute codes once per update from the seeded
    state."""
    from .pallas import esdf_relax as _pk

    trav = (o2 > 0.5) & ~(f2 > 0.5)
    m = jnp.concatenate(
        [(trav & (d20 > 0.0)).astype(jnp.float32),
         (trav & (d20 <= 0.0)).astype(jnp.float32)], axis=0
    )
    nbr2 = jnp.concatenate(
        [nbr_pad, jnp.where(nbr_pad >= 0, nbr_pad + bt, -1)], axis=0
    )
    interior2 = jnp.tile(_pk.interior_mask_2d(d20.shape[0]), (2, 1))
    code = jnp.zeros_like(m)
    done = 0
    for r in _pk.stride_radii(strides):
        for _ in range(r - done):
            m = _pk.erode1_2d(m, interior2)
            m = _halo_exchange_2d(m, nbr2, 2 * bt)
        done = r
        code = code + m
    rows = d20.shape[0]
    return code[:rows], code[rows:]


def stride_gate_stats(esdf_layer, cfg: EsdfIntegratorConfig):
    """Diagnostic: per-level admission counts of the strided-jump erosion
    gate — how many observed voxels (and blocks containing any) may take
    each stride-k jump of ``cfg.sweep_strides`` on the CURRENT field.

    Observedness, fixedness and voxel signs are static across sweeps
    (the stride-1 flip rule caps magnitudes, never flips a sign), so
    codes computed from the converged field equal the ones the sweep
    used at seed time. Full-pool build (no working-set compaction):
    this is bench/debug instrumentation, not a latency path.

    Returns a dict with ``radii`` (per-level Chebyshev radii),
    ``admitted_voxels``/``admitted_blocks`` (per level, host ints),
    ``observed_voxels`` and ``active_blocks``.
    """
    from .pallas import esdf_relax as _pk

    if esdf_layer.vps != 16:
        raise ValueError("stride gate requires vps=16 (Pallas layout)")
    radii = _pk.stride_radii(cfg.sweep_strides or ())
    active = esdf_layer.active_mask()
    v = esdf_layer.vps
    flags = jnp.where(
        active[:, None],
        esdf_layer.channels["esdf_flags"], np.uint8(0),
    ).reshape(esdf_layer.max_blocks, v, v, v)
    obs = (flags & OBS) != 0
    out = {
        "radii": tuple(radii),
        "active_blocks": int(jnp.sum(active)),
        "observed_voxels": int(jnp.sum(obs)),
        "admitted_voxels": [],
        "admitted_blocks": [],
    }
    if not radii:
        return out
    nbr = neighbor_slot_table(esdf_layer)
    fixed = (flags & FIX) != 0
    d = vlayer.cube(esdf_layer, "esdf")
    d20 = _pk.to_2d(_padded(esdf_layer, d, nbr, jnp.float32(0.0)))
    o2 = _pk.to_2d(
        _padded(esdf_layer, obs.astype(jnp.float32), nbr, jnp.float32(0.0))
    )
    f2 = _pk.to_2d(
        _padded(esdf_layer, fixed.astype(jnp.float32), nbr,
                jnp.float32(0.0))
    )
    bt = o2.shape[0] // 18
    mb = esdf_layer.max_blocks
    nbr_pad = (
        jnp.concatenate([nbr, jnp.full((bt - mb, 27), -1, nbr.dtype)], 0)
        if bt > mb else nbr
    )
    cp, cn = _stride_codes_2d(d20, o2, f2, nbr_pad, bt, cfg.sweep_strides)
    interior = _pk.interior_mask_2d(d20.shape[0]) > 0.5
    code = jnp.where(interior, jnp.maximum(cp, cn), 0.0)
    per_block = _pk.from_2d(code, mb)  # [mb, 18, 18, 18]
    vox, blk = [], []
    for lvl in range(1, len(radii) + 1):
        hit = per_block >= lvl
        vox.append(jnp.sum(hit))
        blk.append(jnp.sum(jnp.any(hit, axis=(1, 2, 3))))
    vals = jax.device_get((vox, blk))
    out["admitted_voxels"] = [int(x) for x in vals[0]]
    out["admitted_blocks"] = [int(x) for x in vals[1]]
    return out


def _padded(view_layer, values, nbr, fill):
    """build_padded variant that takes the row count from ``values`` (the
    compact working set) rather than the layer's pool size."""
    n = values.shape[0]
    v = view_layer.vps
    ext = jnp.concatenate(
        [values, jnp.full((1, v, v, v), fill, values.dtype)], axis=0
    )
    safe = jnp.where(nbr < 0, n, nbr)
    padded = jnp.full((n, v + 2, v + 2, v + 2), fill, values.dtype)
    padded = padded.at[:, 1:-1, 1:-1, 1:-1].set(values)

    def src_slice(o):
        return slice(v - 1, v) if o == -1 else (
            slice(0, 1) if o == 1 else slice(0, v))

    def dst_slice(o):
        return slice(0, 1) if o == -1 else (
            slice(v + 1, v + 2) if o == 1 else slice(1, v + 1))

    k = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                if (dx, dy, dz) == (0, 0, 0):
                    k += 1
                    continue
                rows = ext[safe[:, k]]
                padded = padded.at[
                    :, dst_slice(dz), dst_slice(dy), dst_slice(dx)
                ].set(rows[:, src_slice(dz), src_slice(dy), src_slice(dx)])
                k += 1
    return padded


# ---------------------------------------------------------------------------
# Region reset (the parallel "raise")
# ---------------------------------------------------------------------------


def _dilate_rows(layer, rows_mask, radius_blocks: int, nbr=None):
    """Dilate a block-row mask by N blocks.

    Iterated 1-ring scatter through the 27-neighbor slot table — the
    one-shot (2r+1)^3-offset hash dilation costs r^3/ (3*27) times more
    probes (a 343-offset lookup over the pool dominated the incremental
    update's overhead)."""
    if nbr is None:
        nbr = neighbor_slot_table(layer)
    mb = layer.max_blocks
    for _ in range(radius_blocks):
        idx = jnp.where(rows_mask[:, None] & (nbr >= 0), nbr, mb)
        rows_mask = (
            jnp.zeros((mb + 1,), bool).at[idx].set(True, mode="drop")[:-1]
            | rows_mask
        )
    return rows_mask & layer.active_mask()


def reset_region(esdf_layer, region_rows, cfg, keep_below=None):
    """Reset non-fixed voxels of the region to sign*default (raise).

    ``keep_below``: optional f32[max_blocks] per-row distance margin —
    voxels with |d| < keep_below[row] keep their value (their source
    seed provably lies outside the raised set; see _incremental_jit's
    Chebyshev-reach gate)."""
    flags = esdf_layer.channels["esdf_flags"]
    obs = (flags & OBS) != 0
    fixed = (flags & FIX) != 0
    d = esdf_layer.channels["esdf"]
    m = obs & ~fixed & region_rows[:, None]
    if keep_below is not None:
        m = m & (jnp.abs(d) >= keep_below[:, None])
    sgn = jnp.where(d >= 0.0, 1.0, -1.0)
    d = jnp.where(m, sgn * cfg.default_distance_m, d)
    ch = dict(esdf_layer.channels)
    ch["esdf"] = d
    return dataclasses.replace(esdf_layer, channels=ch)


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


# Last working-set bucket per (pool size, vps, cap): the device->host
# block-count readback that sizes the bucket costs a full round trip
# (~25-70 ms through a remote-TPU tunnel), so it runs once per pool
# config; afterwards the cached bucket is reused and only GROWS (on the
# entry points' overflow retries). An oversized bucket after a map
# shrink costs sweep time, never correctness.
_BUCKET_CACHE: dict = {}


def _bucket_for(n: int) -> int:
    """Smallest working-set bucket >= n from the {3*2^i, 2^i} ladder
    (64, 96, 128, 192, 256, 384, 512, ...). A pure power-of-2 ladder
    wastes up to ~100% sweep cost on padding rows (a 365-block map swept
    at 512); the 3/4-steps cap the waste at ~33% while keeping the
    growth-recompile count within 2x of pow2 (each distinct bucket is a
    new static config -> a remote recompile)."""
    b = 64
    while True:
        for c in (b, 3 * b // 2):
            if c >= n:
                return c
        b *= 2


def _bucketed_cfg(cfg: EsdfIntegratorConfig, esdf_layer, tsdf_layer):
    """Shrink cfg.max_active_blocks to a ladder bucket that covers the
    CURRENT map. The sweep cost scales with the working-set budget, so
    sweeping a 4096-row budget for a 400-block map wastes 90% of the
    kernel; overflow (the estimate can undershoot when the esdf/tsdf
    block sets are disjoint, or the cached bucket is stale) is detected
    by lower_sweep and retried with a grown bucket."""
    k = cfg.max_active_blocks
    if k is None or k >= esdf_layer.max_blocks:
        return cfg
    key = (esdf_layer.max_blocks, esdf_layer.vps, k)
    b = _BUCKET_CACHE.get(key)
    if b is None:
        n = max(int(esdf_layer.num_blocks), int(tsdf_layer.num_blocks))
        b = min(_bucket_for(n), k)
        _BUCKET_CACHE[key] = b
    if b >= k:
        return cfg
    return dataclasses.replace(cfg, max_active_blocks=b)


def _grow_cfg(cfg: EsdfIntegratorConfig, cap: EsdfIntegratorConfig,
              esdf_layer):
    k = min(cfg.max_active_blocks * 2,
            cap.max_active_blocks or cfg.max_active_blocks * 2)
    if k == cfg.max_active_blocks:
        return None
    key = (esdf_layer.max_blocks, esdf_layer.vps, cap.max_active_blocks)
    _BUCKET_CACHE[key] = max(_BUCKET_CACHE.get(key, 0), k)
    return dataclasses.replace(cfg, max_active_blocks=k)


def update_from_tsdf_batch(esdf_layer, tsdf_layer,
                           cfg: EsdfIntegratorConfig):
    """Batch update: drop + reseed from every TSDF block and sweep
    (updateFromTsdfLayerBatch, cc:94-102).

    Host-side wrapper: sizes the sweep working set to the live map and
    retries on working-set overflow. Returns (esdf_layer, overflow,
    iters)."""
    run_cfg = _bucketed_cfg(cfg, esdf_layer, tsdf_layer)
    while True:
        out, overflow, region_ovf, iters = _batch_jit(
            esdf_layer, tsdf_layer, run_cfg
        )
        if not bool(region_ovf):
            return out, overflow, iters
        grown = _grow_cfg(run_cfg, cfg, esdf_layer)
        if grown is None:
            return out, overflow | region_ovf, iters
        run_cfg = grown


@partial(jax.jit, static_argnames=("cfg",))
def _batch_jit(esdf_layer, tsdf_layer, cfg: EsdfIntegratorConfig):
    # Clear all esdf voxel state (keep allocation).
    ch = dict(esdf_layer.channels)
    ch["esdf"] = jnp.zeros_like(ch["esdf"])
    ch["esdf_flags"] = jnp.zeros_like(ch["esdf_flags"])
    ch["parent"] = jnp.zeros_like(ch["parent"])
    esdf_layer = dataclasses.replace(esdf_layer, channels=ch)

    rows_mask = tsdf_layer.active_mask()
    esdf_layer, overflow = _sync_blocks(esdf_layer, tsdf_layer, rows_mask)
    k = cfg.max_active_blocks
    crust = cfg.add_occupied_crust  # batch mode only (cc:155-163)
    if k is None or k >= esdf_layer.max_blocks:
        esdf_layer, _, _ = seed_from_tsdf(esdf_layer, tsdf_layer, cfg,
                                          rows_mask, crust=crust)
        seed_ovf = jnp.asarray(False)
    else:
        esdf_layer, _, _, seed_ovf = _seed_compact(
            esdf_layer, tsdf_layer, cfg, rows_mask, k, crust=crust
        )
    esdf_layer, iters, region_ovf, unconverged = lower_sweep(esdf_layer, cfg)
    # A batch rebuild converges (or re-derives) the whole field: refresh
    # the debt flags from ITS convergence state so stale debt from a
    # prior capped run never lingers.
    flags = jnp.where(
        unconverged,
        esdf_layer.block_flags | vlayer.SWEEP_DEBT,
        esdf_layer.block_flags & jnp.uint8(~vlayer.SWEEP_DEBT & 0xFF),
    ).astype(jnp.uint8)
    esdf_layer = dataclasses.replace(esdf_layer, block_flags=flags)
    return esdf_layer, overflow, region_ovf | seed_ovf, iters


def update_from_tsdf_batch_deferred(esdf_layer, tsdf_layer,
                                    cfg: EsdfIntegratorConfig):
    """update_from_tsdf_batch WITHOUT the synchronous overflow retry:
    returns (esdf_layer, overflow, region_ovf, iters) with both flags as
    DEVICE scalars. Callers that pipeline several updates (a bench, an
    offline rebuild loop) check the flags once at the end — the eager
    bool() in the retry wrapper is a full pipeline sync (~25-70 ms
    through a remote-TPU tunnel) per call. On region_ovf, recover like
    the deferred incremental path: grow_bucket_cache + a fresh batch
    run."""
    run_cfg = _bucketed_cfg(cfg, esdf_layer, tsdf_layer)
    return _batch_jit(esdf_layer, tsdf_layer, run_cfg)


def update_from_tsdf_incremental(
    esdf_layer, tsdf_layer, cfg: EsdfIntegratorConfig
):
    """Incremental update driven by the TSDF kEsdf dirty bits
    (updateFromTsdfLayer, cc:104-122). Clears those bits on the TSDF layer.

    Returns (esdf_layer, tsdf_layer, overflow, iters).
    """
    run_cfg = _bucketed_cfg(cfg, esdf_layer, tsdf_layer)
    while True:
        out_e, out_t, overflow, region_ovf, iters = _incremental_jit(
            esdf_layer, tsdf_layer, run_cfg
        )
        if not bool(region_ovf):
            return out_e, out_t, overflow, iters
        grown = _grow_cfg(run_cfg, cfg, esdf_layer)
        if grown is None:
            return out_e, out_t, overflow | region_ovf, iters
        run_cfg = grown


def update_from_tsdf_incremental_deferred(
    esdf_layer, tsdf_layer, cfg: EsdfIntegratorConfig
):
    """update_from_tsdf_incremental WITHOUT the synchronous overflow
    retry: returns (esdf_layer, tsdf_layer, overflow, region_ovf, iters)
    with ``region_ovf`` as a DEVICE scalar the caller checks later
    (every bool() readback is a full pipeline sync — ~25-70 ms through a
    remote-TPU tunnel, per scan). If region_ovf turns out true, some
    rows went unseeded/unswept and their dirty bits are already cleared:
    recover by growing the bucket (grow_bucket_cache) and running
    update_from_tsdf_batch, which rebuilds the exact field."""
    run_cfg = _bucketed_cfg(cfg, esdf_layer, tsdf_layer)
    return _incremental_jit(esdf_layer, tsdf_layer, run_cfg)


def presize_bucket(cfg: EsdfIntegratorConfig, esdf_layer, n_blocks: int):
    """Pre-size the cached sweep working-set bucket to cover ``n_blocks``
    active blocks. Call before a latency-critical window (an online loop,
    a timed bench) when the final map size is known: bucket GROWTH is a
    new static config -> a recompile (minutes through the remote-compile
    path) plus a full batch rebuild, which must not land mid-stream."""
    if (cfg.max_active_blocks is None
            or cfg.max_active_blocks >= esdf_layer.max_blocks):
        return
    key = (esdf_layer.max_blocks, esdf_layer.vps, cfg.max_active_blocks)
    b = min(_bucket_for(int(n_blocks)), cfg.max_active_blocks)
    _BUCKET_CACHE[key] = max(_BUCKET_CACHE.get(key, 0), b)


def grow_bucket_cache(cfg: EsdfIntegratorConfig, esdf_layer):
    """Double the cached sweep working-set bucket (deferred-overflow
    recovery path)."""
    if (cfg.max_active_blocks is None
            or cfg.max_active_blocks >= esdf_layer.max_blocks):
        # Unbudgeted sweeps materialize the whole pool: region overflow
        # cannot occur and there is no bucket to grow.
        return
    run_cfg = _bucketed_cfg(
        cfg, esdf_layer, esdf_layer
    )
    _grow_cfg(run_cfg, cfg, esdf_layer)


@partial(jax.jit, static_argnames=("cfg",))
def _incremental_jit(esdf_layer, tsdf_layer, cfg):
    # Dirty-bit scan inside the program (an eager dirty_mask call costs a
    # dispatch round trip per update through a remote-TPU path).
    dirty_rows = vlayer.dirty_mask(tsdf_layer, vlayer.DIRTY_ESDF)
    esdf_layer, overflow = _sync_blocks(esdf_layer, tsdf_layer, dirty_rows)
    k = cfg.max_active_blocks
    seed_ovf = jnp.asarray(False)
    if k is None or k >= esdf_layer.max_blocks:
        esdf_layer, changed_rows, raised_rows = seed_from_tsdf(
            esdf_layer, tsdf_layer, cfg, dirty_rows
        )
    else:
        esdf_layer, changed_rows, raised_rows, seed_ovf = _seed_compact(
            esdf_layer, tsdf_layer, cfg, dirty_rows, k
        )
    # Raise: reset the influence region of rows whose values moved away
    # from the surface, bounded by max_distance.
    radius = max(
        1, int(np.ceil(cfg.max_distance_m / esdf_layer.block_size))
    )
    mb = esdf_layer.max_blocks
    k = cfg.max_active_blocks
    dil_ovf = jnp.asarray(False)
    if k is None or k >= mb:
        nbr = neighbor_slot_table(esdf_layer)

        def dilate1(mask):
            return _dilate_rows(esdf_layer, mask, 1, nbr=nbr), False
    else:
        # Budgeted dilation: probe only the mask rows' neighborhoods
        # each step (<= 27*k hash probes vs the full 27*mb table —
        # ~4.6 ms/scan on the fused-step trace at mb=4096). A mask
        # beyond the budget flags region overflow, which the caller
        # recovers from with a bucket-grown batch rebuild — the sweep
        # itself could not have covered such a region either.
        active = esdf_layer.active_mask()

        def dilate1(mask):
            rows = jnp.nonzero(mask, size=k, fill_value=-1)[0]
            ok = rows >= 0
            ovf = jnp.sum(mask) > k
            nbr_r = probe_neighbor_rows(esdf_layer, rows, ok)
            out = mask | jnp.zeros((mb + 1,), bool).at[
                jnp.where(nbr_r >= 0, nbr_r, mb)
            ].set(True, mode="drop")[:-1]
            return out & active, ovf

    # Chebyshev block-graph arrival distance to the raised set (0 = a
    # raised row itself; radius+1 = outside the dilated region). Blocks
    # at graph distance c are >= (c-1)*block_size from every raised
    # block, so a voxel with |d| < (c-1)*block_size cannot have its
    # source seed inside the raised set and KEEPS its value — without
    # the gate, one raised block per scan reset a 3-block-radius region
    # wholesale and the online sweep re-converged the whole field every
    # scan (11 outers/scan on the orbit loop, xplane-traced).
    reach = jnp.where(raised_rows, 0, radius + 1)
    mask = raised_rows
    for it in range(1, radius + 1):
        mask, o = dilate1(mask)
        dil_ovf = dil_ovf | o
        reach = jnp.minimum(reach, jnp.where(mask, it, radius + 1))
    raise_region = mask
    margin = (
        jnp.maximum(reach - 1, 0).astype(jnp.float32)
        * esdf_layer.block_size
    )
    esdf_layer = reset_region(esdf_layer, raise_region, cfg,
                              keep_below=margin)
    # Sweep region: everything the seeds/resets can influence.
    sweep_region = changed_rows | raise_region
    for _ in range(radius):
        sweep_region, o = dilate1(sweep_region)
        dil_ovf = dil_ovf | o

    # Convergence-debt carry (cfg.max_outer_sweeps_incremental): rows a
    # previous capped sweep left still-changing re-enter the region
    # (+1 block so a front crossing their border may advance), the
    # sweep runs at most the capped outer count, and rows still active
    # at the cap carry the SWEEP_DEBT flag forward. The fixpoint is
    # monotone, so the amortized field converges across scans; a final
    # uncapped update settles it exactly.
    cap = cfg.max_outer_sweeps_incremental
    debt = (esdf_layer.block_flags & vlayer.SWEEP_DEBT) != 0
    debt1, o = dilate1(debt)
    dil_ovf = dil_ovf | o
    sweep_region = sweep_region | debt1
    if cap is not None:
        run_cfg = dataclasses.replace(
            cfg, max_outer_sweeps=min(cap, cfg.max_outer_sweeps)
        )
    else:
        run_cfg = cfg
    esdf_layer, iters, region_ovf, unconverged = lower_sweep(
        esdf_layer, run_cfg, sweep_region
    )
    flags = jnp.where(
        unconverged,
        esdf_layer.block_flags | vlayer.SWEEP_DEBT,
        esdf_layer.block_flags & jnp.uint8(~vlayer.SWEEP_DEBT & 0xFF),
    ).astype(jnp.uint8)
    esdf_layer = dataclasses.replace(esdf_layer, block_flags=flags)
    tsdf_layer = vlayer.clear_dirty(tsdf_layer, vlayer.DIRTY_ESDF)
    return (esdf_layer, tsdf_layer, overflow,
            region_ovf | seed_ovf | dil_ovf, iters)

"""Voxel layers: a shape-stable block pool + spatial hash, as a jit pytree.

This is the TPU-native replacement for the reference's
``Layer<VoxelType>`` / ``Block<VoxelType>`` pointer graph
(voxblox core/layer.h:23-296, core/block.h:22-215):

- A layer owns a preallocated *pool* of ``max_blocks`` dense vps^3 blocks per
  channel, stored FLAT: ``channels[name]: f32[max_blocks, vps^3 * k]``
  (k = prod of the channel's extra dims, e.g. 3 for color — interleaved
  per voxel in row-major cube order). Flat storage is a TPU layout
  decision: a [mb, 4096] array tiles its minor dim exactly, so pool-row
  gathers/scatters are contiguous and never trigger the block-minor
  relayout copies cube-shaped [mb, 16, 16, 16] channels force on every
  consuming program (XLA stores those block-minor to dodge the 16 -> 128
  lane pad; see docs/PLAN_FLAT_CHANNELS.md for the measured costs).
  Consumers that need the cube view reshape INSIDE their programs via
  ``cube(layer, name)`` — one-way reshapes of gathered row subsets are
  small, and reshape -> op -> reshape-back round trips are elided by XLA.
  AXIS CONVENTION for the cube view: the three cube axes are **[z, y, x]**
  — x is the fastest-varying (last) axis, matching the reference's
  x-fastest linear voxel order (block_inl.h:13-31) under C-order reshape.
- A device hash table maps block index -> pool row (core/hash.py).
- Block metadata lives in flat arrays indexed by pool row: the block index
  (reverse map), an active mask, and the reference's per-block dirty bits
  {map, mesh, esdf} (core/block.h:15-18) as a uint8 bitmask.
- All mutation is functional: ``layer' = f(layer, ...)`` under jit.

Allocation is two-phase (SURVEY.md §7 pillar 1): a *discover* pass dedupes
candidate block indices into a pending buffer, then a parallel hash insert
claims pool rows. No mutexes, no temp-block maps (cf. the reference's
mutex-guarded ``temp_block_map_``, tsdf_integrator.cc:91-147).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import grid
from . import hash as vhash

# Per-block dirty bits, mirroring the reference's Update::Status enum
# (core/block.h:15-18).
DIRTY_MAP = np.uint8(1)
DIRTY_MESH = np.uint8(2)
DIRTY_ESDF = np.uint8(4)
DIRTY_ALL = np.uint8(7)
# Mesh rows re-marched since the last wire publish — the reference keeps
# this as Mesh::updated, consumed by generateVoxbloxMeshMsg
# (voxblox_ros/mesh_vis.h:161 getAllUpdatedMeshes). Not part of
# DIRTY_ALL: integrators never set it; ops/mesh sets it, io/mesh_msg
# clears it.
DIRTY_PUB = np.uint8(8)
# ESDF rows still changing when a capped incremental sweep hit its
# outer-iteration budget (cfg.max_outer_sweeps_incremental): they
# re-enter the next update's sweep region so convergence debt amortizes
# across scans. Lives on the ESDF layer's block_flags; ops/esdf sets and
# clears it.
SWEEP_DEBT = np.uint8(16)

# Channel schemas per layer type. Extra trailing dims after the voxel cube.
# Mirrors the reference voxel structs (core/voxel.h:12-47) in SoA form.
LAYER_CHANNELS: Dict[str, Dict[str, tuple]] = {
    # TsdfVoxel{distance, weight, color} -> SoA channels.
    "tsdf": {"tsdf": (), "weight": (), "color": (3,)},
    # EsdfVoxel{distance, flags, parent}; flags bits below.
    "esdf": {"esdf": (), "esdf_flags": (), "parent": (3,)},
    # OccupancyVoxel{probability_log, observed}.
    "occupancy": {"log_odds": (), "occ_observed": ()},
    # IntensityVoxel{intensity, weight}.
    "intensity": {"intensity": (), "intensity_weight": ()},
}

CHANNEL_DTYPES = {
    "esdf_flags": jnp.uint8,
    "occ_observed": jnp.uint8,
    "parent": jnp.int8,
}

# ESDF per-voxel flag bits (cf. EsdfVoxel bools, core/voxel.h:27-37).
ESDF_OBSERVED = np.uint8(1)
ESDF_FIXED = np.uint8(2)
ESDF_HALLUCINATED = np.uint8(4)
ESDF_IN_QUEUE = np.uint8(8)  # kept for wire compat; unused by the sweeps


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["table", "block_ijk", "block_flags", "num_blocks", "channels"],
    meta_fields=["voxel_size", "vps", "layer_type"],
)
@dataclasses.dataclass
class VoxelLayer:
    table: vhash.HashTable
    block_ijk: jax.Array  # int32[max_blocks, 3] reverse map (slot -> index)
    block_flags: jax.Array  # uint8[max_blocks]; bit 7 = active, bits 0-2 dirty
    num_blocks: jax.Array  # int32[] high-water row count
    channels: Dict[str, jax.Array]
    voxel_size: float
    vps: int
    layer_type: str

    # -- static helpers ---------------------------------------------------
    @property
    def max_blocks(self) -> int:
        return self.block_flags.shape[0]

    @property
    def voxels_per_block(self) -> int:
        return self.vps**3

    @property
    def block_size(self) -> float:
        return self.voxel_size * self.vps

    @property
    def voxel_size_inv(self) -> float:
        return 1.0 / self.voxel_size

    def active_mask(self):
        return (self.block_flags & ACTIVE) != 0

    def memory_bytes(self) -> int:
        return sum(int(np.prod(c.shape)) * c.dtype.itemsize
                   for c in self.channels.values())


ACTIVE = np.uint8(128)


def make_layer(
    layer_type: str,
    voxel_size: float,
    vps: int = 16,
    max_blocks: int = 4096,
    table_capacity: int | None = None,
    extra_channels: Dict[str, tuple] | None = None,
) -> VoxelLayer:
    """Create an empty layer with a preallocated pool."""
    assert vps & (vps - 1) == 0, "vps must be a power of two"
    if table_capacity is None:
        table_capacity = max(64, 4 * max_blocks)
        # round up to pow2
        table_capacity = 1 << (table_capacity - 1).bit_length()
    spec = dict(LAYER_CHANNELS[layer_type])
    if extra_channels:
        spec.update(extra_channels)
    channels = {}
    for name, extra in spec.items():
        dtype = CHANNEL_DTYPES.get(name, jnp.float32)
        k = int(np.prod(extra)) if extra else 1
        channels[name] = jnp.zeros((max_blocks, vps**3 * k), dtype)
    return VoxelLayer(
        table=vhash.make_table(table_capacity),
        block_ijk=jnp.zeros((max_blocks, 3), jnp.int32),
        block_flags=jnp.zeros((max_blocks,), jnp.uint8),
        num_blocks=jnp.zeros((), jnp.int32),
        channels=channels,
        voxel_size=float(voxel_size),
        vps=int(vps),
        layer_type=layer_type,
    )


# ---------------------------------------------------------------------------
# Channel views
# ---------------------------------------------------------------------------


def channel_extra(layer: VoxelLayer, name: str) -> tuple:
    """Trailing per-voxel dims of a channel: () for scalars, (3,) for
    color/parent. Inferred from the flat width (vps^3 * k)."""
    k = layer.channels[name].shape[1] // layer.voxels_per_block
    return () if k == 1 else (k,)


def cube(layer: VoxelLayer, name: str):
    """Cube view [max_blocks, v, v, v, *extra] of a flat channel. Use
    INSIDE a jitted program only (a stored cube materialization would
    reintroduce the block-minor relayouts flat storage removes)."""
    v = layer.vps
    return layer.channels[name].reshape(
        (layer.max_blocks, v, v, v) + channel_extra(layer, name)
    )


def cube_rows(layer: VoxelLayer, name: str, rows):
    """Cube view of the SELECTED pool rows: gather flat rows (contiguous),
    then reshape the small subset."""
    v = layer.vps
    sub = layer.channels[name][rows]
    return sub.reshape(sub.shape[:-1] + (v, v, v)
                       + channel_extra(layer, name))


# ---------------------------------------------------------------------------
# Lookup
# ---------------------------------------------------------------------------


def lookup_blocks(layer: VoxelLayer, block_ijk):
    """int32[...,3] block indices -> int32[...] pool rows (-1 if missing)."""
    w0, w1 = grid.pack_block_index(block_ijk)
    return vhash.lookup(layer.table, w0, w1)


def global_voxel_to_flat(layer: VoxelLayer, global_ijk):
    """Global voxel indices [...,3] -> (flat pool offsets [...], found mask).

    flat = slot * vps^3 + linear_local; offsets where the block is missing
    are set to an out-of-range value so ``.at[...].add(mode='drop')`` and
    take(..., fill) behave correctly.
    """
    block, local = grid.split_global(global_ijk, layer.vps)
    slot = lookup_blocks(layer, block)
    found = slot >= 0
    lin = grid.local_to_linear(local, layer.vps)
    flat = jnp.where(found, slot * layer.voxels_per_block + lin, -1)
    return flat, found


# ---------------------------------------------------------------------------
# Two-phase allocation
# ---------------------------------------------------------------------------


def allocate_blocks(layer: VoxelLayer, block_ijk, valid, pending_size: int = 8192):
    """Ensure blocks exist; returns (layer, overflowed: bool[]).

    ``block_ijk``: int32[N, 3] candidate block indices (duplicates fine).
    Two-phase: discovery dedupes missing candidates through a scatter
    "pending buffer" (arbitrary winner per cell), then a parallel hash
    insert claims pool rows. Distinct new blocks that collide in the pending
    buffer are picked up by further rounds of an internal while-loop, which
    runs until no valid candidate is missing (typically 1 round).
    """
    w0, w1 = grid.pack_block_index(block_ijk.reshape(-1, 3))
    valid = valid.reshape(-1)

    def missing_mask(table):
        return valid & (vhash.lookup(table, w0, w1) < 0)

    def cond(state):
        table, *_rest, rounds = state
        return jnp.any(missing_mask(table)) & (rounds < 8)

    def body(state):
        table, block_ijk_arr, flags, num_blocks, overflowed, rounds = state
        missing = missing_mask(table)
        ph = (vhash.hash_words(w0, w1) & jnp.uint32(pending_size - 1)).astype(
            jnp.int32
        )
        scatter_idx = jnp.where(missing, ph, pending_size)
        pend_w0 = jnp.zeros((pending_size,), jnp.int32).at[scatter_idx].set(
            w0, mode="drop"
        )
        pend_w1 = jnp.full((pending_size,), grid.EMPTY_W1, jnp.int32).at[
            scatter_idx
        ].set(w1, mode="drop")
        new_mask = pend_w1 >= 0

        table, slots, ok = vhash.insert(
            table, pend_w0, pend_w1, new_mask, base_slot=num_blocks
        )
        overflow_mask = ok & (slots >= layer.max_blocks)
        overflowed = overflowed | jnp.any(overflow_mask)

        write_rows = jnp.where(ok & ~overflow_mask, slots, layer.max_blocks)
        new_ijk = grid.unpack_block_index(pend_w0, pend_w1)
        block_ijk_arr = block_ijk_arr.at[write_rows].set(new_ijk, mode="drop")
        flags = flags.at[write_rows].set(ACTIVE | DIRTY_ALL, mode="drop")
        num_blocks = jnp.minimum(table.count, layer.max_blocks)
        return table, block_ijk_arr, flags, num_blocks, overflowed, rounds + 1

    state = (
        layer.table,
        layer.block_ijk,
        layer.block_flags,
        layer.num_blocks,
        jnp.zeros((), bool),
        jnp.int32(0),
    )
    table, block_ijk_arr, flags, num_blocks, overflowed, _ = jax.lax.while_loop(
        cond, body, state
    )
    return (
        dataclasses.replace(
            layer,
            table=table,
            block_ijk=block_ijk_arr,
            block_flags=flags,
            num_blocks=num_blocks,
        ),
        overflowed,
    )


def remove_blocks(layer: VoxelLayer, rows, valid):
    """Deactivate pool rows and tombstone their keys. Rows stay allocated
    (pool rows are not recycled until `compact`); voxel data is zeroed.
    """
    w0, w1 = grid.pack_block_index(layer.block_ijk[rows])
    table, _ = vhash.remove(layer.table, w0, w1, valid)
    write_rows = jnp.where(valid, rows, layer.max_blocks)
    flags = layer.block_flags.at[write_rows].set(np.uint8(0), mode="drop")
    channels = {
        name: c.at[write_rows].set(jnp.zeros_like(c[:1])[0], mode="drop")
        for name, c in layer.channels.items()
    }
    return dataclasses.replace(
        layer, table=table, block_flags=flags, channels=channels
    )


def remove_distant_blocks(layer: VoxelLayer, center, max_distance: float):
    """Deactivate blocks whose center is farther than max_distance from
    ``center`` (reference: Layer::removeDistantBlocks, core/layer.h:170-182).
    """
    centers = (layer.block_ijk.astype(jnp.float32) + 0.5) * layer.block_size
    dist = jnp.linalg.norm(centers - center[None, :], axis=-1)
    doomed = layer.active_mask() & (dist > max_distance)
    rows = jax.lax.broadcasted_iota(jnp.int32, (layer.max_blocks, 1), 0).reshape(-1)
    return remove_blocks(layer, rows, doomed)


# ---------------------------------------------------------------------------
# Dirty bits
# ---------------------------------------------------------------------------


def mark_dirty(layer: VoxelLayer, rows, valid, bits):
    write_rows = jnp.where(valid, rows, layer.max_blocks)
    cur = layer.block_flags.at[write_rows].get(mode="fill", fill_value=0)
    flags = layer.block_flags.at[write_rows].set(cur | bits, mode="drop")
    return dataclasses.replace(layer, block_flags=flags)


def clear_dirty(layer: VoxelLayer, bits, rows=None, valid=None):
    """Clear dirty bits on all blocks (or on a subset of rows)."""
    if rows is None:
        flags = layer.block_flags & jnp.uint8(~bits & 0xFF)
    else:
        write_rows = jnp.where(valid, rows, layer.max_blocks)
        cur = layer.block_flags.at[write_rows].get(mode="fill", fill_value=0)
        flags = layer.block_flags.at[write_rows].set(
            cur & jnp.uint8(~bits & 0xFF), mode="drop"
        )
    return dataclasses.replace(layer, block_flags=flags)


def dirty_mask(layer: VoxelLayer, bits):
    """bool[max_blocks]: active blocks with any of ``bits`` set
    (reference: Layer::getAllUpdatedBlocks, core/layer.h:194-203)."""
    return layer.active_mask() & ((layer.block_flags & bits) != 0)


# ---------------------------------------------------------------------------
# Voxel access helpers (query-side; used by tests and interpolation)
# ---------------------------------------------------------------------------


def get_voxels(layer: VoxelLayer, channel: str, global_ijk, fill=0.0):
    """Gather voxel values at global indices [...,3]; fill where missing."""
    flat, found = global_voxel_to_flat(layer, global_ijk)
    c = layer.channels[channel]
    extra = channel_extra(layer, channel)
    flatc = c.reshape((-1,) + extra)
    vals = flatc.at[flat].get(mode="fill", fill_value=fill)
    if extra:
        found = found[..., None]
    return jnp.where(found, vals, jnp.asarray(fill, c.dtype)), found


def set_voxels(layer: VoxelLayer, channel: str, global_ijk, values, valid=None):
    """Scatter-set voxel values at global indices (drops missing blocks)."""
    flat, found = global_voxel_to_flat(layer, global_ijk)
    if valid is not None:
        found = found & valid
    c = layer.channels[channel]
    extra = channel_extra(layer, channel)
    flatc = c.reshape((-1,) + extra)
    idx = jnp.where(found, flat, flatc.shape[0])
    flatc = flatc.at[idx].set(values, mode="drop")
    channels = dict(layer.channels)
    channels[channel] = flatc.reshape(c.shape)
    return dataclasses.replace(layer, channels=channels)

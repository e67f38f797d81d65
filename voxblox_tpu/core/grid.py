"""Grid index math — the L0 foundation.

Semantics mirror the reference library's coordinate conventions
(voxblox core/common.h:140-268) so that SDF values land in the same voxels:

- ``point_to_grid_index``: ``floor(p * grid_size_inv + kEpsilon)`` with
  kEpsilon = 1e-6 (common.h:153-171).
- global voxel index = block_index * vps + local_index (common.h:208-213).
- local index = (global + 2^31) & (vps - 1) for power-of-2 vps
  (common.h:233-243); block index = floor(global / vps) (common.h:215-228).

Everything here is pure jnp on int32/float32 and shape-polymorphic over leading
batch dims: ``ijk`` arrays are ``[..., 3]``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Coordinate epsilon, identical to the reference (common.h:141).
EPS = 1e-6
# Weight/denominator epsilon (common.h:142).
FLOAT_EPS = 1e-6


def point_to_grid_index(points, grid_size_inv):
    """float[...,3] -> int32[...,3] grid index (floor with epsilon)."""
    return jnp.floor(points * grid_size_inv + EPS).astype(jnp.int32)


def scaled_point_to_grid_index(scaled_points):
    """Pre-scaled (1 unit == 1 cell) float[...,3] -> int32[...,3]."""
    return jnp.floor(scaled_points + EPS).astype(jnp.int32)


def grid_index_to_center_point(ijk, grid_size):
    """int32[...,3] -> float[...,3] cell center (common.h:187-193)."""
    return (ijk.astype(jnp.float32) + 0.5) * grid_size


def grid_index_to_origin_point(ijk, grid_size):
    """int32[...,3] -> float[...,3] cell min-corner (common.h:195-201)."""
    return ijk.astype(jnp.float32) * grid_size


def global_from_block_and_local(block_ijk, local_ijk, vps: int):
    """(block, local) -> global voxel index (common.h:208-213)."""
    return block_ijk * vps + local_ijk


def block_from_global(global_ijk, vps: int):
    """global voxel index -> block index = floor-div by vps (common.h:215-228).

    vps must be a power of two; arithmetic shift implements floor division
    for negative values exactly.
    """
    shift = vps.bit_length() - 1
    return global_ijk >> shift


def local_from_global(global_ijk, vps: int):
    """global voxel index -> intra-block index, pow-2 mask (common.h:233-243)."""
    return global_ijk & (vps - 1)


def split_global(global_ijk, vps: int):
    """global -> (block, local)."""
    return block_from_global(global_ijk, vps), local_from_global(global_ijk, vps)


def local_to_linear(local_ijk, vps: int):
    """Intra-block [...,3] -> linear index, x fastest (block_inl.h:13-31)."""
    return (
        local_ijk[..., 0]
        + local_ijk[..., 1] * vps
        + local_ijk[..., 2] * vps * vps
    )


def linear_to_local(lin, vps: int):
    """Linear index -> intra-block [...,3]."""
    x = lin % vps
    y = (lin // vps) % vps
    z = lin // (vps * vps)
    return jnp.stack([x, y, z], axis=-1)


def signum(x):
    """Sign with sign(0) == 0 (common.h:258)."""
    return jnp.sign(x)


def log_odds_from_probability(p):
    """common.h:261-264."""
    return jnp.log(p / (1.0 - p))


def probability_from_log_odds(lo):
    """common.h:266-268."""
    return 1.0 - 1.0 / (1.0 + jnp.exp(lo))


# ---------------------------------------------------------------------------
# Block-index word packing.
#
# The device hash table stores block indices packed into two int32 words so
# key compare/scatter work on plain int lanes. Each axis must fit in 16 bits
# signed: blocks in [-32768, 32767] per axis, i.e. maps up to ~±32 km at 5 cm
# voxels / 16 vps. The packing is bijective on that range.
# ---------------------------------------------------------------------------

PACK_MIN = -(1 << 15)
PACK_MAX = (1 << 15) - 1
# For valid keys w1 = z + 2^15 is always >= 0, so any negative w1 can serve
# as a sentinel. EMPTY marks a never-used slot, TOMBSTONE a deleted one.
EMPTY_W1 = np.int32(-1)
TOMBSTONE_W1 = np.int32(-2)


def pack_block_index(block_ijk):
    """int32[...,3] -> (w0, w1) int32 words.

    w0 = (x & 0xffff) | (y + 2^15) << 16, w1 = z + 2^15 (always >= 0).
    Bijective for each axis in [-2^15, 2^15).
    """
    x = block_ijk[..., 0]
    y = block_ijk[..., 1]
    z = block_ijk[..., 2]
    w0 = (x & 0xFFFF) | ((y + (1 << 15)) << 16)
    w1 = z + (1 << 15)
    return w0.astype(jnp.int32), w1.astype(jnp.int32)


def unpack_block_index(w0, w1):
    """Inverse of pack_block_index -> int32[...,3]."""
    x = (w0 << 16) >> 16  # sign-extend low 16 bits
    y = ((w0 >> 16) & 0xFFFF) - (1 << 15)
    z = w1 - (1 << 15)
    return jnp.stack(
        [x.astype(jnp.int32), y.astype(jnp.int32), z.astype(jnp.int32)], axis=-1
    )

"""VoxelLayer: allocation, voxel get/set, dirty bits, removal.

Mirrors the intent of the reference's test_tsdf_map.cc / test_layer.cc
(block allocation, index round trips) on the pool representation."""

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import grid, layer as vlayer


def _mk(voxel_size=0.1, vps=8, max_blocks=128):
    return vlayer.make_layer("tsdf", voxel_size, vps=vps, max_blocks=max_blocks)


def test_allocate_and_lookup(rng):
    lyr = _mk()
    blocks = np.unique(rng.integers(-5, 5, size=(64, 3)).astype(np.int32), axis=0)
    lyr, overflow = vlayer.allocate_blocks(
        lyr, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    assert not bool(overflow)
    assert int(lyr.num_blocks) == len(blocks)
    slots = np.asarray(vlayer.lookup_blocks(lyr, jnp.asarray(blocks)))
    assert np.all(slots >= 0)
    assert len(np.unique(slots)) == len(blocks)
    # Reverse map agrees.
    np.testing.assert_array_equal(np.asarray(lyr.block_ijk)[slots], blocks)
    # All marked active + fully dirty.
    flags = np.asarray(lyr.block_flags)[slots]
    assert np.all(flags & vlayer.ACTIVE)
    assert np.all(flags & vlayer.DIRTY_ALL)


def test_allocate_idempotent(rng):
    lyr = _mk()
    blocks = jnp.asarray([[0, 0, 0], [1, 0, 0]], jnp.int32)
    lyr, _ = vlayer.allocate_blocks(lyr, blocks, jnp.ones(2, bool))
    n1 = int(lyr.num_blocks)
    lyr, _ = vlayer.allocate_blocks(lyr, blocks, jnp.ones(2, bool))
    assert int(lyr.num_blocks) == n1


def test_voxel_set_get_roundtrip(rng):
    lyr = _mk(vps=8, max_blocks=512)
    vps = lyr.vps
    # Global voxel indices spanning several blocks incl. negatives.
    g = rng.integers(-20, 20, size=(500, 3)).astype(np.int32)
    gj = jnp.asarray(g)
    blocks = grid.block_from_global(gj, vps)
    lyr, overflow = vlayer.allocate_blocks(lyr, blocks, jnp.ones(len(g), bool))
    assert not bool(overflow)
    # Unique voxels only (duplicate scatter would keep an arbitrary winner).
    gu = np.unique(g, axis=0)
    vals = rng.uniform(-1, 1, size=len(gu)).astype(np.float32)
    lyr = vlayer.set_voxels(lyr, "tsdf", jnp.asarray(gu), jnp.asarray(vals))
    got, found = vlayer.get_voxels(lyr, "tsdf", jnp.asarray(gu))
    assert bool(jnp.all(found))
    np.testing.assert_allclose(np.asarray(got), vals, rtol=1e-6)
    # Voxels in unallocated blocks report not-found and fill value.
    far = jnp.asarray([[1000, 0, 0]], jnp.int32)
    got, found = vlayer.get_voxels(lyr, "tsdf", far, fill=7.0)
    assert not bool(found[0])
    assert float(got[0]) == 7.0


def test_dirty_bits():
    lyr = _mk()
    blocks = jnp.asarray([[0, 0, 0], [1, 0, 0], [2, 0, 0]], jnp.int32)
    lyr, _ = vlayer.allocate_blocks(lyr, blocks, jnp.ones(3, bool))
    assert int(vlayer.dirty_mask(lyr, vlayer.DIRTY_MESH).sum()) == 3
    lyr = vlayer.clear_dirty(lyr, vlayer.DIRTY_MESH)
    assert int(vlayer.dirty_mask(lyr, vlayer.DIRTY_MESH).sum()) == 0
    # Other bits untouched.
    assert int(vlayer.dirty_mask(lyr, vlayer.DIRTY_ESDF).sum()) == 3
    rows = vlayer.lookup_blocks(lyr, blocks[:1])
    lyr = vlayer.mark_dirty(lyr, rows, jnp.ones(1, bool), vlayer.DIRTY_MESH)
    assert int(vlayer.dirty_mask(lyr, vlayer.DIRTY_MESH).sum()) == 1


def test_remove_distant_blocks():
    lyr = _mk(voxel_size=0.1, vps=8, max_blocks=64)  # block size 0.8m
    blocks = jnp.asarray([[0, 0, 0], [10, 0, 0]], jnp.int32)
    lyr, _ = vlayer.allocate_blocks(lyr, blocks, jnp.ones(2, bool))
    g0 = jnp.asarray([[1, 1, 1]], jnp.int32)
    lyr = vlayer.set_voxels(lyr, "tsdf", g0, jnp.asarray([3.0]))
    lyr = vlayer.remove_distant_blocks(lyr, jnp.asarray([0.0, 0.0, 0.0]), 4.0)
    slots = np.asarray(vlayer.lookup_blocks(lyr, blocks))
    assert slots[0] >= 0 and slots[1] == -1
    assert int(lyr.active_mask().sum()) == 1
    #

def test_allocation_under_jit():
    @jax.jit
    def step(lyr, blocks):
        return vlayer.allocate_blocks(lyr, blocks, jnp.ones(blocks.shape[0], bool))

    lyr = _mk()
    lyr, overflow = step(lyr, jnp.asarray([[0, 0, 0], [5, 5, 5]], jnp.int32))
    assert int(lyr.num_blocks) == 2

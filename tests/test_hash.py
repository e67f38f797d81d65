"""Device hash table: insert/lookup/remove correctness under jit."""

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import grid, hash as vhash


def _pack(ijk):
    return grid.pack_block_index(jnp.asarray(ijk, jnp.int32))


def test_insert_then_lookup(rng):
    table = vhash.make_table(1024)
    ijk = np.unique(rng.integers(-50, 50, size=(300, 3)).astype(np.int32), axis=0)
    n = len(ijk)
    w0, w1 = _pack(ijk)
    table, slots, ok = vhash.insert(table, w0, w1, jnp.ones(n, bool))
    assert bool(jnp.all(ok))
    slots = np.asarray(slots)
    # Dense deterministic slot ids 0..n-1 (assigned in (round, lane) order —
    # keys that lose a probe round get later ids).
    np.testing.assert_array_equal(np.sort(slots), np.arange(n))
    # Lookup finds all of them.
    got = np.asarray(vhash.lookup(table, w0, w1))
    np.testing.assert_array_equal(got, slots)
    # Missing keys return -1.
    miss = np.asarray([[1000, 1000, 1000], [-999, 3, 4]], np.int32)
    mw0, mw1 = _pack(miss)
    got = np.asarray(vhash.lookup(table, mw0, mw1))
    np.testing.assert_array_equal(got, [-1, -1])


def test_insert_existing_returns_same_slot(rng):
    table = vhash.make_table(512)
    ijk = np.unique(rng.integers(-20, 20, size=(100, 3)).astype(np.int32), axis=0)
    w0, w1 = _pack(ijk)
    n = len(ijk)
    table, slots1, _ = vhash.insert(table, w0, w1, jnp.ones(n, bool))
    table2, slots2, ok = vhash.insert(table, w0, w1, jnp.ones(n, bool))
    assert bool(jnp.all(ok))
    np.testing.assert_array_equal(np.asarray(slots1), np.asarray(slots2))
    assert int(table2.count) == int(table.count)  # no new rows


def test_high_load_factor(rng):
    # 70% load: all inserts must land within MAX_INSERT_ROUNDS probes.
    cap = 1024
    table = vhash.make_table(cap)
    ijk = np.unique(rng.integers(-60, 60, size=(3000, 3)).astype(np.int32), axis=0)[
        : int(cap * 0.7)
    ]
    w0, w1 = _pack(ijk)
    n = len(ijk)
    table, slots, ok = vhash.insert(table, w0, w1, jnp.ones(n, bool))
    assert bool(jnp.all(ok))
    got = np.asarray(vhash.lookup(table, w0, w1))
    np.testing.assert_array_equal(got, np.asarray(slots))


def test_remove_and_tombstone_probing(rng):
    table = vhash.make_table(256)
    ijk = np.unique(rng.integers(-10, 10, size=(200, 3)).astype(np.int32), axis=0)[:80]
    w0, w1 = _pack(ijk)
    n = len(ijk)
    table, slots, _ = vhash.insert(table, w0, w1, jnp.ones(n, bool))
    # Remove the first half.
    half = n // 2
    rm = jnp.arange(n) < half
    table, removed = vhash.remove(table, w0, w1, rm)
    assert int(removed) == half
    got = np.asarray(vhash.lookup(table, w0, w1))
    np.testing.assert_array_equal(got[:half], -1)
    # Survivors must still be findable even past tombstones.
    np.testing.assert_array_equal(got[half:], np.asarray(slots)[half:])


def test_insert_jits():
    @jax.jit
    def go(table, w0, w1, valid):
        return vhash.insert(table, w0, w1, valid)

    table = vhash.make_table(128)
    ijk = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    w0, w1 = _pack(ijk)
    table, slots, ok = go(table, w0, w1, jnp.ones(2, bool))
    np.testing.assert_array_equal(np.asarray(slots), [0, 1])

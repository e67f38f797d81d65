"""Device-resident open-addressing spatial hash table.

This replaces the reference's ``std::unordered_map<BlockIndex, Block::Ptr>``
(voxblox core/block_hash.h:33-78, core/layer.h:23-296) with a shape-stable,
fully vectorized structure suitable for jit:

- keys are block indices packed to two int32 words (core/grid.py),
- values are int32 rows ("slots") of the block pool,
- linear probing; lookups run in SIMD lockstep over millions of queries,
- insertion is a *parallel claim protocol*: each round, every pending key
  scatter-min's its rank onto its probe cell; winners write, losers advance
  one probe step — equivalent to linear-probing insertion but data-parallel
  (no per-key sequential loop, no atomics).

The table never rehashes under jit; capacity is static. ``max_psl`` (maximum
probe sequence length over all inserted keys) bounds the lookup loop.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import grid

# Maximum linear-probe displacement processed per `insert` call. Probe
# clusters stay well below this for load factors <= 0.5; layers default to
# capacity = 4x max_blocks (25% load).
MAX_INSERT_ROUNDS = 64


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["keys_w0", "keys_w1", "slot", "max_psl", "count"],
    meta_fields=[],
)
@dataclasses.dataclass
class HashTable:
    """Open-addressing table: packed block-index words -> pool slot."""

    keys_w0: jax.Array  # int32[capacity]
    keys_w1: jax.Array  # int32[capacity]; < 0 means empty/tombstone
    slot: jax.Array  # int32[capacity]
    max_psl: jax.Array  # int32[] upper bound on probe length
    count: jax.Array  # int32[] high-water slot counter (NOT live-key count;
    #   removals tombstone keys but never recycle slot ids — `rebuild`
    #   compacts)

    @property
    def capacity(self) -> int:
        return self.keys_w1.shape[0]


def make_table(capacity: int) -> HashTable:
    assert capacity & (capacity - 1) == 0, "capacity must be a power of two"
    return HashTable(
        keys_w0=jnp.zeros((capacity,), jnp.int32),
        keys_w1=jnp.full((capacity,), grid.EMPTY_W1, jnp.int32),
        slot=jnp.full((capacity,), -1, jnp.int32),
        max_psl=jnp.zeros((), jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def hash_words(w0, w1):
    """Murmur-style avalanche of the packed key words -> uint32.

    The reference hashes x + 17191*y + 17191^2*z then mods by bucket count
    (block_hash.h:20-31); with a power-of-2 mask that low-entropy form
    clusters badly, so we run a proper finalizer instead (same contract:
    deterministic index hash).
    """
    h = w0.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
    h = h ^ (w1.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


def lookup(table: HashTable, w0, w1):
    """Vectorized lookup. Returns int32 slots, -1 where missing.

    Runs lockstep linear probing; iterates until every lane resolved or
    probe length exceeds table.max_psl (so cost adapts to true load).
    """
    cap = table.capacity
    mask = jnp.uint32(cap - 1)
    h = hash_words(w0, w1)
    out = jnp.full(w0.shape, -1, jnp.int32)
    done = jnp.zeros(w0.shape, bool)

    def cond(state):
        p, _, done = state
        return jnp.logical_and(p <= table.max_psl, ~jnp.all(done))

    def body(state):
        p, out, done = state
        idx = ((h + p.astype(jnp.uint32)) & mask).astype(jnp.int32)
        k0 = table.keys_w0[idx]
        k1 = table.keys_w1[idx]
        hit = (k0 == w0) & (k1 == w1)
        empty = k1 == grid.EMPTY_W1  # never-used cell terminates the probe
        out = jnp.where(hit & ~done, table.slot[idx], out)
        done = done | hit | empty
        return p + 1, out, done

    _, out, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), out, done))
    return out


def insert(table: HashTable, w0, w1, valid, base_slot=None):
    """Parallel insert of up to K keys. Keys MUST be mutually unique.

    Args:
      w0, w1: int32[K] packed keys.
      valid: bool[K]; invalid lanes are ignored.
      base_slot: first pool row to assign; defaults to table.count.

    Returns:
      (table, slots int32[K], ok bool[K]). ``slots`` holds the assigned (or
      pre-existing) pool row per key; -1 where not inserted. Lanes that keep
      ``ok == False`` exceeded MAX_INSERT_ROUNDS probes; callers re-invoke
      (practically never happens below ~0.7 load factor).
    """
    cap = table.capacity
    mask = jnp.uint32(cap - 1)
    k = w0.shape[0]
    h = hash_words(w0, w1)
    rank = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0).reshape(k)
    if base_slot is None:
        base_slot = table.count

    def cond(state):
        # Early exit: each probe round costs ~0.2 ms of random
        # gathers/scatters on TPU, and at the <=25% design load factor
        # nearly all lanes resolve within 2-3 rounds — a fixed
        # MAX_INSERT_ROUNDS fori_loop was measured at 13 ms/scan on the
        # velodyne workload vs <1 ms with the exit condition.
        *_rest, rounds, pending = state
        return jnp.logical_and(rounds < MAX_INSERT_ROUNDS, jnp.any(pending))

    def body(state):
        (keys_w0, keys_w1, slot_arr, assigned, max_psl, disp, out, rounds,
         pending) = state
        idx = ((h + disp.astype(jnp.uint32)) & mask).astype(jnp.int32)
        k0 = keys_w0[idx]
        k1 = keys_w1[idx]
        equal = pending & (k0 == w0) & (k1 == w1)
        free = k1 < 0  # empty or tombstone is claimable
        attempt = pending & free & ~equal
        # Claim: lowest-rank contender wins each cell this round.
        claim_idx = jnp.where(attempt, idx, cap)
        claims = jnp.full((cap,), jnp.int32(0x7FFFFFFF), jnp.int32)
        claims = claims.at[claim_idx].min(rank, mode="drop")
        won = attempt & (claims[idx] == rank)
        # Deterministic slot assignment in lane order.
        new_ids = assigned + jnp.cumsum(won.astype(jnp.int32)) - 1
        write_idx = jnp.where(won, idx, cap)
        keys_w0 = keys_w0.at[write_idx].set(w0, mode="drop")
        keys_w1 = keys_w1.at[write_idx].set(w1, mode="drop")
        slot_arr = slot_arr.at[write_idx].set(new_ids, mode="drop")
        out = jnp.where(won, new_ids, out)
        out = jnp.where(equal, slot_arr[idx], out)
        finished = won | equal
        max_psl = jnp.maximum(max_psl, jnp.max(jnp.where(finished, disp, 0)))
        assigned = assigned + jnp.sum(won.astype(jnp.int32))
        pending = pending & ~finished
        disp = jnp.where(pending, disp + 1, disp)
        return (keys_w0, keys_w1, slot_arr, assigned, max_psl, disp, out,
                rounds + 1, pending)

    init = (
        table.keys_w0,
        table.keys_w1,
        table.slot,
        base_slot,
        table.max_psl,
        jnp.zeros((k,), jnp.int32),
        jnp.full((k,), -1, jnp.int32),
        jnp.int32(0),
        valid,
    )
    keys_w0, keys_w1, slot_arr, assigned, max_psl, _, out, _, pending = (
        jax.lax.while_loop(cond, body, init)
    )
    new_table = HashTable(
        keys_w0=keys_w0,
        keys_w1=keys_w1,
        slot=slot_arr,
        max_psl=max_psl,
        count=assigned,
    )
    return new_table, out, valid & ~pending


def remove(table: HashTable, w0, w1, valid):
    """Tombstone-delete keys (vectorized; keys must be unique).

    Linear probing requires tombstones rather than re-emptying cells
    (lookups must keep probing past deleted entries).
    """
    cap = table.capacity
    mask = jnp.uint32(cap - 1)
    h = hash_words(w0, w1)

    def cond(state):
        *_rest, p, pending = state
        return jnp.logical_and(p < MAX_INSERT_ROUNDS, jnp.any(pending))

    def body(state):
        keys_w1, slot_arr, removed, p, pending = state
        idx = ((h + p.astype(jnp.uint32)) & mask).astype(jnp.int32)
        k0 = table.keys_w0[idx]
        k1 = keys_w1[idx]
        hit = pending & (k0 == w0) & (k1 == w1)
        write_idx = jnp.where(hit, idx, cap)
        keys_w1 = keys_w1.at[write_idx].set(grid.TOMBSTONE_W1, mode="drop")
        slot_arr = slot_arr.at[write_idx].set(-1, mode="drop")
        removed = removed + jnp.sum(hit.astype(jnp.int32))
        empty = k1 == grid.EMPTY_W1
        pending = pending & ~hit & ~empty
        return keys_w1, slot_arr, removed, p + 1, pending

    keys_w1, slot_arr, removed, _, _ = jax.lax.while_loop(
        cond, body,
        (table.keys_w1, table.slot, jnp.int32(0), jnp.int32(0), valid),
    )
    return (
        dataclasses.replace(table, keys_w1=keys_w1, slot=slot_arr),
        removed,
    )


def rebuild(table: HashTable, block_w0, block_w1, active_mask) -> HashTable:
    """Re-insert all active (w0, w1) -> row-index pairs into a fresh table.

    Used after bulk removals to drop tombstones. ``block_w0/w1`` are indexed
    by pool slot; the slot value re-inserted for row i is i itself.
    """
    fresh = make_table(table.capacity)
    fresh, _, _ = insert(fresh, block_w0, block_w1, active_mask)
    # insert() assigned sequential ids; overwrite with identity slots instead.
    # Simpler: do a direct manual scatter via a second insert pass keyed on
    # the identity mapping. We re-run insertion storing explicit slots:
    cap = fresh.capacity
    n = block_w0.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n)
    # Find where each key landed and rewrite its slot value to its row id.
    idx = _locate(fresh, block_w0, block_w1, active_mask)
    write_idx = jnp.where(active_mask, idx, cap)
    slot_arr = fresh.slot.at[write_idx].set(rows, mode="drop")
    return dataclasses.replace(fresh, slot=slot_arr)


def _locate(table: HashTable, w0, w1, valid):
    """Return table cell index holding each key (must exist where valid)."""
    cap = table.capacity
    mask = jnp.uint32(cap - 1)
    h = hash_words(w0, w1)
    out = jnp.zeros(w0.shape, jnp.int32)
    done = ~valid

    def cond(state):
        p, _, done = state
        return jnp.logical_and(p < MAX_INSERT_ROUNDS, ~jnp.all(done))

    def body(state):
        p, out, done = state
        idx = ((h + p.astype(jnp.uint32)) & mask).astype(jnp.int32)
        hit = (table.keys_w0[idx] == w0) & (table.keys_w1[idx] == w1) & ~done
        out = jnp.where(hit, idx, out)
        done = done | hit
        return p + 1, out, done

    _, out, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), out, done))
    return out


# ---------------------------------------------------------------------------
# Numpy mirror (host-side oracle for tests).
# ---------------------------------------------------------------------------


def np_reference_lookup(keys_w0, keys_w1, slot, max_psl, qw0, qw1):
    cap = len(slot)
    out = np.full(qw0.shape, -1, np.int64)
    h = np.asarray(hash_words(jnp.asarray(qw0), jnp.asarray(qw1)))
    for i in range(qw0.size):
        hh = int(h.flat[i])
        for p in range(int(max_psl) + 1):
            idx = (hh + p) % cap
            if keys_w1[idx] == int(grid.EMPTY_W1):
                break
            if keys_w0[idx] == qw0.flat[i] and keys_w1[idx] == qw1.flat[i]:
                out.flat[i] = slot[idx]
                break
    return out

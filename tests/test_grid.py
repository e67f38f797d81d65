"""Grid index math vs. a literal numpy transcription of the reference
semantics (voxblox core/common.h:140-268) and round-trip properties."""

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import grid


def test_point_to_grid_index_matches_reference_floor(rng):
    pts = rng.uniform(-10, 10, size=(1000, 3)).astype(np.float32)
    inv = np.float32(1.0 / 0.1)
    ours = np.asarray(grid.point_to_grid_index(jnp.asarray(pts), inv))
    ref = np.floor(pts * inv + 1e-6).astype(np.int32)
    np.testing.assert_array_equal(ours, ref)


def test_boundary_epsilon_behavior():
    # A point exactly on a cell boundary lands in the upper cell thanks to
    # the epsilon (common.h:153-159); just below boundary stays lower.
    inv = np.float32(1.0 / 0.2)
    pts = jnp.asarray([[0.2, 0.0, 0.0], [0.19999, 0.0, 0.0], [-0.2, 0.0, 0.0]])
    idx = np.asarray(grid.point_to_grid_index(pts, inv))
    assert idx[0, 0] == 1
    assert idx[1, 0] == 0
    assert idx[2, 0] == -1


def test_global_block_local_roundtrip(rng):
    vps = 16
    g = rng.integers(-(2**20), 2**20, size=(2000, 3)).astype(np.int32)
    gj = jnp.asarray(g)
    block, local = grid.split_global(gj, vps)
    block, local = np.asarray(block), np.asarray(local)
    # Reference: block = floor(global / vps), local = (global + 2^31) & (vps-1)
    ref_block = np.floor(g / vps).astype(np.int32)
    ref_local = (g.astype(np.int64) + 2**31) % vps
    np.testing.assert_array_equal(block, ref_block)
    np.testing.assert_array_equal(local, ref_local)
    back = np.asarray(
        grid.global_from_block_and_local(jnp.asarray(block), jnp.asarray(local), vps)
    )
    np.testing.assert_array_equal(back, g)


def test_linear_local_roundtrip():
    vps = 8
    lin = jnp.arange(vps**3)
    local = grid.linear_to_local(lin, vps)
    back = grid.local_to_linear(local, vps)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(lin))


def test_center_origin_points():
    idx = jnp.asarray([[0, 1, -1]])
    np.testing.assert_allclose(
        np.asarray(grid.grid_index_to_center_point(idx, 0.5)),
        [[0.25, 0.75, -0.25]],
    )
    np.testing.assert_allclose(
        np.asarray(grid.grid_index_to_origin_point(idx, 0.5)),
        [[0.0, 0.5, -0.5]],
    )


def test_pack_unpack_roundtrip(rng):
    ijk = rng.integers(grid.PACK_MIN, grid.PACK_MAX + 1, size=(5000, 3)).astype(
        np.int32
    )
    w0, w1 = grid.pack_block_index(jnp.asarray(ijk))
    assert np.all(np.asarray(w1) >= 0)  # sentinel space is negative
    back = np.asarray(grid.unpack_block_index(w0, w1))
    np.testing.assert_array_equal(back, ijk)


def test_pack_collision_free(rng):
    ijk = rng.integers(-100, 100, size=(3000, 3)).astype(np.int32)
    uniq = np.unique(ijk, axis=0)
    w0, w1 = grid.pack_block_index(jnp.asarray(uniq))
    words = np.stack([np.asarray(w0), np.asarray(w1)], -1)
    assert len(np.unique(words, axis=0)) == len(uniq)


def test_log_odds():
    p = jnp.asarray([0.3, 0.5, 0.97])
    lo = grid.log_odds_from_probability(p)
    back = grid.probability_from_log_odds(lo)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), rtol=1e-4)

"""Timing registry, camera frustum, color maps, lie group edge cases."""

import time

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.utils import camera, color_maps, lie, timing


def test_timing_registry():
    timing.reset()
    with timing.timer("integrate/test", annotate=False):
        time.sleep(0.01)
    t = timing.Timer("esdf/test")
    time.sleep(0.005)
    t.stop()
    d = timing.as_dict()
    assert d["integrate/test"]["calls"] == 1
    assert d["integrate/test"]["mean_ms"] >= 5
    assert "esdf/test" in d
    out = timing.print_timing()
    assert "integrate/test" in out
    # DummyTimer no-ops.
    timing.DummyTimer("x").stop()
    timing.reset()
    assert timing.as_dict() == {}


def test_camera_frustum():
    # Camera at origin looking +z, 90 deg fov, depth 0.5..10.
    fr = camera.frustum_from_fov(
        (jnp.eye(3), jnp.zeros(3)), np.deg2rad(90.0), np.deg2rad(60.0),
        0.5, 10.0,
    )
    pts = jnp.asarray(
        [
            [0.0, 0.0, 5.0],   # inside
            [0.0, 0.0, 0.1],   # before near plane
            [0.0, 0.0, 20.0],  # beyond far
            [20.0, 0.0, 5.0],  # right of fov
            [4.0, 0.0, 5.0],   # inside (45 deg half-fov)
        ]
    )
    inside = np.asarray(camera.points_in_frustum(fr, pts))
    np.testing.assert_array_equal(inside, [True, False, False, False, True])
    blocks = jnp.asarray([[0, 0, 2], [50, 0, 2]], jnp.int32)
    binside = np.asarray(camera.blocks_in_frustum(fr, blocks, 1.0))
    assert binside[0] and not binside[1]


def test_color_maps_shapes():
    v = np.linspace(0, 1, 7)
    for name, fn in color_maps.COLOR_MAPS.items():
        out = fn(v)
        assert out.shape == (7, 3) and out.dtype == np.uint8, name
    # Ironbow endpoints: black -> white.
    ib = color_maps.ironbow_color_map(np.asarray([0.0, 1.0]))
    assert (ib[0] < 10).all() and (ib[1] > 245).all()


def test_lie_compose_inverse(rng):
    xi1 = jnp.asarray(rng.uniform(-0.4, 0.4, 6).astype(np.float32))
    xi2 = jnp.asarray(rng.uniform(-0.4, 0.4, 6).astype(np.float32))
    T1 = lie.se3_exp(xi1)
    T2 = lie.se3_exp(xi2)
    T12 = lie.compose(T1, T2)
    back = lie.compose(lie.inverse(T1), T12)
    np.testing.assert_allclose(np.asarray(back[0]), np.asarray(T2[0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(back[1]), np.asarray(T2[1]),
                               atol=1e-5)
    # Identity edge case.
    R, t = lie.se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-6)


def test_compact_ids_matches_nonzero():
    """ops/compaction.compact_ids must reproduce
    jnp.nonzero(mask, size=k, fill_value=f)[0] exactly (ascending ids,
    fill tail, silent drop past k) — it replaces the scalar-unit custom
    lowering in every hot compaction."""
    import jax.numpy as jnp
    import numpy as np

    from voxblox_tpu.ops.compaction import compact_ids

    rng = np.random.RandomState(5)
    for n, k, dens in [(1000, 64, 0.03), (1000, 64, 0.5), (4096, 128, 0.0),
                       (94208, 512, 0.01), (131, 16, 1.0), (128, 200, 0.2)]:
        mask = jnp.asarray(rng.uniform(size=n) < dens)
        for fill in (n, -1):
            want = np.asarray(
                jnp.nonzero(mask, size=k, fill_value=fill)[0]
            )
            got = np.asarray(compact_ids(mask, k, fill=fill))
            np.testing.assert_array_equal(got, want, err_msg=str((n, k, dens, fill)))

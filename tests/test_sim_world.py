"""Simulation world: SDF correctness, render consistency, GT layers."""

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.sim import objects as so
from voxblox_tpu.sim import world as sw


def _world():
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 2.0), 2.0, color=(255, 0, 0))
    w.add_ground_level(0.0)
    return w


def test_sphere_sdf_exact():
    objs = _world().freeze()
    pts = jnp.asarray([[0.0, 0.0, 5.0], [0.0, 0.0, 2.0], [3.0, 0.0, 2.0]])
    d, color = sw.distance_to_point(objs, pts, max_dist=100.0)
    d = np.asarray(d)
    # min(sphere, plane): [min(1, 5), min(-2, 2), min(1, 2)]
    np.testing.assert_allclose(d, [1.0, -2.0, 1.0], atol=1e-5)


def test_cube_cylinder_sdf(rng):
    w = sw.SimulationWorld()
    w.add_cube((0.0, 0.0, 0.0), (2.0, 2.0, 2.0))
    objs = w.freeze()
    pts = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0], [2.0, 2.0, 0.0]])
    d, _ = sw.distance_to_point(objs, pts, 100.0)
    np.testing.assert_allclose(
        np.asarray(d), [1.0, -1.0, np.sqrt(2.0)], atol=1e-5
    )
    w2 = sw.SimulationWorld()
    w2.add_cylinder((0.0, 0.0, 0.0), 1.0, 2.0)
    objs2 = w2.freeze()
    pts2 = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 0.0, 2.0], [2.0, 0.0, 2.0]])
    d2, _ = sw.distance_to_point(objs2, pts2, 100.0)
    # Above the cap the reference uses sqrt(max(radial^2 - r^2, 0) + dz^2)
    # (objects.h:279-292) — NOT the true rim distance sqrt((radial-r)^2+dz^2);
    # we reproduce the reference's value (2.0 here, true euclidean is sqrt 2).
    np.testing.assert_allclose(np.asarray(d2), [1.0, 1.0, 2.0], atol=1e-5)


def test_render_points_lie_on_surfaces():
    objs = _world().freeze()
    origin = jnp.asarray([0.0, -6.0, 2.0])
    view = jnp.asarray([0.0, 1.0, 0.0])
    pts, colors, valid = sw.pointcloud_from_viewpoint(
        objs, origin, view, (64, 48), np.deg2rad(60.0), max_dist=20.0
    )
    pts, colors, valid = np.asarray(pts), np.asarray(colors), np.asarray(valid)
    assert valid.sum() > 100
    d, _ = sw.distance_to_point(objs, jnp.asarray(pts[valid]), 100.0)
    # Every hit point lies on some object surface.
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-3)
    # Rays through the sphere center hit the sphere, colored red.
    center_hit = pts[valid][np.linalg.norm(pts[valid] - [0, -2, 2], axis=1) < 0.3]
    assert len(center_hit) > 0


def test_range_noise_statistics(rng):
    objs = _world().freeze()
    origin = jnp.asarray([0.0, -6.0, 2.0])
    view = jnp.asarray([0.0, 1.0, 0.0])
    clean, _, valid = sw.pointcloud_from_viewpoint(
        objs, origin, view, (32, 32), np.deg2rad(60.0), 20.0
    )
    noisy, _, _ = sw.pointcloud_from_viewpoint(
        objs, origin, view, (32, 32), np.deg2rad(60.0), 20.0,
        noise_sigma=0.05, noise_key=jax.random.PRNGKey(0),
    )
    v = np.asarray(valid)
    dr = np.linalg.norm(np.asarray(noisy)[v] - np.asarray(origin), axis=1) - \
        np.linalg.norm(np.asarray(clean)[v] - np.asarray(origin), axis=1)
    assert abs(dr.mean()) < 0.02
    assert 0.02 < dr.std() < 0.10


def test_gt_layer_matches_analytic():
    w = _world()
    w.min_bound = np.array([-3.0, -3.0, -0.5], np.float32)
    w.max_bound = np.array([3.0, 3.0, 4.5], np.float32)
    objs = w.freeze()
    layer = sw.generate_gt_layer(
        objs, "tsdf", voxel_size=0.25, min_bound=w.min_bound,
        max_bound=w.max_bound, max_dist=4.0, vps=8, max_blocks=512,
    )
    # Sample some observed voxels and verify against analytic SDF.
    from voxblox_tpu.core import grid
    pts = np.array([[0.0, 0.0, 4.2], [1.0, 1.0, 1.0], [-2.0, 2.0, 0.3]],
                   np.float32)
    gvi = grid.point_to_grid_index(jnp.asarray(pts), 1.0 / 0.25)
    got, found = vlayer.get_voxels(layer, "tsdf", gvi)
    assert bool(jnp.all(found))
    centers = grid.grid_index_to_center_point(gvi, 0.25)
    want, _ = sw.distance_to_point(objs, centers, 4.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    w_got, _ = vlayer.get_voxels(layer, "weight", gvi)
    np.testing.assert_allclose(np.asarray(w_got), 1.0)

"""Occupancy integrator + occ->ESDF + intensity splatting."""

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import grid, layer as vlayer
from voxblox_tpu.core.config import (
    EsdfIntegratorConfig,
    OccupancyIntegratorConfig,
)
from voxblox_tpu.ops import intensity as vintensity
from voxblox_tpu.ops import occupancy as vocc
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import evaluation


def _scan(objs, origin, view):
    pts, colors, valid = sw.pointcloud_from_viewpoint(
        objs, origin, view, (48, 36), np.deg2rad(60.0), 8.0
    )
    R = sw.rotation_from_two_vectors(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(view, jnp.float32)
    )
    pts_C = sw.world_points_to_sensor((R, jnp.asarray(origin)), pts, valid)
    return (R, jnp.asarray(origin, jnp.float32)), pts_C


def test_occupancy_hits_and_misses():
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 2.0), 1.0)
    objs = w.freeze()
    layer = vlayer.make_layer("occupancy", 0.1, vps=16, max_blocks=512)
    cfg = OccupancyIntegratorConfig(max_ray_length_m=8.0)
    pose, pts_C = _scan(objs, [0.0, -4.0, 2.0], [0.0, 1.0, 0.0])
    for _ in range(4):
        layer, overflow = vocc.integrate_pointcloud(layer, pose, pts_C, cfg)
        assert not bool(overflow)
    # Endpoint voxel (just inside the near surface): occupied after 4 hits.
    surf = jnp.asarray([[0.01, -0.99, 2.01]])
    gvi = grid.point_to_grid_index(surf, 10.0)
    lo, found = vlayer.get_voxels(layer, "log_odds", gvi)
    assert bool(found[0])
    p_occ = float(grid.probability_from_log_odds(lo[0]))
    assert p_occ > 0.7
    # Free space between camera and sphere: probability low.
    free = jnp.asarray([[0.0, -2.5, 2.0]])
    gvi = grid.point_to_grid_index(free, 10.0)
    lo, found = vlayer.get_voxels(layer, "log_odds", gvi)
    assert bool(found[0])
    assert float(grid.probability_from_log_odds(lo[0])) < 0.2


def test_occ_esdf():
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 2.0), 1.0)
    objs = w.freeze()
    layer = vlayer.make_layer("occupancy", 0.1, vps=16, max_blocks=512)
    cfg = OccupancyIntegratorConfig(max_ray_length_m=8.0)
    for view_origin in ([0.0, -4.0, 2.0], [0.0, 4.0, 2.0], [4.0, 0.0, 2.0]):
        view = -np.asarray(view_origin) + np.asarray([0, 0, 2.0])
        pose, pts_C = _scan(objs, view_origin, view / np.linalg.norm(view))
        for _ in range(3):
            layer, _ = vocc.integrate_pointcloud(layer, pose, pts_C, cfg)
    ecfg = EsdfIntegratorConfig(max_distance_m=2.0, default_distance_m=2.0)
    esdf_layer = vlayer.make_layer("esdf", 0.1, vps=16, max_blocks=512)
    esdf_layer, overflow, _ = vocc.esdf_from_occupancy_batch(
        esdf_layer, layer, ecfg
    )
    assert not bool(overflow)
    # Distance at a free voxel ~ its distance to the sphere surface.
    q = jnp.asarray([[0.0, -2.0, 2.0]])
    gvi = grid.point_to_grid_index(q, 10.0)
    d, found = vlayer.get_voxels(esdf_layer, "esdf", gvi)
    assert bool(found[0])
    assert 0.6 < float(d[0]) < 1.4


def test_intensity_splat():
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 2.0), 1.0)
    objs = w.freeze()
    bound = 1.8
    tsdf_layer = sw.generate_gt_layer(
        objs, "tsdf", 0.1, (-bound, -bound, 2 - bound),
        (bound, bound, 2 + bound), max_dist=0.4, vps=8, max_blocks=1024,
    )
    ilayer = vlayer.make_layer("intensity", 0.1, vps=8, max_blocks=1024)
    origin = jnp.asarray([0.0, -3.0, 2.0])
    n = 64
    ang = np.linspace(-0.2, 0.2, n)
    bearings = np.stack(
        [np.sin(ang), np.cos(ang), np.zeros(n)], -1
    ).astype(np.float32)
    temps = np.full(n, 37.0, np.float32)
    ilayer, hit = vintensity.add_intensity_bearing_vectors(
        ilayer, tsdf_layer, origin, jnp.asarray(bearings), jnp.asarray(temps)
    )
    assert bool(jnp.any(hit))
    # Voxel at the front surface got the temperature.
    q = grid.point_to_grid_index(jnp.asarray([[0.0, -1.05, 2.0]]), 10.0)
    val, found = vlayer.get_voxels(ilayer, "intensity", q)
    wgt, _ = vlayer.get_voxels(ilayer, "intensity_weight", q)
    assert bool(found[0]) and float(wgt[0]) > 0
    assert abs(float(val[0]) - 37.0) < 1e-3


def test_intensity_image_front_end():
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 2.0), 1.0)
    objs = w.freeze()
    bound = 1.8
    tsdf_layer = sw.generate_gt_layer(
        objs, "tsdf", 0.1, (-bound, -bound, 2 - bound),
        (bound, bound, 2 + bound), max_dist=0.4, vps=8, max_blocks=1024,
    )
    from voxblox_tpu.core.config import MapConfig
    from voxblox_tpu.server import IntensityServer
    srv = IntensityServer(map_config=MapConfig(voxel_size=0.1, max_blocks=1024))
    srv.layer = tsdf_layer
    srv.intensity_layer = vlayer.make_layer("intensity", 0.1, vps=8,
                                            max_blocks=1024)
    R = np.asarray(sw.rotation_from_two_vectors(
        jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([0.0, 1.0, 0.0])))
    img = np.full((24, 32), 42.0, np.float32)
    hits = srv.insert_intensity_image(
        (R, np.array([0.0, -3.0, 2.0], np.float32)), img,
        (30.0, 30.0, 16.0, 12.0), subsample=2,
    )
    assert hits > 10
    q = grid.point_to_grid_index(jnp.asarray([[0.0, -1.05, 2.0]]), 10.0)
    val, found = vlayer.get_voxels(srv.intensity_layer, "intensity", q)
    assert bool(found[0])
    assert abs(float(val[0]) - 42.0) < 1e-3


def test_mesh_color_modes():
    from voxblox_tpu.utils import mesh_vis
    verts = np.array([[0, 0, 0], [1, 0, 1], [0, 1, 2]], np.float32)
    normals = np.array([[0, 0, 1]] * 3, np.float32)
    colors = np.array([[10, 20, 30]] * 3, np.uint8)
    for mode in ["color", "height", "normals", "gray", "lambert",
                 "lambert_color"]:
        out = mesh_vis.apply_color_mode(verts, normals, colors, mode)
        assert out.shape == (3, 3) and out.dtype == np.uint8
    assert (mesh_vis.apply_color_mode(verts, normals, colors, "color")
            == colors).all()
    h = mesh_vis.apply_color_mode(verts, normals, colors, "height")
    assert (h[0] != h[1]).any()  # height gradient

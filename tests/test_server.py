"""Server layer e2e: SimulationServer benchmark + save/load + mesh +
transform/planning utilities."""

import os

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import grid, layer as vlayer
from voxblox_tpu.core.config import (
    EsdfIntegratorConfig,
    MapConfig,
    TsdfIntegratorConfig,
)
from voxblox_tpu.ops import transform as vtransform
from voxblox_tpu.server import EsdfServer, SimulationServer
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import planning


def _world():
    w = sw.SimulationWorld()
    w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
    w.add_ground_level(0.0)
    w.min_bound = np.array([-5.0, -5.0, -0.5], np.float32)
    w.max_bound = np.array([5.0, 5.0, 5.5], np.float32)
    return w


import pytest


@pytest.mark.slow
def test_simulation_server_end_to_end():
    srv = SimulationServer(
        _world(), voxel_size=0.2, camera_res=(64, 48), method="merged",
        max_blocks=2048, generate_occupancy=True,
    )
    result = srv.run(n_viewpoints=6, seed=1)
    assert result["tsdf"].num_evaluated_voxels > 1000
    assert result["tsdf"].rmse < 2 * 0.2
    assert result["esdf"].rmse < 2 * 0.2
    assert "integrate/merged" in result["timing"]
    # Occupancy track (simulation_server.cc:235-269): classification vs
    # GT sign and the ESDF-from-occupancy layer.
    assert result["occ"]["num_evaluated_voxels"] > 1000
    assert result["occ"]["misclassified_frac"] < 0.15
    assert result["esdf_occ"].num_evaluated_voxels > 1000
    assert result["esdf_occ"].rmse < 4 * 0.2


def test_esdf_server_pipeline(tmp_path):
    w = _world()
    objs = w.freeze()
    srv = EsdfServer(
        map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
        integrator_config=TsdfIntegratorConfig(
            default_truncation_distance=0.8, max_ray_length_m=10.0
        ),
        esdf_config=EsdfIntegratorConfig(
            max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.4
        ),
        method="simple",
    )
    pose = (
        jnp.asarray([[0.0, 0.0, -1.0], [1.0, 0.0, 0.0], [0.0, -1.0, 0.0]]).T,
        jnp.asarray([4.0, 0.0, 2.0]),
    )
    # Use sim camera: look at center from +x.
    R = jnp.asarray(
        np.stack(
            [
                np.cross([-1.0, 0, 0], [0, 0, 1.0]) * -1,
                [0.0, 0.0, -1.0],
                [-1.0, 0.0, 0.0],
            ],
            1,
        ),
        jnp.float32,
    )
    pts_G, colors, valid = sw.pointcloud_from_transform(
        objs, (R, pose[1]), (64, 48), np.deg2rad(60.0), 10.0
    )
    pts_C = sw.world_points_to_sensor((R, pose[1]), pts_G, valid)
    srv.insert_pointcloud((R, pose[1]), pts_C, colors)
    iters = srv.update_esdf()
    assert iters >= 1
    srv.update_mesh()
    assert srv.export_mesh_layer().num_vertices() > 0

    path = os.path.join(tmp_path, "map.vxblx")
    srv.save_map(path)
    srv2 = EsdfServer(
        map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
    )
    srv2.load_map(path)
    assert int(srv2.layer.num_blocks) == int(srv.layer.num_blocks)
    from voxblox_tpu.utils import evaluation
    assert evaluation.count_observed(srv2.esdf_layer) == (
        evaluation.count_observed(srv.esdf_layer)
    )
    stats = srv.stats()
    assert stats["num_scans"] == 1


def test_fused_step_organized_matches_flat_cloud():
    """The fused online step's organized fast path (scatter-free
    min-pool binning of a raster [H,W,3] cloud) builds the same kind of
    map as the flat-cloud scatter-binned path."""
    w = _world()
    objs = w.freeze()
    res = (64, 48)
    fov = float(np.deg2rad(60.0))
    fx = res[0] / (2.0 * np.tan(fov / 2.0))

    def make_server(organized):
        kw = dict(
            map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
            integrator_config=TsdfIntegratorConfig(
                default_truncation_distance=0.8, max_ray_length_m=10.0
            ),
            esdf_config=EsdfIntegratorConfig(
                max_distance_m=2.0, default_distance_m=2.0,
                min_distance_m=0.4, max_active_blocks=256,
            ),
            method="projective",
            projective_resolution=(32, 24),
            projective_fov_deg=60.0,
        )
        if organized:
            kw["projective_intrinsics"] = (fx, fx, res[0] / 2, res[1] / 2)
            kw["projective_pool"] = 2
        return EsdfServer(**kw)

    srv_o, srv_f = make_server(True), make_server(False)
    from voxblox_tpu.utils import evaluation

    for i in range(2):
        a = 2 * np.pi * i / 8
        pos = jnp.asarray([4 * np.cos(a), 4 * np.sin(a), 2.0], jnp.float32)
        view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
        R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
        pts, cols, valid, _ = sw.organized_pointcloud_from_transform(
            objs, (R, pos), res, fov, 10.0
        )
        srv_o.insert_pointcloud_and_update_esdf((R, pos), pts, cols)
        srv_f.insert_pointcloud_and_update_esdf(
            (R, pos), pts.reshape(-1, 3), cols.reshape(-1, 3)
        )
    srv_o.check_overflow()
    srv_f.check_overflow()
    n_o = evaluation.count_observed(srv_o.layer)
    n_f = evaluation.count_observed(srv_f.layer)
    assert n_o > 1000
    # Different virtual images (exact-intrinsics min-pool vs fov
    # re-projection) -> same scene coverage within a modest margin.
    assert 0.6 < n_o / n_f < 1.7, (n_o, n_f)
    assert evaluation.count_observed(srv_o.esdf_layer) > 1000


def test_transform_layer_identity_and_shift():
    w = _world()
    objs = w.freeze()
    src = sw.generate_gt_layer(
        objs, "tsdf", 0.2, (-2.0, -2.0, 0.0), (2.0, 2.0, 3.0),
        max_dist=0.8, vps=8, max_blocks=1024,
    )
    # Pure translation by exactly one block: values should transport.
    T = (jnp.eye(3), jnp.asarray([1.6, 0.0, 0.0]))
    out, overflow = vtransform.transform_layer(src, T, max_blocks=2048)
    assert not bool(overflow)
    q = jnp.asarray([[0.3, 0.3, 2.0]], jnp.float32)
    d_src, ok1 = __import__(
        "voxblox_tpu.ops.interp", fromlist=["interpolate"]
    ).interpolate(src, q)
    d_out, ok2 = __import__(
        "voxblox_tpu.ops.interp", fromlist=["interpolate"]
    ).interpolate(out, q + jnp.asarray([[1.6, 0.0, 0.0]]))
    assert bool(ok1[0]) and bool(ok2[0])
    np.testing.assert_allclose(float(d_src[0]), float(d_out[0]), atol=1e-3)


def test_naive_transform_layer_matches_exact_on_block_shift():
    """naiveTransformLayer equivalent (merge_integration.h:94-138):
    exact on grid-aligned translations, degraded-but-close vs the
    inverse-warp path under rotation."""
    w = _world()
    objs = w.freeze()
    src = sw.generate_gt_layer(
        objs, "tsdf", 0.2, (-2.0, -2.0, 0.0), (2.0, 2.0, 3.0),
        max_dist=0.8, vps=8, max_blocks=1024,
    )
    # Grid-aligned translation: forward-NN transport is exact.
    T = (jnp.eye(3), jnp.asarray([1.6, 0.0, 0.0]))
    out, overflow = vtransform.naive_transform_layer(src, T,
                                                     max_blocks=2048)
    assert not bool(overflow)
    interp = __import__("voxblox_tpu.ops.interp", fromlist=["interpolate"])
    q = jnp.asarray([[0.3, 0.3, 2.0]], jnp.float32)
    d_src, ok1 = interp.interpolate(src, q)
    d_out, ok2 = interp.interpolate(out, q + jnp.asarray([[1.6, 0.0, 0.0]]))
    assert bool(ok1[0]) and bool(ok2[0])
    np.testing.assert_allclose(float(d_src[0]), float(d_out[0]), atol=1e-5)

    # Rotation: NN aliases but stays within a voxel of the exact warp.
    ang = np.deg2rad(30.0)
    Rz = jnp.asarray([
        [np.cos(ang), -np.sin(ang), 0.0],
        [np.sin(ang), np.cos(ang), 0.0],
        [0.0, 0.0, 1.0],
    ], jnp.float32)
    T2 = (Rz, jnp.asarray([0.0, 0.0, 0.0]))
    naive, _ = vtransform.naive_transform_layer(src, T2, max_blocks=2048)
    exact, _ = vtransform.transform_layer(src, T2, max_blocks=2048)
    qs = jnp.asarray(
        [[0.3, 0.3, 2.0], [-0.5, 0.2, 1.0], [0.8, -0.4, 1.5]], jnp.float32
    ) @ Rz.T
    dn, okn = interp.interpolate(naive, qs)
    de, oke = interp.interpolate(exact, qs)
    sel = np.asarray(okn & oke)
    assert sel.any()
    assert float(jnp.max(jnp.abs(dn - de) * sel)) < 2 * src.voxel_size


def test_merge_layers():
    w = _world()
    objs = w.freeze()
    a = sw.generate_gt_layer(
        objs, "tsdf", 0.2, (-2.0, -2.0, 0.0), (0.0, 2.0, 2.0),
        max_dist=0.8, vps=8, max_blocks=512,
    )
    b = sw.generate_gt_layer(
        objs, "tsdf", 0.2, (0.0, -2.0, 0.0), (2.0, 2.0, 2.0),
        max_dist=0.8, vps=8, max_blocks=512,
    )
    merged, overflow = vtransform.merge_layers(a, b)
    assert not bool(overflow)
    from voxblox_tpu.utils import evaluation
    na = evaluation.count_observed(a)
    nm = evaluation.count_observed(merged)
    assert nm > na


def test_clear_and_fill_spheres():
    layer = vlayer.make_layer("esdf", 0.2, vps=8, max_blocks=512)
    cfg = EsdfIntegratorConfig(
        clear_sphere_radius=1.0, occupied_sphere_radius=2.0,
        default_distance_m=2.0,
    )
    layer, overflow = planning.add_new_robot_position(
        layer, jnp.asarray([0.0, 0.0, 0.0]), cfg
    )
    assert not bool(overflow)
    inner = grid.point_to_grid_index(jnp.asarray([[0.2, 0.0, 0.0]]), 5.0)
    outer = grid.point_to_grid_index(jnp.asarray([[0.0, 1.6, 0.0]]), 5.0)
    d_in, f1 = vlayer.get_voxels(layer, "esdf", inner)
    d_out, f2 = vlayer.get_voxels(layer, "esdf", outer)
    assert bool(f1[0]) and bool(f2[0])
    assert float(d_in[0]) > 1.9  # free
    assert float(d_out[0]) < -1.9  # occupied crust


def test_projective_server_method():
    w = _world()
    objs = w.freeze()
    srv = EsdfServer(
        map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
        integrator_config=TsdfIntegratorConfig(
            default_truncation_distance=0.8, max_ray_length_m=10.0
        ),
        method="projective",
        projective_resolution=(64, 48),
        projective_fov_deg=60.0,
    )
    view = jnp.asarray([-1.0, 0.0, 0.0])
    R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
    pos = jnp.asarray([4.0, 0.0, 2.0])
    pts_G, colors, valid = sw.pointcloud_from_viewpoint(
        objs, pos, view, (64, 48), np.deg2rad(60.0), 10.0
    )
    pts_C = sw.world_points_to_sensor((R, pos), pts_G, valid)
    srv.insert_pointcloud((R, pos), pts_C, colors)
    # Blocks = traversed free-space cone + surface band only (occluded
    # blocks behind the band are HiZ-culled before allocation).
    assert int(srv.layer.num_blocks) > 8
    srv.update_esdf()
    srv.update_mesh()
    assert srv.export_mesh_layer().num_vertices() > 0


def test_deferred_overflow_recovery():
    """overflow_check_interval > 1 defers the sweep working-set overflow
    check; check_overflow must then rebuild the exact field via the
    batch path (the deferred updates may have dropped rows)."""
    import dataclasses

    from voxblox_tpu.core.config import EsdfIntegratorConfig
    from voxblox_tpu.ops import esdf as esdf_ops
    from voxblox_tpu.utils import evaluation

    w = _world()
    objs = w.freeze()

    def make(interval, max_active):
        return EsdfServer(
            map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
            integrator_config=TsdfIntegratorConfig(
                default_truncation_distance=0.8, max_ray_length_m=10.0
            ),
            esdf_config=EsdfIntegratorConfig(
                max_distance_m=1.0, default_distance_m=1.0,
                min_distance_m=0.4, max_active_blocks=max_active,
            ),
            method="projective",
            projective_resolution=(64, 48),
            projective_fov_deg=60.0,
            overflow_check_interval=interval,
        )

    def feed(srv, seed_bucket=None):
        if seed_bucket is not None:
            # Force an undersized working-set bucket so the deferred
            # incremental updates overflow it (the cache normally sizes
            # itself to the live map on first use).
            key = (srv.esdf_layer.max_blocks, srv.esdf_layer.vps,
                   srv.esdf_cfg.max_active_blocks)
            esdf_ops._BUCKET_CACHE[key] = seed_bucket
        ovf_seen = False
        for i in range(3):
            a = 2 * np.pi * i / 3
            pos = jnp.asarray([4 * np.cos(a), 4 * np.sin(a), 2.0],
                              jnp.float32)
            view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
            R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]),
                                             view)
            pts_G, colors, valid = sw.pointcloud_from_viewpoint(
                objs, pos, view, (64, 48), np.deg2rad(60.0), 10.0
            )
            pts_C = sw.world_points_to_sensor((R, pos), pts_G, valid)
            srv.insert_pointcloud((R, pos), pts_C, colors)
            srv.update_esdf()
        if srv._esdf_region_ovf is not None:
            ovf_seen = bool(srv._esdf_region_ovf)
        srv.check_overflow()
        return srv, ovf_seen

    # Undersized bucket: the deferred incremental updates overflow it,
    # and check_overflow must restore the exact field via the batch path.
    esdf_ops._BUCKET_CACHE.clear()
    deferred, ovf_seen = feed(make(interval=8, max_active=512),
                              seed_bucket=16)
    assert ovf_seen, "test setup: deferred overflow never triggered"
    esdf_ops._BUCKET_CACHE.clear()
    ref, _ = feed(make(interval=1, max_active=512))
    det = evaluation.evaluate_layers_rmse(ref.esdf_layer,
                                          deferred.esdf_layer)
    assert det.num_evaluated_voxels > 1000
    assert det.rmse < 5e-3, str(det)


def test_evaluate_layer_rmse_at_poses():
    """Pose-sweep RMSE (merge_integration.h:236-307): the identity pose
    must score ~0 RMSE and a shifted pose must score worse; the aligned
    layers come back on request."""
    from voxblox_tpu.utils import evaluation

    w = _world()
    objs = w.freeze()
    layer_a = sw.generate_gt_layer(
        objs, "tsdf", 0.2, (-2.0, -2.0, 0.0), (2.0, 2.0, 3.0),
        max_dist=0.8, vps=8, max_blocks=1024,
    )
    eye = (jnp.eye(3), jnp.zeros(3))
    shift = (jnp.eye(3), jnp.asarray([0.35, 0.0, 0.0]))
    details, aligned = evaluation.evaluate_layer_rmse_at_poses(
        layer_a, layer_a, [eye, shift], return_aligned=True,
    )
    assert len(details) == 2 and len(aligned) == 2
    assert details[0].num_evaluated_voxels > 1000
    assert details[0].rmse < 0.02
    assert details[1].rmse > 2 * details[0].rmse


def test_fused_scan_matches_two_dispatch():
    """insert_pointcloud_and_update_esdf (ONE jitted program per scan)
    must produce the same map as insert_pointcloud + update_esdf."""
    from voxblox_tpu.utils import evaluation

    w = _world()
    objs = w.freeze()

    def make():
        return EsdfServer(
            map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
            integrator_config=TsdfIntegratorConfig(
                default_truncation_distance=0.8, max_ray_length_m=10.0
            ),
            esdf_config=EsdfIntegratorConfig(
                max_distance_m=2.0, default_distance_m=2.0,
                min_distance_m=0.4, max_active_blocks=512,
            ),
            method="projective",
            projective_resolution=(64, 48),
            projective_fov_deg=60.0,
            overflow_check_interval=4,
        )

    scans = []
    for ang in (0.0, 0.7):
        view = jnp.asarray([-np.cos(ang), -np.sin(ang), 0.0], jnp.float32)
        R = sw.rotation_from_two_vectors(jnp.asarray([0.0, 0.0, 1.0]), view)
        pos = jnp.asarray([4.0 * np.cos(ang), 4.0 * np.sin(ang), 2.0],
                          jnp.float32)
        pts_G, colors, valid = sw.pointcloud_from_viewpoint(
            objs, pos, view, (64, 48), np.deg2rad(60.0), 10.0
        )
        pts_C = sw.world_points_to_sensor((R, pos), pts_G, valid)
        scans.append(((R, pos), pts_C, colors))

    srv_a, srv_b = make(), make()
    for T, pts_C, colors in scans:
        srv_a.insert_pointcloud(T, pts_C, colors)
        srv_a.update_esdf()
        srv_b.insert_pointcloud_and_update_esdf(T, pts_C, colors)
    srv_a.check_overflow()
    srv_b.check_overflow()

    assert int(srv_b.layer.num_blocks) == int(srv_a.layer.num_blocks)
    det = evaluation.evaluate_layers_rmse(srv_a.esdf_layer, srv_b.esdf_layer)
    assert det.num_evaluated_voxels > 1000
    assert det.rmse < 1e-5, str(det)
    assert srv_b.num_scans == 2


def test_projective_budget_grow_and_retry():
    """A scene that overflows the configured projective budgets must
    converge to the SAME map as a generous-budget run — overflowed scans
    are withheld (transactional) and replayed at grown budget rungs by
    check_overflow; no dropped and no double-counted updates (reference
    analogue: dynamic allocation never drops points,
    tsdf_integrator.cc:91-147)."""
    from voxblox_tpu.utils import evaluation

    w = _world()
    objs = w.freeze()

    def scans(n=4):
        out = []
        for i in range(n):
            a = 2 * np.pi * i / n
            pos = jnp.asarray([4 * np.cos(a), 4 * np.sin(a), 2.0],
                              jnp.float32)
            view = jnp.asarray([-np.cos(a), -np.sin(a), 0.0], jnp.float32)
            R = sw.rotation_from_two_vectors(
                jnp.asarray([0.0, 0.0, 1.0]), view
            )
            pts_G, colors, valid = sw.pointcloud_from_viewpoint(
                objs, pos, view, (64, 48), np.deg2rad(60.0), 10.0
            )
            pts_C = sw.world_points_to_sensor((R, pos), pts_G, valid)
            out.append(((R, pos), pts_C, colors))
        return out

    from voxblox_tpu.server import TsdfServer

    def make(mixed, interval):
        return TsdfServer(
            map_config=MapConfig(voxel_size=0.2, max_blocks=1024),
            integrator_config=TsdfIntegratorConfig(
                default_truncation_distance=0.8, max_ray_length_m=10.0
            ),
            method="projective",
            projective_resolution=(64, 48),
            projective_fov_deg=60.0,
            projective_max_mixed_slabs=mixed,
            overflow_check_interval=interval,
        )

    data = scans()
    ref = make(mixed=None, interval=1)  # generous: never overflows
    tiny_sync = make(mixed=8, interval=1)  # sync grow-and-retry
    tiny_def = make(mixed=8, interval=8)  # deferred grow-and-retry
    for T, pts, cols in data:
        ref.insert_pointcloud(T, pts, cols)
        tiny_sync.insert_pointcloud(T, pts, cols)
        tiny_def.insert_pointcloud(T, pts, cols)
    ref.check_overflow()
    tiny_sync.check_overflow()
    tiny_def.check_overflow()
    # The tiny budgets must actually have grown (the scene overflows 8).
    assert tiny_sync.projective_budgets["max_mixed_slabs"] != 8
    assert tiny_def.projective_budgets["max_mixed_slabs"] != 8
    for srv in (tiny_sync, tiny_def):
        det = evaluation.evaluate_layers_rmse(ref.layer, srv.layer)
        assert det.num_evaluated_voxels > 1000
        assert det.num_non_overlapping_voxels == 0, str(det)
        assert det.rmse < 1e-6, str(det)
        act = np.asarray(srv.layer.active_mask())
        slot_r = np.asarray(
            vlayer.lookup_blocks(ref.layer, srv.layer.block_ijk)
        )
        ok_rows = act & (slot_r >= 0)
        assert ok_rows.sum() > 4
        w_s = np.asarray(srv.layer.channels["weight"])[ok_rows]
        w_r = np.asarray(ref.layer.channels["weight"])[slot_r[ok_rows]]
        assert np.abs(w_s - w_r).max() < 1e-4

"""CLI subcommand smoke tests + map query APIs."""

import json
import os

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core.config import MapConfig
from voxblox_tpu.models import EsdfMap, TsdfMap
from voxblox_tpu.server import cli
from voxblox_tpu.sim import world as sw


def _small_map_file(tmp_path):
    from voxblox_tpu.io import layer_io

    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 1.0), 0.8, color=(200, 40, 40))
    objs = w.freeze()
    layer = sw.generate_gt_layer(
        objs, "tsdf", 0.1, (-1.5, -1.5, -0.5), (1.5, 1.5, 2.5),
        max_dist=0.4, vps=8, max_blocks=512,
    )
    path = os.path.join(tmp_path, "m.vxblx")
    layer_io.save_layer(layer, path)
    return objs, layer, path


def test_cli_mesh_info_tsdf_to_esdf(tmp_path, capsys):
    objs, layer, path = _small_map_file(tmp_path)
    out_ply = os.path.join(tmp_path, "m.ply")
    assert cli.main(["mesh", path, out_ply]) == 0
    assert os.path.getsize(out_ply) > 1000

    assert cli.main(["info", path]) == 0
    out = capsys.readouterr().out
    assert "type=tsdf" in out

    out_map = os.path.join(tmp_path, "m2.vxblx")
    assert cli.main(["tsdf-to-esdf", path, out_map,
                     "--max-distance", "1.0"]) == 0
    assert cli.main(["info", out_map]) == 0
    out = capsys.readouterr().out
    assert "type=esdf" in out


def test_cli_eval(tmp_path, capsys):
    objs, layer, path = _small_map_file(tmp_path)
    # GT surface points on the sphere -> interpolated |d| should be ~0.
    from voxblox_tpu.io import ply

    rng = np.random.default_rng(0)
    v = rng.normal(size=(200, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = (v * 0.8 + [0, 0, 1.0]).astype(np.float32)
    gt_path = os.path.join(tmp_path, "gt.ply")
    ply.write_mesh_ply(gt_path, pts)
    recolor = os.path.join(tmp_path, "recolor.ply")
    assert cli.main(["eval", path, gt_path, "--recolor-mesh", recolor]) == 0
    out = capsys.readouterr().out
    stats = json.loads(out[: out.index("error-recolored")])
    assert stats["num_evaluated"] > 150
    assert stats["rmse"] < 0.05
    # Error-recolored mesh (voxblox_eval.cc:199-246): valid PLY with
    # near-black colors where the map matches GT.
    mesh = ply.read_ply(recolor)
    assert len(mesh["vertices"]) > 0
    assert mesh.get("colors") is not None


def test_map_apis(tmp_path):
    objs, layer, path = _small_map_file(tmp_path)
    tsdf_map = TsdfMap(layer, MapConfig(voxel_size=0.1, voxels_per_side=8))
    q = jnp.asarray([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]], jnp.float32)
    d, ok = tsdf_map.get_distance_at_position(q)
    assert bool(ok[0])
    assert abs(float(d[0]) - 0.2) < 0.05  # 0.2 above the sphere
    w_, _ = tsdf_map.get_weight_at_position(q)
    assert float(w_[0]) > 0.5
    pts, dd, ww, okk = tsdf_map.coord_plane_slice(2, 1.0, extent=1.0)
    assert pts.shape[0] == dd.shape[0]

    # ESDF map from this TSDF.
    from voxblox_tpu.core import layer as vlayer
    from voxblox_tpu.core.config import EsdfIntegratorConfig
    from voxblox_tpu.ops import esdf as esdf_ops

    el = vlayer.make_layer("esdf", 0.1, vps=8, max_blocks=512)
    el, _, _ = esdf_ops.update_from_tsdf_batch(
        el, layer, EsdfIntegratorConfig(max_distance_m=1.0,
                                        default_distance_m=1.0)
    )
    emap = EsdfMap(el, MapConfig(voxel_size=0.1, voxels_per_side=8))
    d, g, ok = emap.get_distance_and_gradient_at_position(q)
    assert bool(ok[0])
    assert abs(float(d[0]) - 0.2) < 0.06
    # Gradient points away from the sphere center.
    gn = np.asarray(g[0]) / max(np.linalg.norm(np.asarray(g[0])), 1e-6)
    assert gn[2] > 0.7
    assert bool(emap.is_observed(q)[0])


def test_adaptive_distance_and_gradient():
    """Adaptive queries (interpolator_inl.h:77-154): where the 8-corner
    stencil is incomplete the query falls back to one-sided differences
    and gradient-reconstructed distance instead of going invalid."""
    import dataclasses

    from voxblox_tpu.core import layer as vlayer

    h = 0.1
    layer = vlayer.make_layer("esdf", h, vps=8, max_blocks=8)
    layer, _ = vlayer.allocate_blocks(
        layer, jnp.asarray([[0, 0, 0]]), jnp.ones(1, bool)
    )
    from voxblox_tpu.core import grid as vgrid
    lin = jnp.arange(layer.voxels_per_block)
    local = vgrid.linear_to_local(lin, 8)
    z = (local[:, 2].astype(jnp.float32) + 0.5) * h
    ch = dict(layer.channels)
    ch["esdf"] = jnp.zeros_like(ch["esdf"]).at[0].set(z)
    # Voxels with local z >= 6 are unobserved.
    obs = jnp.where(local[:, 2] <= 5, vlayer.ESDF_OBSERVED, np.uint8(0))
    ch["esdf_flags"] = jnp.zeros_like(ch["esdf_flags"]).at[0].set(
        obs.astype(jnp.uint8)
    )
    layer = dataclasses.replace(layer, channels=ch)
    emap = EsdfMap(layer, MapConfig(voxel_size=h, voxels_per_side=8))

    q = jnp.asarray(
        [
            [0.35, 0.35, 0.35],   # interior: full stencil
            [0.35, 0.35, 0.599],  # stencil reaches unobserved z=6 layer
            [0.35, 0.35, 0.75],   # in the unobserved region itself
        ],
        jnp.float32,
    )
    # Plain trilinear: valid only at the interior point.
    _, _, ok_tri = emap.get_distance_and_gradient_at_position(q)
    assert bool(ok_tri[0]) and not bool(ok_tri[1])

    d, g, ok = emap.get_distance_and_gradient_at_position(q, adaptive=True)
    d, g, ok = np.asarray(d), np.asarray(g), np.asarray(ok)
    assert ok[0] and ok[1] and not ok[2]
    # Interior matches the trilinear value/gradient exactly.
    np.testing.assert_allclose(d[0], 0.35, atol=1e-5)
    np.testing.assert_allclose(g[0], [0, 0, 1.0], atol=1e-5)
    # Border point: one-sided z difference + reconstructed distance.
    np.testing.assert_allclose(g[1], [0, 0, 1.0], atol=1e-5)
    np.testing.assert_allclose(d[1], 0.599, atol=1e-4)


def test_traversable_points_and_cli(tmp_path):
    """EsdfMap.traversable_points filters by robot radius
    (esdf_server.cc:136-142) and the CLI exports the cloud."""
    import dataclasses

    from voxblox_tpu.core import layer as vlayer
    from voxblox_tpu.io import layer_io

    objs, layer, path = _small_map_file(tmp_path)
    from voxblox_tpu.core.config import EsdfIntegratorConfig
    from voxblox_tpu.ops import esdf as esdf_ops

    el = vlayer.make_layer("esdf", 0.1, vps=8, max_blocks=512)
    el, _, _ = esdf_ops.update_from_tsdf_batch(
        el, layer, EsdfIntegratorConfig(max_distance_m=1.0,
                                        default_distance_m=1.0)
    )
    emap = EsdfMap(el, MapConfig(voxel_size=0.1, voxels_per_side=8))
    radius = 0.3
    pts, dist = emap.traversable_points(radius)
    assert len(pts) > 100
    assert (dist > radius).all()
    # Every returned point is >= radius from the sphere surface (allow
    # the quasi-euclidean sweep's overestimate only, never closer).
    center = np.array([0.0, 0.0, 1.0])
    true_d = np.linalg.norm(pts - center, axis=1) - 0.8
    assert (true_d > radius - 0.1 * np.sqrt(3) - 1e-5).all()
    # Points just outside the surface are excluded.
    d_all, _ = emap.get_distance_at_position(jnp.asarray(pts))
    assert (np.asarray(d_all) > 0).all()

    out_map = os.path.join(tmp_path, "with_esdf.vxblx")
    layer_io.save_layer(layer, out_map)
    layer_io.save_layer(el, out_map, append=True)
    out_ply = os.path.join(tmp_path, "trav.ply")
    assert cli.main(["traversable", out_map, out_ply,
                     "--radius", str(radius)]) == 0
    from voxblox_tpu.io import ply as ply_io
    cloud = ply_io.read_ply(out_ply)
    assert len(cloud["vertices"]) == len(pts)

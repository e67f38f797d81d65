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
    assert cli.main(["eval", path, gt_path]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["num_evaluated"] > 150
    assert stats["rmse"] < 0.05


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

"""Meshing ESDF layers (the reference MeshIntegrator is templated over the
voxel type, mesh_integrator.h:72-90; ESDF validity = the observed flag,
utils/meshing_utils.h getSdfIfValid<EsdfVoxel>)."""

import os

import numpy as np

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import EsdfIntegratorConfig
from voxblox_tpu.io import layer_io
from voxblox_tpu.ops import esdf as esdf_ops
from voxblox_tpu.ops import mesh as mesh_ops
from voxblox_tpu.server import cli
from voxblox_tpu.sim import world as sw

VOXEL = 0.1


def _sphere_layers():
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 1.0), 0.8, color=(200, 40, 40))
    objs = w.freeze()
    tsdf = sw.generate_gt_layer(
        objs, "tsdf", VOXEL, (-1.5, -1.5, -0.5), (1.5, 1.5, 2.5),
        max_dist=0.4, vps=8, max_blocks=512,
    )
    cfg = EsdfIntegratorConfig(max_distance_m=1.0, default_distance_m=1.0)
    esdf = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
    esdf, overflow, _ = esdf_ops.update_from_tsdf_batch(esdf, tsdf, cfg)
    assert not bool(overflow)
    return tsdf, esdf


def test_esdf_mesh_matches_tsdf_surface():
    tsdf, esdf = _sphere_layers()
    ml_t = mesh_ops.MeshLayer(tsdf.block_size)
    mesh_ops.generate_mesh(tsdf, ml_t, only_updated=False)
    ml_e = mesh_ops.MeshLayer(esdf.block_size)
    mesh_ops.generate_mesh(esdf, ml_e, only_updated=False)

    vt, _, _ = ml_t.combined()
    ve, _, _ = ml_e.combined()
    assert len(ve) > 100
    # Both zero-isosurfaces approximate the sphere r=0.8 around (0,0,1).
    re = np.linalg.norm(ve - np.array([0.0, 0.0, 1.0]), axis=1)
    assert abs(re.mean() - 0.8) < VOXEL, re.mean()
    assert np.abs(re - 0.8).max() < 2 * VOXEL
    # Vertex counts comparable (same surface, same cube lattice).
    assert abs(len(ve) - len(vt)) < 0.25 * len(vt), (len(ve), len(vt))


def test_cli_mesh_esdf_and_color_modes(tmp_path):
    tsdf, esdf = _sphere_layers()
    path = os.path.join(tmp_path, "m.vxblx")
    layer_io.save_layer(tsdf, path)
    layer_io.save_layer(esdf, path, append=True)

    out_e = os.path.join(tmp_path, "esdf.ply")
    assert cli.main(["mesh", path, out_e, "--layer", "esdf"]) == 0
    assert os.path.getsize(out_e) > 1000

    out_h = os.path.join(tmp_path, "height.ply")
    assert cli.main(["mesh", path, out_h, "--color-mode", "height"]) == 0
    assert os.path.getsize(out_h) > 1000

    out_l = os.path.join(tmp_path, "lambert.ply")
    assert cli.main(
        ["mesh", path, out_l, "--layer", "esdf", "--color-mode", "lambert"]
    ) == 0
    assert os.path.getsize(out_l) > 1000

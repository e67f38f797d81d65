"""Behavioral coverage of the TsdfIntegratorConfig knobs
(reference tsdf_integrator.h:56-89 semantics)."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import grid, layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import tsdf

VOXEL = 0.1


def _one_ray_layer(cfg, point=(0.0, 0.0, 1.0), method="simple"):
    # Rays go along +z (the camera depth axis): the default 1/z^2 weight
    # (getVoxelWeight, cc:231-240) is zero for rays with z ~ 0.
    layer = vlayer.make_layer("tsdf", VOXEL, vps=8, max_blocks=256)
    pts = jnp.asarray([point], jnp.float32)
    cols = jnp.zeros((1, 3), jnp.float32)
    pose = (jnp.eye(3), jnp.zeros(3))
    state = tsdf.make_fast_state() if method == "fast" else None
    layer, _, _ = tsdf.integrate_pointcloud(
        layer, pose, pts, cols, cfg, method=method, state=state
    )
    return layer


def _voxel(layer, xyz, channel="tsdf"):
    gvi = grid.point_to_grid_index(jnp.asarray([xyz], jnp.float32), 1 / VOXEL)
    v, found = vlayer.get_voxels(layer, channel, gvi)
    return float(v[0]), bool(found[0])


def test_carving_toggle():
    base = TsdfIntegratorConfig(
        default_truncation_distance=0.2, max_ray_length_m=5.0
    )
    carved = _one_ray_layer(base)
    # Free-space voxel near the origin observed only when carving.
    w, found = _voxel(carved, (0.0, 0.0, 0.25), "weight")
    assert found and w > 0
    nocarve = _one_ray_layer(
        dataclasses.replace(base, voxel_carving_enabled=False)
    )
    w2, found2 = _voxel(nocarve, (0.0, 0.0, 0.25), "weight")
    assert (not found2) or w2 == 0.0
    # Near-surface voxel observed either way.
    w3, _ = _voxel(nocarve, (0.0, 0.0, 0.95), "weight")
    assert w3 > 0


def test_const_weight():
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=0.2, max_ray_length_m=5.0,
        use_const_weight=True, use_weight_dropoff=False,
    )
    layer = _one_ray_layer(cfg, point=(0.0, 0.0, 2.0))
    w, _ = _voxel(layer, (0.0, 0.0, 1.95), "weight")
    assert abs(w - 1.0) < 1e-5  # not 1/z^2
    cfg2 = dataclasses.replace(cfg, use_const_weight=False)
    layer2 = _one_ray_layer(cfg2, point=(0.0, 0.0, 2.0))
    w2, _ = _voxel(layer2, (0.0, 0.0, 1.95), "weight")
    assert abs(w2 - 0.25) < 1e-2  # 1/z^2 at the endpoint


def test_weight_dropoff_behind_surface():
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=0.3, max_ray_length_m=5.0,
        use_const_weight=True, use_weight_dropoff=True,
    )
    layer = _one_ray_layer(cfg, point=(0.0, 0.0, 1.0))
    w_front, _ = _voxel(layer, (0.0, 0.0, 0.85), "weight")
    w_behind, _ = _voxel(layer, (0.0, 0.0, 1.25), "weight")
    # Ramp: weight falls off behind the surface (sdf < -voxel).
    assert w_behind < 0.6 * w_front


def test_sparsity_compensation():
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=0.2, max_ray_length_m=5.0,
        use_const_weight=True, use_weight_dropoff=False,
        use_sparsity_compensation_factor=True,
        sparsity_compensation_factor=10.0,
    )
    layer = _one_ray_layer(cfg)
    w_band, _ = _voxel(layer, (0.0, 0.0, 0.95), "weight")  # |sdf|<trunc
    w_free, _ = _voxel(layer, (0.0, 0.0, 0.35), "weight")  # far free space
    assert w_band > 5.0 * w_free


def test_allow_clear_toggle():
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=0.2, max_ray_length_m=1.5,
        allow_clear=True, use_const_weight=True,
    )
    # Point beyond max range -> clearing ray carves up to max-trunc.
    layer = _one_ray_layer(cfg, point=(0.0, 0.0, 3.0))
    w, found = _voxel(layer, (0.0, 0.0, 0.55), "weight")
    assert found and w > 0
    cfg2 = dataclasses.replace(cfg, allow_clear=False)
    layer2 = _one_ray_layer(cfg2, point=(0.0, 0.0, 3.0))
    w2, found2 = _voxel(layer2, (0.0, 0.0, 0.55), "weight")
    assert (not found2) or w2 == 0.0


def test_anti_grazing_merged():
    # Two bundles: one ray ends at A, another passes near A toward B.
    # With anti-grazing, the passing bundle must not touch A's endpoint
    # voxel (tsdf_integrator.cc:415-422).
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=0.2, max_ray_length_m=5.0,
        use_const_weight=True, enable_anti_grazing=True,
        voxel_carving_enabled=True,
    )
    layer = vlayer.make_layer("tsdf", VOXEL, vps=8, max_blocks=256)
    pts = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]], jnp.float32)
    cols = jnp.zeros((2, 3), jnp.float32)
    pose = (jnp.eye(3), jnp.zeros(3))
    layer, _, _ = tsdf.integrate_pointcloud(
        layer, pose, pts, cols, cfg, method="merged"
    )
    # Endpoint voxel of ray A: updated only by its own bundle -> weight 1
    # (the second ray's pass-through contribution is suppressed).
    w, _ = _voxel(layer, (0.0, 0.0, 1.05), "weight")
    assert w <= 1.0 + 1e-4

    cfg2 = dataclasses.replace(cfg, enable_anti_grazing=False)
    layer2 = vlayer.make_layer("tsdf", VOXEL, vps=8, max_blocks=256)
    layer2, _, _ = tsdf.integrate_pointcloud(
        layer2, pose, pts, cols, cfg2, method="merged"
    )
    w2, _ = _voxel(layer2, (0.0, 0.0, 1.05), "weight")
    assert w2 > w + 0.5  # grazing ray also contributed

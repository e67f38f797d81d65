"""End-to-end TSDF integration vs analytic ground truth.

Port of the reference test methodology (voxblox test/test_sdf_integrators.cc):
a simulated world rendered from poses on a circle, integrated per scan,
evaluated against the analytic GT SDF — accuracy contract
``rmse < 2 * voxel_size`` and cross-integrator consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import tsdf
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import evaluation

VOXEL_SIZE = 0.10
TRUNC = 4 * VOXEL_SIZE


def _make_world():
    # Cylinder + ground, as in test_sdf_integrators.cc:18-108.
    w = sw.SimulationWorld()
    w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
    w.add_ground_level(0.0)
    w.min_bound = np.array([-5.0, -5.0, -0.5], np.float32)
    w.max_bound = np.array([5.0, 5.0, 5.5], np.float32)
    return w


def _poses(n=8, radius=4.0, height=2.0):
    """Poses on a circle looking at the center (cc:66-101)."""
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([radius * np.cos(a), radius * np.sin(a), height])
        fwd = np.array([-np.cos(a), -np.sin(a), 0.0])
        # Camera frame: +z forward, +x right, +y down.
        z = fwd / np.linalg.norm(fwd)
        x = np.cross(z, [0.0, 0.0, 1.0])
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], axis=1).astype(np.float32)
        out.append((jnp.asarray(R), jnp.asarray(pos, jnp.float32)))
    return out


def _render(objs, pose, res=(80, 60)):
    pts_G, colors, valid = sw.pointcloud_from_transform(
        objs, pose, res, np.deg2rad(60.0), max_dist=10.0
    )
    pts_C = sw.world_points_to_sensor(pose, pts_G, valid)
    return pts_C, colors


def _integrate_all(method, cfg=None, state=None):
    w = _make_world()
    objs = w.freeze()
    cfg = cfg or TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    layer = vlayer.make_layer("tsdf", VOXEL_SIZE, vps=16, max_blocks=2048)
    for pose in _poses():
        pts_C, colors = _render(objs, pose)
        layer, state, overflow = tsdf.integrate_pointcloud(
            layer, pose, pts_C, colors, cfg, method=method, state=state
        )
        assert not bool(overflow)
    return w, objs, layer


@pytest.mark.parametrize("method", ["simple", "merged", "fast"])
def test_integrator_accuracy_vs_gt(method):
    state = tsdf.make_fast_state() if method == "fast" else None
    w, objs, layer = _integrate_all(method, state=state)
    gt = sw.generate_gt_layer(
        objs, "tsdf", VOXEL_SIZE, w.min_bound, w.max_bound,
        max_dist=TRUNC, vps=16, max_blocks=4096,
    )
    # GT distances are clamped to +-trunc to compare truncated fields
    # (the reference compares within the truncation band the same way).
    det = evaluation.evaluate_layers_rmse(gt, layer,
                                          ignore_behind_test_surface=True)
    print(f"{method}: {det}")
    assert det.num_evaluated_voxels > 10000
    # Accuracy contract from test_sdf_integrators.cc:110-181.
    assert det.rmse < 2 * VOXEL_SIZE, f"{method} rmse {det.rmse}"
    assert det.max_error < 4 * TRUNC + 1e-6


def test_cross_integrator_consistency():
    # Simple and merged must observe nearly the same voxel set
    # (overlap within ~1%, cc:110-181) and agree closely on distances.
    _, _, simple_layer = _integrate_all("simple")
    _, _, merged_layer = _integrate_all("merged")
    n_simple = evaluation.count_observed(simple_layer)
    n_merged = evaluation.count_observed(merged_layer)
    assert abs(n_simple - n_merged) / n_simple < 0.05
    det = evaluation.evaluate_layers_rmse(simple_layer, merged_layer)
    assert det.rmse < VOXEL_SIZE


def test_fast_observes_most_voxels():
    _, _, simple_layer = _integrate_all("simple")
    state = tsdf.make_fast_state()
    _, _, fast_layer = _integrate_all("fast", state=state)
    n_simple = evaluation.count_observed(simple_layer)
    n_fast = evaluation.count_observed(fast_layer)
    # Fast subsamples rays; coverage must still be substantial.
    assert n_fast > 0.5 * n_simple
    det = evaluation.evaluate_layers_rmse(simple_layer, fast_layer)
    assert det.rmse < 2 * VOXEL_SIZE


def test_integration_is_deterministic():
    _, _, layer_a = _integrate_all("simple")
    _, _, layer_b = _integrate_all("simple")
    assert evaluation.is_same_layer(layer_a, layer_b, atol=0.0)

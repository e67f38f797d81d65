"""ICP: recover a small pose perturbation against a GT TSDF layer
(methodology of the reference ICP usage in tsdf_server.cc:254-299)."""

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core.config import IcpConfig
from voxblox_tpu.ops import icp as vicp
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import lie


def _scene():
    w = sw.SimulationWorld()
    w.add_cube((0.0, 0.0, 1.0), (1.5, 2.5, 2.0))
    w.add_sphere((2.0, -1.0, 1.0), 0.8)
    w.add_ground_level(0.0)
    objs = w.freeze()
    layer = sw.generate_gt_layer(
        objs, "tsdf", 0.08, (-4.0, -4.0, -0.4), (4.0, 4.0, 3.5),
        max_dist=0.5, vps=8, max_blocks=4096,
    )
    return objs, layer


def test_lie_roundtrip(rng):
    xi = jnp.asarray(rng.uniform(-0.5, 0.5, 6).astype(np.float32))
    R, t = lie.se3_exp(xi)
    back = lie.se3_log(R, t)
    np.testing.assert_allclose(np.asarray(back), np.asarray(xi), atol=1e-5)


def test_icp_recovers_yaw_translation():
    objs, layer = _scene()
    # True pose: camera at (-3, 0.5, 1) looking +x.
    R_true = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    t_true = jnp.asarray([-3.0, 0.5, 1.0])
    pts_G, _, valid = sw.pointcloud_from_transform(
        objs, (R_true, t_true), (64, 48), np.deg2rad(70.0), 8.0
    )
    pts_C = sw.world_points_to_sensor((R_true, t_true), pts_G, valid)

    # Perturb: 2 deg yaw + 5 cm translation.
    dyaw = np.deg2rad(2.0)
    Rz = jnp.asarray(
        [
            [np.cos(dyaw), -np.sin(dyaw), 0.0],
            [np.sin(dyaw), np.cos(dyaw), 0.0],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    R_bad = Rz @ R_true
    t_bad = t_true + jnp.asarray([0.05, -0.04, 0.03])

    cfg = IcpConfig(mini_batch_size=64,
                    inital_translation_weighting=10.0,
                    inital_rotation_weighting=10.0)
    res = vicp.run_icp(layer, pts_C, (R_bad, t_bad), cfg)
    assert int(res.num_updates) > 5
    t_err_before = float(jnp.linalg.norm(t_bad - t_true))
    t_err_after = float(jnp.linalg.norm(res.t - t_true))
    r_err_before = float(
        jnp.linalg.norm(lie.so3_log(R_bad @ R_true.T))
    )
    r_err_after = float(jnp.linalg.norm(lie.so3_log(res.R @ R_true.T)))
    assert t_err_after < 0.6 * t_err_before, (t_err_before, t_err_after)
    assert r_err_after < 0.7 * r_err_before, (r_err_before, r_err_after)
    # Convergence to tolerance: the refined pose must land within ~half a
    # voxel / half a degree of the truth, not merely improve.
    assert t_err_after < 0.045, t_err_after
    assert r_err_after < np.deg2rad(0.75), r_err_after


def test_icp_recovers_roll_pitch_when_enabled():
    """refine_roll_pitch=True (3-dof Kabsch) must reduce a roll/pitch
    perturbation that the default yaw-only mode cannot correct
    (reference getRotationFromMatchedPoints<3>, icp.h:139-173)."""
    objs, layer = _scene()
    R_true = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    t_true = jnp.asarray([-3.0, 0.5, 1.0])
    pts_G, _, valid = sw.pointcloud_from_transform(
        objs, (R_true, t_true), (64, 48), np.deg2rad(70.0), 8.0
    )
    pts_C = sw.world_points_to_sensor((R_true, t_true), pts_G, valid)

    # Perturb about a WORLD-horizontal axis (roll/pitch, no yaw).
    ang = np.deg2rad(2.0)
    Rx = jnp.asarray(
        [
            [1.0, 0.0, 0.0],
            [0.0, np.cos(ang), -np.sin(ang)],
            [0.0, np.sin(ang), np.cos(ang)],
        ],
        jnp.float32,
    )
    R_bad = Rx @ R_true
    t_bad = t_true + jnp.asarray([0.02, -0.03, 0.04])

    cfg = IcpConfig(mini_batch_size=64, refine_roll_pitch=True,
                    inital_translation_weighting=10.0,
                    inital_rotation_weighting=10.0)
    res = vicp.run_icp(layer, pts_C, (R_bad, t_bad), cfg)
    r_err_before = float(jnp.linalg.norm(lie.so3_log(R_bad @ R_true.T)))
    r_err_after = float(jnp.linalg.norm(lie.so3_log(res.R @ R_true.T)))
    assert r_err_after < 0.6 * r_err_before, (r_err_before, r_err_after)

    # Yaw-only mode must leave the roll/pitch component uncorrected.
    cfg_yaw = IcpConfig(mini_batch_size=64, refine_roll_pitch=False,
                        inital_translation_weighting=10.0,
                        inital_rotation_weighting=10.0)
    res_yaw = vicp.run_icp(layer, pts_C, (R_bad, t_bad), cfg_yaw)
    rp_after = float(jnp.linalg.norm(lie.so3_log(res_yaw.R @ R_true.T)[:2]))
    rp_before = float(jnp.linalg.norm(lie.so3_log(R_bad @ R_true.T)[:2]))
    assert rp_after > 0.5 * rp_before, (rp_before, rp_after)


def test_icp_information_weighting_dampens_updates():
    """The information-vector blend (icp.cc:186-215): a huge initial
    prior information must hold the pose ~fixed while a weak prior lets
    the same matches correct it — the regression for the w = est_info /
    (base_info + est_info) weighting."""
    objs, layer = _scene()
    R_true = jnp.asarray([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    t_true = jnp.asarray([-3.0, 0.5, 1.0])
    pts_G, _, valid = sw.pointcloud_from_transform(
        objs, (R_true, t_true), (64, 48), np.deg2rad(70.0), 8.0
    )
    pts_C = sw.world_points_to_sensor((R_true, t_true), pts_G, valid)
    t_bad = t_true + jnp.asarray([0.06, -0.05, 0.04])

    def err(weighting):
        cfg = IcpConfig(mini_batch_size=64,
                        inital_translation_weighting=weighting,
                        inital_rotation_weighting=weighting)
        res = vicp.run_icp(layer, pts_C, (R_true, t_bad), cfg)
        return float(jnp.linalg.norm(res.t - t_true))

    e0 = float(jnp.linalg.norm(t_bad - t_true))
    e_weak = err(10.0)
    e_strong = err(1e7)
    assert e_weak < 0.7 * e0, (e0, e_weak)
    # A (near-)infinite prior keeps the pose essentially unmoved.
    assert e_strong > 0.9 * e0, (e0, e_strong)
    # And the damping is monotone in the prior strength.
    assert e_weak < e_strong, (e_weak, e_strong)

"""Dataset pipeline: TUM trajectory lookup, depth->cloud, end-to-end run."""

import os

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core.config import MapConfig, TsdfIntegratorConfig
from voxblox_tpu.server import TsdfServer
from voxblox_tpu.server import dataset as vdataset
from voxblox_tpu.sim import world as sw


def test_tum_trajectory_lookup(tmp_path):
    path = os.path.join(tmp_path, "poses.txt")
    with open(path, "w") as f:
        f.write("# ts tx ty tz qx qy qz qw\n")
        f.write("0.0 0 0 0  0 0 0 1\n")
        f.write("1.0 1 0 0  0 0 0 1\n")
        f.write("2.0 1 1 0  0 0 0.7071068 0.7071068\n")
    tr = vdataset.TumTrajectory.load(path)
    R, t = tr.lookup(0.5)
    np.testing.assert_allclose(t, [0.5, 0, 0], atol=1e-6)
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)
    # Quaternion endpoint: 90 deg about z.
    R2, t2 = tr.lookup(2.0)
    np.testing.assert_allclose(R2 @ [1, 0, 0], [0, 1, 0], atol=1e-5)
    # Outside tolerance.
    assert tr.lookup(5.0) is None
    # Static extrinsic.
    tr.T_B_C = (np.eye(3), np.array([0.0, 0.0, 0.1]))
    _, t3 = tr.lookup(0.0)
    np.testing.assert_allclose(t3, [0, 0, 0.1], atol=1e-6)


def test_depth_image_to_pointcloud():
    depth = np.full((4, 6), 2.0, np.float32)
    depth[0, 0] = np.nan
    intr = (10.0, 10.0, 3.0, 2.0)
    pts, cols = vdataset.depth_image_to_pointcloud(depth, intr)
    assert pts.shape == (24, 3)
    # Center pixel (u=3, v=2) -> straight ahead.
    np.testing.assert_allclose(pts[2 * 6 + 3], [0, 0, 2.0], atol=1e-6)
    # NaN depth -> zero point.
    np.testing.assert_allclose(pts[0], [0, 0, 0])


def test_run_dataset_end_to_end(tmp_path):
    """Synthetic RGB-D folder + TUM poses -> TsdfServer map."""
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 2.0), 1.0)
    objs = w.freeze()
    res = (32, 24)
    fov = np.deg2rad(60.0)
    fx = res[0] / (2 * np.tan(fov / 2))
    intr = (fx, fx, res[0] / 2.0, res[1] / 2.0)

    root = os.path.join(tmp_path, "frames")
    os.makedirs(root)
    pose_lines = []
    for i, ang in enumerate([0.0, 0.5]):
        origin = np.array(
            [4 * np.sin(ang), -4 * np.cos(ang), 2.0], np.float32
        )
        view = -origin + [0, 0, 2.0]
        view = view / np.linalg.norm(view)
        R = np.asarray(
            sw.rotation_from_two_vectors(
                jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray(view, jnp.float32)
            )
        )
        pts_G, colors, valid = sw.pointcloud_from_viewpoint(
            objs, jnp.asarray(origin), jnp.asarray(view), res, fov, 8.0
        )
        pts_C = np.asarray(
            sw.world_points_to_sensor((jnp.asarray(R), jnp.asarray(origin)),
                                      pts_G, valid)
        )
        # render order is u-major ([W,H] flattened); rebuild [H,W] depth.
        depth = pts_C[:, 2].reshape(res[0], res[1]).T
        np.save(os.path.join(root, f"{float(i):.1f}.npy"), depth)
        q = _rot_to_quat(R)
        pose_lines.append(
            f"{float(i):.1f} {origin[0]} {origin[1]} {origin[2]} "
            f"{q[0]} {q[1]} {q[2]} {q[3]}"
        )
    with open(os.path.join(tmp_path, "poses.txt"), "w") as f:
        f.write("\n".join(pose_lines))

    tr = vdataset.TumTrajectory.load(os.path.join(tmp_path, "poses.txt"))
    ds = vdataset.DepthFolderDataset(root, intr)
    srv = TsdfServer(
        map_config=MapConfig(voxel_size=0.2, max_blocks=512),
        integrator_config=TsdfIntegratorConfig(
            default_truncation_distance=0.8, max_ray_length_m=8.0
        ),
        method="simple",
    )
    stats = vdataset.run_dataset(srv, ds, tr)
    assert stats["integrated"] == 2
    assert int(srv.layer.num_blocks) > 5


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return (x, y, z, w)

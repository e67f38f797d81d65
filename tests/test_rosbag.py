"""ROS1 bag interop: codec round-trips + end-to-end replay.

The reference consumes its datasets (cow-and-lady etc.) as rosbags of
PointCloud2 + a transform topic (cow_and_lady_dataset.launch:9-14);
io/rosbag.py replays the same structure without ROS.
"""

import os

import numpy as np
import pytest

from voxblox_tpu.core.config import MapConfig, TsdfIntegratorConfig
from voxblox_tpu.io import rosbag
from voxblox_tpu.server.mapper import TsdfServer
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import evaluation

VOXEL = 0.1
FOV = float(np.deg2rad(60.0))
RES = (80, 60)


def _rot_to_quat(R):
    """R[3,3] -> [x,y,z,w]."""
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = np.sqrt(max(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2
    y = np.sqrt(max(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2
    z = np.sqrt(max(0.0, 1 - R[0, 0] - R[1, 1] + R[2, 2])) / 2
    x = np.copysign(x, R[2, 1] - R[1, 2])
    y = np.copysign(y, R[0, 2] - R[2, 0])
    z = np.copysign(z, R[1, 0] - R[0, 1])
    return np.array([x, y, z, w])


def test_pointcloud2_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    cols = rng.integers(0, 256, (100, 3)).astype(np.float32)
    raw = rosbag.encode_pointcloud2(pts, cols, stamp_sec=12.25,
                                    frame_id="cam")
    d = rosbag.decode_pointcloud2(raw)
    assert d["frame_id"] == "cam"
    assert abs(d["stamp"] - 12.25) < 1e-6
    np.testing.assert_array_equal(d["points"], pts)
    np.testing.assert_array_equal(d["colors"], cols)


def test_pointcloud2_padded_rows_and_endianness():
    """Organized clouds with row_step > width*point_step (padded rows)
    must decode by slicing per row; big-endian data must raise."""
    import struct

    rng = np.random.default_rng(1)
    h, w = 3, 5
    pts = rng.normal(size=(h * w, 3)).astype(np.float32)
    point_step, pad = 12, 20
    row_step = w * point_step + pad

    def build(is_bigendian):
        out = rosbag._pack_header(1.0, "cam")
        out += struct.pack("<II", h, w)
        out += struct.pack("<I", 3)
        for name, off in (("x", 0), ("y", 4), ("z", 8)):
            out += rosbag._pack_string(name) + struct.pack("<IBI", off, 7, 1)
        out += struct.pack("<BII", is_bigendian, point_step, row_step)
        rows = pts.reshape(h, w * 3).view(np.uint8)
        data = np.zeros((h, row_step), np.uint8)
        data[:, : w * point_step] = rows
        flat = data.reshape(-1)
        out += struct.pack("<I", len(flat)) + flat.tobytes()
        out += struct.pack("<B", 1)
        return out

    d = rosbag.decode_pointcloud2(build(0))
    np.testing.assert_array_equal(d["points"], pts)
    with pytest.raises(ValueError, match="big-endian"):
        rosbag.decode_pointcloud2(build(1))


def test_transform_and_tf_roundtrip():
    t = np.array([1.0, -2.0, 0.5])
    q = np.array([0.1, 0.2, 0.3, 0.926])
    raw = rosbag.encode_transform_stamped(3.5, "world", "kinect", t, q)
    d, _ = rosbag.decode_transform_stamped(raw)
    assert d["frame_id"] == "world" and d["child_frame_id"] == "kinect"
    np.testing.assert_allclose(d["translation"], t)
    np.testing.assert_allclose(d["quaternion"], q)

    raw = rosbag.encode_tf_message(
        [(1.0, "world", "a", t, q), (2.0, "world", "b", -t, q)]
    )
    out = rosbag.decode_tf_message(raw)
    assert [d["child_frame_id"] for d in out] == ["a", "b"]
    np.testing.assert_allclose(out[1]["translation"], -t)


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_write_read(tmp_path, compression):
    pts = np.zeros((10, 3), np.float32)
    msgs = [
        ("/tf_static", "geometry_msgs/TransformStamped", 0.5,
         rosbag.encode_transform_stamped(0.5, "w", "c", [0, 0, 0],
                                         [0, 0, 0, 1])),
        ("/cloud", "sensor_msgs/PointCloud2", 1.0,
         rosbag.encode_pointcloud2(pts, stamp_sec=1.0)),
        ("/cloud", "sensor_msgs/PointCloud2", 2.0,
         rosbag.encode_pointcloud2(pts + 1, stamp_sec=2.0)),
    ]
    path = os.path.join(tmp_path, f"t_{compression}.bag")
    rosbag.write_bag(path, msgs, compression=compression)
    got = list(rosbag.read_messages(path))
    assert [(g[0], g[1]) for g in got] == [(m[0], m[1]) for m in msgs]
    assert [round(g[2], 6) for g in got] == [0.5, 1.0, 2.0]
    clouds = list(rosbag.read_messages(path, ["/cloud"]))
    assert len(clouds) == 2
    d = rosbag.decode_pointcloud2(clouds[1][3])
    np.testing.assert_array_equal(d["points"], pts + 1)


def _make_bag(tmp_path):
    """Synthetic cow-and-lady-shaped bag: PointCloud2 scans in the camera
    frame + TransformStamped world poses."""
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 1.0), 0.8, color=(200, 40, 40))
    w.add_ground_level(-0.5)
    w.min_bound = np.array([-2.0, -2.0, -0.6], np.float32)
    w.max_bound = np.array([2.0, 2.0, 2.5], np.float32)
    objs = w.freeze()
    msgs = []
    poses = []
    import jax.numpy as jnp

    for i in range(4):
        a = 2 * np.pi * i / 4
        pos = np.array([2.5 * np.cos(a), 2.5 * np.sin(a), 1.0], np.float32)
        z = -np.array([np.cos(a), np.sin(a), 0.0])
        x = np.cross(z, [0, 0, 1.0])
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1).astype(np.float32)
        stamp = 10.0 + i
        pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(
            objs, (jnp.asarray(R), jnp.asarray(pos)), RES, FOV, 8.0
        )
        msgs.append((
            "/camera/depth_registered/points", "sensor_msgs/PointCloud2",
            stamp,
            rosbag.encode_pointcloud2(
                np.asarray(pts_C).reshape(-1, 3),
                np.asarray(colors).reshape(-1, 3),
                stamp_sec=stamp, frame_id="camera",
            ),
        ))
        msgs.append((
            "/kinect/vrpn_client/estimated_transform",
            "geometry_msgs/TransformStamped", stamp,
            rosbag.encode_transform_stamped(
                stamp, "world", "kinect", pos, _rot_to_quat(R)
            ),
        ))
        poses.append((R, pos))
    path = os.path.join(tmp_path, "cow.bag")
    rosbag.write_bag(path, msgs, compression="bz2")
    return w, objs, path, poses


def test_committed_bag_fixture_replay():
    """Replay the COMMITTED binary fixture (tests/data/cow_fixture.bag —
    real rosbag layout: indexed, multi-chunk, bz2, genuine md5sums;
    regenerate with scripts/make_bag_fixture.py) end-to-end and check
    the rebuilt TSDF against ground truth regenerated from the same
    world spec. Guards the bag/message codecs against drift with fixed
    bytes, the way a real cow-and-lady bag would
    (cow_and_lady_dataset.launch:9-14)."""
    import struct
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bag_path = os.path.join(repo, "tests", "data", "cow_fixture.bag")
    sys.path.insert(0, os.path.join(repo, "scripts"))
    import make_bag_fixture as fx

    # Structural checks: indexed header, several chunks, real md5sums.
    with open(bag_path, "rb") as f:
        assert f.readline() == rosbag.MAGIC
        buf = f.read()
    fields = rosbag._decode_fields(
        buf[4:4 + struct.unpack_from("<I", buf, 0)[0]]
    )
    assert struct.unpack("<Q", fields["index_pos"])[0] > 0
    assert struct.unpack("<I", fields["chunk_count"])[0] > 1

    msgs = list(rosbag.read_messages(bag_path))
    assert len(msgs) == 2 * fx.N_POSES

    srv = TsdfServer(
        MapConfig(voxel_size=VOXEL, voxels_per_side=16, max_blocks=1024),
        integrator_config=TsdfIntegratorConfig(
            default_truncation_distance=4 * VOXEL, max_ray_length_m=8.0
        ),
        method="projective",
        projective_resolution=(fx.RES[0] // 2, fx.RES[1] // 2),
        projective_fov_deg=fx.FOV_DEG,
    )
    stats = rosbag.run_rosbag(
        srv, bag_path,
        pointcloud_topic="/camera/depth_registered/points",
        pose_topic="/kinect/vrpn_client/estimated_transform",
    )
    assert stats["integrated"] == fx.N_POSES

    w = fx.world_spec()
    gt = sw.generate_gt_layer(
        w.freeze(), "tsdf", VOXEL, w.min_bound, w.max_bound,
        max_dist=4 * VOXEL, vps=16, max_blocks=2048,
    )
    det = evaluation.evaluate_layers_rmse(gt, srv.layer,
                                          ignore_behind_test_surface=True)
    assert det.num_evaluated_voxels > 2000
    assert det.rmse < 2 * VOXEL, str(det)


def test_rosbag_replay_end_to_end(tmp_path):
    w, objs, path, poses = _make_bag(tmp_path)
    srv = TsdfServer(
        MapConfig(voxel_size=VOXEL, voxels_per_side=16, max_blocks=1024),
        integrator_config=TsdfIntegratorConfig(
            default_truncation_distance=4 * VOXEL, max_ray_length_m=8.0
        ),
        method="projective",
        projective_resolution=(RES[0] // 2, RES[1] // 2),
        projective_fov_deg=float(np.rad2deg(FOV)),
    )
    stats = rosbag.run_rosbag(
        srv, path,
        pointcloud_topic="/camera/depth_registered/points",
        pose_topic="/kinect/vrpn_client/estimated_transform",
    )
    assert stats["integrated"] == 4
    gt = sw.generate_gt_layer(
        objs, "tsdf", VOXEL, w.min_bound, w.max_bound, max_dist=4 * VOXEL,
        vps=16, max_blocks=2048,
    )
    det = evaluation.evaluate_layers_rmse(gt, srv.layer,
                                          ignore_behind_test_surface=True)
    print("rosbag replay vs gt:", det)
    assert det.num_evaluated_voxels > 3000
    assert det.rmse < 2 * VOXEL, str(det)

"""Regenerate tests/data/cow_fixture.bag (committed binary fixture).

A small cow-and-lady-shaped dataset in the REAL rosbag file layout
(indexed, multi-chunk, bz2, genuine md5sums): PointCloud2 scans on the
kinect topic + TransformStamped poses on the vrpn topic, exactly the
structure voxblox_ros/launch/cow_and_lady_dataset.launch:9-14 consumes.
Deterministic: same script -> byte-identical bag (fixed seed, fixed
float math on CPU).

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/make_bag_fixture.py
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

OUT = os.path.join(_REPO, "tests", "data", "cow_fixture.bag")

RES = (48, 36)
FOV_DEG = 60.0
N_POSES = 5


def world_spec():
    """The fixture scene — kept in one place so the replay test can
    rebuild the identical ground truth without reading the bag."""
    from voxblox_tpu.sim import world as sw

    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 1.0), 0.8, color=(200, 40, 40))
    w.add_cylinder((1.2, -0.8, 0.75), 0.3, 1.5, color=(40, 160, 220))
    w.add_ground_level(-0.5)
    w.min_bound = np.array([-2.0, -2.0, -0.6], np.float32)
    w.max_bound = np.array([2.5, 2.0, 2.5], np.float32)
    return w


def fixture_poses():
    poses = []
    for i in range(N_POSES):
        a = 2 * np.pi * i / N_POSES
        pos = np.array([2.6 * np.cos(a), 2.6 * np.sin(a), 1.0], np.float32)
        z = -np.array([np.cos(a), np.sin(a), 0.0])
        x = np.cross(z, [0.0, 0.0, 1.0])
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1).astype(np.float32)
        poses.append((R, pos, 10.0 + i))
    return poses


def rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = np.sqrt(max(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2
    y = np.sqrt(max(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2
    z = np.sqrt(max(0.0, 1 - R[0, 0] - R[1, 1] + R[2, 2])) / 2
    x = np.copysign(x, R[2, 1] - R[1, 2])
    y = np.copysign(y, R[0, 2] - R[2, 0])
    z = np.copysign(z, R[1, 0] - R[0, 1])
    return np.array([x, y, z, w])


def main():
    import jax.numpy as jnp

    from voxblox_tpu.io import rosbag
    from voxblox_tpu.sim import world as sw

    w = world_spec()
    objs = w.freeze()
    fov = float(np.deg2rad(FOV_DEG))
    msgs = []
    for R, pos, stamp in fixture_poses():
        pts_C, colors, valid, _ = sw.organized_pointcloud_from_transform(
            objs, (jnp.asarray(R), jnp.asarray(pos)), RES, fov, 8.0
        )
        msgs.append((
            "/camera/depth_registered/points", "sensor_msgs/PointCloud2",
            stamp,
            rosbag.encode_pointcloud2(
                np.asarray(pts_C).reshape(-1, 3),
                np.asarray(colors).reshape(-1, 3),
                stamp_sec=stamp, frame_id="camera_rgb_optical_frame",
            ),
        ))
        msgs.append((
            "/kinect/vrpn_client/estimated_transform",
            "geometry_msgs/TransformStamped", stamp,
            rosbag.encode_transform_stamped(
                stamp, "world", "kinect", pos, rot_to_quat(R)
            ),
        ))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    # Small chunk threshold -> several chunks, like a real recording.
    rosbag.write_bag(OUT, msgs, compression="bz2", indexed=True,
                     chunk_threshold=48 * 1024)
    print(f"wrote {OUT}: {os.path.getsize(OUT)} bytes, "
          f"{len(msgs)} messages")


if __name__ == "__main__":
    main()

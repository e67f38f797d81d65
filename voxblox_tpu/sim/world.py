"""Simulation world: synthetic depth cameras + ground-truth SDF layers.

jnp re-derivation of the reference SimulationWorld
(voxblox simulation/simulation_world.{h,cc,_inl.h}):

- pinhole depth camera render by per-pixel analytic ray cast over all
  objects (simulation_world.cc:61-117), same pixel convention
  (u in [-W/2, W/2), dir = normalize(1, u/f, v/f) rotated so +x is the view
  direction; focal = W / (2 tan(fov/2)));
- optional Gaussian *range* noise (cc:119-180);
- ground-truth SDF layer generation: min distance over objects at every
  voxel center within bounds, clamped below by -max_dist
  (simulation_world_inl.h:13-70) with TSDF weight 1 / ESDF observed.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from . import objects as sim_objects
from .objects import ObjectSet, make_object_set


@dataclasses.dataclass
class SimulationWorld:
    """Host-side object list; call .freeze() to get the device ObjectSet."""

    objects: List[dict] = dataclasses.field(default_factory=list)
    min_bound: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([-5.0, -5.0, -1.0], np.float32)
    )
    max_bound: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array([5.0, 5.0, 9.0], np.float32)
    )

    def add_sphere(self, center, radius, color=(255, 255, 255)):
        self.objects.append(
            dict(kind=sim_objects.SPHERE, center=center, params=(radius, 0, 0),
                 color=color)
        )

    def add_cube(self, center, size, color=(255, 255, 255)):
        self.objects.append(
            dict(kind=sim_objects.CUBE, center=center, params=size, color=color)
        )

    def add_plane(self, center, normal, color=(255, 255, 255)):
        n = np.asarray(normal, np.float64)
        n = n / np.linalg.norm(n)
        self.objects.append(
            dict(kind=sim_objects.PLANE, center=center, params=tuple(n),
                 color=color)
        )

    def add_cylinder(self, center, radius, height, color=(255, 255, 255)):
        self.objects.append(
            dict(kind=sim_objects.CYLINDER, center=center,
                 params=(radius, height, 0), color=color)
        )

    def add_ground_level(self, height, color=(127, 127, 127)):
        """simulation_world.cc:30-33."""
        self.add_plane((0.0, 0.0, height), (0.0, 0.0, 1.0), color)

    def add_plane_boundaries(self, x_min, x_max, y_min, y_max):
        """simulation_world.cc:35-48: 4 inward-facing walls."""
        self.add_plane((x_min, 0.0, 0.0), (1.0, 0.0, 0.0))
        self.add_plane((x_max, 0.0, 0.0), (-1.0, 0.0, 0.0))
        self.add_plane((0.0, y_min, 0.0), (0.0, 1.0, 0.0))
        self.add_plane((0.0, y_max, 0.0), (0.0, -1.0, 0.0))

    def freeze(self) -> ObjectSet:
        return make_object_set(self.objects)


# ---------------------------------------------------------------------------
# Distance queries
# ---------------------------------------------------------------------------


def distance_to_point(objects: ObjectSet, points, max_dist):
    """Min distance over objects, capped at max_dist (cc's
    getDistanceToPoint). Returns (distance, color-of-nearest)."""
    d = sim_objects.object_distances(objects, points)  # [..., N]
    dmin = jnp.min(d, axis=-1)
    arg = jnp.argmin(d, axis=-1)
    color = objects.color[arg]
    return jnp.minimum(dmin, max_dist), color


# ---------------------------------------------------------------------------
# Camera
# ---------------------------------------------------------------------------


def rotation_from_two_vectors(a, b):
    """Rotation matrix taking unit vector a to unit vector b
    (Eigen::Quaternion::FromTwoVectors semantics)."""
    a = a / jnp.linalg.norm(a)
    b = b / jnp.linalg.norm(b)
    v = jnp.cross(a, b)
    c = jnp.dot(a, b)
    # Rodrigues with graceful antiparallel handling: pick any orthogonal
    # axis when c ~ -1.
    ortho = jnp.where(
        jnp.abs(a[0]) < 0.9,
        jnp.asarray([1.0, 0.0, 0.0]),
        jnp.asarray([0.0, 1.0, 0.0]),
    )
    anti_axis = jnp.cross(a, ortho)
    anti_axis = anti_axis / jnp.linalg.norm(anti_axis)
    vx = jnp.asarray(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )
    k = 1.0 / jnp.maximum(1.0 + c, 1e-8)
    R = jnp.eye(3) + vx + vx @ vx * k
    # Antiparallel: 180 deg rotation about anti_axis.
    ax = anti_axis
    aaT = jnp.outer(ax, ax)
    R_anti = 2.0 * aaT - jnp.eye(3)
    return jnp.where(c < -1.0 + 1e-6, R_anti, R)


def camera_rays(camera_res, fov_h_rad):
    """Pixel ray directions in the nominal (+x forward) camera frame.

    Matches the reference pixel loop exactly: u in [-W/2, W/2),
    v in [-H/2, H/2), dir = normalize(1, u/f, v/f)
    (simulation_world.cc:66-85). Returns f32[W*H, 3].
    """
    w, h = camera_res
    focal = w / (2.0 * np.tan(fov_h_rad / 2.0))
    u = jnp.arange(-(w // 2), w // 2, dtype=jnp.float32)
    v = jnp.arange(-(h // 2), h // 2, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v, indexing="ij")  # u-major like the C++ loop
    dirs = jnp.stack(
        [jnp.ones_like(uu), uu / focal, vv / focal], axis=-1
    ).reshape(-1, 3)
    return dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)


def pointcloud_from_viewpoint(
    objects: ObjectSet,
    view_origin,
    view_direction,
    camera_res,
    fov_h_rad,
    max_dist,
    noise_sigma: float = 0.0,
    noise_key=None,
):
    """Render a synthetic scan. Returns (points_G [P,3], colors [P,3],
    valid [P]) with P = W*H static; invalid pixels carry point = origin.

    Noise (if any) perturbs range only, not bearing (cc:119-180).
    """
    dirs_cam = camera_rays(camera_res, fov_h_rad)
    R = rotation_from_two_vectors(
        jnp.asarray([1.0, 0.0, 0.0]), jnp.asarray(view_direction, jnp.float32)
    )
    dirs = dirs_cam @ R.T
    origin = jnp.asarray(view_origin, jnp.float32)
    t = sim_objects.object_ray_intersections(
        objects, jnp.broadcast_to(origin, dirs.shape), dirs
    )  # [P, N]
    tmin = jnp.min(t, axis=-1)
    arg = jnp.argmin(t, axis=-1)
    valid = jnp.isfinite(tmin) & (tmin <= max_dist)
    if noise_sigma > 0.0 and noise_key is not None:
        tmin = tmin + noise_sigma * jax.random.normal(noise_key, tmin.shape)
    tmin = jnp.where(valid, tmin, 0.0)
    points = origin + dirs * tmin[:, None]
    colors = objects.color[arg]
    return points, colors, valid


def pointcloud_from_transform(objects, T_G_C, camera_res, fov_h_rad, max_dist,
                              **kw):
    """Reference getPointcloudFromTransform: view dir = R_G_C @ +z
    (simulation_world.cc:50-59), origin = translation. Returns world-frame
    points; use ``world_points_to_sensor`` for integrator input."""
    R, tr = T_G_C
    view_dir = R @ jnp.asarray([0.0, 0.0, 1.0])
    return pointcloud_from_viewpoint(
        objects, tr, view_dir, camera_res, fov_h_rad, max_dist, **kw
    )


def organized_pointcloud_from_transform(
    objects: ObjectSet,
    T_G_C,
    camera_res,
    fov_h_rad,
    max_dist,
    noise_sigma: float = 0.0,
    noise_key=None,
):
    """Render an ORGANIZED scan: raster-ordered sensor-frame points.

    Real depth cameras deliver organized clouds (PCL organized point
    clouds from the Kinect — exactly what the reference's cow-and-lady
    pipeline subscribes to); this renders the same structure: pixel
    (row v, col u) of the returned [H, W, 3] array satisfies
    ``u == round(x/z * fx + cx)`` for the returned intrinsics, with +z
    forward in the frame of ``T_G_C = (R, t)``.

    Returns (points_C f32[H,W,3] (0 where invalid), colors f32[H,W,3],
    valid bool[H,W], intrinsics (fx, fy, cx, cy)).
    """
    w, h = camera_res
    focal = w / (2.0 * np.tan(fov_h_rad / 2.0))
    cx, cy = w / 2.0, h / 2.0
    u = jnp.arange(w, dtype=jnp.float32) - cx
    v = jnp.arange(h, dtype=jnp.float32) - cy
    vv, uu = jnp.meshgrid(v, u, indexing="ij")  # [h, w] row-major raster
    dirs_C = jnp.stack(
        [uu / focal, vv / focal, jnp.ones_like(uu)], axis=-1
    ).reshape(-1, 3)
    dirs_C = dirs_C / jnp.linalg.norm(dirs_C, axis=-1, keepdims=True)
    R, tr = T_G_C
    dirs_G = dirs_C @ R.T
    origin = jnp.asarray(tr, jnp.float32)
    t = sim_objects.object_ray_intersections(
        objects, jnp.broadcast_to(origin, dirs_G.shape), dirs_G
    )
    tmin = jnp.min(t, axis=-1)
    arg = jnp.argmin(t, axis=-1)
    valid = jnp.isfinite(tmin) & (tmin <= max_dist)
    if noise_sigma > 0.0 and noise_key is not None:
        tmin = tmin + noise_sigma * jax.random.normal(noise_key, tmin.shape)
    tmin = jnp.where(valid, tmin, 0.0)
    points_C = dirs_C * tmin[:, None]
    colors = objects.color[arg]
    return (
        points_C.reshape(h, w, 3),
        colors.reshape(h, w, 3),
        valid.reshape(h, w),
        (focal, focal, cx, cy),
    )


def spherical_pointcloud_from_transform(
    objects: ObjectSet,
    T_G_C,
    resolution,
    fov_up_deg: float,
    fov_down_deg: float,
    max_dist,
    noise_sigma: float = 0.0,
    noise_key=None,
):
    """Render a velodyne-style spinning-lidar scan.

    ``resolution`` = (W azimuth bins, H beams). Beam (v, u) points along
    azimuth -pi + (u+0.5)*2pi/W and elevation fov_down + (v+0.5)*delta in
    the sensor frame (+x forward, +z up) — the exact bin centers of
    ``ops.projective.build_spherical_range_image``. Returns
    (points_C f32[W*H, 3] (0 where no return), colors, valid).
    """
    w, h = resolution
    el0 = np.deg2rad(fov_down_deg)
    el1 = np.deg2rad(fov_up_deg)
    az = -np.pi + (jnp.arange(w, dtype=jnp.float32) + 0.5) * (2 * np.pi / w)
    el = el0 + (jnp.arange(h, dtype=jnp.float32) + 0.5) * ((el1 - el0) / h)
    aa, ee = jnp.meshgrid(az, el, indexing="xy")
    dirs_C = jnp.stack(
        [jnp.cos(ee) * jnp.cos(aa), jnp.cos(ee) * jnp.sin(aa), jnp.sin(ee)],
        axis=-1,
    ).reshape(-1, 3)
    R, tr = T_G_C
    dirs_G = dirs_C @ R.T
    origin = jnp.asarray(tr, jnp.float32)
    t = sim_objects.object_ray_intersections(
        objects, jnp.broadcast_to(origin, dirs_G.shape), dirs_G
    )
    tmin = jnp.min(t, axis=-1)
    arg = jnp.argmin(t, axis=-1)
    valid = jnp.isfinite(tmin) & (tmin <= max_dist)
    if noise_sigma > 0.0 and noise_key is not None:
        tmin = tmin + noise_sigma * jax.random.normal(noise_key, tmin.shape)
    tmin = jnp.where(valid, tmin, 0.0)
    points_C = dirs_C * tmin[:, None]
    colors = objects.color[arg]
    return points_C, colors, valid


def world_points_to_sensor(T_G_C, points_G, valid):
    """Inverse-transform world points into the sensor frame; invalid lanes
    get a zero point (rejected by min_ray_length)."""
    R, t = T_G_C
    p = (points_G - t) @ R
    return jnp.where(valid[:, None], p, 0.0)


# ---------------------------------------------------------------------------
# Ground-truth SDF layers
# ---------------------------------------------------------------------------


def generate_gt_layer(
    objects: ObjectSet,
    layer_type: str,
    voxel_size: float,
    min_bound,
    max_bound,
    max_dist: float,
    vps: int = 16,
    max_blocks: int = 8192,
) -> vlayer.VoxelLayer:
    """Build a dense GT layer over [min_bound, max_bound]
    (simulation_world_inl.h:13-70): every voxel center within bounds gets
    distance = max(min over objects, -max_dist); TSDF weight = 1,
    ESDF observed = true. Bounds respected to voxel granularity."""
    block_size = voxel_size * vps
    min_b = np.asarray(min_bound, np.float64) - block_size / 2.0
    max_b = np.asarray(max_bound, np.float64) + block_size / 2.0
    lo = np.floor(min_b / block_size).astype(np.int64)
    hi = np.floor(max_b / block_size).astype(np.int64)
    bx, by, bz = [np.arange(lo[i], hi[i] + 1) for i in range(3)]
    blocks = np.stack(np.meshgrid(bx, by, bz, indexing="ij"), -1).reshape(-1, 3)
    n = len(blocks)
    assert n <= max_blocks, f"GT world needs {n} blocks > pool {max_blocks}"

    layer = vlayer.make_layer(
        layer_type, voxel_size, vps=vps, max_blocks=max_blocks
    )
    layer, overflow = vlayer.allocate_blocks(
        layer, jnp.asarray(blocks, jnp.int32), jnp.ones(n, bool)
    )
    assert not bool(overflow)

    # Evaluate SDF at every voxel center of every active block.
    slots = np.asarray(vlayer.lookup_blocks(layer, jnp.asarray(blocks, jnp.int32)))
    lin = jnp.arange(vps**3)
    local = grid.linear_to_local(lin, vps)  # [V,3]

    @jax.jit
    def eval_block(block_ijk):
        gvi = block_ijk[None, :] * vps + local
        centers = grid.grid_index_to_center_point(gvi, voxel_size)
        d, color = distance_to_point(objects, centers, max_dist)
        d = jnp.maximum(d, -max_dist)
        in_bounds = jnp.all(
            (centers >= jnp.asarray(min_bound, jnp.float32))
            & (centers <= jnp.asarray(max_bound, jnp.float32)),
            axis=-1,
        )
        return d, color, in_bounds

    d, color, in_bounds = jax.vmap(eval_block)(jnp.asarray(blocks, jnp.int32))
    vpb = vps**3
    shape = (layer.max_blocks, vps, vps, vps)

    def fill(channel, vals, fill_default=0.0):
        flat = channel.reshape(layer.max_blocks, vpb)
        flat = flat.at[jnp.asarray(slots)].set(vals)
        return flat.reshape(channel.shape)

    ch = dict(layer.channels)
    if layer_type == "tsdf":
        ch["tsdf"] = fill(ch["tsdf"], jnp.where(in_bounds, d, 0.0))
        ch["weight"] = fill(ch["weight"], jnp.where(in_bounds, 1.0, 0.0))
        cflat = ch["color"].reshape(layer.max_blocks, vpb, 3)
        cflat = cflat.at[jnp.asarray(slots)].set(
            jnp.where(in_bounds[..., None], color, 0.0)
        )
        ch["color"] = cflat.reshape(ch["color"].shape)
    elif layer_type == "esdf":
        ch["esdf"] = fill(ch["esdf"], jnp.where(in_bounds, d, 0.0))
        obs = jnp.where(in_bounds, vlayer.ESDF_OBSERVED, np.uint8(0)).astype(
            jnp.uint8
        )
        flat = ch["esdf_flags"].reshape(layer.max_blocks, vpb)
        flat = flat.at[jnp.asarray(slots)].set(obs)
        ch["esdf_flags"] = flat.reshape(ch["esdf_flags"].shape)
    else:
        raise ValueError(layer_type)
    return dataclasses.replace(layer, channels=ch)

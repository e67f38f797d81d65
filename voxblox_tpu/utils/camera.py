"""Camera frustum model for view-culling.

Equivalent of the reference CameraModel / Plane (utils/camera_model.{h,cc}):
a pinhole frustum described by 6 bounding planes + AABB, used to select
visible blocks. Construct from FoV or intrinsics; query points or blocks
vectorized.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class Frustum:
    """6 planes (outward normals, point inside iff n.x <= d for all)."""

    normals: jnp.ndarray  # [6,3]
    offsets: jnp.ndarray  # [6]
    aabb_min: jnp.ndarray  # [3]
    aabb_max: jnp.ndarray  # [3]


def frustum_from_fov(
    T_G_C, fov_h_rad: float, fov_v_rad: float, min_depth: float,
    max_depth: float
) -> Frustum:
    """Build the frustum in world frame; camera looks along +z."""
    R, t = T_G_C
    R = np.asarray(R)
    t = np.asarray(t)
    th = np.tan(fov_h_rad / 2.0)
    tv = np.tan(fov_v_rad / 2.0)
    # Camera-frame outward plane normals (camera_model.cc semantics).
    normals_C = np.array(
        [
            [0.0, 0.0, -1.0],  # near
            [0.0, 0.0, 1.0],  # far
            [1.0, 0.0, -th],  # right (x <= th * z)
            [-1.0, 0.0, -th],  # left
            [0.0, 1.0, -tv],  # bottom
            [0.0, -1.0, -tv],  # top
        ]
    )
    normals_C[2:] /= np.linalg.norm(normals_C[2:], axis=1, keepdims=True)
    offsets_C = np.array([-min_depth, max_depth, 0.0, 0.0, 0.0, 0.0])
    normals_G = normals_C @ R.T
    offsets_G = offsets_C + normals_G @ t

    # AABB from the 8 frustum corners.
    corners_C = []
    for z in (min_depth, max_depth):
        for sx in (-1, 1):
            for sy in (-1, 1):
                corners_C.append([sx * th * z, sy * tv * z, z])
    corners_G = np.asarray(corners_C) @ R.T + t
    return Frustum(
        normals=jnp.asarray(normals_G, jnp.float32),
        offsets=jnp.asarray(offsets_G, jnp.float32),
        aabb_min=jnp.asarray(corners_G.min(0), jnp.float32),
        aabb_max=jnp.asarray(corners_G.max(0), jnp.float32),
    )


def points_in_frustum(frustum: Frustum, points):
    """bool[...] for world points [...,3]."""
    s = jnp.einsum("...k,pk->...p", points, frustum.normals)
    return jnp.all(s <= frustum.offsets + 1e-6, axis=-1)


def blocks_in_frustum(frustum: Frustum, block_ijk, block_size: float):
    """Conservative bool[...] for blocks: center within frustum inflated by
    the block circumradius (camera_model view-culling semantics)."""
    centers = (block_ijk.astype(jnp.float32) + 0.5) * block_size
    margin = block_size * np.sqrt(3.0) / 2.0
    s = jnp.einsum("...k,pk->...p", centers, frustum.normals)
    return jnp.all(s <= frustum.offsets + margin, axis=-1)

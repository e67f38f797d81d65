"""Marching cubes: generated-table validation + mesh extraction quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import MeshIntegratorConfig
from voxblox_tpu.ops import marching_cubes as mc
from voxblox_tpu.ops import mesh as vmesh
from voxblox_tpu.sim import world as sw


def test_table_structure():
    # 254 non-trivial configs; single-corner cases are single triangles on
    # the 3 edges adjacent to that corner.
    assert (mc.TRI_COUNT > 0).sum() == 254
    assert mc.TRI_COUNT.max() <= mc.MAX_TRIS
    for corner in range(8):
        cfg = 1 << corner
        assert mc.TRI_COUNT[cfg] == 1
        edges = set(mc.TRI_TABLE[cfg][:3].tolist())
        want = {i for i, (a, b) in enumerate(mc.EDGES) if corner in (a, b)}
        assert edges == want


def test_table_face_consistency():
    """Watertightness: for every config, the patch's boundary segments on
    each cube face must exactly match that face's marching-squares segments
    (so two adjacent cubes always produce coincident border edges)."""
    corner_on_face = []
    for face in mc._FACES:
        corner_on_face.append(set(face))
    for config in range(256):
        tris = mc.TRI_TABLE[config]
        # Collect patch boundary edges (triangle edges that appear once).
        seen = {}
        for t in range(mc.TRI_COUNT[config]):
            ids = tris[3 * t : 3 * t + 3]
            for i in range(3):
                e = (int(ids[i]), int(ids[(i + 1) % 3]))
                key = tuple(sorted(e))
                seen[key] = seen.get(key, 0) + 1
        boundary = {k for k, v in seen.items() if v == 1}
        assert all(v <= 2 for v in seen.values()), config
        # Each boundary segment must lie on some face (both its edge ids'
        # edges belong to the same face).
        inside = [(config >> i) & 1 == 1 for i in range(8)]
        face_segments = set()
        for face in mc._FACES:
            for a, b in mc._face_segments(face, inside):
                face_segments.add(tuple(sorted((a, b))))
        assert boundary == face_segments, (config, boundary, face_segments)


def test_single_cube_triangle_position():
    # Corner 0 inside with sdf -1, others +1: crossing at midpoints of
    # edges 0, 3, 8.
    pos = jnp.asarray(mc.CORNERS, jnp.float32)[None]
    sdf = jnp.asarray([[-1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]])
    tv, tm = mc.mesh_cubes(pos, sdf, jnp.ones((1,), bool))
    tv, tm = np.asarray(tv), np.asarray(tm)
    assert tm[0].sum() == 1
    verts = sorted(map(tuple, tv[0, 0]))
    assert (0.5, 0.0, 0.0) in verts  # edge 0 midpoint
    assert (0.0, 0.5, 0.0) in verts  # edge 3 midpoint
    assert (0.0, 0.0, 0.5) in verts  # edge 8 midpoint
    # Normal points away from the inside corner (toward +SDF).
    n = np.asarray(mc.triangle_normals(jnp.asarray(tv[0, :1])))[0]
    assert np.dot(n, [1.0, 1.0, 1.0]) > 0


def _sphere_gt_layer(voxel=0.1, radius=1.0):
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 0.0), radius, color=(200, 30, 40))
    objs = w.freeze()
    bound = radius + 6 * voxel
    return sw.generate_gt_layer(
        objs, "tsdf", voxel, (-bound,) * 3, (bound,) * 3,
        max_dist=4 * voxel, vps=8, max_blocks=512,
    )


def test_sphere_mesh_quality():
    radius = 1.0
    layer = _sphere_gt_layer(radius=radius)
    ml = vmesh.MeshLayer(layer.block_size)
    layer = vmesh.generate_mesh(layer, ml, only_updated=False)
    verts, normals, colors = ml.combined()
    assert len(verts) > 1000
    # All vertices on the sphere within a voxel.
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r, radius, atol=0.02)
    # Normals point outward.
    outward = np.sum(normals * (verts / r[:, None]), axis=1)
    assert (outward > 0.7).mean() > 0.99
    # Colors from the sphere object.
    assert (np.abs(colors.astype(int) - [200, 30, 40]).max(1) < 30).mean() > 0.95
    # Total area close to analytic 4*pi*r^2.
    tris = verts.reshape(-1, 3, 3)
    a = np.linalg.norm(
        np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=1
    ).sum() / 2.0
    assert abs(a - 4 * np.pi * radius**2) / (4 * np.pi * radius**2) < 0.05


def test_mesh_is_watertight_on_sphere():
    """Welded sphere mesh: every edge shared by exactly two triangles."""
    layer = _sphere_gt_layer()
    ml = vmesh.MeshLayer(layer.block_size)
    layer = vmesh.generate_mesh(layer, ml, only_updated=False)
    verts, normals, colors = ml.combined()
    uv, un, uc, inv = vmesh.weld_vertices(verts, normals, colors)
    tris = inv.reshape(-1, 3)
    edges = {}
    for t in tris:
        for i in range(3):
            e = tuple(sorted((t[i], t[(i + 1) % 3])))
            edges[e] = edges.get(e, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).all(), np.unique(counts, return_counts=True)


def test_incremental_meshing_dirty_bits():
    layer = _sphere_gt_layer()
    ml = vmesh.MeshLayer(layer.block_size)
    layer = vmesh.generate_mesh(layer, ml, only_updated=True)
    n1 = ml.num_vertices()
    assert n1 > 0
    # All dirty bits consumed -> second pass re-meshes nothing new.
    layer = vmesh.generate_mesh(layer, ml, only_updated=True)
    assert ml.num_vertices() == n1

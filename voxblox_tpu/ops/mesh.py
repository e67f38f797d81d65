"""Incremental per-block meshing over the voxel pool.

Equivalent of the reference MeshIntegrator + Mesh/MeshLayer
(voxblox mesh/mesh_integrator.h:72-410, mesh/mesh.h, mesh/mesh_layer.h):

- for each updated block (kMesh dirty bit) all vps^3 cubes are marched in
  one vectorized pass; the (vps-1)^3 interior cubes and the 3 border planes
  (reference extractMeshInsideBlock / extractMeshOnBorder,
  mesh_integrator.h:263-360) are handled uniformly by gathering a +1 voxel
  halo from neighbor blocks;
- cube corners must all be observed (weight > min_weight, the
  ``getSdfIfValid`` mask, utils/meshing_utils.h:11-36);
- vertex colors come from the nearest voxel (updateMeshColor,
  mesh_integrator.h:362-382);
- results live in a host-side ``MeshLayer``: per-block triangle soups with
  flat normals (exactly the reference's per-block Mesh buffers), replaced
  block-wise on re-mesh, plus vertex welding for connected-mesh export
  (mesh/mesh_utils.h:20-190).

Device work is batched over blocks; compaction of the masked triangle soup
happens host-side (meshing is bandwidth-light next to integration).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from ..core.config import MeshIntegratorConfig
from . import marching_cubes as mc
from .esdf import build_padded, neighbor_slot_table


@dataclasses.dataclass
class BlockMesh:
    """Per-block triangle soup (reference mesh/mesh.h:36-120)."""

    vertices: np.ndarray  # f32[N,3]
    normals: np.ndarray  # f32[N,3]
    colors: np.ndarray  # uint8[N,3]
    indices: np.ndarray  # int32[N] (trivial 0..N-1 soup, welded on export)


class MeshLayer:
    """Block-hash map of BlockMesh (reference mesh/mesh_layer.h:31-160)."""

    def __init__(self, block_size: float):
        self.block_size = block_size
        self.blocks: Dict[Tuple[int, int, int], BlockMesh] = {}

    def update_block(self, index, mesh: Optional[BlockMesh]):
        key = tuple(int(i) for i in index)
        if mesh is None or len(mesh.vertices) == 0:
            self.blocks.pop(key, None)
        else:
            self.blocks[key] = mesh

    def clear_distant(self, center, max_distance: float):
        """clearDistantMesh (mesh_layer.h semantics)."""
        center = np.asarray(center)
        doomed = [
            k
            for k in self.blocks
            if np.linalg.norm((np.asarray(k) + 0.5) * self.block_size - center)
            > max_distance
        ]
        for k in doomed:
            del self.blocks[k]

    def combined(self):
        """Concatenate all block meshes -> (vertices, normals, colors)."""
        if not self.blocks:
            z = np.zeros((0, 3), np.float32)
            return z, z, np.zeros((0, 3), np.uint8)
        vs = np.concatenate([b.vertices for b in self.blocks.values()])
        ns = np.concatenate([b.normals for b in self.blocks.values()])
        cs = np.concatenate([b.colors for b in self.blocks.values()])
        return vs, ns, cs

    def num_vertices(self) -> int:
        return sum(len(b.vertices) for b in self.blocks.values())


def weld_vertices(vertices, normals, colors, tol: float = 1e-6):
    """Weld identical vertices -> (unique_verts, unique_normals(avg),
    unique_colors, tri_indices). Reference: createConnectedMesh
    (mesh/mesh_utils.h:20-190) welds by exact position quantized."""
    if len(vertices) == 0:
        return vertices, normals, colors, np.zeros((0,), np.int64)
    q = np.round(vertices / tol).astype(np.int64)
    _, first, inv = np.unique(q, axis=0, return_index=True, return_inverse=True)
    uv = vertices[first]
    uc = colors[first]
    # Average normals of welded copies.
    un = np.zeros_like(uv)
    np.add.at(un, inv, normals)
    norm = np.linalg.norm(un, axis=1, keepdims=True)
    un = un / np.maximum(norm, 1e-12)
    return uv, un, uc, inv


# ---------------------------------------------------------------------------
# Device kernel: march a batch of pool rows
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("min_weight", "use_color"))
def _march_rows(layer: vlayer.VoxelLayer, rows, min_weight: float,
                use_color: bool):
    """March all vps^3 cubes of the selected pool rows.

    Works on TSDF and ESDF layers (the reference MeshIntegrator is
    templated over the voxel type, mesh_integrator.h:72-90): the SDF
    channel and the per-corner validity test dispatch on layer_type —
    weight > min_weight for TSDF, the observed flag for ESDF
    (utils/meshing_utils.h:11-49 getSdfIfValid specializations).

    rows: int32[B] pool rows (may include padding -1 -> masked out).
    Returns (tri_verts f32[B, C, 5, 3, 3], tri_mask bool[B, C, 5],
    tri_colors f32[B, C, 5, 3, 3]) with C = vps^3 cubes.
    """
    v = layer.vps
    nbr = neighbor_slot_table(layer)
    if layer.layer_type == "esdf":
        sdf_pad = build_padded(
            layer, layer.channels["esdf"], nbr, jnp.float32(0.0)
        )
        flags_pad = build_padded(
            layer, layer.channels["esdf_flags"], nbr, jnp.uint8(0)
        )
        w_pad = ((flags_pad & vlayer.ESDF_OBSERVED) != 0).astype(jnp.float32)
        min_weight = 0.5  # validity = observed flag
    else:
        sdf_pad = build_padded(
            layer, layer.channels["tsdf"], nbr, jnp.float32(0.0)
        )
        w_pad = build_padded(
            layer, layer.channels["weight"], nbr, jnp.float32(0.0)
        )
    row_ok = rows >= 0
    safe_rows = jnp.where(row_ok, rows, 0)
    sdf_pad = sdf_pad[safe_rows]  # [B, v+2, v+2, v+2]
    w_pad = w_pad[safe_rows]
    if use_color:
        color_pad = jnp.stack(
            [
                build_padded(
                    layer, layer.channels["color"][..., c], nbr,
                    jnp.float32(0.0)
                )[safe_rows]
                for c in range(3)
            ],
            axis=-1,
        )

    # Cube corner gather: cube at local (z,y,x) uses padded [1+z+dz, ...].
    # (pool cubes are [z,y,x]; mc.CORNERS are (x,y,z) offsets)
    zz, yy, xx = jnp.meshgrid(
        jnp.arange(v), jnp.arange(v), jnp.arange(v), indexing="ij"
    )
    corner_sdf = []
    corner_w = []
    corner_color = []
    for (cx, cy, cz) in np.asarray(mc.CORNERS):
        sl = (
            slice(None),
            slice(1 + cz, 1 + cz + v),
            slice(1 + cy, 1 + cy + v),
            slice(1 + cx, 1 + cx + v),
        )
        corner_sdf.append(sdf_pad[sl])
        corner_w.append(w_pad[sl])
        if use_color:
            corner_color.append(color_pad[sl])
    corner_sdf = jnp.stack(corner_sdf, axis=-1)  # [B, v,v,v, 8]
    corner_w = jnp.stack(corner_w, axis=-1)
    cube_valid = jnp.all(corner_w > min_weight, axis=-1)
    cube_valid = cube_valid & row_ok[:, None, None, None]

    # Corner world positions.
    block_origin = (
        layer.block_ijk[safe_rows].astype(jnp.float32) * layer.block_size
    )  # [B,3]
    local = jnp.stack([xx, yy, zz], axis=-1).astype(jnp.float32)  # [v,v,v,3]
    corner_off = jnp.asarray(mc.CORNERS, jnp.float32)  # [8,3]
    # SDF samples live at voxel CENTERS (+0.5); the cube spans the centers
    # of voxel (i,j,k) and its +1 neighbors (reference meshes between
    # computeCoordinatesFromLinearIndex centers, mesh_integrator.h:263-290).
    corner_pos = (
        block_origin[:, None, None, None, None, :]
        + (local[None, :, :, :, None, :] + corner_off[None, None, None, None]
           + 0.5)
        * layer.voxel_size
    )  # [B, v,v,v, 8, 3]

    b = rows.shape[0]
    corner_pos = corner_pos.reshape(b, v**3, 8, 3)
    corner_sdf = corner_sdf.reshape(b, v**3, 8)
    cube_valid = cube_valid.reshape(b, v**3)

    tri_verts, tri_mask = mc.mesh_cubes(corner_pos, corner_sdf, cube_valid)

    if use_color:
        corner_color = jnp.stack(corner_color, axis=-2).reshape(
            b, v**3, 8, 3
        )
        # Nearest-corner color per triangle vertex (updateMeshColor uses the
        # voxel nearest the vertex; corners are voxel centers here).
        d2 = jnp.sum(
            (tri_verts[..., None, :] - corner_pos[:, :, None, None, :, :]) ** 2,
            axis=-1,
        )  # [B,C,5,3,8]
        nearest = jnp.argmin(d2, axis=-1)
        tri_colors = jnp.take_along_axis(
            corner_color[:, :, None, None, :, :],
            nearest[..., None, None].repeat(3, -1),
            axis=-2,
        )[..., 0, :]
    else:
        tri_colors = jnp.zeros(tri_verts.shape, jnp.float32)
    return tri_verts, tri_mask, tri_colors


# ---------------------------------------------------------------------------
# Host driver
# ---------------------------------------------------------------------------


def generate_mesh(
    layer: vlayer.VoxelLayer,
    mesh_layer: MeshLayer,
    cfg: MeshIntegratorConfig = MeshIntegratorConfig(),
    only_updated: bool = True,
    clear_updated_flag: bool = True,
    batch: int = 64,
):
    """Re-mesh updated (or all) blocks into mesh_layer
    (MeshIntegrator::generateMesh, mesh_integrator.h:133-163).

    Returns the (possibly dirty-bit-cleared) voxel layer.
    """
    if only_updated:
        rows_mask = vlayer.dirty_mask(layer, vlayer.DIRTY_MESH)
    else:
        rows_mask = layer.active_mask()
    rows = np.nonzero(np.asarray(rows_mask))[0].astype(np.int32)
    block_ijk = np.asarray(layer.block_ijk)
    use_color = cfg.use_color and "color" in layer.channels

    for s in range(0, len(rows), batch):
        chunk = rows[s : s + batch]
        pad = np.full(batch, -1, np.int32)
        pad[: len(chunk)] = chunk
        tv, tm, tc = _march_rows(
            layer, jnp.asarray(pad), cfg.min_weight, use_color
        )
        tv, tm, tc = np.asarray(tv), np.asarray(tm), np.asarray(tc)
        for bi, row in enumerate(chunk):
            m = tm[bi]
            verts = tv[bi][m]  # [T,3,3]
            if len(verts) == 0:
                mesh_layer.update_block(block_ijk[row], None)
                continue
            cols = tc[bi][m]
            flat_v = verts.reshape(-1, 3)
            normals = np.asarray(
                mc.triangle_normals(jnp.asarray(verts))
            )  # [T,3]
            flat_n = np.repeat(normals, 3, axis=0)
            flat_c = np.clip(cols.reshape(-1, 3), 0, 255).astype(np.uint8)
            mesh_layer.update_block(
                block_ijk[row],
                BlockMesh(
                    vertices=flat_v,
                    normals=flat_n,
                    colors=flat_c,
                    indices=np.arange(len(flat_v), dtype=np.int32),
                ),
            )

    if clear_updated_flag:
        layer = vlayer.clear_dirty(layer, vlayer.DIRTY_MESH)
    return layer

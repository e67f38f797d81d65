"""PLY export: meshes and colored SDF point clouds.

Equivalent of the reference io/mesh_ply.cc (connected/welded mesh export),
io/sdf_ply.h (SDF voxels -> colored point cloud / isosurface) and
io/ply_writer.h. Binary little-endian PLY by default (the reference writes
ascii; binary is lossless and smaller — pass ascii=True for parity).
"""

from __future__ import annotations

import struct

import numpy as np


def write_mesh_ply(path, vertices, normals=None, colors=None, faces=None,
                   ascii=False):
    """Write a triangle mesh (or point set if faces is None)."""
    vertices = np.asarray(vertices, np.float32)
    n = len(vertices)
    has_n = normals is not None and len(normals) == n
    has_c = colors is not None and len(colors) == n
    header = ["ply"]
    header.append(
        "format ascii 1.0" if ascii else "format binary_little_endian 1.0"
    )
    header.append(f"element vertex {n}")
    header += ["property float x", "property float y", "property float z"]
    if has_n:
        header += ["property float nx", "property float ny",
                   "property float nz"]
    if has_c:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    if faces is not None:
        header.append(f"element face {len(faces)}")
        header.append("property list uchar int vertex_indices")
    header.append("end_header")

    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if ascii:
            for i in range(n):
                row = list(vertices[i])
                if has_n:
                    row += list(normals[i])
                line = " ".join(f"{x:.6f}" for x in row)
                if has_c:
                    line += " " + " ".join(str(int(c)) for c in colors[i])
                f.write((line + "\n").encode())
            if faces is not None:
                for face in faces:
                    f.write(
                        ("3 " + " ".join(str(int(v)) for v in face) + "\n")
                        .encode()
                    )
        else:
            if has_n and has_c:
                rec = np.zeros(
                    n,
                    dtype=[("v", np.float32, 3), ("n", np.float32, 3),
                           ("c", np.uint8, 3)],
                )
                rec["v"], rec["n"], rec["c"] = vertices, normals, colors
            elif has_n:
                rec = np.zeros(
                    n, dtype=[("v", np.float32, 3), ("n", np.float32, 3)]
                )
                rec["v"], rec["n"] = vertices, normals
            elif has_c:
                rec = np.zeros(
                    n, dtype=[("v", np.float32, 3), ("c", np.uint8, 3)]
                )
                rec["v"], rec["c"] = vertices, colors
            else:
                rec = np.zeros(n, dtype=[("v", np.float32, 3)])
                rec["v"] = vertices
            f.write(rec.tobytes())
            if faces is not None:
                faces = np.asarray(faces, np.int32)
                rec = np.zeros(
                    len(faces), dtype=[("k", np.uint8), ("f", np.int32, 3)]
                )
                rec["k"] = 3
                rec["f"] = faces
                f.write(rec.tobytes())


def read_ply(path):
    """Minimal PLY reader (binary_le / ascii, x y z [+nx ny nz][+rgb],
    optional faces). Returns dict with vertices/normals/colors/faces."""
    with open(path, "rb") as f:
        # Parse header.
        props = []
        counts = {}
        fmt = None
        order = []
        while True:
            line = f.readline().decode().strip()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                counts[name] = int(cnt)
                order.append(name)
            elif line.startswith("property") and order and order[-1] == "vertex":
                props.append(line.split()[-1])
            elif line == "end_header":
                break
        nv = counts.get("vertex", 0)
        nf = counts.get("face", 0)
        type_map = {
            "x": np.float32, "y": np.float32, "z": np.float32,
            "nx": np.float32, "ny": np.float32, "nz": np.float32,
            "red": np.uint8, "green": np.uint8, "blue": np.uint8,
            "alpha": np.uint8, "intensity": np.float32,
        }
        if fmt == "ascii":
            rows = [f.readline().split() for _ in range(nv)]
            arr = np.array(rows, np.float64)
            data = {p: arr[:, i] for i, p in enumerate(props)}
            faces = []
            for _ in range(nf):
                parts = f.readline().split()
                faces.append([int(x) for x in parts[1 : 1 + int(parts[0])]])
            faces = np.asarray(faces, np.int32) if faces else None
        else:
            dt = np.dtype([(p, type_map.get(p, np.float32)) for p in props])
            raw = f.read(nv * dt.itemsize)
            rec = np.frombuffer(raw, dt, count=nv)
            data = {p: rec[p] for p in props}
            faces = None
            if nf:
                fdt = np.dtype([("k", np.uint8), ("f", np.int32, 3)])
                rec = np.frombuffer(f.read(nf * fdt.itemsize), fdt, count=nf)
                faces = rec["f"].copy()
        out = {
            "vertices": np.stack(
                [data["x"], data["y"], data["z"]], -1
            ).astype(np.float32)
        }
        if "nx" in data:
            out["normals"] = np.stack(
                [data["nx"], data["ny"], data["nz"]], -1
            ).astype(np.float32)
        if "red" in data:
            out["colors"] = np.stack(
                [data["red"], data["green"], data["blue"]], -1
            ).astype(np.uint8)
        if faces is not None:
            out["faces"] = faces
        return out


def mesh_layer_to_ply(mesh_layer, path, connected: bool = True):
    """Export a MeshLayer (io/mesh_ply.cc:40-60; connected = welded with
    face indices, else raw triangle soup)."""
    from ..ops.mesh import weld_vertices

    verts, normals, colors = mesh_layer.combined()
    if connected and len(verts):
        uv, un, uc, inv = weld_vertices(verts, normals, colors)
        faces = inv.reshape(-1, 3)
        write_mesh_ply(path, uv, un, uc, faces)
    else:
        write_mesh_ply(path, verts, normals, colors,
                       np.arange(len(verts)).reshape(-1, 3))


def sdf_layer_to_pointcloud_ply(layer, path, surface_distance=None,
                                color_map=None):
    """Colored SDF voxel cloud (io/sdf_ply.h kSdfColoredDistanceField /
    kNearSurface modes): every observed voxel becomes a point, colored by
    its distance (or original color if near surface)."""
    import jax.numpy as jnp

    from ..core import grid
    from ..utils.evaluation import _distance, _observed

    rows = jnp.arange(layer.max_blocks)
    obs = np.asarray(_observed(layer, rows) & layer.active_mask()[:, None])
    d = np.asarray(_distance(layer, rows))
    lin = np.arange(layer.voxels_per_block)
    local = np.asarray(grid.linear_to_local(jnp.asarray(lin), layer.vps))
    block_ijk = np.asarray(layer.block_ijk)
    gvi = (
        block_ijk[:, None, :] * layer.vps + local[None, :, :]
    )  # [mb, vpb, 3]
    centers = (gvi + 0.5) * layer.voxel_size
    sel = obs
    if surface_distance is not None:
        sel = sel & (np.abs(d) < surface_distance)
    pts = centers[sel]
    dist = d[sel]
    if color_map is None:
        from ..utils.color_maps import rainbow_color_map
        span = max(np.abs(dist).max(), 1e-6) if len(dist) else 1.0
        colors = rainbow_color_map(0.5 + 0.5 * dist / span)
    else:
        colors = color_map(dist)
    write_mesh_ply(path, pts.astype(np.float32), colors=colors)
    return len(pts)

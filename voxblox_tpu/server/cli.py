"""Command-line tools — equivalents of the reference's standalone binaries:

- ``sim-bench``   <- SimulationServer + simulation_eval.cc: synthetic
  end-to-end benchmark (render -> integrate -> ESDF -> evaluate vs GT).
- ``eval``        <- voxblox_eval.cc: load a .vxblx map + GT cloud (PLY),
  report interpolated per-point error statistics.
- ``mesh``        <- visualize_tsdf.cc: load a .vxblx map, extract the
  marching-cubes mesh, write PLY.
- ``tsdf-to-esdf``<- test/tsdf_to_esdf.cc: offline ESDF regeneration.
- ``info``        : print layer headers of a map file.

Usage: ``python -m voxblox_tpu.server.cli <subcommand> ...``
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys

import numpy as np


def cmd_sim_bench(args):
    import jax.numpy as jnp

    from ..server.mapper import SimulationServer
    from ..sim import world as sw
    from ..utils import timing

    w = sw.SimulationWorld()
    w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
    w.add_ground_level(0.0)
    w.min_bound = np.array([-5.0, -5.0, -0.5], np.float32)
    w.max_bound = np.array([5.0, 5.0, 5.5], np.float32)
    srv = SimulationServer(
        w,
        voxel_size=args.voxel_size,
        method=args.method,
        camera_res=(args.width, args.height),
        max_blocks=args.max_blocks,
        incremental_esdf=not args.batch_esdf,
        generate_occupancy=args.occupancy,
    )
    result = srv.run(n_viewpoints=args.viewpoints, seed=args.seed)
    print("TSDF:", result["tsdf"])
    print("ESDF:", result["esdf"])
    if args.occupancy:
        print("OCC:", result["occ"])
        print("ESDF-OCC:", result["esdf_occ"])
    print(timing.print_timing())
    if args.output_mesh:
        from ..ops import mesh as mesh_ops
        from ..io import ply

        ml = mesh_ops.MeshLayer(srv.tsdf_layer.block_size)
        mesh_ops.generate_mesh(srv.tsdf_layer, ml, only_updated=False)
        ply.mesh_layer_to_ply(ml, args.output_mesh)
        print(f"mesh written to {args.output_mesh}")
    if args.output_map:
        from ..io import layer_io

        layer_io.save_layer(srv.tsdf_layer, args.output_map)
        layer_io.save_layer(srv.esdf_layer, args.output_map, append=True)
        print(f"map written to {args.output_map}")
    return 0


def cmd_eval(args):
    """voxblox_eval.cc: interpolated map distance at GT surface points
    should be ~0; report abs-error statistics. With --recolor-mesh,
    recolor the map voxels at the GT points by |error| (gray color map,
    voxblox_eval.cc:199-207) and write the recolored mesh for visual
    inspection (cc:228-246)."""
    import jax.numpy as jnp

    from ..io import layer_io, ply
    from ..ops import interp

    layer = layer_io.load_layer(args.map, "tsdf", max_blocks=args.max_blocks)
    gt = ply.read_ply(args.gt_ply)
    pts = jnp.asarray(gt["vertices"], jnp.float32)
    d, valid = interp.interpolate(layer, pts)
    d, valid = np.asarray(d), np.asarray(valid)
    err = np.abs(d[valid])
    stats = {
        "num_points": int(len(pts)),
        "num_evaluated": int(valid.sum()),
        "mean_abs_error": float(err.mean()) if len(err) else None,
        "rmse": float(np.sqrt((err**2).mean())) if len(err) else None,
        "max_abs_error": float(err.max()) if len(err) else None,
    }
    print(json.dumps(stats, indent=2))
    if args.recolor_mesh:
        from ..core import grid, layer as vlayer
        from ..ops import mesh as mesh_ops
        from ..utils import color_maps

        trunc = 2.0 * layer.voxel_size
        rgb = color_maps.grayscale_color_map(
            jnp.clip(jnp.abs(jnp.asarray(d)) / trunc, 0.0, 1.0)
        )
        gvi = grid.point_to_grid_index(pts, 1.0 / layer.voxel_size)
        layer = vlayer.set_voxels(
            layer, "color", gvi, rgb, valid=jnp.asarray(valid)
        )
        ml = mesh_ops.MeshLayer(layer.block_size)
        mesh_ops.generate_mesh(layer, ml, only_updated=False)
        ply.mesh_layer_to_ply(ml, args.recolor_mesh)
        print(f"error-recolored mesh written to {args.recolor_mesh}")
    return 0


def cmd_mesh(args):
    from ..io import layer_io, ply
    from ..ops import mesh as mesh_ops
    from ..utils import mesh_vis

    layer = layer_io.load_layer(
        args.map, args.layer, max_blocks=args.max_blocks
    )
    ml = mesh_ops.MeshLayer(layer.block_size)
    mesh_ops.generate_mesh(layer, ml, only_updated=False)
    if args.color_mode == "color" and args.layer == "tsdf":
        ply.mesh_layer_to_ply(ml, args.output, connected=not args.soup)
    else:
        mode = "gray" if (args.color_mode == "color") else args.color_mode
        mesh_vis.export_mesh(ml, args.output, mode=mode,
                             connected=not args.soup)
    print(f"{ml.num_vertices()} vertices -> {args.output}")
    return 0


def cmd_tsdf_to_esdf(args):
    from ..core import layer as vlayer
    from ..core.config import EsdfIntegratorConfig
    from ..io import layer_io
    from ..ops import esdf as esdf_ops

    tsdf_layer = layer_io.load_layer(
        args.input, "tsdf", max_blocks=args.max_blocks
    )
    cfg = EsdfIntegratorConfig(
        max_distance_m=args.max_distance, default_distance_m=args.max_distance
    )
    esdf_layer = vlayer.make_layer(
        "esdf", tsdf_layer.voxel_size, vps=tsdf_layer.vps,
        max_blocks=tsdf_layer.max_blocks,
    )
    esdf_layer, overflow, iters = esdf_ops.update_from_tsdf_batch(
        esdf_layer, tsdf_layer, cfg
    )
    assert not bool(overflow)
    layer_io.save_layer(tsdf_layer, args.output)
    layer_io.save_layer(esdf_layer, args.output, append=True)
    print(f"esdf computed in {int(iters)} sweeps -> {args.output}")
    return 0


def cmd_replay(args):
    """Replay a ROS1 bag (cow-and-lady style: PointCloud2 + transform
    topic, cow_and_lady_dataset.launch wiring) through a mapper service."""
    import numpy as np

    from ..core.config import (MapConfig, TsdfIntegratorConfig,
                               derive_defaults)
    from ..io import layer_io, rosbag
    from ..server.mapper import EsdfServer, TsdfServer

    tcfg, ecfg = derive_defaults(args.voxel_size)
    tcfg = dataclasses.replace(tcfg, max_ray_length_m=args.max_ray_length)
    map_cfg = MapConfig(voxel_size=args.voxel_size,
                        max_blocks=args.max_blocks)
    if args.esdf:
        srv = EsdfServer(map_cfg, integrator_config=tcfg,
                         esdf_config=ecfg, method=args.method)
    else:
        srv = TsdfServer(map_cfg, integrator_config=tcfg,
                         method=args.method)
    stats = rosbag.run_rosbag(
        srv, args.bag,
        pointcloud_topic=args.pointcloud_topic,
        pose_topic=args.pose_topic,
        child_frame_id=args.child_frame,
        update_esdf_every=5 if args.esdf else 0,
    )
    print(stats)
    if args.output_map:
        layer_io.save_layer(srv.layer, args.output_map)
        if args.esdf:
            layer_io.save_layer(srv.esdf_layer, args.output_map, append=True)
        print(f"map written to {args.output_map}")
    if args.output_mesh:
        from ..io import ply
        from ..ops import mesh as mesh_ops

        ml = mesh_ops.MeshLayer(srv.layer.block_size)
        mesh_ops.generate_mesh(srv.layer, ml, only_updated=False)
        ply.mesh_layer_to_ply(ml, args.output_mesh)
        print(f"mesh written to {args.output_mesh}")
    return 0


def cmd_traversable(args):
    """EsdfServer traversable cloud (esdf_server.cc:136-142): export the
    observed ESDF voxels with distance > robot radius as a colored PLY
    point cloud (distance rainbow)."""
    from ..core.config import MapConfig
    from ..io import layer_io, ply
    from ..models.maps import EsdfMap
    from ..utils.color_maps import rainbow_color_map

    layer = layer_io.load_layer(args.map, "esdf", max_blocks=args.max_blocks)
    emap = EsdfMap(layer, MapConfig(voxel_size=layer.voxel_size,
                                    voxels_per_side=layer.vps))
    pts, dist = emap.traversable_points(args.radius)
    span = max(float(np.abs(dist).max()), 1e-6) if len(dist) else 1.0
    colors = rainbow_color_map(0.5 + 0.5 * dist / span)
    ply.write_mesh_ply(args.output, pts, colors=np.asarray(colors))
    print(f"{len(pts)} traversable points (radius {args.radius}) "
          f"-> {args.output}")
    return 0


def cmd_info(args):
    from ..io import layer_io

    with open(args.map, "rb") as f:
        while True:
            count = layer_io._read_varint32(f)
            if count is None:
                break
            hdr = layer_io.read_delimited(f, layer_io.LayerProto)
            if hdr is None:
                break
            print(
                f"layer type={hdr.type} voxel_size={hdr.voxel_size} "
                f"vps={hdr.voxels_per_side} blocks={count - 1}"
            )
            for _ in range(count - 1):
                layer_io.read_delimited(f, layer_io.BlockProto)
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(prog="voxblox_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sb = sub.add_parser("sim-bench", help="synthetic end-to-end benchmark")
    sb.add_argument("--voxel-size", type=float, default=0.1)
    sb.add_argument("--method", default="merged",
                    choices=["simple", "merged", "fast", "projective"])
    sb.add_argument("--viewpoints", type=int, default=20)
    sb.add_argument("--width", type=int, default=320)
    sb.add_argument("--height", type=int, default=240)
    sb.add_argument("--max-blocks", type=int, default=4096)
    sb.add_argument("--seed", type=int, default=0)
    sb.add_argument("--batch-esdf", action="store_true")
    sb.add_argument("--occupancy", action="store_true",
                    help="also integrate occupancy + ESDF-from-occupancy "
                         "and evaluate them (simulation_server.cc:235-269)")
    sb.add_argument("--output-mesh", default=None)
    sb.add_argument("--output-map", default=None)
    sb.set_defaults(fn=cmd_sim_bench)

    ev = sub.add_parser("eval", help="evaluate a map against a GT PLY cloud")
    ev.add_argument("map")
    ev.add_argument("gt_ply")
    ev.add_argument("--max-blocks", type=int, default=8192)
    ev.add_argument("--recolor-mesh", default=None, metavar="OUT_PLY",
                    help="write a mesh recolored by |error| at the GT "
                         "points (voxblox_eval.cc:199-246)")
    ev.set_defaults(fn=cmd_eval)

    me = sub.add_parser("mesh", help="extract mesh from a .vxblx map")
    me.add_argument("map")
    me.add_argument("output")
    me.add_argument("--soup", action="store_true",
                    help="raw triangle soup (no vertex welding)")
    me.add_argument("--layer", default="tsdf", choices=["tsdf", "esdf"],
                    help="which layer of the file to mesh (the reference "
                         "MeshIntegrator is templated over voxel type)")
    me.add_argument("--color-mode", default="color",
                    choices=["color", "height", "normals", "gray",
                             "lambert", "lambert_color"],
                    help="vertex color mode (mesh_vis.h:44-51)")
    me.add_argument("--max-blocks", type=int, default=8192)
    me.set_defaults(fn=cmd_mesh)

    te = sub.add_parser("tsdf-to-esdf", help="offline ESDF regeneration")
    te.add_argument("input")
    te.add_argument("output")
    te.add_argument("--max-distance", type=float, default=2.0)
    te.add_argument("--max-blocks", type=int, default=8192)
    te.set_defaults(fn=cmd_tsdf_to_esdf)

    rp = sub.add_parser("replay", help="replay a ROS1 bag into a map")
    rp.add_argument("bag")
    rp.add_argument("--pointcloud-topic",
                    default="/camera/depth_registered/points")
    rp.add_argument("--pose-topic",
                    default="/kinect/vrpn_client/estimated_transform")
    rp.add_argument("--child-frame", default=None,
                    help="filter TFMessage streams by child_frame_id")
    rp.add_argument("--voxel-size", type=float, default=0.05)
    rp.add_argument("--max-ray-length", type=float, default=5.0)
    rp.add_argument("--max-blocks", type=int, default=8192)
    rp.add_argument("--method", default="fast",
                    choices=["simple", "merged", "fast", "projective"])
    rp.add_argument("--esdf", action="store_true")
    rp.add_argument("--output-map", default=None)
    rp.add_argument("--output-mesh", default=None)
    rp.set_defaults(fn=cmd_replay)

    tr = sub.add_parser(
        "traversable",
        help="export the ESDF traversable cloud (distance > robot radius)",
    )
    tr.add_argument("map")
    tr.add_argument("output")
    tr.add_argument("--radius", type=float, default=0.3,
                    help="robot/traversability radius in meters "
                         "(esdf_server.cc:136-142)")
    tr.add_argument("--max-blocks", type=int, default=8192)
    tr.set_defaults(fn=cmd_traversable)

    inf = sub.add_parser("info", help="print layer headers of a map file")
    inf.add_argument("map")
    inf.set_defaults(fn=cmd_info)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())

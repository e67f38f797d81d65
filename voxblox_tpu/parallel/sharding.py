"""Multi-chip sharding: ray data-parallelism + block spatial parallelism.

The TPU-native replacement for the reference's concurrency machinery
(SURVEY.md §2.7): its thread pools over points become **ray sharding**
across chips; its ROS layer pub/sub block exchange becomes **block-row
sharding of the pool** with XLA collectives.

- ``integrate_pointcloud_sharded``: rays are split over the ``rays`` mesh
  axis via shard_map; each device runs the (allocation-free) DDA +
  scatter-accumulate on its shard, the per-voxel accumulator sums are
  ``psum``'d over ICI, and the renormalize applies once. Because the
  accumulation is associative, the result is bitwise identical to the
  single-device integrator up to float summation order.
- ``lower_sweep_sharded``: the ESDF relaxation runs under jit with the
  pool's block dimension sharded over the ``blocks`` axis; the halo
  gathers through neighbor slots become XLA-inserted collectives.
- ``render_loss_grad_sharded``: differentiable render loss with rays
  sharded; the backward of the replicated map input yields the voxel
  gradient ``psum`` all-reduce, which XLA overlaps with the backward
  compute (latency-hiding scheduler).

Tested on a virtual 8-device CPU mesh (tests/test_parallel.py) and used by
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import layer as vlayer
from ..ops import projective as proj
from ..ops import raycast, render, tsdf
from ..ops.esdf import lower_sweep


def make_mesh(n_devices: int | None = None, rays: int | None = None):
    """Build a ('rays', 'blocks') mesh over the available devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if rays is None:
        # Prefer a balanced split; fall back to 1D.
        rays = 1
        for cand in range(int(np.sqrt(n)), 0, -1):
            if n % cand == 0:
                rays = cand
                break
    blocks = n // rays
    arr = np.asarray(devs).reshape(rays, blocks)
    return Mesh(arr, axis_names=("rays", "blocks"))


def init_multihost(coordinator_address: str, num_processes: int,
                   process_id: int, local_device_count: int | None = None):
    """Initialize the ``jax.distributed`` runtime for a real N-host
    deployment (SURVEY §5 distributed backend): every host calls this
    with the same coordinator before any other jax API, then builds the
    global ('hosts', 'chips') mesh with ``make_multihost_mesh``. On TPU
    pods the local chips are discovered automatically; on CPU smoke rigs
    set ``local_device_count`` to fan each process out to N virtual
    devices (collectives ride Gloo instead of ICI — same program)."""
    import os

    if local_device_count is not None:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={local_device_count}"
        )
    jax.distributed.initialize(
        coordinator_address, num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh():
    """('hosts', 'chips') mesh over the GLOBAL device list (one row per
    process). Shard rays over both axes — data parallelism whose psum
    reduces over intra-host ICI first, DCN second — by passing
    ``ray_axes=('hosts', 'chips')`` to the sharded integrators."""
    devs = jax.devices()
    arr = np.asarray(devs).reshape(jax.process_count(), -1)
    return Mesh(arr, axis_names=("hosts", "chips"))


def integrate_pointcloud_sharded(
    mesh: Mesh,
    layer: vlayer.VoxelLayer,
    T_G_C,
    points_C,
    colors,
    cfg,
    use_color: bool = True,
    ray_axes: tuple = ("rays",),
):
    """Ray-sharded simple-integrator step. Points count must be divisible
    by the ray axes' total size. ``ray_axes`` names the mesh axes rays
    are split over — ('rays',) on a single-host mesh, ('hosts', 'chips')
    on a make_multihost_mesh. Returns (layer, overflowed)."""
    n_ray_shards = int(np.prod([mesh.shape[a] for a in ray_axes]))
    assert points_C.shape[0] % n_ray_shards == 0

    points_G, origin = tsdf.transform_points(T_G_C, points_C)
    valid, clearing = tsdf.point_validity(points_C, cfg)
    weights = tsdf.point_weights(points_C, cfg)
    max_steps = cfg.max_steps or raycast.max_steps_hint(
        cfg.max_ray_length_m,
        cfg.default_truncation_distance,
        layer.voxel_size,
        cfg.voxel_carving_enabled,
    )

    # Allocation pass on the full cloud (cheap; block-granular DDA).
    setup_all = raycast.compute_ray_segments(
        jnp.broadcast_to(origin, points_G.shape), points_G, clearing,
        layer.voxel_size, cfg.default_truncation_distance,
        cfg.max_ray_length_m, cfg.voxel_carving_enabled,
    )
    layer, overflowed = tsdf.allocate_for_rays(
        layer, setup_all, valid, max_steps
    )

    ray_spec = P(tuple(ray_axes))
    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(),  # layer: replicated
            ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, P(),
        ),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def shard_accumulate(lyr, pts_G, cols, val, clr, wts, orig):
        setup = raycast.compute_ray_segments(
            jnp.broadcast_to(orig, pts_G.shape), pts_G, clr,
            lyr.voxel_size, cfg.default_truncation_distance,
            cfg.max_ray_length_m, cfg.voxel_carving_enabled,
        )
        voxels, mask = raycast.cast_rays(setup, max_steps, val)
        sdf, w = tsdf._per_sample_contributions(
            voxels, mask, orig, pts_G, wts, lyr.voxel_size, cfg
        )
        d_w, d_wd, d_wc, d_wcw, dirty = tsdf.accumulate_contributions(
            lyr, voxels, mask, sdf, w, cols, cfg, use_color
        )
        # Merge partial sums over the ray axis (ICI all-reduce).
        d_w = jax.lax.psum(d_w, ray_axes)
        d_wd = jax.lax.psum(d_wd, ray_axes)
        d_wc = jax.lax.psum(d_wc, ray_axes)
        d_wcw = jax.lax.psum(d_wcw, ray_axes)
        dirty = jax.lax.psum(dirty.astype(jnp.int32), ray_axes) > 0
        return d_w, d_wd, d_wc, d_wcw, dirty

    d_w, d_wd, d_wc, d_wcw, dirty = shard_accumulate(
        layer, points_G, colors, valid, clearing, weights, origin
    )
    layer = tsdf.apply_contributions(layer, d_w, d_wd, d_wc, d_wcw, dirty, cfg)
    return layer, overflowed


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "cfg", "kind", "resolution", "fov_h_rad", "fov_up_deg",
        "fov_down_deg", "intrinsics", "pool", "use_color",
        "max_visible_blocks", "max_mixed_slabs", "max_free_slabs",
    ),
    donate_argnums=(1,),
)
def integrate_projective_batch_sharded(
    mesh: Mesh,
    layer: vlayer.VoxelLayer,
    Rs,
    ts,
    points_C,
    colors,
    cfg,
    kind: str = "pinhole",
    resolution=(320, 240),
    fov_h_rad: float = float(np.deg2rad(90.0)),
    fov_up_deg: float = 25.0,
    fov_down_deg: float = -25.0,
    intrinsics=None,
    pool: int = 2,
    use_color: bool = True,
    max_visible_blocks: int = 512,
    max_mixed_slabs: int | None = None,
    max_free_slabs: int | None = None,
):
    """Scan-sharded projective TSDF integration — multi-chip DP over the
    TPU fast path (ops/projective.py).

    The K scans split over the ``rays`` mesh axis (K % axis_size == 0).
    Two phases keep the device hash table replicated:

    1. **Allocate (replicated):** every device runs the same K-scan
       candidate-block discovery + allocation (cheap: block-granular,
       HiZ-culled), so all devices hold an identical table — the
       TPU-native replacement for the reference's mutex-guarded
       temp-block map (tsdf_integrator.cc:91-147).
    2. **Accumulate (sharded):** each device computes its scans' weighted
       update deltas lookup-only and the per-voxel accumulator sums merge
       with one ``psum`` over ICI — the associative-reduction replacement
       for its per-voxel striped mutexes (tsdf_integrator.h:186-197).

    Equivalent to ``integrate_pointcloud_projective_batch`` up to float
    summation order (the per-scan deltas are summed in a different
    grouping). ``kind``: "pinhole" | "spherical" | "spherical_organized" |
    "pinhole_organized" (the last needs ``intrinsics`` + ``pool``).
    Returns (layer, overflowed).
    """
    if kind == "pinhole":
        def make_img(pts, cols):
            return proj.build_pinhole_range_image(pts, cols, resolution,
                                                  fov_h_rad)
    elif kind == "pinhole_organized":
        def make_img(pts, cols):
            return proj.build_pinhole_range_image_organized(
                pts, cols, pool, intrinsics)
    elif kind == "spherical_organized":
        def make_img(pts, cols):
            return proj.build_spherical_range_image_organized(
                pts, cols, resolution, fov_up_deg, fov_down_deg)
    else:
        def make_img(pts, cols):
            return proj.build_spherical_range_image(pts, cols, resolution,
                                                    fov_up_deg, fov_down_deg)

    n_shards = mesh.shape["rays"]
    K = Rs.shape[0]
    assert K % n_shards == 0, (
        f"the 'rays' axis size ({n_shards}) must divide scan count {K}"
    )
    mb = layer.max_blocks

    (img_kind, rngs, colors_i, params_i, feats, hiz_flats,
     hiz_meta, hiz_max_lvls) = proj._build_batch_images(
        points_C, colors, cfg, make_img
    )

    # Phase 1: replicated K-scan allocation (identical table everywhere).
    geom = dataclasses.replace(layer, channels={})

    def alloc_body(g, scan):
        R, t, rng_i, col_i, par_i, hflat_i = scan
        img = proj.RangeImage(rng=rng_i, color=col_i, params=par_i,
                              kind=img_kind)
        hiz = (hflat_i, hiz_meta, hiz_max_lvls)
        # The shared helper guarantees the allocation sequence replayed
        # here is bit-identical to the unsharded batch's.
        g, _, _, p_ovf, b_ovf = proj._discover_and_allocate(
            g, img, R, t, cfg, hiz, max_visible_blocks, allocate=True
        )
        return g, p_ovf | b_ovf

    geom, ovfs = jax.lax.scan(
        alloc_body, geom, (Rs, ts, rngs, colors_i, params_i, hiz_flats)
    )
    overflowed = jnp.any(ovfs)

    # Phase 2: sharded accumulate + psum merge.
    direct_acc = mb >= 8192  # same locality trade as _integrate_batch

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P("rays"),) * 7,
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_acc(Rs_s, ts_s, rngs_s, cols_s, params_s, feats_s, hflats_s):
        acc = proj._batch_acc_init(layer, use_color)

        def body(carry, scan):
            acc, ovf = carry
            R, t, rng_i, col_i, par_i, feat_i, hflat_i = scan
            img = proj.RangeImage(rng=rng_i, color=col_i, params=par_i,
                                  kind=img_kind)
            hiz = (hflat_i, hiz_meta, hiz_max_lvls)
            _, rows, row_ok, d_or_acc, (p_o, b_o) = proj._scan_terms(
                geom, R, t, img, cfg, use_color, max_visible_blocks,
                max_mixed_slabs, feat=feat_i, hiz=hiz,
                max_free_slabs=max_free_slabs, allocate=False,
                acc=acc if direct_acc else None,
            )
            o = p_o | b_o
            if direct_acc:
                acc = d_or_acc
            else:
                write_rows = jnp.where(row_ok, rows, mb)
                n_slabs = d_or_acc.shape[1]
                acc = acc.reshape(mb, n_slabs, -1).at[write_rows].add(
                    d_or_acc, mode="drop", unique_indices=True
                ).reshape(acc.shape)
            return (acc, ovf | o), None

        (acc, ovf), _ = jax.lax.scan(
            body, (acc, jnp.asarray(False)),
            (Rs_s, ts_s, rngs_s, cols_s, params_s, feats_s, hflats_s),
        )
        acc = jax.lax.psum(acc, "rays")
        return acc, jax.lax.psum(ovf.astype(jnp.int32), "rays")

    acc, ovf_count = shard_acc(
        Rs, ts, rngs, colors_i, params_i, feats, hiz_flats
    )
    layer = proj._fold_batch_acc(layer, geom, acc, cfg, use_color)
    return layer, overflowed | (ovf_count > 0)


def shard_layer_blocks(mesh: Mesh, layer: vlayer.VoxelLayer):
    """Place the pool's block dimension on the 'blocks' mesh axis; hash
    table + metadata replicated."""
    blockwise = NamedSharding(mesh, P("blocks"))
    repl = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    channels = {k: put(v, blockwise) for k, v in layer.channels.items()}
    return dataclasses.replace(
        layer,
        channels=channels,
        block_ijk=put(layer.block_ijk, repl),
        block_flags=put(layer.block_flags, repl),
        num_blocks=put(layer.num_blocks, repl),
        table=jax.tree.map(lambda x: put(x, repl), layer.table),
    )


def lower_sweep_sharded(mesh: Mesh, esdf_layer, cfg, region_rows=None):
    """ESDF sweep with the pool block-sharded; XLA inserts the halo
    collectives for cross-shard neighbor gathers.

    Like the single-device entry points (ops.esdf.update_from_tsdf_batch),
    a working-set overflow (cfg.max_active_blocks smaller than the live
    active set — some rows would be left unswept) is retried with a
    doubled budget until the sweep covers everything or the budget hits
    the pool size."""
    esdf_layer = shard_layer_blocks(mesh, esdf_layer)
    fn = jax.jit(lower_sweep, static_argnames=("cfg",))
    run_cfg = cfg
    while True:
        layer_out, iters, region_ovf, _ = fn(esdf_layer, run_cfg, region_rows)
        if run_cfg.max_active_blocks is None or not bool(region_ovf):
            return layer_out, iters
        k = min(run_cfg.max_active_blocks * 2, esdf_layer.max_blocks)
        if k == run_cfg.max_active_blocks:
            raise RuntimeError(
                "lower_sweep_sharded: working set exceeds the pool size"
            )
        run_cfg = dataclasses.replace(run_cfg, max_active_blocks=k)


def render_loss_grad_sharded(
    mesh: Mesh, layer, origins, dirs, target_depth, max_distance: float
):
    """Ray-sharded differentiable render loss + voxel-SDF gradient.

    Returns (loss, grad_tsdf_channel). The gradient all-reduce over ray
    shards is the psum XLA inserts for the replicated map input.
    """

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P("rays"), P("rays"), P("rays")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def shard_loss_grad(tsdf_channel, o, d, tgt):
        def loss_fn(ch):
            lyr = dataclasses.replace(
                layer, channels={**layer.channels, "tsdf": ch}
            )
            depth, hit = render.render_depth(lyr, o, d, max_distance)
            err = jnp.where(hit, depth - tgt, 0.0)
            return jnp.sum(err * err)

        loss, grad = jax.value_and_grad(loss_fn)(tsdf_channel)
        return jax.lax.psum(loss, "rays"), jax.lax.psum(grad, "rays")

    return shard_loss_grad(layer.channels["tsdf"], origins, dirs, target_depth)

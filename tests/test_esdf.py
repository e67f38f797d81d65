"""ESDF sweeps: known-geometry fixpoints, batch-vs-incremental consistency,
accuracy vs analytic GT (port of test_sdf_integrators.cc EsdfIntegrators)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxblox_tpu.core import grid, layer as vlayer
from voxblox_tpu.core.config import EsdfIntegratorConfig, TsdfIntegratorConfig
from voxblox_tpu.ops import esdf, tsdf
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import evaluation

VOXEL = 0.10
TRUNC = 4 * VOXEL


def _plane_tsdf_layer(voxel=VOXEL, extent=16, max_blocks=512):
    """Synthetic TSDF of the plane z=0: exact signed distance, clamped to
    the fixed band; observed everywhere in a slab around it."""
    layer = vlayer.make_layer("tsdf", voxel, vps=8, max_blocks=max_blocks)
    blocks = np.stack(
        np.meshgrid(np.arange(-2, 2), np.arange(-2, 2), np.arange(-2, 2),
                    indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)
    layer, _ = vlayer.allocate_blocks(
        layer, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    rows = jnp.arange(layer.max_blocks)
    lin = jnp.arange(layer.voxels_per_block)
    local = grid.linear_to_local(lin, layer.vps)
    gvi = layer.block_ijk[:, None, :] * layer.vps + local[None, :, :]
    z = grid.grid_index_to_center_point(gvi, voxel)[..., 2]
    dist = jnp.clip(z, -TRUNC, TRUNC)
    active = layer.active_mask()
    ch = dict(layer.channels)
    shape = ch["tsdf"].shape
    ch["tsdf"] = jnp.where(active[:, None], dist, 0.0).reshape(shape)
    ch["weight"] = jnp.where(
        active[:, None], jnp.ones_like(dist), 0.0
    ).reshape(shape)
    return dataclasses_replace(layer, channels=ch)


def dataclasses_replace(layer, **kw):
    import dataclasses
    return dataclasses.replace(layer, **kw)


def test_esdf_plane_exact():
    """ESDF of a plane: distance grows linearly with |z| — the sweep must
    reproduce it exactly away from the default-distance cap."""
    tsdf_layer = _plane_tsdf_layer()
    cfg = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2,
    )
    esdf_layer = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
    esdf_layer, overflow, iters = esdf.update_from_tsdf_batch(
        esdf_layer, tsdf_layer, cfg
    )
    assert not bool(overflow)
    # Query along z at x=y=0.41 (voxel centers at z = ±(k+0.5)*0.1).
    zs = np.arange(-12, 12) * VOXEL + VOXEL / 2
    pts = np.stack([np.full_like(zs, 0.41), np.full_like(zs, 0.41), zs], -1)
    gvi = grid.point_to_grid_index(jnp.asarray(pts, jnp.float32), 1.0 / VOXEL)
    got, found = vlayer.get_voxels(esdf_layer, "esdf", gvi)
    assert bool(jnp.all(found))
    want = np.clip(zs, -cfg.max_distance_m, cfg.max_distance_m)
    np.testing.assert_allclose(np.asarray(got), want, atol=0.01)


def test_esdf_quasi_euclidean_point_source():
    """A single fixed voxel at the origin: the sweep's distance field must
    equal the quasi-euclidean (26-neighborhood chamfer) metric."""
    voxel = 1.0
    layer = vlayer.make_layer("tsdf", voxel, vps=8, max_blocks=64)
    blocks = np.stack(
        np.meshgrid([-1, 0], [-1, 0], [-1, 0], indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)
    layer, _ = vlayer.allocate_blocks(
        layer, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    rows = jnp.arange(layer.max_blocks)
    active = layer.active_mask()
    ch = dict(layer.channels)
    ch["weight"] = jnp.where(
        active[:, None, None, None], 1.0, 0.0
    ) * jnp.ones_like(ch["weight"])
    ch["tsdf"] = jnp.full_like(ch["tsdf"], 100.0)  # far positive
    layer = dataclasses_replace(layer, channels=ch)
    # Fixed source at global voxel (0,0,0) with distance 0.05.
    layer = vlayer.set_voxels(
        layer, "tsdf", jnp.asarray([[0, 0, 0]], jnp.int32), jnp.asarray([0.05])
    )
    cfg = EsdfIntegratorConfig(
        max_distance_m=20.0, default_distance_m=20.0, min_distance_m=0.2,
        min_diff_m=1e-4,
    )
    esdf_layer = vlayer.make_layer("esdf", voxel, vps=8, max_blocks=64)
    esdf_layer, overflow, _ = esdf.update_from_tsdf_batch(esdf_layer, layer, cfg)

    q = np.array(
        [[1, 0, 0], [1, 1, 0], [1, 1, 1], [3, 2, 1], [-4, -4, -4], [5, 0, 0]],
        np.int32,
    )
    got, found = vlayer.get_voxels(esdf_layer, "esdf", jnp.asarray(q))
    assert bool(jnp.all(found))

    def chamfer(v):
        a = np.sort(np.abs(v))[::-1]  # a1 >= a2 >= a3
        return (
            (a[0] - a[1]) * 1.0
            + (a[1] - a[2]) * np.sqrt(2.0)
            + a[2] * np.sqrt(3.0)
        )

    want = np.array([0.05 + chamfer(v) * 1.0 for v in q], np.float32)
    np.testing.assert_allclose(np.asarray(got), want, atol=0.02)


def _integrated_scene(n_poses=6):
    w = sw.SimulationWorld()
    w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
    w.add_ground_level(0.0)
    w.min_bound = np.array([-5.0, -5.0, -0.5], np.float32)
    w.max_bound = np.array([5.0, 5.0, 5.5], np.float32)
    objs = w.freeze()
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    layer = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    poses = []
    for i in range(n_poses):
        a = 2 * np.pi * i / n_poses
        pos = np.array([4.0 * np.cos(a), 4.0 * np.sin(a), 2.0])
        fwd = -np.array([np.cos(a), np.sin(a), 0.0])
        z = fwd
        x = np.cross(z, [0, 0, 1.0]); x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z], 1).astype(np.float32)
        poses.append((jnp.asarray(R), jnp.asarray(pos, jnp.float32)))
    return w, objs, cfg, layer, poses


def _render_into(objs, pose, layer, cfg, method="simple", state=None):
    pts_G, colors, valid = sw.pointcloud_from_transform(
        objs, pose, (80, 60), np.deg2rad(60.0), max_dist=10.0
    )
    pts_C = sw.world_points_to_sensor(pose, pts_G, valid)
    layer, state, _ = tsdf.integrate_pointcloud(
        layer, pose, pts_C, colors, cfg, method=method, state=state
    )
    return layer


def test_esdf_batch_vs_incremental_and_gt():
    w, objs, tcfg, layer, poses = _integrated_scene()
    ecfg = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0,
        min_distance_m=TRUNC / 2,
    )
    esdf_inc = vlayer.make_layer("esdf", VOXEL, vps=16, max_blocks=2048)
    for pose in poses:
        layer = _render_into(objs, pose, layer, tcfg)
        esdf_inc, layer, overflow, _ = esdf.update_from_tsdf_incremental(
            esdf_inc, layer, ecfg
        )
        assert not bool(overflow)

    esdf_batch = vlayer.make_layer("esdf", VOXEL, vps=16, max_blocks=2048)
    esdf_batch, overflow, _ = esdf.update_from_tsdf_batch(
        esdf_batch, layer, ecfg
    )
    assert not bool(overflow)

    # Batch and incremental observe the same voxels and agree
    # (cc test: equal overlap counts, rmse within 1e-2).
    n_inc = evaluation.count_observed(esdf_inc)
    n_batch = evaluation.count_observed(esdf_batch)
    assert n_inc == n_batch
    det = evaluation.evaluate_layers_rmse(esdf_batch, esdf_inc)
    assert det.rmse < 2e-2, str(det)

    # Accuracy vs analytic GT (distances capped at max_distance).
    gt = sw.generate_gt_layer(
        objs, "esdf", VOXEL, w.min_bound, w.max_bound,
        max_dist=ecfg.max_distance_m, vps=16, max_blocks=4096,
    )
    det = evaluation.evaluate_layers_rmse(gt, esdf_batch,
                                          ignore_behind_test_surface=True)
    print("esdf vs gt:", det)
    assert det.num_evaluated_voxels > 10000
    assert det.rmse < 2 * VOXEL, str(det)


def test_compacted_sweep_matches_full():
    """max_active_blocks compaction must not change the fixpoint."""
    tsdf_layer = _plane_tsdf_layer()
    esdf_full = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
    cfg_full = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2
    )
    esdf_full, _, _ = esdf.update_from_tsdf_batch(esdf_full, tsdf_layer,
                                                  cfg_full)
    cfg_c = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2,
        max_active_blocks=128,
    )
    esdf_c = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
    esdf_c, _, _ = esdf.update_from_tsdf_batch(esdf_c, tsdf_layer, cfg_c)
    from voxblox_tpu.utils import evaluation
    det = evaluation.evaluate_layers_rmse(esdf_full, esdf_c)
    assert det.num_evaluated_voxels > 10000
    assert det.rmse < 1e-5, str(det)


def test_full_euclidean_point_source():
    """full_euclidean_distance: true euclidean metric from a point seed
    (vs the quasi-euclidean chamfer of the default mode)."""
    voxel = 1.0
    layer = vlayer.make_layer("tsdf", voxel, vps=8, max_blocks=64)
    blocks = np.stack(
        np.meshgrid([-1, 0], [-1, 0], [-1, 0], indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)
    layer, _ = vlayer.allocate_blocks(
        layer, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    active = layer.active_mask()
    ch = dict(layer.channels)
    ch["weight"] = jnp.where(
        active[:, None, None, None], 1.0, 0.0
    ) * jnp.ones_like(ch["weight"])
    ch["tsdf"] = jnp.full_like(ch["tsdf"], 100.0)
    layer = dataclasses_replace(layer, channels=ch)
    layer = vlayer.set_voxels(
        layer, "tsdf", jnp.asarray([[0, 0, 0]], jnp.int32), jnp.asarray([0.0])
    )
    cfg = EsdfIntegratorConfig(
        max_distance_m=20.0, default_distance_m=20.0, min_distance_m=0.2,
        min_diff_m=1e-4, full_euclidean_distance=True,
    )
    esdf_layer = vlayer.make_layer("esdf", voxel, vps=8, max_blocks=64)
    esdf_layer, overflow, _ = esdf.update_from_tsdf_batch(esdf_layer, layer, cfg)
    q = np.array(
        [[1, 0, 0], [1, 1, 0], [3, 2, 1], [-4, -4, -4], [5, 0, 0], [4, 3, 0]],
        np.int32,
    )
    got, found = vlayer.get_voxels(esdf_layer, "esdf", jnp.asarray(q))
    assert bool(jnp.all(found))
    want = np.linalg.norm(q.astype(np.float64), axis=1)
    # Parent-vector propagation is exact along explored paths but sweep
    # ordering can lock in slightly suboptimal parents on oblique
    # directions (~3% worst case here — the quasi-euclidean metric errs
    # 10.8% on the same query; the reference quotes "up to 8%" for its
    # own approximations, esdf_integrator.h:33-37).
    np.testing.assert_allclose(np.asarray(got), want, rtol=0.035)
    # Strictly better than quasi-euclidean everywhere.
    chamfer = []
    for v_ in q:
        a = np.sort(np.abs(v_))[::-1]
        chamfer.append((a[0]-a[1]) + (a[1]-a[2])*np.sqrt(2) + a[2]*np.sqrt(3))
    assert (np.asarray(got) <= np.asarray(chamfer) + 1e-3).all()


def test_esdf_bucketed_working_set_matches_uncompacted():
    """The adaptive working-set bucket (max_active_blocks) must not change
    the fixpoint; includes the retry path via a deliberately disjoint
    ESDF pre-allocation that makes the first bucket estimate undershoot."""
    tsdf_layer = _plane_tsdf_layer(max_blocks=512)
    base = EsdfIntegratorConfig(
        max_distance_m=1.2, default_distance_m=1.2, min_distance_m=0.2,
    )
    ref = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
    ref, ovf_ref, _ = esdf.update_from_tsdf_batch(ref, tsdf_layer, base)
    assert not bool(ovf_ref)

    import dataclasses
    cfg = dataclasses.replace(base, max_active_blocks=256)
    # Pre-allocate blocks far outside the TSDF so the esdf/tsdf union
    # exceeds max(n_esdf, n_tsdf): first bucket must overflow and retry.
    far = np.stack(
        np.meshgrid(np.arange(20, 24), np.arange(20, 24), np.arange(20, 24),
                    indexing="ij"), -1
    ).reshape(-1, 3).astype(np.int32)
    out = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
    out, _ = vlayer.allocate_blocks(
        out, jnp.asarray(far), jnp.ones(len(far), bool)
    )
    out, ovf, _ = esdf.update_from_tsdf_batch(out, tsdf_layer, cfg)
    assert not bool(ovf)

    # Compare voxelwise on the TSDF-covered rows.
    slot_of = vlayer.lookup_blocks(ref, tsdf_layer.block_ijk)
    slot_out = vlayer.lookup_blocks(out, tsdf_layer.block_ijk)
    act = np.asarray(tsdf_layer.active_mask())
    for sr, so, a in zip(np.asarray(slot_of), np.asarray(slot_out), act):
        if not a:
            continue
        np.testing.assert_allclose(
            np.asarray(ref.channels["esdf"][sr]),
            np.asarray(out.channels["esdf"][so]),
            atol=1e-5,
        )


def test_add_occupied_crust():
    """Batch seeding with add_occupied_crust (esdf_integrator.cc:155-163):
    unobserved voxels of processed blocks become hallucinated occupied
    (-default), the unknown boundary acts as a surface (free-space
    distances cap at the distance to it), and negative distances
    propagate into the crust."""
    import dataclasses

    # Plane z=0 observed only in a slab |z| < 0.42 (voxel centers up to
    # z=0.35): above the slab the map is unobserved.
    tsdf_layer = _plane_tsdf_layer()
    vpb = tsdf_layer.voxels_per_block
    lin = jnp.arange(vpb)
    local = grid.linear_to_local(lin, tsdf_layer.vps)
    gvi = tsdf_layer.block_ijk[:, None, :] * tsdf_layer.vps + local[None]
    z = grid.grid_index_to_center_point(gvi, VOXEL)[..., 2]
    ch = dict(tsdf_layer.channels)
    shape = ch["weight"].shape
    ch["weight"] = jnp.where(
        jnp.abs(z) < 0.42, ch["weight"].reshape(z.shape), 0.0
    ).reshape(shape)
    tsdf_layer = dataclasses.replace(tsdf_layer, channels=ch)

    cfg = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2,
    )
    outs = {}
    for name, crust in (("plain", False), ("crust", True)):
        e = vlayer.make_layer("esdf", VOXEL, vps=8, max_blocks=512)
        e, ovf, _ = esdf.update_from_tsdf_batch(
            e, tsdf_layer, dataclasses.replace(cfg, add_occupied_crust=crust)
        )
        assert not bool(ovf)
        outs[name] = e

    zs = np.arange(1, 12) * VOXEL + VOXEL / 2  # positive side only
    pts = np.stack([np.full_like(zs, 0.41), np.full_like(zs, 0.41), zs], -1)
    gvi_q = grid.point_to_grid_index(jnp.asarray(pts, jnp.float32), 1.0 / VOXEL)
    got_p, _ = vlayer.get_voxels(outs["plain"], "esdf", gvi_q)
    got_c, _ = vlayer.get_voxels(outs["crust"], "esdf", gvi_q)
    flag_c, _ = vlayer.get_voxels(outs["crust"], "esdf_flags", gvi_q)
    got_p, got_c = np.asarray(got_p), np.asarray(got_c)
    flag_c = np.asarray(flag_c)

    obs_band = zs <= 0.40
    # Plain: observed voxels read the plane distance, unobserved stay
    # unobserved (flags 0 there).
    np.testing.assert_allclose(got_p[obs_band], zs[obs_band], atol=0.01)
    # Crust: unobserved voxels are hallucinated occupied (negative).
    assert np.all(got_c[~obs_band] < 0.0)
    assert np.all(flag_c[~obs_band].astype(int)
                  & int(vlayer.ESDF_HALLUCINATED))
    # Observed free-space voxels now see a surface BELOW (plane) and
    # ABOVE (crust boundary at z=0.45, the first unobserved center):
    # distance <= min(z, dist to crust) + a diagonal step of slack.
    want = np.minimum(zs[obs_band], 0.45 - zs[obs_band])
    assert np.all(got_c[obs_band] <= want + np.sqrt(3) * VOXEL + 1e-5)
    # And the crust must NOT corrupt distances below the plane or the
    # fixed band: fixed-band values identical.
    fix_q = np.abs(zs) < 0.2
    np.testing.assert_allclose(got_c[fix_q], got_p[fix_q], atol=1e-6)


def test_capped_incremental_sweeps_carry_debt_and_converge():
    """max_outer_sweeps_incremental caps per-scan sweep work; rows still
    changing at the cap carry SWEEP_DEBT and re-enter later updates, so
    the amortized field converges to the exact batch fixpoint once the
    debt drains (the online-loop latency amortization)."""
    import dataclasses

    w, objs, tcfg, layer, poses = _integrated_scene(n_poses=4)
    capped = EsdfIntegratorConfig(
        max_distance_m=2.0, default_distance_m=2.0, min_distance_m=0.2,
        max_active_blocks=1024, max_outer_sweeps_incremental=1,
    )
    esdf_layer = vlayer.make_layer("esdf", VOXEL, vps=16, max_blocks=2048)
    debt_seen = False
    for pose in poses:
        layer = _render_into(objs, pose, layer, tcfg)
        esdf_layer, layer, ovf, _ = esdf.update_from_tsdf_incremental(
            esdf_layer, layer, capped
        )
        assert not bool(ovf)
        debt_seen |= bool(jnp.any(
            (esdf_layer.block_flags & vlayer.SWEEP_DEBT) != 0
        ))
    assert debt_seen, "cap=1 never left debt — test scene too easy"

    # Drain: no new scans; repeated capped updates must clear all debt.
    for _ in range(64):
        if not bool(jnp.any(
            (esdf_layer.block_flags & vlayer.SWEEP_DEBT) != 0
        )):
            break
        esdf_layer, layer, ovf, _ = esdf.update_from_tsdf_incremental(
            esdf_layer, layer, capped
        )
        assert not bool(ovf)
    assert not bool(jnp.any(
        (esdf_layer.block_flags & vlayer.SWEEP_DEBT) != 0
    )), "debt never drained"

    # The drained field equals the exact batch fixpoint.
    ref = vlayer.make_layer("esdf", VOXEL, vps=16, max_blocks=2048)
    ref, ovf, _ = esdf.update_from_tsdf_batch(
        ref, layer, dataclasses.replace(
            capped, max_outer_sweeps_incremental=None
        )
    )
    assert not bool(ovf)
    det = evaluation.evaluate_layers_rmse(ref, esdf_layer)
    assert det.num_evaluated_voxels > 10000
    assert det.num_non_overlapping_voxels == 0, str(det)
    assert det.rmse < 2e-3, str(det)
    assert det.max_error < 0.05, str(det)

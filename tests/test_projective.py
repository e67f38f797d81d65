"""Projective integrator: accuracy vs GT and consistency vs the DDA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import TsdfIntegratorConfig
from voxblox_tpu.ops import projective, tsdf
from voxblox_tpu.sim import world as sw
from voxblox_tpu.utils import evaluation

VOXEL = 0.10
TRUNC = 4 * VOXEL
RES = (80, 60)
FOV = np.deg2rad(60.0)


def _scene():
    w = sw.SimulationWorld()
    w.add_cylinder((0.0, 0.0, 2.0), 2.0, 4.0, color=(0, 255, 0))
    w.add_ground_level(0.0)
    w.min_bound = np.array([-5.0, -5.0, -0.5], np.float32)
    w.max_bound = np.array([5.0, 5.0, 5.5], np.float32)
    return w, w.freeze()


def _poses(n=8):
    out = []
    for i in range(n):
        a = 2 * np.pi * i / n
        pos = np.array([4.0 * np.cos(a), 4.0 * np.sin(a), 2.0])
        z = -np.array([np.cos(a), np.sin(a), 0.0])
        x = np.cross(z, [0, 0, 1.0]); x /= np.linalg.norm(x)
        y = np.cross(z, x)
        out.append((jnp.asarray(np.stack([x, y, z], 1), jnp.float32),
                    jnp.asarray(pos, jnp.float32)))
    return out


def _scan(objs, pose):
    pts_G, colors, valid = sw.pointcloud_from_transform(
        objs, pose, RES, FOV, max_dist=10.0
    )
    return sw.world_points_to_sensor(pose, pts_G, valid), colors


def test_projective_accuracy_vs_gt():
    w, objs = _scene()
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    layer = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    for pose in _poses():
        pts_C, colors = _scan(objs, pose)
        layer, overflow, _ = projective.integrate_pointcloud_projective(
            layer, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=FOV
        )
        assert not bool(overflow)
    gt = sw.generate_gt_layer(
        objs, "tsdf", VOXEL, w.min_bound, w.max_bound, max_dist=TRUNC,
        vps=16, max_blocks=4096,
    )
    det = evaluation.evaluate_layers_rmse(gt, layer,
                                          ignore_behind_test_surface=True)
    print("projective vs gt:", det)
    assert det.num_evaluated_voxels > 10000
    assert det.rmse < 2 * VOXEL, str(det)
    assert det.max_error < 4 * TRUNC + 1e-6


def test_projective_vs_simple_consistency():
    w, objs = _scene()
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    proj = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    simp = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    for pose in _poses(4):
        pts_C, colors = _scan(objs, pose)
        proj, _, _ = projective.integrate_pointcloud_projective(
            proj, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=FOV
        )
        simp, _, _ = tsdf.integrate_pointcloud(
            simp, pose, pts_C, colors, cfg, method="simple"
        )
    det = evaluation.evaluate_layers_rmse(simp, proj)
    print("projective vs simple:", det)
    n_s = evaluation.count_observed(simp)
    n_p = evaluation.count_observed(proj)
    # Total coverage within 30% (projective's conservative carving skips the
    # silhouette-uncertain free-space shell the DDA rays do touch), distances
    # on the overlap close, and near-surface coverage nearly complete.
    assert abs(n_s - n_p) / n_s < 0.30, (n_s, n_p)
    assert det.rmse < VOXEL, str(det)
    import numpy as _np
    vpb = simp.voxels_per_block
    slots = _np.asarray(vlayer.lookup_blocks(proj, simp.block_ijk))
    ok = _np.asarray(simp.active_mask()) & (slots >= 0)
    sw = _np.asarray(simp.channels["weight"]).reshape(-1, vpb)[ok]
    sd = _np.asarray(simp.channels["tsdf"]).reshape(-1, vpb)[ok]
    pw = _np.asarray(proj.channels["weight"]).reshape(-1, vpb)[slots[ok]]
    near = (sw > 1e-6) & (_np.abs(sd) < TRUNC / 2)
    coverage = (near & (pw > 1e-6)).sum() / max(near.sum(), 1)
    assert coverage > 0.85, coverage


def test_wide_fov_peripheral_blocks_not_culled():
    """At FOV 120° the corner view angle makes range >> depth: the HiZ
    pre-allocation cull must still admit peripheral blocks (its pixel
    footprint bound uses focal/depth via the kappa secant bound, not
    focal/range), and the bound must stay tight enough not to allocate
    the whole range shell."""
    w, objs = _scene()
    fov = np.deg2rad(120.0)
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    proj = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    simp = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    for pose in _poses(2):
        pts_G, colors, valid = sw.pointcloud_from_transform(
            objs, pose, RES, fov, max_dist=10.0
        )
        pts_C = sw.world_points_to_sensor(pose, pts_G, valid)
        proj, _, _ = projective.integrate_pointcloud_projective(
            proj, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=fov
        )
        simp, _, _ = tsdf.integrate_pointcloud(
            simp, pose, pts_C, colors, cfg, method="simple"
        )
    vpb = simp.voxels_per_block
    slots = np.asarray(vlayer.lookup_blocks(proj, simp.block_ijk))
    ok = np.asarray(simp.active_mask()) & (slots >= 0)
    s_w = np.asarray(simp.channels["weight"]).reshape(-1, vpb)[ok]
    s_d = np.asarray(simp.channels["tsdf"]).reshape(-1, vpb)[ok]
    p_w = np.asarray(proj.channels["weight"]).reshape(-1, vpb)[slots[ok]]
    near = (s_w > 1e-6) & (np.abs(s_d) < TRUNC / 2)
    coverage = (near & (p_w > 1e-6)).sum() / max(near.sum(), 1)
    assert coverage > 0.85, coverage
    # Tightness: don't allocate wildly more blocks than the DDA path.
    n_p = int(np.asarray(proj.active_mask()).sum())
    n_s = int(np.asarray(simp.active_mask()).sum())
    assert n_p < 2 * n_s, (n_p, n_s)


def test_range_image_binning():
    pts = jnp.asarray(
        [[0.0, 0.0, 2.0], [0.5, 0.0, 2.0], [0.0, 0.0, 4.0]], jnp.float32
    )
    cols = jnp.asarray([[255, 0, 0], [0, 255, 0], [0, 0, 255]], jnp.float32)
    img = projective.build_pinhole_range_image(
        pts, cols, (32, 24), np.deg2rad(60.0)
    )
    rng = np.asarray(img.rng)
    # Center pixel (cx = w/2 = 16): two points project there; min range
    # (2.0) wins over the farther one (4.0) along the same ray.
    cu, cv = 16, 12
    assert abs(rng[cv, cu] - 2.0) < 1e-5
    color = np.asarray(img.color)
    assert color[cv, cu, 0] == 255


def test_organized_matches_unstructured():
    """The scatter-free organized (min-pool) binning path integrates to
    the same map as scatter-binning the same rays unstructured."""
    w, objs = _scene()
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    res = (160, 120)
    fx = res[0] / (2.0 * np.tan(FOV / 2.0))
    intr = (fx, fx, res[0] / 2.0, res[1] / 2.0)
    org = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    uns = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    poses, scans = [], []
    for R, t in _poses(4):
        pts_C, colors, valid, intr2 = sw.organized_pointcloud_from_transform(
            objs, (R, t), res, FOV, max_dist=10.0
        )
        assert np.allclose(intr2, intr)
        org, ovf, b_ovf = projective.integrate_organized_projective(
            org, (R, t), pts_C, colors, cfg, intrinsics=intr, pool=2
        )
        assert not bool(ovf)
        uns, _, _ = projective.integrate_pointcloud_projective(
            uns, (R, t), pts_C.reshape(-1, 3), colors.reshape(-1, 3), cfg,
            resolution=(res[0] // 2, res[1] // 2), fov_h_rad=FOV,
        )
        poses.append((R, t))
        scans.append((pts_C, colors))
    det = evaluation.evaluate_layers_rmse(uns, org)
    print("organized vs unstructured:", det)
    assert det.num_evaluated_voxels > 10000
    # Same virtual resolution, nearly identical binning (sub-pixel center
    # offsets only) -> maps agree closely.
    assert det.rmse < 0.25 * VOXEL, str(det)

    # Batched organized == sequential organized.
    Rs = jnp.stack([p[0] for p in poses])
    ts = jnp.stack([p[1] for p in poses])
    pts = jnp.stack([s[0] for s in scans])
    cols = jnp.stack([s[1] for s in scans])
    bat = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    bat, ovf = projective.integrate_organized_projective_batch(
        bat, Rs, ts, pts, cols, cfg, intrinsics=intr, pool=2
    )
    assert not bool(ovf)
    det2 = evaluation.evaluate_layers_rmse(org, bat)
    assert det2.rmse < 2e-3, str(det2)


def test_batch_matches_sequential():
    """K-scan batched integration == K sequential calls (associative
    accumulation; the running average telescopes)."""
    w, objs = _scene()
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    poses = _poses(4)
    scans = [_scan(objs, p) for p in poses]
    seq = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    for pose, (pts_C, colors) in zip(poses, scans):
        seq, _, _ = projective.integrate_pointcloud_projective(
            seq, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=FOV
        )
    Rs = jnp.stack([p[0] for p in poses])
    ts = jnp.stack([p[1] for p in poses])
    pts = jnp.stack([s[0] for s in scans])
    cols = jnp.stack([s[1] for s in scans])
    bat = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    bat, overflow = projective.integrate_pointcloud_projective_batch(
        bat, Rs, ts, pts, cols, cfg, resolution=RES, fov_h_rad=FOV
    )
    assert not bool(overflow)
    det = evaluation.evaluate_layers_rmse(seq, bat)
    print("batch vs sequential:", det)
    assert det.num_evaluated_voxels > 10000
    assert det.rmse < 2e-3, str(det)
    n_s, n_b = evaluation.count_observed(seq), evaluation.count_observed(bat)
    assert abs(n_s - n_b) <= 0.01 * n_s, (n_s, n_b)


def test_free_slab_budget_overflow_and_equivalence():
    """A generous max_free_slabs gives identical results to the unbounded
    default; a 1-slab budget must raise the overflow flag (updates were
    dropped) on a carving-enabled scan."""
    w, objs = _scene()
    cfg = TsdfIntegratorConfig(
        default_truncation_distance=TRUNC, max_ray_length_m=10.0
    )
    pose = _poses(1)[0]
    pts_C, colors = _scan(objs, pose)

    ref = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    ref, ovf_ref, b_ref = projective.integrate_pointcloud_projective(
        ref, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=FOV
    )
    assert not bool(ovf_ref) and not bool(b_ref)

    gen = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    gen, ovf_gen, b_gen = projective.integrate_pointcloud_projective(
        gen, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=FOV,
        max_free_slabs=4096,
    )
    assert not bool(ovf_gen) and not bool(b_gen)
    slot_r = vlayer.lookup_blocks(ref, gen.block_ijk)
    act = np.asarray(gen.active_mask())
    for i, (sr, a) in enumerate(zip(np.asarray(slot_r), act)):
        if not a:
            continue
        np.testing.assert_allclose(
            np.asarray(gen.channels["tsdf"][i]),
            np.asarray(ref.channels["tsdf"][sr]), atol=1e-6,
        )

    # A 1-slab mixed budget must flag overflow (band slabs were dropped);
    # the free budget flags identically but this small scene may have no
    # FREE slabs at all, so the mixed budget is the deterministic probe.
    tiny = vlayer.make_layer("tsdf", VOXEL, vps=16, max_blocks=2048)
    tiny, pool_tiny, ovf_tiny = projective.integrate_pointcloud_projective(
        tiny, pose, pts_C, colors, cfg, resolution=RES, fov_h_rad=FOV,
        max_mixed_slabs=1,
    )
    assert bool(ovf_tiny) and not bool(pool_tiny)
    # Transactional overflow: the overflowed scan applied NOTHING (so a
    # grow-and-retry re-dispatch cannot double count).
    assert float(jnp.sum(tiny.channels["weight"])) == 0.0


def test_hiz_query_conservative_vs_bruteforce():
    """HiZ footprint bounds must CONTAIN the true min/max of the
    effective-range image over any pixel box — on a square image (square
    pyramid) and a 16:1 skewed image (anisotropic chain)."""
    rng = np.random.RandomState(7)
    for (h, w) in ((48, 64), (8, 128)):
        img = rng.uniform(1.0, 9.0, (h, w)).astype(np.float32)
        img[rng.uniform(size=(h, w)) < 0.3] = np.inf  # no-return pixels
        cfgl = TsdfIntegratorConfig(
            default_truncation_distance=0.4, max_ray_length_m=8.0
        )
        ri = projective.RangeImage(
            rng=jnp.asarray(img), color=jnp.zeros((h, w, 3)),
            params=jnp.zeros(4), kind="pinhole",
        )
        eff = np.asarray(projective._pix_eff(ri, cfgl))
        eff_band = np.where(np.isfinite(eff), eff, np.inf)
        hiz = jax.tree_util.tree_map(
            lambda x: x, projective._hiz_tables(jnp.asarray(eff))
        )
        boxes = []
        for _ in range(200):
            u0 = rng.randint(0, w); u1 = rng.randint(u0, w)
            v0 = rng.randint(0, h); v1 = rng.randint(v0, h)
            boxes.append((u0, u1, v0, v1))
        b = np.asarray(boxes, np.int32)
        lo, lo_band, hi = projective._hiz_query(
            hiz, jnp.asarray(b[:, 0]), jnp.asarray(b[:, 1]),
            jnp.asarray(b[:, 2]), jnp.asarray(b[:, 3]),
        )
        lo, lo_band, hi = np.asarray(lo), np.asarray(lo_band), np.asarray(hi)
        for i, (u0, u1, v0, v1) in enumerate(boxes):
            sub = eff[v0:v1 + 1, u0:u1 + 1]
            sub_band = eff_band[v0:v1 + 1, u0:u1 + 1]
            assert lo[i] <= sub.min() + 1e-6
            assert lo_band[i] <= sub_band.min() + 1e-6
            assert hi[i] >= sub.max() - 1e-6


def test_spherical_organized_matches_scatter_builder():
    """A raster-ordered lidar scan binned by the scatter-free organized
    builder equals the unstructured scatter builder's image (same fov)."""
    w = sw.SimulationWorld()
    w.add_ground_level(0.0)
    w.add_cylinder((3.0, 1.0, 1.0), 0.5, 2.0, color=(200, 50, 50))
    objs = w.freeze()
    reso = (128, 16)
    pos = jnp.asarray([0.0, 0.0, 1.2], jnp.float32)
    pts_C, cols, valid = sw.spherical_pointcloud_from_transform(
        objs, (jnp.eye(3), pos), reso, fov_up_deg=5.0, fov_down_deg=-30.0,
        max_dist=12.0,
    )
    a = projective.build_spherical_range_image(
        pts_C, cols, reso, fov_up_deg=5.0, fov_down_deg=-30.0
    )
    b = projective.build_spherical_range_image_organized(
        pts_C, cols, reso, fov_up_deg=5.0, fov_down_deg=-30.0
    )
    np.testing.assert_allclose(np.asarray(a.rng), np.asarray(b.rng),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(a.params), np.asarray(b.params))


def test_spherical_lidar_pipeline_accuracy():
    """Velodyne-style spherical scans (sparse, no-return pixels, carving
    off) integrate to an accurate band around ground + wall surfaces."""
    w = sw.SimulationWorld()
    w.add_ground_level(0.0)
    w.add_plane((0.0, 4.0, 2.0), (0.0, -1.0, 0.0), color=(200, 100, 50))
    objs = w.freeze()
    voxel = 0.2
    cfgl = TsdfIntegratorConfig(
        default_truncation_distance=4 * voxel, max_ray_length_m=15.0,
        voxel_carving_enabled=False,
    )
    reso = (256, 32)
    layer = vlayer.make_layer("tsdf", voxel, vps=16, max_blocks=1024)
    for i in range(2):
        pos = jnp.asarray([1.0 * i, 0.0, 1.5], jnp.float32)
        pts_C, cols, valid = sw.spherical_pointcloud_from_transform(
            objs, (jnp.eye(3), pos), reso, fov_up_deg=5.0,
            fov_down_deg=-30.0, max_dist=15.0,
        )
        layer, ovf, _ = projective.integrate_pointcloud_projective(
            layer, (jnp.eye(3), pos), pts_C, cols, cfgl,
            resolution=reso, kind="spherical",
        )
        assert not bool(ovf)
    # Observed voxels near the ground plane must carry |tsdf| ~ |z|.
    d = np.asarray(layer.channels["tsdf"])
    wgt = np.asarray(layer.channels["weight"])
    import voxblox_tpu.core.grid as gridm
    lin = np.arange(layer.voxels_per_block)
    local = np.asarray(gridm.linear_to_local(jnp.asarray(lin), layer.vps))
    gvi = (np.asarray(layer.block_ijk)[:, None, :] * layer.vps
           + local[None, :, :])
    centers = (gvi + 0.5) * voxel
    z = centers[..., 2].reshape(d.shape)
    y = centers[..., 1].reshape(d.shape)
    # Projective TSDF stores ALONG-RAY distances (reference semantics):
    # under grazing lidar incidence |d| >> |z|, so assert the SIGNED zero
    # crossing sits at the plane: observed voxels clearly above ground
    # are positive, clearly below are negative.
    m = (wgt > 1e-6) & (y < 3.0)
    assert m.sum() > 200
    above = m & (z > 0.5 * voxel)
    below = m & (z < -0.5 * voxel)
    assert above.sum() > 100 and below.sum() > 20
    assert (d[above] > 0).mean() > 0.99
    assert (d[below] < 0).mean() > 0.9

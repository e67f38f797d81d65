"""Sphere tracing + differentiable renderer: depth accuracy vs analytic,
pixel gradients vs finite differences."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.ops import render
from voxblox_tpu.sim import world as sw


def _sphere_layer(voxel=0.1, radius=1.0, center=(0.0, 0.0, 0.0)):
    w = sw.SimulationWorld()
    w.add_sphere(center, radius, color=(250, 10, 10))
    objs = w.freeze()
    bound = radius + 10 * voxel
    c = np.asarray(center)
    return objs, sw.generate_gt_layer(
        objs, "tsdf", voxel, c - bound, c + bound, max_dist=6 * voxel,
        vps=8, max_blocks=2048,
    )


def test_surface_distance_reference_stepper():
    objs, layer = _sphere_layer()
    origins = jnp.asarray([[-3.0, 0.0, 0.0], [0.0, -3.0, 0.0],
                           [-3.0, 0.05, 0.02]], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
                       jnp.float32)
    t, hit = render.surface_distance_along_rays(layer, origins, dirs, 10.0)
    t, hit = np.asarray(t), np.asarray(hit)
    assert hit.all()
    # Surface at distance 2 from each origin (sphere radius 1 at origin).
    np.testing.assert_allclose(t[:2], 2.0, atol=0.15)


def test_ray_missing_surface():
    objs, layer = _sphere_layer()
    origins = jnp.asarray([[-3.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, hit = render.surface_distance_along_rays(layer, origins, dirs, 4.0)
    assert not bool(hit[0])


def test_fit_dense_grid_dim():
    """The dense grid auto-sizes to the active bbox (multiple of 16,
    min 16): small maps get the packed march, wide maps still cover
    every block instead of silently treating far ones as empty."""
    objs, layer = _sphere_layer()
    d = render.fit_dense_grid_dim(layer)
    assert d % 16 == 0 and 16 <= d <= 32
    ext = np.asarray(layer.block_ijk)[np.asarray(layer.active_mask())]
    extent = int((ext.max(0) - ext.min(0)).max()) + 1
    assert d >= extent


def test_refinement_pull_schedule_consistency():
    """The tunable refinement pass counts (nearest_pulls,
    trilinear_pulls) must agree with the defaults to sub-voxel depth on
    hit rays: the settling pulls pick the Newton linearization point,
    not the surface itself (the TPU default (4,1) was chosen against
    analytic GT — see render_depth's refinement comment)."""
    objs, layer = _sphere_layer()
    n = 256
    rng = np.random.RandomState(5)
    d = np.array([[1.0, 0.0, 0.0]] * n, np.float32) + rng.uniform(
        -0.15, 0.15, (n, 3)
    ).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    origins = jnp.broadcast_to(
        jnp.asarray([-3.0, 0.0, 0.0], jnp.float32), dirs.shape
    )
    dep0, hit0 = render.render_depth(layer, origins, dirs, 8.0)
    for np_, tp_ in [(3, 2), (5, 1)]:
        dep, hit = render.render_depth(
            layer, origins, dirs, 8.0, nearest_pulls=np_,
            trilinear_pulls=tp_,
        )
        both = np.asarray(hit0) & np.asarray(hit)
        assert both.mean() > 0.95
        diff = np.abs(np.asarray(dep) - np.asarray(dep0))[both]
        assert np.median(diff) < 0.1 * layer.voxel_size, (np_, tp_)
        assert (diff < 0.5 * layer.voxel_size).mean() > 0.98, (np_, tp_)


def test_render_depth_accuracy():
    objs, layer = _sphere_layer()
    n = 32
    ang = np.linspace(-0.25, 0.25, n)
    dirs = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], -1).astype(
        np.float32
    )
    origins = np.tile([-3.0, 0.0, 0.0], (n, 1)).astype(np.float32)
    depth, hit = render.render_depth(
        layer, jnp.asarray(origins), jnp.asarray(dirs), 8.0
    )
    depth, hit = np.asarray(depth), np.asarray(hit)
    assert hit.all()
    # Analytic: |o + t d| = r with o = (-3, 0, 0).
    b = -3.0 * dirs[:, 0]
    disc = b * b - (9.0 - 1.0)
    t_true = -b - np.sqrt(disc)
    np.testing.assert_allclose(depth, t_true, atol=0.04)


def test_render_color():
    objs, layer = _sphere_layer()
    origins = jnp.asarray([[-3.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    depth, color, hit = render.render_depth(
        layer, origins, dirs, 8.0, with_color=True
    )
    assert bool(hit[0])
    c = np.asarray(color[0])
    assert abs(c[0] - 250) < 20 and c[1] < 40 and c[2] < 40


def test_depth_gradients_match_finite_differences():
    """Pixel-depth gradients w.r.t. voxel SDF values vs central FD."""
    objs, layer = _sphere_layer(voxel=0.125)
    origins = jnp.asarray(
        [[-3.0, 0.0, 0.0], [-3.0, 0.11, 0.07]], jnp.float32
    )
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)

    def loss(tsdf_channel):
        ch = dict(layer.channels)
        ch["tsdf"] = tsdf_channel
        lyr = dataclasses.replace(layer, channels=ch)
        depth, hit = render.render_depth(lyr, origins, dirs, 8.0)
        return jnp.sum(depth)

    base = layer.channels["tsdf"]
    g = jax.grad(loss)(base)
    g = np.asarray(g)
    nz = np.argwhere(np.abs(g) > 1e-3)
    assert len(nz) >= 8, "expected gradients on corner voxels"
    f0 = float(loss(base))
    eps = 1e-3
    checked = 0
    for idx in nz[:: max(1, len(nz) // 6)][:6]:
        idx = tuple(idx)
        fp = float(loss(base.at[idx].add(eps)))
        fm = float(loss(base.at[idx].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - g[idx]) < 0.08 * max(1.0, abs(fd)), (
            idx, fd, g[idx]
        )
        checked += 1
    assert checked >= 4


def test_render_depth_image_shape():
    objs, layer = _sphere_layer()
    R = jnp.eye(3)
    # camera at -3 x looking +x: camera +z -> world +x.
    Rmat = jnp.asarray(
        [[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]
    )
    T = (Rmat, jnp.asarray([-3.0, 0.0, 0.0]))
    depth, hit = render.render_depth_image(
        layer, T, (40.0, 40.0, 16.0, 12.0), (32, 24), 8.0
    )
    assert depth.shape == (24, 32)
    assert bool(hit[12, 16])
    assert 1.8 < float(depth[12, 16]) < 2.2


def test_render_rays_outside_map_miss():
    """Rays that never enter the active-map bounding box terminate
    immediately at max_distance with hit=False (bbox clipping)."""
    objs, layer = _sphere_layer()
    origins = jnp.asarray([[8.0, 0.0, 0.0], [0.0, 9.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], jnp.float32)
    depth, hit = render.render_depth(layer, origins, dirs, 5.0)
    assert not np.asarray(hit).any()
    np.testing.assert_allclose(np.asarray(depth), 5.0)


def test_render_survivor_compaction_matches_chunked():
    """A large batch (compaction phase active: n//8 survivor buffer) must
    produce the same depths as the same rays rendered in tiny chunks
    (which stay on the full-width path)."""
    objs, layer = _sphere_layer()
    n = 1024
    rng = np.random.RandomState(3)
    ang = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    elev = rng.uniform(-0.3, 0.3, n).astype(np.float32)
    dirs = np.stack(
        [np.sin(ang) * np.cos(elev), np.cos(ang) * np.cos(elev),
         np.sin(elev)], -1
    ).astype(np.float32)
    origins = np.broadcast_to(
        np.asarray([0.0, -3.0, 0.0], np.float32), dirs.shape
    )
    d_big, h_big = render.render_depth(
        layer, jnp.asarray(origins), jnp.asarray(dirs), 8.0
    )
    for s0 in range(0, n, 128):
        d_c, h_c = render.render_depth(
            layer,
            jnp.asarray(origins[s0:s0 + 128]),
            jnp.asarray(dirs[s0:s0 + 128]),
            8.0,
        )
        np.testing.assert_allclose(
            np.asarray(d_big[s0:s0 + 128]), np.asarray(d_c), atol=1e-4
        )
        assert (np.asarray(h_big[s0:s0 + 128]) == np.asarray(h_c)).all()


def test_color_gradients_match_finite_differences():
    """Pixel-COLOR gradients w.r.t. the voxel color channel AND (through
    the moving hit point) the SDF channel, vs central finite differences
    — the remaining legs of the 'pixel gradients w.r.t. voxel
    SDF/weight/color' contract (depth-vs-SDF is covered above)."""
    objs, layer = _sphere_layer(voxel=0.125)
    # Spatially-varying red channel ALONG THE RAY AXIS so the moving hit
    # position feeds the color: r = 100 + 40 * x of the voxel center.
    from voxblox_tpu.core import grid as vgrid

    lin = jnp.arange(layer.voxels_per_block)
    local = vgrid.linear_to_local(lin, layer.vps)
    gvi = layer.block_ijk[:, None, :] * layer.vps + local[None]
    x = vgrid.grid_index_to_center_point(gvi, layer.voxel_size)[..., 0]
    ch = dict(layer.channels)
    shape = ch["color"].shape
    col = jnp.stack(
        [100.0 + 40.0 * x, jnp.full_like(x, 10.0), jnp.full_like(x, 10.0)],
        axis=-1,
    )
    ch["color"] = col.reshape(shape)
    layer = dataclasses.replace(layer, channels=ch)

    origins = jnp.asarray(
        [[-3.0, 0.1, 0.05], [-3.0, -0.23, 0.11]], jnp.float32
    )
    dirs = jnp.asarray([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)

    def loss(color_channel, tsdf_channel):
        ch2 = dict(layer.channels)
        ch2["color"] = color_channel
        ch2["tsdf"] = tsdf_channel
        lyr = dataclasses.replace(layer, channels=ch2)
        depth, color, hit = render.render_depth(
            lyr, origins, dirs, 8.0, with_color=True
        )
        return jnp.sum(color[:, 0]) + 0.1 * jnp.sum(color[:, 1])

    base_c = layer.channels["color"]
    base_t = layer.channels["tsdf"]
    gc, gt = jax.grad(loss, argnums=(0, 1))(base_c, base_t)
    gc, gt = np.asarray(gc), np.asarray(gt)

    # Color-channel gradients: exact trilinear weights — tight FD match.
    nz = np.argwhere(np.abs(gc) > 1e-3)
    assert len(nz) >= 8, "expected color gradients on stencil voxels"
    checked = 0
    for idx in nz[:: max(1, len(nz) // 5)][:5]:
        idx = tuple(idx)
        eps = 1e-2
        fp = float(loss(base_c.at[idx].add(eps), base_t))
        fm = float(loss(base_c.at[idx].add(-eps), base_t))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - gc[idx]) < 0.05 * max(1.0, abs(fd)), (
            idx, fd, gc[idx]
        )
        checked += 1
    assert checked >= 3

    # SDF-channel gradients of the COLOR loss (hit point moves along the
    # ray; color varies with y only through the refined position), FD
    # with a looser bar (the march's iterative refinement linearizes).
    nzt = np.argwhere(np.abs(gt) > 1e-2)
    assert len(nzt) >= 4, "expected color->sdf gradients"
    checked = 0
    for idx in nzt[:: max(1, len(nzt) // 4)][:4]:
        idx = tuple(idx)
        eps = 2e-3
        fp = float(loss(base_c, base_t.at[idx].add(eps)))
        fm = float(loss(base_c, base_t.at[idx].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - gt[idx]) < 0.15 * max(1.0, abs(fd)), (
            idx, fd, gt[idx]
        )
        checked += 1
    assert checked >= 2


def test_packed_march_matches_general_path():
    """Maps fitting a <= 32-block grid use the packed single-gather
    march; depths, hits and SDF gradients must match the general
    (block-grid + field) path."""
    objs, layer = _sphere_layer()
    n = 512
    rng = np.random.RandomState(11)
    origins = jnp.asarray(np.stack([
        rng.uniform(-3.5, -2.5, n),
        rng.uniform(-0.3, 0.3, n),
        rng.uniform(-0.3, 0.3, n),
    ], -1).astype(np.float32))
    d = np.array([[1.0, 0.0, 0.0]] * n, np.float32) + rng.uniform(
        -0.2, 0.2, (n, 3)
    ).astype(np.float32)
    dirs = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    dep_g, hit_g = render.render_depth(
        layer, origins, dirs, 8.0, dense_grid_dim=64
    )  # general path
    dep_p, hit_p = render.render_depth(
        layer, origins, dirs, 8.0, dense_grid_dim=16
    )  # packed path
    np.testing.assert_array_equal(np.asarray(hit_g), np.asarray(hit_p))
    # The two marches stop at slightly different gradient-stopped points
    # (the packed path steps through near-surface free blocks by their
    # real SDF instead of block exits); the shared refinement + Newton
    # agree to mm for all but a few grazing rays whose pulls settle in
    # an adjacent sub-voxel basin (bounded by half a voxel).
    diff = np.abs(np.asarray(dep_g) - np.asarray(dep_p))
    assert (diff < 3e-3).mean() > 0.98, diff.max()
    assert diff.max() < 0.5 * layer.voxel_size, diff.max()

    # FD-check the PACKED path's SDF gradients (the general path has its
    # own FD test above).
    def loss(tsdf_channel):
        ch = dict(layer.channels)
        ch["tsdf"] = tsdf_channel
        lyr = dataclasses.replace(layer, channels=ch)
        depth, hit = render.render_depth(
            lyr, origins, dirs, 8.0, dense_grid_dim=16
        )
        return jnp.sum(jnp.where(hit, depth, 0.0))

    base = layer.channels["tsdf"]
    g_p = np.asarray(jax.grad(loss)(base))
    nz = np.argwhere(np.abs(g_p) > 1e-2)
    assert len(nz) >= 8
    f_checked = 0
    eps = 1e-3
    for idx in nz[:: max(1, len(nz) // 5)][:5]:
        idx = tuple(idx)
        fp = float(loss(base.at[idx].add(eps)))
        fm = float(loss(base.at[idx].add(-eps)))
        fd = (fp - fm) / (2 * eps)
        assert abs(fd - g_p[idx]) < 0.1 * max(1.0, abs(fd)), (
            idx, fd, g_p[idx]
        )
        f_checked += 1
    assert f_checked >= 3

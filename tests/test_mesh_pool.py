"""Device-resident mesh pool: equivalence with the host meshing path,
per-block capacity overflow fallback, incremental bucket semantics."""

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import MeshIntegratorConfig
from voxblox_tpu.ops import mesh as vmesh
from voxblox_tpu.sim import world as sw


def _sphere_gt_layer(voxel=0.1, radius=1.0):
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 0.0), radius, color=(200, 30, 40))
    objs = w.freeze()
    bound = radius + 6 * voxel
    return sw.generate_gt_layer(
        objs, "tsdf", voxel, (-bound,) * 3, (bound,) * 3,
        max_dist=4 * voxel, vps=8, max_blocks=512,
    )


def _drain(layer, pool, cfg, bucket):
    for _ in range(64):
        layer, pool, more = vmesh.update_mesh_pool(
            layer, pool, cfg, bucket=bucket, only_updated=True
        )
        if not bool(more):
            return layer, pool
    raise AssertionError("mesh pool drain did not converge")


def _host_mesh(layer, cfg):
    ml = vmesh.MeshLayer(layer.block_size)
    vmesh.generate_mesh(layer, ml, cfg, only_updated=False,
                        clear_updated_flag=False)
    return ml


def _assert_same_mesh(ml_pool, ml_host):
    assert set(ml_pool.blocks) == set(ml_host.blocks)
    for key in ml_host.blocks:
        a, b = ml_pool.blocks[key], ml_host.blocks[key]
        np.testing.assert_allclose(a.vertices, b.vertices, atol=1e-6)
        np.testing.assert_array_equal(a.colors, b.colors)
        np.testing.assert_allclose(a.normals, b.normals, atol=1e-5)


def test_mesh_pool_matches_host_path():
    layer = _sphere_gt_layer()
    cfg = MeshIntegratorConfig()
    ml_host = _host_mesh(layer, cfg)
    assert ml_host.num_vertices() > 1000

    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg, bucket=32)
    assert not bool(jnp.any(pool.overflow_rows))
    ml_pool = vmesh.pool_to_mesh_layer(layer, pool, vmesh.MeshLayer(
        layer.block_size), cfg)
    _assert_same_mesh(ml_pool, ml_host)


def test_mesh_pool_overflow_rows_fall_back_to_dense():
    layer = _sphere_gt_layer()
    cfg = MeshIntegratorConfig(device_tri_cap=16)  # force per-row overflow
    ml_host = _host_mesh(layer, cfg)

    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg, bucket=64)
    assert bool(jnp.any(pool.overflow_rows))
    ml_pool = vmesh.pool_to_mesh_layer(layer, pool, vmesh.MeshLayer(
        layer.block_size), cfg)
    _assert_same_mesh(ml_pool, ml_host)


def test_mesh_pool_cube_budget_spill_falls_back_to_dense():
    """A march_cube_budget smaller than the surface-cube count flags the
    spilled rows (dense fallback on export) and never corrupts the
    mesh."""
    layer = _sphere_gt_layer()
    cfg = MeshIntegratorConfig(march_cube_budget=512)  # scene needs more
    ml_host = _host_mesh(layer, cfg)
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg, bucket=64)
    assert bool(jnp.any(pool.overflow_rows))  # budget spill flagged
    ml_pool = vmesh.pool_to_mesh_layer(layer, pool, vmesh.MeshLayer(
        layer.block_size), cfg)
    _assert_same_mesh(ml_pool, ml_host)

    # A generous budget spills nothing and matches exactly too.
    cfg2 = MeshIntegratorConfig(march_cube_budget=32768)
    layer = vlayer.mark_dirty(
        layer, jnp.arange(layer.max_blocks, dtype=jnp.int32),
        layer.active_mask(), vlayer.DIRTY_MESH,
    )
    pool2 = vmesh.make_mesh_pool(layer.max_blocks, cfg2.device_tri_cap)
    layer, pool2 = _drain(layer, pool2, cfg2, bucket=64)
    assert not bool(jnp.any(pool2.overflow_rows))
    ml2 = vmesh.pool_to_mesh_layer(layer, pool2, vmesh.MeshLayer(
        layer.block_size), cfg2)
    _assert_same_mesh(ml2, ml_host)


def test_mesh_pool_incremental_bucket_semantics():
    """A bucket smaller than the dirty set meshes only the first rows,
    leaves the rest dirty (more=True) and never loses blocks."""
    layer = _sphere_gt_layer()
    cfg = MeshIntegratorConfig()
    n_dirty = int(np.asarray(
        vlayer.dirty_mask(layer, vlayer.DIRTY_MESH)).sum())
    assert n_dirty > 8
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool, more = vmesh.update_mesh_pool(layer, pool, cfg, bucket=8)
    assert bool(more)
    left = int(np.asarray(vlayer.dirty_mask(layer, vlayer.DIRTY_MESH)).sum())
    assert left == n_dirty - 8
    layer, pool = _drain(layer, pool, cfg, bucket=8)
    assert int(np.asarray(
        vlayer.dirty_mask(layer, vlayer.DIRTY_MESH)).sum()) == 0
    ml_pool = vmesh.pool_to_mesh_layer(layer, pool, vmesh.MeshLayer(
        layer.block_size), cfg)
    _assert_same_mesh(ml_pool, _host_mesh(layer, cfg))


def test_mesh_pool_drops_removed_blocks():
    layer = _sphere_gt_layer()
    cfg = MeshIntegratorConfig()
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg, bucket=64)
    n_before = len(vmesh.pool_to_mesh_layer(
        layer, pool, vmesh.MeshLayer(layer.block_size), cfg).blocks)
    layer = vlayer.remove_distant_blocks(
        layer, jnp.asarray([0.0, 0.0, 0.0]), 0.9
    )
    # One (empty) update refreshes the active mask inside the pool.
    layer, pool, _ = vmesh.update_mesh_pool(layer, pool, cfg, bucket=8)
    ml = vmesh.pool_to_mesh_layer(
        layer, pool, vmesh.MeshLayer(layer.block_size), cfg
    )
    assert 0 < len(ml.blocks) < n_before
    active_keys = {
        tuple(map(int, k)) for k, a in zip(
            np.asarray(layer.block_ijk), np.asarray(layer.active_mask())
        ) if a
    }
    assert set(ml.blocks).issubset(active_keys)

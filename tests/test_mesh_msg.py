"""Incremental mesh wire format: round trip, delta semantics, deletion.

Reference: voxblox_msgs/msg/MeshBlock.msg:1-10 (uint16-quantized block
deltas), voxblox_ros/mesh_vis.h:153-231 (generateVoxbloxMeshMsg),
voxblox_rviz_plugin/voxblox_mesh_visual.cc:29-60 (decode)."""

import jax.numpy as jnp
import numpy as np

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.core.config import MeshIntegratorConfig
from voxblox_tpu.io import mesh_msg as wire
from voxblox_tpu.ops import mesh as vmesh
from voxblox_tpu.sim import world as sw


def _sphere_layer(voxel=0.1, radius=1.0):
    w = sw.SimulationWorld()
    w.add_sphere((0.0, 0.0, 0.0), radius, color=(200, 30, 40))
    objs = w.freeze()
    bound = radius + 6 * voxel
    return sw.generate_gt_layer(
        objs, "tsdf", voxel, (-bound,) * 3, (bound,) * 3,
        max_dist=4 * voxel, vps=8, max_blocks=512,
    )


def _drain(layer, pool, cfg, bucket=64):
    for _ in range(64):
        layer, pool, more = vmesh.update_mesh_pool(
            layer, pool, cfg, bucket=bucket, only_updated=True
        )
        if not bool(more):
            return layer, pool
    raise AssertionError("drain did not converge")


def test_mesh_msg_round_trip_matches_export():
    layer = _sphere_layer()
    cfg = MeshIntegratorConfig()
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg)

    ml_ref = vmesh.pool_to_mesh_layer(
        layer, pool, vmesh.MeshLayer(layer.block_size), cfg
    )
    msg, layer = wire.encode_mesh_msg(layer, pool)
    data = wire.serialize_mesh_msg(msg)
    assert len(data) == wire.message_bytes(msg)
    msg2 = wire.deserialize_mesh_msg(data)
    ml = wire.apply_mesh_msg(vmesh.MeshLayer(layer.block_size), msg2)

    assert set(ml.blocks) == set(ml_ref.blocks)
    # Quantization step = 2 * block_size / 65535 (MeshBlock.msg:1).
    qstep = 2.0 * layer.block_size / 65535.0
    for key in ml_ref.blocks:
        a, b = ml.blocks[key], ml_ref.blocks[key]
        np.testing.assert_allclose(a.vertices, b.vertices,
                                   atol=0.75 * qstep)
        np.testing.assert_array_equal(a.colors, b.colors)


def test_mesh_msg_is_incremental():
    layer = _sphere_layer()
    cfg = MeshIntegratorConfig()
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg)

    msg, layer = wire.encode_mesh_msg(layer, pool)
    assert len(msg.blocks) > 4

    # Nothing re-meshed since the publish -> empty delta.
    msg2, layer = wire.encode_mesh_msg(layer, pool)
    assert msg2.blocks == []

    # Re-mesh ONE row -> exactly that block ships.
    row = int(np.nonzero(np.asarray(layer.active_mask()))[0][0])
    layer = vlayer.mark_dirty(
        layer, jnp.asarray([row]), jnp.asarray([True]), vlayer.DIRTY_MESH
    )
    layer, pool, _ = vmesh.update_mesh_pool(layer, pool, cfg, bucket=8)
    msg3, layer = wire.encode_mesh_msg(layer, pool)
    assert [b.index for b in msg3.blocks] == [
        tuple(int(v) for v in np.asarray(layer.block_ijk)[row])
    ]


def test_mesh_msg_empty_block_deletes():
    layer = _sphere_layer()
    cfg = MeshIntegratorConfig()
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg)
    msg, layer = wire.encode_mesh_msg(layer, pool)
    ml = wire.apply_mesh_msg(vmesh.MeshLayer(layer.block_size), msg)
    key = next(iter(ml.blocks))

    deletion = wire.MeshMsg(
        block_edge_length=layer.block_size,
        blocks=[wire.MeshBlockMsg(
            index=key,
            x=np.zeros(0, np.uint16), y=np.zeros(0, np.uint16),
            z=np.zeros(0, np.uint16), r=np.zeros(0, np.uint8),
            g=np.zeros(0, np.uint8), b=np.zeros(0, np.uint8),
        )],
    )
    data = wire.serialize_mesh_msg(deletion)
    wire.apply_mesh_msg(ml, wire.deserialize_mesh_msg(data))
    assert key not in ml.blocks


def test_server_publish_mesh_msg_streams_deltas():
    """TsdfServer.publish_mesh_msg: first publish ships the whole map,
    a new scan ships only its re-meshed blocks, and a subscriber
    applying the deltas converges to the server's own export."""
    import numpy as np

    from voxblox_tpu.core.config import MapConfig, TsdfIntegratorConfig
    from voxblox_tpu.server.mapper import TsdfServer
    from voxblox_tpu.sim import world as sw2

    w = sw2.SimulationWorld()
    w.add_sphere((0.0, 0.0, 1.0), 0.8, color=(200, 40, 40))
    w.add_ground_level(-0.5)
    objs = w.freeze()
    srv = TsdfServer(
        MapConfig(voxel_size=0.1, voxels_per_side=8, max_blocks=2048),
        integrator_config=TsdfIntegratorConfig(
            default_truncation_distance=0.4, max_ray_length_m=5.0
        ),
        method="projective",
        projective_resolution=(40, 30),
        projective_fov_deg=60.0,
    )
    sub = vmesh.MeshLayer(srv.layer.block_size)

    import jax.numpy as jnp2

    def scan(i):
        a = 2 * np.pi * i / 8
        pos = jnp2.asarray([2.5 * np.cos(a), 2.5 * np.sin(a), 1.0],
                           jnp2.float32)
        view = jnp2.asarray([-np.cos(a), -np.sin(a), 0.0], jnp2.float32)
        R = sw2.rotation_from_two_vectors(jnp2.asarray([0.0, 0.0, 1.0]),
                                          view)
        pts, cols, _, _ = sw2.organized_pointcloud_from_transform(
            objs, (R, pos), (40, 30), np.deg2rad(60.0), 5.0
        )
        srv.insert_pointcloud((R, pos), pts.reshape(-1, 3),
                              cols.reshape(-1, 3))

    scan(0)
    data0 = srv.publish_mesh_msg()
    msg0 = wire.deserialize_mesh_msg(data0)
    assert len(msg0.blocks) > 2
    wire.apply_mesh_msg(sub, msg0)

    # No new data -> empty delta.
    assert wire.deserialize_mesh_msg(srv.publish_mesh_msg()).blocks == []

    scan(1)
    data1 = srv.publish_mesh_msg()
    msg1 = wire.deserialize_mesh_msg(data1)
    assert 0 < len(msg1.blocks)
    wire.apply_mesh_msg(sub, msg1)

    ml = srv.export_mesh_layer()
    assert set(sub.blocks) == set(ml.blocks)
    qstep = 2.0 * srv.layer.block_size / 65535.0
    for key in ml.blocks:
        np.testing.assert_allclose(
            sub.blocks[key].vertices, ml.blocks[key].vertices,
            atol=0.75 * qstep,
        )


def test_mesh_msg_quantization_granularity():
    """Worst-case vertex error is half the wire step (MeshBlock.msg:1:
    'rounded to nearest BLOCK_EDGE_LENGTH/65535' in 2*block units)."""
    layer = _sphere_layer()
    cfg = MeshIntegratorConfig()
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg)
    msg, _ = wire.encode_mesh_msg(layer, pool)
    qstep = 2.0 * layer.block_size / 65535.0
    ml_ref = vmesh.pool_to_mesh_layer(
        layer, pool, vmesh.MeshLayer(layer.block_size), cfg
    )
    worst = 0.0
    for blk in msg.blocks:
        if len(blk.x) == 0:  # empty delta = deletion, nothing to compare
            continue
        got = wire.dequantize_block(msg, blk)
        ref = ml_ref.blocks[blk.index].vertices
        worst = max(worst, float(np.abs(got - ref).max()))
    assert worst <= 0.5 * qstep + 1e-6


def test_mesh_msg_overflow_rows_encode_dense():
    """Rows whose march overflowed tri_cap must NOT ship their partial
    pool content (a block msg REPLACES the block downstream); the wire
    path encodes them through the dense fallback, matching the export
    path's geometry exactly."""
    layer = _sphere_layer()
    cfg = MeshIntegratorConfig(device_tri_cap=16)  # force per-row overflow
    pool = vmesh.make_mesh_pool(layer.max_blocks, cfg.device_tri_cap)
    layer, pool = _drain(layer, pool, cfg)
    assert bool(jnp.any(pool.overflow_rows & layer.active_mask()))

    ml_ref = vmesh.pool_to_mesh_layer(
        layer, pool, vmesh.MeshLayer(layer.block_size), cfg
    )  # export path: dense fallback for overflow rows
    msg, layer = wire.encode_mesh_msg(layer, pool)
    ml = wire.apply_mesh_msg(vmesh.MeshLayer(layer.block_size), msg)

    assert set(ml.blocks) == set(ml_ref.blocks)
    qstep = 2.0 * layer.block_size / 65535.0
    ovf_rows = np.asarray(pool.overflow_rows) & np.asarray(
        layer.active_mask()
    )
    ijk = np.asarray(layer.block_ijk)
    checked_ovf = 0
    for key in ml_ref.blocks:
        a, b = ml.blocks[key], ml_ref.blocks[key]
        assert len(a.vertices) == len(b.vertices), key
        np.testing.assert_allclose(
            np.sort(a.vertices, axis=0), np.sort(b.vertices, axis=0),
            atol=0.75 * qstep,
        )
        if any((ijk[r] == key).all() for r in np.nonzero(ovf_rows)[0]):
            checked_ovf += 1
            # Overflowed rows carry MORE triangles than the 16-cap.
            assert len(a.vertices) > 16 * 3
    assert checked_ovf > 0

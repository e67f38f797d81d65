"""Serialization round trips for all voxel types (port of the reference
test_protobuf.cc methodology) + PLY + npz checkpoints."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from voxblox_tpu.core import layer as vlayer
from voxblox_tpu.io import layer_io, npz_io, ply
from voxblox_tpu.utils import evaluation


def _random_layer(rng, layer_type, vps=8, n_blocks=20):
    layer = vlayer.make_layer(layer_type, 0.1, vps=vps, max_blocks=64)
    blocks = np.unique(
        rng.integers(-6, 6, size=(n_blocks * 2, 3)).astype(np.int32), axis=0
    )[:n_blocks]
    layer, _ = vlayer.allocate_blocks(
        layer, jnp.asarray(blocks), jnp.ones(len(blocks), bool)
    )
    import dataclasses
    ch = dict(layer.channels)
    for name, arr in ch.items():
        a = np.asarray(arr)
        if a.dtype == np.float32:
            vals = rng.uniform(-2, 2, a.shape).astype(np.float32)
        elif a.dtype == np.uint8:
            vals = rng.integers(0, 16, a.shape).astype(np.uint8)
        elif a.dtype == np.int8:
            vals = rng.integers(-100, 100, a.shape).astype(np.int8)
        else:
            vals = a
        # Only active rows carry data (inactive stay zero).
        mask = np.asarray(layer.active_mask())
        vals[~mask] = 0
        ch[name] = jnp.asarray(vals)
    if layer_type == "tsdf":
        # Colors must be byte-representable for exact round trip.
        c = rng.integers(0, 256, np.asarray(ch["color"]).shape).astype(
            np.float32
        )
        c[~np.asarray(layer.active_mask())] = 0
        ch["color"] = jnp.asarray(c)
    return dataclasses.replace(layer, channels=ch)


@pytest.mark.parametrize("layer_type",
                         ["tsdf", "esdf", "occupancy", "intensity"])
def test_vxblx_roundtrip(tmp_path, rng, layer_type):
    layer = _random_layer(rng, layer_type)
    path = os.path.join(tmp_path, "map.vxblx")
    layer_io.save_layer(layer, path)
    loaded = layer_io.load_layer(path, layer_type)
    assert evaluation.is_same_layer(layer, loaded, atol=0.0) or _close(
        layer, loaded, layer_type
    )


def _close(a, b, layer_type):
    # uint8 flag channels restrict to wire-representable bits; float
    # channels must be bit exact.
    a_active = np.asarray(a.active_mask())
    rows_a = np.nonzero(a_active)[0]
    slot_b = np.asarray(
        vlayer.lookup_blocks(b, a.block_ijk[jnp.asarray(rows_a)])
    )
    assert (slot_b >= 0).all()
    for name in a.channels:
        ca = np.asarray(a.channels[name])[rows_a]
        cb = np.asarray(b.channels[name])[slot_b]
        if ca.dtype == np.uint8 and name in ("esdf_flags",):
            np.testing.assert_array_equal(ca & 0x0F, cb & 0x0F)
        elif name == "occ_observed":
            np.testing.assert_array_equal(ca != 0, cb != 0)
        else:
            np.testing.assert_array_equal(ca, cb)
    return True


def test_multi_layer_file(tmp_path, rng):
    """TSDF + ESDF appended in one file (esdf_server.cc:172-190)."""
    t = _random_layer(rng, "tsdf")
    e = _random_layer(rng, "esdf")
    path = os.path.join(tmp_path, "multi.vxblx")
    layer_io.save_layer(t, path)
    layer_io.save_layer(e, path, append=True)
    t2 = layer_io.load_layer(path, "tsdf")
    e2 = layer_io.load_layer(path, "esdf")
    _close(t, t2, "tsdf")
    _close(e, e2, "esdf")


def test_merge_strategies(tmp_path, rng):
    layer = _random_layer(rng, "tsdf", n_blocks=10)
    path = os.path.join(tmp_path, "m.vxblx")
    layer_io.save_layer(layer, path)
    # DISCARD keeps existing values.
    target = _random_layer(rng, "tsdf", n_blocks=10)
    before = np.asarray(target.channels["tsdf"]).copy()
    out = layer_io.load_layer(path, "tsdf", into=target,
                              strategy=layer_io.DISCARD)
    shared = np.asarray(
        vlayer.lookup_blocks(out, layer.block_ijk)
    )
    # PROHIBIT raises when duplicates exist.
    overlap_exists = False
    t_active = np.asarray(layer.active_mask())
    t_rows = np.nonzero(t_active)[0]
    tgt_slots = np.asarray(
        vlayer.lookup_blocks(target, layer.block_ijk[jnp.asarray(t_rows)])
    )
    overlap_exists = (tgt_slots >= 0).any()
    if overlap_exists:
        with pytest.raises(ValueError):
            layer_io.load_layer(path, "tsdf", into=target,
                                strategy=layer_io.PROHIBIT)


def test_npz_roundtrip(tmp_path, rng):
    layer = _random_layer(rng, "tsdf")
    path = os.path.join(tmp_path, "ckpt.npz")
    npz_io.save_npz(layer, path)
    loaded = npz_io.load_npz(path)
    for name in layer.channels:
        np.testing.assert_array_equal(
            np.asarray(layer.channels[name]), np.asarray(loaded.channels[name])
        )
    np.testing.assert_array_equal(
        np.asarray(layer.table.keys_w1), np.asarray(loaded.table.keys_w1)
    )


def test_ply_roundtrip(tmp_path, rng):
    verts = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    normals = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
    colors = rng.integers(0, 256, (30, 3)).astype(np.uint8)
    faces = np.arange(30, dtype=np.int32).reshape(-1, 3)
    path = os.path.join(tmp_path, "mesh.ply")
    ply.write_mesh_ply(path, verts, normals, colors, faces)
    got = ply.read_ply(path)
    np.testing.assert_allclose(got["vertices"], verts, rtol=1e-6)
    np.testing.assert_array_equal(got["colors"], colors)
    np.testing.assert_array_equal(got["faces"], faces)


def test_native_codec_matches_numpy(rng):
    """csrc/voxel_codec.cc must agree bit-for-bit with the numpy packer."""
    from voxblox_tpu.io import native

    if not native.available():
        pytest.skip("native codec unavailable (no g++?)")
    for layer_type in ["tsdf", "esdf", "occupancy", "intensity"]:
        layer = _random_layer(rng, layer_type, vps=4, n_blocks=3)
        channels = {k: np.asarray(v) for k, v in layer.channels.items()}
        if layer_type == "tsdf":
            c = np.round(channels["color"]).astype(np.float32)
            channels["color"] = c
        row = int(np.nonzero(np.asarray(layer.active_mask()))[0][0])
        nat = native.pack_voxels(layer_type, channels, row)
        ref = layer_io.pack_voxels.__wrapped__(layer_type, channels, row) if \
            hasattr(layer_io.pack_voxels, "__wrapped__") else None
        # Compare against the numpy implementation by disabling native.
        import voxblox_tpu.io.native as nmod
        saved = nmod._lib
        nmod._lib = None
        try:
            ref = layer_io.pack_voxels(layer_type, channels, row)
        finally:
            nmod._lib = saved
        np.testing.assert_array_equal(nat, ref)
        # Unpack round trip.
        vpb = 4**3
        nat_u = native.unpack_voxels(layer_type, nat, vpb)
        nmod._lib = None
        try:
            ref_u = layer_io.unpack_voxels(layer_type, nat, vpb)
        finally:
            nmod._lib = saved
        for k in ref_u:
            np.testing.assert_array_equal(
                np.asarray(nat_u[k]), np.asarray(ref_u[k]), err_msg=f"{layer_type}/{k}"
            )


def test_layer_msg_roundtrip_and_actions(rng):
    """Block-exchange messages (the ROS layer pub/sub equivalent)."""
    from voxblox_tpu.io import conversions

    layer = _random_layer(rng, "tsdf", n_blocks=8)
    # Full UPDATE to a fresh receiver.
    msg, layer = conversions.serialize_layer_msg(layer, conversions.UPDATE)
    rx = conversions.deserialize_layer_msg(msg, max_blocks=64)
    _close(layer, rx, "tsdf")
    # Delta broadcast: only dirty blocks travel; flags cleared after.
    layer2 = vlayer.clear_dirty(layer, vlayer.DIRTY_MAP)
    rows = vlayer.lookup_blocks(
        layer2, layer2.block_ijk[jnp.asarray([0])]
    )
    layer2 = vlayer.mark_dirty(layer2, rows, jnp.ones(1, bool),
                               vlayer.DIRTY_MAP)
    msg2, layer2 = conversions.serialize_layer_msg(
        layer2, conversions.UPDATE, only_updated=True
    )
    assert len(msg2) < len(msg)
    assert int(vlayer.dirty_mask(layer2, vlayer.DIRTY_MAP).sum()) == 0
    rx2 = conversions.deserialize_layer_msg(msg2, rx)
    _close(layer, rx2, "tsdf")  # unchanged blocks still intact
    # RESET drops everything not in the message.
    rx3 = conversions.deserialize_layer_msg(
        bytes([conversions.RESET]) + msg2[1:], rx
    )
    assert int(rx3.active_mask().sum()) == 1


def test_golden_file_from_cpp_protobuf(tmp_path):
    """Cross-implementation interop: a .vxblx written by a C++ program
    through google::protobuf coded streams (the reference's framing,
    protobuf_utils.cc) must load bit-exactly through the Python reader."""
    import subprocess
    import shutil

    if shutil.which("g++") is None or shutil.which("protoc") is None:
        pytest.skip("no native toolchain")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    build = os.path.join(tmp_path, "build")
    os.makedirs(build)
    proto_dir = os.path.join(root, "voxblox_tpu", "io", "proto")
    subprocess.run(
        ["protoc", f"-I{proto_dir}", f"--cpp_out={build}",
         os.path.join(proto_dir, "voxblox", "Layer.proto"),
         os.path.join(proto_dir, "voxblox", "Block.proto")],
        check=True,
    )
    exe = os.path.join(build, "golden_writer")
    subprocess.run(
        ["g++", "-std=c++17", "-I" + build,
         os.path.join(root, "csrc", "golden_writer.cc"),
         os.path.join(build, "voxblox", "Layer.pb.cc"),
         os.path.join(build, "voxblox", "Block.pb.cc"),
         "-lprotobuf", "-o", exe],
        check=True, capture_output=True,
    )
    golden = os.path.join(tmp_path, "golden.vxblx")
    subprocess.run([exe, golden], check=True)

    layer = layer_io.load_layer(golden, "tsdf", max_blocks=16)
    assert layer.vps == 4
    assert abs(layer.voxel_size - 0.25) < 1e-9
    slot = vlayer.lookup_blocks(
        layer, jnp.asarray([[1, -2, 0]], jnp.int32)
    )
    assert int(slot[0]) >= 0
    d = np.asarray(layer.channels["tsdf"])[int(slot[0])].reshape(-1)
    w = np.asarray(layer.channels["weight"])[int(slot[0])].reshape(-1)
    c = np.asarray(layer.channels["color"])[int(slot[0])].reshape(-1, 3)
    i = np.arange(64)
    i32 = i.astype(np.float32)
    want_d = np.float32(0.01) * i32 - np.float32(0.3)  # C++ float math
    want_w = np.float32(0.5) + np.float32(0.01) * i32
    np.testing.assert_array_equal(d, want_d)
    np.testing.assert_array_equal(w, want_w)
    np.testing.assert_array_equal(c[:, 0], (i * 3) % 256)
    np.testing.assert_array_equal(c[:, 1], (i * 5) % 256)
    np.testing.assert_array_equal(c[:, 2], (i * 7) % 256)

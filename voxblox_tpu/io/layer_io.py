""".vxblx layer file IO — wire-compatible with the reference.

File format (reference io/layer_io_inl.h:14-128, utils/protobuf_utils.cc):
``varint32 message_count`` followed by ``message_count`` varint-delimited
protobuf messages: one LayerProto header then one BlockProto per block.
Multiple layers may be appended to one file (the reference EsdfServer
appends the ESDF layer after the TSDF layer, esdf_server.cc:172-190).

Voxel payloads are uint32 words with the exact reference bit layouts
(src/core/block.cc:65-255):
- tsdf:      3 words: f32 distance | f32 weight | r<<24|g<<16|b<<8|a
- esdf:      2 words: f32 distance | px<<24|py<<16|pz<<8|flags
             flags bits: observed=1, hallucinated=2, in_queue=4, fixed=8
- occupancy: 2 words: f32 log_odds | observed
- intensity: 2 words: f32 intensity | f32 weight

Packing is vectorized numpy over whole blocks (no per-voxel loops).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from ..core import grid
from ..core import layer as vlayer
from .proto import BlockProto, LayerProto

# BlockMergingStrategy (reference core/layer.h:54).
PROHIBIT, OVERWRITE, DISCARD, MERGE = range(4)


# ---------------------------------------------------------------------------
# Varint-delimited stream helpers (protobuf_utils.cc semantics)
# ---------------------------------------------------------------------------


def _write_varint32(f, value: int):
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            f.write(bytes([b | 0x80]))
        else:
            f.write(bytes([b]))
            return


def _read_varint32(f) -> Optional[int]:
    shift = 0
    out = 0
    while True:
        c = f.read(1)
        if not c:
            return None
        b = c[0]
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out
        shift += 7


def write_delimited(f, msg):
    data = msg.SerializeToString()
    _write_varint32(f, len(data))
    f.write(data)


def read_delimited(f, msg_cls):
    size = _read_varint32(f)
    if size is None:
        return None
    data = f.read(size)
    if len(data) != size:
        return None
    msg = msg_cls()
    msg.ParseFromString(data)
    return msg


# ---------------------------------------------------------------------------
# Voxel word packing (block.cc:65-255) — vectorized
# ---------------------------------------------------------------------------


def pack_voxels(layer_type: str, channels: dict, row: int) -> np.ndarray:
    """Pool row -> uint32[vpb * words_per_voxel] in linear voxel order.

    Uses the native codec (csrc/voxel_codec.cc via io/native.py) when
    available; the numpy path below is the reference implementation."""
    from . import native

    out = native.pack_voxels(layer_type, channels, row)
    if out is not None:
        return out
    if layer_type == "tsdf":
        d = np.asarray(channels["tsdf"][row], np.float32).reshape(-1)
        w = np.asarray(channels["weight"][row], np.float32).reshape(-1)
        c = np.asarray(channels["color"][row]).reshape(-1, 3)
        rgba = (
            (np.clip(np.round(c[:, 0]), 0, 255).astype(np.uint32) << 24)
            | (np.clip(np.round(c[:, 1]), 0, 255).astype(np.uint32) << 16)
            | (np.clip(np.round(c[:, 2]), 0, 255).astype(np.uint32) << 8)
            | np.uint32(255)
        )
        out = np.empty((d.size, 3), np.uint32)
        out[:, 0] = d.view(np.uint32)
        out[:, 1] = w.view(np.uint32)
        out[:, 2] = rgba
        return out.reshape(-1)
    if layer_type == "esdf":
        d = np.asarray(channels["esdf"][row], np.float32).reshape(-1)
        f = np.asarray(channels["esdf_flags"][row], np.uint8).reshape(-1)
        p = np.asarray(channels["parent"][row], np.int8).reshape(-1, 3)
        # flags bit mapping: ours == reference (observed=1, hallucinated=2,
        # in_queue=4, fixed=8)? Ours: OBSERVED=1, FIXED=2, HALLUCINATED=4,
        # IN_QUEUE=8 — remap to the reference wire layout.
        obs = (f & vlayer.ESDF_OBSERVED) != 0
        fix = (f & vlayer.ESDF_FIXED) != 0
        hall = (f & vlayer.ESDF_HALLUCINATED) != 0
        inq = (f & vlayer.ESDF_IN_QUEUE) != 0
        wire_flags = (
            obs.astype(np.uint32)
            | (hall.astype(np.uint32) << 1)
            | (inq.astype(np.uint32) << 2)
            | (fix.astype(np.uint32) << 3)
        )
        word2 = (
            (p[:, 0].astype(np.uint8).astype(np.uint32) << 24)
            | (p[:, 1].astype(np.uint8).astype(np.uint32) << 16)
            | (p[:, 2].astype(np.uint8).astype(np.uint32) << 8)
            | wire_flags
        )
        out = np.empty((d.size, 2), np.uint32)
        out[:, 0] = d.view(np.uint32)
        out[:, 1] = word2
        return out.reshape(-1)
    if layer_type == "occupancy":
        d = np.asarray(channels["log_odds"][row], np.float32).reshape(-1)
        o = np.asarray(channels["occ_observed"][row], np.uint8).reshape(-1)
        out = np.empty((d.size, 2), np.uint32)
        out[:, 0] = d.view(np.uint32)
        out[:, 1] = (o != 0).astype(np.uint32)
        return out.reshape(-1)
    if layer_type == "intensity":
        i = np.asarray(channels["intensity"][row], np.float32).reshape(-1)
        w = np.asarray(channels["intensity_weight"][row], np.float32).reshape(-1)
        out = np.empty((i.size, 2), np.uint32)
        out[:, 0] = i.view(np.uint32)
        out[:, 1] = w.view(np.uint32)
        return out.reshape(-1)
    raise ValueError(layer_type)


def unpack_voxels(layer_type: str, words: np.ndarray, vpb: int) -> dict:
    """uint32 words -> dict of flat [vpb] channel arrays."""
    from . import native

    out = native.unpack_voxels(layer_type, np.asarray(words, np.uint32), vpb)
    if out is not None:
        return out
    if layer_type == "tsdf":
        w = words.reshape(vpb, 3)
        rgba = w[:, 2]
        color = np.stack(
            [
                (rgba >> 24) & 0xFF,
                (rgba >> 16) & 0xFF,
                (rgba >> 8) & 0xFF,
            ],
            -1,
        ).astype(np.float32)
        return {
            "tsdf": w[:, 0].copy().view(np.float32),
            "weight": w[:, 1].copy().view(np.float32),
            "color": color,
        }
    if layer_type == "esdf":
        w = words.reshape(vpb, 2)
        word2 = w[:, 1]
        obs = (word2 & 1) != 0
        hall = (word2 & 2) != 0
        inq = (word2 & 4) != 0
        fix = (word2 & 8) != 0
        flags = (
            obs.astype(np.uint8) * vlayer.ESDF_OBSERVED
            | fix.astype(np.uint8) * vlayer.ESDF_FIXED
            | hall.astype(np.uint8) * vlayer.ESDF_HALLUCINATED
            | inq.astype(np.uint8) * vlayer.ESDF_IN_QUEUE
        )
        parent = np.stack(
            [
                ((word2 >> 24) & 0xFF).astype(np.uint8).view(np.int8),
                ((word2 >> 16) & 0xFF).astype(np.uint8).view(np.int8),
                ((word2 >> 8) & 0xFF).astype(np.uint8).view(np.int8),
            ],
            -1,
        )
        return {
            "esdf": w[:, 0].copy().view(np.float32),
            "esdf_flags": flags,
            "parent": parent,
        }
    if layer_type == "occupancy":
        w = words.reshape(vpb, 2)
        return {
            "log_odds": w[:, 0].copy().view(np.float32),
            "occ_observed": (w[:, 1] & 0xFF != 0).astype(np.uint8),
        }
    if layer_type == "intensity":
        w = words.reshape(vpb, 2)
        return {
            "intensity": w[:, 0].copy().view(np.float32),
            "intensity_weight": w[:, 1].copy().view(np.float32),
        }
    raise ValueError(layer_type)


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------


def save_layer(layer: vlayer.VoxelLayer, path: str, append: bool = False):
    """Write a layer as a .vxblx stream (LayerProto + BlockProtos).

    append=True adds another layer to an existing file (multi-layer files,
    esdf_server.cc:172-190).
    """
    active = np.asarray(layer.active_mask())
    rows = np.nonzero(active)[0]
    block_ijk = np.asarray(layer.block_ijk)
    channels = {k: np.asarray(v) for k, v in layer.channels.items()}

    mode = "ab" if append else "wb"
    with open(path, mode) as f:
        _write_varint32(f, len(rows) + 1)
        hdr = LayerProto()
        hdr.voxel_size = layer.voxel_size
        hdr.voxels_per_side = layer.vps
        hdr.type = layer.layer_type
        write_delimited(f, hdr)
        for row in rows:
            bp = BlockProto()
            bp.voxels_per_side = layer.vps
            bp.voxel_size = layer.voxel_size
            origin = block_ijk[row].astype(np.float64) * layer.block_size
            bp.origin_x, bp.origin_y, bp.origin_z = origin
            bp.has_data = True
            bp.voxel_data.extend(
                pack_voxels(layer.layer_type, channels, int(row)).tolist()
            )
            write_delimited(f, bp)


def load_layer(
    path: str,
    layer_type: Optional[str] = None,
    max_blocks: int = 4096,
    strategy: int = OVERWRITE,
    into: Optional[vlayer.VoxelLayer] = None,
) -> vlayer.VoxelLayer:
    """Load (the first matching) layer from a .vxblx file.

    If ``into`` is given, blocks are merged into it with ``strategy``
    (layer_inl.h:191-240: PROHIBIT raises on duplicates, OVERWRITE
    replaces, DISCARD keeps existing, MERGE combines voxels).
    """
    with open(path, "rb") as f:
        while True:
            count = _read_varint32(f)
            if count is None:
                raise ValueError(
                    f"no layer of type {layer_type!r} found in {path}"
                )
            hdr = read_delimited(f, LayerProto)
            if hdr is None:
                raise ValueError("truncated layer header")
            if layer_type is not None and hdr.type != layer_type:
                # Skip this layer's blocks and try the next one.
                for _ in range(count - 1):
                    if read_delimited(f, BlockProto) is None:
                        raise ValueError("truncated block stream")
                continue
            return _load_blocks(f, hdr, count - 1, max_blocks, strategy, into)


def _load_blocks(f, hdr, n_blocks, max_blocks, strategy, into):
    vps = int(hdr.voxels_per_side)
    voxel_size = float(hdr.voxel_size)
    if into is None:
        layer = vlayer.make_layer(
            hdr.type, voxel_size, vps=vps,
            max_blocks=max(max_blocks, n_blocks),
        )
    else:
        layer = into
        assert layer.vps == vps and abs(layer.voxel_size - voxel_size) < 1e-9, (
            "isCompatible failed: voxel_size/vps mismatch"
        )
        assert layer.layer_type == hdr.type

    vpb = vps**3
    indices = []
    payloads = []
    block_size = voxel_size * vps
    for _ in range(n_blocks):
        bp = read_delimited(f, BlockProto)
        if bp is None:
            raise ValueError("truncated block stream")
        ijk = np.round(
            np.array([bp.origin_x, bp.origin_y, bp.origin_z]) / block_size
        ).astype(np.int32)
        indices.append(ijk)
        payloads.append(np.array(bp.voxel_data, np.uint32))

    if not indices:
        return layer

    indices = np.stack(indices)
    existing = np.asarray(
        vlayer.lookup_blocks(layer, jnp.asarray(indices))
    )
    if strategy == PROHIBIT and (existing >= 0).any():
        raise ValueError("BlockMergingStrategy.PROHIBIT: duplicate blocks")

    layer, overflow = vlayer.allocate_blocks(
        layer, jnp.asarray(indices), jnp.ones(len(indices), bool)
    )
    assert not bool(overflow), "pool overflow during load; raise max_blocks"
    slots = np.asarray(vlayer.lookup_blocks(layer, jnp.asarray(indices)))

    channels = {k: np.asarray(v).copy() for k, v in layer.channels.items()}
    for i, (row, words) in enumerate(zip(slots, payloads)):
        if existing[i] >= 0 and strategy == DISCARD:
            continue
        vals = unpack_voxels(hdr.type, words, vpb)
        for name, arr in vals.items():
            tgt = channels[name]
            k = tgt.shape[1] // vpb
            extra = () if k == 1 else (k,)
            if existing[i] >= 0 and strategy == MERGE:
                merged = _merge_voxels(
                    hdr.type, name,
                    tgt[row].reshape((vpb,) + extra),
                    arr, vals, channels, row, vpb,
                )
                tgt[row] = merged.reshape(tgt.shape[1:])
            else:
                tgt[row] = arr.reshape(tgt.shape[1:])
    new_channels = {k: jnp.asarray(v) for k, v in channels.items()}
    return dataclasses.replace(layer, channels=new_channels)


def _merge_voxels(layer_type, name, old, new, new_all, channels, row, vpb):
    """mergeVoxelAIntoVoxelB (utils/voxel_utils.cc:9-39): weighted average
    for TSDF, plain average for ESDF, sum for occupancy."""
    if layer_type == "tsdf":
        old_w = channels["weight"][row].reshape(vpb)
        new_w = new_all["weight"].reshape(vpb)
        tot = np.maximum(old_w + new_w, 1e-12)
        if name == "tsdf":
            return (old * old_w + new * new_w) / tot
        if name == "color":
            return (old * old_w[:, None] + new * new_w[:, None]) / tot[:, None]
        if name == "weight":
            return old + new
    if layer_type == "occupancy" and name == "log_odds":
        return old + new
    if layer_type == "esdf" and name == "esdf":
        return (old + new) / 2.0
    return new


def load_layer_header(path: str):
    """Peek the first LayerProto of a file."""
    with open(path, "rb") as f:
        _read_varint32(f)
        return read_delimited(f, LayerProto)

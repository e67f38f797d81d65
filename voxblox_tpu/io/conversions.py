"""Block-set exchange messages: serialize subsets of a layer to bytes.

Equivalent of the reference's ROS layer pub/sub mechanism — the ONLY
multi-node channel it has (voxblox_msgs/Layer.msg + conversions.h:20-24,
147-166; tsdf_server.cc:456-480, 639-653): a message carries the layer
header, an action (UPDATE / MERGE / RESET), and a set of serialized
blocks; subscribers apply it to their local layer. Here the same wire
scheme (reusing the .vxblx protobuf block payloads) serves:
- map streaming between processes/hosts ("tsdf_map_out" equivalent),
- delta broadcast of only-updated blocks (dirty-bit driven),
- the host-level block migration path for multi-host sharding.
"""

from __future__ import annotations

import dataclasses
import io as _io
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..core import layer as vlayer
from . import layer_io
from .proto import BlockProto, LayerProto

# Actions (voxblox_msgs/Layer.msg: ACTION_UPDATE/MERGE/RESET).
UPDATE, MERGE, RESET = 0, 1, 2


def serialize_layer_msg(
    layer: vlayer.VoxelLayer,
    action: int = UPDATE,
    only_updated: bool = False,
    clear_updated_flag: bool = True,
):
    """Layer (or its updated-block subset) -> (bytes, layer').

    only_updated selects blocks with the kMap dirty bit
    (serializeLayerAsMsg semantics, conversions_inl.h).
    """
    if only_updated:
        mask = vlayer.dirty_mask(layer, vlayer.DIRTY_MAP)
    else:
        mask = layer.active_mask()
    rows = np.nonzero(np.asarray(mask))[0]
    block_ijk = np.asarray(layer.block_ijk)
    channels = {k: np.asarray(v) for k, v in layer.channels.items()}

    buf = _io.BytesIO()
    buf.write(bytes([action]))
    layer_io._write_varint32(buf, len(rows) + 1)
    hdr = LayerProto()
    hdr.voxel_size = layer.voxel_size
    hdr.voxels_per_side = layer.vps
    hdr.type = layer.layer_type
    layer_io.write_delimited(buf, hdr)
    for row in rows:
        bp = BlockProto()
        bp.voxels_per_side = layer.vps
        bp.voxel_size = layer.voxel_size
        origin = block_ijk[row].astype(np.float64) * layer.block_size
        bp.origin_x, bp.origin_y, bp.origin_z = origin
        bp.has_data = True
        bp.voxel_data.extend(
            layer_io.pack_voxels(layer.layer_type, channels, int(row)).tolist()
        )
        layer_io.write_delimited(buf, bp)
    if only_updated and clear_updated_flag:
        layer = vlayer.clear_dirty(layer, vlayer.DIRTY_MAP)
    return buf.getvalue(), layer


def deserialize_layer_msg(
    data: bytes,
    layer: Optional[vlayer.VoxelLayer] = None,
    max_blocks: int = 4096,
):
    """Apply a layer message. Returns the updated layer.

    Action semantics (tsdf_server.cc:639-653):
    - UPDATE: overwrite the received blocks;
    - MERGE: voxel-merge the received blocks into existing ones;
    - RESET: clear the local layer, then write the received blocks.
    """
    buf = _io.BytesIO(data)
    action = buf.read(1)[0]
    count = layer_io._read_varint32(buf)
    hdr = layer_io.read_delimited(buf, LayerProto)
    if layer is None or action == RESET:
        if layer is None:
            layer = vlayer.make_layer(
                hdr.type, float(hdr.voxel_size),
                vps=int(hdr.voxels_per_side), max_blocks=max_blocks,
            )
        else:
            layer = vlayer.make_layer(
                layer.layer_type, layer.voxel_size, vps=layer.vps,
                max_blocks=layer.max_blocks,
            )
    strategy = layer_io.MERGE if action == MERGE else layer_io.OVERWRITE
    return layer_io._load_blocks(
        buf, hdr, count - 1, layer.max_blocks, strategy, layer
    )

"""Fast checkpoint path: whole-map snapshot to .npz.

The .vxblx protobuf path (layer_io.py) is the interop format; this is the
fast resume format (single compressed archive of the pool arrays + hash
table, restored bit-exactly). Equivalent role to the reference's
save_map/load_map services as a checkpoint/restart mechanism
(SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import dataclasses
import json

import jax.numpy as jnp
import numpy as np

from ..core import hash as vhash
from ..core import layer as vlayer


def save_npz(layer: vlayer.VoxelLayer, path: str):
    meta = {
        "voxel_size": layer.voxel_size,
        "vps": layer.vps,
        "layer_type": layer.layer_type,
        "channel_names": sorted(layer.channels),
    }
    arrays = {
        "keys_w0": np.asarray(layer.table.keys_w0),
        "keys_w1": np.asarray(layer.table.keys_w1),
        "slot": np.asarray(layer.table.slot),
        "max_psl": np.asarray(layer.table.max_psl),
        "count": np.asarray(layer.table.count),
        "block_ijk": np.asarray(layer.block_ijk),
        "block_flags": np.asarray(layer.block_flags),
        "num_blocks": np.asarray(layer.num_blocks),
        "meta": np.frombuffer(json.dumps(meta).encode(), np.uint8),
    }
    for name, arr in layer.channels.items():
        arrays[f"ch_{name}"] = np.asarray(arr)
    np.savez_compressed(path, **arrays)


def load_npz(path: str) -> vlayer.VoxelLayer:
    z = np.load(path)
    meta = json.loads(bytes(z["meta"]).decode())
    table = vhash.HashTable(
        keys_w0=jnp.asarray(z["keys_w0"]),
        keys_w1=jnp.asarray(z["keys_w1"]),
        slot=jnp.asarray(z["slot"]),
        max_psl=jnp.asarray(z["max_psl"]),
        count=jnp.asarray(z["count"]),
    )
    channels = {
        # reshape(mb, -1): archives written before the flat channel
        # storage carry cube-shaped arrays; bytes are identical.
        name: jnp.asarray(z[f"ch_{name}"]).reshape(z[f"ch_{name}"].shape[0], -1)
        for name in meta["channel_names"]
    }
    return vlayer.VoxelLayer(
        table=table,
        block_ijk=jnp.asarray(z["block_ijk"]),
        block_flags=jnp.asarray(z["block_flags"]),
        num_blocks=jnp.asarray(z["num_blocks"]),
        channels=channels,
        voxel_size=float(meta["voxel_size"]),
        vps=int(meta["vps"]),
        layer_type=meta["layer_type"],
    )

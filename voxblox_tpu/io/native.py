"""ctypes bindings for the native voxel codec (csrc/voxel_codec.cc).

Builds on first use (g++ via csrc/Makefile) and falls back to numpy
implementations in layer_io.py when unavailable. The codec mirrors the
reference's C++ serialization hot loops (src/core/block.cc,
src/utils/protobuf_utils.cc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.join(_CSRC, "libvoxel_codec.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        lib = ctypes.CDLL(_LIB_PATH)
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
        i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
        i64 = ctypes.c_int64
        lib.tsdf_pack.argtypes = [f32p, f32p, f32p, u32p, i64]
        lib.tsdf_unpack.argtypes = [u32p, f32p, f32p, f32p, i64]
        lib.esdf_pack.argtypes = [f32p, u8p, i8p, u32p, i64]
        lib.esdf_unpack.argtypes = [u32p, f32p, u8p, i8p, i64]
        lib.occupancy_pack.argtypes = [f32p, u8p, u32p, i64]
        lib.occupancy_unpack.argtypes = [u32p, f32p, u8p, i64]
        lib.intensity_pack.argtypes = [f32p, f32p, u32p, i64]
        lib.intensity_unpack.argtypes = [u32p, f32p, f32p, i64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def pack_voxels(layer_type: str, channels: dict, row: int):
    """Native fast path matching layer_io.pack_voxels; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    if layer_type == "tsdf":
        d = np.ascontiguousarray(channels["tsdf"][row], np.float32).reshape(-1)
        w = np.ascontiguousarray(channels["weight"][row], np.float32).reshape(-1)
        c = np.ascontiguousarray(channels["color"][row], np.float32).reshape(-1)
        out = np.empty(d.size * 3, np.uint32)
        lib.tsdf_pack(d, w, c, out, d.size)
        return out
    if layer_type == "esdf":
        d = np.ascontiguousarray(channels["esdf"][row], np.float32).reshape(-1)
        f = np.ascontiguousarray(
            channels["esdf_flags"][row], np.uint8
        ).reshape(-1)
        p = np.ascontiguousarray(channels["parent"][row], np.int8).reshape(-1)
        out = np.empty(d.size * 2, np.uint32)
        lib.esdf_pack(d, f, p, out, d.size)
        return out
    if layer_type == "occupancy":
        d = np.ascontiguousarray(
            channels["log_odds"][row], np.float32
        ).reshape(-1)
        o = np.ascontiguousarray(
            channels["occ_observed"][row], np.uint8
        ).reshape(-1)
        out = np.empty(d.size * 2, np.uint32)
        lib.occupancy_pack(d, o, out, d.size)
        return out
    if layer_type == "intensity":
        i = np.ascontiguousarray(
            channels["intensity"][row], np.float32
        ).reshape(-1)
        w = np.ascontiguousarray(
            channels["intensity_weight"][row], np.float32
        ).reshape(-1)
        out = np.empty(i.size * 2, np.uint32)
        lib.intensity_pack(i, w, out, i.size)
        return out
    return None


def unpack_voxels(layer_type: str, words: np.ndarray, vpb: int):
    """Native fast path matching layer_io.unpack_voxels; None if absent."""
    lib = _load()
    if lib is None:
        return None
    words = np.ascontiguousarray(words, np.uint32)
    if layer_type == "tsdf":
        d = np.empty(vpb, np.float32)
        w = np.empty(vpb, np.float32)
        c = np.empty(vpb * 3, np.float32)
        lib.tsdf_unpack(words, d, w, c, vpb)
        return {"tsdf": d, "weight": w, "color": c.reshape(vpb, 3)}
    if layer_type == "esdf":
        d = np.empty(vpb, np.float32)
        f = np.empty(vpb, np.uint8)
        p = np.empty(vpb * 3, np.int8)
        lib.esdf_unpack(words, d, f, p, vpb)
        return {"esdf": d, "esdf_flags": f, "parent": p.reshape(vpb, 3)}
    if layer_type == "occupancy":
        d = np.empty(vpb, np.float32)
        o = np.empty(vpb, np.uint8)
        lib.occupancy_unpack(words, d, o, vpb)
        return {"log_odds": d, "occ_observed": o}
    if layer_type == "intensity":
        i = np.empty(vpb, np.float32)
        w = np.empty(vpb, np.float32)
        lib.intensity_unpack(words, i, w, vpb)
        return {"intensity": i, "intensity_weight": w}
    return None

"""ctypes bindings for the native (C++) weight pipeline (csrc/tmac_native.cc).

The TPU-native analog of the reference's native layer (tbl.cc/lut_ctor.cc +
TMACGeMMWrapper): on TPU the online hot loop is Pallas, so native code
serves the offline checkpoint pipeline, where packing/quantizing ~GBs of
weights is CPU-bound.  Multithreaded C++ kernels, bit-compatible with the
numpy reference implementations in ops/packing.py / convert/*.py.

Usage: `from tmac_tpu import native; native.pack_strided(...)`.
`native.available()` is False when no compiled library exists and no
compiler is present; callers fall back to numpy.  Builds lazily (one
`make -C csrc`) and caches the .so under tmac_tpu/_lib/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(__file__), "_lib")
_LIB_PATH = os.path.join(_LIB_DIR, "libtmac_native.so")
_CSRC = os.path.join(os.path.dirname(__file__), os.pardir, "csrc")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "tmac_native.cc")
    if not os.path.exists(src):
        return False
    os.makedirs(_LIB_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64, i32 = ctypes.c_int64, ctypes.c_int
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.tmac_pack_strided.argtypes = [u8p, u8p, i64, i64, i32, i32]
        lib.tmac_unpack_strided.argtypes = [u8p, u8p, i64, i64, i32, i32]
        lib.tmac_quantize_weights_b.argtypes = [
            f32p, u8p, f32p, f32p, i64, i64, i32, i64, i32]
        lib.tmac_unpack_gptq_qweight.argtypes = [i32p, u8p, i64, i64, i32]
        lib.tmac_unpack_gptq_qzeros.argtypes = [i32p, u8p, i64, i64, i32, i32]
        lib.tmac_quantize_bitnet.argtypes = [f32p, u8p, f32p, f32p, i64, i64, i32]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _check(rc: int, what: str):
    if rc != 0:
        raise ValueError(f"tmac_native.{what} failed with code {rc}")


def pack_strided(wq: np.ndarray, bits: int, k_shards: int = 1) -> np.ndarray:
    lib = _load()
    assert lib is not None
    wq = np.ascontiguousarray(wq, dtype=np.uint8)
    K, M = wq.shape
    p = 8 // bits
    out = np.empty((K // p, M), np.uint8)
    _check(lib.tmac_pack_strided(wq, out, K, M, bits, k_shards), "pack_strided")
    return out


def unpack_strided(packed: np.ndarray, bits: int, k_shards: int = 1) -> np.ndarray:
    lib = _load()
    assert lib is not None
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    KP, M = packed.shape
    p = 8 // bits
    out = np.empty((KP * p, M), np.uint8)
    _check(lib.tmac_unpack_strided(packed, out, KP * p, M, bits, k_shards),
           "unpack_strided")
    return out


def quantize_weights(w: np.ndarray, bits: int, group_size: int,
                     zero_point: bool = False):
    lib = _load()
    assert lib is not None
    w = np.ascontiguousarray(w, dtype=np.float32)
    K, M = w.shape
    G = K // group_size
    wq = np.empty((K, M), np.uint8)
    scales = np.empty((G, M), np.float32)
    sub = np.empty((G, M), np.float32)
    _check(lib.tmac_quantize_weights_b(w, wq, scales, sub, K, M, bits,
                                       group_size, int(zero_point)),
           "quantize_weights")
    return wq, scales, sub


def unpack_gptq_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """(R, M) int32, bits-wide fields along K -> (R*32/bits, M) uint8."""
    lib = _load()
    assert lib is not None
    qweight = np.ascontiguousarray(qweight, dtype=np.int32)
    R, M = qweight.shape
    out = np.empty((R * (32 // bits), M), np.uint8)
    _check(lib.tmac_unpack_gptq_qweight(qweight, out, R, M, bits),
           "unpack_gptq_qweight")
    return out


def unpack_gptq_qzeros(qzeros: np.ndarray, bits: int, add_one: bool) -> np.ndarray:
    """(G, M*bits/32) int32, fields along M -> (G, M) uint8 (+1 for GPTQ v1)."""
    lib = _load()
    assert lib is not None
    qzeros = np.ascontiguousarray(qzeros, dtype=np.int32)
    G, Mf = qzeros.shape
    out = np.empty((G, Mf * (32 // bits)), np.uint8)
    _check(lib.tmac_unpack_gptq_qzeros(qzeros, out, G, Mf, bits, int(add_one)),
           "unpack_gptq_qzeros")
    return out


def quantize_bitnet(w: np.ndarray, k_shards: int = 1):
    lib = _load()
    assert lib is not None
    w = np.ascontiguousarray(w, dtype=np.float32)
    K, M = w.shape
    wq = np.empty((K, M), np.uint8)
    scales = np.empty((k_shards, M), np.float32)
    sub = np.empty((k_shards, M), np.float32)
    _check(lib.tmac_quantize_bitnet(w, wq, scales, sub, K, M, k_shards),
           "quantize_bitnet")
    return wq, scales, sub

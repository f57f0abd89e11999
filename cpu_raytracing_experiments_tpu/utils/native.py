"""ctypes bindings to the native C++ runtime components (native/*.cpp).

Everything here degrades gracefully: if libcrt_native.so hasn't been built
(`make -C native`), callers get None / fall back to the numpy reference
implementations, which double as correctness oracles in tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = Path(__file__).parent / "libcrt_native.so"
_lib = None
_load_attempted = False


def _try_build() -> bool:
    native_dir = Path(__file__).resolve().parents[2] / "native"
    if not (native_dir / "Makefile").exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(native_dir)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not _LIB_PATH.exists() and os.environ.get("CRT_NO_NATIVE_BUILD") != "1":
        _try_build()
    if not _LIB_PATH.exists():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.rgbe_encode.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_size_t,
        ]
        lib.rgbe_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t,
        ]
        lib.bvh_build.restype = ctypes.c_int32
        lib.bvh_build.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # mins
            ctypes.POINTER(ctypes.c_float),  # maxs
            ctypes.c_uint32,  # n
            ctypes.POINTER(ctypes.c_float),  # node_min
            ctypes.POINTER(ctypes.c_float),  # node_max
            ctypes.POINTER(ctypes.c_uint32),  # node_first
            ctypes.POINTER(ctypes.c_uint32),  # node_count
            ctypes.POINTER(ctypes.c_uint32),  # prim_order
            ctypes.c_uint32,  # max_nodes
            ctypes.c_float,  # cost_ratio
            ctypes.c_uint32,  # log_cluster_size
            ctypes.c_uint32,  # leaf_size
        ]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _u32ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32))


def rgbe_encode(rgb: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, np.float32)
    npix = rgb.shape[0] * rgb.shape[1]
    out = np.empty((*rgb.shape[:2], 4), np.uint8)
    lib.rgbe_encode(_fptr(rgb), _u8ptr(out), npix)
    return out


def rgbe_decode(rgbe: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rgbe = np.ascontiguousarray(rgbe, np.uint8)
    npix = rgbe.shape[0] * rgbe.shape[1]
    out = np.empty((*rgbe.shape[:2], 3), np.float32)
    lib.rgbe_decode(_u8ptr(rgbe), _fptr(out), npix)
    return out


def bvh_build(
    mins: np.ndarray,
    maxs: np.ndarray,
    cost_ratio: float = 1.0,
    log_cluster_size: int = 0,
    leaf_size: int = 1,
):
    """Native SAH build. Returns (node_min, node_max, node_first, node_count,
    prim_order) or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mins = np.ascontiguousarray(mins, np.float32)
    maxs = np.ascontiguousarray(maxs, np.float32)
    n = mins.shape[0]
    max_nodes = 2 * n + 2
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_first = np.empty(max_nodes, np.uint32)
    node_count = np.empty(max_nodes, np.uint32)
    prim_order = np.empty(n, np.uint32)
    written = lib.bvh_build(
        _fptr(mins), _fptr(maxs), n,
        _fptr(node_min), _fptr(node_max), _u32ptr(node_first),
        _u32ptr(node_count), _u32ptr(prim_order),
        max_nodes, cost_ratio, log_cluster_size, leaf_size,
    )
    if written < 0:
        return None
    return (
        node_min[:written].copy(),
        node_max[:written].copy(),
        node_first[:written].copy(),
        node_count[:written].copy(),
        prim_order,
    )

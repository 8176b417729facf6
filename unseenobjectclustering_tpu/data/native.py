"""ctypes bindings for the native IO library (native/ucio.cpp).

Lazily builds `native/libucio.so` with g++ on first use (no pybind11 /
pip dependencies); every entry point has a pure-Python fallback in
data/pcd.py, so the framework runs even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libucio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "ucio.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.ucio_lzf_decompress.restype = ctypes.c_long
        lib.ucio_lzf_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long]
        lib.ucio_extract_strided_f32.restype = None
        lib.ucio_extract_strided_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float)]
        lib.ucio_nearest_paste_nonzero.restype = None
        lib.ucio_nearest_paste_nonzero.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
            ctypes.c_long]
        _lib = lib
        return _lib


def lzf_decompress(data: bytes, expected_size: int) -> Optional[bytes]:
    """Native LZF decompression; None when the library is unavailable,
    raises ValueError on malformed input."""
    lib = get_lib()
    if lib is None:
        return None
    out = (ctypes.c_uint8 * expected_size)()
    n = lib.ucio_lzf_decompress(data, len(data), out, expected_size)
    if n < 0:
        raise ValueError("malformed LZF stream")
    return bytes(bytearray(out)[:n])


def extract_strided_f32(raw: bytes, n_points: int, stride: int,
                        offset: int) -> Optional[np.ndarray]:
    """Native strided float32 field gather; None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(n_points, np.float32)
    lib.ucio_extract_strided_f32(
        raw, n_points, stride, offset,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def nearest_paste_nonzero(src: np.ndarray, dst_region: np.ndarray) -> bool:
    """Native nonzero-overwrite nearest paste into a (possibly strided)
    int32 view; returns False when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    src = np.ascontiguousarray(src, np.int32)
    if (dst_region.dtype != np.int32 or dst_region.ndim != 2
            or dst_region.size == 0 or dst_region.strides[1] != 4
            or src.size == 0):
        return False  # numpy fallback handles unusual views / empty regions
    lib.ucio_nearest_paste_nonzero(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        src.shape[0], src.shape[1],
        dst_region.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        dst_region.shape[0], dst_region.shape[1],
        dst_region.strides[0] // 4)
    return True

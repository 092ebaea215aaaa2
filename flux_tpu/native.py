"""ctypes loader for the native host components (native/fluxnative.cpp).

Builds the shared library on first use if a compiler is available and falls
back to the pure-Python implementations otherwise — the native path is an
accelerator, never a requirement.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

__all__ = ["get_lib", "ppm_encode_native", "available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libfluxnative.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "fluxnative.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO_PATH, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.flux_ppm_bound.restype = ctypes.c_size_t
            lib.flux_ppm_bound.argtypes = [ctypes.c_int32, ctypes.c_int32]
            lib.flux_ppm_encode.restype = ctypes.c_size_t
            lib.flux_ppm_encode.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
                ctypes.c_int32,
                ctypes.c_char_p,
            ]
            lib.flux_quantize_u16.restype = None
            lib.flux_quantize_u16.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int64,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return get_lib() is not None


def ppm_encode_native(pixels: np.ndarray) -> Optional[bytes]:
    """Encode (H, W, 3) float32 pixels to P3 bytes, or None if the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    px = np.ascontiguousarray(pixels, np.float32)
    h, w = px.shape[:2]
    cap = lib.flux_ppm_bound(h, w)
    buf = ctypes.create_string_buffer(cap)
    n = lib.flux_ppm_encode(
        px.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, buf
    )
    return buf.raw[:n]

"""Build + ctypes bindings for the native host data-path kernels.

Compiles normalize.cc with g++ -O3 on first use (cached next to the source);
falls back to numpy transparently if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "normalize.cc")
_SO = os.path.join(_HERE, "_normalize.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t]
        lib.crop_normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def normalize_u8(arr: np.ndarray) -> np.ndarray:
    """uint8 (...,) -> float32 in [-0.5, 0.5], single fused pass."""
    arr = np.ascontiguousarray(arr, np.uint8)
    lib = get_lib()
    if lib is None:
        return arr.astype(np.float32) / 255.0 - 0.5
    out = np.empty(arr.shape, np.float32)
    lib.normalize_u8(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.size)
    return out


def crop_normalize_u8(video: np.ndarray, y: int, x: int, ch: int, cw: int) -> np.ndarray:
    """uint8 (T, H, W, C) -> float32 (T, ch, cw, C) crop+normalize, one pass."""
    video = np.ascontiguousarray(video, np.uint8)
    t, h, w, c = video.shape
    lib = get_lib()
    if lib is None:
        return video[:, y:y + ch, x:x + cw].astype(np.float32) / 255.0 - 0.5
    out = np.empty((t, ch, cw, c), np.float32)
    lib.crop_normalize_u8(
        video.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t, h, w, c, y, x, ch, cw)
    return out

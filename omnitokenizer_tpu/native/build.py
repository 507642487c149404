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
_VSRC = os.path.join(_HERE, "video_decode.cc")
_VSO = os.path.join(_HERE, "_video_decode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_vlib: Optional[ctypes.CDLL] = None
_vtried = False


def _compile(src: str, so: str, extra=()) -> Optional[str]:
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so,
             *extra],
            check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def _build() -> Optional[str]:
    return _compile(_SRC, _SO)


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


def get_video_lib() -> Optional[ctypes.CDLL]:
    """FFmpeg-backed decoder (video_decode.cc); None if libav dev libs or a
    compiler are absent — callers fall back to the imageio path."""
    global _vlib, _vtried
    with _lock:
        if _vlib is not None or _vtried:
            return _vlib
        _vtried = True
        so = _compile(_VSRC, _VSO,
                      extra=("-lavformat", "-lavcodec", "-lavutil", "-lswscale"))
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.ov_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        lib.ov_probe.restype = ctypes.c_int
        lib.ov_decode_window.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.ov_decode_window.restype = ctypes.c_int
        _vlib = lib
        return _vlib


def video_available() -> bool:
    return get_video_lib() is not None


def probe_video(path: str):
    """-> (n_frames, fps, width, height); raises RuntimeError on failure."""
    lib = get_video_lib()
    if lib is None:
        raise RuntimeError("native video decoder unavailable")
    n = ctypes.c_int64(0)
    fps = ctypes.c_double(0.0)
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    err = lib.ov_probe(path.encode(), ctypes.byref(n), ctypes.byref(fps),
                       ctypes.byref(w), ctypes.byref(h))
    if err < 0 or n.value <= 0 or w.value <= 0 or h.value <= 0:
        raise RuntimeError(f"ov_probe failed for {path} (err={err})")
    return n.value, fps.value, w.value, h.value


def decode_video_window(path: str, start: int, count: int,
                        out_w: int, out_h: int) -> np.ndarray:
    """Decode frames [start, start+count) as (count, out_h, out_w, 3) uint8."""
    lib = get_video_lib()
    if lib is None:
        raise RuntimeError("native video decoder unavailable")
    out = np.empty((count, out_h, out_w, 3), np.uint8)
    got = lib.ov_decode_window(path.encode(), start, count, out_w, out_h,
                               out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    if got < 0:
        raise RuntimeError(f"ov_decode_window failed for {path} (err={got})")
    if got < count:
        raise RuntimeError(
            f"short decode for {path}: wanted [{start}, {start + count}), got {got}")
    return out


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

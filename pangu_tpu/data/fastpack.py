"""ctypes bindings for the native data-plane library (native/fastpack.cpp).

Auto-builds the .so on first use when a toolchain is available; every entry
point has a numpy fallback, so the pipeline works (slower) without it.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfastpack.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _threads() -> int:
    return min(8, os.cpu_count() or 1)


def load(build: bool = True) -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) and build:
                subprocess.run(["sh", os.path.join(_NATIVE_DIR, "build.sh")],
                               check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.fp_unpack_i16.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_int32,
                ctypes.c_int, ctypes.c_int]
            lib.fp_affine_f32.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_int]
            lib.fp_stack_flip.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, ctypes.c_int]
            lib.fp_normalize.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, ctypes.c_int]
            lib.fp_version.restype = ctypes.c_int32
            assert lib.fp_version() == 1
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return load() is not None


def unpack_i16(src: np.ndarray, scale: float, offset: float,
               fill: Optional[int] = None) -> np.ndarray:
    """CF int16 unpacking: src * scale + offset (fill -> NaN)."""
    src = np.ascontiguousarray(src, dtype=np.int16)
    lib = load()
    if lib is None:
        out = src.astype(np.float32) * np.float32(scale) + np.float32(offset)
        if fill is not None:
            out = np.where(src == fill, np.nan, out).astype(np.float32)
        return out
    dst = np.empty(src.shape, np.float32)
    lib.fp_unpack_i16(src.ctypes.data, dst.ctypes.data, src.size,
                      float(scale), float(offset),
                      int(fill or 0), int(fill is not None), _threads())
    return dst


def stack_flip(fields: Sequence[np.ndarray]) -> np.ndarray:
    """Stack per-variable (levels, lat, lon) cubes into
    (vars, levels, lat, lon) with the level axis reversed."""
    fields = [np.ascontiguousarray(f, dtype=np.float32) for f in fields]
    levels = fields[0].shape[0]
    plane = int(np.prod(fields[0].shape[1:]))
    lib = load()
    if lib is None:
        return np.ascontiguousarray(np.stack(fields)[:, ::-1])
    out = np.empty((len(fields),) + fields[0].shape, np.float32)
    ptrs = (ctypes.c_void_p * len(fields))(
        *[f.ctypes.data for f in fields])
    lib.fp_stack_flip(ptrs, out.ctypes.data, len(fields), levels, plane,
                      _threads())
    return out


def normalize(x: np.ndarray, mean: np.ndarray, std: np.ndarray) -> np.ndarray:
    """(x - mean) / std in place-sized copy; mean/std broadcast over the
    trailing (lat, lon) plane."""
    x = np.ascontiguousarray(x, dtype=np.float32)
    lead = int(np.prod(x.shape[:-2]))
    plane = int(np.prod(x.shape[-2:]))
    m = np.ascontiguousarray(np.broadcast_to(
        mean.reshape(mean.shape[0], -1, 1, 1), x.shape[:-2] + (1, 1)
    ).reshape(lead), np.float32)
    s = np.ascontiguousarray(np.broadcast_to(
        std.reshape(std.shape[0], -1, 1, 1), x.shape[:-2] + (1, 1)
    ).reshape(lead), np.float32)
    lib = load()
    if lib is None:
        return ((x.reshape(lead, plane) - m[:, None]) / s[:, None]
                ).reshape(x.shape)
    out = x.copy()
    lib.fp_normalize(out.ctypes.data, m.ctypes.data, s.ctypes.data,
                     lead, 1, plane, _threads())
    return out

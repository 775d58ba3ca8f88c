"""ctypes binding for the native host kernels (csrc/pcuda_host.cpp).

Builds the shared library on first use (g++, no external deps) and caches
it next to the source; every caller has a numpy fallback, so an environment
without a compiler still works — just slower on the hot host paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libpcuda_host.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_CSRC, "pcuda_host.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _LIB_PATH, src],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
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
        lib.pcuda_fps.restype = ctypes.c_int
        lib.pcuda_fps.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.pcuda_boundary_voxels.restype = ctypes.c_int64
        lib.pcuda_boundary_voxels.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.pcuda_largest_component.restype = None
        lib.pcuda_largest_component.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def fps(pts: np.ndarray, k: int, start: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    pts = np.ascontiguousarray(pts, dtype=np.float64)
    n, d = pts.shape
    out = np.zeros((k, d), dtype=np.float64)
    lib.pcuda_fps(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n,
        d,
        k,
        int(start) % n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def boundary_voxels(slab: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    slab = np.ascontiguousarray(slab, dtype=np.uint8)
    nz, ny, nx = slab.shape
    cap = int(slab.sum()) + 1
    out = np.zeros((cap, 3), dtype=np.int64)
    n = lib.pcuda_boundary_voxels(
        slab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        nz,
        ny,
        nx,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cap,
    )
    return out[: min(n, cap)]


def largest_component(mask: np.ndarray, label: int) -> np.ndarray:
    """Binary mask of the largest 6-connected blob of ``mask == label``."""
    lib = _load()
    assert lib is not None
    mask = np.ascontiguousarray(mask, dtype=np.int32)
    if mask.ndim == 2:
        mask = mask[np.newaxis]
        squeeze = True
    else:
        squeeze = False
    nz, ny, nx = mask.shape
    out = np.zeros_like(mask, dtype=np.uint8)
    lib.pcuda_largest_component(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nz,
        ny,
        nx,
        int(label),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out[0] if squeeze else out

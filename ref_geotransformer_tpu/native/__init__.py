"""ctypes bindings for the native host-side geometry kernels (geoops.cpp).

Compiled on first use with g++ (-O3 -march=native) into the package dir;
falls back to raising ImportError if no toolchain is available (callers can
then use the jnp kernels on the CPU backend instead).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = osp.dirname(osp.abspath(__file__))
_SRC = osp.join(_HERE, "geoops.cpp")
_LIB_PATH = osp.join(_HERE, "_geoops.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> None:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def _load() -> ctypes.CDLL:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not osp.exists(_LIB_PATH) or osp.getmtime(_LIB_PATH) < osp.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gt_grid_subsample.restype = ctypes.c_int64
        lib.gt_grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.gt_radius_neighbors.restype = None
        lib.gt_radius_neighbors.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _LIB = lib
        return lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def grid_subsample_native(points: np.ndarray, voxel_size: float, capacity: Optional[int] = None):
    """Voxel-grid centroids. Returns (s_points (K, 3), total_voxel_count)."""
    lib = _load()
    points = np.ascontiguousarray(points, np.float32)
    n = points.shape[0]
    cap = capacity if capacity is not None else n
    out = np.empty((cap, 3), np.float32)
    total = ctypes.c_int64(0)
    written = lib.gt_grid_subsample(
        _fptr(points), n, ctypes.c_float(voxel_size), _fptr(out), cap, ctypes.byref(total)
    )
    return out[:written].copy(), int(total.value)


def radius_neighbors_native(
    q_points: np.ndarray, s_points: np.ndarray, radius: float, limit: int
) -> np.ndarray:
    """(nq, limit) int32 neighbor indices, distance-sorted, sentinel == ns."""
    lib = _load()
    q_points = np.ascontiguousarray(q_points, np.float32)
    s_points = np.ascontiguousarray(s_points, np.float32)
    out = np.empty((q_points.shape[0], limit), np.int32)
    lib.gt_radius_neighbors(
        _fptr(q_points),
        q_points.shape[0],
        _fptr(s_points),
        s_points.shape[0],
        ctypes.c_float(radius),
        limit,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out

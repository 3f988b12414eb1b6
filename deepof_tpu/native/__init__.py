"""ctypes bindings for the C++ host kernels (deepof_tpu/native/kernels.cpp).

The shared library is built on first import with g++ if a compiler is
available, cached next to the source, and every entry point degrades to a
pure-numpy fallback (returning None from the loader) when it is not.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "kernels.cpp")
_LIB_PATH = os.path.join(_HERE, "_kernels.so")

_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            if not _build():
                _lib_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.kleinberg_q.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.c_double, ctypes.c_double, ctypes.c_int64,
                ctypes.c_double, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.filter_short.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.binary_median.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8),
            ]
            lib.point_polygon.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_uint8),
            ]
            _lib = lib
        except OSError:
            _lib_failed = True
        return _lib


def native_kleinberg_q(gaps, s, gamma, n, T, k):
    """C++ Kleinberg DP, or None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    gaps = np.ascontiguousarray(gaps, dtype=np.float64)
    out = np.empty(len(gaps), dtype=np.float64)
    lib.kleinberg_q(
        gaps.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(gaps), float(s), float(gamma), int(n), float(T), int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def native_filter_short(a, min_length):
    """C++ boolean run-length filter, or None."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint8)
    out = np.empty(len(a), dtype=np.uint8)
    lib.filter_short(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(a), int(min_length),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def native_point_polygon(points, polygon):
    """C++ fused point-to-polygon distance + inside test, or None.

    points: (T, 2) float; polygon: (V, 2) float with no repeated closing
    vertex. Returns (dist (T,) float64, inside (T,) bool).
    """
    lib = get_lib()
    if lib is None or getattr(lib, "point_polygon", None) is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    poly = np.ascontiguousarray(polygon, dtype=np.float64)
    n = len(pts)
    dist = np.empty(n, dtype=np.float64)
    inside = np.empty(n, dtype=np.uint8)
    lib.point_polygon(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        poly.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(poly),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        inside.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return dist, inside.astype(bool)


def native_binary_median(a, lag):
    """C++ binary moving median, or None."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint8)
    out = np.empty(len(a), dtype=np.uint8)
    lib.binary_median(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(a), int(lag),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)

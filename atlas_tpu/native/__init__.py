"""Native (C++) setup-path components, built on demand with g++.

The reference implements its setup-heavy graph/geometry algorithms in C++; we
do the same for the pieces where vectorized numpy is awkward or slow: the
mesh-row zipper (src/zipper.cc), spherical-polygon clipping for conservative
remap weights (src/csp.cc). All sources under src/ are compiled into ONE
shared library, rebuilt when any source changes (content hash in the file
name); ctypes bindings with pure-Python fallbacks of identical semantics keep
everything working where no compiler is available.
"""

from __future__ import annotations

import ctypes
import glob
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SOURCES = sorted(glob.glob(os.path.join(_HERE, "src", "*.cc")))
_lock = threading.Lock()
_lib = None
_lib_failed = False

_F64P = ctypes.POINTER(ctypes.c_double)
_I64P = ctypes.POINTER(ctypes.c_int64)
_I32P = ctypes.POINTER(ctypes.c_int32)

# name -> (restype, argtypes); applied when the library loads
_SIGNATURES = {
    "zip_rows": (
        ctypes.c_int64,
        [_F64P, ctypes.c_int64, _F64P, ctypes.c_int64, ctypes.c_double, _I64P],
    ),
    "csp_intersect": (
        None,
        [_F64P, _I64P, ctypes.c_int64, _F64P, _I64P, ctypes.c_int64,
         ctypes.c_int64, _F64P, _F64P],
    ),
}


def _build() -> str | None:
    h = hashlib.md5()
    for src in _SOURCES:
        with open(src, "rb") as f:
            h.update(f.read())
    so_path = os.path.join(_HERE, f"_native_{h.hexdigest()[:12]}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", so_path + ".tmp"] + _SOURCES,
            check=True,
            capture_output=True,
        )
        os.replace(so_path + ".tmp", so_path)
        for stale in glob.glob(os.path.join(_HERE, "_native_*.so")):
            if stale != so_path:
                try:
                    os.remove(stale)
                except OSError:
                    pass
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    with _lock:
        if _lib is None and not _lib_failed:
            path = _build()
            if path is None:
                _lib_failed = True
                return None
            lib = ctypes.CDLL(path)
            for name, (restype, argtypes) in _SIGNATURES.items():
                fn = getattr(lib, name)
                fn.restype = restype
                fn.argtypes = argtypes
            _lib = lib
    return _lib


def _ptr_f64(a):
    return a.ctypes.data_as(_F64P)


def _ptr_i64(a):
    return a.ctypes.data_as(_I64P)


# --------------------------------------------------------------------- zipper
def zip_rows(xN: np.ndarray, xS: np.ndarray, max_angle_deg: float = 0.0) -> np.ndarray:
    """Element kinds for the zipper between two rows (atlas rules, angle=0).

    xN, xS: ascending positions, len nN+1 / nS+1 (last = wrap). Returns int64
    kinds: 0 = triangle advancing N, 1 = triangle advancing S, 2 = quad.
    """
    xN = np.ascontiguousarray(xN, dtype=np.float64)
    xS = np.ascontiguousarray(xS, dtype=np.float64)
    endN = len(xN) - 1
    endS = len(xS) - 1
    lib = _get_lib()
    if lib is not None:
        out = np.empty(endN + endS, dtype=np.int64)
        n = lib.zip_rows(_ptr_f64(xN), endN, _ptr_f64(xS), endS,
                         float(max_angle_deg), _ptr_i64(out))
        if n < 0:
            raise RuntimeError("zip_rows: inconsistent row positions")
        return out[:n]
    return _zip_rows_py(xN, xS, max_angle_deg)


def _zip_rows_py(xN, xS, max_angle_deg):
    """Pure-Python fallback, identical semantics."""
    import math

    endN = len(xN) - 1
    endS = len(xS) - 1
    rad = math.pi / 180.0
    iN = iS = 0
    kinds = []
    while not (iN == endN and iS == endS):
        iN2 = min(iN + 1, endN)
        iS2 = min(iS + 1, endS)
        xN1, xN2 = xN[iN] * rad, xN[iN2] * rad
        xS1, xS2 = xS[iS] * rad, xS[iS2] * rad
        canN = iN != iN2
        canS = iS != iS2
        dxN = abs(xN2 - xN1)
        dxS = abs(xS2 - xS1)
        dx = min(dxN, dxS)
        alpha1 = 0.0 if dx == 0.0 else math.atan2(xN1 - xS1, dx) / rad
        alpha2 = 0.0 if dx == 0.0 else math.atan2(xN2 - xS2, dx) / rad
        if abs(alpha1) <= max_angle_deg and abs(alpha2) <= max_angle_deg:
            kind = 1 if not canN else (0 if not canS else 2)
        else:
            dN1S2 = abs(xN1 - xS2)
            dS1N2 = abs(xS1 - xN2)
            if dN1S2 <= dS1N2 and canS:
                kind = 1
            elif dN1S2 >= dS1N2 and canN:
                kind = 0
            elif not canN:
                kind = 1
            else:
                kind = 0
        if not canN:
            kind = 1
        if not canS:
            kind = 0
        kinds.append(kind)
        if kind != 1:
            iN = iN2
        if kind != 0:
            iS = iS2
    return np.asarray(kinds, dtype=np.int64)


# ------------------------------------------------- spherical polygon clipping
def csp_intersect(subj, subj_count, clip, clip_count):
    """Areas + unit centroids of pairwise intersections of convex spherical
    polygons (CCW unit vectors).

    subj (M, NVS, 3), subj_count (M,), clip (M, NVC, 3), clip_count (M,)
    -> (area (M,), centroid (M, 3); centroid is 0 where the overlap is empty).
    """
    subj = np.ascontiguousarray(subj, dtype=np.float64)
    clip = np.ascontiguousarray(clip, dtype=np.float64)
    subj_count = np.ascontiguousarray(subj_count, dtype=np.int64)
    clip_count = np.ascontiguousarray(clip_count, dtype=np.int64)
    M, nvs, _ = subj.shape
    nvc = clip.shape[1]
    lib = _get_lib()
    if lib is not None:
        area = np.empty(M)
        cent = np.empty((M, 3))
        lib.csp_intersect(_ptr_f64(subj), _ptr_i64(subj_count), nvs,
                          _ptr_f64(clip), _ptr_i64(clip_count), nvc,
                          M, _ptr_f64(area), _ptr_f64(cent))
        return area, cent
    return _csp_intersect_py(subj, subj_count, clip, clip_count)


def _csp_intersect_py(subj, subj_count, clip, clip_count):
    """Vectorized-numpy fallback (identical semantics)."""
    from ..util.spherical_polygon import (
        intersect_polygons, polygon_area, polygon_centroid, _pad_to)

    cap = int(subj.shape[1] + clip.shape[1] + 8)
    verts, count = intersect_polygons(
        _pad_to(subj, cap), subj_count, clip, clip_count, capacity=cap)
    area = polygon_area(verts, count)
    cent = polygon_centroid(verts, count)
    cent[area <= 0.0] = 0.0
    return area, cent

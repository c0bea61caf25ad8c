"""Native (C++) setup-path components, built on demand with g++.

The reference implements its setup-heavy graph algorithms in C++; we do the
same for the pieces where vectorized numpy is awkward or slow (currently the
mesh-row zipper; halo set construction and spherical polygon clipping follow
the same pattern). The shared library is compiled once per source hash into
the package directory; a pure-Python fallback with identical semantics keeps
everything working where no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "zipper.cc")
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    so_path = os.path.join(_HERE, f"_native_{digest}.so")
    if os.path.exists(so_path):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so_path + ".tmp", _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(so_path + ".tmp", so_path)
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
            lib.zip_rows.restype = ctypes.c_int64
            lib.zip_rows.argtypes = [
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_int64,
                ctypes.c_double,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
    return _lib


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
        n = lib.zip_rows(
            xN.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            endN,
            xS.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            endS,
            float(max_angle_deg),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
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

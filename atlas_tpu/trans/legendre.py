"""Associated Legendre functions for spherical-harmonic transforms.

Reference behavior: atlas trans/local/LegendrePolynomials.cc:47,154 computes
the normalised associated Legendre functions P̄_n^m(sin lat) per latitude with
the Belousov/standard stable recursion, split into symmetric/antisymmetric
parts packed per m (TransLocal.cc:602-631).

Normalization here: orthonormal on the sphere with the geodesy 4π convention
  (1/4π) ∫ P̄_n^m(sin θ) e^{imλ} · conj(...) dΩ = 1,
the same convention as the reference (spherical harmonics of util/function/
SphericalHarmonic.h times sqrt(4π); m>0 modes carry sqrt(2)).

Computed vectorized over latitudes in float64.
"""

from __future__ import annotations

import numpy as np


def nspec2(truncation: int) -> int:
    """Number of packed real coefficients: (T+1)(T+2) (re+im per (m,n))."""
    t = truncation
    return (t + 1) * (t + 2)


def spectral_index(truncation: int):
    """(m, n) arrays for the packed complex coefficient layout.

    Layout (reference Spectral functionspace): for m = 0..T, for n = m..T —
    complex coefficient index k(m, n); the real packing interleaves (re, im).
    """
    t = truncation
    ms = []
    ns = []
    for m in range(t + 1):
        for n in range(m, t + 1):
            ms.append(m)
            ns.append(n)
    return np.asarray(ms), np.asarray(ns)


def legendre_polynomials(truncation: int, sinlat: np.ndarray) -> np.ndarray:
    """P̄_n^m(x) for all 0 <= m <= n <= T at x = sinlat.

    Returns (nlat, ncoef) with ncoef = (T+1)(T+2)/2 in the packed (m, n)
    order of spectral_index. Uses the standard stable normalized recursion:
      P̄_m^m   = sqrt((2m+1)/(2m)) * cos(lat) * P̄_(m-1)^(m-1)
      P̄_m+1^m = sqrt(2m+3) * x * P̄_m^m
      P̄_n^m   = a * (x * P̄_(n-1)^m - P̄_(n-2)^m / a_prev)  (fully normalized)
    with P̄_0^0 = 1 (so the n=0, m=0 mode is the sphere mean).
    """
    t = truncation
    x = np.asarray(sinlat, dtype=np.float64)
    cos = np.sqrt(np.maximum(0.0, 1.0 - x * x))
    nlat = len(x)
    ncoef = (t + 1) * (t + 2) // 2
    out = np.empty((nlat, ncoef))

    # index of (m, n) in packed order
    offs = np.concatenate([[0], np.cumsum(t + 1 - np.arange(t + 1))])

    pmm = np.ones(nlat)  # P̄_0^0
    for m in range(t + 1):
        if m > 0:
            pmm = pmm * cos * np.sqrt((2 * m + 1) / (2.0 * m))
        col = offs[m]
        out[:, col] = pmm
        if m + 1 <= t:
            pm1 = np.sqrt(2 * m + 3.0) * x * pmm
            out[:, col + 1] = pm1
            pn_2, pn_1 = pmm, pm1
            for n in range(m + 2, t + 1):
                a = np.sqrt((4.0 * n * n - 1.0) / (n * n - m * m))
                b = np.sqrt(
                    ((2.0 * n + 1.0) * ((n - 1.0) ** 2 - m * m))
                    / ((2.0 * n - 3.0) * (n * n - m * m))
                )
                pn = a * x * pn_1 - b * pn_2
                out[:, offs[m] + (n - m)] = pn
                pn_2, pn_1 = pn_1, pn
    return out

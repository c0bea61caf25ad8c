"""Gaussian latitudes and quadrature weights.

Reference behavior: atlas grid/detail/spacing/gaussian/Latitudes.cc computes the
roots of the ordinary Legendre polynomial P_N(sin(lat)) by Newton iteration on a
Fourier-series representation. Here we use the standard vectorized Newton
iteration on the three-term Legendre recurrence, which converges to machine
precision in < 10 iterations and matches the reference latitudes to 1e-13 deg.
"""

from __future__ import annotations

import functools

import numpy as np

from ..util.constants import RAD2DEG


@functools.lru_cache(maxsize=64)
def _legendre_roots_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Roots x (descending) and Gauss-Legendre weights of P_n on [-1, 1]."""
    k = np.arange(1, n + 1, dtype=np.float64)
    # Tricomi/standard initial guess for the k-th root (descending in x)
    x = np.cos(np.pi * (k - 0.25) / (n + 0.5))
    for _ in range(100):
        # evaluate P_n and P_{n-1} by upward recurrence, vectorized over roots
        p0 = np.ones_like(x)
        p1 = x.copy()
        for j in range(2, n + 1):
            p0, p1 = p1, ((2 * j - 1) * x * p1 - (j - 1) * p0) / j
        # derivative: P'_n = n (x P_n - P_{n-1}) / (x^2 - 1)
        dp = n * (x * p1 - p0) / (x * x - 1.0)
        dx = p1 / dp
        x -= dx
        if np.max(np.abs(dx)) < 1e-15:
            break
    # recompute p at converged x for the weights
    p0 = np.ones_like(x)
    p1 = x.copy()
    for j in range(2, n + 1):
        p0, p1 = p1, ((2 * j - 1) * x * p1 - (j - 1) * p0) / j
    dp = n * (x * p1 - p0) / (x * x - 1.0)
    w = 2.0 / ((1.0 - x * x) * dp * dp)
    # enforce exact symmetry (the reference's tabulated values are symmetric)
    x = 0.5 * (x - x[::-1])
    w = 0.5 * (w + w[::-1])
    return x, w


def gaussian_latitudes_npole_spole(ny: int) -> np.ndarray:
    """ny Gaussian latitudes [deg], ordered north pole -> south pole.

    ``ny`` is the *total* number of latitudes (2N for an N Gaussian grid).
    """
    x, _ = _legendre_roots_weights(ny)
    return np.arcsin(np.clip(x, -1.0, 1.0)) * RAD2DEG


def gaussian_quadrature_npole_spole(ny: int) -> tuple[np.ndarray, np.ndarray]:
    """(latitudes [deg], quadrature weights summing to 2), north -> south."""
    x, w = _legendre_roots_weights(ny)
    return np.arcsin(np.clip(x, -1.0, 1.0)) * RAD2DEG, w


def gaussian_latitudes_npole_equator(n: int) -> np.ndarray:
    """First n (northern) latitudes of a 2n-latitude Gaussian distribution."""
    return gaussian_latitudes_npole_spole(2 * n)[:n]

"""Spectral vorticity/divergence -> spectral U = u cos(lat), V = v cos(lat).

Reference behavior: atlas trans/local/VorDivToUVLocal.cc (vd2uv, :62-190),
implementing Temperton 1991 MWR 119 eqs (2.12)-(2.13):

  U(m,n) = (1/R) [  i m L(n) D(m,n)
                   + (n-1) eps(n,m)   L(n-1) Z(m,n-1)
                   - (n+2) eps(n+1,m) L(n+1) Z(m,n+1) ]
  V(m,n) = (1/R) [  i m L(n) Z(m,n)
                   - (n-1) eps(n,m)   L(n-1) D(m,n-1)
                   + (n+2) eps(n+1,m) L(n+1) D(m,n+1) ]

with L(n) = -R^2/(n(n+1)) (L(0) = 0) and eps(n,m) = sqrt((n^2-m^2)/(4n^2-1)).
Vectorized over the packed coefficient layout; terms referencing n beyond the
truncation are zero (the reference pads its work arrays with zeros).
"""

from __future__ import annotations

import numpy as np

from ..util.constants import EARTH_RADIUS
from .legendre import nspec2, spectral_index


class VorDivToUV:
    def __init__(self, truncation: int, radius: float = EARTH_RADIUS):
        self.truncation = int(truncation)
        self.radius = float(radius)
        t = self.truncation
        ms, ns = spectral_index(t)
        self.ms, self.ns = ms, ns
        ncoef = len(ms)

        n = ns.astype(np.float64)
        m = ms.astype(np.float64)

        def lap(nv):
            nv = np.asarray(nv, dtype=np.float64)
            safe = np.where(nv > 0, nv, 1.0)
            return np.where(nv > 0, -self.radius**2 / (safe * (safe + 1.0)), 0.0)

        def eps(nv, mv):
            nv = np.asarray(nv, dtype=np.float64)
            num = nv * nv - mv * mv
            den = 4.0 * nv * nv - 1.0
            return np.where(nv > np.abs(mv), np.sqrt(np.maximum(num / den, 0.0)), 0.0)

        # neighbour coefficient indices within the same m (or -1)
        k_of = {}
        for k, (mm, nn) in enumerate(zip(ms, ns)):
            k_of[(mm, nn)] = k
        self.k_dn = np.array([k_of.get((mm, nn - 1), -1) for mm, nn in zip(ms, ns)])
        self.k_up = np.array([k_of.get((mm, nn + 1), -1) for mm, nn in zip(ms, ns)])

        self.c_self = m * lap(n) / self.radius  # multiplies i * (other field)
        self.c_dn = (n - 1.0) * eps(n, m) * lap(n - 1) / self.radius
        self.c_up = (n + 2.0) * eps(n + 1, m) * lap(n + 1) / self.radius
        self.c_dn[self.k_dn < 0] = 0.0
        self.c_up[self.k_up < 0] = 0.0

    def execute(self, vorticity, divergence):
        """Packed real spectra (..., nspec2) -> (U, V) packed real spectra."""
        vor = np.asarray(vorticity, dtype=np.float64)
        div = np.asarray(divergence, dtype=np.float64)
        zr, zi = vor[..., 0::2], vor[..., 1::2]
        dr, di = div[..., 0::2], div[..., 1::2]

        def nb(x, k):
            out = np.where(k >= 0, x[..., np.maximum(k, 0)], 0.0)
            return out

        kd, ku = self.k_dn, self.k_up
        # U = i m L D + c_dn Z(n-1) - c_up Z(n+1)
        ur = -self.c_self * di + self.c_dn * nb(zr, kd) - self.c_up * nb(zr, ku)
        ui = +self.c_self * dr + self.c_dn * nb(zi, kd) - self.c_up * nb(zi, ku)
        # V = i m L Z - c_dn D(n-1) + c_up D(n+1)
        vr = -self.c_self * zi - self.c_dn * nb(dr, kd) + self.c_up * nb(dr, ku)
        vi = +self.c_self * zr - self.c_dn * nb(di, kd) + self.c_up * nb(di, ku)

        U = np.empty_like(vor)
        V = np.empty_like(vor)
        U[..., 0::2], U[..., 1::2] = ur, ui
        V[..., 0::2], V[..., 1::2] = vr, vi
        return U, V

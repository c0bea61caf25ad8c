"""Spectral function space (reference: atlas functionspace/Spectral.h:43-115).

Fields of packed real spectral coefficients for truncation T: nspec2 =
(T+1)(T+2) reals ((re, im) per (m, n) with n = m..T). Serial layout (the
reference distributes over zonal wavenumbers only via ectrans; SURVEY 2.7).
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from ..trans.legendre import nspec2, spectral_index


class Spectral:
    def __init__(self, truncation: int, levels: int | None = None):
        self.truncation = int(truncation)
        self.levels = levels
        self.nspec2 = nspec2(self.truncation)
        self.m, self.n = spectral_index(self.truncation)

    @property
    def nb_spectral_coefficients(self) -> int:
        return self.nspec2

    @property
    def nb_spectral_coefficients_global(self) -> int:
        return self.nspec2

    def create_field(self, name="spectral", levels=None, dtype=np.float64):
        levels = levels if levels is not None else self.levels
        shape = (self.nspec2,) if not levels else (levels, self.nspec2)
        return Field(name, np.zeros(shape, dtype), functionspace=self, levels=levels)

    def norm(self, data, rank: int = 0):
        """Spherical L2 norm of a spectral field (m>0 modes count twice)."""
        data = np.asarray(data)
        re = data[..., 0::2]
        im = data[..., 1::2]
        w = np.where(self.m == 0, 1.0, 2.0)
        return np.sqrt(((re**2 + im**2) * w).sum(axis=-1))

    def halo_exchange(self, data):
        return data

    def zonal_mean_modes(self):
        """Indices of the m == 0 coefficients (real parts)."""
        return 2 * np.flatnonzero(self.m == 0)

    def __repr__(self):
        return f"Spectral(T={self.truncation})"

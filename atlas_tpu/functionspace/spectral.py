"""Spectral function space (reference: atlas functionspace/Spectral.h:43-115).

Fields of packed real spectral coefficients for truncation T: nspec2 =
(T+1)(T+2) reals ((re, im) per (m, n) with n = m..T). Serial layout (the
reference distributes over zonal wavenumbers only via ectrans; SURVEY 2.7).
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from .base import FunctionSpace
from ..trans.legendre import nspec2, spectral_index


class Spectral(FunctionSpace):
    def __init__(self, truncation: int, levels: int | None = None,
                 nb_parts: int = 1, part: int = 0):
        self.truncation = int(truncation)
        self.levels = levels
        self.nb_parts = int(nb_parts)
        self.part = int(part)
        self.m, self.n = spectral_index(self.truncation)
        if self.nb_parts > 1:
            # distributed over zonal wavenumbers m, ectrans-style (reference
            # Spectral.cc:54-75: nump/my_ms/nspec2 via the transi C API)
            from ..trans.dist import SpectralDistribution

            self._dist = SpectralDistribution(self.truncation, self.nb_parts)
            self.my_ms = self._dist.my_ms(self.part)
            self.nump = self._dist.nump(self.part)
            self.nspec2 = self._dist.nspec2(self.part)
        else:
            self._dist = None
            self.my_ms = np.arange(self.truncation + 1)
            self.nump = self.truncation + 1
            self.nspec2 = nspec2(self.truncation)

    @property
    def nb_spectral_coefficients(self) -> int:
        return self.nspec2

    @property
    def nb_spectral_coefficients_global(self) -> int:
        return nspec2(self.truncation)

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

    # ----------------------------------------------- scatter / gather
    # Reference: Spectral::gather/scatter move spectral fields between the
    # global packed layout and the per-partition m-distributed layout
    # (functionspace/Spectral.cc:54-75 via trans; here the layout is the
    # round-robin SpectralDistribution shared with TransDistributed).

    def local_index(self, part: int | None = None) -> np.ndarray:
        """Global packed indices of this part's local coefficients.

        Local layout: for m in my_ms (ascending), for n = m..T: (re, im) —
        matching nspec2(part)."""
        part = self.part if part is None else part
        t = self.truncation
        ms_p = (self._dist.my_ms(part) if self._dist is not None
                else np.arange(t + 1))
        lut = np.full((t + 1, t + 1), -1, np.int64)
        lut[self.m, self.n] = np.arange(len(self.m))
        ks = np.concatenate(
            [lut[m, m:t + 1] for m in ms_p]) if len(ms_p) else np.zeros(0, np.int64)
        out = np.empty(2 * len(ks), np.int64)
        out[0::2] = 2 * ks
        out[1::2] = 2 * ks + 1
        return out

    def scatter(self, global_data, part: int | None = None) -> np.ndarray:
        """Global packed spectra (..., nspec2_global) -> this part's local
        packed coefficients (..., nspec2(part))."""
        return np.asarray(global_data)[..., self.local_index(part)]

    def gather(self, parts_data) -> np.ndarray:
        """Per-part local arrays (list over parts, or {part: data}) ->
        global packed spectra."""
        if isinstance(parts_data, dict):
            items = sorted(parts_data.items())
        else:
            items = list(enumerate(parts_data))
        first = np.asarray(items[0][1])
        out = np.zeros(first.shape[:-1] + (self.nb_spectral_coefficients_global,),
                       first.dtype)
        for part, data in items:
            out[..., self.local_index(part)] = np.asarray(data)
        return out

    def __repr__(self):
        return f"Spectral(T={self.truncation})"

"""PointCloud function space (reference: atlas functionspace/PointCloud.h:46-76).

Arbitrary point sets; serves as an interpolation source/target and supports
fields without connectivity.
"""

from __future__ import annotations

import numpy as np

from ..field import Field


class PointCloud:
    def __init__(self, lonlat: np.ndarray, levels: int | None = None):
        if hasattr(lonlat, "lonlat"):
            lonlat = lonlat.lonlat()
        self._lonlat = np.asarray(lonlat, dtype=np.float64).reshape(-1, 2)
        self.levels = levels

    @property
    def size(self) -> int:
        return len(self._lonlat)

    def lonlat(self) -> np.ndarray:
        return self._lonlat

    def create_field(self, name="field", levels=None, variables=None, dtype=np.float64):
        levels = levels if levels is not None else self.levels
        shape = (self.size,)
        if levels:
            shape += (levels,)
        if variables:
            shape += (variables,)
        return Field(name, np.zeros(shape, dtype), functionspace=self, levels=levels, variables=variables)

    def halo_exchange(self, data):
        return data

    def __repr__(self):
        return f"PointCloud(size={self.size})"

"""CubedSphereColumns: fields on cubed-sphere grid points with tile-ij structure.

Reference behavior: atlas functionspace/CubedSphereColumns.h:30 +
detail/CubedSphereStructure.h — wraps Node/CellColumns with (t, j, i) index
arrays so kernels can loop tile-structured. TPU design: fields ARE (6, N, N
[, ...]) dense arrays (the natural blocked layout for Pallas kernels); the
flat view matches grid point order.
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from .base import FunctionSpace


class CubedSphereColumns(FunctionSpace):
    def __init__(self, grid, levels: int | None = None):
        from ..grid.cubedsphere import CubedSphereGrid

        if not isinstance(grid, CubedSphereGrid):
            raise TypeError("CubedSphereColumns needs a CubedSphereGrid")
        self.grid = grid
        self.levels = levels
        self.N = grid.N
        self.size = grid.size  # 6 N^2

    def lonlat(self):
        return self.grid.lonlat()

    def tji(self):
        """(t, j, i) index arrays aligned with the flat grid order
        (reference CubedSphereStructure tij iteration)."""
        return self.grid.tji()

    def create_field(self, name="field", levels=None, variables=None, dtype=np.float64, tiled=True):
        levels = levels if levels is not None else self.levels
        shape = (6, self.N, self.N) if tiled else (self.size,)
        if levels:
            shape += (levels,)
        if variables:
            shape += (variables,)
        return Field(name, np.zeros(shape, dtype), functionspace=self, levels=levels, variables=variables)

    def to_tiles(self, flat):
        """(6 N^2, ...) -> (6, N, N, ...)."""
        flat = np.asarray(flat)
        return flat.reshape((6, self.N, self.N) + flat.shape[1:])

    def to_flat(self, tiled):
        tiled = np.asarray(tiled)
        return tiled.reshape((self.size,) + tiled.shape[3:])

    def gather(self, data):
        return np.asarray(data).reshape((self.size,) + np.asarray(data).shape[3:])

    def checksum(self, data) -> str:
        from ..parallel.checksum import checksum

        return checksum(self.gather(data))

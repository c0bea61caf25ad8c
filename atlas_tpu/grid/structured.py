"""Structured grids: ny rows, per-row nx(j) points, periodic in x.

Reference behavior: atlas grid/StructuredGrid.h:57-126 and
grid/detail/grid/Structured.h — rows of points at latitudes y(j), each row an
even subdivision of [xmin(j), xmin(j)+360) (for global grids). Covers regular
and reduced Gaussian, regular lon-lat (shifted variants), and custom spec
grids. All coordinate queries are vectorized.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np

from ..util.config import Config
from ..projection import Projection


class StructuredGrid:
    def __init__(
        self,
        name: str,
        nx: np.ndarray,
        y: np.ndarray,
        xmin: np.ndarray | float = 0.0,
        xspan: float = 360.0,
        periodic_x: bool = True,
        projection: Optional[Projection] = None,
    ):
        self._name = name
        self.nx = np.asarray(nx, dtype=np.int64)
        self.y = np.asarray(y, dtype=np.float64)
        assert self.nx.shape == self.y.shape
        self.ny = len(self.y)
        if np.isscalar(xmin):
            self.xmin = np.full(self.ny, float(xmin))
        else:
            self.xmin = np.asarray(xmin, dtype=np.float64)
        self.xspan = float(xspan)
        self.periodic_x = bool(periodic_x)
        with np.errstate(divide="ignore"):
            n_intervals = np.where(
                self.nx > 0, np.where(periodic_x, self.nx, np.maximum(self.nx - 1, 1)), 1
            )
        self.dx = self.xspan / n_intervals
        self.row_offset = np.concatenate([[0], np.cumsum(self.nx)])
        self.projection = projection or Projection()

    # -- basic queries ----------------------------------------------------
    @property
    def name(self) -> str:
        return self._name

    @property
    def size(self) -> int:
        return int(self.row_offset[-1])

    def __len__(self):
        return self.size

    @property
    def nxmax(self) -> int:
        return int(self.nx.max())

    @property
    def reduced(self) -> bool:
        return bool((self.nx != self.nx[0]).any())

    @property
    def regular(self) -> bool:
        return not self.reduced

    def x(self, i, j):
        """x coordinate (degrees) of point i in row j; vectorized over arrays."""
        i = np.asarray(i)
        j = np.asarray(j)
        return self.xmin[j] + i * self.dx[j]

    def index(self, i, j):
        """Global (row-major, ragged) index of point (i, j)."""
        return self.row_offset[np.asarray(j)] + np.asarray(i)

    def index2ij(self, gidx):
        gidx = np.asarray(gidx)
        j = np.searchsorted(self.row_offset, gidx, side="right") - 1
        i = gidx - self.row_offset[j]
        return i, j

    # -- vectorized full-grid coordinates ---------------------------------
    def ij(self) -> tuple[np.ndarray, np.ndarray]:
        """(i, j) arrays for all points in grid order."""
        j = np.repeat(np.arange(self.ny), self.nx)
        i = np.arange(self.size) - self.row_offset[j]
        return i, j

    def xy(self) -> np.ndarray:
        """(size, 2) array of (x, y) in grid (projection) space, degrees."""
        i, j = self.ij()
        return np.stack([self.x(i, j), self.y[j]], axis=-1)

    def lonlat(self) -> np.ndarray:
        """(size, 2) geographic lon-lat degrees (projection applied)."""
        return self.projection.xy2lonlat(self.xy())

    # -- identity ---------------------------------------------------------
    def spec(self) -> Config:
        return Config(
            type="structured",
            name=self._name,
            ny=self.ny,
            nx=self.nx.tolist(),
            y=self.y.tolist(),
            xmin=self.xmin.tolist(),
            projection=self.projection.spec(),
        )

    def uid(self) -> str:
        h = hashlib.md5()
        h.update(self.nx.tobytes())
        h.update(self.y.tobytes())
        h.update(self.xmin.tobytes())
        h.update(repr(self.projection.spec()).encode())
        return h.hexdigest()

    def __repr__(self):
        return f"StructuredGrid({self._name!r}, ny={self.ny}, size={self.size})"


class RegularLonLatGrid(StructuredGrid):
    pass


def reduced_gaussian(nx_per_row, name: str | None = None) -> StructuredGrid:
    """Reduced Gaussian grid from per-row point counts (ny = len(nx)).

    Reference: grid/detail/grid/Gaussian.cc reduced_gaussian() — Gaussian
    y-spacing over 2N latitudes with the given nx per row.
    """
    from .gaussian import gaussian_latitudes_npole_spole

    nx = np.asarray(nx_per_row, dtype=np.int64)
    y = gaussian_latitudes_npole_spole(len(nx))
    return StructuredGrid(name or f"reduced_gaussian(ny={len(nx)})", nx, y)

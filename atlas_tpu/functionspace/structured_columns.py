"""StructuredColumns / BlockStructuredColumns function spaces.

Reference behavior: atlas functionspace/detail/StructuredColumns.h:65-328 —
fields over the owned region of a structured grid (+halo), with index maps
(i, j) <-> local index, gather/scatter to global, halo exchange, checksum.
BlockStructuredColumns (detail/BlockStructuredColumns.h:63-133) exposes the
IFS NPROMA blocking: field shape (nblk, [levels,] nproma).

TPU design: the single-controller model keeps the global grid-ordered array as
the canonical field storage; the (nlev, ny, nxw) padded layout of
fvm/structured.py is the compute-facing view, and sharding over a device mesh
is delegated to parallel/sharded.py. Halo exchange on the padded layout is the
precomputed periodic column copy.
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from ..util.config import Config
from .base import FunctionSpace


class StructuredColumns(FunctionSpace):
    def __init__(self, grid, distribution=None, halo: int = 1, levels: int | None = None):
        from ..grid.structured import StructuredGrid

        if not isinstance(grid, StructuredGrid):
            raise TypeError("StructuredColumns requires a structured grid")
        self.grid = grid
        self.distribution = distribution
        self.halo = int(halo)
        self.levels = levels
        self._i, self._j = grid.ij()
        self.size = grid.size

    # -- index maps -------------------------------------------------------
    def index(self, i, j):
        """(i, j) -> local (= global, single controller) index."""
        return self.grid.index(i, j)

    @property
    def index_i(self):
        return self._i

    @property
    def index_j(self):
        return self._j

    def xy(self):
        return self.grid.xy()

    def lonlat(self):
        return self.grid.lonlat()

    # -- fields -----------------------------------------------------------
    def halo_exchange(self, data):
        """Fields here carry owned points only; nothing to exchange serially."""
        return data

    def __repr__(self):
        return f"StructuredColumns({self.grid.name!r}, halo={self.halo})"


class BlockStructuredColumns(StructuredColumns):
    """NPROMA-blocked view: fields shaped (nblk, nproma[, levels, variables]).

    Reference: functionspace/detail/BlockStructuredColumns.h — block_begin/
    block_size per block, last block possibly short (zero padded here).
    """

    def __init__(self, grid, distribution=None, halo: int = 1, levels=None, nproma: int = 128):
        super().__init__(grid, distribution, halo, levels)
        self.nproma = int(nproma)
        self.nblk = -(-self.size // self.nproma)

    def block_begin(self, jblk: int) -> int:
        return jblk * self.nproma

    def block_size(self, jblk: int) -> int:
        return min(self.nproma, self.size - jblk * self.nproma)

    def create_field(self, name="field", levels=None, variables=None, dtype=np.float64):
        levels = levels if levels is not None else self.levels
        shape = (self.nblk, self.nproma)
        if levels:
            shape += (levels,)
        if variables:
            shape += (variables,)
        return Field(name, np.zeros(shape, dtype), functionspace=self, levels=levels, variables=variables)

    def to_blocks(self, flat: np.ndarray) -> np.ndarray:
        """(size, ...) -> (nblk, nproma, ...), zero padded."""
        tail = flat.shape[1:]
        out = np.zeros((self.nblk * self.nproma,) + tail, flat.dtype)
        out[: self.size] = flat
        return out.reshape((self.nblk, self.nproma) + tail)

    def from_blocks(self, blocked: np.ndarray) -> np.ndarray:
        return blocked.reshape((self.nblk * self.nproma,) + blocked.shape[2:])[: self.size]

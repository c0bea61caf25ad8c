"""Simple partitioners: serial, bands family, checkerboard, cubedsphere.

Reference: atlas grid/detail/partitioner/{SerialPartitioner,BandsPartitioner,
CheckerboardPartitioner,CubedSpherePartitioner}.cc.
"""

from __future__ import annotations

import numpy as np

from .partitioner import Partitioner, partitioner_factory


def _equal_chunks(n: int, nb_parts: int) -> np.ndarray:
    """Partition ids for n items split into nb_parts near-equal contiguous chunks."""
    chunk = n // nb_parts
    counts = np.full(nb_parts, chunk, dtype=np.int64)
    counts[: n - chunk * nb_parts] += 1
    return np.repeat(np.arange(nb_parts, dtype=np.int32), counts)


@partitioner_factory.register("serial")
class SerialPartitioner(Partitioner):
    """Everything on partition 0 (SerialPartitioner.cc:17)."""

    type = "serial"

    def partition(self, grid) -> np.ndarray:
        return np.zeros(grid.size, dtype=np.int32)


@partitioner_factory.register("bands")
@partitioner_factory.register("equal_bands")
class BandsPartitioner(Partitioner):
    """Latitude bands with near-equal point counts (BandsPartitioner.cc:73).

    Grid order is row-major north->south, so contiguous equal-count chunks of
    the global index are latitude bands. On a TPU mesh this maps directly to
    sharding the point axis.
    """

    type = "bands"

    def partition(self, grid) -> np.ndarray:
        return _equal_chunks(grid.size, self.nb_parts)


@partitioner_factory.register("regular_bands")
class RegularBandsPartitioner(Partitioner):
    """Bands of whole rows, near-equal number of rows per partition."""

    type = "regular_bands"

    def partition(self, grid) -> np.ndarray:
        ny = grid.ny
        row_part = _equal_chunks(ny, self.nb_parts)
        return np.repeat(row_part, grid.nx).astype(np.int32)


@partitioner_factory.register("checkerboard")
class CheckerboardPartitioner(Partitioner):
    """Regular 2-D blocks over regular grids (CheckerboardPartitioner.cc:286).

    Splits nb_parts into (bands x per-band) close to the grid aspect ratio;
    the "bands" option forces the row-block count.
    """

    type = "checkerboard"

    def partition(self, grid) -> np.ndarray:
        if grid.reduced:
            raise ValueError("checkerboard partitioner requires a regular grid")
        nx, ny = int(grid.nx[0]), grid.ny
        nb_parts = self.nb_parts
        bands = self.config.get_int("bands", 0)
        if not bands:
            # most-square factorization: bands along y
            best = 1
            for b in range(1, nb_parts + 1):
                if nb_parts % b == 0 and abs(b / (nb_parts // b) - ny / nx) <= abs(
                    best / (nb_parts // best) - ny / nx
                ):
                    best = b
            bands = best
        if nb_parts % bands != 0:
            raise ValueError(f"nb_parts={nb_parts} not divisible by bands={bands}")
        per_band = nb_parts // bands
        row_band = _equal_chunks(ny, bands)
        col_block = _equal_chunks(nx, per_band)
        i, j = grid.ij()
        return (row_band[j] * per_band + col_block[i]).astype(np.int32)


@partitioner_factory.register("cubedsphere")
class CubedSpherePartitioner(Partitioner):
    """Per-tile band decomposition (CubedSpherePartitioner.cc:270).

    nb_parts is distributed over the 6 tiles; each tile's points are split into
    contiguous near-equal chunks.
    """

    type = "cubedsphere"

    def partition(self, grid) -> np.ndarray:
        from ..grid.cubedsphere import CubedSphereGrid

        if not isinstance(grid, CubedSphereGrid):
            raise ValueError("cubedsphere partitioner requires a CubedSphereGrid")
        nb_parts = self.nb_parts
        npt = grid.N * grid.N
        parts_per_tile = np.full(6, nb_parts // 6, dtype=np.int64)
        parts_per_tile[: nb_parts % 6] += 1
        if nb_parts < 6:
            # fewer parts than tiles: tiles grouped onto parts
            tile_part = _equal_chunks(6, nb_parts)
            return np.repeat(tile_part, npt).astype(np.int32)
        part = np.empty(6 * npt, dtype=np.int32)
        first = np.concatenate([[0], np.cumsum(parts_per_tile)])[:-1]
        for t in range(6):
            part[t * npt : (t + 1) * npt] = first[t] + _equal_chunks(npt, parts_per_tile[t])
        return part

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


def balanced_row_starts(nx_rows, nb_parts: int, min_rows: int = 1) -> np.ndarray:
    """Row-aligned bands with near-equal POINT counts: (nb_parts+1,) starts.

    The reference splits by point count, not row count (BandsPartitioner.cc:73
    uses nb_pts; EqualRegionsPartitioner.cc:278-360 balances points per ring
    collar). On reduced grids equal ROW counts skew points per part by the
    row-length ratio (up to ~6x pole vs equator on octahedral grids); this
    picks the row boundary nearest each ideal cumulative-point split, keeping
    row contiguity for the structured (ny, nxw) layout.
    """
    nx_rows = np.asarray(nx_rows, dtype=np.int64)
    ny = len(nx_rows)
    if nb_parts * min_rows > ny:
        raise ValueError(
            f"cannot split {ny} rows into {nb_parts} bands of >= {min_rows} rows"
        )
    cum = np.concatenate([[0], np.cumsum(nx_rows)])  # (ny+1,)
    total = cum[-1]
    starts = np.zeros(nb_parts + 1, dtype=np.int64)
    starts[nb_parts] = ny
    for p in range(1, nb_parts):
        ideal = total * p / nb_parts
        j = int(np.argmin(np.abs(cum - ideal)))
        # keep at least min_rows rows for every part on either side
        lo = starts[p - 1] + min_rows
        hi = ny - (nb_parts - p) * min_rows
        starts[p] = min(max(j, lo), hi)
    return starts


@partitioner_factory.register("balanced_bands")
class BalancedBandsPartitioner(Partitioner):
    """Row-aligned latitude bands balanced by point count (see
    balanced_row_starts): the partitioner used by the band-sharded TPU models,
    combining regular_bands' row contiguity with bands' point balance."""

    type = "balanced_bands"

    def partition(self, grid) -> np.ndarray:
        starts = balanced_row_starts(grid.nx, self.nb_parts)
        row_part = np.zeros(grid.ny, dtype=np.int32)
        for p in range(self.nb_parts):
            row_part[starts[p] : starts[p + 1]] = p
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

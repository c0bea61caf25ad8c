"""Shared FunctionSpace base (reference: atlas functionspace/FunctionSpace.h).

Reference behavior (functionspace/FunctionSpace.h:40-130, detail/
FunctionSpaceImpl.h): every concrete function space exposes createField,
gather/scatter, haloExchange, checksum, size, lonlat, and the partition
`polygon()` used by the Matching*FunctionSpace* partitioners
(grid/detail/partitioner/MatchingFunctionSpacePartitioner*.cc) to place a
target grid's points on the source function space's decomposition.

TPU design: the single-controller model means "this rank's polygon" becomes
"part p's polygon" with an explicit part argument; all parts' polygons are
available everywhere (no polygon gather round-trip as in the reference's
util/PartitionPolygon.cc).
"""

from __future__ import annotations

import numpy as np

from ..field import Field


class FunctionSpace:
    """Base: subclasses set `size` (owned+halo points) and implement
    `lonlat()`; everything else has sensible single-controller defaults."""

    levels: int | None = None
    distribution = None
    halo: int = 0

    # -- geometry ----------------------------------------------------------
    def lonlat(self) -> np.ndarray:
        raise NotImplementedError(f"{type(self).__name__} has no point coordinates")

    def owned_mask(self) -> np.ndarray:
        """Boolean mask of owned (non-ghost) points; default all owned."""
        return np.ones(self.size, dtype=bool)

    def _point_partition(self) -> np.ndarray:
        """Per-point owning part; default from distribution, else all part 0.

        Separate from `partition` because some subclasses (PointCloud) shadow
        `partition` with a per-slot field array in reference style.
        """
        if self.distribution is not None:
            return np.asarray(self.distribution.partition)
        return np.zeros(self.size, dtype=np.int32)

    def partition(self) -> np.ndarray:
        return self._point_partition()

    nb_parts: int = 1  # subclasses with a distribution overwrite / override

    # -- fields --------------------------------------------------------------
    def create_field(self, name="field", levels=None, variables=None,
                     dtype=np.float64):
        levels = levels if levels is not None else self.levels
        shape = (self.size,)
        if levels:
            shape += (levels,)
        if variables:
            shape += (variables,)
        return Field(name, np.zeros(shape, dtype), functionspace=self,
                     levels=levels, variables=variables)

    # -- parallel ops ---------------------------------------------------------
    def halo_exchange(self, data):
        return data

    def gather(self, data):
        """Owned-point values in canonical order (single-controller)."""
        data = np.asarray(data)
        mask = self.owned_mask()
        return data[mask] if not mask.all() else data

    def scatter(self, data):
        return np.asarray(data)

    def checksum(self, data) -> str:
        from ..parallel.checksum import checksum

        return checksum(self.gather(data))

    # -- partition polygons ----------------------------------------------------
    def polygon(self, part: int = 0) -> np.ndarray:
        """Boundary polygon (lon, lat vertices) of `part`'s owned region.

        Reference FunctionSpace::polygon(halo) / util/PartitionPolygon.cc;
        used by the matching partitioners to place points of another grid on
        this function space's decomposition.
        """
        return self.polygons()[part]

    def polygons(self) -> list[np.ndarray]:
        """Boundary polygons of ALL parts (reference polygons())."""
        from ..partition.matching import partition_polygons

        lonlat = np.asarray(self.lonlat(), dtype=np.float64)
        mask = self.owned_mask()
        part = self._point_partition()
        nparts = int(part.max()) + 1 if len(part) else 1
        return partition_polygons(lonlat[mask], part[mask], nparts)

    def __repr__(self):
        return f"{type(self).__name__}(size={getattr(self, 'size', '?')})"

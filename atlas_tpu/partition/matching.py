"""Matching partitioners: partition a target grid to follow an existing
source distribution.

Reference behavior: atlas grid/detail/partitioner/MatchingMeshPartitioner*.cc —
given a source mesh / functionspace already distributed over parts, assign
every target grid point to the part whose domain contains it:

  "lonlat-polygon" / "spherical-polygon"  point-in-partition-polygon lookup
      (registrations MatchingMeshPartitionerLonLatPolygon.cc:40,
       ...SphericalPolygon.cc:33)
  "brute-force"  nearest owned source point's partition
      (...BruteForce.cc:36 checks containing elements; the nearest-owner rule
       assigns identical parts except within half a cell of partition
       boundaries, and guarantees a total assignment)

The polygon variants locate against each part's boundary polygon via
util.PolygonLocator and fall back to nearest-owner where polygons overlap or
miss (exactly the reference's fallback, MatchingMeshPartitioner.h).
"""

from __future__ import annotations

import numpy as np

from ..util.kdtree import IndexKDTree, PolygonLocator
from .partitioner import Partitioner, partitioner_factory


def _source_points_parts(source):
    """(lonlat, part) of OWNED source points, from a variety of sources."""
    from ..parallel.sharded import ShardedFvm
    from ..partition.distribution import Distribution

    if isinstance(source, Distribution):
        return source.grid.lonlat(), source.partition
    if isinstance(source, ShardedFvm):
        return source.grid.lonlat(), source.part
    if isinstance(source, tuple) and len(source) == 2:
        return np.asarray(source[0]), np.asarray(source[1])
    from ..functionspace.base import FunctionSpace

    if isinstance(source, FunctionSpace):
        # MatchingFunctionSpacePartitioner (reference grid/detail/partitioner/
        # MatchingFunctionSpacePartitionerLonLatPolygon.cc): owned points +
        # their owning part, from any function space
        mask = source.owned_mask()
        return np.asarray(source.lonlat())[mask], source._point_partition()[mask]
    if hasattr(source, "distribution") and source.distribution is not None:
        d = source.distribution
        return d.grid.lonlat(), d.partition
    raise TypeError(f"cannot extract (points, parts) from {type(source)}")


class MatchingPartitioner(Partitioner):
    """partition(grid) assigns each target point the part of the matching
    source region."""

    mode = "brute-force"

    def __init__(self, type_or_config=None, nb_parts=None, source=None, mode=None, **kw):
        if source is None and type_or_config is not None and not isinstance(type_or_config, (str, dict)):
            source = type_or_config  # MatchingPartitioner(source_obj) shorthand
        if source is None:
            raise ValueError("matching partitioner needs source= (Distribution, ShardedFvm, or (lonlat, part))")
        if mode is not None:
            self.mode = mode
        lonlat, part = _source_points_parts(source)
        self.src_lonlat = np.asarray(lonlat, dtype=np.float64)
        self.src_part = np.asarray(part, dtype=np.int32)
        self.nb_parts = int(self.src_part.max()) + 1
        self._tree = IndexKDTree(self.src_lonlat)

    def partition(self, grid) -> np.ndarray:
        tgt = np.asarray(grid.lonlat(), dtype=np.float64)
        near_idx, near_dist = self._tree.closest_points(tgt, k=1)
        nearest = np.asarray(near_idx).reshape(-1)
        near_dist = np.asarray(near_dist).reshape(-1)
        out = self.src_part[nearest]
        if self.mode in ("lonlat-polygon", "spherical-polygon"):
            polys = partition_polygons(self.src_lonlat, self.src_part, self.nb_parts)
            loc = PolygonLocator(polys)
            hit = loc(tgt)
            # convex hulls of adjacent parts overlap near boundaries; the
            # nearest-owner part wins whenever ITS polygon also contains the
            # point (the reference's exact polygons have no such overlap)
            own_contains = np.array(
                [
                    len(polys[p]) >= 3 and PolygonLocator._contains(polys[p], lon, lat)
                    for (lon, lat), p in zip(tgt, out)
                ]
            )
            # a target point coinciding with an owned source point is, by
            # definition, inside that part (hull edges are exclusive on their
            # high-latitude side, which would otherwise misfile it)
            own_contains |= near_dist < 1e-12
            out = np.where((hit >= 0) & ~own_contains, hit, out).astype(np.int32)
        return out.astype(np.int32)


def partition_polygons(lonlat: np.ndarray, part: np.ndarray, nb_parts: int):
    """Convex-hull boundary polygon of each part in (lon, lat) — the analog of
    the reference's partition polygons (mesh/detail/PartitionGraph polygons)."""
    from scipy.spatial import ConvexHull

    polys = []
    for p in range(nb_parts):
        pts = lonlat[part == p]
        if len(pts) < 3:
            polys.append(pts)
            continue
        try:
            hull = ConvexHull(pts)
            polys.append(pts[hull.vertices])
        except Exception:
            polys.append(pts)
    return polys


class MatchingLonLatPolygonPartitioner(MatchingPartitioner):
    mode = "lonlat-polygon"


class MatchingSphericalPolygonPartitioner(MatchingPartitioner):
    mode = "spherical-polygon"


partitioner_factory.register("matching", MatchingPartitioner)
partitioner_factory.register("brute-force", MatchingPartitioner)
partitioner_factory.register("lonlat-polygon", MatchingLonLatPolygonPartitioner)
partitioner_factory.register("spherical-polygon", MatchingSphericalPolygonPartitioner)


def MatchingMeshPartitioner(source, mode: str = "brute-force"):
    return MatchingPartitioner(source=source, mode=mode)


def MatchingFunctionSpacePartitioner(functionspace, mode: str = "lonlat-polygon"):
    """Partition a grid to match a FUNCTION SPACE's decomposition (reference
    MatchingFunctionSpacePartitioner / ...LonLatPolygon.cc): each target point
    goes to the part whose owned-region polygon contains it."""
    return MatchingPartitioner(source=functionspace, mode=mode)

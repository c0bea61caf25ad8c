"""KDTree on the unit sphere + polygon locators.

Reference: atlas util/KDTree.h:51 (wrapper over eckit SearchTree, building on
unit-sphere cartesian coordinates) and util/PolygonLocator.h:38 (point ->
partition lookup from partition polygons).
"""

from __future__ import annotations

import numpy as np

from .geometry import lonlat_to_xyz


class IndexKDTree:
    """k-d tree of lon-lat points searched in 3-D chord distance."""

    def __init__(self, lonlat: np.ndarray | None = None):
        self._pts = None
        self._tree = None
        self._payload = None
        if lonlat is not None:
            self.build(lonlat)

    def build(self, lonlat: np.ndarray, payload: np.ndarray | None = None):
        from scipy.spatial import cKDTree

        self._pts = np.asarray(lonlat, dtype=np.float64).reshape(-1, 2)
        self._payload = (
            np.arange(len(self._pts)) if payload is None else np.asarray(payload)
        )
        self._tree = cKDTree(lonlat_to_xyz(self._pts))
        return self

    def closest_points(self, lonlat, k: int = 1):
        """(payloads, great-circle distances [rad]) of the k nearest points."""
        p = lonlat_to_xyz(np.asarray(lonlat, dtype=np.float64).reshape(-1, 2))
        chord, idx = self._tree.query(p, k=k)
        dist = 2.0 * np.arcsin(np.clip(chord / 2.0, 0.0, 1.0))
        return self._payload[idx], dist

    def closest_points_within_radius(self, lonlat, radius_rad: float):
        p = lonlat_to_xyz(np.asarray(lonlat, dtype=np.float64).reshape(-1, 2))
        chord = 2.0 * np.sin(min(radius_rad, np.pi) / 2.0)
        groups = self._tree.query_ball_point(p, r=chord)
        return [self._payload[g] for g in groups]

    @property
    def size(self):
        return 0 if self._pts is None else len(self._pts)


class PolygonLocator:
    """Locate which partition polygon contains each point.

    Reference: util/PolygonLocator.h — lookup over the partition polygons of a
    distributed function space. Here polygons are (lon, lat) rings; containment
    via winding in the lon-lat chart with periodic wrap (matching the
    reference's PolygonXY lookup).
    """

    def __init__(self, polygons: list[np.ndarray]):
        self.polygons = [np.asarray(p, dtype=np.float64) for p in polygons]
        self._centroids = np.array([p.mean(axis=0) for p in self.polygons])
        self._kdtree = IndexKDTree(self._centroids)

    @staticmethod
    def _contains(poly: np.ndarray, lon: float, lat: float) -> bool:
        # even-odd rule in the chart; try lon, lon±360
        for shift in (0.0, 360.0, -360.0):
            x = lon + shift
            inside = False
            n = len(poly)
            for i in range(n):
                x1, y1 = poly[i]
                x2, y2 = poly[(i + 1) % n]
                if (y1 > lat) != (y2 > lat):
                    xc = x1 + (lat - y1) * (x2 - x1) / (y2 - y1)
                    if x < xc:
                        inside = not inside
            if inside:
                return True
        return False

    def __call__(self, lonlat) -> np.ndarray:
        pts = np.asarray(lonlat, dtype=np.float64).reshape(-1, 2)
        cand, _ = self._kdtree.closest_points(pts, k=min(len(self.polygons), 4))
        if cand.ndim == 1:
            cand = cand[:, None]
        out = np.full(len(pts), -1, dtype=np.int64)
        for i, (lon, lat) in enumerate(pts):
            for c in cand[i]:
                if self._contains(self.polygons[c], lon, lat):
                    out[i] = c
                    break
            if out[i] < 0:  # fallback: nearest centroid
                out[i] = cand[i][0]
        return out

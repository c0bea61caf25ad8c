"""Cubed-sphere grids (CS-LFR-<N>, CS-EA-<N>, CS-ED-<N>).

Reference: atlas grid/detail/grid/CubedSphere.cc and grid/detail/tiles/
{FV3Tiles,LFRicTiles}.cc — 6 tiles of N x N cell-centre points. CS-LFR uses
the LFRic tile layout, CS-EA/CS-ED the FV3 layout (CubedSphere.cc grid
builder) — the two layouts place tiles at DIFFERENT sphere positions and
orientations (cs_tiles.py).

TPU-first design: the grid is represented densely as a (6, N, N) tile array of
lon-lat points (no per-point iteration). Tile local coordinates (t, j, i) map
to the sphere through the tiles object's rotation tensor via the equiangular
(ED/LFR) or equidistant (EA) gnomonic transform, batched over whole tiles.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..util.constants import RAD2DEG
from ..util.geometry import xyz_to_lonlat
from .cs_tiles import tiles_for_stagger


class CubedSphereGrid:
    def __init__(self, N: int, stagger: str = "LFR"):
        self.N = int(N)
        self.stagger = stagger.upper()
        self._name = f"CS-{self.stagger}-{N}"
        self.tiles = tiles_for_stagger(self.stagger)
        # cell-centre local coordinates in (-1, 1)
        u = (np.arange(N) + 0.5) / N * 2.0 - 1.0
        if self.stagger in ("ED", "LFR"):
            alpha = u * 45.0  # equiangular: uniform in gnomonic ANGLE
        elif self.stagger == "EA":
            # equidistant: uniform in the tangent-plane coordinate tan(angle)
            alpha = np.arctan(u) * RAD2DEG
        else:
            raise ValueError(f"Unknown cubed-sphere stagger {stagger!r}")
        A, B = np.meshgrid(alpha, alpha, indexing="xy")  # alpha along i
        ab = np.stack([A.ravel(), B.ravel()], axis=1)  # (N*N, 2) degrees
        pts = np.empty((6, N, N, 3))
        for t in range(6):
            pts[t] = self.tiles.ab_to_xyz(ab, t).reshape(N, N, 3)
        self._xyz = pts  # (6, N, N, 3)
        self._lonlat = xyz_to_lonlat(pts.reshape(-1, 3)).reshape(6, N, N, 2)
        self._ab = ab

    @property
    def name(self) -> str:
        return self._name

    @property
    def size(self) -> int:
        return 6 * self.N * self.N

    def __len__(self):
        return self.size

    def lonlat(self) -> np.ndarray:
        """(size, 2) lon-lat degrees in tile-major (t, j, i) order."""
        return self._lonlat.reshape(-1, 2)

    def xyz(self) -> np.ndarray:
        return self._xyz.reshape(-1, 3)

    def xy(self) -> np.ndarray:
        """(size, 2) schematic unfolded xy degrees (layout-dependent: FV3
        staircase vs LFRic row — reference Grid::xy on cubed spheres)."""
        t, _, _ = self.tji()
        xy = self.tiles.alphabeta2xy(np.tile(self._ab, (6, 1)), t)
        return xy

    def corner_xyz(self) -> np.ndarray:
        """(6, N+1, N+1, 3) cell-CORNER unit vectors (mesh/dual-cell layout)."""
        N = self.N
        u = np.arange(N + 1) / N * 2.0 - 1.0
        if self.stagger in ("ED", "LFR"):
            alpha = u * 45.0
        else:
            alpha = np.arctan(u) * RAD2DEG
        A, B = np.meshgrid(alpha, alpha, indexing="xy")
        ab = np.stack([A.ravel(), B.ravel()], axis=1)
        out = np.empty((6, N + 1, N + 1, 3))
        for t in range(6):
            out[t] = self.tiles.ab_to_xyz(ab, t).reshape(N + 1, N + 1, 3)
        return out

    def tile_lonlat(self) -> np.ndarray:
        """(6, N, N, 2) lon-lat degrees — the TPU-native dense layout."""
        return self._lonlat

    def tji(self):
        t, j, i = np.meshgrid(
            np.arange(6), np.arange(self.N), np.arange(self.N), indexing="ij"
        )
        return t.ravel(), j.ravel(), i.ravel()

    def uid(self) -> str:
        h = hashlib.md5()
        h.update(self._name.encode())
        h.update(np.asarray([self.N]).tobytes())
        return h.hexdigest()

    def __repr__(self):
        return f"CubedSphereGrid({self._name!r}, size={self.size})"

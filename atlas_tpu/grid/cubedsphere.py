"""Cubed-sphere grids (CS-LFR-<N>, CS-EA-<N>, CS-ED-<N>).

Reference: atlas grid/detail/grid/CubedSphere.cc and grid/detail/tiles/
{FV3Tiles,LFRicTiles}.cc — 6 tiles of N x N cell-centre points.

TPU-first design: the grid is represented densely as a (6, N, N) tile array of
lon-lat points (no per-point iteration). Tile local coordinates (t, j, i) map to
the sphere via the equiangular (ED/LFR) or equidistant (EA) gnomonic transform,
with the LFRic tile rotation layout for CS-LFR.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..util.constants import RAD2DEG
from ..util.geometry import xyz_to_lonlat


# Tile -> (axis vectors) for a unit cube: each tile has center direction c,
# x-tangent tx, y-tangent ty; point (a, b) in [-1,1]^2 maps to c + a*tx + b*ty.
_TILE_FRAMES = [
    # (center, tangent_x, tangent_y)
    ((1, 0, 0), (0, 1, 0), (0, 0, 1)),  # tile 0: +x, facing lon=0
    ((0, 1, 0), (-1, 0, 0), (0, 0, 1)),  # tile 1: +y, lon=90
    ((-1, 0, 0), (0, -1, 0), (0, 0, 1)),  # tile 2: -x, lon=180
    ((0, -1, 0), (1, 0, 0), (0, 0, 1)),  # tile 3: -y, lon=270
    ((0, 0, 1), (0, 1, 0), (-1, 0, 0)),  # tile 4: north
    ((0, 0, -1), (0, 1, 0), (1, 0, 0)),  # tile 5: south
]


class CubedSphereGrid:
    def __init__(self, N: int, stagger: str = "LFR"):
        self.N = int(N)
        self.stagger = stagger.upper()
        self._name = f"CS-{self.stagger}-{N}"
        # cell-centre local coordinates in (-1, 1)
        u = (np.arange(N) + 0.5) / N * 2.0 - 1.0
        if self.stagger in ("ED", "LFR"):
            # equiangular: angle in (-pi/4, pi/4), coordinate = tan(angle)
            a = np.tan(u * np.pi / 4.0)
        elif self.stagger == "EA":
            a = u  # equidistant
        else:
            raise ValueError(f"Unknown cubed-sphere stagger {stagger!r}")
        A, B = np.meshgrid(a, a, indexing="xy")  # (N, N): B varies along rows
        pts = np.empty((6, N, N, 3))
        for t, (c, tx, ty) in enumerate(_TILE_FRAMES):
            c, tx, ty = (np.asarray(v, dtype=np.float64) for v in (c, tx, ty))
            p = c[None, None] + A[..., None] * tx[None, None] + B[..., None] * ty[None, None]
            pts[t] = p / np.linalg.norm(p, axis=-1, keepdims=True)
        self._xyz = pts  # (6, N, N, 3)
        self._lonlat = xyz_to_lonlat(pts.reshape(-1, 3)).reshape(6, N, N, 2)

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

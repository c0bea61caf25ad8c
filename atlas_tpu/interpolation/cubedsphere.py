"""Cubed-sphere bilinear interpolation.

Reference behavior: atlas interpolation/method/cubedsphere/CubedSphereBilinear
.cc:21 — bilinear weights in tile-local (alpha, beta) coordinates of the face
containing each target point; points whose 2x2 stencil crosses a tile edge use
the finite-element weights on the dual mesh instead (the reference uses ghost
halos of the neighbouring tile for the same purpose).
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz
from .interpolation import Method, interpolation_factory


class CubedSphereBilinear(Method):
    def __init__(self, grid, tgt_lonlat: np.ndarray):
        from ..grid.cubedsphere import CubedSphereGrid

        if not isinstance(grid, CubedSphereGrid):
            raise TypeError("cubedsphere-bilinear needs a CubedSphereGrid source")
        tgt = np.asarray(tgt_lonlat, dtype=np.float64).reshape(-1, 2)
        ntgt = len(tgt)
        N = grid.N
        self.nsrc = grid.size

        P = lonlat_to_xyz(tgt)
        tile = grid.tiles.index_from_xyz(P)
        frames = grid.tiles.frames()  # (6, 3 vectors (c/tx/ty), 3)
        c = frames[tile, 0]
        tx = frames[tile, 1]
        ty = frames[tile, 2]
        # gnomonic projection onto the tile plane: P/(P.c) = c + a tx + b ty
        s = np.einsum("ij,ij->i", P, c)
        Q = P / s[:, None]
        a = np.einsum("ij,ij->i", Q - c, tx)
        b = np.einsum("ij,ij->i", Q - c, ty)
        # invert the stagger map to fractional cell-centre index
        if grid.stagger in ("ED", "LFR"):
            u = np.arctan(a) / (np.pi / 4.0)
            v = np.arctan(b) / (np.pi / 4.0)
        else:
            u, v = a, b
        fi = (u + 1.0) * N / 2.0 - 0.5  # fractional index along x (cols)
        fj = (v + 1.0) * N / 2.0 - 0.5
        i0 = np.floor(fi).astype(np.int64)
        j0 = np.floor(fj).astype(np.int64)
        interior = (i0 >= 0) & (i0 <= N - 2) & (j0 >= 0) & (j0 <= N - 2)

        wa = fi - i0
        wb = fj - j0
        # grid point order is (tile, j, i) row-major with A along i
        base = tile * N * N
        idx = np.zeros((ntgt, 4), dtype=np.int32)
        w = np.zeros((ntgt, 4))
        ii = np.clip(i0, 0, N - 2)
        jj = np.clip(j0, 0, N - 2)
        idx[:, 0] = base + jj * N + ii
        idx[:, 1] = base + jj * N + ii + 1
        idx[:, 2] = base + (jj + 1) * N + ii + 1
        idx[:, 3] = base + (jj + 1) * N + ii
        w[:, 0] = (1 - wa) * (1 - wb)
        w[:, 1] = wa * (1 - wb)
        w[:, 2] = wa * wb
        w[:, 3] = (1 - wa) * wb

        # cross-tile-edge targets: finite-element weights on the dual mesh
        if (~interior).any():
            from ..mesh.generator import CubedSphereDualMeshGenerator
            from .finite_element import FiniteElement

            dual = CubedSphereDualMeshGenerator().generate(grid)
            fe = FiniteElement(dual, tgt[~interior])
            pad = np.zeros((fe.idx.shape[0], 1), dtype=fe.idx.dtype)
            idx[~interior] = np.concatenate([fe.idx, pad], axis=1)
            wpad = np.zeros((fe.w.shape[0], 1))
            w[~interior] = np.concatenate([fe.w, wpad], axis=1)
        self.idx = idx
        self.w = w
        self.interior = interior


@interpolation_factory.register("cubedsphere-bilinear")
def _csb(config, source, target):
    from .structured import _target_points

    return CubedSphereBilinear(source, _target_points(target))

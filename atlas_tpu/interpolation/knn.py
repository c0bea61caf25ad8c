"""K-nearest-neighbour interpolation family.

Reference: atlas interpolation/method/knn/*.cc:30-37 — nearest-neighbour,
k-nearest-neighbours (inverse-distance weights), grid-box-average (conservative
box overlap for lat-lon-box grids).
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz
from .interpolation import Method, interpolation_factory


def _source_points(source):
    if isinstance(source, np.ndarray):
        return source
    if hasattr(source, "lonlat"):
        return source.lonlat()
    raise TypeError(f"cannot extract source points from {type(source)}")


class KNearestNeighbours(Method):
    def __init__(self, source, target, k: int = 1, weighted: bool = True):
        from scipy.spatial import cKDTree

        src = _source_points(source)
        tgt = np.asarray(_source_points(target), dtype=np.float64).reshape(-1, 2)
        self.nsrc = len(src)
        tree = cKDTree(lonlat_to_xyz(src))
        d, idx = tree.query(lonlat_to_xyz(tgt), k=k)
        if k == 1:
            d = d[:, None]
            idx = idx[:, None]
        self.idx = idx.astype(np.int32)
        if weighted and k > 1:
            inv = 1.0 / np.maximum(d, 1e-12)
            self.w = inv / inv.sum(axis=1, keepdims=True)
        else:
            w = np.zeros_like(d)
            w[:, 0] = 1.0
            self.w = w


@interpolation_factory.register("nearest-neighbour")
def _nn(config, source, target):
    return KNearestNeighbours(source, target, k=1)


@interpolation_factory.register("k-nearest-neighbours")
def _knn(config, source, target):
    k = int(config.get("k_nearest_neighbours", config.get("k", 4)))
    return KNearestNeighbours(source, target, k=k)


class GridBoxAverage(Method):
    """Conservative average of source boxes overlapping each target box.

    Reference: method/knn/GridBox.h — boxes are lat-lon rectangles around
    structured-grid points; weights are fractional overlap areas (exact in
    (lon, sin lat) space, where boxes have area proportional to true area).
    """

    def __init__(self, source, target):
        from ..grid.structured import StructuredGrid

        if not isinstance(source, StructuredGrid) or not isinstance(
            target, StructuredGrid
        ):
            raise TypeError("grid-box-average requires structured grids")
        sb = _boxes(source)
        tb = _boxes(target)
        self.nsrc = source.size
        idx_list = []
        w_list = []
        # vectorized per target row: overlap rows of source by latitude bands
        src_lat_lo, src_lat_hi = sb["lat_lo_row"], sb["lat_hi_row"]
        max_k = 0
        entries = []
        for tj in range(target.ny):
            rows = np.flatnonzero(
                (src_lat_hi > tb["lat_lo_row"][tj]) & (src_lat_lo < tb["lat_hi_row"][tj])
            )
            band_h = {
                r: (
                    min(src_lat_hi[r], tb["lat_hi_row"][tj])
                    - max(src_lat_lo[r], tb["lat_lo_row"][tj])
                )
                for r in rows
            }
            ntx = int(target.nx[tj])
            t_lo = (np.arange(ntx) - 0.5) * 360.0 / ntx + target.xmin[tj]
            t_hi = t_lo + 360.0 / ntx
            for ti in range(ntx):
                tgt_idx = target.index(ti, tj)
                acc_i, acc_w = [], []
                for r in rows:
                    nsx = int(source.nx[r])
                    dxs = 360.0 / nsx
                    s_lo = (np.arange(nsx) - 0.5) * dxs + source.xmin[r]
                    # overlaps with [t_lo, t_hi] modulo 360
                    for shift in (-360.0, 0.0, 360.0):
                        lo = np.maximum(s_lo + shift, t_lo[ti])
                        hi = np.minimum(s_lo + shift + dxs, t_hi[ti])
                        ov = np.maximum(hi - lo, 0.0)
                        nz = np.flatnonzero(ov)
                        acc_i.append(source.row_offset[r] + nz)
                        acc_w.append(ov[nz] * band_h[r])
                ii = np.concatenate(acc_i)
                ww = np.concatenate(acc_w)
                ww = ww / ww.sum()
                entries.append((tgt_idx, ii, ww))
                max_k = max(max_k, len(ii))
        ntgt = target.size
        self.idx = np.zeros((ntgt, max_k), dtype=np.int32)
        self.w = np.zeros((ntgt, max_k))
        for tgt_idx, ii, ww in entries:
            self.idx[tgt_idx, : len(ii)] = ii
            self.w[tgt_idx, : len(ww)] = ww


def _boxes(grid):
    """Row latitude band edges in sin(lat) (equal-area) space."""
    y = grid.y
    edges = np.empty(grid.ny + 1)
    edges[0] = 90.0
    edges[1:-1] = 0.5 * (y[:-1] + y[1:])
    edges[-1] = -90.0
    s = np.sin(np.deg2rad(edges))
    return {"lat_hi_row": s[:-1], "lat_lo_row": s[1:]}


@interpolation_factory.register("grid-box-average")
def _gba(config, source, target):
    return GridBoxAverage(source, target)


class GridBoxMaximum(GridBoxAverage):
    """Maximum of source boxes overlapping each target box.

    Reference: method/knn/GridBoxMaximum.cc ("grid-box-maximum") — same box
    overlaps as grid-box-average, but the target value is the maximum source
    value over boxes with non-zero overlap (non-linear, no weights applied).
    """

    def execute(self, field):
        import jax.numpy as jnp

        field = jnp.asarray(field)
        vals = field[jnp.asarray(self.idx)]  # (ntgt, k, ...)
        w = jnp.asarray(self.w)
        mask = (w > 0).reshape(w.shape + (1,) * (field.ndim - 1))
        neg_inf = jnp.asarray(-jnp.inf, field.dtype)
        return jnp.where(mask, vals, neg_inf).max(axis=1)

    def execute_adjoint(self, field):
        raise NotImplementedError("grid-box-maximum is non-linear (reference raises too)")


@interpolation_factory.register("grid-box-maximum")
def _gbm(config, source, target):
    return GridBoxMaximum(source, target)

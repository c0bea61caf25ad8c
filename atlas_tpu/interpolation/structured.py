"""Structured interpolation: bilinear / bicubic / quasicubic, matrix-free.

Reference behavior: atlas interpolation/method/structured/* — for each target
point, ComputeHorizontalStencil finds the surrounding rows and per-row point
ranges (grid/StencilComputer.cc); kernel weights are cubic Lagrange in x along
each stencil row and cubic Lagrange in y across the (non-uniform) row
latitudes (kernels/CubicHorizontalKernel.h); bilinear uses the 2x2 analog.
Registrations: structured-bilinear / structured-bicubic /
structured-biquasicubic (Cubic2D.cc:23-26).

TPU design: the whole stencil search is vectorized host-side into static
(ntgt, k) index/weight arrays; execution is a jitted gather-dot (matrix-free,
the reference's matrix-free mode, StructuredInterpolation2D.tcc:239-247).
Periodicity is wrapped into the indices; pole rows clamp the stencil like the
reference's halo rows.
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from .interpolation import Method, interpolation_factory


def _lagrange_weights(xs: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Lagrange basis weights: xs (npts, k) nodes, x (npts,) -> (npts, k)."""
    npts, k = xs.shape
    w = np.ones((npts, k))
    for i in range(k):
        for j in range(k):
            if i == j:
                continue
            denom = xs[:, i] - xs[:, j]
            w[:, i] *= (x - xs[:, j]) / denom
    return w


class StructuredInterpolation2D(Method):
    def __init__(self, src_grid, tgt_lonlat: np.ndarray, kind: str = "cubic"):
        from ..grid.structured import StructuredGrid

        if not isinstance(src_grid, StructuredGrid):
            raise TypeError("source must be a structured grid")
        self.src_grid = src_grid
        self.kind = kind
        k = {"linear": 2, "cubic": 4, "quasicubic": 4}[kind]
        tgt = np.asarray(tgt_lonlat, dtype=np.float64).reshape(-1, 2)
        self.nsrc = src_grid.size
        self._build(src_grid, tgt, k)

    def _build(self, grid, tgt, k):
        ntgt = len(tgt)
        if grid.periodic_x:
            lon = tgt[:, 0] % 360.0
            lat = tgt[:, 1]
        else:
            # regional grids: work in the grid's projected (x, y) space
            # (reference method/structured/RegionalLinear2D.cc)
            xy = grid.projection.lonlat2xy(tgt)
            lon = xy[:, 0]
            lat = xy[:, 1]
        ny = grid.ny
        y = grid.y  # descending north -> south

        # --- rows of the stencil: k rows with y[j1] >= lat > y[j1+1] --------
        # searchsorted on descending array via negation
        jsouth = np.searchsorted(-y, -lat, side="right")  # first row south of lat
        j0 = np.clip(jsouth - k // 2, 0, ny - k)
        rows = j0[:, None] + np.arange(k)[None, :]  # (ntgt, k)

        # --- per-row x stencils --------------------------------------------
        nxr = grid.nx[rows]  # (ntgt, k)
        dxr = grid.dx[rows]
        xminr = grid.xmin[rows]
        fi = (lon[:, None] - xminr) / dxr  # fractional index per row
        i0 = np.floor(fi).astype(np.int64) - (k // 2 - 1)
        if not grid.periodic_x:
            # regional grids: shift the whole stencil window inside the row so
            # the Lagrange weights stay consistent (one-sided near edges)
            i0 = np.clip(i0, 0, np.maximum(nxr - k, 0))
        cols = i0[:, None, :].transpose(0, 2, 1) + np.arange(k)[None, None, :]
        # (ntgt, k rows, k cols); periodic wrap (no-op for regional: in range)
        cols_wrapped = np.mod(cols, nxr[:, :, None])
        idx = grid.row_offset[rows][:, :, None] + cols_wrapped  # (ntgt, k, k)

        # x Lagrange weights per row (uniform spacing: use index space)
        wx = _lagrange_weights(
            cols.reshape(-1, k).astype(np.float64),
            fi.reshape(-1),
        ).reshape(ntgt, k, k)

        # y Lagrange weights across the k row latitudes
        wy = _lagrange_weights(y[rows], lat)  # (ntgt, k)

        if self.kind == "quasicubic" and k == 4:
            # reference QuasiCubicHorizontalKernel (method/structured/kernels/
            # QuasiCubicHorizontalKernel.h): 12-point stencil — cubic along the
            # two interior rows, LINEAR along the outer rows.
            for r in (0, 3):
                fi_r = fi[:, r]
                i_lin = np.floor(fi_r).astype(np.int64)
                a = fi_r - i_lin
                lin = np.zeros_like(wx[:, r, :])
                pos0 = i_lin - i0[:, r]  # slot of the west linear point
                valid = (pos0 >= 0) & (pos0 + 1 < k)
                pos0 = np.clip(pos0, 0, k - 2)
                rows_t = np.arange(ntgt)
                lin[rows_t, pos0] = 1.0 - a
                lin[rows_t, pos0 + 1] = a
                wx[:, r, :] = np.where(valid[:, None], lin, wx[:, r, :])

        w = wy[:, :, None] * wx  # (ntgt, k, k)
        self.idx = idx.reshape(ntgt, k * k).astype(np.int32)
        self.w = w.reshape(ntgt, k * k)
        self.rows = rows


@interpolation_factory.register("structured-bilinear")
def _bilinear(config, source, target):
    return StructuredInterpolation2D(source, _target_points(target), kind="linear")


@interpolation_factory.register("structured-bicubic")
def _bicubic(config, source, target):
    return StructuredInterpolation2D(source, _target_points(target), kind="cubic")


@interpolation_factory.register("structured-biquasicubic")
def _biquasicubic(config, source, target):
    return StructuredInterpolation2D(source, _target_points(target), kind="quasicubic")


def _target_points(target):
    if isinstance(target, np.ndarray):
        return target
    if hasattr(target, "lonlat"):
        return target.lonlat()
    raise TypeError(f"cannot extract target points from {type(target)}")


@interpolation_factory.register("regional-linear-2d")
def _regional_linear(config, source, target):
    """Bilinear on a regional (projected, non-periodic) grid
    (reference method/structured/RegionalLinear2D.cc)."""
    return StructuredInterpolation2D(source, _target_points(target), kind="linear")

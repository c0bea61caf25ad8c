"""Stencil computers: map continuous coordinates to surrounding grid stencils.

Reference behavior: atlas grid/StencilComputer.h:27-50 (ComputeLower vertical
level lookup, ComputeNorth, ComputeWest, ComputeHorizontalStencil,
ComputeVerticalStencil) and grid/Stencil.h:22-58 — used by structured
interpolation and semi-Lagrangian departure-point evaluation.

Two forms here:
 - numpy host functions for setup-time stencil assembly;
 - `StencilTables` + jitted `interp_structured` for in-kernel evaluation at
   runtime-dependent points (semi-Lagrangian), all shape-static jax.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def compute_north(y: np.ndarray, lat):
    """Index of the first row with y[j] <= lat... reference ComputeNorth:
    returns the row index north of (or at) the latitude."""
    return np.clip(np.searchsorted(-y, -np.asarray(lat), side="right") - 1, 0, len(y) - 1)


def compute_west(xmin, dx, lon):
    """Fractional x index of lon on a row (reference ComputeWest)."""
    return (np.asarray(lon) - xmin) / dx


def compute_lower(z: np.ndarray, zcoord):
    """Vertical level k with z[k] <= zcoord < z[k+1] (reference ComputeLower)."""
    return np.clip(np.searchsorted(z, np.asarray(zcoord), side="right") - 1, 0, len(z) - 2)


class StencilTables:
    """Static per-grid arrays for jitted stencil evaluation."""

    def __init__(self, grid, halo_width: int = 2):
        self.grid = grid
        self.y = jnp.asarray(grid.y)
        self.xmin = jnp.asarray(grid.xmin)
        self.dx = jnp.asarray(grid.dx)
        self.nx = jnp.asarray(grid.nx)
        self.row_offset = jnp.asarray(grid.row_offset[:-1])
        self.ny = grid.ny


def _lagrange4(xs, x):
    """4-point Lagrange weights, vectorized: xs (..., 4), x (...)."""
    w = []
    for i in range(4):
        num = jnp.ones_like(x)
        for j in range(4):
            if i == j:
                continue
            num = num * (x - xs[..., j]) / (xs[..., i] - xs[..., j])
        w.append(num)
    return jnp.stack(w, axis=-1)


@jax.jit
def interp_structured_cubic(tables: dict, f, lon, lat):
    """Bicubic evaluation of grid-ordered field f at arbitrary (lon, lat).

    tables: dict of the StencilTables arrays (passed as pytree). f: (npts,)
    or (npts, nlev); lon/lat: (n,). Fully static shapes; the 4x4 stencil
    gather is the only indirect access.
    """
    y = tables["y"]
    ny = y.shape[0]
    lon = jnp.asarray(lon) % 360.0
    lat = jnp.asarray(lat)

    jsouth = jnp.searchsorted(-y, -lat, side="right")
    j0 = jnp.clip(jsouth - 2, 0, ny - 4)
    rows = j0[:, None] + jnp.arange(4)[None, :]  # (n, 4)

    nxr = tables["nx"][rows]
    fi = (lon[:, None] - tables["xmin"][rows]) / tables["dx"][rows]
    i0 = jnp.floor(fi).astype(jnp.int32) - 1
    cols = i0[:, :, None] + jnp.arange(4)[None, None, :]
    cols_w = jnp.mod(cols, nxr[:, :, None])
    idx = tables["row_offset"][rows][:, :, None] + cols_w  # (n, 4, 4)

    wx = _lagrange4(cols.astype(f.dtype), fi.astype(f.dtype))  # (n, 4, 4)
    wy = _lagrange4(y[rows].astype(f.dtype), lat.astype(f.dtype))  # (n, 4)
    w = wy[:, :, None] * wx

    vals = f[idx.reshape(idx.shape[0], -1)]  # (n, 16, ...)
    wflat = w.reshape(w.shape[0], -1)
    wshape = wflat.shape + (1,) * (f.ndim - 1)
    return (vals * wflat.reshape(wshape)).sum(axis=1)


def stencil_tables(grid) -> dict:
    return {
        "y": jnp.asarray(grid.y),
        "xmin": jnp.asarray(grid.xmin),
        "dx": jnp.asarray(grid.dx),
        "nx": jnp.asarray(grid.nx.astype(np.int32)),
        "row_offset": jnp.asarray(grid.row_offset[:-1].astype(np.int32)),
    }

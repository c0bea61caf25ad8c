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


# ------------------------------------------------------------- padded variant
# TPU gather cost is per-INDEX (~5-10 ns), nearly independent of the fetched
# row size, and many tiny dynamic slices lower to a sequential loop (~us
# each). So the fast evaluation (a) pads fields into a periodic (ny, nxw)
# layout, (b) pre-shifts it into 4-TAP ROWS so each stencil row is ONE
# gathered 16-byte row instead of 4 scalars, (c) packs the per-row grid
# properties into one gatherable table, and (d) uses an all-compare
# searchsorted for the (small) latitude array.

_L, _R = 1, 2


def padded_tables(grid) -> dict:
    """stencil_tables + the padded-layout build product."""
    t = stencil_tables(grid)
    nxw = grid.nxmax + _L + _R
    ny = grid.ny
    # wrap fix-up positions (flat into (ny, nxw)) and their source points
    pos, src = [], []
    for c in range(_L):  # west halo columns [0, L)
        pos.append(np.arange(ny) * nxw + c)
        src.append(grid.row_offset[:-1] + np.mod(c - _L, grid.nx))
    for r in range(_R):  # east halo columns [L + nx_j, L + nx_j + R)
        pos.append(np.arange(ny) * nxw + _L + grid.nx + r)
        src.append(grid.row_offset[:-1] + np.mod(r, grid.nx))
    props_np = np.stack([grid.y, grid.xmin, grid.dx,
                         grid.nx.astype(np.float64)], axis=-1)
    # 4-row packed properties: ONE 16-value row gather per point instead of
    # four (TPU gathers cost per-index, ~50 ns each)
    props4_np = np.stack([props_np[np.clip(np.arange(ny) + r, 0, ny - 1)]
                          for r in range(4)], axis=1)  # (ny, 4, 4)
    props2_np = props4_np[:, :2]
    t.update(
        halo_pos=jnp.asarray(np.concatenate(pos).astype(np.int32)),
        halo_src=jnp.asarray(np.concatenate(src).astype(np.int32)),
        # per-row properties packed for ONE row-gather per stencil row
        props=jnp.asarray(props_np),
        props4=jnp.asarray(props4_np.reshape(ny, 16)),
        props2=jnp.asarray(props2_np.reshape(ny, 8)),
        flat_base=jnp.asarray(
            (np.arange(ny) * nxw + _L).astype(np.int32)),
    )
    t["nxw"] = nxw  # static python int (popped before jit pytrees)
    return t


@partial(jax.jit, static_argnums=(2,))
def pad_field(f, row_offset, nxw, halo_pos, halo_src):
    """Grid-ordered f (npts[, nch]) -> periodic padded (ny*nxw[, nch])."""
    squeeze = f.ndim == 1
    f2 = f[:, None] if squeeze else f
    nch = f2.shape[-1]
    fflat = jnp.pad(f2, ((_L, nxw), (0, 0)))
    zero = jnp.zeros((), row_offset.dtype)
    body = jax.vmap(
        lambda off: jax.lax.dynamic_slice(fflat, (off, zero), (nxw, nch))
    )(row_offset)  # (ny, nxw, nch); body[j, c] = f[off_j + c - L]
    flat = body.reshape(-1, nch)
    flat = flat.at[halo_pos].set(f2[halo_src], unique_indices=True)
    return flat[:, 0] if squeeze else flat


@jax.jit
def make_taps(fpad):
    """pad_field layout -> 4-tap rows: taps[p] = fpad[p : p+4] flattened with
    channels, so one gathered row fetches a whole stencil row's taps."""
    f2 = fpad[:, None] if fpad.ndim == 1 else fpad
    P = f2.shape[0]
    t = jnp.stack([jnp.roll(f2, -c, axis=0) for c in range(4)], axis=1)
    return t.reshape(P, -1)  # (P, 4*nch)


@jax.jit
def interp_cubic_padded(tables: dict, taps, lon, lat):
    """Bicubic at arbitrary points from a make_taps(pad_field(f)) layout.

    taps: (ny*nxw, 4*nch). Returns (n,) for nch == 1 else (n, nch).
    """
    y = tables["y"]
    base = tables["flat_base"]  # (ny,): j*nxw + L
    ny = y.shape[0]
    lon = jnp.asarray(lon) % 360.0
    lat = jnp.asarray(lat)
    n = lon.shape[0]

    # all-compare search beats the binary-scan lowering for small ny
    if ny <= 768:
        jsouth = (y[None, :] >= lat[:, None]).sum(axis=1)
    else:
        jsouth = jnp.searchsorted(-y, -lat, side="right")
    j0 = jnp.clip(jsouth - 2, 0, ny - 4)
    rows = j0[:, None] + jnp.arange(4)[None, :]  # (n, 4)
    pr = tables["props4"][j0].reshape(n, 4, 4)  # ONE gather for all 4 rows
    yr, xminr, dxr = pr[..., 0], pr[..., 1], pr[..., 2]
    fi = (lon[:, None] - xminr) / dxr
    i0 = jnp.floor(fi).astype(jnp.int32) - 1
    cols = i0[:, :, None] + jnp.arange(4)[None, None, :]

    dt = taps.dtype
    wx = _lagrange4(cols.astype(dt), fi.astype(dt))
    wy = _lagrange4(yr.astype(dt), lat.astype(dt))
    w = wy[:, :, None] * wx  # (n, 4, 4)

    starts = base[rows] + i0  # (n, 4) tap-row index
    vals = taps[starts]  # (n, 4, 4*nch)
    nch = taps.shape[-1] // 4
    vals = vals.reshape(n, 4, 4, nch)
    out = (vals * w[..., None]).sum(axis=(1, 2))
    return out[:, 0] if nch == 1 else out


@jax.jit
def make_taps2(fpad):
    """pad_field layout -> 2-tap rows (linear stencils): one gathered row
    fetches both lanes of a stencil row."""
    f2 = fpad[:, None] if fpad.ndim == 1 else fpad
    P = f2.shape[0]
    t = jnp.stack([f2, jnp.roll(f2, -1, axis=0)], axis=1)
    return t.reshape(P, -1)  # (P, 2*nch)


@jax.jit
def interp_linear_padded(tables: dict, taps2, lon, lat):
    """Bilinear at arbitrary points (2x2 stencil) — the trajectory-iteration
    interpolant (cubic accuracy is only needed for the advected field, not
    the departure search; ECMWF's semi-Lagrangian does the same).

    taps2: (ny*nxw, 2*nch) from make_taps2. Returns (n[, nch])."""
    y = tables["y"]
    base = tables["flat_base"]
    ny = y.shape[0]
    lon = jnp.asarray(lon) % 360.0
    lat = jnp.asarray(lat)
    n = lon.shape[0]
    if ny <= 768:
        jsouth = (y[None, :] >= lat[:, None]).sum(axis=1)
    else:
        jsouth = jnp.searchsorted(-y, -lat, side="right")
    j0 = jnp.clip(jsouth - 1, 0, ny - 2)
    rows = j0[:, None] + jnp.arange(2)[None, :]  # (n, 2)
    pr = tables["props2"][j0].reshape(n, 2, 4)
    yr, xminr, dxr = pr[..., 0], pr[..., 1], pr[..., 2]
    fi = (lon[:, None] - xminr) / dxr
    i0 = jnp.floor(fi).astype(jnp.int32)

    dt = taps2.dtype
    tx = (fi - i0.astype(dt)).astype(dt)  # (n, 2)
    ty = ((lat - yr[:, 0]) / (yr[:, 1] - yr[:, 0])).astype(dt)
    wy = jnp.stack([1.0 - ty, ty], axis=-1)  # (n, 2)
    wx = jnp.stack([1.0 - tx, tx], axis=-1)  # (n, 2, 2)
    w = wy[:, :, None] * wx

    starts = base[rows] + i0  # (n, 2)
    vals = taps2[starts]  # (n, 2, 2*nch)
    nch = taps2.shape[-1] // 2
    vals = vals.reshape(n, 2, 2, nch)
    out = (vals * w[..., None]).sum(axis=(1, 2))
    return out[:, 0] if nch == 1 else out

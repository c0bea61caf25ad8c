"""Gather-free semi-Lagrangian evaluation: shift algebra on the padded plane.

The general departure-point path (semi_lagrangian.py + grid/stencil.py)
gathers 4 tap-rows + 1 property row per point per evaluation; TPU gathers
cost ~5-10 ns per index, so the O64 advection step (5 cubic evaluations)
spends ~3.4 ms in gathers. But departure points are CFL-BOUNDED: the
departure cell sits within a few rows/columns of the arrival cell, and on a
reduced grid the stencil-row column index drifts at most ~4 columns per row
step (adjacent octahedral rows differ by 4 points). So the whole bicubic
evaluation becomes STATIC SHIFTS of the padded (ny, nxwf) field plane times
runtime weight planes:

    out = sum_{dj, di} shift(fpad, dj, di) * W[dj, di]
    W[dj, di][j, c] = wy_{dj - beta}  *  sum_k wx_k * [i0rel == di - k]

with beta = j0 - j (relative stencil start row) and i0rel the relative
column start in row j + dj — all (ny, nxwf) planes computed with vectorized
arithmetic, no gathers anywhere. Weight planes are shared across field
channels. Contract: |lat displacement| <= dj_max rows and the column drift
must fit di_max (checked at setup from the grid geometry + max_cfl;
violating points report in the `coverage` diagnostic as weight-sum != 1).

Reference context: the stencil computers driving semi-Lagrangian advection
(grid/StencilComputer.h:27-50); the reordering-for-locality rationale of
mesh/actions/ReorderHilbert.cc becomes unnecessary when there is no gather.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..grid.stencil import _lagrange4
from ..util.constants import DEG2RAD, EARTH_RADIUS


class SemiLagrangianFast:
    """Shift-algebra semi-Lagrangian advection on a structured grid.

    max_cfl: maximum departure displacement in CELLS (both directions) the
    static shift ranges are sized for.
    """

    def __init__(self, grid, radius: float = EARTH_RADIUS,
                 iterations: int = 2, max_cfl: float = 2.0):
        self.grid = grid
        self.radius = float(radius)
        self.iterations = int(iterations)
        ny = grid.ny
        nx = grid.nx.astype(np.int64)
        cfl = int(np.ceil(max_cfl))
        # row-offset range: stencil rows j0..j0+3 with j0 = jsouth-2 and
        # jsouth within cfl rows of the arrival row
        self.dj_min = -(cfl + 2)
        self.dj_max = cfl + 3
        # column drift: |i_r - i_arrival| <= max row-length change over the
        # dj range at the same longitude, plus cfl and the stencil width
        dn = np.abs(np.diff(nx)).max() if ny > 1 else 0
        drift = int(dn) * max(abs(self.dj_min), abs(self.dj_max))
        self.di_min = -(drift + cfl + 2)
        self.di_max = drift + cfl + 3
        H = max(-self.di_min, self.di_max) + 1
        self.H = H
        self.nxwf = int(nx.max()) + 2 * H

        # padded-plane geometry
        mask = np.zeros((ny, self.nxwf))
        col = np.zeros(grid.size, np.int64)
        row = np.zeros(grid.size, np.int64)
        off = grid.row_offset
        for j in range(ny):
            n = int(nx[j])
            col[off[j]:off[j] + n] = H + np.arange(n)
            row[off[j]:off[j] + n] = j
            mask[j, H:H + n] = 1.0
        self.row_of_point, self.col_of_point = row, col
        # periodic halo fill: for every row, columns [0, H) and [H+nx, nxwf)
        pos, srcj, srcc = [], [], []
        for j in range(ny):
            n = int(nx[j])
            cs = np.concatenate([np.arange(H), H + n + np.arange(H)])
            pos.append(j * self.nxwf + cs)
            srcj.append(np.full(2 * H, j))
            srcc.append(H + np.mod(cs - H, n))
        self._halo_pos = jnp.asarray(np.concatenate(pos).astype(np.int32))
        self._halo_src = jnp.asarray(
            (np.concatenate(srcj) * self.nxwf
             + np.concatenate(srcc)).astype(np.int32))

        ll = grid.lonlat()
        lon_p = np.zeros((ny, self.nxwf))
        lat_p = np.zeros((ny, self.nxwf))
        lon_p[row, col] = ll[:, 0]
        lat_p[row, col] = ll[:, 1]
        self._tabs = {
            "y": jnp.asarray(grid.y),
            "nx": jnp.asarray(nx.astype(np.int32)),
            "xmin": jnp.asarray(grid.xmin),
            "inv_dx": jnp.asarray(1.0 / grid.dx),
            "mask": jnp.asarray(mask),
            "lon": jnp.asarray(lon_p),
            "lat": jnp.asarray(lat_p),
            "halo_pos": self._halo_pos,
            "halo_src": self._halo_src,
            "colidx": jnp.asarray(
                np.broadcast_to(np.arange(self.nxwf) - H,
                                (ny, self.nxwf)).astype(np.float64)),
        }
        self._static = (ny, self.nxwf, self.dj_min, self.dj_max,
                        self.di_min, self.di_max, self.iterations)

    # ----------------------------------------------------------------- i/o
    def to_plane(self, f):
        """(npts[, nch]) grid order -> (ny, nxwf[, nch]) padded plane."""
        f = jnp.asarray(f)
        squeeze = f.ndim == 1
        f2 = f[:, None] if squeeze else f
        out = jnp.zeros((self._static[0], self.nxwf, f2.shape[-1]), f2.dtype)
        out = out.at[jnp.asarray(self.row_of_point),
                     jnp.asarray(self.col_of_point)].set(f2)
        return out[..., 0] if squeeze else out

    def from_plane(self, fp):
        fp = jnp.asarray(fp)
        return fp[self.row_of_point, self.col_of_point]

    # ---------------------------------------------------------------- step
    def step(self, q, u, v, dt):
        """Grid-ordered q advected by (u, v) [m/s] over dt [s]."""
        qp = self.to_plane(q)
        uvp = self.to_plane(jnp.stack([jnp.asarray(u), jnp.asarray(v)], -1))
        out = _semilag_fast_step(self._tabs, qp, uvp,
                                 jnp.asarray(dt, qp.dtype),
                                 jnp.asarray(self.radius, qp.dtype),
                                 *self._static)
        return self.from_plane(out)

    def step_plane(self, qp, uvp, dt):
        """Plane-resident variant (qp (ny, nxwf[, nch]), uvp (ny, nxwf, 2));
        chain steps without leaving the padded layout."""
        return _semilag_fast_step(self._tabs, qp, uvp,
                                  jnp.asarray(dt, uvp.dtype),
                                  jnp.asarray(self.radius, uvp.dtype),
                                  *self._static)


def _fill_halo(t, fp):
    ny, nxwf = fp.shape[:2]
    flat = fp.reshape(ny * nxwf, -1)
    flat = flat.at[t["halo_pos"]].set(flat[t["halo_src"]],
                                      unique_indices=True)
    return flat.reshape(fp.shape)


def _shift2(a, dj, di):
    """out[j, c] = a[j + dj, c + di], zero-filled (rows); a (ny, nxwf, nch)."""
    ny, nxwf = a.shape[:2]
    if dj:
        pads = [(max(0, -dj), max(0, dj))] + [(0, 0)] * (a.ndim - 1)
        a = jnp.pad(a, pads)
        a = jax.lax.slice_in_dim(a, max(dj, 0), max(dj, 0) + ny, axis=0)
    if di:
        pads = [(0, 0), (max(0, -di), max(0, di))] + [(0, 0)] * (a.ndim - 2)
        a = jnp.pad(a, pads)
        a = jax.lax.slice_in_dim(a, max(di, 0), max(di, 0) + nxwf, axis=1)
    return a


def _eval_planes(t, fp, lon_d, lat_d, ny, nxwf, dj_min, dj_max, di_min,
                 di_max):
    """Bicubic at (lon_d, lat_d) per plane slot via static shifts only."""
    dt = fp.dtype
    y = t["y"].astype(dt)
    lat_d = lat_d.astype(dt)
    lon_d = lon_d % 360.0
    # jsouth: first row with y <= lat (all-compare; ny is small)
    jsouth = (y[:, None, None] >= lat_d[None]).astype(jnp.int32).sum(axis=0)
    j0 = jnp.clip(jsouth - 2, 0, ny - 4)
    jj = jnp.arange(ny, dtype=jnp.int32)[:, None]
    beta = j0 - jj  # (ny, nxwf) relative stencil start row

    # stencil-row latitudes via dj-selects (no gathers): yr[r] = y[j0 + r]
    yr = []
    for r in range(4):
        acc = jnp.zeros_like(lat_d)
        for dj in range(dj_min, dj_max + 1):
            sel = (beta + r) == dj
            yv = jnp.roll(y, -dj)  # y[j + dj] per row
            acc = jnp.where(sel, yv[:, None], acc)
        yr.append(acc)
    yr = jnp.stack(yr, axis=-1)  # (ny, nxwf, 4)
    wy4 = _lagrange4(yr, lat_d)  # (ny, nxwf, 4)

    colf = t["colidx"].astype(dt)  # arrival column index (i units)
    out = jnp.zeros(fp.shape, dt) if fp.ndim == 2 else jnp.zeros_like(fp)
    for dj in range(dj_min, dj_max + 1):
        r_here = dj - beta  # which stencil row this dj realizes (0..3)
        act_r = (r_here >= 0) & (r_here < 4)
        if True:
            # x geometry of row j + dj
            xmin_d = jnp.roll(t["xmin"], -dj).astype(dt)[:, None]
            invdx_d = jnp.roll(t["inv_dx"], -dj).astype(dt)[:, None]
            fi = (lon_d - xmin_d) * invdx_d
            i0 = jnp.floor(fi).astype(jnp.int32) - 1
            tx = fi - i0.astype(dt)  # in [1, 2)
            # uniform-spacing cubic Lagrange basis at offsets 0..3
            offs = jnp.arange(4, dtype=dt)
            wx4 = _lagrange4(jnp.broadcast_to(offs, fi.shape + (4,)), tx)
            # wy for this dj: select the realized stencil row's weight
            wyd = jnp.where(
                act_r,
                jnp.take_along_axis(
                    wy4, jnp.clip(r_here, 0, 3)[..., None], axis=-1)[..., 0],
                jnp.zeros_like(lat_d))
            irel = i0 - colf.astype(jnp.int32)  # column start rel. arrival
            # wrap across the lon = 0/360 seam: the physical displacement is
            # CFL-small, but i0 and the arrival column can sit on opposite
            # ends of the row — reduce modulo the STENCIL row's length
            nxd = jnp.roll(t["nx"], -dj).astype(jnp.int32)[:, None]
            irel = jnp.mod(irel + nxd // 2, nxd) - nxd // 2
            fdj = _shift2(fp, dj, 0)
            for di in range(di_min, di_max + 1):
                # sum_k wx_k [irel == di - k]
                wsel = jnp.zeros_like(lat_d)
                for k in range(4):
                    wsel = jnp.where(irel == di - k, wx4[..., k], wsel)
                w = (wyd * wsel)
                if fp.ndim == 3:
                    w = w[..., None]
                out = out + _shift2(fdj, 0, di) * w
    return out


@partial(jax.jit, static_argnames=("ny", "nxwf", "dj_min", "dj_max",
                                   "di_min", "di_max", "iterations"))
def _semilag_fast_step(t, qp, uvp, dt, radius, ny, nxwf, dj_min, dj_max,
                       di_min, di_max, iterations):
    d2r = jnp.asarray(DEG2RAD, uvp.dtype)
    uvp = _fill_halo(t, uvp)
    qp = _fill_halo(t, qp)
    lon = t["lon"].astype(uvp.dtype)
    lat = t["lat"].astype(uvp.dtype)
    lon_d, lat_d = lon, lat
    for _ in range(iterations):
        lon_m = 0.5 * (lon + lon_d)
        lat_m = 0.5 * (lat + lat_d)
        uv_m = _eval_planes(t, uvp, lon_m, lat_m, ny, nxwf, dj_min, dj_max,
                            di_min, di_max)
        u_m, v_m = uv_m[..., 0], uv_m[..., 1]
        coslat = jnp.cos(lat_m * d2r)
        lon_d = lon - u_m * dt / (radius * jnp.maximum(coslat, 1e-6)) / d2r
        lat_d = lat - v_m * dt / radius / d2r
        lat_d = jnp.clip(lat_d, -89.99, 89.99)
    out = _eval_planes(t, qp, lon_d % 360.0, lat_d, ny, nxwf, dj_min, dj_max,
                       di_min, di_max)
    return out * (t["mask"].astype(out.dtype)[..., None]
                  if out.ndim == 3 else t["mask"].astype(out.dtype))

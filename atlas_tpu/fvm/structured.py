"""Shift-structured fvm operators: the TPU-native fast path.

The mesh-based Nabla (nabla.py) is general but gather-bound: on TPU, the edge
gather + segment-sum reach ~1% of HBM roofline. On a *structured* grid the
median-dual stencil has bounded, nearly-regular geometry: a node's neighbours
in the adjacent rows sit at lane offsets within a small static range (adjacent
reduced-Gaussian rows differ by a fixed few points, e.g. 4 for octahedral), and
pole edges are a constant antipodal offset on the tiny polar rows.

Layout: fields as (nlev, ny, nxw) with nxw = left halo + nxmax + right halo;
lane dimension = x. Every incident-edge contribution becomes a static lane/row
SHIFT with a precomputed masked weight array:

    grad = metric * [ 0.5 * f * S_total + 0.5 * sum_k S_k * shift_k(f) ]

with S_k (ny, nxw, 2) accumulated at setup from the exact mesh edges — no
gathers, no scatters, pure VPU + contiguous HBM streams. Periodic x wrap is a
tiny precomputed halo-column copy. Results match the mesh-based operators to
reassociation roundoff because the same per-edge terms are summed.

Derivation anchored to the reference edge/node loops (numerics/fvm/Nabla.cc:
96-188 gradient, :322-438 divergence, :440-558 curl).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..util.constants import DEG2RAD
from ..util.topology import Topology
from .method import FvmMethod


@dataclass
class _Shifts:
    """Setup product for one grid (host numpy; cast to jax on first use)."""

    ny: int
    nxw: int
    L: int  # left halo width
    nlev_axis: int
    # key -> (dj, dc): S arrays (ny, nxw, 2) summed over edges with sign
    keys_regular: Dict[Tuple[int, int], np.ndarray]
    keys_pole: Dict[Tuple[int, int], np.ndarray]
    S_total_regular: np.ndarray  # (ny, nxw, 2) sum of regular S (self term)
    S_total_pole: np.ndarray
    # per-endpoint cos factors for div/curl are node-local: handled via fields
    metric_x: np.ndarray  # (ny, nxw)
    metric_y: np.ndarray
    cos_lat: np.ndarray
    inv_cos: np.ndarray
    mask: np.ndarray  # (ny, nxw) 1.0 on real grid points
    halo_rows: np.ndarray  # halo-fill copy indices
    halo_dst: np.ndarray
    halo_src: np.ndarray
    col_of_point: np.ndarray  # (grid.size,) column of each grid point
    row_of_point: np.ndarray


class StructuredFvm:
    def __init__(self, grid, method: FvmMethod | None = None, use_cache: bool = False):
        self.grid = grid
        self._dev = {}
        if use_cache and method is None:
            from ..io.cache import cache_path, load_shifts

            path = cache_path("fvm-shifts", f"{grid.name}-{grid.uid()[:12]}")
            cached = load_shifts(path)
            if cached is not None:
                self.method = None
                from ..util.constants import EARTH_RADIUS

                self.radius = EARTH_RADIUS
                self.shifts = cached
                return
        if method is None:
            method = FvmMethod(grid, use_cache=False)
        if method.mesh is None:
            raise ValueError("StructuredFvm needs an FvmMethod with a mesh")
        self.method = method
        self.radius = method.radius
        self.shifts = self._build()
        if use_cache:
            from ..io.cache import cache_path, save_shifts

            try:
                save_shifts(
                    self.shifts,
                    cache_path("fvm-shifts", f"{grid.name}-{grid.uid()[:12]}"),
                )
            except OSError:
                pass

    # ------------------------------------------------------------------ build
    def _build(self) -> _Shifts:
        grid = self.grid
        mesh = self.method.mesh
        g = self.method.geometry

        # --- node -> (row, unwrapped i) ------------------------------------
        n_nodes = mesh.nb_nodes
        gi = mesh.nodes.global_index
        i_of = np.empty(n_nodes, dtype=np.int64)
        j_of = np.empty(n_nodes, dtype=np.int64)
        ig, jg = grid.ij()
        j_of[:] = jg[gi]
        # unwrapped i from the node's actual x (ghost copies sit at x±360)
        x = mesh.nodes.xy[:, 0]
        i_of[:] = np.round((x - grid.xmin[j_of]) / grid.dx[j_of]).astype(np.int64)

        L = max(0, int(-i_of.min()))
        R = int((i_of - grid.nx[j_of]).max()) + 1
        R = max(R, 0)
        nxw = int(grid.nxmax) + L + R
        c_of = i_of + L
        ny = grid.ny

        # --- accumulate S per (dj, dc) key ---------------------------------
        en = g.edge_nodes
        other = en[g.inc_edge, 0].astype(np.int64) + en[g.inc_edge, 1] - g.inc_node
        recv = g.inc_node.astype(np.int64)
        keep = ~mesh.nodes.ghost[recv]  # only grid-point receivers
        recv = recv[keep]
        other = other[keep]
        sign = g.inc_sign[keep]
        S_edge = mesh.fields["dual_normals"][g.inc_edge[keep]]
        is_pole = g.pole_mask[g.inc_edge[keep]] > 0

        dj = j_of[other] - j_of[recv]
        dc = c_of[other] - c_of[recv]
        rj = j_of[recv]
        rc = c_of[recv]

        keys_regular: Dict[Tuple[int, int], np.ndarray] = {}
        keys_pole: Dict[Tuple[int, int], np.ndarray] = {}
        # positive-offset key encoding (avoids floor-division sign pitfalls)
        KC = 200001
        key_flat = (dj + 3) * KC + (dc + 100000)
        for pole_sel, out in ((~is_pole, keys_regular), (is_pole, keys_pole)):
            sel_all = np.flatnonzero(pole_sel)
            for k in np.unique(key_flat[sel_all]):
                sel = sel_all[key_flat[sel_all] == k]
                kdj = int(k // KC) - 3
                kdc = int(k % KC) - 100000
                S = np.zeros((ny, nxw, 2))
                np.add.at(S, (rj[sel], rc[sel]), sign[sel, None] * S_edge[sel])
                out[(kdj, kdc)] = S

        S_total_regular = np.zeros((ny, nxw, 2))
        for S in keys_regular.values():
            S_total_regular += S
        S_total_pole = np.zeros((ny, nxw, 2))
        for S in keys_pole.values():
            S_total_pole += S

        # --- node-local fields in (ny, nxw) layout -------------------------
        scale = DEG2RAD * DEG2RAD * self.radius
        lat_rad = mesh.nodes.lonlat[:, 1] * DEG2RAD
        grid_nodes = np.flatnonzero(~mesh.nodes.ghost)
        mask = np.zeros((ny, nxw))
        metric_x = np.ones((ny, nxw))
        metric_y = np.ones((ny, nxw))
        cos_lat = np.ones((ny, nxw))
        jj = j_of[grid_nodes]
        cc = c_of[grid_nodes]
        mask[jj, cc] = 1.0
        metric_y[jj, cc] = 1.0 / (g.vol[grid_nodes] * scale)
        metric_x[jj, cc] = metric_y[jj, cc] / np.cos(lat_rad[grid_nodes])
        cos_lat[jj, cc] = np.cos(lat_rad[grid_nodes])
        # halo columns need cos_lat too (div/curl read neighbour cos via shift)
        ghost_nodes = np.flatnonzero(mesh.nodes.ghost)
        cos_lat[j_of[ghost_nodes], c_of[ghost_nodes]] = np.cos(lat_rad[ghost_nodes])

        # --- periodic halo-column copies -----------------------------------
        halo_rows = j_of[ghost_nodes]
        halo_dst = c_of[ghost_nodes]
        owner = gi[ghost_nodes]
        halo_src = c_of[owner]  # owners are grid points: c = i + L

        return _Shifts(
            ny=ny,
            nxw=nxw,
            L=L,
            nlev_axis=0,
            keys_regular=keys_regular,
            keys_pole=keys_pole,
            S_total_regular=S_total_regular,
            S_total_pole=S_total_pole,
            metric_x=metric_x,
            metric_y=metric_y,
            cos_lat=cos_lat,
            inv_cos=1.0 / cos_lat,
            mask=mask,
            halo_rows=halo_rows.astype(np.int32),
            halo_dst=halo_dst.astype(np.int32),
            halo_src=halo_src.astype(np.int32),
            col_of_point=(ig + L).astype(np.int32),
            row_of_point=jg.astype(np.int32),
        )

    # ----------------------------------------------------------------- fields
    def to_layout(self, f_grid: np.ndarray) -> np.ndarray:
        """Grid-ordered (size, [nlev]) -> (nlev, ny, nxw) padded layout."""
        s = self.shifts
        if f_grid.ndim == 1:
            f_grid = f_grid[:, None]
        nlev = f_grid.shape[1]
        out = np.zeros((nlev, s.ny, s.nxw), f_grid.dtype)
        out[:, s.row_of_point, s.col_of_point] = f_grid.T
        return out

    def from_layout(self, f_pad: np.ndarray) -> np.ndarray:
        s = self.shifts
        f_pad = np.asarray(f_pad)
        return f_pad[..., s.row_of_point, s.col_of_point].reshape(
            f_pad.shape[:-2] + (self.grid.size,)
        )

    # ------------------------------------------------------------------ jax
    def _device_tables(self, dtype):
        key = jnp.dtype(dtype).name
        if key not in self._dev:
            s = self.shifts
            dev = {
                "regular": {
                    k: jnp.asarray(v, dtype) for k, v in s.keys_regular.items()
                },
                "pole": {k: jnp.asarray(v, dtype) for k, v in s.keys_pole.items()},
                "S_total_regular": jnp.asarray(s.S_total_regular, dtype),
                "S_total_pole": jnp.asarray(s.S_total_pole, dtype),
                "metric_x": jnp.asarray(s.metric_x, dtype),
                "metric_y": jnp.asarray(s.metric_y, dtype),
                "cos_lat": jnp.asarray(s.cos_lat, dtype),
                "inv_cos": jnp.asarray(s.inv_cos, dtype),
                "mask": jnp.asarray(s.mask, dtype),
                "halo_rows": jnp.asarray(s.halo_rows),
                "halo_dst": jnp.asarray(s.halo_dst),
                "halo_src": jnp.asarray(s.halo_src),
            }
            self._dev[key] = dev
        return self._dev[key]

    def fill_halo(self, f):
        """Fill periodic x-halo columns. f: (nlev, ny, nxw)."""
        f = jnp.asarray(f)
        t = self._device_tables(f.dtype)
        return f.at[:, t["halo_rows"], t["halo_dst"]].set(
            f[:, t["halo_rows"], t["halo_src"]]
        )

    def gradient(self, f):
        """f: (nlev, ny, nxw) -> (2, nlev, ny, nxw) [x, y components]."""
        t = self._device_tables(f.dtype)
        return _grad_struct(t, self.fill_halo(f))

    def divergence(self, u, v, metric_approach: int = 0):
        t = self._device_tables(u.dtype)
        return _divcurl_struct(
            t, self.fill_halo(u), self.fill_halo(v), False, metric_approach
        )

    def curl(self, u, v, metric_approach: int = 0):
        t = self._device_tables(u.dtype)
        return _divcurl_struct(
            t, self.fill_halo(u), self.fill_halo(v), True, metric_approach
        )


def _shift(f, dj, dc, jaxis=-2, caxis=-1):
    """f shifted so result[..., j, ..., c] = f[..., j+dj, ..., c+dc] (zero pad)."""
    jaxis = jaxis % f.ndim
    caxis = caxis % f.ndim
    ny = f.shape[jaxis]
    nxw = f.shape[caxis]
    pads = [(0, 0)] * f.ndim
    pads[jaxis] = (max(0, -dj), max(0, dj))
    pads[caxis] = (max(0, -dc), max(0, dc))
    fp = jnp.pad(f, pads)
    j_start = max(dj, 0)
    c_start = max(dc, 0)
    return jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(fp, j_start, j_start + ny, axis=jaxis),
        c_start,
        c_start + nxw,
        axis=caxis,
    )


def _tile_levels(f, li):
    """(nlev, ny, nxw) -> (lo, ny, li, nxw): li levels in the sublane dim so
    the (ny, nxw) weight tables are read once per li levels, not per level."""
    nlev, ny, nxw = f.shape
    lo = -(-nlev // li)
    f = jnp.pad(f, ((0, lo * li - nlev), (0, 0), (0, 0)))
    return jnp.transpose(f.reshape(lo, li, ny, nxw), (0, 2, 1, 3))


def _untile_levels(f, nlev):
    lo, ny, li, nxw = f.shape
    return jnp.transpose(f, (0, 2, 1, 3)).reshape(lo * li, ny, nxw)[:nlev]


LEVEL_TILE = 8  # f32 sublane count: weight tables amortized over 8 levels


@jax.jit
def _grad_struct(t, f):
    """f: (nlev, ny, nxw) -> (2, nlev, ny, nxw)."""
    nlev = f.shape[0]
    ft = _tile_levels(f, LEVEL_TILE)  # (lo, ny, li, nxw)
    half = jnp.asarray(0.5, f.dtype)
    d2r = jnp.asarray(DEG2RAD, f.dtype)
    b = lambda a: a[:, None, :]  # (ny, nxw) -> (ny, 1, nxw) sublane broadcast
    S_tot = t["S_total_regular"] + t["S_total_pole"]  # (ny, nxw, 2)
    acc_x = ft * b(S_tot[:, :, 0])
    acc_y = ft * b(S_tot[:, :, 1])
    for (dj, dc), S in list(t["regular"].items()) + list(t["pole"].items()):
        fs = _shift(ft, dj, dc, jaxis=1, caxis=3)
        acc_x = acc_x + fs * b(S[:, :, 0])
        acc_y = acc_y + fs * b(S[:, :, 1])
    gx = acc_x * b(half * d2r * t["metric_x"] * t["mask"])
    gy = acc_y * b(half * d2r * t["metric_y"] * t["mask"])
    return jnp.stack([_untile_levels(gx, nlev), _untile_levels(gy, nlev)])


@partial(jax.jit, static_argnums=(3, 4))
def _divcurl_struct(t, u, v, is_curl, metric_approach):
    nlev = u.shape[0]
    half = jnp.asarray(0.5, u.dtype)
    d2r = jnp.asarray(DEG2RAD, u.dtype)
    bc = lambda x: x[:, None, :]
    cl = bc(t["cos_lat"])
    ut = _tile_levels(u, LEVEL_TILE)
    vt = _tile_levels(v, LEVEL_TILE)
    if is_curl:
        a = ut * cl  # multiplied by cos at each endpoint (metric_approach 0)
        b = vt
    else:
        a = ut
        b = vt * cl
    # pole edges carry pbc=0 for div/curl: only regular keys contribute
    Sx_tot = bc(t["S_total_regular"][:, :, 0])
    Sy_tot = bc(t["S_total_regular"][:, :, 1])
    if is_curl:
        acc = b * Sx_tot - a * Sy_tot
    else:
        acc = a * Sx_tot + b * Sy_tot
    for (dj, dc), S in t["regular"].items():
        ashift = _shift(a, dj, dc, jaxis=1, caxis=3)
        bshift = _shift(b, dj, dc, jaxis=1, caxis=3)
        if is_curl:
            acc = acc + bshift * bc(S[:, :, 0]) - ashift * bc(S[:, :, 1])
        else:
            acc = acc + ashift * bc(S[:, :, 0]) + bshift * bc(S[:, :, 1])
    metric = bc(t["metric_y"] * t["inv_cos"] * t["mask"])
    return _untile_levels(acc * (half * d2r * metric), nlev)

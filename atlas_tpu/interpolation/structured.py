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

Fast path (structured -> uniform-row structured, e.g. O320 -> L1440x721): the
tensor-product stencil is SEPARABLE — every target row reads the same k source
rows at per-row affine column offsets (the row-coherence the reference's
matrix-free kernel exploits, StructuredInterpolation2D.tcc:239-378). Execution
factors into two passes: (1) resample each SOURCE row once to the shared
target longitudes (per-row column gather in a channels-minor layout), then
(2) combine k consecutive resampled rows per target row with the y-Lagrange
weights (contiguous row gathers). Identical weights to the flat path, ~k x
less gather traffic, and O(ny*nxt) setup instead of O(ntgt*k^2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

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


@dataclass
class _Separable:
    """Host-side setup product for the separable fast path."""

    ny: int
    nxw: int
    nxt: int
    nyt: int
    pad_gather: np.ndarray  # (ny, nxw) -> src point index (periodic wrap)
    idx1: np.ndarray  # (ny, nxt, k) column index into the padded row
    wx: np.ndarray  # (ny, nxt, k) x-Lagrange weights
    wx_lin: np.ndarray | None  # quasicubic: linear x weights for outer rows
    rows: np.ndarray  # (nyt, k) source rows per target row
    wy: np.ndarray  # (nyt, k)
    # windowed-MXU pass-1 product (None when disabled): per (source row,
    # B-wide target block) a contiguous W-wide source window and a dense
    # (B, W) banded weight matrix — pass 1 becomes batched MXU matmuls.
    win_start: np.ndarray | None = None  # (ny, nblk) window start col
    Wt: np.ndarray | None = None  # (ny, nblk, B, W)
    Wt_lin: np.ndarray | None = None  # quasicubic linear variant


class StructuredInterpolation2D(Method):
    def __init__(self, src_grid, target, kind: str = "cubic"):
        from ..grid.structured import StructuredGrid

        if not isinstance(src_grid, StructuredGrid):
            raise TypeError("source must be a structured grid")
        self.src_grid = src_grid
        self.kind = kind
        self.k = {"linear": 2, "cubic": 4, "quasicubic": 4}[kind]
        self.nsrc = src_grid.size
        self._idx = None
        self._w = None
        self._sep = None
        self._sep_dev = {}
        tgt_grid = target if isinstance(target, StructuredGrid) else None
        if tgt_grid is not None and self._separable_ok(src_grid, tgt_grid):
            self._tgt_grid = tgt_grid
            self.ntgt = tgt_grid.size
            self._sep = self._build_separable(src_grid, tgt_grid, self.k)
        else:
            self._tgt_grid = tgt_grid
            pts = _target_points(target)
            self._build(src_grid, np.asarray(pts, np.float64).reshape(-1, 2),
                        self.k)

    # ----------------------------------------------------- flat (idx, w) path
    @property
    def idx(self) -> np.ndarray:
        if self._idx is None:  # lazy: only needed for matrix()/cache export
            pts = self._tgt_grid.lonlat()
            self._build(self.src_grid, pts, self.k)
        return self._idx

    @idx.setter
    def idx(self, v):
        self._idx = v

    @property
    def w(self) -> np.ndarray:
        if self._w is None:
            _ = self.idx
        return self._w

    @w.setter
    def w(self, v):
        self._w = v

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
        self.ntgt = ntgt

    # ------------------------------------------------- separable fast path
    @staticmethod
    def _separable_ok(src, tgt) -> bool:
        return (
            src.periodic_x
            and src.projection.identity
            and tgt.projection.identity
            and src.ny >= 4
            and tgt.ny >= 1
            and bool(np.all(tgt.nx == tgt.nx[0]))
            and bool(np.all(tgt.xmin == tgt.xmin[0]))
            and bool(np.all(tgt.dx == tgt.dx[0]))
        )

    def _build_separable(self, grid, tgt, k) -> _Separable:
        ny = grid.ny
        nxt = int(tgt.nx[0])
        nyt = tgt.ny
        lon_t = (tgt.xmin[0] + np.arange(nxt) * tgt.dx[0]) % 360.0
        lat_t = tgt.y

        # pass 2: k consecutive source rows per target row (same rule as the
        # flat path: stencil centered on the rows bracketing the latitude)
        y = grid.y
        jsouth = np.searchsorted(-y, -lat_t, side="right")
        j0 = np.clip(jsouth - k // 2, 0, ny - k)
        rows = j0[:, None] + np.arange(k)[None, :]  # (nyt, k)
        wy = _lagrange_weights(y[rows], lat_t)

        # pass 1: per-source-row x stencil at the shared target longitudes
        fi = (lon_t[None, :] - grid.xmin[:, None]) / grid.dx[:, None]  # (ny,nxt)
        i0 = np.floor(fi).astype(np.int64) - (k // 2 - 1)
        cols = i0[:, :, None] + np.arange(k)[None, None, :]  # (ny, nxt, k)
        wx = _lagrange_weights(
            cols.reshape(-1, k).astype(np.float64), fi.reshape(-1)
        ).reshape(ny, nxt, k)
        wx_lin = None
        if self.kind == "quasicubic":
            a = fi - np.floor(fi)
            wx_lin = np.zeros_like(wx)
            wx_lin[..., k // 2 - 1] = 1.0 - a
            wx_lin[..., k // 2] = a

        # padded source layout with periodic halo columns
        L = max(0, int(-cols.min()))
        R = max(0, int((cols - grid.nx[:, None, None]).max()) + 1)
        nxw = grid.nxmax + L + R
        sep = _Separable(
            ny=ny, nxw=int(nxw), nxt=nxt, nyt=nyt,
            pad_gather=None,
            idx1=(cols + L).astype(np.int32),
            wx=wx, wx_lin=wx_lin,
            rows=rows.astype(np.int32), wy=wy,
        )
        self._add_windowed(grid, sep, cols, k, L, R)
        # pad_gather built against the FINAL nxw (windowing may widen it)
        c = np.arange(sep.nxw)[None, :] - L
        pad_gather = grid.row_offset[:-1, None] + np.mod(c, grid.nx[:, None])
        sep.pad_gather = pad_gather.astype(np.int32)
        return sep

    def _add_windowed(self, grid, sep, cols, k, L, R):
        """Windowed-MXU pass-1 product: XLA's elementwise gather runs at a few
        ns per 256-byte slice, so the column gather is restructured into ~B x
        fewer CONTIGUOUS W-wide window slices contracted against dense banded
        (B, W) weight blocks on the MXU (zero weights cover the band edges)."""
        B = 128
        ny, nxt = sep.ny, sep.nxt
        nblk = -(-nxt // B)
        # window per (row, block): cols are monotone in the target column
        it_first = np.minimum(np.arange(nblk) * B, nxt - 1)
        it_last = np.minimum(it_first + B - 1, nxt - 1)
        start = cols[:, it_first, 0]  # (ny, nblk) unpadded col space
        end = cols[:, it_last, k - 1]
        W = int((end - start).max()) + 1
        W = max(128, -(-W // 128) * 128)
        nxw = max(sep.nxw, W)
        if W > 1024 or ny * nblk * B * W * 4 > 700e6:
            return  # weight tensor too large: keep the gather path
        start = np.clip(start + L, 0, nxw - W)
        # offsets of every stencil tap inside its block window
        offs = sep.idx1 - start[:, (np.minimum(np.arange(nxt), nxt - 1)) // B][
            :, :, None
        ]  # (ny, nxt, k)
        assert offs.min() >= 0 and offs.max() < W, "window overflow"

        def build(weights):
            # f64 host-side; cast to the field dtype when moved to device
            Wt = np.zeros((ny, nblk, B, W))
            jj = np.repeat(np.arange(ny), nxt * k).reshape(ny, nxt, k)
            it = np.broadcast_to(np.arange(nxt)[None, :, None], (ny, nxt, k))
            np.add.at(Wt, (jj, it // B, it % B, offs), weights)
            return Wt

        sep.win_start = start.astype(np.int32)
        sep.Wt = build(sep.wx)
        if sep.wx_lin is not None:
            sep.Wt_lin = build(sep.wx_lin)
        sep.nxw = int(nxw)

    def _sep_tables(self, dtype):
        key = jnp.dtype(dtype).name
        if key not in self._sep_dev:
            s = self._sep
            t = {
                "pad_gather": jnp.asarray(s.pad_gather),
                "idx1": jnp.asarray(s.idx1),
                "wx": jnp.asarray(s.wx, dtype),
                "wx_lin": None if s.wx_lin is None else jnp.asarray(s.wx_lin, dtype),
                "rows": jnp.asarray(s.rows),
                "wy": jnp.asarray(s.wy, dtype),
            }
            if s.Wt is not None:
                t.update(
                    win_start=jnp.asarray(s.win_start),
                    Wt=jnp.asarray(s.Wt, dtype),
                    Wt_lin=None if s.Wt_lin is None else jnp.asarray(s.Wt_lin, dtype),
                )
            self._sep_dev[key] = t
        return self._sep_dev[key]

    def pass1_kernel(self, nch):
        """Cached Pallas pass-1 kernel setup for a channel count."""
        if not hasattr(self, "_pass1k"):
            self._pass1k = {}
        if nch not in self._pass1k:
            from .pallas_pass1 import Pass1Kernel

            self._pass1k[nch] = Pass1Kernel(self, int(nch))
        return self._pass1k[nch]

    def _pass2_matrix(self, dtype):
        """Banded (ntgt_rows, ny) y-combine matrix for the GEMM pass 2
        (measured 5.7 ms gather -> 3.9 ms GEMM at O320 -> 0.25 deg/64ch)."""
        if getattr(self, "_A2", None) is None:
            s = self._sep
            nyt, k = s.rows.shape
            A = np.zeros((nyt, s.ny), np.float32)
            np.add.at(A, (np.repeat(np.arange(nyt), k),
                          np.asarray(s.rows).ravel()),
                      np.asarray(s.wy).ravel())
            self._A2 = jnp.asarray(A, dtype)
        return self._A2

    def _pass2_matrix_hl(self):
        """Stacked [hi; lo] bf16 pass-2 matrix (2 nyp, ny) for the Pallas
        pass-2 kernel, with nyp the target-row count padded to 8."""
        if getattr(self, "_A2hl", None) is None:
            import ml_dtypes

            s = self._sep
            nyt, k = s.rows.shape
            nyp = -(-nyt // 8) * 8
            A = np.zeros((nyp, s.ny), np.float32)
            np.add.at(A, (np.repeat(np.arange(nyt), k),
                          np.asarray(s.rows).ravel()),
                      np.asarray(s.wy).ravel())
            Ahi = A.astype(ml_dtypes.bfloat16)
            Alo = (A - Ahi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            self._A2hl = (jnp.asarray(np.concatenate([Ahi, Alo], axis=0)),
                          nyp, nyt)
        return self._A2hl

    def execute(self, field):
        if self._sep is None:
            return super().execute(field)
        field = jnp.asarray(field)
        lead = field.shape[:1]
        trail = field.shape[1:]
        f2 = field.reshape(lead + (-1,)) if trail else field[:, None]
        t = self._sep_tables(f2.dtype)
        s = self._sep
        if s.Wt is not None:
            if self.kind == "quasicubic":
                out = _apply_windowed_quasi(
                    t["pad_gather"], t["win_start"], t["Wt"], t["Wt_lin"],
                    t["rows"], t["wy"], s.nxt, f2)
            elif jax.default_backend() in ("tpu", "axon"):
                # on-chip fast path: Pallas pass 1 (period-doubled padded
                # rows, 2x bf16 banded dots) + Pallas stacked-bf16 pass 2
                # (Mosaic needs a lane-clean (XC, nch) merge: small channel
                # counts keep the XLA banded GEMM)
                pk = self.pass1_kernel(f2.shape[-1])
                if f2.shape[-1] % 64 == 0:
                    from .pallas_pass1 import pass2_rows

                    tmp = pk.apply(f2, t, tabs=pk.tables(), padded=True)
                    Ahl, nyp, nyt = self._pass2_matrix_hl()
                    out = pass2_rows(Ahl, tmp, nyp, 16)[
                        :nyt, : s.nxt].reshape(-1, f2.shape[-1])
                else:
                    tmp = pk.apply(f2, t, tabs=pk.tables())
                    out = _pass2_gemm(tmp, self._pass2_matrix(f2.dtype))
            else:
                out = _apply_windowed(
                    t["pad_gather"], t["win_start"], t["Wt"],
                    t["rows"], t["wy"], s.nxt, f2)
        elif self.kind == "quasicubic":
            out = _apply_separable_quasi(
                t["pad_gather"], t["idx1"], t["wx"], t["wx_lin"],
                t["rows"], t["wy"], f2)
        else:
            out = _apply_separable(
                t["pad_gather"], t["idx1"], t["wx"], t["rows"], t["wy"], f2)
        return out.reshape((self.ntgt,) + trail)

    def execute_adjoint(self, field):
        if self._sep is None:
            return super().execute_adjoint(field)
        field = jnp.asarray(field)
        prim = jax.ShapeDtypeStruct((self.nsrc,) + field.shape[1:], field.dtype)
        out, = jax.linear_transpose(self.execute, prim)(field)
        return out


from functools import partial


@partial(jax.jit, static_argnums=(3,))
def _windowed_pass1(pad_gather, win_start, Wt, nxt, field):
    """Pass 1 of the windowed-MXU path: flat field -> (ny, nxt, nch).

    Builds the periodic padded row layout with ONE row gather (measured
    faster on TPU than slice+pad+scatter composition), then contracts
    contiguous W-wide windows against dense banded (B, W) weight blocks on
    the MXU.
    """
    ny, nblk, B, W = Wt.shape
    nch = field.shape[-1]
    fpad = field[pad_gather]  # (ny, nxw, nch), halos wrapped in the indices
    zero = jnp.zeros((), win_start.dtype)

    def row_windows(frow, srow):  # (nxw, nch), (nblk,) -> (nblk, W, nch)
        return jax.vmap(
            lambda st: jax.lax.dynamic_slice(frow, (st, zero), (W, nch))
        )(srow)

    win = jax.vmap(row_windows)(fpad, win_start)  # (ny, nblk, W, nch)
    # HIGHEST: TPU default matmul precision is bf16, which would degrade the
    # interpolation weights to ~1e-3 relative accuracy
    tmp = jnp.einsum("jbiw,jbwl->jbil", Wt, win,
                     preferred_element_type=Wt.dtype,
                     precision=jax.lax.Precision.HIGHEST)
    return tmp.reshape(ny, nblk * B, nch)[:, :nxt]


def _apply_windowed(pad_gather, win_start, Wt, rows, wy, nxt, field):
    tmp = _windowed_pass1(pad_gather, win_start, Wt, nxt, field)
    return _pass2(tmp, rows, wy)


def _apply_windowed_quasi(pad_gather, win_start, Wt, Wt_lin, rows, wy, nxt,
                          field):
    tmp_c = _windowed_pass1(pad_gather, win_start, Wt, nxt, field)
    tmp_l = _windowed_pass1(pad_gather, win_start, Wt_lin, nxt, field)
    k = wy.shape[1]
    inner = jnp.zeros((k,), wy.dtype).at[1:-1].set(1.0)
    return _pass2(tmp_c, rows, wy * inner[None, :]) + _pass2(
        tmp_l, rows, wy * (1.0 - inner)[None, :])


@jax.jit
def _pass2(tmp, rows, wy):
    """(ny, nxt, nch) row-resampled values -> (ntgt, nch) via y-combine."""
    sel = tmp[rows]  # (nyt, k, nxt, nch)
    out = (sel * wy[..., None, None]).sum(axis=1)
    return out.reshape(-1, out.shape[-1])


@jax.jit
def _pass2_gemm(tmp, A):
    """Pass 2 as one banded GEMM: A (nyt, ny) holds the k y-weights per
    target row (dense zeros elsewhere); the 160x nominal FLOP waste still
    beats the 4-row gather + weighted sum on the MXU (3.9 vs 5.7 ms at
    O320 -> 0.25 deg/64ch; HIGHEST keeps the f32 values exact to 1e-7)."""
    out = jnp.einsum("tj,jxc->txc", A, tmp,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=tmp.dtype)
    return out.reshape(-1, tmp.shape[-1])


@jax.jit
def _apply_separable(pad_gather, idx1, wx, rows, wy, field):
    """field (nsrc, nch) -> (ntgt, nch): x-resample rows, then y-combine."""
    ny, nxt, k = idx1.shape
    fpad = field[pad_gather]  # (ny, nxw, nch)
    vals = jnp.take_along_axis(
        fpad, idx1.reshape(ny, nxt * k)[:, :, None], axis=1
    ).reshape(ny, nxt, k, -1)
    tmp = (vals * wx[..., None]).sum(axis=2)  # (ny, nxt, nch)
    sel = tmp[rows]  # (nyt, k, nxt, nch)
    out = (sel * wy[..., None, None]).sum(axis=1)  # (nyt, nxt, nch)
    return out.reshape(-1, out.shape[-1])


@jax.jit
def _apply_separable_quasi(pad_gather, idx1, wx, wx_lin, rows, wy, field):
    """Quasicubic: cubic x-resample feeds the inner stencil rows, linear the
    outer ones (reference QuasiCubicHorizontalKernel 12-point stencil)."""
    ny, nxt, k = idx1.shape
    fpad = field[pad_gather]
    vals = jnp.take_along_axis(
        fpad, idx1.reshape(ny, nxt * k)[:, :, None], axis=1
    ).reshape(ny, nxt, k, -1)
    tmp_c = (vals * wx[..., None]).sum(axis=2)
    tmp_l = (vals * wx_lin[..., None]).sum(axis=2)
    inner = jnp.zeros((k,), wy.dtype).at[1:-1].set(1.0)
    wy_c = wy * inner[None, :]
    wy_l = wy * (1.0 - inner)[None, :]
    out = (tmp_c[rows] * wy_c[..., None, None]).sum(axis=1) + (
        tmp_l[rows] * wy_l[..., None, None]
    ).sum(axis=1)
    return out.reshape(-1, out.shape[-1])


@interpolation_factory.register("structured-bilinear")
def _bilinear(config, source, target):
    return StructuredInterpolation2D(source, target, kind="linear")


@interpolation_factory.register("structured-bicubic")
def _bicubic(config, source, target):
    return StructuredInterpolation2D(source, target, kind="cubic")


@interpolation_factory.register("structured-biquasicubic")
def _biquasicubic(config, source, target):
    return StructuredInterpolation2D(source, target, kind="quasicubic")


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
    return StructuredInterpolation2D(source, target, kind="linear")

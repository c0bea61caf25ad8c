"""3-D structured interpolation: trilinear / tricubic / triquasicubic.

Reference behavior: atlas interpolation/method/structured/{Linear3D,Cubic3D,
QuasiCubic3D}.cc (registrations) with kernels in method/structured/kernels/
{Linear3DKernel,Cubic3DKernel,QuasiCubic3DKernel,CubicVerticalKernel}.h —
horizontal stencil from ComputeHorizontalStencil x vertical stencil from
ComputeVerticalStencil over a normalized Vertical coordinate; the vertical
cubic kernel supports a `limiter` clamping the result between the two
bracketing level values (kernels/CubicVerticalKernel.h).

Shapes: source fields are (npts, nlev[, nvar]); targets are 3-D points
(lon, lat, z) with z in the source Vertical's range. The stencil products are
built once on the host; execution is a jitted double gather-dot:

    out[t] = sum_l sum_h W[t, l, h] * f[hidx[t, h], vidx[t, l]]

Boundary rows/levels degrade cubic -> linear exactly as the reference kernels
do (outer stencil weights zeroed, inner pair re-fit linearly).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .interpolation import Method, interpolation_factory
from .structured import StructuredInterpolation2D, _lagrange_weights, _target_points


def _vertical_stencil(z: np.ndarray, zt: np.ndarray, kind: str):
    """Vertical stencil indices + weights on level coordinates z (ascending).

    Returns (vidx (ntgt, kv), wv (ntgt, kv)). Cubic uses a 4-level Lagrange
    stencil, falling back to linear in the first/last interval (reference
    CubicVerticalKernel boundary handling).
    """
    z = np.asarray(z, dtype=np.float64)
    nlev = len(z)
    zt = np.asarray(zt, dtype=np.float64)
    # interval k: z[k] <= zt < z[k+1]
    k = np.clip(np.searchsorted(z, zt, side="right") - 1, 0, nlev - 2)
    if kind == "linear" or nlev < 4:
        a = np.where(z[k + 1] > z[k], (zt - z[k]) / (z[k + 1] - z[k]), 0.0)
        vidx = np.stack([k, k + 1], axis=1)
        wv = np.stack([1.0 - a, a], axis=1)
        return vidx.astype(np.int32), wv
    k0 = np.clip(k - 1, 0, nlev - 4)
    vidx = k0[:, None] + np.arange(4)[None, :]
    wv = _lagrange_weights(z[vidx], zt)
    # linear fallback where the 4-point stencil is one-sided (first/last interval)
    onesided = (k == 0) | (k == nlev - 2)
    if onesided.any():
        sel = np.flatnonzero(onesided)
        ks = k[sel]
        a = (zt[sel] - z[ks]) / (z[ks + 1] - z[ks])
        lin = np.zeros((len(sel), 4))
        pos0 = ks - k0[sel]
        lin[np.arange(len(sel)), pos0] = 1.0 - a
        lin[np.arange(len(sel)), pos0 + 1] = a
        wv[sel] = lin
    return vidx.astype(np.int32), wv


class StructuredInterpolation3D(Method):
    """source: (StructuredGrid, vertical levels array); target: (ntgt, 3) lon/lat/z."""

    def __init__(self, src_grid, z_levels, tgt_points: np.ndarray, kind: str = "cubic"):
        tgt = np.asarray(tgt_points, dtype=np.float64).reshape(-1, 3)
        hkind = {"linear": "linear", "cubic": "cubic", "quasicubic": "quasicubic"}[kind]
        vkind = "linear" if kind == "linear" else "cubic"
        h = StructuredInterpolation2D(src_grid, tgt[:, :2], kind=hkind)
        self.src_grid = src_grid
        self.nsrc = src_grid.size
        self.z = np.asarray(z_levels, dtype=np.float64)
        self.nlev = len(self.z)
        self.idx = h.idx  # (ntgt, kh)
        vidx, wv = _vertical_stencil(self.z, tgt[:, 2], vkind)
        self.vidx = vidx  # (ntgt, kv)
        if kind == "quasicubic":
            # reference QuasiCubic3DKernel: full (quasi-)cubic horizontal on the
            # two interior levels, LINEAR horizontal on the outer two levels
            # (32-point stencil).  Outer-level horizontal weights come from the
            # embedded bilinear sub-stencil.
            hlin = StructuredInterpolation2D(src_grid, tgt[:, :2], kind="linear")
            wlin = _embed(hlin, h)  # (ntgt, kh) linear weights on cubic stencil
            kv = vidx.shape[1]
            wh = np.repeat(h.w[:, None, :], kv, axis=1)
            if kv == 4:
                wh[:, 0, :] = wlin
                wh[:, 3, :] = wlin
            self.w3 = wv[:, :, None] * wh
        else:
            self.w3 = wv[:, :, None] * h.w[:, None, :]  # (ntgt, kv, kh)
        self.w = self.w3.reshape(len(tgt), -1)  # for matrix()/footprint only
        self.limiter = kind != "linear"
        # bracketing-level linear pair for the limiter (reference clamps the
        # cubic result to [min, max] of the 8 surrounding trilinear points)
        k = np.clip(np.searchsorted(self.z, tgt[:, 2], side="right") - 1, 0, self.nlev - 2)
        self._lim_lev = np.stack([k, k + 1], axis=1).astype(np.int32)
        hlin = StructuredInterpolation2D(src_grid, tgt[:, :2], kind="linear")
        self._lim_idx = hlin.idx

    def execute(self, field, limiter: bool = False):
        """field: (nsrc, nlev[, ...]) -> (ntgt[, ...])."""
        field = jnp.asarray(field)
        out = _apply3d(
            jnp.asarray(self.idx),
            jnp.asarray(self.vidx),
            jnp.asarray(self.w3, field.dtype),
            field,
        )
        if limiter:
            lo, hi = _limits(
                jnp.asarray(self._lim_idx), jnp.asarray(self._lim_lev), field
            )
            out = jnp.clip(out, lo, hi)
        return out

    def matrix(self):
        raise NotImplementedError("3-D interpolation is matrix-free")


def _embed(hlin, hcub):
    """Scatter the 2x2 linear stencil weights onto the 4x4 cubic stencil."""
    ntgt, khc = hcub.idx.shape
    wlin = np.zeros((ntgt, khc))
    for jl in range(hlin.idx.shape[1]):
        match = hcub.idx == hlin.idx[:, jl : jl + 1]
        # first matching slot per target
        slot = match.argmax(axis=1)
        ok = match[np.arange(ntgt), slot]
        wlin[np.arange(ntgt), slot] += np.where(ok, hlin.w[:, jl], 0.0)
    return wlin


@jax.jit
def _apply3d(hidx, vidx, w3, field):
    vals = field[hidx]  # (ntgt, kh, nlev, ...)
    vals = jnp.take_along_axis(
        jnp.moveaxis(vals, 1, 2),  # (ntgt, nlev, kh, ...)
        vidx[:, :, None].reshape(vidx.shape + (1,) * (vals.ndim - 2)),
        axis=1,
    )  # (ntgt, kv, kh, ...)
    wshape = w3.shape + (1,) * (vals.ndim - 3)
    return (vals * w3.reshape(wshape)).sum(axis=(1, 2))


@jax.jit
def _limits(hidx, vlev, field):
    vals = field[hidx]  # (ntgt, 4, nlev, ...)
    vals = jnp.take_along_axis(
        jnp.moveaxis(vals, 1, 2),
        vlev[:, :, None].reshape(vlev.shape + (1,) * (vals.ndim - 2)),
        axis=1,
    )  # (ntgt, 2, 4, ...)
    return vals.min(axis=(1, 2)), vals.max(axis=(1, 2))


def _src3d(config, source):
    from ..grid.vertical import Vertical

    if isinstance(source, tuple):
        grid, z = source
    elif hasattr(source, "grid") and hasattr(source, "vertical"):
        grid, z = source.grid, source.vertical
    else:
        raise TypeError("3-D interpolation needs (grid, levels) or a StructuredColumns with vertical")
    if isinstance(z, Vertical):
        z = z.z
    return grid, z


@interpolation_factory.register("structured-trilinear")
def _trilinear(config, source, target):
    grid, z = _src3d(config, source)
    return StructuredInterpolation3D(grid, z, _target_points(target), kind="linear")


@interpolation_factory.register("structured-tricubic")
def _tricubic(config, source, target):
    grid, z = _src3d(config, source)
    return StructuredInterpolation3D(grid, z, _target_points(target), kind="cubic")


@interpolation_factory.register("structured-triquasicubic")
def _triquasicubic(config, source, target):
    grid, z = _src3d(config, source)
    return StructuredInterpolation3D(grid, z, _target_points(target), kind="quasicubic")

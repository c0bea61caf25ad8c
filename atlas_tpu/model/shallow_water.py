"""Shallow-water equations on the sphere — the north-star workload.

The reference's headline benchmark exercises the fvm median-dual operators in
a time loop (atlas-benchmark; BASELINE.md configs 4-5 ask for shallow-water /
advection). This model composes the shift-structured operators
(fvm/structured.py) into the vector-invariant shallow-water system:

    dq/dt: dh/dt = -div(h u)
           du/dt =  (f + zeta) v - d/dx(g h + K)
           dv/dt = -(f + zeta) u - d/dy(g h + K)        K = (u^2 + v^2)/2

with zeta = curl(u, v), f = 2 Omega sin(lat); SSP-RK3 time stepping; state in
the (nlev, ny, nxw) padded layout so every operator is a static-shift VPU
kernel (no gathers) and the whole step jits into one fused XLA program.
Standard validation: Williamson et al. (1992) test cases 2 (steady
geostrophic) and 6 (Rossby-Haurwitz wave).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..fvm.structured import StructuredFvm, _grad_struct, _divcurl_struct
from ..util.constants import DEG2RAD, EARTH_RADIUS

OMEGA = 7.292e-5  # [1/s]
GRAVITY = 9.80616  # [m/s2] (Williamson test suite value)


class ShallowWaterModel:
    def __init__(self, grid, dtype=jnp.float32, use_cache: bool = False):
        self.grid = grid
        self.dtype = jnp.dtype(dtype)
        self.use_cache = bool(use_cache)
        self.sfvm = StructuredFvm(grid, use_cache=use_cache)
        s = self.sfvm.shifts
        lat = np.zeros((s.ny, s.nxw))
        jj, cc = s.row_of_point, s.col_of_point
        ll = grid.lonlat()
        lat[jj, cc] = ll[:, 1]
        self._tables = None
        self.coriolis = 2.0 * OMEGA * np.sin(np.deg2rad(lat))  # (ny, nxw)
        self.mask = s.mask

    # ------------------------------------------------------------- state i/o
    def layout(self, f_grid):
        return jnp.asarray(self.sfvm.to_layout(np.asarray(f_grid)), self.dtype)

    def unlayout(self, f_pad):
        return self.sfvm.from_layout(np.asarray(f_pad))

    def initial_state_williamson2(self, u0: float = 2.0 * np.pi * EARTH_RADIUS / (12 * 86400), h0: float = 2.94e4 / GRAVITY):
        """Steady geostrophic flow (Williamson case 2, alpha = 0)."""
        ll = self.grid.lonlat()
        lat = np.deg2rad(ll[:, 1])
        u = u0 * np.cos(lat)
        v = np.zeros_like(u)
        h = h0 - (EARTH_RADIUS * OMEGA * u0 + 0.5 * u0 * u0) * np.sin(lat) ** 2 / GRAVITY
        return {
            "h": self.layout(h),
            "u": self.layout(u),
            "v": self.layout(v),
        }

    def initial_state_rossby_haurwitz(self):
        """Rossby-Haurwitz wavenumber-4 (Williamson case 6)."""
        K = w = 7.848e-6
        R = 4.0
        h0 = 8000.0
        ll = self.grid.lonlat()
        lam = np.deg2rad(ll[:, 0])
        phi = np.deg2rad(ll[:, 1])
        a = EARTH_RADIUS
        cphi = np.cos(phi)
        u = a * w * cphi + a * K * cphi ** (R - 1) * (
            R * np.sin(phi) ** 2 - cphi**2
        ) * np.cos(R * lam)
        v = -a * K * R * cphi ** (R - 1) * np.sin(phi) * np.sin(R * lam)
        A = 0.5 * w * (2 * OMEGA + w) * cphi**2 + 0.25 * K**2 * cphi ** (2 * R) * (
            (R + 1) * cphi**2 + (2 * R**2 - R - 2) - 2 * R**2 * cphi**-2
        )
        B = (
            2 * (OMEGA + w) * K / ((R + 1) * (R + 2)) * cphi**R
            * ((R**2 + 2 * R + 2) - (R + 1) ** 2 * cphi**2)
        )
        C = 0.25 * K**2 * cphi ** (2 * R) * ((R + 1) * cphi**2 - (R + 2))
        h = h0 + (a * a * (A + B * np.cos(R * lam) + C * np.cos(2 * R * lam))) / GRAVITY
        return {
            "h": self.layout(h),
            "u": self.layout(u),
            "v": self.layout(v),
        }

    # --------------------------------------------------------------- dynamics
    def _tbl(self):
        if self._tables is None:
            t = dict(self.sfvm._device_tables(self.dtype))
            t["coriolis"] = jnp.asarray(self.coriolis, self.dtype)
            self._tables = t
        return self._tables

    def tendencies(self, state):
        return _swe_tendencies(self._tbl(), state)

    def step(self, state, dt: float):
        """One SSP-RK3 step."""
        return _swe_rk3(self._tbl(), state, jnp.asarray(dt, self.dtype))

    def run(self, state, dt: float, nsteps: int):
        return _swe_run(self._tbl(), state, jnp.asarray(dt, self.dtype), nsteps)

    def suggested_dt(self, c: float = 0.5) -> float:
        """CFL-based dt from the smallest zonal spacing and gravity waves."""
        ll = self.grid.lonlat()
        lat = np.deg2rad(ll[:, 1])
        dx_m = np.repeat(self.grid.dx, self.grid.nx) * DEG2RAD * EARTH_RADIUS * np.cos(lat)
        dy_m = np.abs(np.diff(self.grid.y)).min() * DEG2RAD * EARTH_RADIUS
        dmin = min(dx_m.min(), dy_m)
        cg = np.sqrt(GRAVITY * 10000.0) + 100.0
        return c * dmin / cg


def _swe_tendencies(t, state):
    h, u, v = state["h"], state["u"], state["v"]
    dtype = h.dtype
    g = jnp.asarray(GRAVITY, dtype)
    zeta = _divcurl_struct(t, u, v, True, 0)
    div_m = _divcurl_struct(t, h * u, h * v, False, 0)
    energy = g * h + jnp.asarray(0.5, dtype) * (u * u + v * v)
    grad_e = _grad_struct(t, energy)  # (2, nlev, ny, nxw)
    fz = t["coriolis"][None] + zeta
    mask = t["mask"][None]
    return {
        "h": -div_m * mask,
        "u": (fz * v - grad_e[0]) * mask,
        "v": (-fz * u - grad_e[1]) * mask,
    }


def _fill_halos(t, state):
    # periodic x halo columns for every prognostic variable
    def fill(f):
        return f.at[:, t["halo_rows"], t["halo_dst"]].set(
            f[:, t["halo_rows"], t["halo_src"]]
        )

    return {k: fill(val) for k, val in state.items()}


@jax.jit
def _swe_rk3(t, state, dt):
    """Shu-Osher SSP-RK3."""

    def add(a, b, ca, cb):
        return {k: ca * a[k] + cb * b[k] for k in a}

    def euler(s):
        s = _fill_halos(t, s)
        k = _swe_tendencies(t, s)
        return {n: s[n] + dt * k[n] for n in s}

    one = jnp.asarray(1.0, dt.dtype)
    s1 = euler(state)
    s2 = add(state, euler(s1), 0.75 * one, 0.25 * one)
    s3 = add(state, euler(s2), one / 3, 2 * one / 3)
    return s3


@partial(jax.jit, static_argnums=3)
def _swe_run(t, state, dt, nsteps):
    def body(_, s):
        return _swe_rk3(t, s, dt)

    return jax.lax.fori_loop(0, nsteps, body, state)

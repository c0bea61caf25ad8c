"""Semi-Lagrangian advection tests (solid-body rotation of a Gaussian blob)."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.model.semi_lagrangian import SemiLagrangianAdvection
from atlas_tpu.grid.stencil import interp_structured_cubic, stencil_tables
from atlas_tpu.util.constants import EARTH_RADIUS


def blob(lon, lat, lon0=180.0, lat0=0.0, width=20.0):
    # great-circle-ish distance in degrees (small-region approximation ok)
    d2 = ((lon - lon0 + 180) % 360 - 180) ** 2 * np.cos(np.deg2rad(lat0)) ** 2 + (
        lat - lat0
    ) ** 2
    return np.exp(-d2 / (2 * width**2))


def test_stencil_interp_matches_setup_interpolation():
    grid = Grid("O32")
    ll = grid.lonlat()
    from atlas_tpu.util.functions import vortex_rollup

    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    pts = np.array([[12.3, 45.6], [250.0, -70.1], [359.5, 0.2]])
    out = np.asarray(
        interp_structured_cubic(stencil_tables(grid), f, pts[:, 0], pts[:, 1])
    )
    from atlas_tpu.interpolation import StructuredInterpolation2D

    ref = np.asarray(StructuredInterpolation2D(grid, pts, kind="cubic").execute(f))
    np.testing.assert_allclose(out, ref, atol=1e-12)


def test_zonal_advection_moves_blob():
    grid = Grid("O48")
    ll = grid.lonlat()
    lon, lat = ll[:, 0], ll[:, 1]
    q0 = blob(lon, lat)
    u0 = 2 * np.pi * EARTH_RADIUS / (12 * 86400)  # 12-day rotation
    u = u0 * np.cos(np.deg2rad(lat))
    v = np.zeros_like(u)
    sl = SemiLagrangianAdvection(grid)
    dt = 3600.0
    q = q0
    nsteps = 24  # one day -> 30 degrees of rotation
    for _ in range(nsteps):
        q = sl.step(q, u, v, dt)
    q = np.asarray(q)
    shift = 360.0 * nsteps * dt / (12 * 86400)
    ref = blob(lon, lat, lon0=180.0 + shift)
    err = np.abs(q - ref)
    assert err.max() < 0.02  # cubic SL keeps the blob shape well
    # peak amplitude preserved within a couple of percent
    assert abs(q.max() - q0.max()) < 0.03


def test_meridional_advection_near_pole_stable():
    grid = Grid("O32")
    ll = grid.lonlat()
    lat = ll[:, 1]
    q0 = blob(ll[:, 0], lat, lon0=0.0, lat0=60.0, width=15.0)
    v = np.full_like(lat, 30.0)  # northward
    u = np.zeros_like(v)
    sl = SemiLagrangianAdvection(grid)
    q = q0
    for _ in range(10):
        q = sl.step(q, u, v, 1800.0)
    q = np.asarray(q)
    assert np.isfinite(q).all()
    assert q.max() < 1.5  # no blow-up


def test_padded_interp_matches_gather_variant():
    """interp_cubic_padded (contiguous 4-tap slices from the periodic padded
    layout) is bit-equivalent to the elementwise-gather evaluation."""
    import numpy as np

    from atlas_tpu import Grid
    from atlas_tpu.grid.stencil import (interp_cubic_padded, make_taps,
                                        pad_field, padded_tables)

    grid = Grid("O16")
    rng = np.random.default_rng(0)
    f = rng.standard_normal(grid.size)
    pts = np.stack([rng.uniform(0, 360, 300), rng.uniform(-88, 88, 300)], -1)
    t = padded_tables(grid)
    nxw = t.pop("nxw")
    taps = make_taps(
        pad_field(f, t["row_offset"], nxw, t["halo_pos"], t["halo_src"]))
    a = np.asarray(interp_cubic_padded(t, taps, pts[:, 0], pts[:, 1]))
    b = np.asarray(
        interp_structured_cubic(stencil_tables(grid), f, pts[:, 0], pts[:, 1]))
    np.testing.assert_allclose(a, b, atol=1e-12)


def test_fast_semilag_matches_gather_path():
    """Shift-algebra semi-Lagrangian == the gather-based stencil path to
    roundoff (same departure iteration, same cubic Lagrange stencil;
    reference stencil computers grid/StencilComputer.h:27-50)."""
    from atlas_tpu.model.semilag_fast import SemiLagrangianFast

    for gname in ("O24", "F16"):
        g = Grid(gname)
        ref = SemiLagrangianAdvection(g)
        fast = SemiLagrangianFast(g)
        ll = g.lonlat()
        u = 20.0 * np.cos(np.deg2rad(ll[:, 1]))
        v = 5.0 * np.sin(np.deg2rad(2 * ll[:, 0]))
        q = np.cos(3 * np.deg2rad(ll[:, 0])) * np.sin(np.deg2rad(ll[:, 1]))
        a = np.asarray(ref.step(q, u, v, 1800.0))
        b = np.asarray(fast.step(q, u, v, 1800.0))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-12

"""Tests for the wider interpolation method families.

Reference analogs: src/tests/interpolation/test_interpolation_structured2D.cc
(quasicubic), test_interpolation_cubic_prototype.cc (3-D cubic),
test_interpolation_non_linear.cc (missing values),
test_interpolation_spherical_vector.cc, test_interpolation_bilinear_remapping.cc
(unstructured bilinear), test_interpolation_grid_box_average.cc / maximum,
test_interpolation_binning.cc.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.interpolation import (
    Interpolation,
    StructuredInterpolation3D,
    execute_nonlinear,
)
from atlas_tpu.util.functions import vortex_rollup


@pytest.fixture(scope="module")
def src():
    grid = Grid("O32")
    ll = grid.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    return grid, f


def _tgt_field(tgt):
    tll = tgt.lonlat()
    return vortex_rollup(tll[:, 0], tll[:, 1], 0.5)


def test_quasicubic_accuracy(src):
    grid, f = src
    tgt = Grid("S64x32")
    interp = Interpolation("structured-biquasicubic", grid, tgt)
    out = np.asarray(interp.execute(f))
    err = np.abs(out - _tgt_field(tgt))
    assert err.max() < 1e-2
    assert err.mean() < 1e-3
    # 12-point stencil: each row of weights has at most 12 non-zeros
    assert (np.abs(interp.w) > 1e-14).sum(axis=1).max() <= 12


def test_trilinear_and_tricubic():
    grid = Grid("O32")
    nlev = 10
    z = np.linspace(0.0, 1.0, nlev)
    ll = grid.lonlat()
    # separable analytic field: f(lon,lat,z) = vortex(lon,lat) * (z^2 + 0.5)
    base = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    f = base[:, None] * (z[None, :] ** 2 + 0.5)

    rng = np.random.default_rng(7)
    lon = rng.uniform(0, 360, 200)
    lat = rng.uniform(-75, 75, 200)
    zt = rng.uniform(0.05, 0.95, 200)
    tgt = np.stack([lon, lat, zt], axis=1)
    ref = vortex_rollup(lon, lat, 0.5) * (zt**2 + 0.5)

    tric = StructuredInterpolation3D(grid, z, tgt, kind="cubic")
    out = np.asarray(tric.execute(f))
    assert np.abs(out - ref).max() < 2e-2

    tril = StructuredInterpolation3D(grid, z, tgt, kind="linear")
    outl = np.asarray(tril.execute(f))
    assert np.abs(outl - ref).max() < 5e-2
    # cubic should beat linear on the smooth vertical profile
    assert np.abs(out - ref).mean() < np.abs(outl - ref).mean()

    triq = StructuredInterpolation3D(grid, z, tgt, kind="quasicubic")
    outq = np.asarray(triq.execute(f))
    assert np.abs(outq - ref).max() < 5e-2

    # limiter keeps result within the surrounding trilinear bounds
    outlim = np.asarray(tric.execute(f, limiter=True))
    assert np.abs(outlim - ref).max() < 5e-2


def test_tricubic_factory():
    grid = Grid("O16")
    z = np.linspace(0, 1, 5)
    tgt = np.array([[10.0, 20.0, 0.5], [200.0, -40.0, 0.25]])
    interp = Interpolation({"type": "structured-tricubic"}, (grid, z), tgt)
    f = np.ones((grid.size, 5))
    out = np.asarray(interp.execute(f))
    np.testing.assert_allclose(out, 1.0, atol=1e-12)


def test_unstructured_bilinear(src):
    grid, f = src
    tgt = Grid("S64x32")
    interp = Interpolation("unstructured-bilinear-lonlat", grid, tgt)
    out = np.asarray(interp.execute(f))
    err = np.abs(out - _tgt_field(tgt))
    assert not interp.missed.any()
    assert err.max() < 5e-2
    assert err.mean() < 5e-3
    # exact for constants
    np.testing.assert_allclose(
        np.asarray(interp.execute(np.ones(grid.size))), 1.0, atol=1e-12
    )


def test_grid_box_maximum():
    src_g = Grid("O32")
    tgt_g = Grid("O16")
    ll = src_g.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    gbm = Interpolation("grid-box-maximum", src_g, tgt_g)
    out = np.asarray(gbm.execute(f))
    # each target max must be >= the conservative average
    gba = Interpolation("grid-box-average", src_g, tgt_g)
    avg = np.asarray(gba.execute(f))
    assert (out >= avg - 1e-12).all()
    assert out.max() <= f.max() + 1e-12


def test_binning(src):
    grid, f = src  # fine grid O32
    tgt = Grid("O16")  # coarse
    interp = Interpolation(
        {"type": "binning", "scheme": {"type": "structured-bilinear"}}, grid, tgt
    )
    out = np.asarray(interp.execute(f))
    # aggregation of a constant is exact; of a smooth field, close
    np.testing.assert_allclose(
        np.asarray(interp.execute(np.ones(grid.size))), 1.0, atol=1e-12
    )
    err = np.abs(out - _tgt_field(tgt))
    assert err.mean() < 2e-2


def test_spherical_vector():
    src_g = Grid("O48")
    tgt_g = Grid("S64x32")
    interp = Interpolation(
        {"type": "spherical-vector", "scheme": {"type": "structured-bilinear"}},
        src_g,
        tgt_g,
    )
    # solid-body rotation wind at 45 deg inclination: exact vector field
    beta = np.deg2rad(45.0)
    def wind(ll):
        lam = np.deg2rad(ll[:, 0])
        phi = np.deg2rad(ll[:, 1])
        u = np.cos(phi) * np.cos(beta) + np.sin(phi) * np.cos(lam) * np.sin(beta)
        v = -np.sin(lam) * np.sin(beta)
        return u, v

    us, vs = wind(src_g.lonlat())
    ut, vt = interp.execute_vector(us, vs)
    uref, vref = wind(tgt_g.lonlat())
    err = np.hypot(np.asarray(ut) - uref, np.asarray(vt) - vref)
    assert err.max() < 5e-3

    # plain scalar interpolation of the components is WORSE near the poles
    base = Interpolation("structured-bilinear", src_g, tgt_g)
    u0 = np.asarray(base.execute(us))
    v0 = np.asarray(base.execute(vs))
    err0 = np.hypot(u0 - uref, v0 - vref)
    polar = np.abs(tgt_g.lonlat()[:, 1]) > 80
    assert err[polar].max() <= err0[polar].max() + 1e-12


def test_nonlinear_missing(src):
    grid, f = src
    tgt = Grid("S32x16")
    interp = Interpolation("structured-bilinear", grid, tgt)
    mv = -9999.0
    fm = f.copy()
    miss_src = np.zeros(grid.size, dtype=bool)
    miss_src[::7] = True
    fm[miss_src] = mv

    out_any = np.asarray(execute_nonlinear(interp, fm, mv, "missing-if-any-missing"))
    out_all = np.asarray(execute_nonlinear(interp, fm, mv, "missing-if-all-missing"))
    out_hvy = np.asarray(execute_nonlinear(interp, fm, mv, "missing-if-heaviest-missing"))

    any_m = out_any == mv
    all_m = out_all == mv
    hvy_m = out_hvy == mv
    # monotone: all-missing set <= heaviest-missing set <= any-missing set
    assert (all_m <= hvy_m).all()
    assert (hvy_m <= any_m).all()
    # where nothing is missing, all three agree with the plain execute
    clean = ~any_m
    ref = np.asarray(interp.execute(f))
    np.testing.assert_allclose(out_any[clean], ref[clean], atol=1e-6)
    # renormalized values stay within field bounds
    valid = out_all != mv
    assert out_all[valid].max() <= f[~miss_src].max() + 1e-9
    assert out_all[valid].min() >= f[~miss_src].min() - 1e-9


def test_assemble_global_matrix(src):
    from atlas_tpu.interpolation import assemble_global_matrix

    grid, f = src
    tgt = Grid("S32x16")
    interp = Interpolation("structured-bilinear", grid, tgt)
    W = assemble_global_matrix(interp)
    out = W @ f
    np.testing.assert_allclose(out, np.asarray(interp.execute(f)), atol=1e-12)


def test_regional_linear_2d():
    """Bilinear on a Lambert-conformal regional grid in projected space
    (reference method/structured/RegionalLinear2D.cc)."""
    reg = Grid(
        {
            "type": "regional",
            "nx": 60,
            "ny": 50,
            "west": -500000.0,
            "east": 500000.0,
            "north": 400000.0,
            "south": -400000.0,
            "projection": {
                "type": "lambert_conformal_conic",
                "longitude0": 4.0,
                "latitude0": 50.0,
            },
        }
    )
    ll = reg.lonlat()
    f = np.sin(np.deg2rad(ll[:, 1])) * np.cos(np.deg2rad(ll[:, 0]))
    rng = np.random.default_rng(0)
    tx = rng.uniform(-400000, 400000, 300)
    ty = rng.uniform(-300000, 300000, 300)
    tll = reg.projection.xy2lonlat(np.stack([tx, ty], 1))
    interp = Interpolation("regional-linear-2d", reg, tll)
    out = np.asarray(interp.execute(f))
    ref = np.sin(np.deg2rad(tll[:, 1])) * np.cos(np.deg2rad(tll[:, 0]))
    assert np.abs(out - ref).max() < 1e-4
    # edge clamp: a target outside the domain degrades to one-sided linear
    # extrapolation without indexing errors
    out_edge = np.asarray(
        Interpolation(
            "regional-linear-2d",
            reg,
            reg.projection.xy2lonlat(np.array([[-499999.0, 399999.0]])),
        ).execute(f)
    )
    assert np.isfinite(out_edge).all()


def test_zonal_band_grid():
    zb = Grid({"type": "zonal_band", "nx": 64, "ny": 17, "north": 60.0, "south": -60.0})
    assert zb.size == 64 * 17
    assert zb.y[0] == 60.0 and zb.y[-1] == -60.0
    assert zb.periodic_x
    # interpolation works across the periodic seam
    ll = zb.lonlat()
    f = np.cos(np.deg2rad(ll[:, 0]))
    interp = Interpolation("structured-bilinear", zb, np.array([[359.0, 0.0]]))
    out = float(np.asarray(interp.execute(f))[0])
    assert abs(out - np.cos(np.deg2rad(359.0))) < 1e-3

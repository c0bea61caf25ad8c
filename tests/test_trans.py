"""Spherical-harmonic transform tests.

Mirrors reference src/tests/trans/test_transgeneral.cc: single-mode inverse
transforms checked against analytic spherical harmonics, and roundtrip
(dirtrans o invtrans == identity) on Gaussian grids where the quadrature is
exact.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.trans import TransLocal, nspec2, spectral_index
from atlas_tpu.trans.legendre import legendre_polynomials
from atlas_tpu.util.functions import real_spherical_harmonic


def test_legendre_orthonormality():
    # (1/2) integral P_nm P_n'm dx = delta, via Gauss-Legendre quadrature
    from atlas_tpu.grid.gaussian import gaussian_quadrature_npole_spole

    lats, w = gaussian_quadrature_npole_spole(48)
    x = np.sin(np.deg2rad(lats))
    T = 10
    P = legendre_polynomials(T, x)  # (nlat, ncoef)
    ms, ns = spectral_index(T)
    for m in range(3):
        cols = np.flatnonzero(ms == m)
        G = 0.5 * np.einsum("l,lk,lj->kj", w, P[:, cols], P[:, cols])
        np.testing.assert_allclose(G, np.eye(len(cols)), atol=1e-13)


@pytest.mark.parametrize("n,m", [(0, 0), (3, 0), (4, 2), (7, 7), (10, 5)])
def test_invtrans_single_mode_vs_analytic(n, m):
    grid = Grid("F24")
    T = 15
    trans = TransLocal(grid, T, dtype=np.float64)
    ms, ns = spectral_index(T)
    k = int(np.flatnonzero((ms == m) & (ns == n))[0])
    spec = np.zeros(nspec2(T))
    spec[2 * k] = 1.0  # real part
    f = np.asarray(trans.invtrans(spec))
    ll = grid.lonlat()
    y = real_spherical_harmonic(ll[:, 0], ll[:, 1], n, m)
    # (-1)^m: the transform uses the geodesy convention (no Condon-Shortley
    # phase); real_spherical_harmonic includes the CS phase
    scale = (-1.0) ** m * np.sqrt(4 * np.pi) * (1.0 / np.sqrt(2.0) if m > 0 else 1.0)
    np.testing.assert_allclose(f, scale * y, atol=1e-11)


def test_invtrans_imag_mode():
    grid = Grid("F24")
    T = 15
    n, m = 5, 3
    trans = TransLocal(grid, T, dtype=np.float64)
    ms, ns = spectral_index(T)
    k = int(np.flatnonzero((ms == m) & (ns == n))[0])
    spec = np.zeros(nspec2(T))
    spec[2 * k + 1] = 1.0  # imaginary part -> -sin(m lon) component
    f = np.asarray(trans.invtrans(spec))
    ll = grid.lonlat()
    y = real_spherical_harmonic(ll[:, 0], ll[:, 1], n, -m)
    np.testing.assert_allclose(
        f, -((-1.0) ** m) * np.sqrt(4 * np.pi) / np.sqrt(2.0) * y, atol=1e-11
    )


def test_roundtrip_gaussian():
    grid = Grid("F24")
    T = 23
    trans = TransLocal(grid, T, dtype=np.float64)
    rng = np.random.default_rng(0)
    spec = rng.normal(size=(3, nspec2(T)))
    # zero the imaginary parts of m=0 modes (not representable in real fields)
    ms, _ = spectral_index(T)
    spec[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    f = trans.invtrans(spec)
    back = np.asarray(trans.dirtrans(f))
    np.testing.assert_allclose(back, spec, atol=1e-11)


def test_invtrans_on_reduced_grid():
    # octahedral grid: per-row truncation; compare against direct evaluation
    grid = Grid("O16")
    T = 10
    trans = TransLocal(grid, T, dtype=np.float64)
    ms, ns = spectral_index(T)
    n, m = 6, 4
    k = int(np.flatnonzero((ms == m) & (ns == n))[0])
    spec = np.zeros(nspec2(T))
    spec[2 * k] = 1.0
    f = np.asarray(trans.invtrans(spec))
    ll = grid.lonlat()
    y = real_spherical_harmonic(ll[:, 0], ll[:, 1], n, m)
    scale = (-1.0) ** m * np.sqrt(4 * np.pi) / np.sqrt(2.0)
    # rows where m exceeds the row Nyquist are truncated to zero there; the
    # polar rows of O16 have nx >= 20 > 2m so all rows resolve m=4
    np.testing.assert_allclose(f, scale * y, atol=1e-11)


def test_vortex_field_spectral_content():
    # transform a smooth field and verify energy decays with n
    grid = Grid("F32")
    T = 31
    trans = TransLocal(grid, T, dtype=np.float64)
    ll = grid.lonlat()
    from atlas_tpu.util.functions import vortex_rollup

    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    spec = np.asarray(trans.dirtrans(f))
    ms, ns = spectral_index(T)
    power = spec[0::2] ** 2 + spec[1::2] ** 2
    low = power[ns <= 5].sum()
    high = power[ns > 25].sum()
    assert low > 100 * high
    # and inverse reproduces the field up to truncation error
    back = np.asarray(trans.invtrans(spec))
    assert np.abs(back - f).max() < 0.05 * np.abs(f).max()


def test_vordiv_to_uv_solid_body():
    """Solid-body rotation: zeta = 2 u0/R sin(lat), D = 0 -> U = u0 cos^2."""
    from atlas_tpu.trans import VorDivToUV
    from atlas_tpu.util.constants import EARTH_RADIUS

    T = 15
    u0, R = 20.0, EARTH_RADIUS
    ms, ns = spectral_index(T)
    zeta = np.zeros(nspec2(T))
    k10 = int(np.flatnonzero((ms == 0) & (ns == 1))[0])
    zeta[2 * k10] = 2 * u0 / R / np.sqrt(3.0)
    U, V = VorDivToUV(T, R).execute(zeta, np.zeros_like(zeta))
    grid = Grid("F24")
    trans = TransLocal(grid, T, dtype=np.float64)
    Ug = np.asarray(trans.invtrans(U))
    lat = np.deg2rad(grid.lonlat()[:, 1])
    np.testing.assert_allclose(Ug, u0 * np.cos(lat) ** 2, atol=1e-13)
    assert np.abs(np.asarray(trans.invtrans(V))).max() < 1e-13


def test_vordiv_streamfunction_exactness():
    """With vorticity content limited to n <= T-1, the truncation-T wind
    spectra are exact: U/cos == -grad_phi(psi)/R evaluated spectrally.

    (U = u cos carries degree n+1 content, so winds from truncation-T
    vorticity are complete only for input content <= T-1 — the reference's
    convention too, vd2uv output ilcm = truncation - km.)"""
    from atlas_tpu.trans import VorDivToUV
    from atlas_tpu.trans.legendre import legendre_polynomials
    from atlas_tpu.util.constants import EARTH_RADIUS

    T = 7
    R = EARTH_RADIUS
    rng = np.random.default_rng(1)
    ms, ns = spectral_index(T)
    zeta = rng.normal(size=nspec2(T)) * 1e-5
    zeta[2 * np.flatnonzero(ms == 0) + 1] = 0.0
    for k in np.flatnonzero((ns == 0) | (ns == T)):  # content <= T-1
        zeta[2 * k] = 0.0
        zeta[2 * k + 1] = 0.0
    L = np.where(ns > 0, -R * R / (ns * (ns + 1.0)), 0.0)
    psi = np.zeros_like(zeta)
    psi[0::2] = L * zeta[0::2]
    psi[1::2] = L * zeta[1::2]
    U, V = VorDivToUV(T, R).execute(zeta, np.zeros_like(zeta))

    def eval_spec(spec, lon_deg, lat_deg):
        x = np.sin(np.deg2rad(np.atleast_1d(lat_deg)))
        P = legendre_polynomials(T, x)
        lam = np.deg2rad(lon_deg)
        re, im = spec[0::2], spec[1::2]
        out = np.zeros(len(x))
        for k in range(len(ms)):
            out += P[:, k] * (re[k] * np.cos(ms[k] * lam) - im[k] * np.sin(ms[k] * lam))
        return out

    d = 1e-5
    for lon0, lat0 in [(33.0, 40.0), (200.0, -55.0), (10.0, 5.0)]:
        dpsi = (eval_spec(psi, lon0, lat0 + d) - eval_spec(psi, lon0, lat0 - d)) / (
            2 * np.deg2rad(d)
        )
        u_num = float(-dpsi / R)
        u_vd = float(eval_spec(U, lon0, lat0) / np.cos(np.deg2rad(lat0)))
        assert abs(u_vd - u_num) < 1e-5 * max(abs(u_num), 1.0)
        # V from pure streamfunction: v = (1/(R cos)) dpsi/dlambda
        dlam = (eval_spec(psi, lon0 + d, lat0) - eval_spec(psi, lon0 - d, lat0)) / (
            2 * np.deg2rad(d)
        )
        v_num = float(dlam / (R * np.cos(np.deg2rad(lat0))))
        v_vd = float(eval_spec(V, lon0, lat0) / np.cos(np.deg2rad(lat0)))
        assert abs(v_vd - v_num) < 1e-5 * max(abs(v_num), 1.0)


def test_trans_facade_backends():
    """Trans facade dispatches to local/distributed backends consistently."""
    from atlas_tpu.trans import Trans, nspec2, spectral_index

    grid = Grid("F24")
    T = 23
    rng = np.random.default_rng(0)
    sp = rng.standard_normal(nspec2(T))
    ms, _ = spectral_index(T)
    sp[2 * np.flatnonzero(ms == 0) + 1] = 0.0
    t_local = Trans(grid, T, type="local", dtype=np.float64)
    t_dist = Trans(grid, T, type="distributed", nparts=8, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(t_local.invtrans(sp)), t_dist.invtrans(sp), atol=1e-11)
    gp = np.asarray(t_local.invtrans(sp))
    np.testing.assert_allclose(
        np.asarray(t_local.dirtrans(gp)), t_dist.dirtrans(gp), atol=1e-11)


def test_trans_invtrans_vordiv2wind_solid_body():
    """Solid-body vorticity 2 Omega sin(lat) -> u = Omega R cos(lat), v = 0.

    Mirrors the reference's vordiv2wind validation (TransLocal +
    VorDivToUVLocal; src/tests/trans rotation tests).
    """
    from atlas_tpu.trans import Trans, nspec2
    from atlas_tpu.util.constants import EARTH_RADIUS

    grid = Grid("F24")
    T = 23
    omega = 7.292e-5
    # zeta = 2 Omega sin(lat): the (m=0, n=1) normalized mode P^0_1 = sqrt(3) sinlat
    zeta = np.zeros(nspec2(T))
    zeta[2 * 1] = 2.0 * omega / np.sqrt(3.0)  # (m=0, n=1) real part
    div = np.zeros_like(zeta)
    tr = Trans(grid, T, type="local", dtype=np.float64)
    u, v = tr.invtrans_vordiv2wind(zeta, div)
    lat = grid.lonlat()[:, 1]
    u_ref = omega * EARTH_RADIUS * np.cos(np.deg2rad(lat))
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-10, atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)


def test_invtrans_unstructured_matches_grid():
    """Unstructured-target synthesis equals the grid-path synthesis at the
    grid's own points (TransLocal.h:192-198 cropped/unstructured path)."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.trans import TransLocal, nspec2, spectral_index

    grid = Grid("F24")
    T = 21
    tr = TransLocal(grid, T, dtype=np.float64)
    rng = np.random.default_rng(3)
    sp = rng.standard_normal(nspec2(T))
    ms, _ = spectral_index(T)
    sp[2 * np.flatnonzero(ms == 0) + 1] = 0.0
    ref = np.asarray(tr.invtrans(sp))
    out = tr.invtrans_unstructured(sp, grid.lonlat())
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-10)


def test_invtrans_grad_analytic():
    """invtrans_grad derivatives vs analytic gradient of one spherical
    harmonic (reference TransLocal scalar-derivative path)."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.trans import TransLocal, nspec2, spectral_index
    from atlas_tpu.util.constants import EARTH_RADIUS

    grid = Grid("F32")
    T = 21
    tr = TransLocal(grid, T, dtype=np.float64)
    # single harmonic m=3, n=5: f = Re(a P e^{i m lon}), a = 1
    ms, ns = spectral_index(T)
    k = int(np.flatnonzero((ms == 3) & (ns == 5))[0])
    sp = np.zeros(nspec2(T))
    sp[2 * k] = 1.0
    f, dfdx, dfdy = tr.invtrans_grad(sp)
    f = np.asarray(f); dfdx = np.asarray(dfdx); dfdy = np.asarray(dfdy)

    # analytic via central differences of the unstructured synthesis
    ll = grid.lonlat()
    eps = 1e-4
    fE = tr.invtrans_unstructured(sp, ll + [eps, 0])
    fW = tr.invtrans_unstructured(sp, ll - [eps, 0])
    fN = tr.invtrans_unstructured(sp, ll + [0, eps])
    fS = tr.invtrans_unstructured(sp, ll - [0, eps])
    d2r = np.pi / 180.0
    coslat = np.cos(np.deg2rad(ll[:, 1]))
    ref_dx = (fE - fW) / (2 * eps * d2r) / (EARTH_RADIUS * coslat)
    ref_dy = (fN - fS) / (2 * eps * d2r) / EARTH_RADIUS
    scale = np.abs(ref_dx).max()
    np.testing.assert_allclose(dfdx, ref_dx, rtol=0, atol=1e-6 * scale)
    np.testing.assert_allclose(dfdy, ref_dy, rtol=0, atol=1e-6 * scale)


def test_fourstep_uniform_matches_gemm():
    # four-step GEMM FFT (fourier.py) == direct per-row GEMM synthesis on a
    # uniform grid (reference Fourier stage: TransLocal.cc:1104+)
    grid = Grid("F24")  # nx = 96 = 2^5 * 3, factorable
    T = 23
    tr_g = TransLocal(grid, T, dtype=np.float64, fourier="gemm")
    tr_f = TransLocal(grid, T, dtype=np.float64, fourier="fast")
    assert tr_f.fourier.kind == "fourstep"
    rng = np.random.default_rng(1)
    spec = rng.normal(size=(3, nspec2(T)))
    ms, _ = spectral_index(T)
    spec[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    a = np.asarray(tr_g.invtrans(spec))
    b = np.asarray(tr_f.invtrans(spec))
    np.testing.assert_allclose(b, a, atol=1e-11)


def test_fourstep_resample_reduced_matches_gemm():
    # reduced grid: uniform four-step synthesis + Kaiser-Bessel shift
    # resample == per-row-group GEMM (within the W=10 NUFFT kernel error
    # ~7e-7 relative, far below the f32 transform tolerance)
    grid = Grid("O16")
    T = 15
    tr_g = TransLocal(grid, T, dtype=np.float64, fourier="gemm")
    tr_f = TransLocal(grid, T, dtype=np.float64, fourier="fast")
    assert tr_f.fourier.kind == "resample"
    rng = np.random.default_rng(2)
    spec = rng.normal(size=(2, nspec2(T)))
    ms, _ = spectral_index(T)
    spec[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    a = np.asarray(tr_g.invtrans(spec))
    b = np.asarray(tr_f.invtrans(spec))
    scale = np.abs(a).max()
    assert np.abs(b - a).max() / scale < 3e-6


def test_fourstep_shifted_rows_phase():
    # shifted-lon grid (x0 != 0): the spectral phase rotation must survive
    # the four-step path
    grid = Grid("S24")  # shifted lon
    if float(np.abs(grid.xmin).max()) == 0.0:
        import pytest

        pytest.skip("grid has x0 == 0")
    T = 23
    tr_g = TransLocal(grid, T, dtype=np.float64, fourier="gemm")
    tr_f = TransLocal(grid, T, dtype=np.float64, fourier="fast")
    rng = np.random.default_rng(3)
    spec = rng.normal(size=(2, nspec2(T)))
    ms, _ = spectral_index(T)
    spec[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    a = np.asarray(tr_g.invtrans(spec))
    b = np.asarray(tr_f.invtrans(spec))
    scale = np.abs(a).max()
    assert np.abs(b - a).max() / scale < 3e-6


def test_resample_compact_kernel_matches_gemm():
    # mid-size reduced grid: the banded Pallas resample+compact kernel (in
    # interpret mode off-chip) against the direct per-row-group GEMM
    grid = Grid("O96")
    T = 95
    tr_g = TransLocal(grid, T, dtype=np.float32, fourier="gemm")
    tr_f = TransLocal(grid, T, dtype=np.float32, fourier="fast")
    assert tr_f.fourier.kind == "resample"
    rc = tr_f.fourier.resampler(2)
    assert len(rc.segments) >= 1, "no kernel band engaged"
    rng = np.random.default_rng(5)
    sp = rng.normal(size=(2, nspec2(T))).astype(np.float32)
    ms, _ = spectral_index(T)
    sp[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    a = np.asarray(tr_g.invtrans(sp))
    b = np.asarray(tr_f.invtrans(sp))
    scale = np.abs(a).max()
    assert np.abs(b - a).max() / scale < 5e-5

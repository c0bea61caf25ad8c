"""fvm Nabla operator validation vs analytic solid-body-rotation fields.

Mirrors reference src/tests/numerics/test_fvm_nabla_validation.cc:235-254 with
its exact error thresholds (Slat720x360, beta=90 deg, Earth radius).
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.fvm import FvmMethod, Nabla
from atlas_tpu.util.constants import EARTH_RADIUS
from atlas_tpu.util.functions import SolidBodyRotation


@pytest.fixture(scope="module")
def o32_method():
    return FvmMethod(Grid("O32"))


def test_gradient_of_constant_is_zero(o32_method):
    nabla = Nabla(o32_method)
    f = np.ones(o32_method.nb_nodes)
    grad = np.asarray(nabla.gradient(f))
    owned = o32_method.geometry.owned_mask
    assert np.abs(grad[owned]).max() < 1e-18


def test_gradient_linear_in_latitude(o32_method):
    # f = sin(lat): df/dy = cos(lat)/R, df/dx = 0
    g = o32_method.geometry
    lat = np.deg2rad(g.lonlat[:, 1])
    f = np.sin(lat)
    grad = np.asarray(Nabla(o32_method).gradient(f))
    owned = g.owned_mask
    ref_dfdy = np.cos(lat) / EARTH_RADIUS
    err = np.abs(grad[owned, 1] - ref_dfdy[owned])
    rel = err / np.abs(ref_dfdy[owned]).max()
    assert rel.max() < 2e-2  # O32 truncation error (worst at the polar row)
    assert np.median(rel) < 1e-3
    # zonal component should vanish up to truncation; divide out the 1/cos(lat)
    # metric amplification at the polar rows
    zonal = np.abs(grad[owned, 0] * np.cos(lat[owned]))
    assert zonal.max() < 2e-3 * np.abs(ref_dfdy).max()


def test_divergence_of_solid_body_is_tiny(o32_method):
    g = o32_method.geometry
    flow = SolidBodyRotation(beta=90.0, radius=EARTH_RADIUS)
    u, v = flow.wind(g.lonlat[:, 0], g.lonlat[:, 1])
    uv = np.stack([u, v], axis=-1)
    div = np.asarray(Nabla(o32_method).divergence(uv))
    owned = g.owned_mask
    # On the reduced O32 grid (dx != dy, triangles) the discrete divergence of
    # solid-body flow has truncation error concentrated at the polar rows; the
    # machine-exact cancellation the reference asserts holds only for regular
    # dx == dy grids (tested in test_nabla_validation_slat720x360).
    assert np.abs(div[owned]).max() < 5e-7
    lat = g.lonlat[:, 1]
    interior = owned & (np.abs(lat) < 80.0)
    assert np.abs(div[interior]).max() < 2e-8


def test_nabla_validation_slat720x360():
    """The reference acceptance thresholds, exactly."""
    grid = Grid("Slat720x360")
    method = FvmMethod(grid, radius=EARTH_RADIUS)
    g = method.geometry
    nabla = Nabla(method, metric_approach=0)

    lon = g.lonlat[:, 0]
    lat = g.lonlat[:, 1]
    flow = SolidBodyRotation(beta=90.0, radius=EARTH_RADIUS)
    u, v = flow.wind(lon, lat)
    f = flow.wind_magnitude_squared(lon, lat)
    ref_dfdx, ref_dfdy = flow.wind_magnitude_squared_gradient(lon, lat)
    ref_vor, ref_div = flow.vordiv(lon, lat)

    uv = np.stack([u, v], axis=-1)
    grad = np.asarray(nabla.gradient(f))
    div = np.asarray(nabla.divergence(uv))
    vor = np.asarray(nabla.curl(uv))

    owned = g.owned_mask
    n = owned.sum()

    def minmax_ok(err, bound, name):
        mn, mx = err[owned].min(), err[owned].max()
        assert mn > -bound and mx < bound, f"{name}: minmax ({mn}, {mx}) vs {bound}"

    def rms_ok(err, bound, name):
        rms = np.sqrt(np.sum(err[owned] ** 2) / n**2)
        assert rms < bound, f"{name}: rms {rms} vs {bound}"

    err_dfdx = grad[:, 0] - ref_dfdx
    err_dfdy = grad[:, 1] - ref_dfdy
    err_div = div - ref_div
    err_vor = vor - ref_vor

    # thresholds from test_fvm_nabla_validation.cc:235-254
    minmax_ok(err_dfdx, 1e-11, "dfdx")
    minmax_ok(err_dfdy, 1e-11, "dfdy")
    minmax_ok(err_div, 1e-16, "div")
    minmax_ok(err_vor, 1.5e-9, "vor")
    rms_ok(err_dfdx, 1e-14, "dfdx")
    rms_ok(err_dfdy, 1e-14, "dfdy")
    rms_ok(err_div, 5e-20, "div")
    rms_ok(err_vor, 5e-13, "vor")


def test_laplacian_of_harmonic(o32_method):
    # Laplacian of Y_n^m is -n(n+1)/R^2 Y_n^m
    from atlas_tpu.util.functions import real_spherical_harmonic

    g = o32_method.geometry
    n_, m_ = 4, 2
    f = real_spherical_harmonic(g.lonlat[:, 0], g.lonlat[:, 1], n_, m_)
    lap = np.asarray(Nabla(o32_method).laplacian(f))
    ref = -n_ * (n_ + 1) / EARTH_RADIUS**2 * f
    owned = o32_method.geometry.owned_mask
    # exclude polar-most rows where the discrete laplacian is least accurate
    lat = o32_method.geometry.lonlat[:, 1]
    sel = owned & (np.abs(lat) < 80.0)
    scale = np.abs(ref[sel]).max()
    err = np.abs(lap[sel] - ref[sel]) / scale
    assert np.median(err) < 0.02
    assert err.max() < 0.25


def test_gradient_with_levels(o32_method):
    g = o32_method.geometry
    lat = np.deg2rad(g.lonlat[:, 1])
    f = np.stack([np.sin(lat), 2 * np.sin(lat), np.cos(lat)], axis=-1)  # 3 levels
    grad = np.asarray(Nabla(o32_method).gradient(f))
    assert grad.shape == (g.nnodes, 3, 2)
    # level 1 = 2 * level 0
    np.testing.assert_allclose(grad[:, 1], 2 * grad[:, 0], rtol=1e-12)

"""Grid layer tests, mirroring reference src/tests/grid/test_grids.cc expectations."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.grid import (
    gaussian_latitudes_npole_spole,
    gaussian_quadrature_npole_spole,
)


def test_gaussian_latitudes_n32_golden():
    # Golden first latitudes of an N32 Gaussian distribution (64 latitudes),
    # cross-checked against published IFS F32 values.
    lats = gaussian_latitudes_npole_spole(64)
    assert len(lats) == 64
    assert abs(lats[0] - 87.8637988) < 1e-6
    assert abs(lats[1] - 85.0965269) < 1e-6
    assert abs(lats[31] - 1.3953069) < 1e-6
    # antisymmetric
    np.testing.assert_allclose(lats, -lats[::-1], atol=1e-13)
    # strictly decreasing
    assert (np.diff(lats) < 0).all()


def test_gaussian_quadrature_weights():
    lats, w = gaussian_quadrature_npole_spole(160)
    assert abs(w.sum() - 2.0) < 1e-13
    # integrate sin^2(lat) over sphere: integral of x^2 over [-1,1] = 2/3
    x = np.sin(np.deg2rad(lats))
    assert abs((w * x * x).sum() - 2.0 / 3.0) < 1e-13


def test_octahedral_grid():
    g = Grid("O32")
    assert g.ny == 64
    assert g.nx[0] == 20
    assert g.nx[31] == 20 + 4 * 31
    assert g.nx[32] == g.nx[31]  # symmetric
    assert g.nx[-1] == 20
    # size = 2 * sum(20 + 4j, j=0..31)
    assert g.size == 2 * sum(20 + 4 * j for j in range(32))
    ll = g.lonlat()
    assert ll.shape == (g.size, 2)
    assert abs(ll[0, 0] - 0.0) < 1e-14  # first point at lon 0
    assert abs(ll[0, 1] - 87.8637988) < 1e-6
    # last point of first row: 360 - 360/20
    assert abs(ll[19, 0] - (360.0 - 18.0)) < 1e-12


def test_regular_gaussian_grid():
    g = Grid("F16")
    assert g.ny == 32
    assert (g.nx == 64).all()
    assert g.size == 32 * 64
    assert not g.reduced


def test_lonlat_grids():
    g = Grid("L90x46")
    assert g.ny == 46
    assert (g.nx == 90).all()
    assert g.y[0] == 90.0 and g.y[-1] == -90.0

    g = Grid("L16")  # L<gauss>: nx=4N, ny=2N+1
    assert g.ny == 33
    assert (g.nx == 64).all()

    g = Grid("Slat720x360")
    assert g.ny == 360
    assert abs(g.y[0] - (90.0 - 0.25)) < 1e-13
    assert abs(g.y[-1] - (-90.0 + 0.25)) < 1e-13
    assert abs(g.xmin[0]) < 1e-13

    g = Grid("S32x16")
    assert abs(g.xmin[0] - 0.5 * 360.0 / 32) < 1e-13
    assert abs(g.y[0] - (90.0 - 90.0 / 16)) < 1e-13


def test_healpix_grid():
    g = Grid("H8")
    N = 8
    assert g.ny == 4 * N - 1
    assert g.size == 12 * N * N
    assert g.nx[0] == 4
    assert g.nx[2 * N - 1] == 4 * N
    assert abs(g.y[2 * N - 1]) < 1e-14
    assert abs(g.xmin[0] - 45.0) < 1e-14


def test_cubedsphere_grid():
    g = Grid("CS-LFR-4")
    assert g.size == 6 * 16
    ll = g.lonlat()
    assert ll.shape == (96, 2)
    # all points on the sphere, lat within bounds
    assert (np.abs(ll[:, 1]) <= 90.0).all()
    xyz = g.xyz()
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), 1.0, atol=1e-14)


def test_grid_index_roundtrip():
    g = Grid("O8")
    i, j = g.ij()
    np.testing.assert_array_equal(g.index(i, j), np.arange(g.size))
    i2, j2 = g.index2ij(np.arange(g.size))
    np.testing.assert_array_equal(i, i2)
    np.testing.assert_array_equal(j, j2)


def test_grid_spec_roundtrip():
    g = Grid("O8")
    g2 = Grid(g.spec())
    np.testing.assert_array_equal(g.nx, g2.nx)
    np.testing.assert_allclose(g.y, g2.y)
    assert g.uid() == g2.uid()


def test_unknown_grid_name():
    with pytest.raises(KeyError):
        Grid("X99")


def test_classic_n_grid_golden():
    """Grid("N48") uses the REAL IFS classic pl table — golden values typed
    from the reference grid/detail/pl/classic_gaussian/N48.cc (TL95)."""
    golden_n48 = [20, 25, 36, 40, 45, 50, 60, 60, 72, 75, 80, 90, 96, 100,
                  108, 120, 120, 120, 128, 135, 144, 144, 160, 160, 160, 160,
                  160, 180, 180, 180, 180, 180, 192, 192, 192, 192, 192, 192,
                  192, 192, 192, 192, 192, 192, 192, 192, 192, 192]
    g = Grid("N48")
    assert g.ny == 96
    np.testing.assert_array_equal(g.nx[:48], golden_n48)
    np.testing.assert_array_equal(g.nx[48:], golden_n48[::-1])  # symmetric
    assert g.size == 2 * sum(golden_n48)
    # N16 spot values (reference N16.cc, TL31)
    g16 = Grid("N16")
    np.testing.assert_array_equal(
        g16.nx[:6], [20, 27, 32, 40, 45, 48])
    # coordinates: row 0 starts at lon 0 with uniform spacing 360/nx
    ll = g.lonlat()
    np.testing.assert_allclose(ll[1, 0] - ll[0, 0], 360.0 / 20, atol=1e-12)


def test_classic_n_grid_synthesized_fallback():
    """Resolutions without a shipped IFS table synthesize a compatible grid."""
    from atlas_tpu.grid.classic_gaussian import classic_pl

    pl = classic_pl(20)  # not in the shipped set
    assert len(pl) == 40 and (pl > 0).all()
    import pytest

    with pytest.raises(ValueError):
        classic_pl(20, synthesized_ok=False)

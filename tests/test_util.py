import numpy as np

from atlas_tpu.util.config import Config
from atlas_tpu.util.geometry import (
    Rotation,
    lonlat_to_xyz,
    xyz_to_lonlat,
    great_circle_distance,
    unique_lonlat_microdeg,
)
from atlas_tpu.util.functions import SolidBodyRotation, vortex_rollup, real_spherical_harmonic
from atlas_tpu.util.constants import EARTH_RADIUS
from atlas_tpu.projection import Projection, MercatorProjection


def test_config_merge():
    c = Config(type="structured", halo=1) | Config(halo=2)
    assert c.get_int("halo") == 2
    assert c.get_str("type") == "structured"
    c2 = Config("halo", 3)
    assert c2.get_int("halo") == 3


def test_lonlat_xyz_roundtrip():
    rng = np.random.default_rng(0)
    ll = np.stack([rng.uniform(0, 360, 100), rng.uniform(-89.9, 89.9, 100)], axis=-1)
    back = xyz_to_lonlat(lonlat_to_xyz(ll))
    np.testing.assert_allclose(back, ll, atol=1e-9)


def test_great_circle_distance():
    # quarter circumference pole-to-equator
    d = great_circle_distance(np.array([0.0, 90.0]), np.array([0.0, 0.0]))
    assert abs(d - np.pi / 2 * EARTH_RADIUS) < 1e-6


def test_rotation_identity():
    r = Rotation()
    assert not r.rotated
    ll = np.array([[10.0, 20.0]])
    np.testing.assert_allclose(r.rotate(ll), ll)


def test_rotation_pole():
    # south pole moved to (0, -60): the rotated point (0, -90) maps to (0, -60)
    r = Rotation(south_pole=(0.0, -60.0))
    out = r.rotate(np.array([[0.0, -90.0]]))
    np.testing.assert_allclose(out[0, 1], -60.0, atol=1e-9)
    # roundtrip
    rng = np.random.default_rng(1)
    ll = np.stack([rng.uniform(0, 360, 50), rng.uniform(-80, 80, 50)], axis=-1)
    back = r.unrotate(r.rotate(ll))
    np.testing.assert_allclose(
        np.cos(np.deg2rad(back)), np.cos(np.deg2rad(ll)), atol=1e-9
    )


def test_solid_body_rotation():
    f = SolidBodyRotation(beta=0.0)
    u, v = f.wind(np.array([0.0, 90.0]), np.array([0.0, 45.0]))
    np.testing.assert_allclose(v, 0.0)
    np.testing.assert_allclose(u[0], 1.0)
    # divergence identically zero for solid-body flow
    np.testing.assert_allclose(f.divergence(np.array([10.0]), np.array([20.0])), 0.0, atol=1e-16)
    # beta=90: u = cos(x) sin(y), v = -sin(x)
    f90 = SolidBodyRotation(beta=90.0)
    u, v = f90.wind(np.array([30.0]), np.array([40.0]))
    np.testing.assert_allclose(u, np.cos(np.deg2rad(30)) * np.sin(np.deg2rad(40)), atol=1e-15)
    np.testing.assert_allclose(v, -np.sin(np.deg2rad(30)), atol=1e-15)


def test_vortex_rollup_range():
    lon = np.linspace(0, 360, 50)
    lat = np.linspace(-90, 90, 50)
    v = vortex_rollup(lon, lat, 0.5)
    assert np.isfinite(v).all()
    assert (v > -1.5).all() and (v < 3.5).all()


def test_spherical_harmonic():
    # Y_0^0 = 1/sqrt(4 pi)
    v = real_spherical_harmonic(np.array([12.0]), np.array([34.0]), 0, 0)
    np.testing.assert_allclose(v, 1.0 / np.sqrt(4 * np.pi))
    # Y_1^0 = sqrt(3/4pi) sin(lat)
    v = real_spherical_harmonic(np.array([0.0]), np.array([90.0]), 1, 0)
    np.testing.assert_allclose(v, np.sqrt(3 / (4 * np.pi)), atol=1e-12)


def test_unique_ids():
    lon = np.array([0.0, 360.0, 180.0])
    lat = np.array([10.0, 10.0, -20.0])
    ids = unique_lonlat_microdeg(lon, lat)
    assert ids[0] == ids[1]  # periodic wrap
    assert ids[0] != ids[2]


def test_mercator_roundtrip():
    p = Projection(Config(type="mercator", longitude0=10.0))
    assert isinstance(p, MercatorProjection)
    ll = np.array([[15.0, 30.0], [5.0, -45.0]])
    np.testing.assert_allclose(p.xy2lonlat(p.lonlat2xy(ll)), ll, atol=1e-9)


def test_option_helpers_compose():
    """option::levels | option::halo style composition (option/Options.h)."""
    from atlas_tpu.util import options

    c = options.levels(10) | options.halo(2) | options.datatype("float64")
    assert c["levels"] == 10 and c["halo"] == 2 and c["datatype"] == "float64"
    assert options.vector()["variables"] == 2
    assert options.global_(3)["global"] and options.global_(3)["owner"] == 3
    import numpy as np

    from atlas_tpu.util.constants import EARTH_RADIUS

    np.testing.assert_allclose(options.radius("Earth")["radius"], EARTH_RADIUS)

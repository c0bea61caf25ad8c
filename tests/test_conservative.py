"""ConvexSphericalPolygon + conservative remap tests.

Mirrors reference src/tests/util/test_convexsphericalpolygon.cc and
interpolation conservative tests.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.interpolation import Interpolation
from atlas_tpu.interpolation.conservative import cell_polygons
from atlas_tpu.util.spherical_polygon import (
    ConvexSphericalPolygon,
    polygon_area,
)
from atlas_tpu.util.functions import vortex_rollup


def test_octant_area():
    p = ConvexSphericalPolygon(np.array([[0.0, 0.0], [90.0, 0.0], [0.0, 90.0]]))
    assert abs(p.area() - np.pi / 2) < 1e-14


def test_small_quad_area():
    q = ConvexSphericalPolygon(np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float))
    assert abs(q.area() - np.deg2rad(1) ** 2) < 1e-7


def test_intersection():
    a = ConvexSphericalPolygon(np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float))
    b = ConvexSphericalPolygon(np.array([[1, 1], [3, 1], [3, 3], [1, 3]], dtype=float))
    inter = a.intersect(b)
    assert inter.size == 4
    assert abs(inter.area() - np.deg2rad(1) ** 2) < 1e-7
    # intersection area is symmetric
    assert abs(a.intersect(b).area() - b.intersect(a).area()) < 1e-15
    # disjoint -> empty
    c = ConvexSphericalPolygon(np.array([[10, 10], [12, 10], [12, 12], [10, 12]], dtype=float))
    assert a.intersect(c).area() == 0.0


@pytest.mark.parametrize("gname", ["S32x16", "O16", "CS-LFR-8"])
def test_cell_polygons_tile_sphere(gname):
    g = Grid(gname)
    verts, counts, centers = cell_polygons(g)
    areas = polygon_area(verts, counts)
    assert (areas > 0).all()
    np.testing.assert_allclose(areas.sum(), 4 * np.pi, rtol=1e-10)


def test_conservative_remap_cs_to_latlon():
    src = Grid("CS-LFR-16")
    tgt = Grid("S48x24")
    interp = Interpolation("conservative-spherical-polygon", src, tgt)
    np.testing.assert_allclose(interp.coverage, 1.0, atol=1e-12)
    ll = src.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    out = np.asarray(interp.execute(f))
    # conservation of the global integral
    sv, sc, _ = cell_polygons(src)
    tv, tc, _ = cell_polygons(tgt)
    I_src = (f * polygon_area(sv, sc)).sum()
    I_tgt = (out * polygon_area(tv, tc)).sum()
    assert abs(I_src - I_tgt) / abs(I_src) < 1e-8
    # pointwise error is first-order small
    tll = tgt.lonlat()
    ref = vortex_rollup(tll[:, 0], tll[:, 1], 0.5)
    assert np.abs(out - ref).mean() < 5e-3


def test_conservative_remap_latlon_to_gaussian():
    src = Grid("S64x32")
    tgt = Grid("O8")
    interp = Interpolation("conservative-spherical-polygon", src, tgt)
    np.testing.assert_allclose(interp.coverage, 1.0, atol=1e-10)
    ones = np.ones(src.size)
    np.testing.assert_allclose(np.asarray(interp.execute(ones)), 1.0, atol=1e-12)

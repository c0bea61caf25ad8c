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


def test_native_csp_matches_numpy():
    """Native csp.cc vs the vectorized numpy clipper on convex triangles.

    (Sutherland-Hodgman requires a convex clipper; the remap setup always
    fan-triangulates cells first, so triangles are the real workload.)
    """
    from atlas_tpu.interpolation.conservative import _star_triangulate
    from atlas_tpu.native import csp_intersect, _csp_intersect_py, _get_lib

    g = Grid("O8")
    verts, counts, centers = cell_polygons(g)
    tris, owner = _star_triangulate(verts, counts, centers)
    rng = np.random.default_rng(0)
    i = rng.integers(0, len(tris), 300)
    j = rng.integers(0, len(tris), 300)
    j[:150] = i[:150]  # self-pairs guarantee substantive overlaps
    three = np.full(300, 3, dtype=np.int64)
    a_n, c_n = csp_intersect(tris[i], three, tris[j], three)
    a_p, c_p = _csp_intersect_py(tris[i], three, tris[j], three)
    np.testing.assert_allclose(a_n, a_p, atol=1e-13)
    real = a_n > 1e-12  # degenerate slivers have sign-noise centroids
    np.testing.assert_allclose(c_n[real], c_p[real], atol=1e-9)
    assert real.sum() >= 140
    assert _get_lib() is not None, "native library failed to build"
    # self-intersection recovers the full triangle area
    allthree = np.full(len(tris), 3, dtype=np.int64)
    a_s, _ = csp_intersect(tris, allthree, tris, allthree)
    np.testing.assert_allclose(a_s, polygon_area(tris, allthree), atol=1e-13)


def test_first_moment_octant():
    """Exact first moment on the +x+y+z octant: symmetry gives M = (A/4,...)"""
    from atlas_tpu.util.spherical_polygon import polygon_first_moment

    tri = np.array([[[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]])
    M = polygon_first_moment(tri, np.array([3]))
    # \int x dA over the octant = pi/4 for each component
    np.testing.assert_allclose(M[0], np.pi / 4, atol=1e-14)


def test_conservative_second_order_linear_exact():
    """Order 2 reproduces exact cell averages of linear-in-xyz fields.

    The exact average of a.x over a target cell is (a . M)/area with M the
    polygon first moment; order 2 reconstructs it to O(h^2) while order 1
    carries an O(h) source-placement error.
    """
    from atlas_tpu.interpolation.conservative import (
        ConservativeSphericalPolygon, cell_polygons)
    from atlas_tpu.util.geometry import lonlat_to_xyz
    from atlas_tpu.util.spherical_polygon import polygon_first_moment

    src = Grid("S64x32")
    tgt = Grid("O12")
    n = np.array([0.3, -0.5, 0.8])
    f = lonlat_to_xyz(src.lonlat()) @ n
    tv, tc, _ = cell_polygons(tgt)
    avg_ref = (polygon_first_moment(tv, tc) @ n) / polygon_area(tv, tc)

    m2 = ConservativeSphericalPolygon(src, tgt, order=2)
    np.testing.assert_allclose(m2.coverage, 1.0, atol=1e-9)
    e2 = np.abs(np.asarray(m2.execute(f)) - avg_ref).max()
    m1 = ConservativeSphericalPolygon(src, tgt, order=1)
    e1 = np.abs(np.asarray(m1.execute(f)) - avg_ref).max()
    assert e2 < 0.25 * e1, (e1, e2)
    assert e2 < 2e-3, e2


def test_conservative_second_order_smooth_field():
    src = Grid("CS-LFR-16")
    tgt = Grid("S48x24")
    from atlas_tpu.interpolation.conservative import ConservativeSphericalPolygon

    ll = src.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    tll = tgt.lonlat()
    ref = vortex_rollup(tll[:, 0], tll[:, 1], 0.5)
    e1 = np.abs(np.asarray(ConservativeSphericalPolygon(src, tgt, 1).execute(f)) - ref).mean()
    e2 = np.abs(np.asarray(ConservativeSphericalPolygon(src, tgt, 2).execute(f)) - ref).mean()
    assert e2 < e1

"""Variable-resolution projection/grid + focus spacing.

Reference: projection/detail/VariableResolutionProjection.cc (Met Office LAM
stretching, tested by src/tests/projection/test_projection_variable_resolution.cc)
and grid/detail/spacing/FocusSpacing.cc.
"""

import numpy as np

from atlas_tpu import Grid
from atlas_tpu.grid.spacing import Spacing
from atlas_tpu.projection.projection import projection_factory
from atlas_tpu.util.config import Config

VR = {
    "type": "variable_resolution",
    "inner.dx": 0.5, "outer.dx": 1.0, "progression": 1.1,
    "inner.xmin": 10.0, "inner.xend": 20.0,
    "inner.ymin": 10.0, "inner.yend": 20.0,
    "outer.xmin": 0.0, "outer.xend": 30.0,
    "outer.ymin": 0.0, "outer.yend": 30.0,
    "rim_widthx": 4.0, "rim_widthy": 4.0,
}


def _proj(**over):
    cfg = dict(VR)
    cfg.update(over)
    t = cfg.pop("type")
    return projection_factory.build(t, Config(cfg))


def test_vr_identity_inside_inner_box():
    p = _proj()
    pts = np.array([[10.0, 10.0], [15.0, 12.5], [20.0, 20.0]])
    np.testing.assert_allclose(p.xy2lonlat(pts), pts, atol=1e-12)


def test_vr_monotone_and_invertible():
    p = _proj()
    t = np.linspace(0.0, 30.0, 601)
    pts = np.stack([t, t[::-1]], axis=-1)
    s = p.xy2lonlat(pts)
    assert (np.diff(s[:, 0]) > 0).all()
    assert (np.diff(s[:, 1]) < 0).all()
    np.testing.assert_allclose(p.lonlat2xy(s), pts, atol=1e-10)


def test_vr_rim_spacing_is_delta_outer():
    p = _proj()
    # the outermost rim intervals (index spacing delta_inner) map to
    # delta_outer-wide intervals
    x = np.array([0.0, 0.5, 1.0])
    s = p.xy2lonlat(np.stack([x, np.full(3, 15.0)], -1))[:, 0]
    np.testing.assert_allclose(np.diff(s), 1.0, atol=1e-10)


def test_vr_stretched_widths_geometric():
    p = _proj()
    # immediately outside the inner box widths grow by the adjusted ratio
    x = 20.0 + 0.5 * np.arange(4)
    s = p.xy2lonlat(np.stack([x, np.full(4, 15.0)], -1))[:, 0]
    w = np.diff(s)
    r = w[1:] / w[:-1]
    assert (r > 1.0).all() and (r < 1.2).all()
    assert w[0] > 0.5  # wider than delta_inner right away


def test_vr_ratio_one_is_identity():
    p = _proj(progression=1.0)
    pts = np.array([[3.0, 27.5], [29.0, 0.25]])
    np.testing.assert_allclose(p.xy2lonlat(pts), pts, atol=1e-14)


def test_regional_variable_resolution_grid():
    g = Grid(Config(type="regional_variable_resolution",
                    projection=Config(VR)))
    assert g.ny == 61 and int(g.nx[0]) == 61
    ll = g.lonlat()
    xy = g.xy()
    inner = ((xy[:, 0] >= 10) & (xy[:, 0] <= 20)
             & (xy[:, 1] >= 10) & (xy[:, 1] <= 20))
    np.testing.assert_allclose(ll[inner], xy[inner], atol=1e-12)
    # stretched outward: domain is wider in lon-lat than in index space
    assert ll[:, 0].max() > 40.0 and ll[:, 0].min() < -10.0


def test_rotated_variable_resolution():
    p = _proj(type="rotated_variable_resolution", north_pole=(-176.0, 40.0))
    s = p.xy2lonlat(np.array([[15.0, 15.0]]))
    # rotation moves the point; inverse recovers it
    np.testing.assert_allclose(p.lonlat2xy(s), [[15.0, 15.0]], atol=1e-9)


def test_focus_spacing():
    sp = Spacing.create(Config(type="focus", start=0.0, end=10.0, N=11,
                               focus_factor=2.0))
    v = np.asarray(sp)
    assert v[0] == 0.0 and v[-1] == 10.0
    assert (np.diff(v) > 0).all()
    # focus_factor > 1 concentrates points at the midpoint
    assert np.diff(v)[5] < np.diff(v)[0]
    # symmetric about the midpoint
    np.testing.assert_allclose(v + v[::-1], 10.0, atol=1e-12)

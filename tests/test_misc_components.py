"""Domains, KDTree, PolygonLocator, mesh actions, MeshBuilder, MultiField,
MissingValue."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.domain import Domain, GlobalDomain, RectangularDomain, ZonalBandDomain
from atlas_tpu.util.kdtree import IndexKDTree, PolygonLocator
from atlas_tpu.util.config import Config
from atlas_tpu.mesh import generate_mesh, build_edges
from atlas_tpu.mesh.actions import (
    build_cell_centres,
    build_mesh_from_arrays,
    build_node_to_cell_connectivity,
    build_statistics,
    build_xyz_field,
    hilbert_reorder_indices,
    reverse_cuthill_mckee_indices,
)
from atlas_tpu.field.multifield import MissingValue, MultiField


def test_domains():
    g = Domain()
    assert g.contains(123.0, 45.0)
    r = Domain(Config(type="rectangular", xmin=0, xmax=90, ymin=-10, ymax=10))
    assert isinstance(r, RectangularDomain)
    assert r.contains(45.0, 0.0) and not r.contains(180.0, 0.0)
    assert not r.contains_north_pole()
    z = Domain(Config(type="zonal_band", ymin=-30, ymax=30))
    assert z.contains(270.0, 0.0) and not z.contains(0.0, 60.0)


def test_kdtree():
    g = Grid("O8")
    tree = IndexKDTree(g.lonlat())
    pts = g.lonlat()[[7, 100]]
    payload, dist = tree.closest_points(pts, k=1)
    np.testing.assert_array_equal(payload.ravel(), [7, 100])
    assert dist.max() < 1e-12
    near = tree.closest_points_within_radius(pts[:1], radius_rad=0.2)
    assert 7 in near[0]


def test_polygon_locator():
    polys = [
        np.array([[0, 0], [90, 0], [90, 45], [0, 45]], float),
        np.array([[90, 0], [180, 0], [180, 45], [90, 45]], float),
    ]
    loc = PolygonLocator(polys)
    out = loc(np.array([[45.0, 20.0], [120.0, 10.0]]))
    np.testing.assert_array_equal(out, [0, 1])


def test_mesh_actions():
    g = Grid("O8")
    mesh = generate_mesh(g)
    mesh = build_edges(mesh, g)
    centres = build_cell_centres(mesh)
    assert centres.shape == (mesh.nb_cells, 2)
    xyz = build_xyz_field(mesh)
    np.testing.assert_allclose(np.linalg.norm(xyz, axis=1), 1.0, atol=1e-12)
    n2c = build_node_to_cell_connectivity(mesh)
    # every non-ghost node belongs to at least one cell
    owned = ~mesh.nodes.ghost
    assert ((n2c >= 0).sum(axis=1)[owned] > 0).all()
    stats = build_statistics(mesh)
    assert stats["edge_length_rad"]["min"] > 0


def test_reorderings():
    g = Grid("O8")
    mesh = generate_mesh(g)
    mesh = build_edges(mesh, g)
    ph = hilbert_reorder_indices(mesh)
    assert sorted(ph.tolist()) == list(range(mesh.nb_nodes))
    pr = reverse_cuthill_mckee_indices(mesh)
    assert sorted(pr.tolist()) == list(range(mesh.nb_nodes))
    # RCM reduces graph bandwidth vs identity
    e = mesh.edges.nodes
    inv = np.empty(mesh.nb_nodes, dtype=np.int64)
    inv[pr] = np.arange(mesh.nb_nodes)
    bw_orig = np.abs(e[:, 0].astype(int) - e[:, 1]).max()
    bw_rcm = np.abs(inv[e[:, 0]] - inv[e[:, 1]]).max()
    assert bw_rcm <= bw_orig


def test_mesh_builder():
    # two triangles forming a quad patch
    lons = np.array([0.0, 1.0, 1.0, 0.0])
    lats = np.array([0.0, 0.0, 1.0, 1.0])
    tris = np.array([[0, 1, 2], [0, 2, 3]])
    mesh = build_mesh_from_arrays(lons, lats, tri_nodes=tris)
    assert mesh.nb_nodes == 4 and mesh.nb_cells == 2
    from atlas_tpu.mesh import build_edges as be

    mesh = be(mesh)
    assert mesh.nb_edges == 5  # 4 boundary + 1 diagonal


def test_multifield():
    mf = MultiField(["u", "v", "t"], shape=(10, 3))
    mf.field("u").data[:] = 1.0
    assert mf.array[0].sum() == 30.0
    ifs = MultiField.create_ifs(["q", "o3"], nblk=4, nproma=8, nlev=5)
    assert ifs.array.shape == (4, 2, 5, 8)
    ifs["q"].data[:] = 2.0
    assert ifs.array[:, 0].sum() == 2.0 * 4 * 5 * 8


def test_missing_value():
    mv = MissingValue(value=-999.0)
    data = np.array([1.0, -999.0, np.nan, 3.0])
    np.testing.assert_array_equal(mv(data), [False, True, True, False])
    # interpolation weight masking renormalizes
    idx = np.array([[0, 1], [2, 3]])
    w = np.array([[0.5, 0.5], [0.5, 0.5]])
    w2 = mv.mask_interpolation_weights(idx, w, data)
    np.testing.assert_allclose(w2, [[1.0, 0.0], [0.0, 1.0]])


def test_legendre_cache_roundtrip(tmp_path, monkeypatch):
    """TransLocal Legendre tables cached to disk (reference LegendreCache)."""
    import numpy as np

    monkeypatch.setenv("ATLAS_TPU_CACHE_PATH", str(tmp_path))
    from atlas_tpu import Grid
    from atlas_tpu.trans import LegendreCacheCreator, TransLocal

    g = Grid("F16")
    creator = LegendreCacheCreator(g, 15)
    assert creator.supported()
    assert not creator.cache_exists()
    path = creator.create()
    assert creator.cache_exists()

    cold = TransLocal(g, 15, dtype=np.float64)
    warm = TransLocal(g, 15, dtype=np.float64, use_cache=True)
    np.testing.assert_array_equal(cold.P_compact, warm.P_compact)
    # bucketed device tables rebuilt from the cached compact table agree
    for tc, tw in zip(cold.legendre.tables, warm.legendre.tables):
        for a, b in zip(tc, tw):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_balance_report(tmp_path):
    from atlas_tpu import Grid
    from atlas_tpu.mesh import MeshGenerator
    from atlas_tpu.mesh.actions import write_load_balance_report

    mesh = MeshGenerator("structured").generate(Grid("O8"))
    out = tmp_path / "lb.txt"
    text = write_load_balance_report(mesh, str(out))
    assert out.exists()
    assert "nodes_owned" in text and "imbalance" in text

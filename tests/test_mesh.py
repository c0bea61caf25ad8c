"""Mesh generation tests: topology invariants, dual-mesh exactness, native zipper."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.mesh import (
    build_edges,
    build_median_dual_mesh,
    build_node_to_edge_connectivity,
    generate_mesh,
)
from atlas_tpu.mesh.structured import build_global_topology
from atlas_tpu.native import zip_rows, _zip_rows_py
from atlas_tpu.util.topology import Topology


@pytest.fixture(scope="module")
def o8_mesh():
    g = Grid("O8")
    m = generate_mesh(g)
    m = build_edges(m, g)
    m = build_node_to_edge_connectivity(m)
    m = build_median_dual_mesh(m)
    return g, m


def test_native_zipper_matches_python_fallback():
    rng = np.random.default_rng(0)
    for nN, nS in [(20, 24), (24, 20), (64, 64), (140, 144), (5, 17)]:
        xN = np.arange(nN + 1) * 360.0 / nN
        xS = np.arange(nS + 1) * 360.0 / nS
        k_native = zip_rows(xN, xS)
        k_py = _zip_rows_py(xN, xS, 0.0)
        np.testing.assert_array_equal(k_native, k_py)
        # every element advances; total advances = nN + nS
        adv = (k_native != 1).sum() + (k_native != 0).sum()
        assert adv == nN + nS


def test_zipper_aligned_rows_all_quads():
    x = np.arange(17) * 360.0 / 16
    k = zip_rows(x, x)
    assert (k == 2).all()
    assert len(k) == 16


def test_zipper_reduced_rows_mostly_triangles():
    # octahedral neighbours (20 vs 24): with angle=0 quads only where aligned
    xN = np.arange(21) * 360.0 / 20
    xS = np.arange(25) * 360.0 / 24
    k = zip_rows(xN, xS)
    assert (k == 2).sum() < 8
    assert len(k) == 20 + 24 - (k == 2).sum()


def test_global_topology_counts():
    g = Grid("O8")
    m = build_global_topology(g)
    # nodes = grid points + one periodic ghost per row
    assert m.nb_nodes == g.size + g.ny
    # every cell's nodes valid and within range
    cn = m.cells.nodes
    assert (cn[:, :3] >= 0).all()
    assert cn.max() < m.nb_nodes


def test_dual_volume_tiles_sphere(o8_mesh):
    g, m = o8_mesh
    dv = m.fields["dual_volumes"]
    owned = ~m.nodes.ghost
    # owned dual volumes tile the full (lon, lat) chart exactly
    np.testing.assert_allclose(dv[owned].sum(), 360.0 * 180.0, rtol=1e-14)
    assert (dv[owned] > 0).all()


def test_pole_edges(o8_mesh):
    g, m = o8_mesh
    pole = Topology.check(m.edges.flags, Topology.POLE)
    # nx=20 at both polar rows -> 10 pole edges each
    assert pole.sum() == 20
    pe = m.edges.nodes[pole]
    xy = m.nodes.xy
    # endpoints 180 degrees apart on the same latitude
    dx = np.abs(xy[pe[:, 0], 0] - xy[pe[:, 1], 0])
    np.testing.assert_allclose(dx, 180.0)
    np.testing.assert_allclose(xy[pe[:, 0], 1], xy[pe[:, 1], 1])


def test_edge_cell_consistency(o8_mesh):
    g, m = o8_mesh
    e = m.edges
    pole = Topology.check(e.flags, Topology.POLE)
    # non-pole edges have a left cell; pole edges have none
    assert (e.cells[~pole, 0] >= 0).all()
    assert (e.cells[pole] == -1).all()
    # an edge's nodes belong to its incident cells
    cn = m.cells.nodes
    for col in (0, 1):
        sel = np.flatnonzero(e.cells[:, col] >= 0)[:500]
        cells = cn[e.cells[sel, col]]
        for end in (0, 1):
            found = (cells == e.nodes[sel, end][:, None]).any(axis=1)
            assert found.all()


def test_node2edge_sign_convention(o8_mesh):
    g, m = o8_mesh
    n2e = m.fields["node2edge"]
    sign = m.fields["node2edge_sign"]
    en = m.edges.nodes
    pole = Topology.check(m.edges.flags, Topology.POLE)
    valid = n2e >= 0
    rows, cols = np.nonzero(valid)
    e = n2e[rows, cols]
    s = sign[rows, cols]
    is_origin = en[e, 0] == rows
    expect = np.where(is_origin | pole[e], 1.0, -1.0)
    np.testing.assert_array_equal(s, expect)


def test_owned_nodes_have_complete_rings(o8_mesh):
    """Every owned node's incident non-pole edges all have both cells, or are
    genuine polar boundary edges."""
    g, m = o8_mesh
    e = m.edges
    pole = Topology.check(e.flags, Topology.POLE)
    owned = ~m.nodes.ghost
    ymax, ymin = m.nodes.xy[:, 1].max(), m.nodes.xy[:, 1].min()
    ecy = m.fields["edge_y"].mean(axis=1)
    bdry_ok = (np.abs(ecy - ymax) < 1e-6) | (np.abs(ecy - ymin) < 1e-6)
    incomplete = (e.cells[:, 1] < 0) & ~pole & ~bdry_ok
    bad_edges = np.flatnonzero(incomplete)
    # incomplete edges may only touch ghost nodes
    touches_owned = owned[e.nodes[bad_edges]].any(axis=1)
    assert not touches_owned.any()

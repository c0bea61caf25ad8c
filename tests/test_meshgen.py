"""Mesh generator family tests.

Reference analogs: src/tests/mesh/test_meshgen*.cc,
test_cubedsphere_meshgen.cc, and the healpix/delaunay generator tests.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.functionspace import CubedSphereColumns
from atlas_tpu.interpolation import Interpolation
from atlas_tpu.mesh import MeshGenerator, meshgenerator_factory
from atlas_tpu.util.functions import vortex_rollup


def test_factory_names():
    for name in (
        "structured",
        "regular",
        "healpix",
        "delaunay",
        "cubedsphere",
        "nodal-cubedsphere",
        "cubedsphere_dual",
    ):
        assert meshgenerator_factory.has(name)


def test_cubedsphere_meshgen_topology():
    N = 8
    mesh = MeshGenerator("cubedsphere").generate(Grid(f"CS-LFR-{N}"))
    # closed quad sphere: V = 6N^2+2, F = 6N^2, E = 2F, Euler V-E+F = 2
    assert mesh.nb_nodes == 6 * N * N + 2
    assert mesh.nb_cells == 6 * N * N
    assert (mesh.cells.nodes >= 0).all()  # all quads
    # every node used
    assert len(np.unique(mesh.cells.nodes)) == mesh.nb_nodes
    # quad spherical areas sum to 4 pi (winding is consistent + outward)
    from atlas_tpu.util.spherical_polygon import polygon_area
    from atlas_tpu.util.geometry import lonlat_to_xyz

    xyz = lonlat_to_xyz(mesh.nodes.lonlat)
    verts = xyz[mesh.cells.nodes]  # (ncell, 4, 3)
    counts = np.full(mesh.nb_cells, 4)
    total = polygon_area(verts, counts).sum()
    assert abs(total - 4 * np.pi) < 1e-8


def test_delaunay_meshgen():
    grid = Grid("O16")
    mesh = MeshGenerator("delaunay").generate(grid)
    V, F = mesh.nb_nodes, mesh.nb_cells
    assert V == grid.size
    assert F == 2 * V - 4  # triangulated sphere
    assert (mesh.cells.nodes[:, 3] == -1).all()
    # orientation: outward normals
    from atlas_tpu.util.geometry import lonlat_to_xyz

    xyz = lonlat_to_xyz(mesh.nodes.lonlat)
    t = mesh.cells.nodes[:, :3].astype(int)
    a, b, c = xyz[t[:, 0]], xyz[t[:, 1]], xyz[t[:, 2]]
    assert (np.einsum("ij,ij->i", np.cross(b - a, c - a), a) > 0).all()


def test_healpix_meshgen():
    grid = Grid("H8")
    mesh = MeshGenerator("healpix").generate(grid)
    assert mesh.nb_nodes >= grid.size
    assert mesh.nb_cells > 0


def test_delaunay_finite_element_interp():
    """Delaunay mesh drives finite-element interpolation on an O-grid."""
    from atlas_tpu.interpolation.finite_element import FiniteElement

    grid = Grid("O32")
    mesh = MeshGenerator("delaunay").generate(grid)
    tgt = Grid("S32x16")
    fe = FiniteElement(mesh, tgt.lonlat())
    ll = grid.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    out = np.asarray(fe.execute(f))
    ref = vortex_rollup(tgt.lonlat()[:, 0], tgt.lonlat()[:, 1], 0.5)
    assert np.abs(out - ref).max() < 5e-2


def test_cubedsphere_columns():
    grid = Grid("CS-LFR-8")
    fs = CubedSphereColumns(grid, levels=3)
    f = fs.create_field("t")
    assert f.data.shape == (6, 8, 8, 3)
    flat = np.arange(fs.size, dtype=np.float64)
    tiles = fs.to_tiles(flat)
    assert tiles.shape == (6, 8, 8)
    np.testing.assert_array_equal(fs.to_flat(tiles), flat)
    t, j, i = fs.tji()
    assert len(t) == fs.size


def test_cubedsphere_bilinear():
    grid = Grid("CS-LFR-16")
    tgt = Grid("S64x32")
    interp = Interpolation("cubedsphere-bilinear", grid, tgt)
    ll = grid.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    out = np.asarray(interp.execute(f))
    tll = tgt.lonlat()
    ref = vortex_rollup(tll[:, 0], tll[:, 1], 0.5)
    assert np.abs(out - ref).max() < 5e-3
    # constants reproduced exactly (weights sum to 1 everywhere)
    np.testing.assert_allclose(
        np.asarray(interp.execute(np.ones(grid.size))), 1.0, atol=1e-12
    )


def test_healpix_mesh_generator():
    """Dedicated HEALPix diamond mesh (reference HealpixMeshGenerator.cc):
    12 N^2 + 8 all-quad cells, 8 pole nodes per pole, exact sphere tiling."""
    from atlas_tpu.util.geometry import lonlat_to_xyz
    from atlas_tpu.util.spherical_polygon import polygon_area

    for n in (2, 8):
        g = Grid(f"H{n}")
        m = MeshGenerator("healpix").generate(g)
        assert m.cells.size == 12 * n * n + 8
        assert (m.cells.nodes >= 0).all()  # all quads
        cn = m.cells.nodes.astype(np.int64)
        xyz = lonlat_to_xyz(m.nodes.lonlat)
        areas = polygon_area(xyz[cn], np.full(len(cn), 4))
        # diamonds are strictly positive; the 8 pole-cap quads are degenerate
        # in 3-D (unfolded-plane cells, as in the reference's 2-D mode)
        assert (areas[: g.size] > 0).all()
        np.testing.assert_allclose(areas.sum(), 4 * np.pi, rtol=1e-12)
        # pole nodes flagged BC, east ghosts periodic
        from atlas_tpu.util.topology import Topology

        assert (m.nodes.flags[:9] & Topology.BC).all()
        assert m.nodes.ghost.sum() == g.ny + 2


def test_healpix_pentagons_mode():
    """pole_elements="pentagons": 4 pole nodes, 8 pentagon cells, 12 N^2 total."""
    from atlas_tpu.util.geometry import lonlat_to_xyz
    from atlas_tpu.util.spherical_polygon import polygon_area

    g = Grid("H4")
    m = MeshGenerator("healpix", pole_elements="pentagons").generate(g)
    assert m.cells.size == 12 * 16
    npc = m.cells.nodes_per_cell
    assert (npc == 5).sum() == 8 and set(npc) == {4, 5}
    cn = m.cells.nodes.astype(np.int64)
    xyz = lonlat_to_xyz(m.nodes.lonlat)
    verts = np.where(cn[..., None] >= 0, xyz[np.maximum(cn, 0)], 0.0)
    areas = polygon_area(verts, npc)
    assert (areas > 0).all()
    np.testing.assert_allclose(areas.sum(), 4 * np.pi, rtol=1e-12)
    # edges builder handles pentagons
    from atlas_tpu.mesh.edges import build_edges

    build_edges(m)
    assert m.edges is not None and m.edges.size > 0


def test_generate_region_partitioned():
    """Per-part region meshes (StructuredMeshGenerator.cc:272): owned nodes
    partition the grid; every global cell with an owned corner appears in
    that part's mesh with identical corner coordinates."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.partition.distribution import Distribution
    from atlas_tpu.mesh.structured import (
        StructuredMeshGenerator, build_global_topology)

    grid = Grid("O16")
    dist = Distribution(grid, "equal_bands", nb_parts=4)
    gen = StructuredMeshGenerator()
    parts = gen.generate(grid, dist)
    assert len(parts) == 4

    # owned nodes across parts partition the grid exactly
    owned = np.concatenate([
        m.nodes.global_index[~m.nodes.ghost] for m in parts])
    assert len(owned) == grid.size
    assert len(np.unique(owned)) == grid.size

    # remote_index round-trips: the owner part's owned list at that rank is
    # the same grid point
    for m in parts:
        g = m.nodes.global_index
        q = m.nodes.partition
        r = m.nodes.remote_index
        for qq in np.unique(q):
            sel = q == qq
            q_owned = np.flatnonzero(dist.partition == qq)
            assert (q_owned[r[sel]] == g[sel]).all()

    # cell coverage: count global cells touching owned points of each part
    glob = build_global_topology(grid)
    gi = glob.nodes.global_index
    total_cells = 0
    for p, m in enumerate(parts):
        cn = glob.cells.nodes
        owner = np.where(cn >= 0, gi[np.maximum(cn, 0)], -1)
        touched = ((owner >= 0) & (dist.partition[np.maximum(owner, 0)] == p)
                   & (cn >= 0)).any(axis=1)
        assert m.nb_cells == touched.sum(), p
        total_cells += (~glob.cells.nodes[touched].min(axis=1) < 0).sum()

    # corner coordinates of a sample part match the global zipper
    m = parts[1]
    assert np.isfinite(m.fields["cell_corner_x"][m.cells.nodes >= 0]).all()

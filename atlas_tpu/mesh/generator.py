"""MeshGenerator factory and the non-structured generators.

Reference behavior: atlas meshgenerator/MeshGenerator.h (named factory) with
implementations in meshgenerator/detail/: "structured" (the workhorse),
"regular", "healpix" (HealpixMeshGenerator.cc:1095 — here the structured row
zipper already handles HEALPix's reduced rows), "cubedsphere"
(CubedSphereMeshGenerator.cc:993 — quads from the 6 gnomonic tiles),
"cubedsphere_dual" (CubedSphereDualMeshGenerator.cc:526), and "delaunay"
(DelaunayMeshGenerator.cc:379 — serial triangulation; the reference uses
CGAL/Qhull via BuildConvexHull3D; here scipy's qhull: the Delaunay
triangulation of points on a sphere IS their 3-D convex hull).
"""

from __future__ import annotations

import numpy as np

from ..util.factory import Factory
from ..util.geometry import lonlat_to_xyz, xyz_to_lonlat
from .mesh import Cells, Mesh, Nodes

meshgenerator_factory = Factory("meshgenerator")


def _nodes_from_lonlat(lonlat: np.ndarray) -> Nodes:
    n = len(lonlat)
    return Nodes(
        xy=lonlat.copy(),
        lonlat=lonlat.copy(),
        flags=np.zeros(n, dtype=np.int32),
        ghost=np.zeros(n, dtype=bool),
        global_index=np.arange(n, dtype=np.int64),
        remote_index=np.arange(n, dtype=np.int64),
        partition=np.zeros(n, dtype=np.int32),
        halo=np.zeros(n, dtype=np.int8),
    )


class DelaunayMeshGenerator:
    """Serial spherical Delaunay triangulation of any grid's points.

    The convex hull of points on the unit sphere is exactly their Delaunay
    triangulation (reference mesh/actions/BuildConvexHull3D.cc does the same
    with CGAL)."""

    def __init__(self, config=None, **kwargs):
        pass

    def generate(self, grid, distribution=None) -> Mesh:
        from scipy.spatial import ConvexHull

        lonlat = np.asarray(grid.lonlat(), dtype=np.float64)
        xyz = lonlat_to_xyz(lonlat)
        hull = ConvexHull(xyz)
        tri = hull.simplices.astype(np.int64)  # (ntri, 3)
        # orient triangles counterclockwise seen from outside (normal outward)
        a, b, c = xyz[tri[:, 0]], xyz[tri[:, 1]], xyz[tri[:, 2]]
        outward = np.einsum("ij,ij->i", np.cross(b - a, c - a), a) > 0
        tri[~outward] = tri[~outward][:, [0, 2, 1]]

        ncell = len(tri)
        cells = Cells(
            nodes=np.concatenate(
                [tri.astype(np.int32), np.full((ncell, 1), -1, dtype=np.int32)], axis=1
            ),
            flags=np.zeros(ncell, dtype=np.int32),
            halo=np.zeros(ncell, dtype=np.int8),
            global_index=np.arange(ncell, dtype=np.int64),
        )
        return Mesh(nodes=_nodes_from_lonlat(lonlat), cells=cells, metadata={"generator": "delaunay"})


class CubedSphereMeshGenerator:
    """Quad mesh of the 6 gnomonic tiles: nodes at cell corners, shared tile
    edges deduplicated, N^2 quads per tile (reference
    CubedSphereMeshGenerator.cc:993)."""

    def __init__(self, config=None, **kwargs):
        pass

    def generate(self, grid, distribution=None) -> Mesh:
        from ..grid.cubedsphere import CubedSphereGrid

        if not isinstance(grid, CubedSphereGrid):
            raise TypeError("cubedsphere mesh generator needs a CubedSphereGrid")
        N = grid.N
        flat = grid.corner_xyz().reshape(-1, 3)
        # dedup shared edge/corner nodes by quantized xyz key
        key = np.round(flat * 1e10).astype(np.int64)
        _, first, inverse = np.unique(
            key.view([("x", np.int64), ("y", np.int64), ("z", np.int64)]).ravel(),
            return_index=True,
            return_inverse=True,
        )
        xyz = flat[first]
        lonlat = xyz_to_lonlat(xyz)

        # quads per tile: (t, j, i) corners (j,i),(j,i+1),(j+1,i+1),(j+1,i)
        node_id = inverse.reshape(6, N + 1, N + 1)
        q0 = node_id[:, :-1, :-1].ravel()
        q1 = node_id[:, :-1, 1:].ravel()
        q2 = node_id[:, 1:, 1:].ravel()
        q3 = node_id[:, 1:, :-1].ravel()
        quads = np.stack([q0, q1, q2, q3], axis=1).astype(np.int32)
        # enforce counterclockwise orientation seen from outside
        a3, b3, c3 = xyz[quads[:, 0]], xyz[quads[:, 1]], xyz[quads[:, 2]]
        outward = np.einsum("ij,ij->i", np.cross(b3 - a3, c3 - a3), a3) > 0
        quads[~outward] = quads[~outward][:, ::-1]

        ncell = len(quads)
        cells = Cells(
            nodes=quads,
            flags=np.zeros(ncell, dtype=np.int32),
            halo=np.zeros(ncell, dtype=np.int8),
            global_index=np.arange(ncell, dtype=np.int64),
        )
        mesh = Mesh(
            nodes=_nodes_from_lonlat(lonlat),
            cells=cells,
            metadata={"generator": "cubedsphere", "N": N, "stagger": grid.stagger},
        )
        mesh.fields["xyz"] = xyz
        return mesh


class CubedSphereDualMeshGenerator:
    """Dual of the cubed-sphere mesh: nodes at CELL CENTRES (the grid points
    themselves), cells = quads connecting neighbouring centres, so fields live
    directly on grid points (reference CubedSphereDualMeshGenerator.cc:526)."""

    def __init__(self, config=None, **kwargs):
        pass

    def generate(self, grid, distribution=None) -> Mesh:
        from scipy.spatial import ConvexHull

        from ..grid.cubedsphere import CubedSphereGrid

        if not isinstance(grid, CubedSphereGrid):
            raise TypeError("cubedsphere_dual mesh generator needs a CubedSphereGrid")
        # centres cover the sphere without duplicates; their convex hull gives
        # the dual triangulation (quads across tile edges appear as triangle
        # pairs, which downstream consumers treat identically)
        lonlat = grid.lonlat()
        xyz = lonlat_to_xyz(lonlat)
        hull = ConvexHull(xyz)
        tri = hull.simplices.astype(np.int64)
        a, b, c = xyz[tri[:, 0]], xyz[tri[:, 1]], xyz[tri[:, 2]]
        outward = np.einsum("ij,ij->i", np.cross(b - a, c - a), a) > 0
        tri[~outward] = tri[~outward][:, [0, 2, 1]]
        ncell = len(tri)
        cells = Cells(
            nodes=np.concatenate(
                [tri.astype(np.int32), np.full((ncell, 1), -1, dtype=np.int32)], axis=1
            ),
            flags=np.zeros(ncell, dtype=np.int32),
            halo=np.zeros(ncell, dtype=np.int8),
            global_index=np.arange(ncell, dtype=np.int64),
        )
        return Mesh(
            nodes=_nodes_from_lonlat(lonlat),
            cells=cells,
            metadata={"generator": "cubedsphere_dual", "N": grid.N},
        )


def _register():
    from .structured import StructuredMeshGenerator

    meshgenerator_factory.register("structured", StructuredMeshGenerator)
    meshgenerator_factory.register("regular", StructuredMeshGenerator)
    from .healpix import HealpixMeshGenerator

    meshgenerator_factory.register("healpix", HealpixMeshGenerator)
    meshgenerator_factory.register("delaunay", DelaunayMeshGenerator)
    meshgenerator_factory.register("cubedsphere", CubedSphereMeshGenerator)
    meshgenerator_factory.register("nodal-cubedsphere", CubedSphereMeshGenerator)
    meshgenerator_factory.register("cubedsphere_dual", CubedSphereDualMeshGenerator)


_register()


def MeshGenerator(name: str = "structured", **config):
    """Named factory entry (reference MeshGenerator(type, config))."""
    return meshgenerator_factory.build(name, config or None)

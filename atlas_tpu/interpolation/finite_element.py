"""Finite-element interpolation on an unstructured mesh.

Reference behavior: atlas interpolation/method/unstructured/FiniteElement.cc:52
— locate the element containing each target point via a kd-tree search, then
use the element's shape-function (barycentric) weights.

Design: all cells are triangulated at setup; containment and weights use
central-projection barycentrics in 3-D (solve [A B C] lambda = P on the unit
sphere), which is chart-free (no periodic/seam special cases) and exactly the
spherical-triangle test. Vectorized numpy + cKDTree over triangle centroids.
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz
from .interpolation import Method, interpolation_factory


class FiniteElement(Method):
    def __init__(self, mesh, tgt_lonlat: np.ndarray, k_candidates: int = 12):
        from scipy.spatial import cKDTree

        tgt = np.asarray(tgt_lonlat, dtype=np.float64).reshape(-1, 2)
        ntgt = len(tgt)
        self.nsrc = mesh.nb_nodes

        # triangulate cells (quads -> 2 triangles)
        cn = mesh.cells.nodes
        quads = cn[cn[:, 3] >= 0]
        tris = cn[cn[:, 3] < 0][:, :3]
        tri_nodes = np.concatenate(
            [tris, quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]]
        ).astype(np.int64)

        xyz = lonlat_to_xyz(mesh.nodes.lonlat)
        A = xyz[tri_nodes[:, 0]]
        B = xyz[tri_nodes[:, 1]]
        C = xyz[tri_nodes[:, 2]]
        centroids = (A + B + C) / 3.0
        centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

        tree = cKDTree(centroids)
        P = lonlat_to_xyz(tgt)
        _, cand = tree.query(P, k=k_candidates)  # (ntgt, K)

        # batched barycentric solve: [A B C]^T lambda = P for each candidate
        M = np.stack(
            [A[cand], B[cand], C[cand]], axis=-1
        )  # (ntgt, K, 3 xyz, 3 corners)
        rhs = np.broadcast_to(P[:, None, :, None], M.shape[:-1] + (1,))
        lam = np.linalg.solve(M, rhs)[..., 0]  # (ntgt, K, 3)
        lam_min = lam.min(axis=-1)
        # pick the first candidate containing the point; fallback: best cover
        inside = lam_min >= -1e-10
        first_inside = np.where(
            inside.any(axis=1), inside.argmax(axis=1), lam_min.argmax(axis=1)
        )
        sel = cand[np.arange(ntgt), first_inside]
        lam_sel = lam[np.arange(ntgt), first_inside]
        lam_sel = np.maximum(lam_sel, 0.0)
        lam_sel /= lam_sel.sum(axis=1, keepdims=True)

        self.idx = tri_nodes[sel].astype(np.int32)
        self.w = lam_sel
        self.missed = ~inside.any(axis=1)


@interpolation_factory.register("finite-element")
def _fe(config, source, target):
    """source: a Mesh (or grid, meshed automatically); target: points/grid."""
    from ..mesh.mesh import Mesh
    from .structured import _target_points

    if not isinstance(source, Mesh):
        from ..mesh import generate_mesh
        from .unstructured import remap_to_grid

        grid = source
        source = generate_mesh(grid)
        return remap_to_grid(
            FiniteElement(source, _target_points(target)), source, grid.size
        )
    return FiniteElement(source, _target_points(target))

"""Unstructured bilinear interpolation in lon-lat.

Reference behavior: atlas interpolation/method/unstructured/
UnstructuredBilinearLonLat.cc — locate the element containing each target
point (kd-tree over element centroids + containment test) and use the
element's own shape functions: inverse-bilinear weights for quadrilaterals,
barycentric weights for triangles, both evaluated in (lon, lat).

Seam handling: candidate-element node longitudes are unwrapped to the target
longitude's branch before the 2-D solve (the mesh's periodic ghost elements
already cover the seam, so this only guards roundoff).
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz
from .interpolation import Method, interpolation_factory


def _inverse_bilinear(q, p, iters: int = 8):
    """Newton solve for (u, v) with  p = (1-u)(1-v) q0 + u(1-v) q1 + u v q2 + (1-u) v q3.

    q: (n, 4, 2) quad corners, p: (n, 2). Returns u, v in [0,1] if inside.
    """
    n = len(q)
    uv = np.full((n, 2), 0.5)
    a = q[:, 0]
    b = q[:, 1] - q[:, 0]
    c = q[:, 3] - q[:, 0]
    d = q[:, 2] - q[:, 1] - q[:, 3] + q[:, 0]
    for _ in range(iters):
        u, v = uv[:, 0], uv[:, 1]
        r = a + b * u[:, None] + c * v[:, None] + d * (u * v)[:, None] - p
        ju = b + d * v[:, None]  # dF/du (n, 2)
        jv = c + d * u[:, None]  # dF/dv
        det = ju[:, 0] * jv[:, 1] - ju[:, 1] * jv[:, 0]
        det = np.where(np.abs(det) < 1e-30, 1e-30, det)
        du = (r[:, 0] * jv[:, 1] - r[:, 1] * jv[:, 0]) / det
        dv = (ju[:, 0] * r[:, 1] - ju[:, 1] * r[:, 0]) / det
        uv[:, 0] -= du
        uv[:, 1] -= dv
    return uv[:, 0], uv[:, 1]


class UnstructuredBilinearLonLat(Method):
    def __init__(self, mesh, tgt_lonlat: np.ndarray, k_candidates: int = 8):
        from scipy.spatial import cKDTree

        tgt = np.asarray(tgt_lonlat, dtype=np.float64).reshape(-1, 2)
        ntgt = len(tgt)
        self.nsrc = mesh.nb_nodes

        cn = mesh.cells.nodes.astype(np.int64)  # (ncell, 4), -1 pad for tris
        ll = mesh.nodes.xy  # unwrapped grid coords (degrees)
        corners = np.where(cn >= 0, cn, cn[:, [0]])  # pad tris with node0
        cxy = ll[corners]  # (ncell, 4, 2)
        cent = lonlat_to_xyz(cxy.mean(axis=1))
        cent /= np.linalg.norm(cent, axis=1, keepdims=True)
        tree = cKDTree(cent)
        P = lonlat_to_xyz(tgt)
        _, cand = tree.query(P, k=min(k_candidates, len(cn)))
        if cand.ndim == 1:
            cand = cand[:, None]
        K = cand.shape[1]

        idx = np.zeros((ntgt, 4), dtype=np.int32)
        w = np.zeros((ntgt, 4))
        found = np.zeros(ntgt, dtype=bool)
        best_w = np.full(ntgt, -np.inf)
        for kk in range(K):
            todo = ~found
            if not todo.any():
                break
            t = np.flatnonzero(todo)
            cells = cand[t, kk]
            nodes = cn[cells]  # (m, 4)
            is_quad = nodes[:, 3] >= 0
            q = ll[np.where(nodes >= 0, nodes, nodes[:, [0]])].copy()  # (m,4,2)
            # unwrap longitudes to the target's branch
            lon_t = tgt[t, 0]
            q[..., 0] += 360.0 * np.round((lon_t[:, None] - q[..., 0]) / 360.0)
            p = np.stack([lon_t, tgt[t, 1]], axis=1)
            # quads: inverse bilinear
            u, v = _inverse_bilinear(q, p)
            wq = np.stack([(1 - u) * (1 - v), u * (1 - v), u * v, (1 - u) * v], axis=1)
            # triangles: barycentric on the first three corners
            A, B, C = q[:, 0], q[:, 1], q[:, 2]
            det = (B[:, 0] - A[:, 0]) * (C[:, 1] - A[:, 1]) - (B[:, 1] - A[:, 1]) * (
                C[:, 0] - A[:, 0]
            )
            det = np.where(np.abs(det) < 1e-30, 1e-30, det)
            l1 = ((p[:, 0] - A[:, 0]) * (C[:, 1] - A[:, 1]) - (p[:, 1] - A[:, 1]) * (C[:, 0] - A[:, 0])) / det
            l2 = ((B[:, 0] - A[:, 0]) * (p[:, 1] - A[:, 1]) - (B[:, 1] - A[:, 1]) * (p[:, 0] - A[:, 0])) / det
            wt = np.stack([1 - l1 - l2, l1, l2, np.zeros_like(l1)], axis=1)
            wk = np.where(is_quad[:, None], wq, wt)
            wmin = wk.min(axis=1)
            inside = wmin >= -1e-10
            better = wmin > best_w[t]
            take = inside | better
            sel = t[take]
            idx[sel] = np.where(nodes[take] >= 0, nodes[take], nodes[take][:, [0]])
            w[sel] = np.clip(wk[take], 0.0, None)
            best_w[t[better]] = wmin[better]
            found[t[inside]] = True
        w /= np.maximum(w.sum(axis=1, keepdims=True), 1e-300)
        self.idx = idx
        self.w = w
        self.missed = ~found


def remap_to_grid(method, mesh, grid_size: int):
    """Re-point stencil indices from mesh nodes to global grid points.

    Meshes carry periodic/pole ghost copies appended after the grid points;
    `nodes.global_index` maps every node (ghosts included) to its owning grid
    point, so grid-ordered source fields can be used directly (the reference
    reaches the same state via the halo exchange before the SpMM,
    interpolation/method/Method.cc:539)."""
    method.idx = mesh.nodes.global_index[method.idx].astype(np.int32)
    method.nsrc = grid_size
    return method


@interpolation_factory.register("unstructured-bilinear-lonlat")
def _ubl(config, source, target):
    from ..mesh.mesh import Mesh
    from .structured import _target_points

    if not isinstance(source, Mesh):
        from ..mesh import generate_mesh

        grid = source
        source = generate_mesh(grid)
        return remap_to_grid(
            UnstructuredBilinearLonLat(source, _target_points(target)),
            source,
            grid.size,
        )
    return UnstructuredBilinearLonLat(source, _target_points(target))

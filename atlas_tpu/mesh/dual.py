"""Median-dual mesh: dual_volumes on nodes, dual_normals on edges.

Reference behavior: atlas mesh/actions/BuildDualMesh.cc —
 - centroids of cells and edges are plain averages of corner xy (:141-166);
 - dual volume of a node = sum over (cell centroid, edge centroid, node)
   median triangles of incident cells (:168-210), patch cells skipped;
 - polar cap contributions: boundary edges (one incident cell) whose centroid
   sits on the mesh's extreme y add |(x_edge - x_node) * (±90 - y_node)| quads
   (:213-262);
 - dual normal of an edge = rotated difference of left/right cell centroids
   (yl - yr, xr - xl); boundary edges use the edge centroid with y snapped to
   ±90 as the "right" point; pole edges get (0, ±|x1 - x0|) from the two
   adjacent boundary-edge centroids (:265-343);
 - normals flipped to point from edge node 1 to node 2 (:345-369).

All computations vectorized on the unwrapped per-corner coordinates so that
periodic seam cells are geometrically correct.
"""

from __future__ import annotations

import numpy as np

from ..util.topology import Topology
from .mesh import Mesh


def build_median_dual_mesh(mesh: Mesh) -> Mesh:
    if mesh.metadata.get("median_dual_mesh"):
        return mesh
    edges = mesh.edges
    assert edges is not None, "build_edges must run before build_median_dual_mesh"
    cn = mesh.cells.nodes
    nnodes = mesh.nodes.size

    cx = mesh.fields["cell_corner_x"]
    cy = mesh.fields["cell_corner_y"]
    valid = cn >= 0
    npc = valid.sum(axis=1)
    cell_cx = np.nansum(np.where(valid, cx, 0.0), axis=1) / npc
    cell_cy = np.nansum(np.where(valid, cy, 0.0), axis=1) / npc

    ex = mesh.fields["edge_x"]
    ey = mesh.fields["edge_y"]
    edge_cx = ex.mean(axis=1)
    edge_cy = ey.mean(axis=1)

    is_pole_edge = Topology.check(edges.flags, Topology.POLE)
    is_patch = Topology.check(mesh.cells.flags, Topology.PATCH)

    # --- dual volumes: median triangles ------------------------------------
    # For every (cell, its edge, edge endpoint): triangle (cell centroid,
    # edge centroid, node). Enumerate via edge->cell connectivity: each edge
    # contributes to both incident cells and both endpoints.
    dual_volumes = np.zeros(nnodes)
    e_ids = np.arange(edges.size)
    for cell_col in (0, 1):
        cells_of_edge = edges.cells[:, cell_col]
        sel = (cells_of_edge >= 0) & ~is_pole_edge[e_ids]
        sel &= ~is_patch[np.maximum(cells_of_edge, 0)]
        es = np.flatnonzero(sel)
        cs = cells_of_edge[es]
        x0, y0 = cell_cx[cs], cell_cy[cs]
        x1, y1 = edge_cx[es], edge_cy[es]
        for end in (0, 1):
            nodes_id = edges.nodes[es, end]
            x2 = ex[es, end]
            y2 = ey[es, end]
            area = 0.5 * np.abs(x0 * (y1 - y2) + x1 * (y2 - y0) + x2 * (y0 - y1))
            dual_volumes += np.bincount(nodes_id, weights=area, minlength=nnodes)

    # --- polar cap quad contributions --------------------------------------
    ymax = mesh.nodes.xy[:, 1].max()
    ymin = mesh.nodes.xy[:, 1].min()
    tol = 1e-6
    is_bdry = (edges.cells[:, 0] >= 0) & (edges.cells[:, 1] < 0)
    near_n = is_bdry & (np.abs(edge_cy - ymax) < tol)
    near_s = is_bdry & (np.abs(edge_cy - ymin) < tol)
    for mask, y2 in ((near_n, 90.0), (near_s, -90.0)):
        es = np.flatnonzero(mask)
        for end in (0, 1):
            nodes_id = edges.nodes[es, end]
            x0 = ex[es, end]
            y0 = ey[es, end]
            quad_area = np.abs((edge_cx[es] - x0) * (y2 - y0))
            dual_volumes += np.bincount(nodes_id, weights=quad_area, minlength=nnodes)

    # --- dual normals -------------------------------------------------------
    dual_normals = np.zeros((edges.size, 2))
    left = edges.cells[:, 0]
    right = edges.cells[:, 1]
    interior = (left >= 0) & (right >= 0)
    dual_normals[interior, 0] = cell_cy[left[interior]] - cell_cy[right[interior]]
    dual_normals[interior, 1] = -cell_cx[left[interior]] + cell_cx[right[interior]]

    bdry = (left >= 0) & (right < 0)
    yr = edge_cy[bdry].copy()
    yr[np.abs(yr - ymax) < tol] = 90.0
    yr[np.abs(yr - ymin) < tol] = -90.0
    dual_normals[bdry, 0] = cell_cy[left[bdry]] - yr
    dual_normals[bdry, 1] = -cell_cx[left[bdry]] + edge_cx[bdry]

    # pole edges: (0, sign(y) * |x_west_bdry_centroid - x_east_bdry_centroid|)
    # where the two x's are the centroids of the node's two boundary edges.
    pole_ids = np.flatnonzero(is_pole_edge)
    if len(pole_ids):
        # for each boundary edge endpoint, record edge centroid x per node
        bx_sum = np.zeros(nnodes)
        bx_min = np.full(nnodes, np.inf)
        bx_max = np.full(nnodes, -np.inf)
        b_cnt = np.zeros(nnodes, dtype=np.int64)
        es = np.flatnonzero(near_n | near_s)
        for end in (0, 1):
            nid = edges.nodes[es, end]
            np.minimum.at(bx_min, nid, edge_cx[es])
            np.maximum.at(bx_max, nid, edge_cx[es])
            np.add.at(b_cnt, nid, 1)
        n1 = edges.nodes[pole_ids, 0]
        width = bx_max[n1] - bx_min[n1]
        y_node = mesh.nodes.xy[n1, 1]
        dual_normals[pole_ids, 0] = 0.0
        dual_normals[pole_ids, 1] = np.where(y_node > 0, width, -width)

    # --- flip outward: point from node 0 to node 1 (non-pole edges) ---------
    dx = ex[:, 1] - ex[:, 0]
    dy = ey[:, 1] - ey[:, 0]
    dot = dx * dual_normals[:, 0] + dy * dual_normals[:, 1]
    flip = (dot < 0) & (left >= 0)
    dual_normals[flip] *= -1.0

    mesh.fields["dual_volumes"] = dual_volumes
    mesh.fields["dual_normals"] = dual_normals
    mesh.fields["cell_centroids"] = np.stack([cell_cx, cell_cy], axis=-1)
    mesh.fields["edge_centroids"] = np.stack([edge_cx, edge_cy], axis=-1)
    mesh.metadata["median_dual_mesh"] = True
    return mesh

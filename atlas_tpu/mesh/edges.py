"""Edge construction: unique facets of cells, pole edges, node->edge tables.

Reference behavior: atlas mesh/actions/BuildEdges.cc — accumulate unique facets
from cells (AccumulateFacets.cc, PATCH cells skipped), create edge->node and
edge->cell connectivity, then add POLE 'Line' edges connecting antipodal point
pairs on the polar-most rows (:266-290, :469-510); node->edge connectivity at
:157. All vectorized here.

Edge conventions:
 - edges.nodes[e] = (a, b) in the traversal order of the first incident cell;
   with counterclockwise cell winding, edges.cells[e, 0] is the LEFT cell.
 - edges.cells[e, 1] == -1 for boundary edges; both == -1 for pole edges.
 - fields["edge_x"], fields["edge_y"]: (nedges, 2) unwrapped endpoint coords.
"""

from __future__ import annotations

import numpy as np

from ..util.topology import Topology
from .mesh import Edges, Mesh

_FACETS_QUAD = np.array([[0, 1], [1, 2], [2, 3], [3, 0]])
_FACETS_TRI = np.array([[0, 1], [1, 2], [2, 0]])


def build_edges(mesh: Mesh, grid=None) -> Mesh:
    cn = mesh.cells.nodes
    ncells = len(cn)
    npc = (cn >= 0).sum(axis=1)
    corner_x = mesh.fields.get("cell_corner_x")
    corner_y = mesh.fields.get("cell_corner_y")

    # facet lists (cell id, local corner a, local corner b), per vertex count
    facet_cell = []
    facet_a = []
    facet_b = []
    for c in np.unique(npc):
        facets = np.array([[i, (i + 1) % c] for i in range(c)])
        ids = np.flatnonzero(npc == c)
        if len(ids) == 0:
            continue
        k = len(facets)
        facet_cell.append(np.repeat(ids, k))
        facet_a.append(np.tile(facets[:, 0], len(ids)))
        facet_b.append(np.tile(facets[:, 1], len(ids)))
    fcell = np.concatenate(facet_cell)
    fa = np.concatenate(facet_a)
    fb = np.concatenate(facet_b)
    na = cn[fcell, fa]
    nb = cn[fcell, fb]

    lo = np.minimum(na, nb).astype(np.int64)
    hi = np.maximum(na, nb).astype(np.int64)
    key = lo * np.int64(mesh.nodes.size) + hi
    uniq, first_idx, inverse, counts = np.unique(
        key, return_index=True, return_inverse=True, return_counts=True
    )
    nedges = len(uniq)

    edge_nodes = np.stack([na[first_idx], nb[first_idx]], axis=-1).astype(np.int32)
    edge_cells = np.full((nedges, 2), -1, dtype=np.int32)
    edge_cells[:, 0] = fcell[first_idx]
    # second incident cell: for each duplicated key, the other facet's cell
    order = np.argsort(inverse, kind="stable")
    sorted_inverse = inverse[order]
    sorted_cell = fcell[order]
    # position of each facet within its edge group (0 or 1)
    group_start = np.searchsorted(sorted_inverse, np.arange(nedges))
    second_pos = group_start[np.flatnonzero(counts >= 2)] + 1
    edge_cells[counts >= 2, 1] = sorted_cell[second_pos]

    # unwrapped endpoint coordinates from the first incident cell
    if corner_x is not None:
        ex = np.stack(
            [corner_x[fcell[first_idx], fa[first_idx]], corner_x[fcell[first_idx], fb[first_idx]]],
            axis=-1,
        )
        ey = np.stack(
            [corner_y[fcell[first_idx], fa[first_idx]], corner_y[fcell[first_idx], fb[first_idx]]],
            axis=-1,
        )
    else:
        ex = mesh.nodes.xy[edge_nodes, 0]
        ey = mesh.nodes.xy[edge_nodes, 1]

    edge_flags = np.zeros(nedges, dtype=np.int32)
    edge_halo = np.maximum(
        mesh.cells.halo[edge_cells[:, 0]],
        np.where(edge_cells[:, 1] >= 0, mesh.cells.halo[np.maximum(edge_cells[:, 1], 0)], 0),
    ).astype(np.int8)

    # ---- pole edges -------------------------------------------------------
    pole_nodes_list = _pole_edge_pairs(mesh, grid)
    if len(pole_nodes_list):
        pe = np.asarray(pole_nodes_list, dtype=np.int32)
        npole = len(pe)
        pe_x = mesh.nodes.xy[pe, 0]
        pe_y = mesh.nodes.xy[pe, 1]
        edge_nodes = np.concatenate([edge_nodes, pe])
        edge_cells = np.concatenate([edge_cells, np.full((npole, 2), -1, dtype=np.int32)])
        edge_flags = np.concatenate(
            [edge_flags, np.full(npole, Topology.POLE, dtype=np.int32)]
        )
        edge_halo = np.concatenate([edge_halo, np.zeros(npole, dtype=np.int8)])
        ex = np.concatenate([ex, pe_x])
        ey = np.concatenate([ey, pe_y])

    mesh.edges = Edges(nodes=edge_nodes, cells=edge_cells, flags=edge_flags, halo=edge_halo)
    mesh.fields["edge_x"] = ex
    mesh.fields["edge_y"] = ey
    mesh.metadata["pole_edges"] = len(pole_nodes_list)
    return mesh


def _pole_edge_pairs(mesh: Mesh, grid) -> np.ndarray:
    """Antipodal pairs on the polar-most rows (BuildEdges.cc:266-290).

    Connect each non-ghost node at the max (min) latitude to the node of the
    same row at longitude + 180; requires even row length (true for Gaussian,
    HEALPix polar rows have 4r points).
    """
    if grid is None or not mesh.metadata.get("periodic", True):
        return np.empty((0, 2), dtype=np.int32)
    if np.isclose(grid.y[0], 90.0) or np.isclose(abs(grid.y[-1]), 90.0):
        return np.empty((0, 2), dtype=np.int32)  # grid touches poles: no pole edges
    pairs = []
    for jrow in (0, grid.ny - 1):
        nxr = int(grid.nx[jrow])
        if nxr % 2 != 0:
            continue
        off = int(grid.row_offset[jrow])
        half = nxr // 2
        i = np.arange(half)
        pairs.append(np.stack([off + i, off + i + half], axis=-1))
    if not pairs:
        return np.empty((0, 2), dtype=np.int32)
    return np.concatenate(pairs)


def build_node_to_edge_connectivity(mesh: Mesh) -> Mesh:
    """Padded node->edge table + signs (reference: BuildEdges.cc:157 and
    fvm/Method.cc:95-118 for node2edge_sign).

    Produces fields:
      node2edge      (nnodes, maxcols) int32, -1 padded, edges sorted ascending
      node2edge_sign (nnodes, maxcols) float64: +1 where node is edge origin,
                     else -1, except POLE edges where the far node also gets +1
    """
    edges = mesh.edges
    nnodes = mesh.nodes.size
    nedges = edges.size
    e_ids = np.arange(nedges, dtype=np.int64)
    node_of = np.concatenate([edges.nodes[:, 0], edges.nodes[:, 1]]).astype(np.int64)
    edge_of = np.concatenate([e_ids, e_ids])
    end_of = np.concatenate([np.zeros(nedges, np.int8), np.ones(nedges, np.int8)])

    order = np.lexsort((edge_of, node_of))
    node_s = node_of[order]
    edge_s = edge_of[order]
    end_s = end_of[order]

    counts = np.bincount(node_s, minlength=nnodes)
    maxcols = int(counts.max()) if nnodes else 0
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    col = np.arange(len(node_s)) - starts[node_s]

    node2edge = np.full((nnodes, maxcols), -1, dtype=np.int32)
    node2edge[node_s, col] = edge_s
    sign = np.zeros((nnodes, maxcols))
    is_pole = Topology.check(edges.flags[edge_s], Topology.POLE)
    s = np.where((end_s == 0) | is_pole, 1.0, -1.0)
    sign[node_s, col] = s

    mesh.fields["node2edge"] = node2edge
    mesh.fields["node2edge_sign"] = sign
    mesh.fields["node2edge_count"] = counts.astype(np.int32)
    return mesh

"""Mesh actions (reference: atlas mesh/actions/*).

Implemented: BuildCellCentres, BuildXYZField, BuildNode2CellConnectivity,
BuildStatistics, ReorderHilbert / ReorderReverseCuthillMckee, and MeshBuilder
(import an externally-defined mesh from raw arrays, mesh/MeshBuilder.h:39-64).
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz
from ..util.topology import Topology
from .mesh import Cells, Edges, Mesh, Nodes


def build_cell_centres(mesh: Mesh) -> np.ndarray:
    """(ncells, 2) cell centroids in unwrapped xy (BuildCellCentres.cc)."""
    cx = mesh.fields["cell_corner_x"]
    cy = mesh.fields["cell_corner_y"]
    valid = mesh.cells.nodes >= 0
    npc = valid.sum(axis=1)
    out = np.stack(
        [
            np.nansum(np.where(valid, cx, 0.0), axis=1) / npc,
            np.nansum(np.where(valid, cy, 0.0), axis=1) / npc,
        ],
        axis=-1,
    )
    mesh.fields["cell_centres"] = out
    return out


def build_xyz_field(mesh: Mesh) -> np.ndarray:
    """Unit-sphere cartesian node coordinates (BuildXYZField.cc)."""
    xyz = lonlat_to_xyz(mesh.nodes.lonlat)
    mesh.fields["xyz"] = xyz
    return xyz


def build_node_to_cell_connectivity(mesh: Mesh):
    """Padded node->cell table (BuildNode2CellConnectivity.cc)."""
    cn = mesh.cells.nodes
    valid = cn >= 0
    node_of = cn[valid].astype(np.int64)
    cell_of = np.broadcast_to(
        np.arange(len(cn))[:, None], cn.shape
    )[valid].astype(np.int64)
    order = np.lexsort((cell_of, node_of))
    node_s, cell_s = node_of[order], cell_of[order]
    counts = np.bincount(node_s, minlength=mesh.nodes.size)
    maxcols = int(counts.max()) if len(counts) else 0
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    col = np.arange(len(node_s)) - starts[node_s]
    table = np.full((mesh.nodes.size, maxcols), -1, dtype=np.int32)
    table[node_s, col] = cell_s
    mesh.fields["node2cell"] = table
    return table


def build_statistics(mesh: Mesh) -> dict:
    """Mesh quality statistics (BuildStatistics.cc): edge lengths, cell areas."""
    stats = {}
    if mesh.edges is not None:
        ex = mesh.fields["edge_x"]
        ey = mesh.fields["edge_y"]
        a = lonlat_to_xyz(np.stack([ex[:, 0], ey[:, 0]], -1))
        b = lonlat_to_xyz(np.stack([ex[:, 1], ey[:, 1]], -1))
        d = np.linalg.norm(a - b, axis=-1)
        arc = 2 * np.arcsin(np.clip(d / 2, 0, 1))
        stats["edge_length_rad"] = {
            "min": float(arc.min()),
            "max": float(arc.max()),
            "mean": float(arc.mean()),
        }
    if "dual_volumes" in mesh.fields:
        dv = mesh.fields["dual_volumes"][~mesh.nodes.ghost]
        stats["dual_volume"] = {
            "min": float(dv.min()),
            "max": float(dv.max()),
            "ratio": float(dv.max() / dv.min()),
        }
    mesh.metadata["statistics"] = stats
    return stats


# ---------------------------------------------------------------------------
# reordering (reference mesh/actions/Reorder.h: "hilbert", "reverse_cuthill_mckee")


def hilbert_reorder_indices(mesh: Mesh, bits: int = 16) -> np.ndarray:
    """Node permutation along a Hilbert curve in the (x, y) chart
    (ReorderHilbert.cc) — improves stencil locality for cache/VMEM reuse."""
    xy = mesh.nodes.xy
    x = xy[:, 0]
    y = xy[:, 1]
    nx = ((x - x.min()) / max(np.ptp(x), 1e-12) * (2**bits - 1)).astype(np.uint64)
    ny_ = ((y - y.min()) / max(np.ptp(y), 1e-12) * (2**bits - 1)).astype(np.uint64)
    d = _hilbert_d(nx.copy(), ny_.copy(), bits)
    return np.argsort(d, kind="stable")


def _hilbert_d(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized xy -> Hilbert distance (standard bit-twiddling transform)."""
    rx = np.zeros_like(x)
    ry = np.zeros_like(y)
    d = np.zeros_like(x)
    s = np.uint64(2 ** (bits - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = x[flip]
        y_f = y[flip]
        x[flip] = s - 1 - x_f
        y[flip] = s - 1 - y_f
        x_s = x[swap].copy()
        x[swap] = y[swap]
        y[swap] = x_s
        s = np.uint64(s // 2)
    return d


def reverse_cuthill_mckee_indices(mesh: Mesh) -> np.ndarray:
    """RCM node permutation from the edge graph (ReorderReverseCuthillMckee)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    if mesh.edges is None:
        raise ValueError("build_edges first")
    e = mesh.edges.nodes
    n = mesh.nodes.size
    a = sp.coo_matrix(
        (np.ones(2 * len(e)), (np.concatenate([e[:, 0], e[:, 1]]), np.concatenate([e[:, 1], e[:, 0]]))),
        shape=(n, n),
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(a))


# ---------------------------------------------------------------------------
# MeshBuilder: external mesh import (reference mesh/MeshBuilder.h:39-64)


def build_mesh_from_arrays(
    lons: np.ndarray,
    lats: np.ndarray,
    ghost: np.ndarray | None = None,
    global_index: np.ndarray | None = None,
    partition: np.ndarray | None = None,
    tri_nodes: np.ndarray | None = None,
    quad_nodes: np.ndarray | None = None,
) -> Mesh:
    """Assemble a Mesh from raw externally-partitioned arrays."""
    n = len(lons)
    lonlat = np.stack([np.asarray(lons, np.float64), np.asarray(lats, np.float64)], -1)
    ghost = np.zeros(n, bool) if ghost is None else np.asarray(ghost, bool)
    flags = np.where(ghost, Topology.GHOST, 0).astype(np.int32)
    gidx = np.arange(n) if global_index is None else np.asarray(global_index)
    part = np.zeros(n, np.int32) if partition is None else np.asarray(partition, np.int32)

    cells = []
    if quad_nodes is not None and len(quad_nodes):
        cells.append(np.asarray(quad_nodes, np.int32))
    if tri_nodes is not None and len(tri_nodes):
        t = np.asarray(tri_nodes, np.int32)
        cells.append(np.concatenate([t, np.full((len(t), 1), -1, np.int32)], axis=1))
    cn = np.concatenate(cells) if cells else np.zeros((0, 4), np.int32)

    nodes = Nodes(
        xy=lonlat.copy(),
        lonlat=lonlat,
        flags=flags,
        ghost=ghost,
        global_index=gidx.astype(np.int64),
        remote_index=np.arange(n, dtype=np.int64),
        partition=part,
        halo=np.zeros(n, np.int8),
    )
    cells_obj = Cells(
        nodes=cn,
        flags=np.zeros(len(cn), np.int32),
        halo=np.zeros(len(cn), np.int8),
        global_index=np.arange(len(cn), dtype=np.int64),
    )
    mesh = Mesh(nodes=nodes, cells=cells_obj)
    mesh.metadata["periodic"] = False
    valid = cn >= 0
    corner_x = np.where(valid, lonlat[np.maximum(cn, 0), 0], np.nan)
    corner_y = np.where(valid, lonlat[np.maximum(cn, 0), 1], np.nan)
    mesh.fields["cell_corner_x"] = corner_x
    mesh.fields["cell_corner_y"] = corner_y
    mesh.fields["cell_row"] = np.zeros(len(cn), np.int32)
    return mesh


def write_load_balance_report(mesh: Mesh, path=None) -> str:
    """Per-partition owned/ghost node and element counts.

    Reference: mesh/actions/WriteLoadBalanceReport.cc — a table of nodes
    (owned, ghost, total) and elements per partition, plus imbalance ratios.
    Returns the report text; writes it to `path` when given.
    """
    import io as _io

    part = np.asarray(mesh.nodes.partition)
    ghost = np.asarray(mesh.nodes.ghost, dtype=bool)
    nparts = int(part.max()) + 1 if len(part) else 1
    owned = np.bincount(part[~ghost], minlength=nparts)
    ghosts = np.bincount(part[ghost], minlength=nparts) if ghost.any() else np.zeros(nparts, int)

    cells_per = None
    if getattr(mesh, "cells", None) is not None and len(getattr(mesh.cells, "node_connectivity", [])):
        conn = np.asarray(mesh.cells.node_connectivity)
        first = conn[:, 0]
        cells_per = np.bincount(part[first], minlength=nparts)

    buf = _io.StringIO()
    buf.write("# load balance report\n")
    buf.write(f"# partitions: {nparts}\n")
    header = f"{'part':>6} {'nodes_owned':>12} {'nodes_ghost':>12}"
    if cells_per is not None:
        header += f" {'cells':>10}"
    buf.write(header + "\n")
    for p in range(nparts):
        line = f"{p:>6} {owned[p]:>12} {ghosts[p]:>12}"
        if cells_per is not None:
            line += f" {cells_per[p]:>10}"
        buf.write(line + "\n")
    mean = owned.mean() if nparts else 0.0
    imb = owned.max() / mean if mean > 0 else 1.0
    buf.write(f"# node imbalance (max/mean): {imb:.4f}\n")
    text = buf.getvalue()
    if path is not None:
        with open(path, "w") as f:
            f.write(text)
    return text

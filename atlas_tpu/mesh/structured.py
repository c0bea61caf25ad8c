"""Structured mesh generation, fully vectorized.

Reference behavior: atlas meshgenerator/detail/StructuredMeshGenerator.cc —
quads + triangles zipped between latitude rows, periodic ghost points at the
east boundary, pole handling via pole edges (patch cells are excluded from all
fvm machinery, AccumulateFacets.cc:98, BuildDualMesh.cc:190, so we do not
create them).

Design (TPU-first, not a translation):
 - The element "zipper" between two rows is computed as a vectorized sorted
   merge of the two rows' x-subdivisions: an aligned pair of positions makes a
   quad; otherwise the row whose next position comes first advances with a
   triangle. This reproduces the reference's angle=0 decision rule (quads where
   exactly aligned, else triangles by cross-distance) without a per-point loop.
 - One periodic ghost node per row at x = xmin + 360 closes the zipper
   (reference three_dimensional=false path).
 - `extend_periodic_west` replicates the seam cells as west-side images so
   every owned node has a complete cell ring (the serial specialization of
   mesh/actions/BuildHalo.cc's periodic transform, :1287).
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from ..util.topology import Topology
from .mesh import Cells, Mesh, Nodes

_QUANT = 1e-8  # degrees; tolerance for "exactly aligned" positions


def _zip_row_pair(xN, xS, idsN, idsS):
    """Elements between a north row and a south row.

    xN, xS: ascending x positions (nN+1 / nS+1 values, last one the periodic
    wrap); idsN, idsS: node ids of those positions. The element-kind sequence
    comes from the native zipper implementing the reference decision rules
    (StructuredMeshGenerator.cc:464-640); node-id/coordinate assembly is
    vectorized here.
    """
    from ..native import zip_rows

    kind = zip_rows(xN, xS)

    advN = (kind != 1).astype(np.int64)
    advS = (kind != 0).astype(np.int64)
    iN = np.cumsum(advN) - advN  # state before each event
    iS = np.cumsum(advS) - advS

    n_elem = len(kind)
    nodes = np.full((n_elem, 4), -1, dtype=np.int64)
    ex = np.full((n_elem, 4), np.nan)
    ey_row = np.full((n_elem, 4), -1, dtype=np.int8)  # 0 = north row, 1 = south row

    # quad: (N1, S1, S2, N2) — counterclockwise in (x, y)
    q = kind == 2
    nodes[q, 0] = idsN[iN[q]]
    nodes[q, 1] = idsS[iS[q]]
    nodes[q, 2] = idsS[iS[q] + 1]
    nodes[q, 3] = idsN[iN[q] + 1]
    ex[q, 0] = xN[iN[q]]
    ex[q, 1] = xS[iS[q]]
    ex[q, 2] = xS[iS[q] + 1]
    ex[q, 3] = xN[iN[q] + 1]
    ey_row[q] = [0, 1, 1, 0]

    # N-advance triangle: (N1, S1, N2)
    tn = kind == 0
    nodes[tn, 0] = idsN[iN[tn]]
    nodes[tn, 1] = idsS[iS[tn]]
    nodes[tn, 2] = idsN[iN[tn] + 1]
    ex[tn, 0] = xN[iN[tn]]
    ex[tn, 1] = xS[iS[tn]]
    ex[tn, 2] = xN[iN[tn] + 1]
    ey_row[tn, :3] = [0, 1, 0]

    # S-advance triangle: (N1, S1, S2)
    ts = kind == 1
    nodes[ts, 0] = idsN[iN[ts]]
    nodes[ts, 1] = idsS[iS[ts]]
    nodes[ts, 2] = idsS[iS[ts] + 1]
    ex[ts, 0] = xN[iN[ts]]
    ex[ts, 1] = xS[iS[ts]]
    ex[ts, 2] = xS[iS[ts] + 1]
    ey_row[ts, :3] = [0, 1, 1]

    return nodes, ex, ey_row


def build_global_topology(grid) -> Mesh:
    """Global periodic mesh of a structured grid with one east ghost per row."""
    ny = grid.ny
    nx = grid.nx
    size = grid.size
    row_offset = grid.row_offset

    periodic = bool(getattr(grid, "periodic_x", True))

    # --- nodes: grid points + one periodic ghost per row (if periodic) -----
    i, j = grid.ij()
    x_owned = grid.x(i, j)
    y_owned = grid.y[j]
    if periodic:
        ghost_id0 = size
        n_nodes = size + ny
        x_ghost = grid.xmin + 360.0
        y_ghost = grid.y
        xy = np.empty((n_nodes, 2))
        xy[:size, 0] = x_owned
        xy[:size, 1] = y_owned
        xy[size:, 0] = x_ghost
        xy[size:, 1] = y_ghost
        flags = np.zeros(n_nodes, dtype=np.int32)
        flags[size:] = Topology.GHOST | Topology.PERIODIC
        global_index = np.empty(n_nodes, dtype=np.int64)
        global_index[:size] = np.arange(size)
        global_index[size:] = row_offset[:-1]  # owner = first point of row
        remote_index = global_index.copy()
    else:
        n_nodes = size
        xy = np.stack([x_owned, y_owned], axis=-1)
        flags = np.zeros(n_nodes, dtype=np.int32)
        global_index = np.arange(size, dtype=np.int64)
        remote_index = global_index.copy()

    # --- cells: zipper between each row pair -------------------------------
    cell_nodes_list = []
    cell_x_list = []
    cell_yrow_list = []
    rows_of_pairs = []
    for jr in range(ny - 1):
        nN, nS = int(nx[jr]), int(nx[jr + 1])
        if nN == 0 or nS == 0:
            continue
        if periodic:
            xN = grid.xmin[jr] + np.arange(nN + 1) * grid.dx[jr]
            xS = grid.xmin[jr + 1] + np.arange(nS + 1) * grid.dx[jr + 1]
            idsN = np.concatenate(
                [np.arange(row_offset[jr], row_offset[jr] + nN), [ghost_id0 + jr]]
            )
            idsS = np.concatenate(
                [np.arange(row_offset[jr + 1], row_offset[jr + 1] + nS), [ghost_id0 + jr + 1]]
            )
        else:
            xN = grid.xmin[jr] + np.arange(nN) * grid.dx[jr]
            xS = grid.xmin[jr + 1] + np.arange(nS) * grid.dx[jr + 1]
            idsN = np.arange(row_offset[jr], row_offset[jr] + nN)
            idsS = np.arange(row_offset[jr + 1], row_offset[jr + 1] + nS)
        nodes_e, ex, eyrow = _zip_row_pair(xN, xS, idsN, idsS)
        cell_nodes_list.append(nodes_e)
        cell_x_list.append(ex)
        cell_yrow_list.append(
            np.where(eyrow < 0, np.nan, np.where(eyrow == 0, grid.y[jr], grid.y[jr + 1]))
        )
        rows_of_pairs.append(np.full(len(nodes_e), jr, dtype=np.int32))

    cell_nodes = np.concatenate(cell_nodes_list).astype(np.int32)
    cell_x = np.concatenate(cell_x_list)
    cell_y = np.concatenate(cell_yrow_list)
    ncells = len(cell_nodes)

    nodes = Nodes(
        xy=xy,
        lonlat=grid.projection.xy2lonlat(xy),
        flags=flags,
        ghost=Topology.check(flags, Topology.GHOST),
        global_index=global_index,
        remote_index=remote_index,
        partition=np.zeros(n_nodes, dtype=np.int32),
        halo=np.zeros(n_nodes, dtype=np.int8),
    )
    cells = Cells(
        nodes=cell_nodes,
        flags=np.zeros(ncells, dtype=np.int32),
        halo=np.zeros(ncells, dtype=np.int8),
        global_index=np.arange(ncells, dtype=np.int64),
    )
    mesh = Mesh(nodes=nodes, cells=cells)
    mesh.metadata["grid_name"] = grid.name
    mesh.metadata["periodic"] = periodic
    mesh.metadata["ny"] = ny
    # per-corner unwrapped coordinates (used for centroids across the seam)
    mesh.fields["cell_corner_x"] = cell_x
    mesh.fields["cell_corner_y"] = cell_y
    mesh.fields["cell_row"] = np.concatenate(rows_of_pairs)
    return mesh


def extend_periodic_west(mesh: Mesh, grid) -> Mesh:
    """Append west-side periodic images of the seam cells (serial halo=1).

    Every cell containing an east periodic ghost node is replicated shifted by
    -360 deg: the ghost corner becomes the owned first-of-row node, owned
    corners become new west ghost nodes. After this, every owned node has a
    complete cell ring, so dual volumes/normals are exact without communication
    (reference: BuildHalo.cc periodic transform :1287).
    """
    if not mesh.metadata.get("periodic", True):
        return mesh
    size = grid.size
    ny = grid.ny
    ghost_id0 = size  # east ghosts occupy [size, size+ny)

    cn = mesh.cells.nodes
    is_seam = (cn >= ghost_id0).any(axis=1)
    seam_cells = np.flatnonzero(is_seam)
    scn = cn[seam_cells]  # (ns, 4)
    scx = mesh.fields["cell_corner_x"][seam_cells]
    scy = mesh.fields["cell_corner_y"][seam_cells]

    # map corners: east ghost g_j -> owned node (0, j); owned node -> west ghost
    valid = scn >= 0
    is_ghost_corner = valid & (scn >= ghost_id0)
    owned_corner = valid & ~is_ghost_corner

    # new west ghosts: unique owned corner nodes of seam cells
    owned_ids = np.unique(scn[owned_corner])
    west_ghost_of = np.full(size, -1, dtype=np.int64)
    n0 = mesh.nodes.size
    west_ghost_of[owned_ids] = n0 + np.arange(len(owned_ids))

    new_nodes_xy = mesh.nodes.xy[owned_ids].copy()
    new_nodes_xy[:, 0] -= 360.0

    new_cn = np.full_like(scn, -1)
    ghost_rows = scn[is_ghost_corner] - ghost_id0
    new_cn[is_ghost_corner] = grid.row_offset[ghost_rows]  # owned first-of-row
    new_cn[owned_corner] = west_ghost_of[scn[owned_corner]]
    new_cx = np.where(valid, scx - 360.0, np.nan)

    # --- assemble extended mesh -------------------------------------------
    nodes = mesh.nodes
    n_new = len(owned_ids)
    xy = np.concatenate([nodes.xy, new_nodes_xy])
    flags = np.concatenate(
        [nodes.flags, np.full(n_new, Topology.GHOST | Topology.PERIODIC, dtype=np.int32)]
    )
    from ..util.topology import Topology as T

    global_index = np.concatenate([nodes.global_index, owned_ids])
    remote_index = np.concatenate([nodes.remote_index, owned_ids])
    partition = np.concatenate([nodes.partition, np.zeros(n_new, dtype=np.int32)])
    halo = np.concatenate([nodes.halo, np.ones(n_new, dtype=np.int8)])

    new_mesh_nodes = Nodes(
        xy=xy,
        lonlat=np.concatenate([nodes.lonlat, grid.projection.xy2lonlat(new_nodes_xy)]),
        flags=flags,
        ghost=T.check(flags, T.GHOST),
        global_index=global_index,
        remote_index=remote_index,
        partition=partition,
        halo=halo,
    )

    cells = mesh.cells
    n_seam = len(seam_cells)
    new_cells = Cells(
        nodes=np.concatenate([cells.nodes, new_cn.astype(np.int32)]),
        flags=np.concatenate([cells.flags, np.full(n_seam, Topology.GHOST, dtype=np.int32)]),
        halo=np.concatenate([cells.halo, np.ones(n_seam, dtype=np.int8)]),
        global_index=np.concatenate([cells.global_index, cells.global_index[seam_cells]]),
    )
    out = Mesh(nodes=new_mesh_nodes, cells=new_cells, metadata=dict(mesh.metadata))
    out.fields = dict(mesh.fields)
    out.fields["cell_corner_x"] = np.concatenate([mesh.fields["cell_corner_x"], new_cx])
    out.fields["cell_corner_y"] = np.concatenate([mesh.fields["cell_corner_y"], scy])
    out.fields["cell_row"] = np.concatenate(
        [mesh.fields["cell_row"], mesh.fields["cell_row"][seam_cells]]
    )
    return out


class StructuredMeshGenerator:
    """Factory-compatible generator (reference: MeshGenerator("structured"))."""

    def __init__(self, config: Config | dict | None = None, **kwargs):
        self.config = Config(config or {}) | Config(kwargs)

    def generate(self, grid, distribution=None, part: int | None = None):
        """Global mesh, or — given a distribution — the per-part region mesh.

        With a distribution: returns the mesh of `part` (or the list of all
        part meshes when part is None), generated DIRECTLY from the owned
        rows (reference StructuredMeshGenerator.cc:272 generate_region) —
        the global mesh is never materialized, so setup is O(local points)
        per part.
        """
        halo = self.config.get_int("halo", 1)
        if distribution is None or distribution.nb_parts == 1:
            mesh = build_global_topology(grid)
            if halo > 0:
                mesh = extend_periodic_west(mesh, grid)
            return mesh
        if part is not None:
            return generate_region(grid, distribution, part)
        return [
            generate_region(grid, distribution, p)
            for p in range(distribution.nb_parts)
        ]


def generate_region(grid, distribution, part: int) -> Mesh:
    """Per-part mesh generated directly from the part's owned rows.

    Reference behavior: StructuredMeshGenerator.cc:272 (generate_region) —
    each rank zips only the row pairs its owned points touch, keeps the cells
    with at least one owned corner, and marks the remaining corners as ghost
    nodes with partition / global_index / remote_index resolved against the
    owning part's deterministic layout (owned grid points first, grid order).
    The global mesh is never materialized.
    """
    part_arr = np.asarray(distribution.partition)
    ny = grid.ny
    nx = np.asarray(grid.nx, dtype=np.int64)
    row_offset = grid.row_offset
    size = grid.size

    mine = np.flatnonzero(part_arr == part)
    if not len(mine):
        raise ValueError(f"part {part} owns no points")
    j_mine = np.searchsorted(row_offset, mine, side="right") - 1
    j0 = max(int(j_mine.min()) - 1, 0)
    j1 = min(int(j_mine.max()) + 2, ny)

    owned_lut = np.zeros(size, bool)
    owned_lut[mine] = True

    # zip the row pairs [j0, j1-1) with GLOBAL ids (periodic ghost id size+j)
    cn_list, ex_list, ey_list, row_list = [], [], [], []
    for jr in range(j0, j1 - 1):
        nN, nS = int(nx[jr]), int(nx[jr + 1])
        if nN == 0 or nS == 0:
            continue
        xN = grid.xmin[jr] + np.arange(nN + 1) * grid.dx[jr]
        xS = grid.xmin[jr + 1] + np.arange(nS + 1) * grid.dx[jr + 1]
        idsN = np.concatenate(
            [np.arange(row_offset[jr], row_offset[jr] + nN), [size + jr]])
        idsS = np.concatenate(
            [np.arange(row_offset[jr + 1], row_offset[jr + 1] + nS),
             [size + jr + 1]])
        nodes_e, ex, eyrow = _zip_row_pair(xN, xS, idsN, idsS)
        # keep cells with at least one owned corner (periodic ghost corners
        # resolve to their owner row-start point)
        owner_of = np.where(nodes_e < 0, 0, nodes_e)
        owner_of = np.where(owner_of >= size,
                            row_offset[np.clip(owner_of - size, 0, ny - 1)],
                            owner_of)
        keep = (owned_lut[owner_of] & (nodes_e >= 0)).any(axis=1)
        if not keep.any():
            continue
        cn_list.append(nodes_e[keep])
        ex_list.append(ex[keep])
        ey_list.append(np.where(
            eyrow[keep] < 0, np.nan,
            np.where(eyrow[keep] == 0, grid.y[jr], grid.y[jr + 1])))
        row_list.append(np.full(keep.sum(), jr, dtype=np.int32))

    cell_nodes_g = np.concatenate(cn_list)
    referenced = np.unique(cell_nodes_g[cell_nodes_g >= 0])

    # local node order: owned grid points (grid order), ghost grid points,
    # periodic ghosts
    ref_grid = referenced[referenced < size]
    ref_per = referenced[referenced >= size]
    own_nodes = ref_grid[owned_lut[ref_grid]]
    ghost_nodes = ref_grid[~owned_lut[ref_grid]]
    order = np.concatenate([own_nodes, ghost_nodes, ref_per])
    lut = np.full(size + ny, -1, np.int64)
    lut[order] = np.arange(len(order))
    n_nodes = len(order)
    n_own = len(own_nodes)

    # geometry / fields per node
    per_j = np.clip(order - size, 0, ny - 1)
    is_per = order >= size
    gidx = np.where(is_per, row_offset[per_j], order)  # owner grid point
    ii = np.where(is_per, nx[per_j],
                  order - row_offset[np.searchsorted(
                      row_offset, np.minimum(order, size - 1), "right") - 1])
    jj = np.where(is_per, per_j,
                  np.searchsorted(row_offset, np.minimum(order, size - 1),
                                  "right") - 1)
    x = grid.xmin[jj] + ii * grid.dx[jj]
    y = grid.y[jj]
    xy = np.stack([x, y], axis=-1)
    flags = np.zeros(n_nodes, np.int32)
    node_part = part_arr[gidx]
    ghost = (node_part != part) | is_per
    flags[ghost] = Topology.GHOST
    flags[is_per] |= Topology.PERIODIC

    # remote index: rank of the grid point within the owner's owned list
    # (owner layouts all start with their owned grid points in grid order)
    remote_index = np.empty(n_nodes, np.int64)
    for q in np.unique(node_part):
        qsel = node_part == q
        q_owned = np.flatnonzero(part_arr == q)
        remote_index[qsel] = np.searchsorted(q_owned, gidx[qsel])

    nodes = Nodes(
        xy=xy,
        lonlat=grid.projection.xy2lonlat(xy),
        flags=flags,
        ghost=ghost,
        global_index=gidx.astype(np.int64),
        remote_index=remote_index,
        partition=node_part.astype(np.int32),
        halo=ghost.astype(np.int8),
    )
    cells = Cells(
        nodes=np.where(cell_nodes_g >= 0, lut[np.maximum(cell_nodes_g, 0)],
                       -1).astype(np.int32),
        flags=np.zeros(len(cell_nodes_g), np.int32),
        halo=np.zeros(len(cell_nodes_g), np.int8),
        global_index=np.arange(len(cell_nodes_g), dtype=np.int64),
    )
    mesh = Mesh(nodes=nodes, cells=cells)
    mesh.metadata.update(
        grid_name=grid.name, periodic=True, ny=ny, part=part,
        nb_parts=distribution.nb_parts, nb_owned=n_own)
    mesh.fields["cell_corner_x"] = np.concatenate(ex_list)
    mesh.fields["cell_corner_y"] = np.concatenate(ey_list)
    mesh.fields["cell_row"] = np.concatenate(row_list)
    return mesh


def generate_mesh(grid, **options) -> Mesh:
    return StructuredMeshGenerator(**options).generate(grid)

"""CellColumns / EdgeColumns function spaces: fields on mesh cells / edges.

Reference behavior: atlas functionspace/CellColumns.h:42 and EdgeColumns.h:42
— same pattern as NodeColumns for element fields: create_field, halo exchange
(ghost elements take their owner's value), gather to global element order,
checksum.

Ownership resolution follows the reference's UID matching
(mesh/actions/BuildParallelFields.cc): a ghost cell shares its `global_index`
with its owner; a ghost edge is identified by the unordered pair of its node
GLOBAL indices (edges have no global numbering of their own on structured
meshes, the node-pair key is the reference's UID-from-centroid analog).
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from .base import FunctionSpace


def _owner_map(key: np.ndarray, is_ghost: np.ndarray):
    """For each element, the index of the non-ghost element with the same key.

    Elements whose key appears only as ghost map to themselves.
    """
    n = len(key)
    owner = np.arange(n, dtype=np.int64)
    order = np.argsort(key, kind="stable")
    k_sorted = key[order]
    grp_start = np.concatenate([[True], k_sorted[1:] != k_sorted[:-1]])
    grp_id = np.cumsum(grp_start) - 1
    # owner per group: prefer non-ghost member
    ngrp = grp_id[-1] + 1 if n else 0
    owner_of_grp = np.full(ngrp, -1, dtype=np.int64)
    # fill ghosts first, then overwrite with non-ghosts so they win
    gh = is_ghost[order]
    owner_of_grp[grp_id[gh]] = order[gh]
    owner_of_grp[grp_id[~gh]] = order[~gh]
    owner[order] = owner_of_grp[grp_id]
    return owner


class _ElementColumns(FunctionSpace):
    """Shared implementation for cell and edge fields."""

    def __init__(self, mesh, size: int, owner: np.ndarray, is_ghost: np.ndarray, levels=None):
        self.mesh = mesh
        self.size = int(size)
        self.levels = levels
        self._owner = owner
        self._ghost = is_ghost
        self._owned = ~is_ghost

    @property
    def nb_owned(self) -> int:
        return int(self._owned.sum())

    def owned_mask(self):
        return self._owned

    def halo_exchange(self, data):
        """Ghost elements take their owner's value."""
        import jax.numpy as jnp

        if isinstance(data, np.ndarray):
            data[self._ghost] = data[self._owner[self._ghost]]
            return data
        gh = np.flatnonzero(self._ghost)
        return jnp.asarray(data).at[gh].set(jnp.asarray(data)[self._owner[gh]])

    def scatter(self, glb):
        out = np.zeros((self.size,) + np.asarray(glb).shape[1:], np.asarray(glb).dtype)
        out[self._owned] = glb
        return self.halo_exchange(out)


class CellColumns(_ElementColumns):
    def __init__(self, mesh_or_grid, halo: int = 0, levels=None):
        from ..mesh.mesh import Mesh
        from ..util.topology import Topology

        if isinstance(mesh_or_grid, Mesh):
            mesh = mesh_or_grid
        else:
            from ..mesh import generate_mesh

            mesh = generate_mesh(mesh_or_grid)
        ghost = Topology.check(mesh.cells.flags, Topology.GHOST) | (mesh.cells.halo > 0)
        owner = _owner_map(mesh.cells.global_index.astype(np.int64), ghost)
        super().__init__(mesh, mesh.nb_cells, owner, ghost, levels)

    @property
    def nb_cells(self) -> int:
        return self.size


class EdgeColumns(_ElementColumns):
    def __init__(self, mesh_or_grid, halo: int = 0, levels=None):
        from ..mesh.mesh import Mesh

        if isinstance(mesh_or_grid, Mesh):
            mesh = mesh_or_grid
        else:
            from ..fvm.method import FvmMethod

            mesh = FvmMethod(mesh_or_grid).mesh
        if mesh.edges is None:
            from ..mesh.edges import build_edges

            mesh = build_edges(mesh)
        # unordered node-global-index pair key
        gn = mesh.nodes.global_index[mesh.edges.nodes.astype(np.int64)]
        lo = np.minimum(gn[:, 0], gn[:, 1])
        hi = np.maximum(gn[:, 0], gn[:, 1])
        key = lo * (mesh.nodes.global_index.max() + 1) + hi
        # an edge is a ghost copy iff ALL its nodes are ghosts — the owner edge
        # lives where the owner nodes are. (edges.halo marks owner-side seam
        # edges too, since it is the max of the adjacent CELL halos.)
        node_ghost = mesh.nodes.ghost[mesh.edges.nodes.astype(np.int64)]
        ghost = node_ghost.all(axis=1)
        owner = _owner_map(key, ghost)
        super().__init__(mesh, mesh.nb_edges, owner, ghost, levels)

    @property
    def nb_edges(self) -> int:
        return self.size

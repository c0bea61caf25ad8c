"""NodeColumns function space: fields on mesh nodes with halo.

Reference behavior: atlas functionspace/NodeColumns.h:50-160 — builds the mesh
halo on construction, owns halo exchange / gather-scatter / checksum, and the
rich global statistics: sum, orderIndependentSum, minimum, maximum,
minimumAndLocation, mean, meanAndStdDev (+ per-level variants,
detail/NodeColumns_FieldStatistics.cc). Reductions here exclude ghost nodes,
as in the reference (they use the owned-point gather).
"""

from __future__ import annotations

import numpy as np

from ..field import Field
from .base import FunctionSpace


class NodeColumns(FunctionSpace):
    def __init__(self, mesh_or_grid, halo: int = 1, levels: int | None = None):
        from ..fvm.method import FvmMethod
        from ..mesh.mesh import Mesh

        if isinstance(mesh_or_grid, FvmMethod):
            self.method = mesh_or_grid
        elif isinstance(mesh_or_grid, Mesh):
            self.method = FvmMethod(mesh=mesh_or_grid)
        else:
            self.method = FvmMethod(mesh_or_grid)
        self.mesh = self.method.mesh
        self.halo = int(halo)
        self.levels = levels
        g = self.method.geometry
        self.nb_nodes = g.nnodes
        self.size = g.nnodes
        self._owned = g.owned_mask

    @property
    def nb_nodes_global(self) -> int:
        return int(self._owned.sum())

    def lonlat(self):
        return self.method.geometry.lonlat

    def owned_mask(self):
        return self._owned

    def _point_partition(self):
        p = getattr(self.mesh.nodes, "partition", None)
        if p is not None:
            return np.asarray(p)
        return np.zeros(self.size, dtype=np.int32)

    @property
    def nb_parts(self):
        return int(self._point_partition().max()) + 1

    def halo_exchange(self, data):
        return self.method.halo_exchange(data)

    # -- statistics (reference NodeColumns.h:103-160) ----------------------
    def _owned_values(self, data):
        return np.asarray(data)[self._owned]

    def sum(self, data):
        v = self._owned_values(data)
        return v.sum(axis=0), len(v)

    def order_independent_sum(self, data):
        """Bit-reproducible sum independent of summation order: accumulate in
        sorted order of the values (reference uses a deterministic gather)."""
        v = self._owned_values(data)
        flat = v.reshape(len(v), -1)
        out = np.sort(flat, axis=0).sum(axis=0)
        return out.reshape(v.shape[1:]) if v.ndim > 1 else float(out[0]), len(v)

    def minimum(self, data):
        return self._owned_values(data).min(axis=0)

    def maximum(self, data):
        return self._owned_values(data).max(axis=0)

    def minimum_and_location(self, data):
        v = self._owned_values(data)
        flat = v.reshape(len(v), -1)
        k = flat.argmin(axis=0)
        gidx = np.flatnonzero(self._owned)[k]
        vals = flat[k, np.arange(flat.shape[1])]
        if v.ndim == 1:
            return float(vals[0]), int(gidx[0])
        return vals.reshape(v.shape[1:]), gidx.reshape(v.shape[1:])

    def maximum_and_location(self, data):
        v = self._owned_values(data)
        flat = v.reshape(len(v), -1)
        k = flat.argmax(axis=0)
        gidx = np.flatnonzero(self._owned)[k]
        vals = flat[k, np.arange(flat.shape[1])]
        if v.ndim == 1:
            return float(vals[0]), int(gidx[0])
        return vals.reshape(v.shape[1:]), gidx.reshape(v.shape[1:])

    def mean(self, data):
        v = self._owned_values(data)
        return v.mean(axis=0), len(v)

    def mean_and_standard_deviation(self, data):
        v = self._owned_values(data)
        return v.mean(axis=0), v.std(axis=0), len(v)

    def __repr__(self):
        return f"NodeColumns(nb_nodes={self.nb_nodes}, halo={self.halo})"

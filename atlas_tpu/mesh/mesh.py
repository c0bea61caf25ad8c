"""Mesh container: plain numpy arrays, the setup-side product.

Reference: atlas mesh/Mesh.h:41-90 (nodes + cells + edges + metadata). The TPU
design keeps the mesh as a bag of arrays produced once on the host; compute
kernels consume derived index/weight arrays only (see fvm/).

Conventions:
 - nodes.xy: (n, 2) float64 grid-space coordinates, degrees, UNWRAPPED (ghost
   copies east/west of the seam carry x outside [0, 360)).
 - cells.nodes: (ncells, 4) int32, column 3 == -1 for triangles; counterclockwise
   winding in (x, y).
 - flags: Topology bitflags (GHOST, PERIODIC, POLE, PATCH...).
 - global_index: 0-based global grid point index (ghosts point at their owner).
 - remote_index: local index on the owning partition; partition: owning part.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Nodes:
    xy: np.ndarray  # (n, 2) grid space, unwrapped
    lonlat: np.ndarray  # (n, 2) geographic
    flags: np.ndarray  # (n,) int32 Topology bits
    ghost: np.ndarray  # (n,) bool
    global_index: np.ndarray  # (n,) int64
    remote_index: np.ndarray  # (n,) int64 (local index on owning part)
    partition: np.ndarray  # (n,) int32
    halo: np.ndarray  # (n,) int8 (0 = owned/interior)

    @property
    def size(self) -> int:
        return len(self.xy)


@dataclass
class Cells:
    nodes: np.ndarray  # (ncells, 4) int32, -1 padding for triangles
    flags: np.ndarray  # (ncells,) int32
    halo: np.ndarray  # (ncells,) int8
    global_index: np.ndarray  # (ncells,) int64

    @property
    def size(self) -> int:
        return len(self.nodes)

    @property
    def nodes_per_cell(self) -> np.ndarray:
        # cells are (ncell, maxnodes) with -1 padding: triangles, quads, and
        # pentagons (healpix pole_elements="pentagons") share one table
        return (self.nodes >= 0).sum(axis=1).astype(np.int64)


@dataclass
class Edges:
    nodes: np.ndarray  # (nedges, 2) int32
    cells: np.ndarray  # (nedges, 2) int32, -1 = missing
    flags: np.ndarray  # (nedges,) int32 (POLE for pole edges)
    halo: np.ndarray  # (nedges,) int8

    @property
    def size(self) -> int:
        return len(self.nodes)


@dataclass
class Mesh:
    nodes: Nodes
    cells: Cells
    edges: Optional[Edges] = None
    metadata: dict = field(default_factory=dict)
    # derived fields (filled by dual-mesh / connectivity builders)
    fields: dict = field(default_factory=dict)

    @property
    def nb_nodes(self) -> int:
        return self.nodes.size

    @property
    def nb_cells(self) -> int:
        return self.cells.size

    @property
    def nb_edges(self) -> int:
        return self.edges.size if self.edges is not None else 0

    def footprint(self) -> int:
        """Approximate memory footprint in bytes (reference: Mesh::footprint)."""
        total = 0
        for obj in (self.nodes, self.cells, self.edges):
            if obj is None:
                continue
            for v in vars(obj).values():
                if isinstance(v, np.ndarray):
                    total += v.nbytes
        for v in self.fields.values():
            if isinstance(v, np.ndarray):
                total += v.nbytes
        return total

"""fvm Method: assemble the gather-free geometry arrays for the Nabla kernels.

Reference behavior: atlas numerics/fvm/Method.cc:74-121 — builds NodeColumns +
EdgeColumns with halo, median-dual mesh, node->edge connectivity and
node2edge_sign, collects pole edges, stores the earth radius.

TPU design: everything the kernels need is reduced to a `FvmGeometry` bag of
arrays (SURVEY.md section 7 design stance):
  edge_nodes   (nedges, 2)   int32   edge -> node gather indices
  dual_normals (nedges, 2)   float   S, in degree units (deg2rad applied in kernel)
  inc_node/inc_edge/inc_sign flattened sorted node<-edge incidence for a
                             segment-sum accumulation (node loop equivalent)
  vol          (nnodes,)     dual volumes
  lat_rad      (nnodes,)     latitudes [rad] for metric terms
  pole_mask    (nedges,)     1.0 where POLE edge
  halo_src/halo_dst          ghost-update copy indices (serial halo exchange)
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import numpy as np

from ..util.constants import DEG2RAD, EARTH_RADIUS
from ..util.topology import Topology
from ..mesh import (
    Mesh,
    build_edges,
    build_median_dual_mesh,
    build_node_to_edge_connectivity,
    generate_mesh,
)


@dataclass
class FvmGeometry:
    nnodes: int
    nedges: int
    edge_nodes: np.ndarray
    dual_normals: np.ndarray
    vol: np.ndarray
    lat_rad: np.ndarray
    lonlat: np.ndarray
    inc_node: np.ndarray
    inc_edge: np.ndarray
    inc_sign: np.ndarray
    pole_mask: np.ndarray  # (nedges,) 1.0 on POLE edges
    pole_edge_ids: np.ndarray
    halo_src: np.ndarray  # owner local index per ghost
    halo_dst: np.ndarray  # ghost local index
    owned_mask: np.ndarray  # (nnodes,) True for non-ghost
    radius: float


class FvmMethod:
    def __init__(
        self,
        grid=None,
        mesh: Mesh | None = None,
        radius: float = EARTH_RADIUS,
        use_cache: bool = False,
    ):
        # setup-product caching, reference ATLAS_CACHE_PATH (SURVEY.md 5.4)
        if use_cache and mesh is None and grid is not None:
            from ..io.cache import cache_path, load_geometry, save_geometry

            path = cache_path("fvm-geometry", f"{grid.name}-{grid.uid()[:12]}")
            cached = load_geometry(path)
            if cached is not None and cached.radius == float(radius):
                self.mesh = None
                self.grid = grid
                self.radius = float(radius)
                self.geometry = cached
                return
        if mesh is None:
            if grid is None:
                raise ValueError("need a grid or a mesh")
            mesh = generate_mesh(grid)
            mesh = build_edges(mesh, grid)
        elif mesh.edges is None:
            mesh = build_edges(mesh, grid)
        mesh = build_node_to_edge_connectivity(mesh)
        mesh = build_median_dual_mesh(mesh)
        self.mesh = mesh
        self.grid = grid
        self.radius = float(radius)
        self.geometry = self._assemble()
        if use_cache and grid is not None:
            from ..io.cache import cache_path, save_geometry

            try:
                save_geometry(
                    self.geometry,
                    cache_path("fvm-geometry", f"{grid.name}-{grid.uid()[:12]}"),
                )
            except OSError:
                pass

    def _assemble(self) -> FvmGeometry:
        mesh = self.mesh
        edges = mesh.edges
        nnodes = mesh.nb_nodes
        nedges = mesh.nb_edges

        node2edge = mesh.fields["node2edge"]
        sign = mesh.fields["node2edge_sign"]
        valid = node2edge >= 0
        # flattened sorted incidence (rows of node2edge are already per-node)
        inc_node = np.repeat(np.arange(nnodes, dtype=np.int32), valid.sum(axis=1))
        inc_edge = node2edge[valid].astype(np.int32)
        inc_sign = sign[valid]

        # dual volumes on ghosts: copy from owner so all nodes carry owner value
        # (reference halo-exchanges dual_volumes, BuildDualMesh.cc:129-137)
        vol = mesh.fields["dual_volumes"].copy()
        ghost = mesh.nodes.ghost
        halo_dst = np.flatnonzero(ghost).astype(np.int32)
        halo_src = mesh.nodes.remote_index[halo_dst].astype(np.int32)
        vol[halo_dst] = vol[halo_src]

        pole_ids = np.flatnonzero(Topology.check(edges.flags, Topology.POLE))
        pole_mask = np.zeros(nedges)
        pole_mask[pole_ids] = 1.0

        return FvmGeometry(
            nnodes=nnodes,
            nedges=nedges,
            edge_nodes=edges.nodes.astype(np.int32),
            dual_normals=mesh.fields["dual_normals"],
            vol=vol,
            lat_rad=mesh.nodes.lonlat[:, 1] * DEG2RAD,
            lonlat=mesh.nodes.lonlat,
            inc_node=inc_node,
            inc_edge=inc_edge,
            inc_sign=inc_sign,
            pole_mask=pole_mask,
            pole_edge_ids=pole_ids.astype(np.int32),
            halo_src=halo_src,
            halo_dst=halo_dst,
            owned_mask=~ghost,
            radius=self.radius,
        )

    @cached_property
    def nb_nodes(self):
        return self.geometry.nnodes

    def create_field(self, levels: int | None = None, variables: int | None = None, dtype=np.float64):
        shape = (self.geometry.nnodes,)
        if levels:
            shape += (levels,)
        if variables:
            shape += (variables,)
        return np.zeros(shape, dtype=dtype)

    def halo_exchange(self, field):
        """Copy owner values onto ghost rows (single-partition path)."""
        import jax.numpy as jnp

        g = self.geometry
        if isinstance(field, np.ndarray):
            field[g.halo_dst] = field[g.halo_src]
            return field
        return field.at[g.halo_dst].set(field[g.halo_src])

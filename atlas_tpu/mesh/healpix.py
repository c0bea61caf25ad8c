"""Dedicated HEALPix mesh generator: all-quad diamond mesh with pole caps.

Reference behavior: atlas meshgenerator/detail/HealpixMeshGenerator.cc — the
HEALPix primal mesh is the diamond lattice of pixel centers: every grid point
owns ONE quad [self, down, east, up] whose north/south vertices sit on the
adjacent rows ("diamonds"), plus 8 logical pole nodes per pole (lon = 45*k,
lat = +/-90) and 4 pole-cap quads per pole, for 12*N^2 + 8 cells total
(matching the reference's global cell numbering 12ns^2+1..+8 for the pole
cells). Periodicity follows this framework's structured meshgen convention:
one east periodic ghost node per row at x = xmin + 360 (the reference's
ghostIdx nodes).

This implementation derives the neighbour choice GEOMETRICALLY instead of the
reference's per-case index algebra: rows are uniform, so "the point of the
adjacent row nearest the east-edge midpoint" is a closed-form rounding; the
half-integer ties that occur at polar-cap quarter corners resolve half-up for
the poleward neighbour and half-down for the equatorward one (verified
against the reference's index formulas and by the exact-tiling area test:
sum of cell areas == 4*pi). The pole-cap quads are degenerate in 3-D (three
vertices at the pole point) — they exist in the unfolded lat-lon plane,
exactly the reference's 2-D pole treatment.
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz
from ..util.topology import Topology
from .mesh import Cells, Mesh, Nodes


class HealpixMeshGenerator:
    """Options: pole_elements = "quads" (default; 8 pole nodes, 4 cap quads
    per pole) or "pentagons" (4 pole nodes; the first/last ring's diamonds
    absorb the pole wedges as pentagons) — reference
    HealpixMeshGenerator.cc:72-109."""

    def __init__(self, config=None, **kwargs):
        cfg = dict(config or {})
        cfg.update(kwargs)
        self.pole_elements = cfg.get("pole_elements", "quads")
        if self.pole_elements not in ("quads", "pentagons"):
            raise ValueError("pole_elements must be 'quads' or 'pentagons'")

    def generate(self, grid, distribution=None) -> Mesh:
        if self.pole_elements == "pentagons":
            return self._generate_pentagons(grid)
        return self._generate_quads(grid)

    def _generate_quads(self, grid) -> Mesh:
        ny = grid.ny
        if (ny + 1) % 4 or not grid.name.startswith("H"):
            raise TypeError("healpix mesh generator needs a HEALPix grid (H<N>)")
        N = (ny + 1) // 4

        npts = grid.size
        nx = grid.nx.astype(np.int64)
        xmin = grid.xmin
        dx = grid.dx

        # ---- node layout ---------------------------------------------------
        # [0:9)         north pole nodes (8 + 1 east ghost)
        # [9 : 9+npts)  grid points
        # [.. +ny)      one east periodic ghost per grid row
        # [.. +9)       south pole nodes (8 + 1 east ghost)
        NP = 9
        gbase = NP
        ghbase = NP + npts
        sbase = ghbase + ny
        nnodes = sbase + 9

        pole_x = np.concatenate([45.0 * np.arange(8), [360.0]])
        xy = np.concatenate([
            np.stack([pole_x, np.full(9, 90.0)], -1),
            grid.xy(),
            np.stack([xmin + 360.0, grid.y], -1),
            np.stack([pole_x, np.full(9, -90.0)], -1),
        ])
        flags = np.zeros(nnodes, np.int32)
        flags[:NP] |= Topology.BC
        flags[sbase:] |= Topology.BC
        ghost = np.zeros(nnodes, bool)
        for g0 in (NP - 1, nnodes - 1):
            ghost[g0] = True
            flags[g0] |= Topology.GHOST | Topology.PERIODIC
        ghost[ghbase:sbase] = True
        flags[ghbase:sbase] |= Topology.GHOST | Topology.PERIODIC

        global_index = np.arange(nnodes, dtype=np.int64)
        global_index[NP - 1] = 0                       # pole east ghosts own
        global_index[nnodes - 1] = sbase
        global_index[ghbase:sbase] = gbase + grid.row_offset[:-1]  # row owners

        def gid(i, j):
            return gbase + grid.row_offset[j] + i

        def nearest(j, x, tie):
            """Node ids of the row-j points nearest lons x (tie: +-1).

            Index nx[j] (the wrap position) resolves to the row's east
            periodic ghost node.
            """
            if j == -1 or j == ny:  # pole rows: 8 nodes + ghost, dx = 45
                idx = np.floor(x / 45.0 + 0.5 + tie * 1e-6).astype(np.int64)
                idx = np.clip(idx, 0, 8)
                base = 0 if j == -1 else sbase
                return base + idx
            idx = np.floor((x - xmin[j]) / dx[j] + 0.5 + tie * 1e-6).astype(np.int64)
            idx = np.clip(idx, 0, nx[j])
            return np.where(idx == nx[j], ghbase + j, gid(idx, j))

        # ---- diamonds: one quad [self, S, E, N] per grid point -------------
        quads = np.empty((npts, 4), np.int64)
        for j in range(ny):
            i = np.arange(nx[j])
            x = xmin[j] + i * dx[j]
            midx = x + 0.5 * dx[j]
            south = j > 2 * N - 1  # southern rows: mirrored tie resolution
            tie_up = -1.0 if south else 1.0
            Nn = nearest(j - 1, midx, tie_up)
            Sn = nearest(j + 1, midx, -tie_up)
            p = gid(i, j)
            E = np.where(i + 1 == nx[j], ghbase + j, gid((i + 1) % nx[j], j))
            quads[grid.row_offset[j]:grid.row_offset[j + 1]] = np.stack(
                [p, Sn, E, Nn], axis=-1)

        # ---- pole-cap quads: 4 per pole (unfolded-plane cells) -------------
        def cap_quads(j, pole_row, pole_base, south):
            i = np.arange(4)
            x = xmin[j] + i * dx[j]
            n_k = nearest(pole_row, x + 0.5 * dx[j], 1.0)
            n_prev = np.empty_like(n_k)
            n_prev[1:] = n_k[:-1]
            n_prev[0] = pole_base  # west end of the first gap: pole node 0
            m_k = n_prev + 1       # in-between pole node (45 deg east)
            p = gid(i, j)
            q = np.stack([p, n_k, m_k, n_prev], axis=-1)
            return q[:, ::-1] if south else q

        cap_n = cap_quads(0, -1, 0, south=False)
        cap_s = cap_quads(ny - 1, ny, sbase, south=True)

        # ---- orientation of the diamonds: CCW viewed from outside ----------
        xyz = lonlat_to_xyz(xy)
        a, b, c = xyz[quads[:, 0]], xyz[quads[:, 1]], xyz[quads[:, 2]]
        nrm = np.cross(b - a, c - a)
        sign = np.einsum("ij,ij->i", nrm, a + b + c)
        quads[sign < 0] = quads[sign < 0][:, ::-1]

        cells = np.concatenate([quads, cap_n, cap_s])
        ncell = len(cells)
        remote_index = np.arange(nnodes, dtype=np.int64)
        return Mesh(
            nodes=Nodes(
                xy=xy,
                lonlat=np.stack([np.mod(xy[:, 0], 360.0), xy[:, 1]], -1),
                flags=flags,
                ghost=ghost,
                global_index=global_index,
                remote_index=remote_index,
                partition=np.zeros(nnodes, np.int32),
                halo=np.zeros(nnodes, np.int8),
            ),
            cells=Cells(
                nodes=cells.astype(np.int32),
                flags=np.zeros(ncell, np.int32),
                halo=np.zeros(ncell, np.int8),
                global_index=np.arange(ncell, dtype=np.int64),
            ),
            metadata={"generator": "healpix", "N": N},
        )

    def _generate_pentagons(self, grid) -> Mesh:
        """pole_elements="pentagons": 4 pole nodes per pole (lon = 90*k); the
        first/last ring's cells are pentagons absorbing the pole wedges, so
        the mesh has exactly 12*N^2 cells and no pole-owned elements."""
        ny = grid.ny
        if (ny + 1) % 4 or not grid.name.startswith("H"):
            raise TypeError("healpix mesh generator needs a HEALPix grid (H<N>)")
        N = (ny + 1) // 4

        npts = grid.size
        nx = grid.nx.astype(np.int64)
        xmin = grid.xmin
        dx = grid.dx

        # node layout: 5 north pole (4 + ghost) | grid points | ny row ghosts
        # | 5 south pole
        NP = 5
        gbase = NP
        ghbase = NP + npts
        sbase = ghbase + ny
        nnodes = sbase + 5
        pole_x = np.concatenate([90.0 * np.arange(4), [360.0]])
        xy = np.concatenate([
            np.stack([pole_x, np.full(5, 90.0)], -1),
            grid.xy(),
            np.stack([xmin + 360.0, grid.y], -1),
            np.stack([pole_x, np.full(5, -90.0)], -1),
        ])
        flags = np.zeros(nnodes, np.int32)
        flags[:NP] |= Topology.BC
        flags[sbase:] |= Topology.BC
        ghost = np.zeros(nnodes, bool)
        for g0 in (NP - 1, nnodes - 1):
            ghost[g0] = True
            flags[g0] |= Topology.GHOST | Topology.PERIODIC
        ghost[ghbase:sbase] = True
        flags[ghbase:sbase] |= Topology.GHOST | Topology.PERIODIC
        global_index = np.arange(nnodes, dtype=np.int64)
        global_index[NP - 1] = 0
        global_index[nnodes - 1] = sbase
        global_index[ghbase:sbase] = gbase + grid.row_offset[:-1]

        def gid(i, j):
            return gbase + grid.row_offset[j] + i

        def nearest(j, x, tie):
            idx = np.floor((x - xmin[j]) / dx[j] + 0.5 + tie * 1e-6).astype(np.int64)
            idx = np.clip(idx, 0, nx[j])
            return np.where(idx == nx[j], ghbase + j, gid(idx, j))

        # interior diamonds (rows 1 .. ny-2), padded to 5 columns
        cells = []
        for j in range(1, ny - 1):
            i = np.arange(nx[j])
            x = xmin[j] + i * dx[j]
            midx = x + 0.5 * dx[j]
            south = j > 2 * N - 1
            tie_up = -1.0 if south else 1.0
            Nn = nearest(j - 1, midx, tie_up)
            Sn = nearest(j + 1, midx, -tie_up)
            p = gid(i, j)
            E = np.where(i + 1 == nx[j], ghbase + j, (p + 1))
            q = np.stack([p, Sn, E, Nn, np.full(nx[j], -1, np.int64)], -1)
            cells.append(q)

        # pole-row pentagons: [p, S, E, pole_right, pole_left] (north);
        # mirrored vertex order for the south so orientation stays CCW
        def pent_row(j, pole_base, south):
            i = np.arange(4)
            x = xmin[j] + i * dx[j]
            midx = x + 0.5 * dx[j]
            other = j + (1 if not south else -1)
            tie = -1.0 if south else 1.0
            D = nearest(other, midx, -tie)  # the diamond's non-pole vertex row
            p = gid(i, j)
            E = np.where(i + 1 == nx[j], ghbase + j, p + 1)
            # pole nodes left/right of p: p_k sits between pole k and k+1
            pl = pole_base + i
            pr = np.where(i + 1 == 4, pole_base + 4, pole_base + i + 1)
            if not south:
                q = np.stack([p, D, E, pr, pl], -1)
            else:
                q = np.stack([p, pl, pr, E, D], -1)
            return q

        cells.insert(0, pent_row(0, 0, south=False))
        cells.append(pent_row(ny - 1, sbase, south=True))
        cells = np.concatenate(cells)

        # orientation via the non-degenerate triple (0, 1, 2)
        xyz = lonlat_to_xyz(xy)
        a, b, c = xyz[cells[:, 0]], xyz[cells[:, 1]], xyz[cells[:, 2]]
        sign = np.einsum("ij,ij->i", np.cross(b - a, c - a), a + b + c)
        flip = sign < 0
        for k in np.flatnonzero(flip):
            nv = int((cells[k] >= 0).sum())
            cells[k, :nv] = cells[k, :nv][::-1]

        ncell = len(cells)
        return Mesh(
            nodes=Nodes(
                xy=xy,
                lonlat=np.stack([np.mod(xy[:, 0], 360.0), xy[:, 1]], -1),
                flags=flags,
                ghost=ghost,
                global_index=global_index,
                remote_index=np.arange(nnodes, dtype=np.int64),
                partition=np.zeros(nnodes, np.int32),
                halo=np.zeros(nnodes, np.int8),
            ),
            cells=Cells(
                nodes=cells.astype(np.int32),
                flags=np.zeros(ncell, np.int32),
                halo=np.zeros(ncell, np.int8),
                global_index=np.arange(ncell, dtype=np.int64),
            ),
            metadata={"generator": "healpix", "N": N,
                      "pole_elements": "pentagons"},
        )

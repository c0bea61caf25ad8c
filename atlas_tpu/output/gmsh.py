"""Gmsh .msh output (reference: atlas output/Gmsh.h:45, detail/GmshIO.cc).

Writes mesh (nodes + triangles/quads [+ edges]) and node fields in the Gmsh
2.2 ASCII format; coordinates selectable as lonlat (2-D unfolded), xy, or xyz
(on the sphere).
"""

from __future__ import annotations

import numpy as np

from ..util.geometry import lonlat_to_xyz


class GmshWriter:
    def __init__(self, path: str, coordinates: str = "lonlat", ghost: bool = False):
        self.path = path
        self.coordinates = coordinates
        self.ghost = ghost

    def write(self, mesh, fields: dict | None = None):
        nodes = mesh.nodes
        cells = mesh.cells
        n = nodes.size
        if self.coordinates == "xyz":
            coords = lonlat_to_xyz(nodes.lonlat)
        elif self.coordinates == "lonlat":
            coords = np.concatenate([nodes.lonlat, np.zeros((n, 1))], axis=1)
        else:
            coords = np.concatenate([nodes.xy, np.zeros((n, 1))], axis=1)

        keep_cells = np.ones(cells.size, dtype=bool)
        if not self.ghost:
            keep_cells = cells.halo == 0

        with open(self.path, "w") as f:
            f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
            f.write(f"$Nodes\n{n}\n")
            for i in range(n):
                f.write(f"{i+1} {coords[i,0]:.10g} {coords[i,1]:.10g} {coords[i,2]:.10g}\n")
            f.write("$EndNodes\n")
            cn = cells.nodes[keep_cells]
            lines = []
            for row in cn:
                nv = int((row >= 0).sum())
                if nv == 4:
                    lines.append(f"3 2 1 1 {row[0]+1} {row[1]+1} {row[2]+1} {row[3]+1}")
                elif nv == 3:
                    lines.append(f"2 2 1 1 {row[0]+1} {row[1]+1} {row[2]+1}")
                else:  # pentagons and beyond: fan-triangulate (gmsh 2.2 has
                    # no flat polygon element above the quad)
                    for k in range(1, nv - 1):
                        lines.append(f"2 2 1 1 {row[0]+1} {row[k]+1} {row[k+1]+1}")
            f.write(f"$Elements\n{len(lines)}\n")
            for e, body in enumerate(lines):
                f.write(f"{e+1} {body}\n")
            f.write("$EndElements\n")
            for name, data in (fields or {}).items():
                data = np.asarray(data)
                if data.ndim == 1:
                    f.write(f'$NodeData\n1\n"{name}"\n1\n0.0\n3\n0\n1\n{n}\n')
                    for i in range(n):
                        f.write(f"{i+1} {data[i]:.10g}\n")
                    f.write("$EndNodeData\n")


def write_gmsh(mesh, path: str, fields: dict | None = None, **opts):
    GmshWriter(path, **opts).write(mesh, fields)


class GmshReader:
    """Read a Gmsh 2.2 ASCII .msh file back into (coords, tris+quads, fields).

    Reference parity: the reference's Gmsh output also reads meshes
    (output/detail/GmshIO.cc GmshIO::read). Returns a dict with
    'coords' (n, 3), 'cells' (ncell, 4) node indices (0-based, -1 pad for
    triangles), and 'fields' {name: (n,) array}.
    """

    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict:
        coords = None
        cells = []
        fields = {}
        with open(self.path) as f:
            line = f.readline()
            while line:
                tag = line.strip()
                if tag == "$Nodes":
                    n = int(f.readline())
                    coords = np.empty((n, 3))
                    for _ in range(n):
                        parts = f.readline().split()
                        coords[int(parts[0]) - 1] = [float(v) for v in parts[1:4]]
                elif tag == "$Elements":
                    ne = int(f.readline())
                    for _ in range(ne):
                        parts = f.readline().split()
                        etype = int(parts[1])
                        ntags = int(parts[2])
                        conn = [int(v) - 1 for v in parts[3 + ntags:]]
                        if etype == 2:      # triangle
                            cells.append(conn + [-1])
                        elif etype == 3:    # quad
                            cells.append(conn)
                        # other element types (edges, points) are skipped
                elif tag == "$NodeData":
                    nstr = int(f.readline())
                    name = f.readline().strip().strip('"')
                    for _ in range(nstr - 1):
                        f.readline()
                    nreal = int(f.readline())
                    for _ in range(nreal):
                        f.readline()
                    nint = int(f.readline())
                    ints = [int(f.readline()) for _ in range(nint)]
                    nvals = ints[-1]
                    data = np.empty(nvals)
                    for _ in range(nvals):
                        parts = f.readline().split()
                        data[int(parts[0]) - 1] = float(parts[1])
                    fields[name] = data
                line = f.readline()
        return {
            "coords": coords,
            "cells": np.asarray(cells, dtype=np.int64).reshape(-1, 4),
            "fields": fields,
        }


def read_gmsh(path: str) -> dict:
    return GmshReader(path).read()

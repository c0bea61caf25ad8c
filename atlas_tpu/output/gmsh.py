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
            f.write(f"$Elements\n{len(cn)}\n")
            for e, row in enumerate(cn):
                if row[3] >= 0:
                    f.write(f"{e+1} 3 2 1 1 {row[0]+1} {row[1]+1} {row[2]+1} {row[3]+1}\n")
                else:
                    f.write(f"{e+1} 2 2 1 1 {row[0]+1} {row[1]+1} {row[2]+1}\n")
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

"""Gmsh .msh output (reference: atlas output/Gmsh.h:45, detail/GmshIO.cc).

Writes mesh (nodes + triangles/quads [+ edges]) and node fields in the Gmsh
2.2 ASCII **or binary** format (the reference's GmshIO supports both);
coordinates selectable as lonlat (2-D unfolded), xy, or xyz (on the sphere).
The reader auto-detects the format.
"""

from __future__ import annotations

import struct

import numpy as np

from ..util.geometry import lonlat_to_xyz


class GmshWriter:
    def __init__(self, path: str, coordinates: str = "lonlat",
                 ghost: bool = False, binary: bool = False):
        self.path = path
        self.coordinates = coordinates
        self.ghost = ghost
        self.binary = binary

    def _elements(self, cells, keep_cells):
        """(etype, conn) element list; pentagons+ fan-triangulated (gmsh 2.2
        has no flat polygon element above the quad)."""
        out = []
        for row in cells.nodes[keep_cells]:
            nv = int((row >= 0).sum())
            if nv == 4:
                out.append((3, [row[0], row[1], row[2], row[3]]))
            elif nv == 3:
                out.append((2, [row[0], row[1], row[2]]))
            else:
                for k in range(1, nv - 1):
                    out.append((2, [row[0], row[k], row[k + 1]]))
        return out

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
        elems = self._elements(cells, keep_cells)

        if self.binary:
            self._write_binary(coords, elems, fields or {})
        else:
            self._write_ascii(coords, elems, fields or {})

    # ----------------------------------------------------------- ascii 2.2
    def _write_ascii(self, coords, elems, fields):
        n = len(coords)
        with open(self.path, "w") as f:
            f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
            f.write(f"$Nodes\n{n}\n")
            for i in range(n):
                f.write(f"{i+1} {coords[i,0]:.10g} {coords[i,1]:.10g} "
                        f"{coords[i,2]:.10g}\n")
            f.write("$EndNodes\n")
            f.write(f"$Elements\n{len(elems)}\n")
            for e, (etype, conn) in enumerate(elems):
                body = " ".join(str(c + 1) for c in conn)
                f.write(f"{e+1} {etype} 2 1 1 {body}\n")
            f.write("$EndElements\n")
            for name, data in fields.items():
                data = np.asarray(data)
                if data.ndim == 1:
                    f.write(f'$NodeData\n1\n"{name}"\n1\n0.0\n3\n0\n1\n{n}\n')
                    for i in range(n):
                        f.write(f"{i+1} {data[i]:.10g}\n")
                    f.write("$EndNodeData\n")

    # ---------------------------------------------------------- binary 2.2
    def _write_binary(self, coords, elems, fields):
        """Gmsh 2.2 binary: little-endian, int32 ids, float64 coordinates
        (reference GmshIO binary path, output/detail/GmshIO.cc)."""
        n = len(coords)
        with open(self.path, "wb") as f:
            f.write(b"$MeshFormat\n2.2 1 8\n")
            f.write(struct.pack("<i", 1))  # endianness probe
            f.write(b"\n$EndMeshFormat\n")
            f.write(b"$Nodes\n" + str(n).encode() + b"\n")
            rec = np.empty(n, dtype=[("id", "<i4"), ("xyz", "<f8", (3,))])
            rec["id"] = np.arange(1, n + 1)
            rec["xyz"] = coords
            f.write(rec.tobytes())
            f.write(b"\n$EndNodes\n")
            f.write(b"$Elements\n" + str(len(elems)).encode() + b"\n")
            # group consecutive elements of the same type (header per group)
            i = 0
            eid = 1
            while i < len(elems):
                etype = elems[i][0]
                j = i
                while j < len(elems) and elems[j][0] == etype:
                    j += 1
                count = j - i
                f.write(struct.pack("<iii", etype, count, 2))
                nv = 3 if etype == 2 else 4
                rec = np.empty((count, 3 + nv), dtype="<i4")
                rec[:, 0] = np.arange(eid, eid + count)
                rec[:, 1] = 1  # physical tag
                rec[:, 2] = 1  # elementary tag
                for k, (_, conn) in enumerate(elems[i:j]):
                    rec[k, 3:] = [c + 1 for c in conn]
                f.write(rec.tobytes())
                eid += count
                i = j
            f.write(b"\n$EndElements\n")
            for name, data in fields.items():
                data = np.asarray(data, np.float64)
                if data.ndim == 1:
                    f.write(b"$NodeData\n1\n\"" + name.encode()
                            + b"\"\n1\n0.0\n3\n0\n1\n" + str(n).encode()
                            + b"\n")
                    rec = np.empty(n, dtype=[("id", "<i4"), ("v", "<f8")])
                    rec["id"] = np.arange(1, n + 1)
                    rec["v"] = data
                    f.write(rec.tobytes())
                    f.write(b"\n$EndNodeData\n")


def write_gmsh(mesh, path: str, fields: dict | None = None, **opts):
    GmshWriter(path, **opts).write(mesh, fields)


class GmshReader:
    """Read a Gmsh 2.2 .msh file (ascii or binary, auto-detected) back into
    (coords, tris+quads, fields).

    Reference parity: the reference's Gmsh output also reads meshes
    (output/detail/GmshIO.cc GmshIO::read). Returns a dict with
    'coords' (n, 3), 'cells' (ncell, 4) node indices (0-based, -1 pad for
    triangles), and 'fields' {name: (n,) array}.
    """

    def __init__(self, path: str):
        self.path = path

    def read(self) -> dict:
        with open(self.path, "rb") as f:
            head = f.read(64)
        binary = b"2.2 1 8" in head.splitlines()[1] if b"\n" in head else False
        return self._read_binary() if binary else self._read_ascii()

    def _read_ascii(self) -> dict:
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

    def _read_binary(self) -> dict:
        coords = None
        cells = []
        fields = {}
        with open(self.path, "rb") as f:
            def readline():
                return f.readline().decode().strip()

            line = readline()
            while line:
                if line == "$MeshFormat":
                    readline()  # "2.2 1 8"
                    (one,) = struct.unpack("<i", f.read(4))
                    assert one == 1, "big-endian gmsh files unsupported"
                    f.readline()  # newline after the probe
                    readline()  # $EndMeshFormat
                elif line == "$Nodes":
                    n = int(readline())
                    rec = np.frombuffer(
                        f.read(n * 28),
                        dtype=[("id", "<i4"), ("xyz", "<f8", (3,))])
                    coords = np.empty((n, 3))
                    coords[rec["id"] - 1] = rec["xyz"]
                    readline()  # trailing newline -> $EndNodes
                elif line == "$Elements":
                    ne = int(readline())
                    got = 0
                    while got < ne:
                        etype, count, ntags = struct.unpack("<iii", f.read(12))
                        nv = {2: 3, 3: 4, 1: 2, 15: 1}[etype]
                        rec = np.frombuffer(
                            f.read(count * 4 * (1 + ntags + nv)),
                            dtype="<i4").reshape(count, 1 + ntags + nv)
                        if etype == 2:
                            for row in rec:
                                cells.append(list(row[1 + ntags:] - 1) + [-1])
                        elif etype == 3:
                            for row in rec:
                                cells.append(list(row[1 + ntags:] - 1))
                        got += count
                    readline()  # -> $EndElements
                elif line == "$NodeData":
                    nstr = int(readline())
                    name = readline().strip('"')
                    for _ in range(nstr - 1):
                        readline()
                    nreal = int(readline())
                    for _ in range(nreal):
                        readline()
                    nint = int(readline())
                    ints = [int(readline()) for _ in range(nint)]
                    nvals = ints[-1]
                    rec = np.frombuffer(
                        f.read(nvals * 12),
                        dtype=[("id", "<i4"), ("v", "<f8")])
                    data = np.empty(nvals)
                    data[rec["id"] - 1] = rec["v"]
                    fields[name] = data
                    readline()  # -> $EndNodeData
                line = readline()
                if not line and not f.peek(1):
                    break
        return {
            "coords": coords,
            "cells": np.asarray(cells, dtype=np.int64).reshape(-1, 4),
            "fields": fields,
        }


def read_gmsh(path: str) -> dict:
    return GmshReader(path).read()

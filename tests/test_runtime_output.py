"""Trace/report, Gmsh and point-cloud I/O, CLI smoke tests."""

import json
import subprocess
import sys

import numpy as np

from atlas_tpu import Grid
from atlas_tpu.runtime import Trace, trace_report, trace_reset
from atlas_tpu.output import write_gmsh, write_pointcloud, read_pointcloud
from atlas_tpu.mesh import generate_mesh, build_edges


def test_trace_nesting_and_report():
    trace_reset()
    with Trace("outer"):
        with Trace("inner"):
            pass
        with Trace("inner"):
            pass
    report = trace_report()
    assert "outer" in report and "inner" in report
    # inner aggregated with count 2
    inner_line = [l for l in report.splitlines() if "inner" in l][0]
    assert " 2 " in inner_line


def test_gmsh_write(tmp_path):
    g = Grid("O8")
    mesh = generate_mesh(g)
    path = tmp_path / "o8.msh"
    lat = mesh.nodes.lonlat[:, 1]
    write_gmsh(mesh, str(path), fields={"lat": lat})
    text = path.read_text()
    assert "$MeshFormat" in text and "$Elements" in text and "$NodeData" in text
    nnodes = int(text.split("$Nodes\n")[1].split("\n")[0])
    assert nnodes == mesh.nb_nodes


def test_pointcloud_io_roundtrip(tmp_path):
    pts = np.array([[0.0, 10.0], [120.5, -45.25], [359.9, 89.0]])
    f = np.array([1.5, -2.25, 3.75])
    path = tmp_path / "pc.txt"
    write_pointcloud(str(path), pts, {"t": f})
    ll, fields = read_pointcloud(str(path))
    np.testing.assert_allclose(ll, pts)
    np.testing.assert_allclose(fields["t"], f)


def test_cli_grids():
    out = subprocess.run(
        [sys.executable, "-m", "atlas_tpu.cli", "grids", "O16"],
        capture_output=True,
        text=True,
        check=True,
    )
    info = json.loads(out.stdout)
    assert info["size"] == Grid("O16").size


def test_cli_gaussian_latitudes():
    out = subprocess.run(
        [sys.executable, "-m", "atlas_tpu.cli", "gaussian-latitudes", "4"],
        capture_output=True,
        text=True,
        check=True,
    )
    lines = out.stdout.strip().splitlines()
    assert len(lines) == 8
    lat0, w0 = map(float, lines[0].split())
    from atlas_tpu.grid import gaussian_quadrature_npole_spole

    lats, w = gaussian_quadrature_npole_spole(8)
    assert abs(lat0 - lats[0]) < 1e-12


def test_record_roundtrip(tmp_path):
    from atlas_tpu.io.record import RecordReader, RecordWriter

    rng = np.random.default_rng(0)
    a = rng.normal(size=(13, 7))
    b = np.arange(100, dtype=np.int32)
    path = str(tmp_path / "test.rec")
    w = RecordWriter()
    w.set("a", a, {"units": "m"})
    w.set("b", b)
    w.write(path)
    r = RecordReader(path)
    assert set(r.keys()) == {"a", "b"}
    np.testing.assert_array_equal(r.read("a"), a)
    np.testing.assert_array_equal(r.read("b"), b)
    assert r.metadata("a")["units"] == "m"
    # individual reads don't need the rest of the file
    assert r.read("b").dtype == np.int32


def test_library_information():
    from atlas_tpu import library

    library.initialise()
    assert library.initialised()
    info = library.information()
    assert "atlas_tpu" in info and "numpy" in info
    library.finalise()
    assert not library.initialised()


def test_gmsh_roundtrip(tmp_path):
    """write_gmsh -> read_gmsh preserves nodes, elements and node fields."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.mesh import MeshGenerator
    from atlas_tpu.output.gmsh import read_gmsh, write_gmsh

    mesh = MeshGenerator("structured").generate(Grid("O8"))
    f = np.arange(mesh.nodes.size, dtype=float)
    path = tmp_path / "o8.msh"
    write_gmsh(mesh, str(path), fields={"idx": f})
    r = read_gmsh(str(path))
    assert r["coords"].shape == (mesh.nodes.size, 3)
    np.testing.assert_allclose(r["coords"][:, :2], mesh.nodes.lonlat, atol=1e-9)
    keep = mesh.cells.halo == 0
    np.testing.assert_array_equal(r["cells"], mesh.cells.nodes[keep])
    np.testing.assert_allclose(r["fields"]["idx"], f, atol=0)


def test_gmsh_binary_roundtrip(tmp_path):
    """Binary 2.2 write + auto-detected read matches the ascii output
    (reference GmshIO binary format, output/detail/GmshIO.cc)."""
    from atlas_tpu import Grid
    from atlas_tpu.mesh import MeshGenerator
    from atlas_tpu.output.gmsh import read_gmsh, write_gmsh

    mesh = MeshGenerator("structured").generate(Grid("O8"))
    f = np.arange(mesh.nodes.size, dtype=float)
    pa = tmp_path / "a.msh"
    pb = tmp_path / "b.msh"
    write_gmsh(mesh, str(pa), fields={"f": f})
    write_gmsh(mesh, str(pb), fields={"f": f}, binary=True)
    a = read_gmsh(str(pa))
    b = read_gmsh(str(pb))
    np.testing.assert_allclose(b["coords"], a["coords"], atol=1e-9)
    np.testing.assert_array_equal(b["cells"], a["cells"])
    np.testing.assert_allclose(b["fields"]["f"], a["fields"]["f"], atol=1e-12)


def test_record_compression_endianness_session(tmp_path):
    """zlib-compressed items, big-endian input normalization, and Session
    reader reuse (reference atlas_io compression/sessions/endianness)."""
    from atlas_tpu.io.record import RecordReader, RecordWriter, Session

    path = str(tmp_path / "z.rec")
    smooth = np.tile(np.arange(100.0), 100)  # highly compressible
    bigend = np.arange(10, dtype=">f8")
    (RecordWriter(compression="zlib")
        .set("smooth", smooth)
        .set("raw", np.arange(5), compression=None)
        .set("bigend", bigend)
        .write(path))
    r = RecordReader(path)
    assert r.index["smooth"]["compression"] == "zlib"
    assert r.index["smooth"]["nbytes"] < r.index["smooth"]["raw_nbytes"] / 2
    assert r.index["raw"]["compression"] is None
    np.testing.assert_array_equal(r.read("smooth"), smooth)
    np.testing.assert_array_equal(r.read("raw"), np.arange(5))
    out = r.read("bigend")
    assert out.dtype.byteorder in ("=", "<")  # native on read
    np.testing.assert_array_equal(out, np.arange(10))
    with Session() as s:
        r1 = s.record(path)
        r2 = s.record(path)
        assert r1 is r2
        np.testing.assert_array_equal(s.read(path, "smooth"), smooth)

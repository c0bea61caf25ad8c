"""FunctionSpace / Field / checksum / redistribution tests."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.field import Field, FieldSet
from atlas_tpu.functionspace import (
    BlockStructuredColumns,
    NodeColumns,
    PointCloud,
    Spectral,
    StructuredColumns,
)
from atlas_tpu.parallel.checksum import checksum
from atlas_tpu.partition import Distribution, Partitioner
from atlas_tpu.redistribution import Redistribution


def test_structured_columns_fields():
    g = Grid("O8")
    fs = StructuredColumns(g)
    f = fs.create_field("t", levels=3)
    assert f.shape == (g.size, 3)
    assert f.functionspace is fs
    i, j = fs.index_i, fs.index_j
    np.testing.assert_array_equal(fs.index(i, j), np.arange(g.size))


def test_block_structured_columns():
    g = Grid("O8")
    fs = BlockStructuredColumns(g, nproma=32)
    assert fs.nblk == -(-g.size // 32)
    assert fs.block_size(fs.nblk - 1) == g.size - (fs.nblk - 1) * 32
    flat = np.arange(g.size, dtype=np.float64)
    blocked = fs.to_blocks(flat)
    assert blocked.shape == (fs.nblk, 32)
    np.testing.assert_array_equal(fs.from_blocks(blocked), flat)


def test_node_columns_statistics():
    fs = NodeColumns(Grid("O8"))
    f = fs.create_field("v")
    lat = fs.lonlat()[:, 1]
    data = np.sin(np.deg2rad(lat))
    mn = fs.minimum(data)
    mx = fs.maximum(data)
    assert mn < 0 < mx
    mean, n = fs.mean(data)
    assert n == fs.nb_nodes_global
    s_oi, _ = fs.order_independent_sum(data)
    s, _ = fs.sum(data)
    assert abs(s_oi - s) < 1e-9
    val, loc = fs.maximum_and_location(data)
    assert abs(val - mx) < 1e-15
    mean2, std, _ = fs.mean_and_standard_deviation(data)
    assert std > 0


def test_spectral_functionspace():
    fs = Spectral(truncation=7)
    assert fs.nspec2 == 8 * 9
    f = fs.create_field()
    assert f.shape == (fs.nspec2,)
    data = np.zeros(fs.nspec2)
    data[0] = 3.0  # (m=0, n=0) real
    assert abs(fs.norm(data) - 3.0) < 1e-15


def test_point_cloud():
    pts = np.array([[0.0, 0.0], [90.0, 45.0]])
    fs = PointCloud(pts)
    assert fs.size == 2
    f = fs.create_field(levels=2, variables=3)
    assert f.shape == (2, 2, 3)


def test_fieldset():
    g = Grid("O8")
    fs = StructuredColumns(g)
    s = FieldSet()
    s.add(fs.create_field("a"))
    s.add(fs.create_field("b", levels=2))
    assert s.field_names() == ["a", "b"]
    assert s["b"].shape == (g.size, 2)
    with pytest.raises(KeyError):
        s.add(fs.create_field("a"))


def test_checksum_order_independent():
    rng = np.random.default_rng(0)
    x = rng.normal(size=1000)
    c1 = checksum(x)
    c2 = checksum(x[::-1].copy())
    c3 = checksum(rng.permutation(x))
    assert c1 == c2 == c3
    assert checksum(x + 1e-300) == c1  # bit-level: unchanged values
    y = x.copy()
    y[0] = np.nextafter(y[0], 1)
    assert checksum(y) != c1  # any bit flip changes it


def test_redistribution_roundtrip():
    g = Grid("O8")
    da = Distribution(g, Partitioner("bands", nb_parts=4))
    db = Distribution(g, Partitioner("equal_regions", nb_parts=3))
    r = Redistribution(g, da, db)
    flat = np.arange(g.size, dtype=np.float64)
    blocks_a = np.zeros((4, r.nmax_a))
    for p, idx in enumerate(r.idx_a):
        blocks_a[p, : len(idx)] = flat[idx]
    blocks_b = r.execute(blocks_a)
    back = np.zeros(g.size)
    for p, idx in enumerate(r.idx_b):
        back[idx] = blocks_b[p, : len(idx)]
    np.testing.assert_array_equal(back, flat)


def test_pointcloud_halo_creation():
    """PointCloud from grid + partitioner with radius halos (reference
    test_pointcloud_halo_creation.cc): ghosts = points of other parts within
    the radius of an owned point; exchange fills them from their owners."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.functionspace.point_cloud import PointCloud

    grid = Grid("O16")
    pc = PointCloud(grid, partitioner="equal_regions", nb_parts=4,
                    halo_radius=0.15)
    assert pc.nb_parts == 4
    assert pc.nb_owned.sum() == grid.size
    # ghosts are owned elsewhere and carry valid remote indices
    for p, t in enumerate(pc.local_tables):
        gh = t[pc.nb_owned[p]:]
        assert (np.asarray(pc.distribution.partition)[gh] != p).all()
        rows = np.arange(pc.nb_owned[p], len(t))
        assert (pc.remote_index[p, rows] >= 0).all()
        assert pc.ghost[p, rows].all()
    # host halo exchange fills ghosts with the owner values
    f = np.arange(grid.size, dtype=np.float64) * 2.0
    loc = pc.scatter(f)
    loc = pc.halo_exchange(loc)
    for p, t in enumerate(pc.local_tables):
        np.testing.assert_array_equal(loc[p, : len(t)], f[t])
    np.testing.assert_array_equal(pc.gather(loc), f)


def test_pointcloud_halo_exchange_device():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from atlas_tpu import Grid
    from atlas_tpu.functionspace.point_cloud import PointCloud

    grid = Grid("O8")
    pc = PointCloud(grid, partitioner="equal_regions", nb_parts=8,
                    halo_radius=0.3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("pc",))
    f = np.linspace(0, 1, grid.size)
    loc = jax.device_put(jnp.asarray(pc.scatter(f)),
                         NamedSharding(mesh, P("pc")))
    out = np.asarray(pc.halo_exchange(loc, axis_name="pc", mesh=mesh))
    ref = pc.halo_exchange(pc.scatter(f))
    np.testing.assert_allclose(out[:, : pc.dummy], ref[:, : pc.dummy])


def test_functionspace_base_polygon_and_matching():
    """FunctionSpace.polygon(part) + MatchingFunctionSpacePartitioner
    (reference FunctionSpace::polygon, util/PartitionPolygon.cc;
    MatchingFunctionSpacePartitionerLonLatPolygon.cc)."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.functionspace import FunctionSpace, StructuredColumns
    from atlas_tpu.partition import Partitioner
    from atlas_tpu.partition.distribution import Distribution
    from atlas_tpu.partition.matching import MatchingFunctionSpacePartitioner

    grid = Grid("O16")
    dist = Distribution(grid, Partitioner("equal_bands", nb_parts=4))
    fs = StructuredColumns(grid, distribution=dist)
    assert isinstance(fs, FunctionSpace)
    polys = fs.polygons()
    assert len(polys) == 4
    # every part's own points land inside (or on) its polygon's lat range
    lonlat = grid.lonlat()
    for p in range(4):
        pts = lonlat[np.asarray(dist.partition) == p]
        poly = fs.polygon(p)
        assert poly.shape[1] == 2
        assert pts[:, 1].min() >= poly[:, 1].min() - 1e-9
        assert pts[:, 1].max() <= poly[:, 1].max() + 1e-9

    # matching partitioner reproduces band ownership on a different grid
    mp = MatchingFunctionSpacePartitioner(fs)
    tgt = Grid("O8")
    part = mp.partition(tgt)
    assert part.min() >= 0 and part.max() <= 3
    # band ownership: part index non-decreasing as latitude decreases
    lat = tgt.lonlat()[:, 1]
    order = np.argsort(-lat, kind="stable")
    assert (np.diff(part[order]) >= 0).mean() > 0.99

"""GatherScatter / Collect / Locate / adjoint halo exchange / Cell+EdgeColumns.

Reference analogs: src/tests/parallel/test_gather.cc, test_haloexchange.cc
(adjoint sections), parallel/Collect.h usage, functionspace CellColumns /
EdgeColumns tests (src/tests/mesh/test_cellcolumns.cc).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from atlas_tpu import Grid
from atlas_tpu.functionspace import CellColumns, EdgeColumns
from atlas_tpu.parallel import ShardedFvm
from atlas_tpu.parallel.gather_scatter import Collect, GatherScatter, Locate
from atlas_tpu.parallel.halo import apply_schedule, apply_schedule_adjoint
from atlas_tpu.partition import Distribution


NPARTS = 8
AX = "parts"


def _padded_layout(grid, nparts=NPARTS):
    """Owned-points-only padded layout (nparts, max_pts) of global indices."""
    dist = Distribution(grid, nb_parts=nparts, partitioner="equal_regions")
    max_pts = int(dist.max_pts)
    gidx = np.full((nparts, max_pts), -1, dtype=np.int64)
    for p in range(nparts):
        g = dist.global_indices(p)
        gidx[p, : len(g)] = g
    return gidx, max_pts


@pytest.fixture(scope="module")
def layout():
    grid = Grid("O16")
    gidx, max_pts = _padded_layout(grid)
    return grid, gidx, max_pts


def test_gather_scatter_roundtrip(layout):
    grid, gidx, max_pts = layout
    gs = GatherScatter(gidx, grid.size)
    glb = np.arange(grid.size, dtype=np.float64)
    loc = gs.scatter(glb)
    assert loc.shape == (NPARTS, max_pts)
    back = gs.gather(loc)
    np.testing.assert_array_equal(back, glb)


def test_gather_scatter_jit(layout):
    grid, gidx, max_pts = layout
    gs = GatherScatter(gidx, grid.size)
    glb = np.arange(grid.size, dtype=np.float64)
    loc = gs.scatter(glb)

    mesh = Mesh(np.array(jax.devices()[:NPARTS]), (AX,))

    @jax.jit
    def run(loc):
        f = shard_map(
            lambda x: gs.gather_jit(x[0], AX),
            mesh=mesh,
            in_specs=P(AX),
            out_specs=P(),
            check_rep=False,
        )(loc)
        return f

    out = np.asarray(run(jnp.asarray(loc)))
    np.testing.assert_array_equal(out, glb)

    @jax.jit
    def run_scatter(glb):
        return shard_map(
            lambda g: gs.scatter_jit(g[0], AX)[None],
            mesh=mesh,
            in_specs=P(),
            out_specs=P(AX),
        )(glb[None])

    loc2 = np.asarray(run_scatter(jnp.asarray(glb)))
    np.testing.assert_array_equal(loc2.reshape(NPARTS, max_pts), loc)


def test_locate(layout):
    grid, gidx, max_pts = layout
    loc = Locate(gidx, grid.size)
    rng = np.random.default_rng(0)
    g = rng.integers(0, grid.size, 50)
    part, local = loc(g)
    np.testing.assert_array_equal(gidx[part, local], g)


def test_collect_host_and_jit(layout):
    grid, gidx, max_pts = layout
    rng = np.random.default_rng(1)
    # each part requests 5 random foreign points
    req_part, req_local, my_part = [], [], []
    for p in range(NPARTS):
        for _ in range(5 + p):  # unequal request counts
            q = int(rng.integers(0, NPARTS))
            npts = int((gidx[q] >= 0).sum())
            req_part.append(q)
            req_local.append(int(rng.integers(0, npts)))
            my_part.append(p)
    coll = Collect(np.array(req_part), np.array(req_local), np.array(my_part), NPARTS, max_pts)

    vals = np.where(gidx >= 0, gidx.astype(np.float64), 0.0)
    expect = coll.host(vals)
    np.testing.assert_array_equal(expect, gidx[req_part, req_local].astype(np.float64))

    mesh = Mesh(np.array(jax.devices()[:NPARTS]), (AX,))

    @jax.jit
    def run(loc):
        return shard_map(
            lambda x: coll.jit(x[0], AX)[None],
            mesh=mesh,
            in_specs=P(AX),
            out_specs=P(AX),
        )(loc)

    out = np.asarray(run(jnp.asarray(vals))).reshape(NPARTS, coll.width)
    for i, (p, s) in enumerate(zip(my_part, coll.slot)):
        assert out[p, s] == expect[i]


def test_adjoint_halo_dot_product():
    """<H x, y> == <x, H^T y> (reference HaloExchange execute_adjoint)."""
    grid = Grid("O16")
    sh = ShardedFvm(grid, nparts=NPARTS, partitioner="equal_regions")
    sched = sh.schedule
    nloc = sh.nloc
    rng = np.random.default_rng(3)
    x = rng.standard_normal((NPARTS, nloc))
    y = rng.standard_normal((NPARTS, nloc))
    x[:, sched.dummy] = 0.0
    y[:, sched.dummy] = 0.0

    mesh = Mesh(np.array(jax.devices()[:NPARTS]), (AX,))

    @jax.jit
    def fwd(f):
        return shard_map(
            lambda b: apply_schedule(sched, b[0], AX)[None],
            mesh=mesh, in_specs=P(AX), out_specs=P(AX),
        )(f)

    @jax.jit
    def adj(f):
        return shard_map(
            lambda b: apply_schedule_adjoint(sched, b[0], AX)[None],
            mesh=mesh, in_specs=P(AX), out_specs=P(AX),
        )(f)

    Hx = np.array(fwd(jnp.asarray(x)))
    HTy = np.array(adj(jnp.asarray(y)))
    Hx[:, sched.dummy] = 0.0
    HTy[:, sched.dummy] = 0.0
    assert abs((Hx * y).sum() - (x * HTy).sum()) < 1e-10

    # H^T zeroes every ghost row
    for r in range(sched.n_rounds):
        for p in range(NPARTS):
            rows = sched.recv_idx[r][p]
            rows = rows[rows != sched.dummy]
            assert (HTy[p, rows] == 0).all()


def test_cell_columns():
    grid = Grid("O16")
    fs = CellColumns(grid)
    assert fs.nb_cells > 0
    f = fs.create_field("t", levels=3)
    assert f.data.shape == (fs.nb_cells, 3)
    # halo exchange copies owner values onto ghost cells
    vals = fs.mesh.cells.global_index.astype(np.float64).copy()
    vals[fs._ghost] = -1.0
    out = fs.halo_exchange(vals.copy())
    np.testing.assert_array_equal(out, fs.mesh.cells.global_index.astype(np.float64))
    # gather returns each owned cell once
    g = fs.gather(out)
    assert len(g) == fs.nb_owned
    assert len(np.unique(fs.mesh.cells.global_index[fs._owned])) == fs.nb_owned


def test_edge_columns():
    grid = Grid("O16")
    fs = EdgeColumns(grid)
    assert fs.nb_edges > 0
    # build the node-pair key field and check halo exchange restores it
    gn = fs.mesh.nodes.global_index[fs.mesh.edges.nodes.astype(np.int64)]
    key = np.minimum(gn[:, 0], gn[:, 1]) * 1e-3 + np.maximum(gn[:, 0], gn[:, 1])
    vals = key.copy()
    vals[fs._ghost] = -1.0
    out = fs.halo_exchange(vals.copy())
    np.testing.assert_allclose(out, key)
    s = fs.scatter(fs.gather(key))
    np.testing.assert_allclose(s, key)


def test_multihost_scaffolding():
    """Host-aware mesh helpers (single-host degenerate case on the virtual
    CPU mesh; SURVEY 5.8 multi-host layout: hosts outer, ICI inner)."""
    import jax

    from atlas_tpu.parallel.multihost import (flat_mesh, host_aware_mesh,
                                              initialize_distributed)

    initialize_distributed()  # no-op single process
    m = host_aware_mesh()
    assert m.axis_names == ("dcn", "ici")
    assert m.devices.shape == (1, len(jax.devices()))
    f = flat_mesh()
    assert f.devices.shape == (len(jax.devices()),)
    # the flat mesh is usable for a real sharded computation
    from jax.sharding import NamedSharding, PartitionSpec as P
    import jax.numpy as jnp

    x = jax.device_put(jnp.arange(16.0), NamedSharding(f, P("sp")))
    assert float(x.sum()) == 120.0

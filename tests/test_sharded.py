"""Distributed fvm tests on a virtual 8-device CPU mesh.

Mirrors the reference's distributed test strategy (SURVEY.md section 4):
results across decompositions must match the serial result — the reference
asserts bit-identical checksums (atlas-benchmark.cc:25-28); here owned values
are compared exactly.
"""

import numpy as np
import pytest

import jax

from atlas_tpu import Grid
from atlas_tpu.fvm import FvmMethod, Nabla
from atlas_tpu.parallel import ShardedFvm
from atlas_tpu.parallel.halo import build_rounds


def test_build_rounds_is_permutation_decomposition():
    pairs = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (3, 1)]
    rounds = build_rounds(pairs)
    seen = []
    for rnd in rounds:
        srcs = [s for s, _ in rnd]
        dsts = [d for _, d in rnd]
        assert len(set(srcs)) == len(srcs)
        assert len(set(dsts)) == len(dsts)
        seen += rnd
    assert sorted(seen) == sorted(pairs)


@pytest.fixture(scope="module")
def o16():
    grid = Grid("O16")
    return grid, FvmMethod(grid), ShardedFvm(grid, nparts=8, partitioner="equal_regions")


@pytest.mark.parametrize("partitioner", ["equal_regions", "bands"])
def test_sharded_gradient_matches_serial(partitioner, o16):
    assert len(jax.devices()) >= 8
    if partitioner == "equal_regions":
        grid, serial, sh = o16
    else:
        grid = Grid("O16")
        serial = FvmMethod(grid)
        sh = ShardedFvm(grid, nparts=8, partitioner=partitioner)
    nabla = Nabla(serial)
    g = serial.geometry

    lat = np.deg2rad(g.lonlat[:, 1])
    lon = np.deg2rad(g.lonlat[:, 0])
    f_mesh = (np.sin(lat) * np.cos(2 * lon))[:, None]  # (nnodes, 1)
    grad_serial = np.asarray(nabla.gradient(f_mesh, halo_exchange=False))

    # grid-ordered field (owned mesh nodes come first, in grid order)
    f_grid = f_mesh[: grid.size]
    f_sharded = sh.scatter_field(f_grid)
    grad_sh = sh.gradient(f_sharded)
    grad_back = sh.gather_field(grad_sh)

    # serial owned-node results (mesh nodes 0..size-1 are the grid points).
    # Each configuration is deterministic run-to-run; across decompositions XLA
    # may reassociate the padded segment-sum, so agreement is to ~1e-21
    # roundoff rather than bitwise (the reference asserts bit-identical sums
    # because its loop order is fixed in C++).
    np.testing.assert_allclose(grad_back, grad_serial[: grid.size], rtol=0, atol=1e-18)


def test_sharded_divergence_and_curl_match_serial(o16):
    grid, serial, sh = o16
    nabla = Nabla(serial)
    g = serial.geometry

    from atlas_tpu.util.functions import SolidBodyRotation

    flow = SolidBodyRotation(beta=45.0)
    u, v = flow.wind(g.lonlat[:, 0], g.lonlat[:, 1])
    uv_mesh = np.stack([u, v], axis=-1)[:, None, :]  # (nnodes, 1, 2)

    div_serial = np.asarray(nabla.divergence(uv_mesh, halo_exchange=False))
    curl_serial = np.asarray(nabla.curl(uv_mesh, halo_exchange=False))

    uv_sharded = sh.scatter_field(uv_mesh[: grid.size])
    div_back = sh.gather_field(sh.divergence(uv_sharded))
    curl_back = sh.gather_field(sh.curl(uv_sharded))

    np.testing.assert_allclose(div_back, div_serial[: grid.size], rtol=0, atol=1e-18)
    np.testing.assert_allclose(curl_back, curl_serial[: grid.size], rtol=0, atol=1e-18)


def test_sharded_field_roundtrip():
    grid = Grid("O8")
    sh = ShardedFvm(grid, nparts=4)
    f = np.random.default_rng(0).normal(size=(grid.size, 3))
    back = sh.gather_field(sh.scatter_field(f))
    np.testing.assert_array_equal(back, f)


def test_sharded_redistribution_matches_host():
    """Device all_to_all redistribution == host global-index reshuffle."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.partition.distribution import Distribution
    from atlas_tpu.redistribution import Redistribution, ShardedRedistribution

    grid = Grid("O16")
    da = Distribution(grid, "equal_regions", nb_parts=8)
    db = Distribution(grid, "equal_bands", nb_parts=8)
    host = Redistribution(grid, da, db)
    dev = ShardedRedistribution(grid, da, db)

    rng = np.random.default_rng(0)
    f = rng.standard_normal(grid.size)
    blocks_a = np.zeros((8, host.nmax_a))
    for p, idx in enumerate(host.idx_a):
        blocks_a[p, : len(idx)] = f[idx]

    ref = host.execute(blocks_a)
    got = np.asarray(dev.execute(blocks_a))
    np.testing.assert_allclose(got, ref, atol=0)

    # multi-level fields route identically
    f2 = rng.standard_normal((grid.size, 3))
    ba2 = np.zeros((8, host.nmax_a, 3))
    for p, idx in enumerate(host.idx_a):
        ba2[p, : len(idx)] = f2[idx]
    np.testing.assert_allclose(
        np.asarray(dev.execute(ba2)), host.execute(ba2), atol=0)


@pytest.mark.parametrize("halo", [2, 3])
def test_sharded_halo_k_gradient_matches_serial(halo):
    """halo-k ghosts (BuildHalo.cc:1372 equivalent) leave owned results
    unchanged — the extra rings only widen the evaluation set."""
    grid = Grid("O16")
    serial = FvmMethod(grid)
    sh = ShardedFvm(grid, nparts=8, partitioner="equal_regions", halo=halo)
    nabla = Nabla(serial)
    g = serial.geometry
    lat = np.deg2rad(g.lonlat[:, 1])
    lon = np.deg2rad(g.lonlat[:, 0])
    f_mesh = (np.cos(lat) * np.sin(3 * lon))[:, None]
    grad_serial = np.asarray(nabla.gradient(f_mesh, halo_exchange=False))
    grad_back = sh.gather_field(sh.gradient(sh.scatter_field(f_mesh[: grid.size])))
    np.testing.assert_allclose(grad_back, grad_serial[: grid.size], rtol=0, atol=1e-18)


def test_sharded_laplacian_single_exchange_matches_serial():
    """halo-2 laplacian: ONE exchange, grad at ring-1 nodes, div at owned —
    matches serial div(grad) (reference Nabla.cc:560-568)."""
    grid = Grid("O16")
    serial = FvmMethod(grid)
    nabla = Nabla(serial)
    g = serial.geometry
    lat = np.deg2rad(g.lonlat[:, 1])
    lon = np.deg2rad(g.lonlat[:, 0])
    f_mesh = (np.sin(2 * lat) * np.cos(lon))[:, None]
    lap_serial = np.asarray(nabla.laplacian(f_mesh, halo_exchange=False))

    sh = ShardedFvm(grid, nparts=8, partitioner="equal_regions", halo=2)
    lap_back = sh.gather_field(sh.laplacian(sh.scatter_field(f_mesh[: grid.size])))
    np.testing.assert_allclose(
        lap_back, lap_serial[: grid.size], rtol=1e-12, atol=1e-18)

    with pytest.raises(ValueError):
        ShardedFvm(grid, nparts=4, partitioner="bands", halo=1).laplacian(
            sh.scatter_field(f_mesh[: grid.size]))


def test_sharded_gradient_O320_nlev137_matches_serial():
    """Reference-scale distributed workload: the north-star benchmark grid
    carries nlev=137 through the distributed gradient
    (atlas-benchmark.cc:188-283 runs O---/nlev=137 under MPI)."""
    grid = Grid("O320")
    serial = FvmMethod(grid)
    sh = ShardedFvm(grid, nparts=8, partitioner="equal_regions")
    nlev = 137
    g = serial.geometry
    lat = np.deg2rad(g.lonlat[:, 1])
    lon = np.deg2rad(g.lonlat[:, 0])
    prof = 1.0 + 0.01 * np.arange(nlev)
    f = ((np.sin(lat) * np.cos(2 * lon))[:, None] * prof[None, :]).astype(
        np.float32)
    grad_serial = np.asarray(
        Nabla(serial).gradient(f, halo_exchange=False))
    out = sh.gather_field(sh.gradient(sh.scatter_field(f[: grid.size])))
    scale = float(np.abs(grad_serial).max())
    err = float(np.abs(out - grad_serial[: grid.size]).max()) / scale
    assert err < 1e-6, err


def test_sharded_structured_gradient_bit_identical():
    """Band-sharded shift-structured Pallas gradient == serial Pallas
    gradient BIT-FOR-BIT (the distributed path runs the identical hot
    kernel per band + an 8-row window recompute at band edges; reference
    Nabla.cc:96-188 runs the same loop serial and distributed)."""
    import jax.numpy as jnp
    import numpy as np

    from atlas_tpu import Grid
    from atlas_tpu.parallel import ShardedStructuredFvm

    g = Grid("O32")
    sh = ShardedStructuredFvm(g, 4, dtype=np.float32)
    rng = np.random.default_rng(0)
    nlev = 3
    f = rng.normal(size=(g.size, nlev)).astype(np.float32)

    pg = sh.serial
    s = sh.sfvm.shifts
    fl = np.zeros((nlev, s.ny, s.nxw), np.float32)
    fl[:, s.row_of_point, s.col_of_point] = f.T
    ft = pg.tile(sh.sfvm.fill_halo(jnp.asarray(fl)))
    gxs, gys = pg(ft)
    ref_x = np.asarray(pg.untile(gxs, nlev))[
        :, s.row_of_point, s.col_of_point].T
    ref_y = np.asarray(pg.untile(gys, nlev))[
        :, s.row_of_point, s.col_of_point].T

    out = sh.gather_grad(sh.gradient(sh.scatter_field(f)))
    np.testing.assert_array_equal(out[:, :, 0], ref_x)
    np.testing.assert_array_equal(out[:, :, 1], ref_y)

"""DistributedStructuredColumns: owned box, halo-k bounds, exchange, and
distributed interpolation execute (reference StructuredColumns_setup.cc +
Method::do_execute semantics)."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.functionspace.structured_columns_dist import (
    DistributedStructuredColumns,
)
from atlas_tpu.interpolation import Interpolation
from atlas_tpu.interpolation.distributed import DistributedInterpolation


@pytest.mark.parametrize("partitioner,gname", [
    ("equal_bands", "O32"), ("checkerboard", "L64x33"),
])
@pytest.mark.parametrize("halo", [1, 2])
def test_owned_box_covers_distribution(partitioner, gname, halo):
    grid = Grid(gname)
    fs = DistributedStructuredColumns(
        grid, nb_parts=4, partitioner=partitioner, halo=halo)
    # every global point owned exactly once
    assert fs.nb_owned.sum() == grid.size
    po, ro, co = np.nonzero(fs.owned_mask)
    g = fs.global_index[po, ro, co]
    assert len(np.unique(g)) == grid.size
    # owner part agrees with the distribution
    assert (fs.distribution.partition[g] == po).all()


@pytest.mark.parametrize("halo", [1, 2, 3])
def test_halo_box_contains_k_ring(halo):
    """Every point within `halo` rows and `halo` columns (x-projected) of an
    owned point must be a valid slot on that part."""
    grid = Grid("O16")
    fs = DistributedStructuredColumns(
        grid, nb_parts=4, partitioner="equal_bands", halo=halo)
    nx = np.asarray(grid.nx)
    xmin, dx = np.asarray(grid.xmin), np.asarray(grid.dx)
    lut = {}
    for p in range(fs.nparts):
        l = np.full(grid.size, -1)
        vr, vc = np.nonzero(fs.valid_mask[p])
        l[fs.global_index[p, vr, vc]] = 1
        lut[p] = l
    ig, jg = grid.ij()
    rng = np.random.default_rng(0)
    for t in rng.choice(grid.size, 200, replace=False):
        p = fs.distribution.partition[t]
        i, j = ig[t], jg[t]
        x = xmin[j] + i * dx[j]
        for dj in range(-halo, halo + 1):
            j2 = j + dj
            if not (0 <= j2 < grid.ny):
                continue
            ic = int(np.floor((x - xmin[j2]) / dx[j2]))
            for di in range(-halo + 1, halo):
                g2 = grid.index(int((ic + di) % nx[j2]), j2)
                assert lut[p][g2] >= 0, (t, p, dj, di)


def test_halo_exchange_host_and_device():
    import jax

    grid = Grid("O32")
    fs = DistributedStructuredColumns(
        grid, nb_parts=8, partitioner="equal_bands", halo=2)
    f = np.arange(grid.size, dtype=np.float64) * 0.5 + 3.0
    # host path
    loc = fs.scatter(f)
    loc = fs.halo_exchange(loc)
    ref = fs.scatter_with_halos(f)
    np.testing.assert_array_equal(loc, ref)
    # gather returns the original
    np.testing.assert_array_equal(fs.gather(loc), f)
    # device path on the 8-device CPU mesh
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:8]), ("sc",))
    sharding = NamedSharding(mesh, P("sc"))
    loc_d = jax.device_put(jnp.asarray(fs.scatter(f)), sharding)
    out_d = np.asarray(fs.halo_exchange(loc_d, axis_name="sc", mesh=mesh))
    # the dummy padding slot absorbs padded recv writes; exclude it
    np.testing.assert_allclose(out_d[:, : fs.dummy], ref[:, : fs.dummy])


def test_remote_index_points_at_owner():
    grid = Grid("O16")
    fs = DistributedStructuredColumns(
        grid, nb_parts=4, partitioner="equal_bands", halo=1)
    pg, rg, cg = np.nonzero(fs.valid_mask & ~fs.owned_mask)
    g = fs.global_index[pg, rg, cg]
    owner = fs.partition[pg, rg, cg]
    remote = fs.remote_index[pg, rg, cg]
    # reading the owner's slot must give the same global index
    ro, co = remote // fs.cols_loc, remote % fs.cols_loc
    assert (fs.global_index[owner, ro, co] == g).all()
    assert (fs.owned_mask[owner, ro, co]).all()


def test_distributed_bicubic_matches_serial():
    src = Grid("O32")
    tgt = Grid("L90x46")
    interp = Interpolation("structured-bicubic", src, tgt)
    f = np.cos(3 * np.deg2rad(src.lonlat()[:, 0])) * np.sin(
        2 * np.deg2rad(src.lonlat()[:, 1]))
    ref = np.asarray(interp.execute(f))
    from atlas_tpu.parallel.checksum import checksum

    sums = []
    for nparts in (1, 2, 8):
        fs = DistributedStructuredColumns(
            src, nb_parts=nparts, partitioner="equal_bands", halo=2)
        dist = DistributedInterpolation(interp, fs)
        out = dist.execute(f)
        np.testing.assert_allclose(out, ref, rtol=0, atol=1e-13)
        sums.append(checksum(out))
    # checksums bit-identical across decompositions (mgrids acceptance
    # criterion, atest_mgrids.cc:73-92 + compare.cmake)
    assert len(set(sums)) == 1, sums


def test_distributed_bicubic_sharded_device():
    src = Grid("O32")
    tgt = Grid("L90x46")
    interp = Interpolation("structured-bicubic", src, tgt)
    ll = src.lonlat()
    f = np.cos(2 * np.deg2rad(ll[:, 0])) * np.cos(np.deg2rad(ll[:, 1]))
    ref = np.asarray(interp.execute(f))
    fs = DistributedStructuredColumns(
        src, nb_parts=8, partitioner="equal_bands", halo=2)
    dist = DistributedInterpolation(interp, fs)
    out = dist.execute_sharded(f)
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-6)

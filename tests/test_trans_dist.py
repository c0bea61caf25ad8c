"""Distributed spectral transform vs the rank-local TransLocal.

Mirrors the reference's TransIFS-vs-TransLocal consistency checks
(src/tests/trans/test_transgeneral.cc) on a virtual 8-device CPU mesh.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.trans.dist import SpectralDistribution, TransDistributed
from atlas_tpu.trans.legendre import nspec2, spectral_index
from atlas_tpu.trans.trans_local import TransLocal


def random_spectra(t, nf=3, seed=0):
    rng = np.random.default_rng(seed)
    sp = rng.standard_normal((nf, nspec2(t)))
    ms, _ = spectral_index(t)
    # m = 0 imaginary parts must vanish for a real field
    sp[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    return sp


def test_spectral_distribution_counts():
    d = SpectralDistribution(21, 4)
    all_ms = np.sort(np.concatenate([d.my_ms(p) for p in range(4)]))
    np.testing.assert_array_equal(all_ms, np.arange(22))
    assert sum(d.nspec2(p) for p in range(4)) == nspec2(21)
    assert max(d.nump(p) for p in range(4)) == d.mloc


@pytest.mark.parametrize("gridname,t", [("F24", 23), ("O24", 23), ("N16", 15)])
def test_invtrans_matches_serial(gridname, t):
    grid = Grid(gridname)
    sp = random_spectra(t)
    serial = TransLocal(grid, t, dtype=np.float64)
    dist = TransDistributed(grid, t, nparts=8, dtype=np.float64)
    ref = np.asarray(serial.invtrans(sp))
    got = dist.invtrans(sp)
    np.testing.assert_allclose(got, ref, atol=1e-11)


def test_invtrans_uneven_devices():
    # ny = 38 rows over 8 devices (padded bands), T+1 = 20 m's over 8
    grid = Grid("O19")
    sp = random_spectra(19, nf=1)
    serial = TransLocal(grid, 19, dtype=np.float64)
    dist = TransDistributed(grid, 19, nparts=8, dtype=np.float64)
    np.testing.assert_allclose(
        dist.invtrans(sp), np.asarray(serial.invtrans(sp)), atol=1e-11)


@pytest.mark.parametrize("gridname,t", [("F32", 31), ("O24", 23)])
def test_roundtrip_gaussian(gridname, t):
    """dirtrans(invtrans(a)) == a on Gaussian grids (quadrature exactness)."""
    grid = Grid(gridname)
    sp = random_spectra(t, nf=2, seed=1)
    dist = TransDistributed(grid, t, nparts=8, dtype=np.float64)
    gp = dist.invtrans(sp)
    back = dist.dirtrans(gp)
    np.testing.assert_allclose(back, sp, atol=1e-10)


def test_dirtrans_matches_serial():
    grid = Grid("F24")
    t = 23
    serial = TransLocal(grid, t, dtype=np.float64)
    dist = TransDistributed(grid, t, nparts=8, dtype=np.float64)
    rng = np.random.default_rng(7)
    sp0 = random_spectra(t, nf=1, seed=3)
    gp = np.asarray(serial.invtrans(sp0))
    np.testing.assert_allclose(
        dist.dirtrans(gp), np.asarray(serial.dirtrans(gp)), atol=1e-11)


def test_sharded_device_path():
    """invtrans_sharded keeps data on the mesh (lat-band sharded output)."""
    import jax

    grid = Grid("F16")
    t = 15
    dist = TransDistributed(grid, t, nparts=8, dtype=np.float64)
    sp = random_spectra(t, nf=1)
    rhs = dist._coef_msharded(sp)  # (np, Q, nf*2) packed layout
    from jax.sharding import NamedSharding, PartitionSpec as P

    rhs = jax.device_put(
        jax.numpy.asarray(rhs), NamedSharding(dist.mesh, P("sp")))
    blocks = dist.invtrans_sharded(rhs)
    assert blocks.shape == (1, 8 * dist.R, grid.nxmax)
    # matches the assembled host-side result
    ref = dist.invtrans(sp)
    got = np.zeros_like(ref)
    sel = dist.gidx >= 0
    got[:, dist.gidx[sel]] = np.asarray(blocks)[:, sel]
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_spectral_functionspace_scatter_gather_roundtrip():
    """Distributed Spectral function space: scatter to per-part local packed
    layouts, gather back, and drive the distributed transform roundtrip
    through the function space (reference Spectral.cc:54-75 gather/scatter
    through trans)."""
    from atlas_tpu.functionspace.spectral import Spectral

    t = 15
    nparts = 4
    sp = random_spectra(t, nf=2)
    fss = [Spectral(t, nb_parts=nparts, part=p) for p in range(nparts)]
    # partition sizes add up and match the distribution
    assert sum(fs.nspec2 for fs in fss) == fss[0].nb_spectral_coefficients_global
    locals_ = [fs.scatter(sp) for fs in fss]
    for fs, loc in zip(fss, locals_):
        assert loc.shape == (2, fs.nspec2)
    back = fss[0].gather(locals_)
    np.testing.assert_array_equal(back, sp)

    # full roundtrip through the function space + distributed transform
    grid = Grid("F16")
    dist = TransDistributed(grid, t, nparts=nparts, dtype=np.float64)
    gp = dist.invtrans(sp)
    sp2 = dist.dirtrans(gp)
    # scatter the roundtripped spectra and compare part-locally
    for fs in fss:
        np.testing.assert_allclose(fs.scatter(sp2), fs.scatter(sp), atol=1e-10)


def test_dist_invtrans_T159_bucketed_tables():
    """Production-class truncation through the slot-bucketed packed tables:
    dist == serial at T159 -> F160, and the bucketed tables stay within ~2x
    of the exact triangular-spectrum footprint (the old dense layout was
    ~4x; reference packs per-m minimally, TransLocal.cc:602-631)."""
    grid = Grid("F160")
    t = 159
    serial = TransLocal(grid, t, dtype=np.float64)
    dist = TransDistributed(grid, t, nparts=8, dtype=np.float64)
    sp = random_spectra(t, nf=2, seed=11)
    a = np.asarray(serial.invtrans(sp))
    b = np.asarray(dist.invtrans(sp))
    np.testing.assert_allclose(b, a, atol=1e-10 * np.abs(a).max())
    assert dist.leg_waste < 1.0, dist.leg_waste


def test_dist_fourstep_fourier_matches_serial():
    """T >= MIN_T_FOURSTEP on a regular grid: the distributed Fourier stage
    runs the four-step GEMM FFT per device under shard_map and must match
    the serial TransLocal (which picks the same algorithm)."""
    import numpy as np
    from atlas_tpu import Grid
    from atlas_tpu.trans import TransLocal, nspec2, spectral_index
    from atlas_tpu.trans.dist import TransDistributed

    g = Grid("F320")
    T = 319
    tl = TransLocal(g, T, dtype=np.float32)
    td = TransDistributed(g, T, nparts=4, dtype=np.float32)
    assert tl.fourier.kind == "fourstep"
    assert td.fourstep is not None, "distributed four-step not engaged"
    rng = np.random.default_rng(0)
    sp = rng.standard_normal((2, nspec2(T))).astype(np.float32)
    ms, _ = spectral_index(T)
    sp[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    a = np.asarray(tl.invtrans(sp))
    b = np.asarray(td.invtrans(sp))
    assert np.abs(a - b).max() / np.abs(a).max() < 1e-5

"""Interpolation tests (reference: src/tests/interpolation/*).

Accuracy on the vortex-rollup analytic field (the reference's standard test
field), adjoint consistency, and conservation for grid-box-average.
"""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.interpolation import Interpolation, StructuredInterpolation2D
from atlas_tpu.util.functions import vortex_rollup


@pytest.fixture(scope="module")
def src():
    grid = Grid("O32")
    ll = grid.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.5)
    return grid, f


def test_bicubic_accuracy(src):
    grid, f = src
    tgt = Grid("S64x32")
    interp = Interpolation("structured-bicubic", grid, tgt)
    out = np.asarray(interp.execute(f))
    tll = tgt.lonlat()
    ref = vortex_rollup(tll[:, 0], tll[:, 1], 0.5)
    err = np.abs(out - ref)
    assert err.max() < 5e-3
    assert err.mean() < 5e-4


def test_bilinear_accuracy(src):
    grid, f = src
    tgt = Grid("S64x32")
    interp = Interpolation("structured-bilinear", grid, tgt)
    out = np.asarray(interp.execute(f))
    tll = tgt.lonlat()
    ref = vortex_rollup(tll[:, 0], tll[:, 1], 0.5)
    assert np.abs(out - ref).max() < 5e-2
    # bilinear less accurate than bicubic
    bic = np.asarray(Interpolation("structured-bicubic", grid, tgt).execute(f))
    assert np.abs(bic - ref).mean() < np.abs(out - ref).mean()


def test_bilinear_exact_on_linear_function(src):
    grid, _ = src
    # bilinear weights reproduce functions linear in index space exactly;
    # a constant is the simplest invariant
    tgt_pts = np.array([[10.0, 20.0], [123.4, -45.6], [359.9, 0.1]])
    interp = StructuredInterpolation2D(grid, tgt_pts, kind="linear")
    ones = np.ones(grid.size)
    np.testing.assert_allclose(np.asarray(interp.execute(ones)), 1.0, atol=1e-14)
    interp4 = StructuredInterpolation2D(grid, tgt_pts, kind="cubic")
    np.testing.assert_allclose(np.asarray(interp4.execute(ones)), 1.0, atol=1e-13)


def test_periodic_seam(src):
    grid, f = src
    # points straddling lon=0/360 must interpolate smoothly
    tgt_pts = np.stack([np.linspace(359.0, 361.0, 21) % 360.0, np.full(21, 10.0)], -1)
    interp = StructuredInterpolation2D(grid, tgt_pts, kind="cubic")
    out = np.asarray(interp.execute(f))
    assert np.abs(np.diff(out)).max() < 0.05


def test_multilevel_fields(src):
    grid, f = src
    tgt_pts = np.array([[45.0, 45.0], [180.0, -30.0]])
    interp = StructuredInterpolation2D(grid, tgt_pts, kind="cubic")
    f2 = np.stack([f, 3 * f], axis=-1)
    out = np.asarray(interp.execute(f2))
    assert out.shape == (2, 2)
    np.testing.assert_allclose(out[:, 1], 3 * out[:, 0], rtol=1e-12)


def test_adjoint_consistency(src):
    grid, f = src
    tgt = Grid("S16x8")
    interp = Interpolation("structured-bicubic", grid, tgt)
    rng = np.random.default_rng(0)
    g = rng.normal(size=tgt.size)
    Af = np.asarray(interp.execute(f))
    Atg = np.asarray(interp.execute_adjoint(g))
    np.testing.assert_allclose(Af @ g, f @ Atg, rtol=1e-12)


def test_nearest_neighbour(src):
    grid, f = src
    # target exactly on source points returns those values
    ll = grid.lonlat()
    pts = ll[[0, 100, 2000]]
    interp = Interpolation("nearest-neighbour", grid, pts)
    out = np.asarray(interp.execute(f))
    np.testing.assert_allclose(out, f[[0, 100, 2000]], atol=1e-14)


def test_knn_weights(src):
    grid, f = src
    pts = np.array([[12.3, 45.6]])
    from atlas_tpu.util.config import Config

    interp = Interpolation(Config(type="k-nearest-neighbours", k=4), grid, pts)
    assert interp.w.shape == (1, 4)
    np.testing.assert_allclose(interp.w.sum(), 1.0, atol=1e-14)


def test_grid_box_average_conserves_mean():
    src_grid = Grid("S32x16")
    tgt_grid = Grid("S16x8")
    interp = Interpolation("grid-box-average", src_grid, tgt_grid)
    # weights rows sum to 1
    np.testing.assert_allclose(interp.w.sum(axis=1), 1.0, atol=1e-12)
    ll = src_grid.lonlat()
    f = vortex_rollup(ll[:, 0], ll[:, 1], 0.2)
    out = np.asarray(interp.execute(f))
    # area-weighted means agree closely (conservative remap)
    def area_w(grid):
        y = grid.y
        edges = np.empty(grid.ny + 1)
        edges[0], edges[-1] = 90.0, -90.0
        edges[1:-1] = 0.5 * (y[:-1] + y[1:])
        band = np.sin(np.deg2rad(edges[:-1])) - np.sin(np.deg2rad(edges[1:]))
        return np.repeat(band / grid.nx, grid.nx)

    m_src = np.average(f, weights=area_w(src_grid))
    m_tgt = np.average(out, weights=area_w(tgt_grid))
    assert abs(m_src - m_tgt) < 2e-3


def test_matrix_cache_reuse_and_disk(tmp_path):
    """MatrixCache skips setup on hit and round-trips through disk
    (reference interpolation/Cache.h:48-146)."""
    from atlas_tpu.interpolation import Interpolation, MatrixCache

    src = Grid("O16")
    tgt = Grid("S36x18")
    cache = MatrixCache()
    i1 = Interpolation("k-nearest-neighbours", src, tgt, cache=cache)
    assert i1._cache_key in cache
    i2 = Interpolation("k-nearest-neighbours", src, tgt, cache=cache)
    np.testing.assert_array_equal(np.asarray(i1.idx), np.asarray(i2.idx))
    np.testing.assert_array_equal(np.asarray(i1.w), np.asarray(i2.w))

    f = np.sin(np.deg2rad(src.lonlat()[:, 0]))
    np.testing.assert_allclose(
        np.asarray(i2.execute(f)), np.asarray(i1.execute(f)), atol=0)

    path = str(tmp_path / "knn.npz")
    cache.save(i1._cache_key, path)
    c2 = MatrixCache.load(i1._cache_key, path)
    i3 = Interpolation("k-nearest-neighbours", src, tgt, cache=c2)
    np.testing.assert_allclose(
        np.asarray(i3.execute(f)), np.asarray(i1.execute(f)), atol=0)


def test_separable_fast_path_matches_flat(src):
    """Structured->uniform-row targets take the separable two-pass fast path
    and reproduce the flat gather-dot exactly (same tensor-product weights,
    reference StructuredInterpolation2D.tcc:239-378 row-coherent kernel)."""
    grid, f = src
    tgt = Grid("L90x46")
    rng = np.random.default_rng(0)
    fields = rng.standard_normal((grid.size, 3))
    for name, kind in [
        ("structured-bilinear", "linear"),
        ("structured-bicubic", "cubic"),
        ("structured-biquasicubic", "quasicubic"),
    ]:
        m = Interpolation(name, grid, tgt)
        assert m._sep is not None, f"{name}: fast path not taken"
        flat = StructuredInterpolation2D(grid, tgt.lonlat(), kind=kind)
        a = np.asarray(m.execute(fields))
        b = np.asarray(flat.execute(fields))
        np.testing.assert_allclose(a, b, atol=1e-12)
        # adjoint: <A x, y> == <x, A^T y>
        y = rng.standard_normal((tgt.size, 3))
        lhs = (a * y).sum()
        rhs = (fields * np.asarray(m.execute_adjoint(y))).sum()
        assert abs(lhs - rhs) < 1e-10 * abs(lhs) + 1e-12
        # lazy flat (idx, w) export still available for matrix()/cache
        assert m.matrix().shape == (tgt.size, grid.size)


def test_separable_not_taken_for_reduced_target(src):
    grid, _ = src
    tgt = Grid("O16")  # reduced rows -> no shared target longitudes
    m = Interpolation("structured-bicubic", grid, tgt)
    assert m._sep is None
    out = np.asarray(m.execute(np.ones(grid.size)))
    np.testing.assert_allclose(out, 1.0, atol=1e-12)


def test_disk_interpolation_cache(tmp_path, monkeypatch):
    """use_cache persists (idx, w) keyed by (type, src uid, tgt uid)
    (reference interpolation/Cache.h:48-146)."""
    import time

    monkeypatch.setenv("ATLAS_TPU_CACHE_PATH", str(tmp_path))
    from atlas_tpu.util.config import Config

    src = Grid("CS-LFR-8") if False else Grid("O16")
    tgt = np.stack([np.linspace(0, 350, 40), np.linspace(-80, 80, 40)], -1)
    from atlas_tpu.functionspace import PointCloud

    pc = PointCloud(tgt)
    cfg = Config(type="k-nearest-neighbours", use_cache=True)
    m1 = Interpolation(cfg, src, pc)
    files = list(tmp_path.rglob("*"))
    assert any(f.is_file() for f in files), "no cache file written"
    m2 = Interpolation(cfg, src, pc)
    np.testing.assert_array_equal(m1.idx, m2.idx)
    np.testing.assert_allclose(m1.w, m2.w)
    f = np.random.default_rng(0).standard_normal(src.size)
    np.testing.assert_allclose(
        np.asarray(m1.execute(f)), np.asarray(m2.execute(f)), atol=1e-12)


def test_pallas_pass1_kernel_matches_windowed():
    """Experimental Pallas pass-1 (interpolation/pallas_pass1.py) reproduces
    the XLA windowed pass-1 on its eligible rows + the gather fallback
    elsewhere (interpret mode off-chip)."""
    import jax.numpy as jnp

    from atlas_tpu.interpolation import Interpolation
    from atlas_tpu.interpolation.pallas_pass1 import Pass1Kernel
    from atlas_tpu.interpolation.structured import _windowed_pass1

    src = Grid("O32")
    tgt = Grid("L90x46")
    interp = Interpolation("structured-bicubic", src, tgt)
    s = interp._sep
    assert s.Wt is not None
    nch = 8
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((src.size, nch)), jnp.float32)
    t = interp._sep_tables(jnp.float32)
    ref = np.asarray(_windowed_pass1(t["pad_gather"], t["win_start"],
                                     t["Wt"], s.nxt, f))
    pk = Pass1Kernel(interp, nch)
    assert len(pk.kernel_rows) > 0
    got = np.asarray(pk.apply(f, t, interpret=True))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


def test_pallas_pass2_matches_gemm():
    """Pallas stacked-bf16 pass 2 (interpret mode) reproduces the banded
    y-combine to the hi/lo-split tolerance (~1e-5 over a k=4 band): all
    four bf16 cross products are realized by the two stacked dots."""
    import jax.numpy as jnp

    from atlas_tpu.interpolation import Interpolation
    from atlas_tpu.interpolation.pallas_pass1 import pass2_rows

    src = Grid("O32")
    tgt = Grid("L90x46")
    interp = Interpolation("structured-bicubic", src, tgt)
    s = interp._sep
    nch = 64
    rng = np.random.default_rng(1)
    tmp = jnp.asarray(rng.standard_normal(
        (s.ny, 128, nch)).astype(np.float32))  # nxt_pad-style block
    Ahl, nyp, nyt = interp._pass2_matrix_hl()
    got = np.asarray(pass2_rows(Ahl, tmp, nyp, 16, interpret=True))[:nyt]
    A = np.asarray(interp._pass2_matrix(jnp.float32), np.float64)
    ref = np.einsum("tj,jxc->txc", A, np.asarray(tmp, np.float64))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    assert err < 2e-5, err

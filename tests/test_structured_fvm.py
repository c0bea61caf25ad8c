"""Shift-structured fvm path vs the mesh-based operators (exact equivalence)."""

import numpy as np
import pytest

import jax.numpy as jnp

from atlas_tpu import Grid
from atlas_tpu.fvm import FvmMethod, Nabla
from atlas_tpu.fvm.structured import StructuredFvm
from atlas_tpu.fvm.pallas_kernels import PallasGradient
from atlas_tpu.util.functions import SolidBodyRotation


@pytest.fixture(scope="module")
def o32():
    grid = Grid("O32")
    method = FvmMethod(grid)
    return grid, method, Nabla(method), StructuredFvm(grid, method=method)


def _fields(method, grid):
    g = method.geometry
    flow = SolidBodyRotation(beta=90.0)
    f = flow.wind_magnitude_squared(g.lonlat[:, 0], g.lonlat[:, 1])
    u, v = flow.wind(g.lonlat[:, 0], g.lonlat[:, 1])
    return f, u, v


def test_structured_gradient_matches_mesh(o32):
    grid, method, nabla, sf = o32
    f, _, _ = _fields(method, grid)
    ref = np.asarray(nabla.gradient(f, halo_exchange=False))[: grid.size]
    gs = np.asarray(sf.gradient(sf.to_layout(f[: grid.size])))
    gx = sf.from_layout(gs[0])[0]
    gy = sf.from_layout(gs[1])[0]
    np.testing.assert_allclose(gx, ref[:, 0], rtol=0, atol=1e-19)
    np.testing.assert_allclose(gy, ref[:, 1], rtol=0, atol=1e-19)


def test_structured_div_curl_match_mesh(o32):
    grid, method, nabla, sf = o32
    _, u, v = _fields(method, grid)
    uv = np.stack([u, v], -1)
    ref_div = np.asarray(nabla.divergence(uv, halo_exchange=False))[: grid.size]
    ref_curl = np.asarray(nabla.curl(uv, halo_exchange=False))[: grid.size]
    up = sf.to_layout(u[: grid.size])
    vp = sf.to_layout(v[: grid.size])
    ds = sf.from_layout(np.asarray(sf.divergence(up, vp)))[0]
    cs = sf.from_layout(np.asarray(sf.curl(up, vp)))[0]
    np.testing.assert_allclose(ds, ref_div, rtol=0, atol=1e-19)
    np.testing.assert_allclose(cs, ref_curl, rtol=0, atol=1e-19)


def test_structured_multilevel_padding(o32):
    grid, method, nabla, sf = o32
    f, _, _ = _fields(method, grid)
    f3 = np.stack([f[: grid.size], 2 * f[: grid.size], -0.5 * f[: grid.size]], axis=1)
    gs = np.asarray(sf.gradient(sf.to_layout(f3)))
    gx = sf.from_layout(gs[0])
    np.testing.assert_allclose(gx[1], 2 * gx[0], rtol=1e-12)
    np.testing.assert_allclose(gx[2], -0.5 * gx[0], rtol=1e-12)


def test_pallas_gradient_matches_mesh(o32):
    grid, method, nabla, sf = o32
    f, _, _ = _fields(method, grid)
    ref = np.asarray(nabla.gradient(f, halo_exchange=False))[: grid.size]
    pg = PallasGradient(sf, dtype=jnp.float64)
    fp = sf.fill_halo(jnp.asarray(sf.to_layout(f[: grid.size])))
    ft = pg.tile(fp)
    gx_t, gy_t = pg(ft)
    gx = sf.from_layout(np.asarray(pg.untile(gx_t, 1)))[0]
    gy = sf.from_layout(np.asarray(pg.untile(gy_t, 1)))[0]
    np.testing.assert_allclose(gx, ref[:, 0], rtol=0, atol=1e-19)
    np.testing.assert_allclose(gy, ref[:, 1], rtol=0, atol=1e-19)


def test_shifts_cache_roundtrip(tmp_path, monkeypatch, o32):
    grid, method, nabla, sf = o32
    monkeypatch.setenv("ATLAS_TPU_CACHE_PATH", str(tmp_path))
    sf1 = StructuredFvm(grid, method=method, use_cache=True)  # writes cache
    sf2 = StructuredFvm(grid, use_cache=True)  # loads cache (no mesh build)
    assert sf2.method is None
    assert sorted(sf2.shifts.keys_regular) == sorted(sf1.shifts.keys_regular)
    for k in sf1.shifts.keys_regular:
        np.testing.assert_array_equal(
            sf1.shifts.keys_regular[k], sf2.shifts.keys_regular[k]
        )
    f, _, _ = _fields(method, grid)
    a = np.asarray(sf1.gradient(sf1.to_layout(f[: grid.size])))
    b = np.asarray(sf2.gradient(sf2.to_layout(f[: grid.size])))
    np.testing.assert_array_equal(a, b)

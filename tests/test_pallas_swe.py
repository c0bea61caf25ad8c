"""Fused Pallas SWE RK3 stage vs the XLA reference path (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from atlas_tpu import Grid
from atlas_tpu.model import ShallowWaterModel
from atlas_tpu.model.pallas_swe import PallasShallowWater


@pytest.fixture(scope="module")
def model():
    return ShallowWaterModel(Grid("O32"), dtype=jnp.float32)


def test_pallas_step_matches_xla(model):
    ps = PallasShallowWater(model)
    s0 = model.initial_state_williamson2()
    dt = model.suggested_dt()
    ref = model.step(model.step(s0, dt), dt)
    huv = ps.pad_state(s0)
    huv = ps.step(huv, dt)
    huv = ps.step(huv, dt)
    out = ps.unpad_state(huv)
    mask = model.mask.astype(bool)
    for k in ("h", "u", "v"):
        a = np.asarray(ref[k])[0][mask]
        b = np.asarray(out[k])[0][mask]
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1.0)
        assert err < 1e-6, (k, err)


def test_pallas_rossby_haurwitz_stable(model):
    ps = PallasShallowWater(model)
    s0 = model.initial_state_rossby_haurwitz()
    dt = model.suggested_dt()
    huv = ps.pad_state(s0)
    for _ in range(5):
        huv = ps.step(huv, dt)
    out = ps.unpad_state(huv)
    h = np.asarray(out["h"])[0][model.mask.astype(bool)]
    assert np.isfinite(h).all()
    assert 7000 < h.mean() < 11000


def test_pallas_tables_packed_cache_roundtrip(tmp_path, monkeypatch):
    """Warm PallasShallowWater setup replays the exact packed device tables
    from the mmap'd cache (reference analog: mmap'd setup caches,
    trans/Cache.h; VERDICT r3 item 8)."""
    monkeypatch.setenv("ATLAS_TPU_CACHE_PATH", str(tmp_path))
    grid = Grid("O16")
    cold_model = ShallowWaterModel(grid, use_cache=True)
    cold = PallasShallowWater(cold_model)
    warm = PallasShallowWater(ShallowWaterModel(grid, use_cache=True))
    assert warm.runs == cold.runs
    assert (warm.tjs, warm.ny_pad, warm.amax) == (
        cold.tjs, cold.ny_pad, cold.amax)
    for a, b in ((warm.Sx, cold.Sx), (warm.Sy, cold.Sy), (warm.M, cold.M)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

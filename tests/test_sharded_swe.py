"""Band-sharded shallow water vs serial (8 virtual devices)."""

import numpy as np
import pytest

import jax

from atlas_tpu import Grid
from atlas_tpu.model import ShallowWaterModel
from atlas_tpu.model.sharded_swe import ShardedShallowWater


@pytest.mark.parametrize("nparts", [4, 8])
def test_sharded_step_matches_serial(nparts):
    assert len(jax.devices()) >= nparts
    grid = Grid("O16")
    serial = ShallowWaterModel(grid, dtype=np.float64)
    s0 = serial.initial_state_williamson2()
    dt = serial.suggested_dt()
    s1 = serial.step(s0, dt)

    sh = ShardedShallowWater(grid, nparts=nparts, dtype=np.float64)
    s1_sh = sh.gather_state(
        sh.step(sh.scatter_state({k: np.asarray(v) for k, v in s0.items()}), dt)
    )
    m = serial.mask.astype(bool)
    for k in ("h", "u", "v"):
        a = np.asarray(s1[k])[0]
        b = s1_sh[k][0]
        scale = np.abs(a[m]).max()
        assert np.abs(a - b)[m].max() < 1e-12 * max(scale, 1.0)


def test_sharded_multi_step_stability():
    grid = Grid("O16")
    serial = ShallowWaterModel(grid, dtype=np.float64)
    sh = ShardedShallowWater(grid, nparts=8, dtype=np.float64)
    s0 = serial.initial_state_williamson2()
    dt = serial.suggested_dt()
    s = sh.scatter_state({k: np.asarray(v) for k, v in s0.items()})
    for _ in range(5):
        s = sh.step(s, dt)
    out = sh.gather_state(s)
    m = serial.mask.astype(bool)
    h0 = np.asarray(s0["h"])[0]
    assert np.isfinite(out["h"][0][m]).all()
    assert np.abs(out["h"][0][m] - h0[m]).max() / np.abs(h0[m]).max() < 1e-3


def test_scatter_gather_roundtrip():
    grid = Grid("O16")
    sh = ShardedShallowWater(grid, nparts=4, dtype=np.float64)
    rng = np.random.default_rng(0)
    f = rng.normal(size=(2, sh.ny, sh.nxw))
    back = sh.gather(sh.scatter(f))
    np.testing.assert_array_equal(back, f)

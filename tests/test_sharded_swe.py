"""Band-sharded shallow water (fused Pallas stages under shard_map) vs serial.

Runs on 8 virtual CPU devices; the Pallas stage kernel runs in interpret mode
(same traced math as on-chip). Checks: sharded == serial to roundoff, point-
balanced bands, stability over multiple steps, scatter/gather roundtrip.
"""

import numpy as np
import pytest

import jax

from atlas_tpu import Grid
from atlas_tpu.model import ShallowWaterModel
from atlas_tpu.model.sharded_swe import ShardedShallowWater
from atlas_tpu.partition.simple import balanced_row_starts


@pytest.mark.parametrize("nparts", [1, 4, 8])
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
        assert np.abs(a - b)[m].max() < 1e-11 * max(scale, 1.0)


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


def test_sharded_run_chain_matches_stepwise():
    grid = Grid("O16")
    serial = ShallowWaterModel(grid, dtype=np.float64)
    sh = ShardedShallowWater(grid, nparts=4, dtype=np.float64)
    s0 = serial.initial_state_williamson2()
    dt = serial.suggested_dt()
    s = sh.scatter_state({k: np.asarray(v) for k, v in s0.items()})
    chained = sh.gather_state(sh.run(s, dt, 3))
    stepwise = s
    for _ in range(3):
        stepwise = sh.step(stepwise, dt)
    stepwise = sh.gather_state(stepwise)
    for k in ("h", "u", "v"):
        np.testing.assert_allclose(chained[k], stepwise[k], rtol=0, atol=1e-9)


def test_scatter_gather_roundtrip():
    grid = Grid("O16")
    sh = ShardedShallowWater(grid, nparts=4, dtype=np.float64)
    rng = np.random.default_rng(0)
    f = rng.normal(size=(1, sh.ny, sh.nxw))
    back = sh.gather(sh.scatter(f))
    np.testing.assert_array_equal(back, f)


def test_balanced_row_starts_point_balance():
    """Reference rule: split by POINTS not rows (BandsPartitioner.cc:73).
    On O320/8 the max/mean points per shard must be within 10%."""
    grid = Grid("O320")
    starts = balanced_row_starts(grid.nx, 8)
    pts = np.array([grid.nx[starts[p]:starts[p + 1]].sum() for p in range(8)])
    assert starts[0] == 0 and starts[-1] == grid.ny
    assert (np.diff(starts) >= 1).all()
    assert pts.max() / pts.mean() <= 1.1
    # equal ROW bands would be far worse on the reduced grid
    rows_equal = np.linspace(0, grid.ny, 9).astype(int)
    pts_rows = np.array(
        [grid.nx[rows_equal[p]:rows_equal[p + 1]].sum() for p in range(8)])
    assert pts_rows.max() / pts_rows.mean() > 1.3


def test_balanced_bands_partitioner_registered():
    from atlas_tpu.partition import Partitioner

    grid = Grid("O32")
    part = Partitioner("balanced_bands", nb_parts=4).partition(grid)
    assert part.shape == (grid.size,)
    counts = np.bincount(part, minlength=4)
    assert counts.max() / counts.mean() <= 1.15
    # row-aligned: partition id is non-decreasing in grid order
    assert (np.diff(part) >= 0).all()


def test_scatter_rejects_multilevel():
    """nlev > 1 must be rejected, not silently truncated (round-3 verdict:
    sharded_swe scatter dropped levels)."""
    grid = Grid("O32")
    sh = ShardedShallowWater(grid, nparts=4, dtype=np.float64)
    bad = np.zeros((3, sh.ny, sh.nxw))
    with pytest.raises(ValueError, match="nlev=3"):
        sh.scatter(bad)


@pytest.mark.parametrize("nparts", [2, 4, 8])
def test_sharded_checksum_bit_identical(nparts):
    """Reference guarantee: bit-identical checksums for any decomposition
    (atlas-benchmark.cc:25-28, parallel/Checksum.h). The sharded stepper
    re-runs the SAME fused Pallas kernel on the band-edge windows and
    replays the serial pole post-fix, so gather(sharded) == serial pallas
    EXACTLY — asserted via the order-independent checksum AND bitwise."""
    from atlas_tpu.model.pallas_swe import PallasShallowWater
    from atlas_tpu.parallel.checksum import checksum

    grid = Grid("O16")
    serial = ShallowWaterModel(grid, dtype=np.float32)
    ps = PallasShallowWater(serial)
    s0 = serial.initial_state_williamson2()
    dt = serial.suggested_dt()
    huv = tuple(ps.pad(s0[k]) for k in ("h", "u", "v"))
    out_serial = [np.asarray(x) for x in ps.step(huv, dt)]

    sh = ShardedShallowWater(grid, nparts=nparts, dtype=np.float32)
    out_sh = sh.gather_state(
        sh.step(sh.scatter_state({k: np.asarray(v) for k, v in s0.items()}),
                dt))
    for i, k in enumerate(("h", "u", "v")):
        a = out_serial[i][: sh.ny, : sh.nxw]
        b = out_sh[k][0]
        assert checksum(a) == checksum(b), f"{k} checksum mismatch"
        np.testing.assert_array_equal(a, b)

"""Shallow-water model validation (Williamson et al. 1992 test cases)."""

import numpy as np
import pytest

from atlas_tpu import Grid
from atlas_tpu.model import ShallowWaterModel


@pytest.fixture(scope="module")
def model():
    return ShallowWaterModel(Grid("O32"), dtype=np.float64)


def test_williamson2_steady_state(model):
    """Case 2 is an exact steady solution: drift after 100 steps stays at
    truncation level."""
    s0 = model.initial_state_williamson2()
    dt = model.suggested_dt()
    s = model.run(s0, dt, 100)
    h0 = model.unlayout(s0["h"])[0]
    h1 = model.unlayout(s["h"])[0]
    u0 = model.unlayout(s0["u"])[0]
    u1 = model.unlayout(s["u"])[0]
    assert np.isfinite(h1).all()
    assert np.abs(h1 - h0).max() / np.abs(h0).max() < 5e-3
    assert np.abs(u1 - u0).max() / np.abs(u0).max() < 5e-2


def test_mass_conservation(model):
    """Total mass (area-weighted h) is conserved by the flux-form continuity
    equation up to roundoff-level drift."""
    from atlas_tpu.fvm.method import FvmMethod

    s0 = model.initial_state_williamson2()
    dt = model.suggested_dt()
    s = model.run(s0, dt, 50)
    # area weights: dual volumes of the owned nodes
    method = model.sfvm.method
    vol = method.geometry.vol.copy()
    owned = method.geometry.owned_mask
    w = vol[: model.grid.size]
    h0 = model.unlayout(s0["h"])[0]
    h1 = model.unlayout(s["h"])[0]
    m0 = (h0 * w).sum()
    m1 = (h1 * w).sum()
    assert abs(m1 - m0) / m0 < 1e-4


def test_rossby_haurwitz_stability(model):
    s0 = model.initial_state_rossby_haurwitz()
    dt = model.suggested_dt(c=0.4)
    s = model.run(s0, dt, 50)
    h1 = model.unlayout(s["h"])[0]
    assert np.isfinite(h1).all()
    # depth stays within physical bounds
    assert h1.min() > 5000.0 and h1.max() < 12000.0


def test_step_is_deterministic(model):
    s0 = model.initial_state_williamson2()
    dt = model.suggested_dt()
    a = model.unlayout(model.run(s0, dt, 10)["h"])
    b = model.unlayout(model.run(s0, dt, 10)["h"])
    np.testing.assert_array_equal(a, b)

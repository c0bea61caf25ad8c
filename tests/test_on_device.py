"""On-device smoke tests (VERDICT r2 item 6): run the numerics on the REAL
TPU chip, not the virtual CPU mesh, and gate accuracy against analytic /
roundtrip references at f32-appropriate thresholds.

The suite's conftest pins JAX to the virtual CPU mesh at import time, so the
device run happens in a SUBPROCESS with the session's native platform. Skipped
unless ATLAS_TPU_RUN_DEVICE_TESTS=1 (the chip is shared with bench.py).
"""

import json
import os
import subprocess
import sys

import pytest

requires_device = pytest.mark.skipif(
    os.environ.get("ATLAS_TPU_RUN_DEVICE_TESTS", "0") != "1",
    reason="set ATLAS_TPU_RUN_DEVICE_TESTS=1 to run on-chip smoke tests",
)

_SCRIPT = r"""
import json
import numpy as np
import jax
import jax.numpy as jnp
from atlas_tpu import Grid
from atlas_tpu.fvm import FvmMethod
from atlas_tpu.fvm.structured import StructuredFvm
from atlas_tpu.trans import TransLocal, nspec2, spectral_index

out = {"platform": jax.devices()[0].platform}

# --- O32 gradient of a smooth zonal-wind field vs host f64 ----------------
grid = Grid("O32")
sf = StructuredFvm(grid)
ll = grid.lonlat()
f = np.cos(3 * np.deg2rad(ll[:, 0])) * np.cos(np.deg2rad(ll[:, 1])) ** 2
fpad64 = sf.to_layout(f.astype(np.float64))
# host f64 reference via the same shift tables (pure numpy)
s = sf.shifts
def shift_np(a, dj, dc):
    outa = np.zeros_like(a)
    src = a[..., max(0, dj):a.shape[-2] + min(0, dj), :]
    # simple roll-free shift
    ny, nxw = a.shape[-2:]
    res = np.zeros_like(a)
    j_lo, j_hi = max(0, -dj), min(ny, ny - dj)
    c_lo, c_hi = max(0, -dc), min(nxw, nxw - dc)
    res[..., j_lo:j_hi, c_lo:c_hi] = a[..., j_lo + dj:j_hi + dj,
                                       c_lo + dc:c_hi + dc]
    return res
fh = fpad64.copy()
fh[:, s.halo_rows, s.halo_dst] = fh[:, s.halo_rows, s.halo_src]
S_tot = s.S_total_regular + s.S_total_pole
accx = fh * S_tot[None, :, :, 0]
accy = fh * S_tot[None, :, :, 1]
for (dj, dc), S in list(s.keys_regular.items()) + list(s.keys_pole.items()):
    fs = shift_np(fh, dj, dc)
    accx = accx + fs * S[None, :, :, 0]
    accy = accy + fs * S[None, :, :, 1]
from atlas_tpu.util.constants import DEG2RAD
gx_ref = accx * (0.5 * DEG2RAD * s.metric_x * s.mask)[None]
gy_ref = accy * (0.5 * DEG2RAD * s.metric_y * s.mask)[None]
# device f32
g_dev = np.asarray(sf.gradient(jnp.asarray(fpad64, jnp.float32)))
scale = max(np.abs(gx_ref).max(), np.abs(gy_ref).max())
out["grad_rel_err"] = float(
    max(np.abs(g_dev[0] - gx_ref).max(), np.abs(g_dev[1] - gy_ref).max())
    / scale)

# --- T31 inverse transform on the chip vs host f64 ------------------------
# (dirtrans needs complex FFT, unimplemented on this TPU backend; the
# roundtrip is covered by the CPU suite)
from bench import _invtrans_ref_f64

T = 31
tr = TransLocal(Grid("F32"), T, dtype=jnp.float32)
rng = np.random.default_rng(0)
sp = rng.standard_normal((2, nspec2(T))).astype(np.float32)
ms, _ = spectral_index(T)
sp[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
gp = np.asarray(tr.invtrans(sp))
ref = _invtrans_ref_f64(tr, sp)
out["trans_invtrans_rel_err"] = float(
    np.abs(gp - ref).max() / np.abs(ref).max())

print("RESULT " + json.dumps(out))
"""


@requires_device
def test_on_chip_gradient_and_trans_smoke():
    env = dict(os.environ)
    # drop the conftest's CPU pin so the subprocess sees the real device
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        cwd=repo, env=env, timeout=600)
    assert res.returncode == 0, res.stderr[-2000:]
    line = [l for l in res.stdout.splitlines() if l.startswith("RESULT ")][-1]
    data = json.loads(line[len("RESULT "):])
    assert data["platform"] != "cpu", data
    # f32 thresholds (reference validates f64 at 1e-11..1e-16,
    # test_fvm_nabla_validation.cc:235-254; f32 carries ~1e-6 per op)
    assert data["grad_rel_err"] < 1e-5, data
    assert data["trans_invtrans_rel_err"] < 5e-4, data

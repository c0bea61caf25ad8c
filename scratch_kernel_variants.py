"""Microbench: pallas gradient-kernel variants on synthetic data (real TPU).

Isolates the VPU-op question: what does each per-key operation cost?
  V0 per-key concat + pad/slice shift + sublane-broadcast FMA   (current)
  V1 hoisted rows_of + pltpu.roll + sublane-broadcast FMA
  V2 levels-leading layout (LI, TJ, nxw): roll + FMA, no broadcast
  V3 V2 + dc-grouped source-aligned weights (one roll per distinct dc)
No boundary-row DMAs (zero-fill at tile edges) — compute + stream only.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LI, TJ = 8, 8
NY, NXW, LO = 640, 1408, 8
KEYS = tuple((dj, dc) for dj in (-1, 0, 1) for dc in (-2, -1, 0, 1, 2))
NK = len(KEYS)  # 15 ~ measured 14 active


def cshift(a, dc):
    if dc == 0:
        return a
    nxw = a.shape[-1]
    if dc > 0:
        pad = [(0, 0)] * (a.ndim - 1) + [(0, dc)]
        return jnp.pad(a, pad)[..., dc:dc + nxw]
    pad = [(0, 0)] * (a.ndim - 1) + [(-dc, 0)]
    return jnp.pad(a, pad)[..., :nxw]


def roll_fill(a, dc):
    # circular roll; wrapped lanes are masked by zero weights in real use
    if dc == 0:
        return a
    return pltpu.roll(a, -dc % a.shape[-1], axis=a.ndim - 1)


# ---------------------------------------------------------------- V0 (current)
def k_v0(Sx_ref, Sy_ref, f_ref, gx_ref, gy_ref):
    f = f_ref[0]  # (TJ, LI, nxw)
    z = jnp.zeros((1,) + f.shape[1:], f.dtype)

    def rows_of(dj):
        if dj == 0:
            return f
        if dj == 1:
            return jnp.concatenate([f[1:], z], axis=0)
        return jnp.concatenate([z, f[:-1]], axis=0)

    acc_x = jnp.zeros_like(f)
    acc_y = jnp.zeros_like(f)
    for k, (dj, dc) in enumerate(KEYS):
        fs = cshift(rows_of(dj), dc)
        acc_x = acc_x + fs * Sx_ref[k][:, None, :]
        acc_y = acc_y + fs * Sy_ref[k][:, None, :]
    gx_ref[0] = acc_x
    gy_ref[0] = acc_y


# ------------------------------------------------------------------- V1 hoist
def k_v1(Sx_ref, Sy_ref, f_ref, gx_ref, gy_ref):
    f = f_ref[0]
    z = jnp.zeros((1,) + f.shape[1:], f.dtype)
    rows = {
        0: f,
        1: jnp.concatenate([f[1:], z], axis=0),
        -1: jnp.concatenate([z, f[:-1]], axis=0),
    }
    acc_x = jnp.zeros_like(f)
    acc_y = jnp.zeros_like(f)
    for k, (dj, dc) in enumerate(KEYS):
        fs = roll_fill(rows[dj], dc)
        acc_x = acc_x + fs * Sx_ref[k][:, None, :]
        acc_y = acc_y + fs * Sy_ref[k][:, None, :]
    gx_ref[0] = acc_x
    gy_ref[0] = acc_y


# ------------------------------------------- V2 levels leading (no broadcast)
def k_v2(Sx_ref, Sy_ref, f_ref, gx_ref, gy_ref):
    f = f_ref[0]  # (LI, TJ, nxw): sublane = rows, lane = x
    z = jnp.zeros((f.shape[0], 1, f.shape[2]), f.dtype)
    rows = {
        0: f,
        1: jnp.concatenate([f[:, 1:], z], axis=1),
        -1: jnp.concatenate([z, f[:, :-1]], axis=1),
    }
    acc_x = jnp.zeros_like(f)
    acc_y = jnp.zeros_like(f)
    for k, (dj, dc) in enumerate(KEYS):
        fs = roll_fill(rows[dj], dc)
        acc_x = acc_x + fs * Sx_ref[k][None]
        acc_y = acc_y + fs * Sy_ref[k][None]
    gx_ref[0] = acc_x
    gy_ref[0] = acc_y


# ---------------------------------------------- V3 dc-grouped source-aligned
def k_v3(Sx_ref, Sy_ref, f_ref, gx_ref, gy_ref):
    f = f_ref[0]  # (LI, TJ, nxw)
    z = jnp.zeros((f.shape[0], 1, f.shape[2]), f.dtype)
    rows = {
        0: f,
        1: jnp.concatenate([f[:, 1:], z], axis=1),
        -1: jnp.concatenate([z, f[:, :-1]], axis=1),
    }
    acc_x = jnp.zeros_like(f)
    acc_y = jnp.zeros_like(f)
    dcs = sorted(set(dc for _, dc in KEYS))
    for dc in dcs:
        tx = jnp.zeros_like(f)
        ty = jnp.zeros_like(f)
        for k, (dj, kdc) in enumerate(KEYS):
            if kdc != dc:
                continue
            tx = tx + rows[dj] * Sx_ref[k][None]
            ty = ty + rows[dj] * Sy_ref[k][None]
        # roll the accumulated source-aligned product to the destination
        acc_x = acc_x + roll_fill(tx, -dc)
        acc_y = acc_y + roll_fill(ty, -dc)
    gx_ref[0] = acc_x
    gy_ref[0] = acc_y


def build(variant, kern, layout):
    if layout == "tj_li":
        fshape = (LO, NY, LI, NXW)
        blk = (1, TJ, LI, NXW)
        imap = lambda jt, lt: (lt, jt, 0, 0)
    else:  # li_tj
        fshape = (LO, LI, NY, NXW)
        blk = (1, LI, TJ, NXW)
        imap = lambda jt, lt: (lt, 0, jt, 0)
    S_spec = pl.BlockSpec((NK, TJ, NXW), lambda jt, lt: (0, jt, 0),
                          memory_space=pltpu.VMEM)
    f_spec = pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)

    def run(Sx, Sy, f):
        return pl.pallas_call(
            kern,
            grid=(NY // TJ, LO),
            in_specs=[S_spec, S_spec, f_spec],
            out_specs=[f_spec, f_spec],
            out_shape=[jax.ShapeDtypeStruct(fshape, jnp.float32)] * 2,
        )(Sx, Sy, f)

    return jax.jit(run), fshape


def main():
    rng = np.random.default_rng(0)
    Sx = jnp.asarray(rng.standard_normal((NK, NY, NXW)), jnp.float32)
    Sy = jnp.asarray(rng.standard_normal((NK, NY, NXW)), jnp.float32)
    sum_fn = jax.jit(jnp.sum)
    renorm = jax.jit(lambda x: jnp.clip(x * 1e-2, -1.0, 1.0))

    results = {}
    for name, kern, layout in [
        ("v0_current", k_v0, "tj_li"),
        ("v1_hoist_roll", k_v1, "tj_li"),
        ("v2_levfirst", k_v2, "li_tj"),
        ("v3_dcgroup", k_v3, "li_tj"),
    ]:
        run, fshape = build(name, kern, layout)
        f = jnp.asarray(rng.standard_normal(fshape), jnp.float32)

        def chain(n, f=f, run=run):
            x = f
            for i in range(n):
                x = run(Sx, Sy, Sx.dtype.type(0) + x)[0]
                if i % 4 == 3 or i == n - 1:
                    x = renorm(x)
            return float(sum_fn(x))

        chain(2)
        t0 = time.perf_counter(); chain(1); t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); chain(13); tK = time.perf_counter() - t0
        t_iter = (tK - t1) / 12
        results[name] = t_iter
        print(f"{name:16s} {t_iter*1e3:7.3f} ms/iter")

    base = results["v0_current"]
    for k, v in results.items():
        print(f"{k:16s} speedup {base / v:5.2f}x")


if __name__ == "__main__":
    main()

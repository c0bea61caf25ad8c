#!/usr/bin/env python
"""Scan four-step (n1, n2) splits at T1279/L5376 + time the rc.apply
slow-row branch formulations."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

K = 6
ny, nf, half = 2560, 32, 1280
L = 5376
T = 1279
t1 = T + 1
PREC = jax.lax.Precision.HIGHEST
eps = jnp.asarray(1e-30, jnp.float32)
rng = np.random.default_rng(0)
S = jnp.asarray(rng.standard_normal((t1, half, 2 * nf)).astype(np.float32))
A = jnp.asarray(rng.standard_normal((t1, half, 2 * nf)).astype(np.float32))
mult = jnp.asarray(rng.random((ny, t1)).astype(np.float32))


def chain(body, k):
    @jax.jit
    def run(*ops):
        def b(_, c):
            return c + body(*((c,) + ops[1:])).mean() * eps

        return jnp.sum(jax.lax.fori_loop(0, k, b, ops[0]))

    return run


def timeit(name, body, *ops):
    c1, cK = chain(body, 1), chain(body, K)
    float(c1(*ops)), float(cK(*ops))
    t0 = time.perf_counter()
    float(c1(*ops))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(cK(*ops))
    tb = time.perf_counter() - t0
    print(f"[{name}] {(tb-ta)/(K-1)*1e3:.2f} ms", flush=True)


from atlas_tpu.trans.fourier import _fourstep_tables, invtrans_fourstep_fused  # noqa


for n1 in (42, 48, 56, 64, 84):
    if L % n1:
        continue
    tb = _fourstep_tables(L, n1, T, jnp.float32)

    _n1, _n2, _M2 = tb["n1"], tb["n2"], tb["M2"]

    def body(S, A, mult, tabd, n1=_n1, n2=_n2, M2=_M2):
        return invtrans_fourstep_fused(
            S, A, mult, None, None, tabd["E2r"], tabd["E2i"], tabd["EC"],
            ny, nf, n1, n2, M2, "highest", "line")

    timeit(f"fused line n1={n1} n2={L//n1} M2={_M2}", body, S, A, mult,
           {"E2r": tb["E2r"], "E2i": tb["E2i"], "EC": tb["EC"]})

# ---- slow-row branch ------------------------------------------------------
nslow = 348
line_s = jnp.asarray(rng.standard_normal((nslow, nf, L)).astype(np.float32))
W = 12
shifts = tuple(range(-(W // 2 - 1), W // 2 + 1))
slowp = jnp.asarray((rng.random((W, nslow, L)) * 0.1).astype(np.float32))
npts = 29848
rows_p = np.sort(rng.integers(0, nslow, npts))
yy_p = rng.integers(0, L, npts)
src = jnp.asarray((rows_p * L + yy_p).astype(np.int32))
w_p = jnp.asarray(rng.random((npts, W)).astype(np.float32))
yyj = jnp.asarray(yy_p.astype(np.int32))
rowsj = jnp.asarray(rows_p.astype(np.int32))


def slow_rolls(line_s, slowp, src):
    lo = -shifts[0]
    acc = line_s * slowp[lo][:, None, :]
    for k, dc in enumerate(shifts):
        if dc == 0:
            continue
        acc = acc + jnp.roll(line_s, -dc, axis=2) * slowp[k][:, None, :]
    vals = acc.transpose(0, 2, 1).reshape(-1, nf)[src]
    return vals


timeit("slow rolls+gather (current)", slow_rolls, line_s, slowp, src)


def slow_gather(line_s, w_p, rowsj, yyj):
    # transpose once, one gather per tap of point rows
    lt = line_s.transpose(0, 2, 1).reshape(-1, nf)  # (nslow*L, nf)
    acc = jnp.zeros((npts, nf), line_s.dtype)
    base = rowsj.astype(jnp.int32) * L
    for k, dc in enumerate(shifts):
        idx = base + jnp.remainder(yyj + dc, L)
        acc = acc + lt[idx] * w_p[:, k][:, None]
    return acc


timeit("slow transpose+taps gather", slow_gather, line_s, w_p, rowsj, yyj)


def slow_onegather(line_s, w_p, rowsj, yyj):
    lt = line_s.transpose(0, 2, 1).reshape(-1, nf)
    base = rowsj.astype(jnp.int32) * L
    idx = base[:, None] + jnp.remainder(yyj[:, None]
                                        + jnp.arange(-W // 2 + 1, W // 2 + 1,
                                                     dtype=jnp.int32)[None],
                                        L)
    vals = lt[idx.reshape(-1)].reshape(npts, W, nf)
    return (vals * w_p[..., None]).sum(axis=1)


timeit("slow one big gather", slow_onegather, line_s, w_p, rowsj, yyj)

#!/usr/bin/env python
"""Bicubic O320 -> L1440x721 nch=64: time pass1/pass2 split and variants."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

K = 8
from atlas_tpu import Grid  # noqa: E402
from atlas_tpu.interpolation import Interpolation  # noqa: E402
from atlas_tpu.interpolation.structured import (  # noqa: E402
    _apply_windowed, _windowed_pass1, _pass2)

src = Grid("O320")
tgt = Grid("L1440x721")
interp = Interpolation("structured-bicubic", src, tgt)
s = interp._sep
t = interp._sep_tables(jnp.float32)
nch = 64
f = jax.random.normal(jax.random.key(0), (src.size, nch), jnp.float32)
eps = jnp.asarray(1e-30, jnp.float32)
print(f"ny={s.ny} nxt={s.nxt} Wt={s.Wt.shape} rows={s.rows.shape}",
      flush=True)


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


ops_full = (t["pad_gather"], t["win_start"], t["Wt"], t["rows"], t["wy"])
timeit("full windowed", lambda f, *o: _apply_windowed(*o, s.nxt, f), f,
       *ops_full)
timeit("pass1 only", lambda f, pg, ws, Wt: _windowed_pass1(pg, ws, Wt,
                                                           s.nxt, f),
       f, t["pad_gather"], t["win_start"], t["Wt"])
timeit("pad_gather only", lambda f, pg: f[pg], f, t["pad_gather"])

tmp0 = jax.jit(_windowed_pass1, static_argnums=3)(
    t["pad_gather"], t["win_start"], t["Wt"], s.nxt, f)
float(tmp0.mean())
timeit("pass2 only (gather)", lambda tmp, rows, wy: _pass2(tmp, rows, wy),
       tmp0, t["rows"], t["wy"])

# pass2 as a dense banded GEMM: A (nyt, ny) with 4 bands per target row
nyt, k = s.rows.shape
A = np.zeros((nyt, s.ny), np.float32)
np.add.at(A, (np.repeat(np.arange(nyt), k), np.asarray(s.rows).ravel()),
          np.asarray(s.wy).ravel())
Aj = jnp.asarray(A)


def pass2_gemm(tmp, Aj):
    out = jnp.einsum("tj,jxc->txc", Aj, tmp,
                     precision=jax.lax.Precision.HIGHEST,
                     preferred_element_type=tmp.dtype)
    return out.reshape(-1, tmp.shape[-1])


timeit("pass2 GEMM highest", pass2_gemm, tmp0, Aj)


def pass2_gemm_hilo(tmp, Ahi, Alo):
    # weights split hi/lo, values bf16-split: 3 single-pass dots ~1e-6 rel
    thi = tmp.astype(jnp.bfloat16)
    tlo = (tmp - thi.astype(tmp.dtype)).astype(jnp.bfloat16)
    d = jax.lax.Precision.DEFAULT
    out = (jnp.einsum("tj,jxc->txc", Ahi, thi, precision=d,
                      preferred_element_type=tmp.dtype)
           + jnp.einsum("tj,jxc->txc", Ahi, tlo, precision=d,
                        preferred_element_type=tmp.dtype)
           + jnp.einsum("tj,jxc->txc", Alo, thi, precision=d,
                        preferred_element_type=tmp.dtype))
    return out.reshape(-1, tmp.shape[-1])


Ahi = Aj.astype(jnp.bfloat16)
Alo = (Aj - Ahi.astype(jnp.float32)).astype(jnp.bfloat16)
timeit("pass2 GEMM 3xbf16", pass2_gemm_hilo, tmp0, Ahi, Alo)

# accuracy check of variants vs f64
tmp64 = np.asarray(tmp0, np.float64)
ref = (tmp64[np.asarray(s.rows)] * np.asarray(s.wy)[..., None, None]
       ).sum(axis=1).reshape(-1, nch)
g1 = np.asarray(jax.jit(pass2_gemm)(tmp0, Aj), np.float64)
g2 = np.asarray(jax.jit(pass2_gemm_hilo)(tmp0, Ahi, Alo), np.float64)
sc = np.abs(ref).max()
print(f"pass2 GEMM err {np.abs(g1-ref).max()/sc:.2e}  "
      f"3xbf16 err {np.abs(g2-ref).max()/sc:.2e}", flush=True)

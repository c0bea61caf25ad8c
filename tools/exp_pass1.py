#!/usr/bin/env python
"""Decompose the bicubic pallas-pass1 time: transpose, kernel, R variants."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

from atlas_tpu import Grid
from atlas_tpu.interpolation import Interpolation
from atlas_tpu.interpolation.pallas_pass1 import Pass1Kernel, pass1_rows
from atlas_tpu.interpolation.structured import _pass2_gemm

K = 8
src = Grid("O320")
tgt = Grid("L1440x721")
interp = Interpolation("structured-bicubic", src, tgt)
nch = 64
f = jax.random.normal(jax.random.key(0), (src.size, nch), jnp.float32)
eps = jnp.asarray(1e-30, jnp.float32)


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


for R in (8, 16):
    Pass1Kernel.ROWS_PER_PROGRAM = R
    pk = Pass1Kernel(interp, nch)
    meta_k, Wt2_k = pk.tables()
    print(f"R={R} kernel_rows={len(pk.kernel_rows)}/{pk.s.ny} D={pk.D} "
          f"NN={pk.NN} W2={pk.W2} NB={pk.NB}", flush=True)

    npts = f.shape[0]
    npad = -(-npts // 128) * 128 + pk.NXS

    def transpose_only(f):
        return jnp.pad(f.T, ((0, 0), (0, npad - npts)))

    if R == 8:
        timeit("fT transpose+pad", transpose_only, f)

    fT0 = jax.jit(transpose_only)(f)
    float(fT0.ravel()[0])

    def kernel_only(fT, meta, Wt2, pk=pk):
        return pass1_rows(meta, fT, Wt2, nch, pk.NN, pk.W2, pk.NB, pk.Lh,
                          pk.NXS, pk.nxt_pad, pk.ROWS_PER_PROGRAM, pk.D)

    timeit(f"kernel only R={R}", kernel_only, fT0, meta_k, Wt2_k)

    def full(f, meta, Wt2, A2, pk=pk):
        tmp = pk.apply(f, None, tabs=(meta, Wt2))
        return _pass2_gemm(tmp, A2)

    A2 = interp._pass2_matrix(jnp.float32)
    timeit(f"pass1+gemm R={R}", full, f, meta_k, Wt2_k, A2)

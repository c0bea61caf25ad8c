#!/usr/bin/env python
"""A/B: stage-A einsum with explicit re/im concat vs 5D einsum on the
reshape view (no concat materialization). T1279 line2 shapes (per
hemisphere)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

K = 6
nyh, nf = 1280, 32
L, n1, n2 = 5376, 42, 128
T = 1279
M2 = -(-(T + 1) // n1)
PREC = jax.lax.Precision.HIGHEST
eps = jnp.asarray(1e-30, jnp.float32)
rng = np.random.default_rng(0)
# F: hemisphere-combined (t1p, nyh, 2, nf) after mult/pad
t1p = n1 * M2
F = jnp.asarray(rng.standard_normal((t1p, nyh, 2, nf)).astype(np.float32))
m2g, x2g = np.meshgrid(np.arange(M2), np.arange(n2), indexing="ij")
E2r = np.cos(2 * np.pi * m2g * x2g / n2)
E2i = np.sin(2 * np.pi * m2g * x2g / n2)
E2r_s = jnp.asarray(np.concatenate([E2r, -E2i], 0).astype(np.float32))
E2i_s = jnp.asarray(np.concatenate([E2i, E2r], 0).astype(np.float32))
E5r = E2r_s.reshape(2, M2, n2)
E5i = E2i_s.reshape(2, M2, n2)
m1g = np.arange(n1)
th = 2 * np.pi * np.outer(m1g, np.arange(L)) / L
EC = jnp.asarray(np.concatenate([np.cos(th).reshape(n1, n1, n2),
                                 -np.sin(th).reshape(n1, n1, n2)],
                                0).astype(np.float32))


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


def hemi_concat(F, tabs):
    E2r_s, E2i_s, EC = tabs
    Xh = F.reshape(M2, n1, nyh, 2, nf)
    Xc = jnp.concatenate([Xh[:, :, :, 0], Xh[:, :, :, 1]], axis=0)
    Br = jnp.einsum("mnyf,mx->ynxf", Xc, E2r_s, precision=PREC,
                    preferred_element_type=F.dtype)
    Bi = jnp.einsum("mnyf,mx->ynxf", Xc, E2i_s, precision=PREC,
                    preferred_element_type=F.dtype)
    line = (jnp.einsum("ykxf,kzx->yfzx", Br, EC[:n1], precision=PREC,
                       preferred_element_type=F.dtype)
            + jnp.einsum("ykxf,kzx->yfzx", Bi, EC[n1:], precision=PREC,
                         preferred_element_type=F.dtype))
    return line.reshape(nyh, nf, L)


def hemi_5d(F, tabs):
    E5r, E5i, EC = tabs
    X5 = F.reshape(M2, n1, nyh, 2, nf)
    Br = jnp.einsum("mnypf,pmx->ynxf", X5, E5r, precision=PREC,
                    preferred_element_type=F.dtype)
    Bi = jnp.einsum("mnypf,pmx->ynxf", X5, E5i, precision=PREC,
                    preferred_element_type=F.dtype)
    line = (jnp.einsum("ykxf,kzx->yfzx", Br, EC[:n1], precision=PREC,
                       preferred_element_type=F.dtype)
            + jnp.einsum("ykxf,kzx->yfzx", Bi, EC[n1:], precision=PREC,
                         preferred_element_type=F.dtype))
    return line.reshape(nyh, nf, L)


r0 = jax.jit(hemi_concat)(F, (E2r_s, E2i_s, EC))
r1 = jax.jit(hemi_5d)(F, (E5r, E5i, EC))
e = float(jnp.abs(r0 - r1).max() / jnp.abs(r0).max())
del r0, r1
print(f"5d rel err {e:.2e}", flush=True)
timeit("hemi concat", hemi_concat, F, (E2r_s, E2i_s, EC))
timeit("hemi 5d", hemi_5d, F, (E5r, E5i, EC))

#!/usr/bin/env python
"""Gradient O640/nlev137: vary the level tile LI to probe S-table refetch
across the level grid dimension (VERDICT r4 ask #7)."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

import atlas_tpu.fvm.pallas_kernels as pk
from atlas_tpu import Grid
from atlas_tpu.fvm.structured import StructuredFvm

K = 6
grid = Grid("O640")
sf = StructuredFvm(grid, use_cache=True)
s = sf.shifts
nlev = 137
rng = np.random.default_rng(0)
f = rng.standard_normal((nlev, s.ny, s.nxw)).astype(np.float32)
eps = jnp.asarray(1e-30, jnp.float32)

for LI_try in (8, 16, 32):
    pk.LI = LI_try
    pg = pk.PallasGradient(sf, dtype=jnp.float32)
    ft = pg.tile(jnp.asarray(f))
    float(ft.ravel()[0])
    runs, keys = pg.runs, pg.keys
    Sx, Sy, G = pg.Sx, pg.Sy, pg.G

    def body(ft, Sx, Sy, G):
        gx, gy = pk.gradient_pallas(runs, keys, Sx, Sy, G, ft)
        return gx.mean() + gy.mean()

    def chain(k):
        @jax.jit
        def run(ft, Sx, Sy, G):
            def b(_, c):
                return c + body(ft, Sx, Sy, G) * eps

            return jnp.sum(jax.lax.fori_loop(0, k, b, jnp.float32(0.0)))

        return run

    c1, cK = chain(1), chain(K)
    float(c1(ft, Sx, Sy, G)), float(cK(ft, Sx, Sy, G))
    t0 = time.perf_counter()
    float(c1(ft, Sx, Sy, G))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(cK(ft, Sx, Sy, G))
    tb = time.perf_counter() - t0
    dt = (tb - ta) / (K - 1)
    lo = ft.shape[0]
    traffic = (3 * ft.size + 2 * Sx.size + G.size) * 4
    print(f"[LI={LI_try}] {dt*1e3:.2f} ms  lo={lo}  "
          f"min-traffic BW {traffic/dt/1e9:.0f} GB/s", flush=True)

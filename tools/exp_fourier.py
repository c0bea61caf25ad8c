#!/usr/bin/env python
"""A/B variants for the T1279 'line'-path Fourier einsums and the Legendre
bucket gathers, timed on the chip with K-vs-1 fori chains.

Variants (line path, shapes of T1279 -> O1280 nf32):
  F0  current production: folded-twiddle EC, split stage-C einsums
  F1  explicit twiddle (fused into stage-A epilogue) + shared-E1 stage C
      via two einsums "yfnx,nz->yfzx" + add
  F2  F1 but stage C with stacked K (concat Br/Bi on contraction axis)

Gather variants (T1279 bucketed Legendre rhs):
  G0  current production rhs[gs] row gather
  G1  vmapped dynamic_slice (contiguous 2sb rows per m) + strided
      parity extract
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1279
K = int(sys.argv[2]) if len(sys.argv) > 2 else 6

ny, nf = 2560, 32
L, n1, n2 = 5376, 42, 128
M2 = -(-(T + 1) // n1)
PREC = jax.lax.Precision.HIGHEST

rng = np.random.default_rng(0)
half = (ny + 1) // 2
t1 = T + 1
S = jnp.asarray(rng.standard_normal((t1, half, 2 * nf)).astype(np.float32))
A = jnp.asarray(rng.standard_normal((t1, half, 2 * nf)).astype(np.float32))
mult = jnp.asarray(rng.random((ny, t1)).astype(np.float32))

# tables
m2g, x2g = np.meshgrid(np.arange(M2), np.arange(n2), indexing="ij")
E2r = np.cos(2 * np.pi * m2g * x2g / n2)
E2i = np.sin(2 * np.pi * m2g * x2g / n2)
E2r_s = np.concatenate([E2r, -E2i], 0).astype(np.float32)
E2i_s = np.concatenate([E2i, E2r], 0).astype(np.float32)
m1g = np.arange(n1)
th = 2 * np.pi * np.outer(m1g, np.arange(L)) / L
TC = np.cos(th).reshape(n1, n1, n2)
TS = np.sin(th).reshape(n1, n1, n2)
EC = np.concatenate([TC, -TS], 0).astype(np.float32)
# twiddle (m1, x2) and pure stage-C DFT matrix E1 (m1, x1)
twc = np.cos(2 * np.pi * np.outer(m1g, np.arange(n2)) / L).astype(np.float32)
tws = np.sin(2 * np.pi * np.outer(m1g, np.arange(n2)) / L).astype(np.float32)
E1c = np.cos(2 * np.pi * np.outer(m1g, m1g) / n1).astype(np.float32)
E1s = np.sin(2 * np.pi * np.outer(m1g, m1g) / n1).astype(np.float32)
TAB = {"E2r": jnp.asarray(E2r_s), "E2i": jnp.asarray(E2i_s),
       "EC": jnp.asarray(EC), "twc": jnp.asarray(twc),
       "tws": jnp.asarray(tws), "E1c": jnp.asarray(E1c),
       "E1s": jnp.asarray(E1s)}

eps = jnp.asarray(1e-30, jnp.float32)


def chain(body, k, *ops):
    @jax.jit
    def run(*ops):
        def b(_, c):
            out = body(*((c,) + ops[1:]))
            return c + out.mean() * eps

        return jnp.sum(jax.lax.fori_loop(0, k, b, ops[0]))

    return run


def timeit(name, body, *ops, ref=None, out=None):
    c1, cK = chain(body, 1, *ops), chain(body, K, *ops)
    float(c1(*ops)), float(cK(*ops))
    t0 = time.perf_counter()
    float(c1(*ops))
    t1_ = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(cK(*ops))
    tK = time.perf_counter() - t0
    dt = (tK - t1_) / (K - 1)
    err = ""
    if ref is not None and out is not None:
        e = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
        err = f"  rel_err={e:.2e}"
    print(f"[{name}] {dt*1e3:.2f} ms{err}", flush=True)
    return dt


def assemble_X(S, A, mult):
    N = S + A
    Sth = (S - A)[:, ::-1][:, 2 * half - ny:]
    mT = mult.T
    N = N * mT[:, :half, None]
    Sth = Sth * mT[:, half:, None]
    pad = n1 * M2 - t1
    if pad:
        N = jnp.pad(N, ((0, pad), (0, 0), (0, 0)))
        Sth = jnp.pad(Sth, ((0, pad), (0, 0), (0, 0)))
    Nq = N.reshape(M2, n1, half, 2, nf)
    Sq = Sth.reshape(M2, n1, ny - half, 2, nf)
    return jnp.concatenate([
        jnp.concatenate([Nq[:, :, :, 0], Sq[:, :, :, 0]], axis=2),
        jnp.concatenate([Nq[:, :, :, 1], Sq[:, :, :, 1]], axis=2),
    ], axis=0)  # (2 M2, n1, ny, nf)


def f0(S, A, mult, tab):
    X = assemble_X(S, A, mult)
    Br = jnp.einsum("mnyf,mx->ynxf", X, tab['E2r'], precision=PREC,
                    preferred_element_type=S.dtype)
    Bi = jnp.einsum("mnyf,mx->ynxf", X, tab['E2i'], precision=PREC,
                    preferred_element_type=S.dtype)
    line = (jnp.einsum("ykxf,kzx->yfzx", Br, tab['EC'][:n1], precision=PREC,
                       preferred_element_type=S.dtype)
            + jnp.einsum("ykxf,kzx->yfzx", Bi, tab['EC'][n1:], precision=PREC,
                         preferred_element_type=S.dtype))
    return line.reshape(ny, nf, L)


def f1(S, A, mult, tab):
    X = assemble_X(S, A, mult)
    Br = jnp.einsum("mnyf,mx->yfnx", X, tab['E2r'], precision=PREC,
                    preferred_element_type=S.dtype)
    Bi = jnp.einsum("mnyf,mx->yfnx", X, tab['E2i'], precision=PREC,
                    preferred_element_type=S.dtype)
    # explicit twiddle: elementwise (n1, n2) planes, fuses into A epilogue
    Btr = Br * tab['twc'][None, None] - Bi * tab['tws'][None, None]
    Bti = Br * tab['tws'][None, None] + Bi * tab['twc'][None, None]
    line = (jnp.einsum("yfnx,nz->yfzx", Btr, tab['E1c'], precision=PREC,
                       preferred_element_type=S.dtype)
            - jnp.einsum("yfnx,nz->yfzx", Bti, tab['E1s'], precision=PREC,
                         preferred_element_type=S.dtype))
    return line.reshape(ny, nf, L)


def f2(S, A, mult, tab):
    X = assemble_X(S, A, mult)
    Br = jnp.einsum("mnyf,mx->yfnx", X, tab['E2r'], precision=PREC,
                    preferred_element_type=S.dtype)
    Bi = jnp.einsum("mnyf,mx->yfnx", X, tab['E2i'], precision=PREC,
                    preferred_element_type=S.dtype)
    Btr = Br * tab['twc'][None, None] - Bi * tab['tws'][None, None]
    Bti = Br * tab['tws'][None, None] + Bi * tab['twc'][None, None]
    Bt = jnp.concatenate([Btr, Bti], axis=2)  # (y, f, 2n1, x2)
    E1 = jnp.concatenate([tab['E1c'], -tab['E1s']], axis=0)  # (2n1, x1)
    line = jnp.einsum("yfnx,nz->yfzx", Bt, E1, precision=PREC,
                      preferred_element_type=S.dtype)
    return line.reshape(ny, nf, L)


r0 = jax.jit(f0)(S, A, mult, TAB)
e1 = float(jnp.max(jnp.abs(jax.jit(f1)(S, A, mult, TAB) - r0)) / jnp.max(jnp.abs(r0)))
e2 = float(jnp.max(jnp.abs(jax.jit(f2)(S, A, mult, TAB) - r0)) / jnp.max(jnp.abs(r0)))
del r0
print(f"F1 rel_err {e1:.2e}  F2 rel_err {e2:.2e}", flush=True)
timeit("F0 folded-EC split", f0, S, A, mult, TAB)
timeit("F1 explicit twiddle + shared E1 (2 dots)", f1, S, A, mult, TAB)
timeit("F2 explicit twiddle + stacked K", f2, S, A, mult, TAB)

# ----------------------------------------------------------- gather variants
from atlas_tpu.trans.legendre import spectral_index  # noqa: E402

msi, nsi = spectral_index(T)
ncoef = len(msi)
q = 2 * nf
rhs = jnp.asarray(rng.standard_normal((ncoef + 2048, q)).astype(np.float32))

# production-style buckets
lut = np.full((T + 1, T + 2), -1, np.int64)
lut[msi, nsi - msi] = np.arange(ncoef)
offset = np.zeros(T + 2, np.int64)
for m in range(T + 1):
    offset[m + 1] = offset[m] + (T + 1 - m)
bounds = []
m0 = 0
while m0 <= T:
    ln = T + 1 - m0
    m1b = min(T + 1, m0 + max(32, ln // 2))
    bounds.append((m0, m1b))
    m0 = m1b

tabs = []
SBS = []
for (m0, m1b) in bounds:
    mlist = np.arange(m0, m1b)
    per = []
    sbs = []
    for p in (0, 1):
        counts = np.maximum((T - mlist - p) // 2 + 1, 0)
        sb = max(int(counts.max()), 1)
        slot = np.arange(sb)
        nm = p + 2 * slot
        g = lut[mlist[:, None], np.clip(nm, 0, T + 1)[None, :]]
        mask = (nm[None, :] <= (T - mlist[:, None])) & (g >= 0)
        gidx = np.where(mask, g, 0)
        per.append((jnp.asarray(gidx.astype(np.int32)),
                    jnp.asarray(mask.astype(np.float32))))
        sbs.append(sb)
    tabs.append((jnp.asarray(offset[m0:m1b].astype(np.int32)), per))
    SBS.append(tuple(sbs))


def g0(rhs, tabs):
    acc = eps
    for (starts, per) in tabs:
        for (gidx, mask) in per:
            rs = rhs[gidx] * mask[..., None]
            acc = acc + rs.mean()
    return acc[None, None]


def g1(rhs, tabs):
    acc = eps
    for bi, (starts, per) in enumerate(tabs):
        sbmax = max(SBS[bi])
        sl = jax.vmap(
            lambda s: jax.lax.dynamic_slice(rhs, (s, 0), (2 * sbmax, q)))(
            starts)  # (mb, 2 sbmax, q)
        sl = sl.reshape(sl.shape[0], sbmax, 2, q)
        for p, (gidx, mask) in enumerate(per):
            sb = SBS[bi][p]
            rs = sl[:, :sb, p, :] * mask[..., None]
            acc = acc + rs.mean()
    return acc[None, None]


# correctness: compare the masked operands via sums
def check_g():
    for bi, (starts, per) in enumerate(tabs):
        sbmax = max(SBS[bi])
        sl = jax.vmap(
            lambda s: jax.lax.dynamic_slice(rhs, (s, 0), (2 * sbmax, q)))(
            starts)
        sl = sl.reshape(sl.shape[0], sbmax, 2, q)
        for p, (gidx, mask) in enumerate(per):
            sb = SBS[bi][p]
            a = rhs[gidx] * mask[..., None]
            b = sl[:, :sb, p, :] * mask[..., None]
            d = float(jnp.abs(a - b).max())
            if d != 0.0:
                print(f"  MISMATCH p={p} d={d}")
                return False
    return True


print("gather variants equal:", check_g(), flush=True)
timeit("G0 row gather", g0, rhs, tabs)
timeit("G1 sliced+strided", g1, rhs, tabs)

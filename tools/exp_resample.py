#!/usr/bin/env python
"""Fine-grained timing of the T1279 Fourier tail: X assembly, stage-A,
stage-C, and resample-kernel component variants (no-dot / no-roll /
block-rolls) on the chip."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

K = int(sys.argv[1]) if len(sys.argv) > 1 else 6
ny, nf, half = 2560, 32, 1280
L, n1, n2 = 5376, 42, 128
T = 1279
M2 = -(-(T + 1) // n1)
t1 = T + 1
PREC = jax.lax.Precision.HIGHEST
eps = jnp.asarray(1e-30, jnp.float32)

rng = np.random.default_rng(0)
S = jnp.asarray(rng.standard_normal((t1, half, 2 * nf)).astype(np.float32))
A = jnp.asarray(rng.standard_normal((t1, half, 2 * nf)).astype(np.float32))
mult = jnp.asarray(rng.random((ny, t1)).astype(np.float32))
m2g, x2g = np.meshgrid(np.arange(M2), np.arange(n2), indexing="ij")
E2r = np.cos(2 * np.pi * m2g * x2g / n2)
E2i = np.sin(2 * np.pi * m2g * x2g / n2)
m1g = np.arange(n1)
th = 2 * np.pi * np.outer(m1g, np.arange(L)) / L
EC = np.concatenate([np.cos(th).reshape(n1, n1, n2),
                     -np.sin(th).reshape(n1, n1, n2)], 0)
TAB = {"E2r": jnp.asarray(np.concatenate([E2r, -E2i], 0).astype(np.float32)),
       "E2i": jnp.asarray(np.concatenate([E2i, E2r], 0).astype(np.float32)),
       "EC": jnp.asarray(EC.astype(np.float32))}


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
    ], axis=0)


timeit("assemble_X", assemble_X, S, A, mult)

X0 = jax.jit(assemble_X)(S, A, mult)
float(X0.mean())


def stageA(X, tab):
    Br = jnp.einsum("mnyf,mx->ynxf", X, tab["E2r"], precision=PREC,
                    preferred_element_type=X.dtype)
    Bi = jnp.einsum("mnyf,mx->ynxf", X, tab["E2i"], precision=PREC,
                    preferred_element_type=X.dtype)
    return Br + Bi


timeit("stageA (2 einsums)", stageA, X0, TAB)


@jax.jit
def _mk_br(X, tab):
    return (jnp.einsum("mnyf,mx->ynxf", X, tab["E2r"], precision=PREC,
                       preferred_element_type=X.dtype),
            jnp.einsum("mnyf,mx->ynxf", X, tab["E2i"], precision=PREC,
                       preferred_element_type=X.dtype))


Br0, Bi0 = _mk_br(X0, TAB)
float(Br0.mean())


def stageC(Br, Bi, tab):
    return (jnp.einsum("ykxf,kzx->yfzx", Br, tab["EC"][:n1], precision=PREC,
                       preferred_element_type=Br.dtype)
            + jnp.einsum("ykxf,kzx->yfzx", Bi, tab["EC"][n1:], precision=PREC,
                         preferred_element_type=Br.dtype))


timeit("stageC (2 einsums)", stageC, Br0, Bi0, TAB)

# ---------------- resample kernel variants ---------------------------------
# synthetic equator-band segment: 976 rows, WSEL 384, NXP 5248, R 16
import atlas_tpu.trans.resample_kernel as rk  # noqa: E402

BS = rk.BS
nrows, WSEL, NXP, R = 976, 384, 5248, 16
W = 12
shifts = tuple(range(-(W // 2 - 1), W // 2 + 1))
line = jnp.asarray(rng.standard_normal((nrows, nf, L)).astype(np.float32))
planes = jnp.asarray(
    (rng.random((nrows, W, L)) * 0.1).astype(np.float32))
NB = NXP // BS
meta = np.zeros((nrows, 3 + NB), np.int64)
offs = np.zeros((nrows, NXP), np.int64)
base = 0
for i in range(nrows):
    nxr = NXP - 128 + (i % 96)  # nx close to NXP, varying
    y = np.round(np.arange(nxr) * (L / nxr)).astype(np.int64)
    offs[i, :nxr] = y
    offs[i, nxr:] = y[-1]
    meta[i, 0] = nxr
    meta[i, 1] = base
    meta[i, 2 + NB] = base // 128
    for b in range(NB):
        i0 = min(b * BS, nxr - 1)
        meta[i, 2 + b] = min((int(offs[i, i0]) // 128) * 128,
                             max(L - WSEL, 0)) // 128
    base += nxr
meta_j = jnp.asarray(meta.astype(np.int32))
offs_j = jnp.asarray(offs.reshape(nrows, NB, BS).astype(np.int32))
size_pad = base + NXP + 256


def run_kernel(line, planes, meta, offs):
    return rk.resample_compact(meta, line, planes, offs, shifts, nf, L,
                               WSEL, NB, NXP, size_pad, R=R)


timeit("kernel full (R=16)", run_kernel, line, planes, meta_j, offs_j)


def make_variant(do_rolls, do_dots, block_rolls=False):
    def kernel(meta_ref, line_ref, planes_ref, offs_ref, out_any, acc_ref,
               outrow, stream, pending, sem):
        p = pl.program_id(0)
        nrows_t = pl.num_programs(0) * R
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (WSEL, BS), 0)
        NS = NXP + 128
        if block_rolls:
            accb = line_ref[...] * planes_ref[:, -shifts[0]][:, None]
            for k, dc in enumerate(shifts):
                if dc == 0:
                    continue
                accb = accb + pltpu.roll(line_ref[...], -dc % L, axis=2) \
                    * planes_ref[:, k][:, None]
        for rl in range(R):
            r = p * R + rl
            nx = meta_ref[r, 0]
            off = meta_ref[r, 1]
            off_al = meta_ref[r, NB + 2] * 128
            slot = jax.lax.rem(r, jnp.int32(2))
            line = line_ref[rl]
            if block_rolls:
                acc_ref[:, :] = accb[rl]
            elif do_rolls:
                acc = line * planes_ref[rl, -shifts[0]][None, :]
                for k, dc in enumerate(shifts):
                    if dc == 0:
                        continue
                    acc = acc + pltpu.roll(line, -dc % L, axis=1) \
                        * planes_ref[rl, k][None, :]
                acc_ref[:, :] = acc
            else:
                acc_ref[:, :] = line
            if do_dots:
                for b in range(NB):
                    @pl.when(b * BS < nx)
                    def _(b=b, r=r, rl=rl):
                        y0 = meta_ref[r, 2 + b] * 128
                        win = acc_ref[:, pl.ds(y0, WSEL)]
                        rel = offs_ref[rl, b] - y0
                        sel = (iota_w == rel[None, :]).astype(jnp.bfloat16)
                        hi = win.astype(jnp.bfloat16)
                        lo = (win - hi.astype(win.dtype)).astype(jnp.bfloat16)
                        hl = jnp.concatenate([hi, lo], axis=0)
                        o2 = jnp.dot(hl, sel,
                                     preferred_element_type=win.dtype)
                        outrow[:, b * BS:(b + 1) * BS] = o2[:nf] + o2[nf:]
            else:
                outrow[:, :] = acc_ref[:, :NXP]
            d = off - off_al
            stream[slot, :, :128] = pending[:, :]
            stream[slot, :, 128:] = outrow[:, :]
            rolled = pltpu.roll(stream[slot], (NS + d - 128) % NS, axis=1)
            stream[slot, :, :] = rolled
            pend = pltpu.roll(outrow[:, :], (NXP + 128 - nx) % NXP, axis=1)
            pending[:, :] = pend[:, :128]

            @pl.when(r >= 1)
            def _(r=r, slot=slot):
                pltpu.make_async_copy(
                    stream.at[1 - slot],
                    out_any.at[:, pl.ds(meta_ref[r - 1, NB + 2] * 128, NS)],
                    sem.at[1 - slot]).wait()

            copy = pltpu.make_async_copy(
                stream.at[slot], out_any.at[:, pl.ds(off_al, NS)],
                sem.at[slot])
            copy.start()

            @pl.when(r == nrows_t - 1)
            def _(copy=copy):
                copy.wait()

    from functools import partial as _p

    @_p(jax.jit, static_argnames=())
    def run(meta, line, planes, offs):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nrows // R,),
            in_specs=[
                pl.BlockSpec((R, nf, L), lambda r, m: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, W, L), lambda r, m: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, NB, BS), lambda r, m: (r, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((nf, L), jnp.float32),
                pltpu.VMEM((nf, NXP), jnp.float32),
                pltpu.VMEM((2, nf, NXP + 128), jnp.float32),
                pltpu.VMEM((nf, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        return pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nf, size_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=int(110 * 2**20)),
        )(meta, line, planes, offs)

    return lambda line, planes, meta, offs: run(meta, line, planes, offs)


timeit("kernel no-dots", make_variant(True, False), line, planes, meta_j,
       offs_j)
timeit("kernel no-rolls", make_variant(False, True), line, planes, meta_j,
       offs_j)
timeit("kernel dma-only", make_variant(False, False), line, planes, meta_j,
       offs_j)
timeit("kernel block-rolls", make_variant(True, True, block_rolls=True),
       line, planes, meta_j, offs_j)

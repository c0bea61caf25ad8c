#!/usr/bin/env python
"""Stage-accurate profile of the TransLocal inverse transform on the chip.

Times (a) every setup phase — mmap load, Legendre device upload, Fourier
tables, KB resample planes, ResampleCompact init + table upload — and (b)
every iteration stage as K-vs-1 fori-chain differences: pack, Legendre
gathers, Legendre einsums, four-step einsums, resample+compact, full chain.
The stage sum is printed against the full-chain time so every millisecond of
the iteration has a name (VERDICT r4 ask #1).

All large tables are passed as jit ARGUMENTS (closure-captured device arrays
get embedded as HLO constants and overflow the tunnel's remote_compile
request limit).

Usage: python tools/prof_trans.py [T] [grid] [nf] [K]  (default 1279 O1280 32 8)
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.cache/atlas_tpu/jaxcache")

T = int(sys.argv[1]) if len(sys.argv) > 1 else 1279
gname = sys.argv[2] if len(sys.argv) > 2 else "O1280"
nf = int(sys.argv[3]) if len(sys.argv) > 3 else 32
K = int(sys.argv[4]) if len(sys.argv) > 4 else 8

from atlas_tpu import Grid  # noqa: E402
import atlas_tpu.trans.trans_local as tl  # noqa: E402
import atlas_tpu.trans.fourier as fo  # noqa: E402
from atlas_tpu.io import cache as ioc  # noqa: E402
from atlas_tpu.trans.legendre import nspec2, spectral_index  # noqa: E402


def timed(name, fn):
    def w(*a, **k):
        t0 = time.perf_counter()
        r = fn(*a, **k)
        print(f"[setup] {name}: {time.perf_counter() - t0:.2f}s", flush=True)
        return r

    return w


ioc.load_packed = timed("load_packed mmap", ioc.load_packed)
ioc.load_legendre = timed("load_legendre mmap", ioc.load_legendre)
tl._BucketedLegendre.from_packed = timed(
    "legendre from_packed (jnp.asarray of mmap)",
    tl._BucketedLegendre.from_packed)
fo._fourstep_tables = timed("fourstep tables", fo._fourstep_tables)
_orig_br = fo.FourierSynthesis._build_resample
fo.FourierSynthesis._build_resample = timed("build_resample (KB planes)",
                                            _orig_br)

grid = Grid(gname)
t0 = time.perf_counter()
tr = tl.TransLocal(grid, T, dtype=jnp.float32, use_cache=True,
                   precision="highest")
print(f"[setup] TransLocal total: {time.perf_counter() - t0:.2f}s",
      flush=True)


def sync_tree(tree, label):
    """Force transfers with ONE compiled program (per-array scalar fetches
    each cost a tunnel compile)."""
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and x.size]
    t0 = time.perf_counter()

    @jax.jit
    def first_sum(xs):
        return sum(x.reshape(-1)[0].astype(jnp.float32) for x in xs)

    float(first_sum(leaves))
    nb = sum(x.size * x.dtype.itemsize for x in leaves)
    dt = time.perf_counter() - t0
    print(f"[setup] {label} upload sync: {dt:.2f}s for {nb/1e6:.0f} MB "
          f"({nb/1e6/max(dt, 1e-9):.0f} MB/s incl one compile)", flush=True)


sync_tree(tr.legendre.tables, "legendre")

fs = tr.fourier
print(f"kind={fs.kind} L={getattr(fs, 'L', None)}", flush=True)
if fs._tabs is not None:
    print(f"tabs n1={fs._tabs['n1']} n2={fs._tabs['n2']} M2={fs._tabs['M2']}",
          flush=True)

rc = None
rc_tabs = None
if fs.kind == "resample":
    t0 = time.perf_counter()
    rc = fs.resampler(nf)
    print(f"[setup] ResampleCompact init: {time.perf_counter() - t0:.2f}s",
          flush=True)
    t0 = time.perf_counter()
    rc_tabs = rc.tables()
    print(f"[setup] rc.tables build: {time.perf_counter() - t0:.2f}s",
          flush=True)
    sync_tree(rc_tabs, "rc planes")
    print(f"[rc] segments="
          f"{[(s_['r1']-s_['r0'], s_['WSEL'], s_['NXP']) for s_ in rc.segments]} "
          f"slow_points={rc.slow_points}", flush=True)

rng = np.random.default_rng(0)
sp_np = rng.standard_normal((nf, nspec2(T))).astype(np.float32)
ms, _ = spectral_index(T)
sp_np[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
sp = jnp.asarray(sp_np)
sync_tree([sp], "spectra")

prec = "highest"
leg_tabs = tr.legendre.tables
im_mask = tr._im_mask
tb = fs._tabs
phc, phs = tr._phase if tr._phase is not None else (None, None)
if fs.kind == "resample" and tr._phase is None:
    layout, mult = "line2", tr._fourier_mult2
elif fs.kind == "resample":
    layout, mult = "line", tr._fourier_mult
else:
    layout, mult = "flat", tr._fourier_mult

from atlas_tpu.trans.fourier import invtrans_fourstep_fused  # noqa: E402
from atlas_tpu.trans.trans_local import (  # noqa: E402
    _bucketed_leg_apply, _pack_rhs)

eps = jnp.asarray(1e-30, jnp.float32)
results = {}


def fori_pair(name, make_chain, *ops):
    """make_chain(k) -> jitted fn(*ops) -> scalar, running k iterations."""
    c1, cK = make_chain(1), make_chain(K)
    float(c1(*ops)), float(cK(*ops))
    t0 = time.perf_counter()
    float(c1(*ops))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(cK(*ops))
    tK = time.perf_counter() - t0
    results[name] = (tK - t1) / (K - 1)
    print(f"[iter] {name}: {results[name]*1e3:.2f} ms", flush=True)


def four_apply(S, A, mult, rc_tabs):
    out = invtrans_fourstep_fused(
        S, A, mult, phc, phs, tb["E2r"], tb["E2i"], tb["EC"],
        grid.ny, nf, tb["n1"], tb["n2"], tb["M2"], prec, layout)
    if rc is not None:
        out = rc.apply(out, rc_tabs, fs._shifts)
    return out


# ---- full chain ----------------------------------------------------------
def mk_full(k):
    @jax.jit
    def run(sp, tabs, imm, mult, rct):
        def body(_, sp):
            rhs = _pack_rhs(sp, imm)
            S, A = _bucketed_leg_apply(tabs, rhs, prec)
            gp = four_apply(S, A, mult, rct)
            return sp + gp.mean() * eps

        return jnp.sum(jax.lax.fori_loop(0, k, body, sp))

    return run


fori_pair("full", mk_full, sp, leg_tabs, im_mask, mult, rc_tabs)


# ---- pack only -----------------------------------------------------------
def mk_pack(k):
    @jax.jit
    def run(sp, imm):
        def body(_, sp):
            rhs = _pack_rhs(sp, imm)
            return sp + rhs.mean() * eps

        return jnp.sum(jax.lax.fori_loop(0, k, body, sp))

    return run


fori_pair("pack_rhs", mk_pack, sp, im_mask)

rhs0 = jax.jit(_pack_rhs)(sp, im_mask)
sync_tree([rhs0], "rhs0")


# ---- legendre gathers only ----------------------------------------------
def mk_gather(k):
    @jax.jit
    def run(rhs, tabs):
        def body(_, rhs):
            q = rhs.shape[1]
            pad = 2 * max(max(t_[1].shape[1], t_[3].shape[1])
                          for t_ in tabs)
            rp = jnp.pad(rhs, ((0, pad), (0, 0)))
            acc = eps
            for (Ps, mks, Pa, mka, starts) in tabs:
                sb_s, sb_a = mks.shape[1], mka.shape[1]
                sbmax = max(sb_s, sb_a)
                sl = jax.vmap(lambda s: jax.lax.dynamic_slice(
                    rp, (s, jnp.zeros((), s.dtype)), (2 * sbmax, q)))(starts)
                sl = sl.reshape(sl.shape[0], sbmax, 2, q)
                acc = acc + (sl[:, :sb_s, 0, :] * mks[..., None]).mean()
                acc = acc + (sl[:, :sb_a, 1, :] * mka[..., None]).mean()
            return rhs + acc * eps

        return jnp.sum(jax.lax.fori_loop(0, k, body, rhs))

    return run


fori_pair("leg_gathers", mk_gather, rhs0, leg_tabs)


# ---- legendre (gathers + einsums) ---------------------------------------
def mk_leg(k):
    @jax.jit
    def run(rhs, tabs):
        def body(_, rhs):
            S, A = _bucketed_leg_apply(tabs, rhs, prec)
            return rhs + (S.mean() + A.mean()) * eps

        return jnp.sum(jax.lax.fori_loop(0, k, body, rhs))

    return run


fori_pair("legendre", mk_leg, rhs0, leg_tabs)

S0, A0 = jax.jit(_bucketed_leg_apply, static_argnames=("precision",))(
    leg_tabs, rhs0, prec)
sync_tree([S0, A0], "S0/A0")


# ---- four-step einsums only (no resample) -------------------------------
def mk_fourstep(k):
    @jax.jit
    def run(S, A, mult):
        def body(_, S):
            line = invtrans_fourstep_fused(
                S, A, mult, phc, phs, tb["E2r"], tb["E2i"], tb["EC"],
                grid.ny, nf, tb["n1"], tb["n2"], tb["M2"], prec, layout)
            if isinstance(line, tuple):
                return S + (line[0].mean() + line[1].mean()) * eps
            return S + line.mean() * eps

        return jnp.sum(jax.lax.fori_loop(0, k, body, S))

    return run


fori_pair("fourstep", mk_fourstep, S0, A0, mult)

# ---- resample+compact only ----------------------------------------------
if rc is not None:
    line0 = jax.jit(
        invtrans_fourstep_fused,
        static_argnames=("ny", "nf", "n1", "n2", "M2", "precision",
                         "layout"))(
        S0, A0, mult, phc, phs, tb["E2r"], tb["E2i"], tb["EC"],
        grid.ny, nf, tb["n1"], tb["n2"], tb["M2"], prec, layout)
    if not isinstance(line0, tuple):
        line0 = (line0,)
    sync_tree(list(line0), "line0")

    def mk_rc(k):
        @jax.jit
        def run(ln, rest, rct):
            def body(_, ln):
                pair = (ln,) + tuple(rest)
                out = rc.apply(pair if len(pair) > 1 else pair[0],
                               rct, fs._shifts)
                return ln + out.mean() * eps

            return jnp.sum(jax.lax.fori_loop(0, k, body, ln))

        return run

    fori_pair("resample", mk_rc, line0[0], line0[1:], rc_tabs)


# ---- fourier as benched (fourstep + resample together) -------------------
def mk_fou(k):
    @jax.jit
    def run(S, A, mult, rct):
        def body(_, S):
            gp = four_apply(S, A, mult, rct)
            return S + gp.mean() * eps

        return jnp.sum(jax.lax.fori_loop(0, k, body, S))

    return run


fori_pair("fourier_total", mk_fou, S0, A0, mult, rc_tabs)

named = results.get("pack_rhs", 0) + results.get("legendre", 0) \
    + results.get("fourier_total", 0)
print(f"[sum] pack+legendre+fourier = {named*1e3:.2f} ms "
      f"vs full {results['full']*1e3:.2f} ms "
      f"(unaccounted {(results['full']-named)*1e3:.2f} ms)", flush=True)

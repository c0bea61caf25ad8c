#!/usr/bin/env python
"""North-star benchmark: fvm gradient iterations (atlas-benchmark equivalent).

Mirrors the reference harness src/sandbox/apps/atlas-benchmark.cc:409-501: per
iteration an edge "loop" (avgS = S * 0.5 (f1 + f2)), a signed node
accumulation divided by dual volumes, and the periodic halo update — on a
reduced Gaussian grid with nlev levels.

Implementations benchmarked:
  pallas  shift-structured Pallas kernel (fvm/pallas_kernels.py), the TPU-
          native fast path: weights resident per row-tile, all stencil shifts
          in-register. Default.
  xla     shift-structured XLA version (fvm/structured.py)
  gather  mesh-based gather + segment-sum (fvm/nabla.py), the general path

Timing notes: the dev tunnel to the chip makes block_until_ready cost one
~25-30 ms round trip, and Pallas kernels inside jax control flow do not
compile on this platform, so the pallas path is timed per-call with the
measured round-trip subtracted; the xla path is cross-checked with a
fori_loop chain (pure compute, no per-iteration round trips).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "gridpoints/s", "vs_baseline": N}
vs_baseline = achieved fraction of the chip's HBM-bandwidth roofline for the
kernel's minimum traffic (the reference publishes no numbers — BASELINE.md).
"""

import argparse
import json
import time

import numpy as np


def _emit(metric, value, unit, vs_baseline, detail):
    rec = {
        "metric": metric,
        "value": value,
        "unit": unit,
        "vs_baseline": vs_baseline,
        "detail": detail,
    }
    print(json.dumps(rec), flush=True)
    return rec


def _fori_pair(make_chain, *operands):
    """Time one iteration via K-vs-1 fori chains with a scalar fetch.

    block_until_ready does not synchronize through the device tunnel, so both
    chains end in a jnp.sum fetched to host; the difference removes dispatch
    and fetch overhead.
    """
    chain1, chainK, K = make_chain()
    float(chain1(*operands))
    float(chainK(*operands))  # compile both
    t0 = time.perf_counter()
    float(chain1(*operands))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    sK = float(chainK(*operands))
    t_K = time.perf_counter() - t0
    assert np.isfinite(sK), "benchmark chain produced non-finite values"
    t_iter = max((t_K - t_one) / (K - 1), 1e-9)
    note = f"fori chain diff: {K} iters {t_K*1e3:.2f} ms vs 1 iter {t_one*1e3:.2f} ms"
    return t_iter, note


def _separable_reference_f64(interp, f_np):
    """Host f64 evaluation of the separable two-pass kernel (accuracy gate)."""
    s = interp._sep
    fpad = f_np[s.pad_gather]  # (ny, nxw, nch)
    ny, nxt, k = s.idx1.shape
    vals = np.take_along_axis(
        fpad, s.idx1.reshape(ny, nxt * k)[:, :, None], axis=1
    ).reshape(ny, nxt, k, -1)
    if interp.kind == "quasicubic":
        tmp_c = (vals * s.wx[..., None]).sum(axis=2)
        tmp_l = (vals * s.wx_lin[..., None]).sum(axis=2)
        inner = np.zeros(k)
        inner[1:-1] = 1.0
        out = (tmp_c[s.rows] * (s.wy * inner)[..., None, None]).sum(axis=1)
        out += (tmp_l[s.rows] * (s.wy * (1 - inner))[..., None, None]).sum(axis=1)
    else:
        tmp = (vals * s.wx[..., None]).sum(axis=2)
        out = (tmp[s.rows] * s.wy[..., None, None]).sum(axis=1)
    return out.reshape(-1, f_np.shape[-1])


def bench_bicubic(args):
    """BASELINE config 2: structured bicubic O320 -> regular 0.25 deg.

    Measures the separable two-pass fast path (interpolation/structured.py):
    x-resample each source row to the shared target longitudes, then y-combine
    k consecutive rows. Accuracy-gated against a host f64 evaluation.
    """
    import jax
    import jax.numpy as jnp

    from atlas_tpu import Grid
    from atlas_tpu.interpolation import Interpolation
    from atlas_tpu.interpolation.structured import (
        _apply_separable, _apply_windowed)

    dtype = jnp.dtype(args.dtype)
    src = Grid(args.grid)
    tgt = Grid("L1440x721") if not args.quick else Grid("L360x181")
    t0 = time.time()
    interp = Interpolation("structured-bicubic", src, tgt)
    setup_s = time.time() - t0
    assert interp._sep is not None, "separable fast path not taken"
    nlev = args.nlev
    f = jax.random.normal(jax.random.key(0), (src.size, nlev), dtype)

    # accuracy gate: device result vs host f64 separable evaluation
    out_dev = np.asarray(interp.execute(f[:, :2]))
    ref = _separable_reference_f64(interp, np.asarray(f[:, :2], np.float64))
    max_rel_err = float(np.abs(out_dev - ref).max() / np.abs(ref).max())
    tol = 1e-5 if dtype == jnp.float32 else 1e-12
    assert max_rel_err < tol, f"bicubic accuracy gate: {max_rel_err} >= {tol}"

    t = interp._sep_tables(dtype)
    s = interp._sep
    # tables must be ARGUMENTS of the outer jit: closed-over device arrays
    # are embedded as HLO constants (a ~0.5 GB program upload)
    if s.Wt is not None and jax.default_backend() in ("tpu", "axon"):
        pk = interp.pass1_kernel(nlev)
        if nlev % 64 == 0:
            # same guard as structured.execute: Mosaic needs a lane-clean
            # (XC, nch) minor merge for the Pallas pass 2
            from atlas_tpu.interpolation.pallas_pass1 import pass2_rows

            impl = "pallas-pass1 + pallas-pass2"
            Ahl, nyp, nyt_p2 = interp._pass2_matrix_hl()
            ops = (pk.tables(), Ahl, t["pad_gather"], t["idx1"], t["wx"])

            def apply_fn(f, tabs):
                ptabs, Ahl, pg, idx1, wx = tabs
                tmp = pk.apply(f, {"pad_gather": pg, "idx1": idx1,
                                   "wx": wx}, tabs=ptabs, padded=True)
                return pass2_rows(Ahl, tmp, nyp, 16)[
                    :nyt_p2, : s.nxt].reshape(-1, f.shape[-1])
        else:
            from atlas_tpu.interpolation.structured import _pass2_gemm

            impl = "pallas-pass1 + gemm-pass2"
            A2 = interp._pass2_matrix(dtype)
            ops = (pk.tables(), A2, t["pad_gather"], t["idx1"], t["wx"])

            def apply_fn(f, tabs):
                ptabs, A2, pg, idx1, wx = tabs
                tmp = pk.apply(f, {"pad_gather": pg, "idx1": idx1,
                                   "wx": wx}, tabs=ptabs)
                return _pass2_gemm(tmp, A2)
    elif s.Wt is not None:
        impl = "windowed-mxu"
        ops = (t["pad_gather"], t["win_start"], t["Wt"], t["rows"], t["wy"])

        def apply_fn(f, tabs):
            return _apply_windowed(*tabs, s.nxt, f)
    else:
        impl = "separable-gather"
        ops = (t["pad_gather"], t["idx1"], t["wx"], t["rows"], t["wy"])

        def apply_fn(f, tabs):
            return _apply_separable(*tabs, f)

    K = max(args.niter, 20)

    def make_chain():
        def make(k):
            @jax.jit
            def chain(f, *tabs):
                def body(_, f):
                    out = apply_fn(f, tabs)
                    return f + out.mean() * jnp.asarray(1e-30, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, f))

            return chain

        return make(1), make(K), K

    t_iter, note = _fori_pair(make_chain, f, *ops)
    ntgt = interp.ntgt
    kst = interp.k
    # min traffic: src read + padded-row build + pass-1 window reads (+ the
    # level-independent weight tensor) + row-resample write + pass-2 reads +
    # target write
    elems = (
        src.size
        + 2 * s.ny * s.nxw  # padded-layout gather write + window reads source
        + s.ny * s.nxt  # tmp write
        + s.nyt * kst * s.nxt  # pass-2 reads
        + ntgt
    )
    if s.Wt is not None:
        elems += s.Wt.shape[0] * s.Wt.shape[1] * s.Wt.shape[3]  # window reads
        wt_bytes = s.Wt.size * dtype.itemsize
    else:
        elems += s.ny * s.nxt * kst  # pass-1 gather reads
        wt_bytes = 0
    traffic = elems * nlev * dtype.itemsize + wt_bytes
    return _emit(
        f"bicubic_{args.grid}_to_{tgt.name}_nlev{nlev}_targetpoints_per_s",
        ntgt * nlev / t_iter, "targetpoints/s",
        (traffic / t_iter) / 819e9,
        {"metric_kind": "bicubic", "src": args.grid, "tgt": tgt.name,
         "ntgt": int(ntgt), "nlev": nlev, "iter_time_s": t_iter,
         "setup_s": setup_s, "timing_note": note, "dtype": str(dtype),
         "impl": impl, "max_rel_err": max_rel_err,
         "note": "vs_baseline = separable two-pass min traffic / 819 GB/s "
                 "v5e HBM peak; accuracy-gated vs host f64"},
    )


def _invtrans_ref_f64(tr, sp):
    """Host f64 reference inverse transform (accuracy gate for bench_trans)."""
    t, half, grid = tr.truncation, tr.nlat_half, tr.grid
    ms, ns = tr.ms, tr.ns
    P = tr.P_compact  # (half, ncoef) f64
    nf = sp.shape[0]
    re = sp[:, 0::2].astype(np.float64)
    im = sp[:, 1::2].astype(np.float64).copy()
    im[:, ms == 0] = 0.0
    coef = re + 1j * im
    F = np.zeros((nf, grid.ny, t + 1), np.complex128)
    for m in range(t + 1):
        k = np.flatnonzero(ms == m)
        par = (ns[k] - m) % 2
        cs = coef[:, k[par == 0]] @ P[:, k[par == 0]].T  # (nf, half)
        ca = coef[:, k[par == 1]] @ P[:, k[par == 1]].T
        north, south = cs + ca, cs - ca
        F[:, :half, m] = north
        F[:, half:, m] = south[:, ::-1][:, 2 * half - grid.ny:]
    mm = np.arange(t + 1)
    F *= np.exp(1j * np.outer(tr.x0, mm))[None]
    out = np.empty((nf, grid.size))
    for nx in np.unique(grid.nx):
        rows = np.flatnonzero(grid.nx == nx)
        nx = int(nx)
        mact = min(t, (nx - 1) // 2)
        spec = np.zeros((nf, len(rows), nx // 2 + 1), np.complex128)
        spec[:, :, : mact + 1] = F[:, rows, : mact + 1]
        spec[:, :, 1:] *= 0.5
        vals = np.fft.irfft(spec * nx, n=nx, axis=-1)
        idx = np.concatenate(
            [np.arange(grid.row_offset[r], grid.row_offset[r] + nx)
             for r in rows])
        out[:, idx] = vals.reshape(nf, -1)
    return out


def bench_trans(args):
    """BASELINE config 3 at reference scale: TransLocal inverse transform
    (m-bucketed Legendre MXU einsums + four-step GEMM-FFT Fourier stage,
    with KB shift-resample on reduced grids), per-stage breakdown and a
    host-f64 accuracy gate. Default T639 -> F640; the matrix also runs
    T1279 -> O1280 (reference parallel-transform scale)."""
    import jax
    import jax.numpy as jnp

    from atlas_tpu import Grid
    from atlas_tpu.trans import TransLocal, nspec2, spectral_index
    from atlas_tpu.trans.fourier import invtrans_fourstep_fused
    from atlas_tpu.trans.trans_local import (
        _bucketed_leg_apply, _invtrans_fourier_fused, _pack_rhs)

    dtype = jnp.dtype(args.dtype)
    T = getattr(args, "trans_T", 639)
    gname = getattr(args, "trans_grid", "F640")
    if args.quick:
        T, gname = 42, "F24"
    grid = Grid(gname)
    t0 = time.time()
    tr = TransLocal(grid, T, dtype=dtype, use_cache=True,
                    precision=args.precision)
    setup_s = time.time() - t0
    nf = args.nlev
    rng = np.random.default_rng(0)
    sp_np = rng.standard_normal((nf, nspec2(T))).astype(args.dtype)
    ms, _ = spectral_index(T)
    sp_np[:, 2 * np.flatnonzero(ms == 0) + 1] = 0.0
    sp = jnp.asarray(sp_np)

    # accuracy gate: full device transform vs host f64 reference (2 fields)
    out_dev = np.asarray(tr.invtrans(sp[:2]))
    ref = _invtrans_ref_f64(tr, sp_np[:2])
    max_rel_err = float(np.abs(out_dev - ref).max() / np.abs(ref).max())
    tol = {"float32": 2e-4, "float64": 1e-10}.get(str(dtype), 2e-4)
    assert max_rel_err < tol, f"trans accuracy gate: {max_rel_err} >= {tol}"

    K = max(args.niter, 20)
    half = tr.nlat_half
    nf2 = nf * 2
    leg_tabs = tr.legendre.tables
    leg_fetch = "slice" if T >= 1000 else "gather"
    im_mask = tr._im_mask
    prec = args.precision
    fs = tr.fourier
    kind = fs.kind

    # device-upload share, measured separately (jnp.asarray transfers are
    # async; the constructor returns before they land on HBM). One jitted
    # first-element sum forces every pending table transfer to completion.
    t0 = time.time()
    _leaves = [x for x in jax.tree_util.tree_leaves(
        (leg_tabs, fs._tabs)) if hasattr(x, "dtype")]

    @jax.jit
    def _first_sum(xs):
        return sum(x.reshape(-1)[0].astype(jnp.float32) for x in xs)

    float(_first_sum(_leaves))
    upload_sync_s = time.time() - t0
    setup_breakdown = dict(getattr(tr, "setup_detail", {}),
                           upload_sync_s=upload_sync_s)

    # ---- Fourier apply (big tables as ARGS, not closure constants) --------
    if kind != "gemm":
        tb = fs._tabs
        phc, phs = tr._phase if tr._phase is not None else (None, None)
        if kind == "resample" and tr._phase is None:
            layout, mult_op = "line2", tr._fourier_mult2
        elif kind == "resample":
            layout, mult_op = "line", tr._fourier_mult
        else:
            layout, mult_op = "flat", tr._fourier_mult
        rc = fs.resampler(nf) if kind == "resample" else None
        rc_tabs = rc.tables() if rc is not None else None
        four_ops = (mult_op, rc_tabs)

        def four_apply(S, A, mult, rc_tabs):
            out = invtrans_fourstep_fused(
                S, A, mult, phc, phs, tb["E2r"], tb["E2i"], tb["EC"],
                grid.ny, nf, tb["n1"], tb["n2"], tb["M2"], prec, layout)
            if rc is not None:
                out = rc.apply(out, rc_tabs, fs._shifts)
            return out
    else:
        M_four = tr._fourier_groups[0][1]
        four_ops = ()

        def four_apply(S, A):
            return _invtrans_fourier_fused(S, A, M_four, grid.ny, nf, prec)

    # ---- full invtrans chain ----------------------------------------------
    def make_full():
        def make(k):
            @jax.jit
            def chain(sp, tabs, imm, *fops):
                def body(_, sp):
                    rhs = _pack_rhs(sp, imm)
                    S, A = _bucketed_leg_apply(tabs, rhs, prec, 0, leg_fetch)
                    gp = four_apply(S, A, *fops)
                    return sp + gp.mean() * jnp.asarray(1e-30, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, sp))

            return chain

        return make(1), make(K), K

    t_iter, note = _fori_pair(make_full, sp, leg_tabs, im_mask, *four_ops)

    # ---- Legendre-only chain ---------------------------------------------
    rhs0 = _pack_rhs(sp, im_mask)

    def make_leg():
        def make(k):
            @jax.jit
            def chain(rhs, tabs):
                def body(_, rhs):
                    S, A = _bucketed_leg_apply(tabs, rhs, prec, 0, leg_fetch)
                    return rhs + (S.mean() + A.mean()) * jnp.asarray(1e-30, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, rhs))

            return chain

        return make(1), make(K), K

    t_leg, _ = _fori_pair(make_leg, rhs0, leg_tabs)

    # ---- pack-only chain (spectra de-interleave + bucket layout) ----------
    def make_pack():
        def make(k):
            @jax.jit
            def chain(sp, imm):
                def body(_, sp):
                    rhs = _pack_rhs(sp, imm)
                    return sp + rhs.mean() * jnp.asarray(1e-30, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, sp))

            return chain

        return make(1), make(K), K

    t_pack, _ = _fori_pair(make_pack, sp, im_mask)

    # ---- Fourier-only chain (S, A held fixed) ------------------------------
    S0, A0 = _bucketed_leg_apply(leg_tabs, rhs0, prec, 0, leg_fetch)

    def make_fou():
        def make(k):
            @jax.jit
            def chain(S, A, *fops):
                def body(_, S):
                    gp = four_apply(S, A, *fops)
                    return S + gp.mean() * jnp.asarray(1e-30, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, S))

            return chain

        return make(1), make(K), K

    t_fou, _ = _fori_pair(make_fou, S0, A0, *four_ops)

    # exact (compact) Legendre FLOPs; padding waste logged separately
    macs = half * (T + 1) * (T + 2) // 2 * nf2
    flops = 2 * macs
    # Fourier FLOPs actually executed by the chosen algorithm
    if kind != "gemm":
        tb = fs._tabs
        n1, M2 = tb["n1"], tb["M2"]
        pts = grid.ny * fs.L
        fou_flops = 2 * nf * pts * (2 * n1 + 4 * M2)
        if kind == "resample":
            fou_flops += 2 * nf * pts * len(fs._shifts)
    else:
        fou_flops = 2 * nf * int(np.sum(2 * (T + 1) * grid.nx))
    # effective MXU peak for the chosen f32 matmul precision (multi-pass
    # bf16 emulation: high = 3 passes, highest = 6)
    eff_peak = {"default": 197e12, "high": 197e12 / 3,
                "highest": 197e12 / 6}[prec]
    detail = {
        "metric_kind": "trans", "truncation": T, "grid": gname, "nf": nf,
        "iter_time_s": t_iter, "legendre_s": t_leg, "fourier_s": t_fou,
        "pack_s": t_pack,
        "stage_sum_fraction": (t_pack + t_leg + t_fou) / t_iter,
        "setup_s": setup_s, "setup_breakdown": setup_breakdown,
        "timing_note": note,
        "legendre_GFLOP": flops / 1e9, "fourier_GFLOP": fou_flops / 1e9,
        "fourier_impl": kind,
        "legendre_padding_waste": tr.legendre.waste,
        "legendre_table_MB": sum(
            int(np.prod(t_[0].shape)) for t_ in leg_tabs) * 4 / 1e6,
        "precision": prec, "max_rel_err": max_rel_err,
        "dtype": str(dtype),
        "note": "vs_baseline = (compact Legendre + executed Fourier) FLOPs "
                "over the FULL iteration time, against the precision-"
                "adjusted v5e MXU peak (197 TF/s bf16; /3 high, /6 "
                "highest); accuracy-gated vs host f64",
    }
    if kind != "gemm":
        detail["fourstep"] = {"n1": int(tb["n1"]), "n2": int(tb["n2"]),
                              "M2": int(tb["M2"]), "L": int(fs.L)}
    return _emit(
        f"translocal_T{T}_to_{gname}_nf{nf}_gridpoints_per_s",
        grid.size * nf / t_iter, "gridpoints/s",
        ((flops + fou_flops) / t_iter) / eff_peak,
        detail,
    )


def _np_shift2(a, dj, dc):
    """numpy zero-padded shift: res[j, c] = a[j+dj, c+dc] (2D)."""
    ny, nxw = a.shape[-2:]
    res = np.zeros_like(a)
    j_lo, j_hi = max(0, -dj), min(ny, ny - dj)
    c_lo, c_hi = max(0, -dc), min(nxw, nxw - dc)
    res[..., j_lo:j_hi, c_lo:c_hi] = a[..., j_lo + dj:j_hi + dj,
                                       c_lo + dc:c_hi + dc]
    return res


def _swe_stage_ref_f64(model, h, u, v, dt, rows=None):
    """Host f64 Euler stage out = s + dt*tend(fill(s)) on a row band, plus a
    pointwise first-order roundoff bound (abs-value accumulation of the same
    expression). Mirrors _swe_tendencies / the fused Pallas stage; physics per
    reference numerics/fvm/Nabla.cc:96-558. rows=(j0, j1) restricts the
    returned arrays to that band (computed with one ghost row each side).

    Returns (h', u', v', bound_h, bound_u, bound_v) on the band."""
    from atlas_tpu.model.shallow_water import GRAVITY
    from atlas_tpu.util.constants import DEG2RAD

    s = model.sfvm.shifts
    ny = s.ny
    if rows is None:
        rows = (0, ny)
    j0, j1 = rows
    # halo fill on the (cheap) full columns, then slice band + 1 ghost row
    def fill(f):
        f = f.astype(np.float64).copy()
        f[s.halo_rows, s.halo_dst] = f[s.halo_rows, s.halo_src]
        return f

    lo, hi = max(0, j0 - 1), min(ny, j1 + 1)
    mt, mb = j0 - lo, hi - j1  # ghost margins actually present
    hf, uf, vf = fill(h)[lo:hi], fill(u)[lo:hi], fill(v)[lo:hi]
    cl = s.cos_lat[lo:hi]
    g = GRAVITY
    # stage channels (same five the Pallas kernel streams)
    E = g * hf + 0.5 * (uf * uf + vf * vf)
    hu = hf * uf
    hvc = hf * vf * cl
    uc = uf * cl
    chans = (E, hu, hvc, uc, vf)
    chans_a = tuple(np.abs(c) for c in chans)

    regs = [((0, 0), s.S_total_regular)] + [
        (k, S) for k, S in s.keys_regular.items()]
    poles = [((0, 0), s.S_total_pole)] + [
        (k, S) for k, S in s.keys_pole.items()]
    accs = [np.zeros_like(hf) for _ in range(4)]   # Ex, Ey, D, Z
    bnds = [np.zeros_like(hf) for _ in range(4)]
    for (dj, dc), S in regs:
        Sx, Sy = S[lo:hi, :, 0], S[lo:hi, :, 1]
        sh = [c if (dj, dc) == (0, 0) else _np_shift2(c, dj, dc)
              for c in chans]
        sha = [c if (dj, dc) == (0, 0) else _np_shift2(c, dj, dc)
               for c in chans_a]
        accs[0] += sh[0] * Sx
        accs[1] += sh[0] * Sy
        accs[2] += sh[1] * Sx + sh[2] * Sy
        accs[3] += sh[4] * Sx - sh[3] * Sy
        aSx, aSy = np.abs(Sx), np.abs(Sy)
        bnds[0] += sha[0] * aSx
        bnds[1] += sha[0] * aSy
        bnds[2] += sha[1] * aSx + sha[2] * aSy
        bnds[3] += sha[4] * aSx + sha[3] * aSy
    for (dj, dc), S in poles:  # pole edges: energy gradient only (pbc = 0)
        Sx, Sy = S[lo:hi, :, 0], S[lo:hi, :, 1]
        Es = chans[0] if (dj, dc) == (0, 0) else _np_shift2(chans[0], dj, dc)
        Ea = chans_a[0] if (dj, dc) == (0, 0) else _np_shift2(
            chans_a[0], dj, dc)
        accs[0] += Es * Sx
        accs[1] += Es * Sy
        bnds[0] += Ea * np.abs(Sx)
        bnds[1] += Ea * np.abs(Sy)

    mask = s.mask[lo:hi]
    Mx = 0.5 * DEG2RAD * s.metric_x[lo:hi] * mask
    My = 0.5 * DEG2RAD * s.metric_y[lo:hi] * mask
    Md = 0.5 * DEG2RAD * (s.metric_y * s.inv_cos)[lo:hi] * mask
    cor = model.coriolis[lo:hi]
    gx, gy = accs[0] * Mx, accs[1] * My
    div, zeta = accs[2] * Md, accs[3] * Md
    bgx, bgy = bnds[0] * Mx, bnds[1] * My
    bdiv, bzeta = bnds[2] * Md, bnds[3] * Md
    fz = cor + zeta
    th = -div * mask
    tu = (fz * vf - gx) * mask
    tv = (-fz * uf - gy) * mask
    afz = np.abs(cor) + bzeta
    bth = bdiv * mask
    btu = (afz * np.abs(vf) + bgx) * mask
    btv = (afz * np.abs(uf) + bgy) * mask
    sl = slice(mt, hf.shape[0] - mb)
    out = []
    for f, t, bt in ((hf, th, bth), (uf, tu, btu), (vf, tv, btv)):
        out.append((f + dt * t)[sl])
        out.append((np.abs(f) + dt * bt)[sl])
    return out[0], out[2], out[4], out[1], out[3], out[5]


# multiplier on the pointwise eps32 * abs-sum roundoff bound: the stage chains
# ~20 f32 operations per output (14-key stencil + metric/axpy), so genuine
# f32 roundoff sits well under 64x the single-op bound while a sign/indexing
# bug exceeds it by orders of magnitude (reference gate analog:
# src/tests/numerics/test_fvm_nabla_validation.cc:235-254)
GATE_C = 64.0


def _gate_vs_bound(got, ref, bound, mask, eps, what):
    """Pointwise gate: |got - ref| <= GATE_C * eps * (bound + |ref|)."""
    denom = eps * (bound + np.abs(ref)) + 1e-300
    ratio = float((np.abs(got - ref) * mask / denom).max())
    assert ratio < GATE_C, f"{what} accuracy gate: err/bound ratio " \
        f"{ratio:.1f} >= {GATE_C}"
    return ratio


def bench_swe(args):
    """BASELINE config 4 (single chip): shallow-water RK3 step throughput.

    Default impl is the fused Pallas stage kernel (model/pallas_swe.py);
    --impl xla measures the shift-structured XLA path for comparison.
    vs_baseline = minimum HBM traffic of the fused step (packed weight
    tables + metric stack + field reads/writes + halo fills) over the v5e
    819 GB/s peak.
    """
    import jax
    import jax.numpy as jnp

    from atlas_tpu import Grid
    from atlas_tpu.model import ShallowWaterModel

    dtype = jnp.dtype(args.dtype)
    grid = Grid(args.grid if args.grid != "O320" else "O640")
    if args.quick:
        grid = Grid("O32")
    t0 = time.time()
    model = ShallowWaterModel(grid, dtype=dtype, use_cache=True)
    setup_s = time.time() - t0
    state = model.initial_state_williamson2()
    dt = jnp.asarray(model.suggested_dt(), dtype)

    extra = {}
    if args.impl != "xla":
        from atlas_tpu.model.pallas_swe import PallasShallowWater
        from atlas_tpu.model.shallow_water import _swe_rk3

        ps = PallasShallowWater(model)
        huv = ps.pad_state(state)

        # ---- accuracy gate 1 (every size): one fused Euler stage vs a host
        # f64 reference of the same discrete stage, pointwise against an
        # abs-sum roundoff bound, on row bands covering pole + mid-latitude +
        # equator kernel runs (reference hard-gates every operator:
        # src/tests/numerics/test_fvm_nabla_validation.cc:235-254)
        s = model.sfvm.shifts
        ny = s.ny
        h64, u64, v64 = (np.asarray(state[k], np.float64)[0]
                         for k in ("h", "u", "v"))
        stage_dev = ps._stage(huv, huv, dt, 0.0, 1.0, ps.Sx, ps.Sy, ps.M)
        got = [np.asarray(x)[:ny, :s.nxw] for x in stage_dev]
        w = 2 * ps.tjs
        bands = sorted({(0, w), (ny // 4, ny // 4 + w),
                        (ny // 2 - w // 2, ny // 2 + w // 2),
                        (ny - w, ny)})
        eps = float(np.finfo(np.float32).eps)
        ratio = 0.0
        for j0, j1 in bands:
            rh, ru, rv, bh, bu, bv = _swe_stage_ref_f64(
                model, h64, u64, v64, float(dt), rows=(j0, j1))
            m = s.mask[j0:j1]
            for gg, rr, bb, nm in ((got[0][j0:j1], rh, bh, "h"),
                                   (got[1][j0:j1], ru, bu, "u"),
                                   (got[2][j0:j1], rv, bv, "v")):
                ratio = max(ratio, _gate_vs_bound(
                    gg, rr, bb, m, eps, f"SWE stage {nm} rows {j0}:{j1}"))
        extra["stage_err_bound_ratio_vs_f64"] = ratio
        extra["stage_gate_bands"] = [list(b) for b in bands]

        # ---- accuracy gate 2 (<= O640, where the XLA program still builds):
        # full RK3 step pallas vs the independent XLA shift path, normalized
        # by PHYSICAL scales — v ~ 0 analytically in Williamson-2, so a
        # per-field max|v| denominator just measures roundoff / roundoff
        if grid.size <= 2_000_000:
            got1 = ps.unpad_state(ps.step(huv, dt))
            ref1 = _swe_rk3(model._tbl(), state, dt)
            from atlas_tpu.model.shallow_water import GRAVITY
            vel_scale = max(float(jnp.abs(ref1["u"]).max()),
                            float(np.sqrt(GRAVITY
                                          * float(jnp.abs(ref1["h"]).max()))))
            scales = {"h": float(jnp.abs(ref1["h"]).max()),
                      "u": vel_scale, "v": vel_scale}
            max_rel_err = max(
                float(jnp.abs(got1[k] - ref1[k]).max()) / scales[k]
                for k in ("h", "u", "v"))
            assert max_rel_err < 5e-5, f"pallas-vs-xla SWE step: {max_rel_err}"
            extra["max_rel_err_vs_xla"] = max_rel_err
        h1 = np.asarray(ps.unpad_state(ps.step(huv, dt))["h"])
        assert np.isfinite(h1).all()
        real = np.flatnonzero(s.mask.ravel())
        hr = h1[0].ravel()[real]
        extra["h_range_after_step_m"] = [float(hr.min()), float(hr.max())]

        sum_fn = jax.jit(lambda x: jnp.sum(x[0]))
        K = max(args.niter, 10)

        def make_chain():
            def make(k):
                def c(huv):
                    return sum_fn(ps.run(huv, dt, k))

                return c

            return make(1), make(K), K

        t_iter, note = _fori_pair(make_chain, huv)

        # per-stage breakdown: fused stage kernel vs periodic x-halo fill
        def make_stage():
            def make(k):
                @jax.jit
                def c(huv, Sx, Sy, M):
                    def body(_, x):
                        return ps._stage(x, x, dt, 0.75, 0.25, Sx, Sy, M)

                    return jnp.sum(jax.lax.fori_loop(0, k, body, huv)[0])

                return c

            return make(1), make(K), K

        t_stage, _ = _fori_pair(make_stage, huv, ps.Sx, ps.Sy, ps.M)

        def make_fill():
            def make(k):
                @jax.jit
                def c(huv):
                    def body(_, x):
                        return ps._fill3(*x)

                    return jnp.sum(jax.lax.fori_loop(0, k, body, huv)[0])

                return c

            return make(1), make(K), K

        t_fill, _ = _fori_pair(make_fill, huv)
        extra.update(stage_s=t_stage, halo_fill_s=t_fill,
                     stage_note="stage_s = one fused RK stage incl. halo "
                                "fill; halo_fill_s = the three-field "
                                "periodic x-halo fill alone")

        impl = "pallas"
        plane = ps.ny_pad * ps.nxw_pad * jnp.dtype(dtype).itemsize
        # per stage: packed S (2*amax) + metrics (6) + field reads/writes
        # (3 prev + 3 cur + 3 out) + x-halo fill (3 r + 3 w)
        traffic = 3 * (2 * ps.amax + 6 + 9 + 6) * plane
    else:
        tables = model._tbl()
        from atlas_tpu.model.shallow_water import _swe_rk3

        K = max(args.niter, 10)

        def make_chain():
            def make(k):
                @jax.jit
                def chain(state):
                    def body(_, s):
                        return _swe_rk3(tables, s, dt)

                    out = jax.lax.fori_loop(0, k, body, state)
                    return jnp.sum(out["h"])

                return chain

            return make(1), make(K), K

        t_iter, note = _fori_pair(make_chain, state)
        impl = "xla"
        s = model.sfvm.shifts
        plane = s.ny * s.nxw * jnp.dtype(dtype).itemsize
        nk = len(s.keys_regular) + len(s.keys_pole)
        traffic = 3 * (2 * (nk + 2) + 6 + 9 + 6) * plane

    return _emit(
        f"swe_rk3_{grid.name}_gridpoints_per_s",
        grid.size / t_iter, "gridpoints/s",
        (traffic / t_iter) / 819e9,
        {"metric_kind": "swe", "grid": grid.name, "impl": impl,
         "iter_time_s": t_iter, "setup_s": setup_s, "timing_note": note,
         "dt_s": float(dt), "dtype": str(dtype),
         "min_traffic_MB": traffic / 1e6, **extra,
         "note": "full vector-invariant SWE SSP-RK3 step (3 fused stages); "
                 "vs_baseline = min step traffic / 819 GB/s v5e HBM peak"},
    )


def bench_conservative(args):
    """BASELINE config 5: CS-LFR-64 conservative remap + semi-Lagrangian
    departure-point advection (on O64, the padded stencil path).

    Remap executes via the locality-sorted windowed ELL SpMM (linalg
    WindowedELL): targets sorted by minimum source index, blocked, each block
    one contiguous window slice + dense MXU contraction."""
    import jax
    import jax.numpy as jnp

    from atlas_tpu import Grid
    from atlas_tpu.interpolation import Interpolation
    from atlas_tpu.linalg import WindowedELL, windowed_ell_apply
    from atlas_tpu.model.semi_lagrangian import SemiLagrangianAdvection

    dtype = jnp.dtype(args.dtype)
    cs = Grid("CS-LFR-64" if not args.quick else "CS-LFR-16")
    tgt = Grid("O64" if not args.quick else "O16")
    t0 = time.time()
    remap = Interpolation("conservative-spherical-polygon", cs, tgt)
    # (a latitude-lexicographic src_order was measured here too: it pushes
    # fast_fraction to 1.0 but widens the base window 2x and loses ~60% on
    # wall time — the cubed-sphere tile order is already the better layout
    # for the W-class ladder, which captures 96% + the rest via wide classes)
    well = WindowedELL(remap.idx, remap.w, cs.size)
    setup_cons = time.time() - t0
    # multi-level remap: production remaps move full model columns (the
    # other matrix configs carry nlev levels too)
    nlev = args.nlev
    f = jax.random.normal(jax.random.key(0), (cs.size, nlev), dtype)

    # accuracy gate: device windowed result vs host f64 gather-dot
    out_dev = np.asarray(well.apply(f[:, :2]))
    f64 = np.asarray(f[:, :2], np.float64)
    ref = (f64[remap.idx] * remap.w[..., None]).sum(axis=1)
    scale = np.abs(ref).max()
    max_rel_err = float(np.abs(out_dev - ref).max() / scale)
    tol = 1e-5 if dtype == jnp.float32 else 1e-12
    assert max_rel_err < tol, f"remap accuracy gate: {max_rel_err} >= {tol}"

    tabs = well.tables(dtype)
    # the remap is ~0.3 ms against a ~25 ms fixed dispatch+fetch cost, so
    # the chain difference needs a long chain to condition the measurement
    K = max(args.niter, 200)

    def make_chain():
        def make(k):
            @jax.jit
            def chain(f, tabs):
                def body(_, f):
                    out = windowed_ell_apply(*tabs, well.ntgt, f)
                    return f + out.mean() * jnp.asarray(1e-30, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, f))

            return chain

        return make(1), make(K), K

    t_cons, note_c = _fori_pair(make_chain, f, tabs)
    K = max(args.niter, 40)  # semilag steps are ~2 ms

    # semi-Lagrangian advection step on the target reduced grid:
    # packed-props stencil gathers with BILINEAR trajectory-iteration wind
    # (the advected field keeps the full cubic; the ECMWF trade — accuracy
    # is trajectory-iteration-limited either way, measured identical to the
    # all-cubic path against the analytic solid-body solution)
    t0 = time.time()
    sl = SemiLagrangianAdvection(tgt, traj_order=1, impl="auto")
    setup_sl = time.time() - t0
    ll = tgt.lonlat()
    u = jnp.asarray(20.0 * np.cos(np.deg2rad(ll[:, 1])), dtype)
    v = jnp.zeros_like(u)
    q = jnp.asarray(np.cos(3 * np.deg2rad(ll[:, 0])), dtype)
    dt = jnp.asarray(1800.0, dtype)

    # accuracy gate vs the EXACT solid-body solution: u = 20 cos(lat) is a
    # rigid rotation at w = 20/R rad/s, so q(t+dt) = q0(lon - w dt)
    from atlas_tpu.util.constants import EARTH_RADIUS, RAD2DEG
    dlon = 20.0 / EARTH_RADIUS * 1800.0 * RAD2DEG
    exact = np.cos(3 * np.deg2rad(ll[:, 0] - dlon))
    # impl resolved EAGERLY; 'auto' keeps the stencil-gather path — the
    # shift-algebra formulation matches it to 1e-12 but MEASURED 4.4x
    # SLOWER on-chip (16.7 vs 3.8 ms at O64: ~460 masked shifted
    # multiplies are dispatch-bound at this size), so wiring it as the
    # default was refuted; see SemiLagrangianAdvection.select_step
    sl_step = sl.select_step(u, v, dt)
    sl_impl = ("shift-algebra" if sl._fast is not None
               and sl_step == sl._fast.step else
               "stencil-gather, packed props, linear trajectory "
               "(shift-algebra measured 4.4x slower on-chip)")
    sl_cov = sl.coverage(u, v, dt) if "shift-algebra" == sl_impl else 1.0
    got_sl = np.asarray(sl_step(q, u, v, dt))
    sl_err = float(np.abs(got_sl - exact).max())
    assert sl_err < 5e-3, f"semilag vs analytic solid-body: {sl_err}"

    def make_chain_sl():
        def make(k):
            @jax.jit
            def chain(q, u, v):
                def body(_, q):
                    return sl_step(q, u, v, dt)

                return jnp.sum(jax.lax.fori_loop(0, k, body, q))

            return chain

        return make(1), make(K), K

    t_sl, note_sl = _fori_pair(make_chain_sl, q, u, v)
    ntgt, kmax = remap.idx.shape
    # windowed traffic: per-channel window reads + src/tgt streams, plus the
    # channel-independent weight blocks
    traffic = ((cs.size + ntgt + well.window_read_elems()
                + 3 * len(well.tgt_slow) * kmax) * nlev
               + well.weight_elems()) * jnp.dtype(dtype).itemsize
    return _emit(
        f"conservative_{cs.name}_to_{tgt.name}_nlev{nlev}_plus_semilag_targetpoints_per_s",
        ntgt * nlev / t_cons, "targetpoints/s",
        (traffic / t_cons) / 819e9,
        {"metric_kind": "conservative", "src": cs.name, "tgt": tgt.name,
         "ntgt": int(ntgt), "k_max": int(kmax), "nlev": nlev,
         "remap_iter_s": t_cons, "remap_setup_s": setup_cons,
         "remap_impl": "windowed-ell",
         "remap_fast_fraction": well.fast_fraction,
         "remap_W_classes": [c["W"] for c in well.classes],
         "max_rel_err": max_rel_err,
         "semilag_impl": sl_impl,
         "semilag_shift_coverage": sl_cov,
         "semilag_vs_analytic_err": sl_err,
         "semilag_iter_s": t_sl, "semilag_setup_s": setup_sl,
         "semilag_points_per_s": tgt.size / t_sl,
         "timing_note": f"remap {note_c}; semilag {note_sl}",
         "dtype": str(dtype),
         "note": "vs_baseline = windowed-ELL traffic / 819 GB/s v5e HBM "
                 "peak; remap accuracy-gated vs host f64"},
    )


def bench_all(args):
    """Run every BASELINE config; emit one line per config plus a combined
    summary line LAST (the driver records the tail line)."""
    import copy

    results = {}
    plans = [
        ("gradient", {"metric": "gradient"}),
        ("gradient_O640_nlev137",
         {"metric": "gradient", "grid": "O640", "nlev": 137}),
        ("bicubic", {"metric": "bicubic"}),
        ("trans", {"metric": "trans"}),
        ("trans_T1279_O1280",
         {"metric": "trans", "trans_T": 1279, "trans_grid": "O1280",
          "nlev": 32}),
        ("conservative", {"metric": "conservative"}),
        ("swe", {"metric": "swe", "grid": "O640", "niter": 12}),
        ("swe_O1280", {"metric": "swe", "grid": "O1280", "niter": 8}),
    ]
    for name, over in plans:
        a = copy.copy(args)
        for k, v in over.items():
            setattr(a, k, v)
        try:
            fn = {"gradient": bench_gradient, "bicubic": bench_bicubic,
                  "trans": bench_trans, "conservative": bench_conservative,
                  "swe": bench_swe}[over["metric"]]
            results[name] = fn(a)
        except Exception as e:  # record the failure, keep the matrix going
            results[name] = {"metric": name, "error": f"{type(e).__name__}: {e}"}
    ok = [r for r in results.values() if "error" not in r]
    headline = results.get("swe_O1280", {})
    if "error" in headline or not headline:
        headline = results.get("swe", {})
    _emit(
        "baseline_matrix",
        headline.get("value", 0.0),
        headline.get("unit", "gridpoints/s"),
        float(np.mean([r["vs_baseline"] for r in ok])) if ok else 0.0,
        {"metric_kind": "all", "configs": results,
         "note": "value/unit = SWE headline; vs_baseline = mean roofline "
                 "fraction over completed configs"},
    )


def _gradient_ref_f64(sf, fpad64):
    """Host f64 gradient via the same shift tables, plus a pointwise abs-sum
    roundoff bound (the same expression over |f|, |S|) for a condition-aware
    accuracy gate — the f32 error scales with the metric (∝ resolution), so a
    fixed relative tolerance cannot gate O640 and O320 alike."""
    from atlas_tpu.util.constants import DEG2RAD

    s = sf.shifts

    def shift_np(a, dj, dc):
        ny, nxw = a.shape[-2:]
        res = np.zeros_like(a)
        j_lo, j_hi = max(0, -dj), min(ny, ny - dj)
        c_lo, c_hi = max(0, -dc), min(nxw, nxw - dc)
        res[..., j_lo:j_hi, c_lo:c_hi] = a[..., j_lo + dj:j_hi + dj,
                                           c_lo + dc:c_hi + dc]
        return res

    fh = fpad64.copy()
    fh[:, s.halo_rows, s.halo_dst] = fh[:, s.halo_rows, s.halo_src]
    fa = np.abs(fh)
    S_tot = s.S_total_regular + s.S_total_pole
    accx = fh * S_tot[None, :, :, 0]
    accy = fh * S_tot[None, :, :, 1]
    bndx = fa * np.abs(S_tot[None, :, :, 0])
    bndy = fa * np.abs(S_tot[None, :, :, 1])
    for (dj, dc), S in list(s.keys_regular.items()) + list(s.keys_pole.items()):
        fs = shift_np(fh, dj, dc)
        fsa = np.abs(fs)
        accx = accx + fs * S[None, :, :, 0]
        accy = accy + fs * S[None, :, :, 1]
        bndx = bndx + fsa * np.abs(S[None, :, :, 0])
        bndy = bndy + fsa * np.abs(S[None, :, :, 1])
    Mx = (0.5 * DEG2RAD * s.metric_x * s.mask)[None]
    My = (0.5 * DEG2RAD * s.metric_y * s.mask)[None]
    return accx * Mx, accy * My, bndx * Mx, bndy * My


def bench_gradient(args):
    import jax
    import jax.numpy as jnp

    from atlas_tpu import Grid
    from atlas_tpu.fvm import FvmMethod
    from atlas_tpu.fvm.structured import StructuredFvm, _grad_struct
    from atlas_tpu.fvm.pallas_kernels import LI, PallasGradient, gradient_pallas

    dev = jax.devices()[0]
    dtype = jnp.dtype(args.dtype)
    grid = Grid(args.grid)
    nlev = args.nlev

    t_setup = time.time()
    sf = StructuredFvm(grid, use_cache=True)
    pg = PallasGradient(sf, dtype=dtype)
    setup_s = time.time() - t_setup
    ny, nxw = sf.shifts.ny, sf.shifts.nxw
    npts = grid.size

    # accuracy gate: device f32 gradient of a smooth field vs host f64
    ll = grid.lonlat()
    f_smooth = np.cos(3 * np.deg2rad(ll[:, 0])) * np.cos(
        np.deg2rad(ll[:, 1])) ** 2
    fpad64 = sf.to_layout(f_smooth.astype(np.float64))
    gx_ref, gy_ref, bx, by = _gradient_ref_f64(sf, fpad64)
    g_dev = np.asarray(sf.gradient(jnp.asarray(fpad64, dtype)))
    eps = float(np.finfo(np.dtype(args.dtype)).eps)
    m = sf.shifts.mask[None]
    ratio = max(_gate_vs_bound(g_dev[0], gx_ref, bx, m, eps, "gradient x"),
                _gate_vs_bound(g_dev[1], gy_ref, by, m, eps, "gradient y"))
    scale = max(np.abs(gx_ref).max(), np.abs(gy_ref).max())
    max_rel_err = float(max(np.abs(g_dev[0] - gx_ref).max(),
                            np.abs(g_dev[1] - gy_ref).max()) / scale)

    # measure the tunnel round-trip with a trivial dispatch
    tiny = jnp.zeros((8, 128), dtype)
    tiny_fn = jax.jit(lambda x: x + 1)
    tiny_fn(tiny).block_until_ready()
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        tiny_fn(tiny).block_until_ready()
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))

    lo = -(-nlev // LI)
    ft = jax.random.normal(jax.random.key(0), (lo, pg.ny_pad, LI, pg.nxw_pad), dtype)

    if args.impl == "pallas":
        # fori chain of pallas stages inside ONE jitted program (the round-2
        # "pallas under lax control flow hangs the remote compiler" quirk no
        # longer applies — the SWE bench already fori-chains its fused stage
        # kernels); round 3 paid ~ms of per-call dispatch through the tunnel
        # on every iteration by chaining at the Python level.
        K = max(args.niter, 8)

        def make_chain():
            def make(k):
                @jax.jit
                def chain(ft, Sx, Sy, G):
                    def body(_, x):
                        gx, _ = gradient_pallas(pg.runs, pg.keys, Sx, Sy, G,
                                                x)
                        # clip keeps the chain bounded (the polar-row metric
                        # amplifies ~30x/iteration); fused into the loop
                        return jnp.clip(gx * jnp.asarray(6.4e6, dtype),
                                        -1.0, 1.0)

                    return jnp.sum(jax.lax.fori_loop(0, k, body, ft))

                return chain

            return make(1), make(K), K

        t_iter, timing_note = _fori_pair(make_chain, ft, pg.Sx, pg.Sy, pg.G)
    elif args.impl == "xla":
        # block_until_ready does not reliably synchronize through the axon
        # tunnel, so force materialization by FETCHING a scalar reduction and
        # difference a K-iteration fori chain against a 1-iteration one.
        t = sf._device_tables(dtype)
        f3 = jax.random.normal(jax.random.key(0), (nlev, ny, nxw), dtype)
        K = max(args.niter, 20)

        def make_chain(k):
            @jax.jit
            def chain(t, f):
                def body(_, f):
                    g = _grad_struct(t, f)
                    return g[0] * jnp.asarray(1e-3, dtype) + f * jnp.asarray(0.5, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, f))

            return chain

        chain1, chainK = make_chain(1), make_chain(K)
        float(chain1(t, f3))
        float(chainK(t, f3))  # compile both
        t0 = time.perf_counter()
        s1 = float(chain1(t, f3))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        sK = float(chainK(t, f3))
        t_K = time.perf_counter() - t0
        assert np.isfinite(sK)
        t_iter = max((t_K - t_one) / (K - 1), 1e-9)
        timing_note = (
            f"fori chain diff: {K} iters {t_K*1e3:.2f} ms vs 1 iter {t_one*1e3:.2f} ms"
        )
    else:  # gather
        method = FvmMethod(grid, use_cache=True)
        from atlas_tpu.fvm.nabla import _JaxGeom, _gradient_impl

        geom = _JaxGeom(method.geometry, dtype)
        fg = jax.random.normal(jax.random.key(0), (method.geometry.nnodes, nlev), dtype)
        K = max(args.niter, 20)

        def make_chain(k):
            @jax.jit
            def chain(geom, f):
                def body(_, f):
                    g = _gradient_impl(geom, f)
                    return g[..., 0] * jnp.asarray(1e-3, dtype)

                return jnp.sum(jax.lax.fori_loop(0, k, body, f))

            return chain

        chain1, chainK = make_chain(1), make_chain(K)
        float(chain1(geom, fg))
        float(chainK(geom, fg))
        t0 = time.perf_counter()
        float(chain1(geom, fg))
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        sK = float(chainK(geom, fg))
        t_K = time.perf_counter() - t0
        assert np.isfinite(sK)
        t_iter = max((t_K - t_one) / (K - 1), 1e-9)
        timing_note = (
            f"fori chain diff: {K} iters {t_K*1e3:.2f} ms vs 1 iter {t_one*1e3:.2f} ms"
        )

    # minimum HBM traffic for the structured kernel: S tables once + field in
    # + two component outputs
    nk = len(pg.keys)
    s_bytes = 2 * nk * pg.ny_pad * pg.nxw_pad * dtype.itemsize
    f_bytes = lo * pg.ny_pad * LI * pg.nxw_pad * dtype.itemsize
    traffic = s_bytes + 3 * f_bytes
    peak_bw = 819e9  # v5e HBM
    gridpoints_per_s = npts * nlev / t_iter

    return _emit(
        f"fvm_gradient_{args.grid}_nlev{nlev}_gridpoints_per_s",
        gridpoints_per_s,
        "gridpoints/s",
        (traffic / t_iter) / peak_bw,
        {
            "impl": args.impl,
            "metric_kind": "gradient",
            "grid": args.grid,
            "max_rel_err": max_rel_err,
            "err_bound_ratio": ratio,
            "npts": int(npts),
            "nlev": nlev,
            "iter_time_s": t_iter,
            "rtt_s": rtt,
            "timing_note": timing_note,
            "setup_s": setup_s,
            "min_traffic_MB": traffic / 1e6,
            "achieved_GBps": traffic / t_iter / 1e9,
            "device": str(dev),
            "dtype": str(dtype),
            "note": "vs_baseline = min-traffic/iter_time over 819 GB/s v5e HBM peak; reference publishes no numbers (BASELINE.md)",
        },
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="O320")
    ap.add_argument("--nlev", type=int, default=64)
    ap.add_argument("--niter", type=int, default=20)
    ap.add_argument("--impl", default="pallas", choices=["pallas", "xla", "gather"])
    ap.add_argument("--metric", default="all",
                    choices=["all", "gradient", "bicubic", "trans", "swe",
                             "conservative"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--precision", default="high",
                    choices=["default", "high", "highest"])
    ap.add_argument("--trans-T", dest="trans_T", type=int, default=639)
    ap.add_argument("--trans-grid", dest="trans_grid", default="F640")
    args = ap.parse_args()
    if args.quick:
        args.grid, args.nlev, args.niter = "O32", 8, 5

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/atlas_tpu/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    {"all": bench_all, "gradient": bench_gradient, "bicubic": bench_bicubic,
     "trans": bench_trans, "swe": bench_swe,
     "conservative": bench_conservative}[args.metric](args)


if __name__ == "__main__":
    main()

"""Pallas pass-1 kernel for the separable structured interpolation.

The XLA windowed pass 1 costs ~12.4 ms of the 18.7 ms O320 -> 0.25 deg
bicubic iteration: ~5 ms building the periodic padded row layout with an
(ny*nxw)-row gather and ~7 ms in vmapped window slices + HIGHEST dots.
This kernel streams each SOURCE ROW through VMEM once:

  per source row j (R rows per grid program):
    1. DMA the row's contiguous slice of the (nch, npts) transposed field
       (128-aligned start; the misalignment d folds into the placement
       roll);
    2. build the periodic padded row IN VMEM by PERIOD DOUBLING: place the
       base copy at [p0, p0+nx) with p0 = Lh mod nx, then D static steps of
       row += masked(roll(row, 2^k nx)) double the covered span, plus one
       west step — ceil(log2(NN/nx)) + 2 masked rolls cover ANY nx (the
       round-4 version wrapped once and excluded all rows with
       2 nx < nxw - Lh: half the pass-1 cost stayed on the gather path);
    3. per 128-target block: win = fpad[:, st_b : st_b + W2] contracted
       against the banded weight block with TWO single-pass bf16 dots
       (weights pre-split hi/lo and stacked on the M axis; values split
       in-kernel) instead of one 6-pass HIGHEST dot — exact to ~2^-18.

Pass 2 (the k-row y-combine) runs as a banded GEMM in XLA. Reference:
interpolation/method/structured/StructuredInterpolation2D.tcc:239-378 —
the same two-pass factorization, re-scheduled for VMEM/MXU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # targets per window block


def build_pass1_kernel(nch, NN, W2, NB, Lh, NXS, R, D, nxt_pad):
    def kernel(meta_ref, fT_any, Wt_ref, out_ref, buf, fpad, sem):
        p = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nch, NN), 1)

        # issue all R row DMAs up front (they pipeline behind compute)
        for rl in range(R):
            r = p * R + rl
            pltpu.make_async_copy(
                fT_any.at[:, pl.ds(meta_ref[r, 1] * 128, NXS)],
                buf.at[rl], sem.at[rl]).start()

        for rl in range(R):
            r = p * R + rl
            nx = meta_ref[r, 0]
            d = meta_ref[r, 2]  # off - off_al in [0, 128)
            nxt_n = meta_ref[r, 3]  # active targets for this row

            pltpu.make_async_copy(
                fT_any.at[:, pl.ds(meta_ref[r, 1] * 128, NXS)],
                buf.at[rl], sem.at[rl]).wait()

            # periodic padded row by period doubling: base copy at
            # [p0, p0 + nx), p0 = Lh mod nx, then doubling + one west step
            p0 = jax.lax.rem(jnp.int32(Lh), nx)
            P0 = jnp.pad(buf[rl], ((0, 0), (0, NN - NXS)))
            row = pltpu.roll(P0, (NN + p0 - d) % NN, axis=1)
            row = jnp.where((lane >= p0) & (lane < p0 + nx), row, 0.0)
            span = nx
            for _ in range(D):
                shifted = pltpu.roll(row, span % NN, axis=1)
                row = row + jnp.where(lane >= p0 + span, shifted, 0.0)
                span = span * 2
            row = row + jnp.where(lane < p0,
                                  pltpu.roll(row, (NN - nx) % NN, axis=1),
                                  0.0)
            fpad[:, :] = row

            for b in range(NB):

                @pl.when(b * B < nxt_n)
                def _(b=b, r=r, rl=rl):
                    st = meta_ref[r, 4 + b] * 128
                    win = fpad[:, pl.ds(st, W2)]  # (nch, W2)
                    # two single-pass bf16 dots, each with [Whi; Wlo]
                    # stacked on M: all four hi/lo cross products land (the
                    # Wlo*vlo term matters at the 1e-5 gate) at 2 MXU
                    # passes instead of HIGHEST's 6
                    vhi = win.astype(jnp.bfloat16)
                    vlo = (win - vhi.astype(win.dtype)).astype(jnp.bfloat16)
                    Whl = Wt_ref[rl, b]  # (2B, W2) bf16 [hi; lo]
                    d1 = jax.lax.dot_general(
                        Whl, vhi, (((1,), (1,)), ((), ())),
                        preferred_element_type=win.dtype)
                    d2 = jax.lax.dot_general(
                        Whl, vlo, (((1,), (1,)), ((), ())),
                        preferred_element_type=win.dtype)
                    out_ref[rl, b * B:(b + 1) * B, :] = \
                        d1[:B] + (d1[B:] + (d2[:B] + d2[B:]))

    return kernel


@partial(jax.jit, static_argnames=("nch", "NN", "W2", "NB", "Lh", "NXS",
                                   "nxt_pad", "R", "D", "interpret"))
def pass1_rows(meta, fT, Wt2, nch, NN, W2, NB, Lh, NXS, nxt_pad, R, D,
               interpret=False):
    """meta: (nrows, 4 + NB) int32 [nx, off/128, d, nxt, st_b/128...];
    fT: (nch, npts_pad); Wt2: (nrows, NB, 2B, W2) bf16 [hi; lo] stacked.
    nrows must be a multiple of R. Returns (nrows, nxt_pad, nch)."""
    nrows = meta.shape[0]
    assert nrows % R == 0
    kernel = build_pass1_kernel(nch, NN, W2, NB, Lh, NXS, R, D, nxt_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrows // R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((R, NB, 2 * B, W2), lambda r, meta: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, nxt_pad, nch),
                               lambda r, meta: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((R, nch, NXS), fT.dtype),
            pltpu.VMEM((nch, NN), fT.dtype),
            pltpu.SemaphoreType.DMA((R,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, nxt_pad, nch), fT.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(110 * 2**20)),
        interpret=interpret,
    )(meta, fT, Wt2)


class Pass1Kernel:
    """Setup of the Pallas pass-1 over a _Separable product.

    nch is static (one instance per channel count)."""

    ROWS_PER_PROGRAM = 8

    def __init__(self, interp, nch):
        s = interp._sep
        grid = interp.src_grid
        self.nch = int(nch)
        self.s = s
        assert s.Wt is not None, "windowed tables required"
        ny, nxt, k = s.idx1.shape
        nx = grid.nx.astype(np.int64)
        offs = grid.row_offset
        self.Lh = Lh = self._infer_L(s, grid)
        W = s.Wt.shape[3]
        self.W2 = W2 = W + 128
        self.NB = NB = s.Wt.shape[1]
        self.nxt = nxt
        self.nxt_pad = NB * B  # block writes are B-wide
        NXS = (-(-int(grid.nxmax) // 128) * 128) + 128
        self.NXS = NXS
        self.NN = NN = max(-(-s.nxw // 128) * 128, NXS)

        # per-block 128-aligned window starts, clamped into the padded row
        st_al = np.minimum((s.win_start // 128) * 128, NN - W2)
        st_al = np.maximum(st_al, 0)
        # a row runs in the kernel iff every tap offset lands inside its
        # aligned W2 window (period doubling covers any nx)
        ok = np.ones(ny, bool)
        for b in range(NB):
            t0, t1 = b * B, min((b + 1) * B, nxt)
            o = s.idx1[:, t0:t1] - st_al[:, b][:, None, None]
            ok &= (o.min(axis=(1, 2)) >= 0) & (o.max(axis=(1, 2)) < W2)
        self.kernel_rows = np.flatnonzero(ok)
        self.small_rows = np.flatnonzero(~ok)

        kr = self.kernel_rows
        nrows = len(kr)
        R = self.ROWS_PER_PROGRAM

        def need_D(n):
            return int(np.ceil(np.log2(max(NN / max(int(n), 1), 1.0))))

        # ONE band at the maximum doubling depth: splitting rows into
        # per-depth bands was measured SLOWER (extra pallas-call overhead
        # 12.0 -> 12.7 ms at O320 -> 0.25 deg; the dynamic rolls the split
        # saves are cheaper than a dispatch) — kept as a band list for the
        # non-contiguous kernel_rows case
        D_max = max((need_D(nx[j]) for j in kr), default=0)

        def row_D(n):
            return D_max

        self.bands = []
        i0 = 0
        while i0 < nrows:
            D0 = row_D(nx[kr[i0]])
            i1 = i0 + 1
            while (i1 < nrows and row_D(nx[kr[i1]]) == D0
                   and kr[i1] == kr[i1 - 1] + 1):
                i1 += 1
            self.bands.append((i0, i1, D0))
            i0 = i1

        import ml_dtypes

        self._band_tabs = []
        for (i0, i1, D0) in self.bands:
            rows_b = kr[i0:i1]
            nb_rows = len(rows_b)
            npad_b = -(-nb_rows // R) * R
            meta = np.zeros((npad_b, 4 + NB), np.int64)
            meta[:, 0] = 1
            Wt2 = np.zeros((npad_b, NB, B, W2), np.float32)
            for i, j in enumerate(rows_b):
                meta[i, 0] = nx[j]
                meta[i, 1] = offs[j] // 128
                meta[i, 2] = offs[j] - (offs[j] // 128) * 128
                meta[i, 3] = nxt
                meta[i, 4:] = st_al[j] // 128
                for b in range(NB):
                    t0, t1 = b * B, min((b + 1) * B, nxt)
                    o = s.idx1[j, t0:t1] - int(st_al[j, b])  # (B', k)
                    ii = np.broadcast_to(np.arange(t1 - t0)[:, None],
                                         o.shape)
                    np.add.at(Wt2[i, b], (ii, o), s.wx[j, t0:t1])
            for i in range(nb_rows, npad_b):
                meta[i] = meta[max(nb_rows - 1, 0)]
                meta[i, 3] = 0  # no active targets: dots skipped
            Whi = Wt2.astype(ml_dtypes.bfloat16)
            Wlo = (Wt2 - Whi.astype(np.float32)).astype(ml_dtypes.bfloat16)
            self._band_tabs.append(
                (meta.astype(np.int32), np.concatenate([Whi, Wlo], axis=2),
                 nb_rows, D0))
        self._dev = None

    @staticmethod
    def _infer_L(s, grid):
        # pad_gather column c maps source index off_j + ((c - L) mod nx_j)
        pg = np.asarray(s.pad_gather)
        row0 = pg[0] - grid.row_offset[0]
        # column where the un-wrapped index 0 appears first
        return int(np.flatnonzero(row0 == 0)[0])

    def tables(self, dtype=None):
        if self._dev is None:
            self._dev = tuple(
                (jnp.asarray(m), jnp.asarray(w))
                for (m, w, _, _) in self._band_tabs)
        return self._dev

    def apply(self, field, t, tabs=None, interpret=False, padded=False):
        """field (npts, nch) + interp._sep_tables -> (ny, nxt, nch) tmp
        (or (ny, nxt_pad, nch) with padded=True when every row runs in the
        kernel — the Pallas pass 2 consumes the padded block directly).

        tabs: pass self.tables() explicitly when calling under an outer
        jit (closure-captured device tables get embedded as HLO
        constants)."""
        s = self.s
        full = len(self.kernel_rows) == s.ny
        tmp_k = None
        if len(self.kernel_rows):
            band_dev = self.tables() if tabs is None else tabs
            npts = field.shape[0]
            npad = -(-npts // 128) * 128 + self.NXS
            fT = jnp.pad(field.T, ((0, 0), (0, npad - npts)))
            pieces = []
            for (meta, Wt2), (_, _, nb_rows, D0) in zip(band_dev,
                                                        self._band_tabs):
                out_b = pass1_rows(
                    meta, fT, Wt2, self.nch, self.NN, self.W2,
                    self.NB, self.Lh, self.NXS, self.nxt_pad,
                    self.ROWS_PER_PROGRAM, D0,
                    interpret=interpret)[:nb_rows]
                pieces.append(out_b)
            tmp_k = (pieces[0] if len(pieces) == 1
                     else jnp.concatenate(pieces, axis=0))
            if full and padded:
                return tmp_k
            tmp_k = tmp_k[:, : self.nxt]
        if full:
            return tmp_k  # every row in kernel order: no scatter pass
        tmp = jnp.zeros((s.ny, self.nxt, self.nch), field.dtype)
        if tmp_k is not None:
            tmp = tmp.at[jnp.asarray(self.kernel_rows)].set(tmp_k)
        if len(self.small_rows):
            sr = jnp.asarray(self.small_rows)
            fpad = field[t["pad_gather"][sr]]  # (nsmall, nxw, nch)
            idx1 = t["idx1"][sr]  # (nsmall, nxt, k)
            k = idx1.shape[-1]
            vals = jnp.take_along_axis(
                fpad, idx1.reshape(len(self.small_rows), -1)[:, :, None],
                axis=1).reshape(len(self.small_rows), self.nxt, k, self.nch)
            tmp_s = (vals * t["wx"][sr][..., None]).sum(axis=2)
            tmp = tmp.at[sr].set(tmp_s)
        if padded:
            tmp = jnp.pad(tmp, ((0, 0), (0, self.nxt_pad - self.nxt),
                                (0, 0)))
        return tmp


# --------------------------------------------------------------- pass 2
def build_pass2_kernel(nyp, ny, XC, nch):
    def kernel(A_ref, tmp_ref, out_ref):
        tmp = tmp_ref[...]  # (ny, XC * nch): pre-merged minor in XLA
        vhi = tmp.astype(jnp.bfloat16)
        vlo = (tmp - vhi.astype(tmp.dtype)).astype(jnp.bfloat16)
        Ahl = A_ref[...]  # (2 nyp, ny) bf16 [hi; lo]
        d1 = jax.lax.dot_general(Ahl, vhi, (((1,), (0,)), ((), ())),
                                 preferred_element_type=tmp.dtype)
        d2 = jax.lax.dot_general(Ahl, vlo, (((1,), (0,)), ((), ())),
                                 preferred_element_type=tmp.dtype)
        out_ref[...] = d1[:nyp] + (d1[nyp:] + (d2[:nyp] + d2[nyp:]))

    return kernel


@partial(jax.jit, static_argnames=("nyp", "XC", "interpret"))
def pass2_rows(Ahl, tmp, nyp, XC, interpret=False):
    """Banded-GEMM pass 2 on the MXU with stacked-bf16 weights: Ahl
    (2 nyp, ny) bf16 [hi; lo]; tmp (ny, nxt_pad, nch) -> (nyp, nxt_pad,
    nch). Two single-pass bf16 dots realize all four hi/lo products
    (~1e-6) — the XLA HIGHEST GEMM costs 6 passes (3.9 vs ~2 ms at
    O320 -> 0.25 deg/64ch)."""
    ny, nxt_pad, nch = tmp.shape
    assert nxt_pad % XC == 0
    kernel = build_pass2_kernel(nyp, ny, XC, nch)
    tmp2 = tmp.reshape(ny, nxt_pad * nch)  # minor merge in XLA (free)
    out = pl.pallas_call(
        kernel,
        grid=(nxt_pad // XC,),
        in_specs=[
            pl.BlockSpec((2 * nyp, ny), lambda c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ny, XC * nch), lambda c: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nyp, XC * nch), lambda c: (0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nyp, nxt_pad * nch), tmp.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(110 * 2**20)),
        interpret=interpret,
    )(Ahl, tmp2)
    return out.reshape(nyp, nxt_pad, nch)

"""Pallas pass-1 kernel for the separable structured interpolation.

The XLA windowed pass 1 costs ~11 ms of the 18 ms O320 -> 0.25 deg bicubic
iteration: ~5 ms building the periodic padded row layout with an
(ny*nxw)-row gather and ~6 ms in vmapped window slices feeding the MXU.
This kernel streams each SOURCE ROW through VMEM once:

  per source row j (one grid program):
    1. DMA the row's contiguous slice of the (nch, npts) transposed field
       (128-aligned start; the misalignment d is folded into a lane roll);
    2. build the periodic padded row IN VMEM: two masked lane rolls add the
       left halo and the single east wrap (kernel rows have nx >= the
       wrap span, so one period suffices — short polar rows stay on the
       XLA path and are merged afterwards, <10% of the points);
    3. per 128-target block: window = fpad[:, st_b : st_b + W2] (aligned
       dynamic slice) contracted against the banded weight block on the
       MXU; results land directly in the (1, nxt_pad, nch) output block.

Pass 2 (the k-row y-combine) stays in XLA. Reference behavior:
interpolation/method/structured/StructuredInterpolation2D.tcc:239-378 —
the same two-pass factorization, re-scheduled for VMEM/MXU.

STATUS (measured, v5e): NOT the production path. At O320 -> 0.25 deg with
64 channels the kernel covers only the single-wrap rows (324 of 640; pass-1
work scales with ny * nxt, so the excluded rows keep half the cost on the
gather path) and per-program overhead across 324 sequential row programs
adds ~20 ms — 38.5 ms total vs the XLA windowed path's 18 ms. It becomes
interesting only with multi-wrap row periodization plus several rows per
program; until then `interpolation/structured.py` keeps the XLA path and
this module documents the measured trade (kept correct by an
interpret-mode test).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128  # targets per window block


def build_pass1_kernel(nch, NN, W2, NB, Lh, NXS):
    def kernel(meta_ref, fT_any, Wt_ref, out_ref, buf, fpad, sem):
        r = pl.program_id(0)
        nx = meta_ref[r, 0]
        off_al = meta_ref[r, 1] * 128
        d = meta_ref[r, 2]  # off - off_al in [0, 128)
        nxt_n = meta_ref[r, 3]  # active targets for this row (= nxt)

        copy = pltpu.make_async_copy(
            fT_any.at[:, pl.ds(off_al, NXS)], buf, sem)
        copy.start()
        copy.wait()

        # periodic padded row: place at column Lh, add left halo and the
        # single east wrap with masked circular rolls (wrapped-in lanes are
        # killed by the region masks)
        lane = jax.lax.broadcasted_iota(jnp.int32, (nch, NN), 1)
        P0 = jnp.pad(buf[:, :], ((0, 0), (0, NN - NXS)))
        r0 = pltpu.roll(P0, (NN + Lh - d) % NN, axis=1)
        r0 = jnp.where((lane >= Lh) & (lane < Lh + nx), r0, 0.0)
        east = pltpu.roll(r0, nx % NN, axis=1)
        west = pltpu.roll(r0, (NN - nx) % NN, axis=1)
        row = (r0 + jnp.where(lane < Lh, west, 0.0)
               + jnp.where(lane >= Lh + nx, east, 0.0))
        fpad[:, :] = row

        for b in range(NB):

            @pl.when(b * B < nxt_n)
            def _(b=b):
                st = meta_ref[r, 4 + b] * 128
                win = fpad[:, pl.ds(st, W2)]  # (nch, W2)
                out_ref[0, b * B:(b + 1) * B, :] = jax.lax.dot_general(
                    Wt_ref[0, b], win, (((1,), (1,)), ((), ())),
                    preferred_element_type=win.dtype,
                    precision=jax.lax.Precision.HIGHEST)

    return kernel


@partial(jax.jit, static_argnames=("nch", "NN", "W2", "NB", "Lh", "NXS",
                                   "nxt_pad", "interpret"))
def pass1_rows(meta, fT, Wt2, nch, NN, W2, NB, Lh, NXS, nxt_pad,
               interpret=False):
    """meta: (nrows, 4 + NB) int32 [nx, off/128, d, nxt, st_b/128...];
    fT: (nch, npts_pad); Wt2: (nrows, NB, B, W2).
    Returns (nrows, nxt_pad, nch) row-resampled values."""
    nrows = meta.shape[0]
    kernel = build_pass1_kernel(nch, NN, W2, NB, Lh, NXS)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, NB, B, W2), lambda r, meta: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nxt_pad, nch), lambda r, meta: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((nch, NXS), fT.dtype),
            pltpu.VMEM((nch, NN), fT.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, nxt_pad, nch), fT.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(100 * 2**20)),
        interpret=interpret,
    )(meta, fT, Wt2)


class Pass1Kernel:
    """Setup of the Pallas pass-1 over a _Separable product.

    nch is static (one instance per channel count)."""

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
        # a row runs in the kernel iff ONE east wrap copy reaches the end
        # of the padded width (coverage [Lh, Lh + 2 nx) >= nxw) AND every
        # tap offset lands inside its aligned W2 window
        ok = 2 * nx >= (s.nxw - Lh)
        for b in range(NB):
            t0, t1 = b * B, min((b + 1) * B, nxt)
            o = s.idx1[:, t0:t1] - st_al[:, b][:, None, None]
            ok &= (o.min(axis=(1, 2)) >= 0) & (o.max(axis=(1, 2)) < W2)
        self.kernel_rows = np.flatnonzero(ok)
        self.small_rows = np.flatnonzero(~ok)

        kr = self.kernel_rows
        nrows = len(kr)
        meta = np.zeros((nrows, 4 + NB), np.int64)
        meta[:, 0] = nx[kr]
        meta[:, 1] = offs[kr] // 128
        meta[:, 2] = offs[kr] - (offs[kr] // 128) * 128
        meta[:, 3] = nxt
        meta[:, 4:] = st_al[kr] // 128
        # banded weights rebuilt against the aligned starts (W2 covers the
        # alignment shift)
        Wt2 = np.zeros((nrows, NB, B, W2))
        for i, j in enumerate(kr):
            for b in range(NB):
                t0, t1 = b * B, min((b + 1) * B, nxt)
                o = s.idx1[j, t0:t1] - int(st_al[j, b])  # (B', k)
                ii = np.broadcast_to(np.arange(t1 - t0)[:, None], o.shape)
                np.add.at(Wt2[i, b], (ii, o), s.wx[j, t0:t1])
        self.meta = jnp.asarray(meta.astype(np.int32))
        self._Wt2 = Wt2
        self._dev = {}

    @staticmethod
    def _infer_L(s, grid):
        # pad_gather column c maps source index off_j + ((c - L) mod nx_j)
        pg = np.asarray(s.pad_gather)
        row0 = pg[0] - grid.row_offset[0]
        # column where the un-wrapped index 0 appears first
        return int(np.flatnonzero(row0 == 0)[0])

    def tables(self, dtype):
        key = jnp.dtype(dtype).name
        if key not in self._dev:
            self._dev[key] = (self.meta, jnp.asarray(self._Wt2, dtype))
        return self._dev[key]

    def apply(self, field, t, tabs=None, interpret=False):
        """field (npts, nch) + interp._sep_tables -> (ny, nxt, nch) tmp.

        tabs: pass self.tables(dtype) explicitly when calling under an outer
        jit (closure-captured device tables get embedded as HLO constants —
        the banded weights are ~750 MB at O320 -> 0.25 deg)."""
        s = self.s
        tmp = jnp.zeros((s.ny, self.nxt, self.nch), field.dtype)
        if len(self.kernel_rows):
            meta, Wt2 = self.tables(field.dtype) if tabs is None else tabs
            npts = field.shape[0]
            npad = -(-npts // 128) * 128 + self.NXS
            fT = jnp.pad(field.T, ((0, 0), (0, npad - npts)))
            tmp_k = pass1_rows(meta, fT, Wt2, self.nch, self.NN, self.W2,
                               self.NB, self.Lh, self.NXS, self.nxt_pad,
                               interpret=interpret)[:, : self.nxt]
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
        return tmp

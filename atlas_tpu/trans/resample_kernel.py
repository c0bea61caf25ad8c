"""Fused Pallas kernel: KB resample + compaction for the reduced-grid
Fourier stage.

The XLA formulation of the resample tail (12 shifted slice-multiplies over
the (ny, L, nf) synthesis lines, then one ~6.6M-row gather into grid order)
costs ~370 ms at O1280 on v5e — the gather is ~50 ns/row and each shifted
slice materializes a full copy. This kernel streams each latitude circle
through VMEM once and does everything in-register:

  per row r (sequential grid):
    1. acc = sum_k roll(line_r, tap_k) * plane_k         (VPU lane rolls)
    2. per BS-point output block b:
         win = acc[:, Y0_b : Y0_b + WSEL]                (VMEM view)
         sel[w, i] = [offs[i] - Y0_b == w]               (iota compare)
         out_blk = win @ sel                             (MXU, HIGHEST: f32
                                                          exact; sel is 0/1)
    3. DMA the compacted (nf, nx_r) row to out[:, row_offset_r - base : ...]
       (sequential grid => the next row's DMA overwrites this row's padding
        overrun; the output carries a padding tail).

Rows are processed in contiguous BANDS of similar oversampling s = L/nx so
the selection window WSEL ~ BS * s stays tight (the equator rows need 256
lanes, not the polar rows' 2048); each band is one pallas_call writing its
own slab, concatenated at the end. Rows too small for any band (< 1% of
points, tiny polar circles) go through the caller-side gather.

Reference context: the c2r FFT output scatter of TransLocal.cc:1104+; a CPU
indexes here, a TPU selects on the MXU.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BS = 128  # output points per selection block


def build_resample_compact(shifts, L, nf, WSEL, NB, NXP):
    def kernel(meta_ref, line_ref, planes_ref, offs_ref, out_any, acc_ref,
               outrow, stream, pending, sem):
        r = pl.program_id(0)
        nrows = pl.num_programs(0)
        nx = meta_ref[r, 0]
        off = meta_ref[r, 1]  # exact (base-relative) output offset
        off_al = meta_ref[r, NB + 2] * 128  # 128-aligned down
        slot = jax.lax.rem(r, jnp.int32(2))

        line = line_ref[0]  # (nf, L)
        lo = -shifts[0]
        acc = line * planes_ref[0, lo][None, :]
        for k, dc in enumerate(shifts):
            if dc == 0:
                continue
            # circular roll: latitude rows are circles (matches the XLA
            # path's circular pad)
            acc = acc + pltpu.roll(line, -dc % L, axis=1) \
                * planes_ref[0, k][None, :]
        # windows are dynamic-start slices: only REFs support those in
        # Mosaic, so stage acc through VMEM scratch
        acc_ref[:, :] = acc

        iota_w = jax.lax.broadcasted_iota(jnp.int32, (WSEL, BS), 0)
        for b in range(NB):

            @pl.when(b * BS < nx)
            def _(b=b):
                # meta stores start/128; the multiply makes the 128-lane
                # alignment provable to Mosaic
                y0 = meta_ref[r, 2 + b] * 128
                win = acc_ref[:, pl.ds(y0, WSEL)]  # (nf, WSEL)
                rel = offs_ref[0, b] - y0  # (BS,)
                sel = (iota_w == rel[None, :]).astype(line.dtype)
                # Mosaic supports only DEFAULT/HIGHEST dot precisions;
                # HIGHEST keeps the f32 win exact (sel is 0/1)
                outrow[:, b * BS:(b + 1) * BS] = jnp.dot(
                    win, sel, preferred_element_type=line.dtype,
                    precision=jax.lax.Precision.HIGHEST)

        # ---- aligned streaming DMA with carry tile ----------------------
        # HBM destinations must be 128-lane aligned: rotate this row's
        # values so the written block starts at off_al = floor(off/128)*128,
        # carrying the previous row's last 128 outputs in `pending` to fill
        # the head lanes (the first row of every segment has off == 0, so
        # the uninitialized carry is never read).
        d = off - off_al  # 0..127
        NS = NXP + 128

        stream[slot, :, :128] = pending[:, :]
        stream[slot, :, 128:] = outrow[:, :]
        # want written[l] = streamvals[(128 - d) + l]
        rolled = pltpu.roll(stream[slot], (NS + d - 128) % NS, axis=1)
        stream[slot, :, :] = rolled
        # carry for the next row: outputs at lanes [off + nx - 128, off + nx)
        pend = pltpu.roll(outrow[:, :], (NXP + 128 - nx) % NXP, axis=1)
        pending[:, :] = pend[:, :128]

        # Row r's write region [off_al, off_al + NS) overlaps row r-1's tail
        # (the lanes past off+nx hold duplicated-last-point data that the next
        # row overwrites with its true head), and Mosaic async copies carry no
        # cross-DMA write-ordering guarantee — so wait the PREVIOUS row's DMA
        # before starting this one. The previous row's copy still overlaps all
        # of this row's compute (resample + NB selection dots); only the
        # start is ordered. Buffer reuse stays safe: stream[slot] (row r-2's
        # buffer) was drained before row r-1's copy started.
        @pl.when(r >= 1)
        def _():
            pltpu.make_async_copy(
                stream.at[1 - slot],
                out_any.at[:, pl.ds(meta_ref[r - 1, NB + 2] * 128, NS)],
                sem.at[1 - slot]).wait()

        copy = pltpu.make_async_copy(
            stream.at[slot], out_any.at[:, pl.ds(off_al, NS)], sem.at[slot])
        copy.start()

        @pl.when(r == nrows - 1)
        def _():
            copy.wait()

    return kernel


@partial(jax.jit, static_argnames=("shifts", "nf", "L", "WSEL", "NB", "NXP",
                                   "size_pad", "interpret"))
def resample_compact(meta, line, planes, offs, shifts, nf, L, WSEL, NB, NXP,
                     size_pad, interpret=False):
    """line: (nrows, nf, L); planes: (nrows, W, L); offs: (nrows, NB, BS);
    meta: (nrows, 3 + NB) int32 rows [nx, out_offset, win_start_b/128...,
    out_offset // 128]. Returns (nf, size_pad) flat field-major values
    (padding tail garbage)."""
    nrows = line.shape[0]
    W = planes.shape[1]
    kernel = build_resample_compact(shifts, L, nf, WSEL, NB, NXP)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrows,),
        in_specs=[
            pl.BlockSpec((1, nf, L), lambda r, meta: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, L), lambda r, meta: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NB, BS), lambda r, meta: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((nf, L), line.dtype),
            pltpu.VMEM((nf, NXP), line.dtype),
            pltpu.VMEM((2, nf, NXP + 128), line.dtype),
            pltpu.VMEM((nf, 128), line.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nf, size_pad), line.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=int(100 * 2**20)),
        interpret=interpret,
    )(meta, line, planes, offs)


class ResampleCompact:
    """Banded setup of resample_compact over a FourierSynthesis grid."""

    # (max oversampling s, selection window) band ladder; a row joins the
    # tightest band whose window covers BS * s + the 128-lane start
    # alignment (Mosaic dynamic lane offsets must be 128-aligned)
    LADDER = ((1.7, 384), (3.6, 640), (8.5, 1280), (15.5, 2176))

    def __init__(self, fs, grid, nf):
        assert fs.kind == "resample"
        self.fs = fs
        self.nf = int(nf)
        L = fs.L
        ny = grid.ny
        nx = grid.nx.astype(np.int64)
        self.L, self.ny = L, ny
        self.grid_size = int(grid.size)

        s = L / np.maximum(nx, 1)
        band_of = np.full(ny, -1, np.int64)
        for bi, (smax, wsel) in enumerate(self.LADDER):
            if wsel > L:
                continue
            # nx >= 128: the carry tile holds the previous 128 outputs
            sel = (band_of < 0) & (s <= smax) & (nx >= 128)
            band_of[sel] = bi
        # contiguous segments of rows sharing a band
        segs = []
        r0 = 0
        for r in range(1, ny + 1):
            if r == ny or band_of[r] != band_of[r0]:
                segs.append((r0, r, int(band_of[r0])))
                r0 = r

        gofs = grid.row_offset
        # per-point slot offsets (the same embedding the planes use)
        def row_y(r):
            n = int(nx[r])
            return np.round(np.arange(n) * (L / n)).astype(np.int64)

        self.segments = []
        slow_rows = []
        for (r0, r1, bi) in segs:
            if bi < 0:
                slow_rows.extend(range(r0, r1))
                continue
            WSEL = self.LADDER[bi][1]
            nxm = int(nx[r0:r1].max())
            NXP = -(-nxm // BS) * BS
            NB = NXP // BS
            nrows = r1 - r0
            meta = np.zeros((nrows, 3 + NB), np.int64)
            offs = np.zeros((nrows, NXP), np.int64)
            base = int(gofs[r0])
            ok = True
            for i, r in enumerate(range(r0, r1)):
                n = int(nx[r])
                y = row_y(r)
                offs[i, :n] = y
                offs[i, n:] = y[-1] if n else 0
                meta[i, 0] = n
                meta[i, 1] = gofs[r] - base
                meta[i, 2 + NB] = (gofs[r] - base) // 128
                for b in range(NB):
                    i0 = min(b * BS, max(n - 1, 0))
                    # 128-lane-aligned window start (Mosaic constraint);
                    # stored /128 so the kernel's multiply proves alignment
                    st = min((int(offs[i, i0]) // 128) * 128,
                             max(L - WSEL, 0))
                    meta[i, 2 + b] = st // 128
                    i1 = min((b + 1) * BS, n) - 1
                    if b * BS < n and offs[i, i1] - st >= WSEL:
                        ok = False
            if not ok:  # defensive: shouldn't happen with the ladder margins
                slow_rows.extend(range(r0, r1))
                continue
            span = int(gofs[r1] - base)
            self.segments.append({
                "r0": r0, "r1": r1, "WSEL": WSEL, "NB": NB, "NXP": NXP,
                "base": base, "span": span, "size_pad": span + NXP + 256,
                "meta": jnp.asarray(meta.astype(np.int32)),
                "offs": jnp.asarray(
                    offs.reshape(nrows, NB, BS).astype(np.int32)),
            })

        # slow rows: caller-side gather (tiny polar circles)
        self.slow_rows = np.asarray(slow_rows, np.int64)
        src, dst = [], []
        for i, r in enumerate(self.slow_rows):
            n = int(nx[r])
            src.append(i * L + row_y(r))
            dst.append(np.arange(gofs[r], gofs[r] + n))
        self.slow_src = jnp.asarray(
            np.concatenate(src).astype(np.int32) if src else
            np.zeros(0, np.int32))
        self.slow_dst = jnp.asarray(
            np.concatenate(dst).astype(np.int32) if dst else
            np.zeros(0, np.int32))
        self.slow_rows_j = jnp.asarray(self.slow_rows.astype(np.int32))
        self.slow_points = int(self.slow_src.shape[0])

    def tables(self, planes=None):
        """Device tables from the HOST weight planes: per-segment row-major
        transposed copies + the slow-row slice. Built once; pass the result
        as a jit ARGUMENT (closure-captured device arrays get embedded as
        HLO constants on this platform). The full (W, ny, L) planes are
        never put on device here."""
        if getattr(self, "_ptabs", None) is None:
            ph = self.fs._planes_host if planes is None else np.asarray(
                planes)
            segp = tuple(
                jnp.asarray(np.ascontiguousarray(np.swapaxes(
                    ph[:, seg["r0"]:seg["r1"]], 0, 1)))
                for seg in self.segments)
            slowp = jnp.asarray(ph[:, np.asarray(self.slow_rows)])
            self._ptabs = (segp, slowp)
        return self._ptabs

    def apply(self, line, tabs, shifts, interpret=False):
        """line (ny, nf, L) + tables(planes) -> (nf, grid.size)."""
        segp, slowp = tabs
        parts = []
        pos = 0
        for seg, pt in zip(self.segments, segp):
            out = resample_compact(
                seg["meta"], line[seg["r0"]:seg["r1"]], pt,
                seg["offs"], shifts,
                self.nf, self.L, seg["WSEL"], seg["NB"], seg["NXP"],
                seg["size_pad"], interpret=interpret)
            if seg["base"] != pos:  # slow rows precede: pad with zeros
                parts.append(jnp.zeros((self.nf, seg["base"] - pos),
                                       line.dtype))
            parts.append(out[:, : seg["span"]])
            pos = seg["base"] + seg["span"]
        if pos < self.grid_size:
            parts.append(jnp.zeros((self.nf, self.grid_size - pos),
                                   line.dtype))
        out = jnp.concatenate(parts, axis=1)
        if self.slow_points:
            lsl = line[self.slow_rows_j]      # (nslow, nf, L)
            lo = -shifts[0]
            acc = lsl * slowp[lo][:, None, :]
            for k, dc in enumerate(shifts):
                if dc == 0:
                    continue
                acc = acc + jnp.roll(lsl, -dc, axis=2) * slowp[k][:, None, :]
            vals = acc.transpose(0, 2, 1).reshape(-1, self.nf)[self.slow_src]
            out = out.at[:, self.slow_dst].set(vals.T)
        return out

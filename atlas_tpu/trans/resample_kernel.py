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


def build_resample_compact(shifts, L, nf, WSEL, NB, NXP, R, rev=False):
    def kernel(meta_ref, line_ref, planes_ref, offs_ref, out_any, acc_ref,
               outrow, stream, pending, sem):
        p = pl.program_id(0)
        nrows = pl.num_programs(0) * R
        iota_w = jax.lax.broadcasted_iota(jnp.int32, (WSEL, BS), 0)
        NS = NXP + 128

        # R rows per program: amortizes per-program pipeline overhead
        # (1280 single-row programs measured ~54 ms at O1280; the dots and
        # rolls below account for ~45 of it, the rest is program churn)
        for rl in range(R):
            r = p * R + rl
            nx = meta_ref[r, 0]
            off = meta_ref[r, 1]  # exact (base-relative) output offset
            off_al = meta_ref[r, NB + 2] * 128  # 128-aligned down
            slot = jax.lax.rem(r, jnp.int32(2))

            # rev: the line block holds SOUTH-hemisphere rows in
            # latitude-half order (global row ny-1-h); the block index map
            # already walks blocks backwards, and within the block the
            # global-ascending row rl sits at line slot R-1-rl. meta/offs/
            # planes stay global-ascending (their maps are unreversed).
            line = line_ref[R - 1 - rl if rev else rl]  # (nf, L)
            lo_tap = -shifts[0]
            acc = line * planes_ref[rl, lo_tap][None, :]
            for k, dc in enumerate(shifts):
                if dc == 0:
                    continue
                # circular roll: latitude rows are circles (matches the XLA
                # path's circular pad)
                acc = acc + pltpu.roll(line, -dc % L, axis=1) \
                    * planes_ref[rl, k][None, :]
            # windows are dynamic-start slices: only REFs support those in
            # Mosaic, so stage acc through VMEM scratch
            acc_ref[:, :] = acc

            for b in range(NB):

                @pl.when(b * BS < nx)
                def _(b=b, r=r, rl=rl):
                    # meta stores start/128; the multiply makes the 128-lane
                    # alignment provable to Mosaic
                    y0 = meta_ref[r, 2 + b] * 128
                    win = acc_ref[:, pl.ds(y0, WSEL)]  # (nf, WSEL)
                    rel = offs_ref[rl, b] - y0  # (BS,)
                    sel = (iota_w == rel[None, :]).astype(jnp.bfloat16)
                    # selection dot: each output column picks ONE window
                    # lane. Mosaic dots support only DEFAULT/HIGHEST; a
                    # HIGHEST f32 dot costs 6 bf16 MXU passes at 25%
                    # sublane use (nf=32 rows). Instead split win into
                    # bf16 hi + bf16 residual stacked on the M axis: ONE
                    # single-pass bf16 dot at 50% use (~6x faster), exact
                    # to ~2^-17 relative (sel is 0/1 so no cross terms).
                    hi = win.astype(jnp.bfloat16)
                    lo = (win - hi.astype(win.dtype)).astype(jnp.bfloat16)
                    hl = jnp.concatenate([hi, lo], axis=0)  # (2 nf, WSEL)
                    o2 = jnp.dot(hl, sel, preferred_element_type=win.dtype)
                    outrow[:, b * BS:(b + 1) * BS] = o2[:nf] + o2[nf:]

            # ---- aligned streaming DMA with carry tile ------------------
            # HBM destinations must be 128-lane aligned: rotate this row's
            # values so the written block starts at off_al =
            # floor(off/128)*128, carrying the previous row's last 128
            # outputs in `pending` to fill the head lanes (the first row of
            # every segment has off == 0, so the uninitialized carry is
            # never read).
            d = off - off_al  # 0..127

            # want written[l] = [pending | outrow][(128 - d) + l]: compose
            # the concat + rotate into ONE scratch write (the previous
            # two-write + in-place-roll form cost two extra VMEM passes of
            # the (nf, NS) stream per row)
            stream[slot, :, :] = pltpu.roll(
                jnp.concatenate([pending[:, :], outrow[:, :]], axis=1),
                (NS + d - 128) % NS, axis=1)
            # carry for the next row: outputs at [off + nx - 128, off + nx)
            pend = pltpu.roll(outrow[:, :], (NXP + 128 - nx) % NXP, axis=1)
            pending[:, :] = pend[:, :128]

            # Row r's write region [off_al, off_al + NS) overlaps row r-1's
            # tail (the lanes past off+nx hold duplicated-last-point data
            # that the next row overwrites with its true head), and Mosaic
            # async copies carry no cross-DMA write-ordering guarantee — so
            # wait the PREVIOUS row's DMA before starting this one. The
            # previous row's copy still overlaps all of this row's compute
            # (resample + NB selection dots); only the start is ordered.
            # Buffer reuse stays safe: stream[slot] (row r-2's buffer) was
            # drained before row r-1's copy started.
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

            @pl.when(r == nrows - 1)
            def _(copy=copy):
                copy.wait()

    return kernel


@partial(jax.jit, static_argnames=("shifts", "nf", "L", "WSEL", "NB", "NXP",
                                   "size_pad", "R", "rev", "interpret"))
def resample_compact(meta, line, planes, offs, shifts, nf, L, WSEL, NB, NXP,
                     size_pad, R=1, rev=False, interpret=False):
    """line: (nrows, nf, L); planes: (nrows, W, L); offs: (nrows, NB, BS);
    meta: (nrows, 3 + NB) int32 rows [nx, out_offset, win_start_b/128...,
    out_offset // 128]. nrows must be a multiple of R (rows per program).
    rev: the line array holds the segment's rows in REVERSED order (south
    hemisphere in latitude-half order) — consumed via a backwards block
    index map; meta/planes/offs stay in global-ascending order.
    Returns (nf, size_pad) flat field-major values (padding tail garbage)."""
    nrows = line.shape[0]
    assert nrows % R == 0
    W = planes.shape[1]
    nprog = nrows // R
    kernel = build_resample_compact(shifts, L, nf, WSEL, NB, NXP, R, rev)
    line_map = ((lambda r, meta: (nprog - 1 - r, 0, 0)) if rev
                else (lambda r, meta: (r, 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((R, nf, L), line_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, W, L), lambda r, meta: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, NB, BS), lambda r, meta: (r, 0, 0),
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


class SegmentPlan:
    """nf-independent banded segmentation of a reduced grid for
    resample_compact: per-segment meta/offs tables, slow-row gather maps,
    and (lazily) the per-segment transposed weight-plane device tables.

    Built once per (grid, L) — expensive host loops — and persisted through
    io.cache.save_packed so a warm TransLocal setup replays the final
    arrays from mmap (reference analog: the mmap'd Legendre/IO caches,
    TransLocal.cc:652-711; VERDICT r4 ask #2)."""

    # (max oversampling s, selection window) band ladder; a row joins the
    # tightest band whose window covers BS * s + the 128-lane start
    # alignment (Mosaic dynamic lane offsets must be 128-aligned). The last
    # band's window is a full synthesis circle, so EVERY row with nx >= 128
    # (the carry-tile minimum) runs in the kernel — the XLA slow path (12
    # full-width rolls) measured 17.5 ms at O1280 when it still owned all
    # rows with s > 15.5
    LADDER = ((1.7, 384), (3.6, 640), (8.5, 1280), (15.5, 2176),
              (1e9, None))
    ROWS_PER_PROGRAM = 16

    def __init__(self, grid, L):
        ny = grid.ny
        nx = grid.nx.astype(np.int64)
        self.L, self.ny = L, ny
        self.grid_size = int(grid.size)
        self._ptabs = None
        self._seg_planes_host = None

        s = L / np.maximum(nx, 1)
        band_of = np.full(ny, -1, np.int64)
        for bi, (smax, wsel) in enumerate(self.LADDER):
            if wsel is None:
                wsel = L  # catch-all band: full-circle window
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
        # split at the hemisphere boundary (the synthesis arrives as a
        # (line_north, line_south) pair, the south half in latitude order —
        # never flipped/concatenated), then ALIGN band boundaries to the
        # ROWS_PER_PROGRAM batch by letting the WIDER-window neighbor absorb
        # the surplus rows (always safe: a wider selection window still
        # satisfies every narrower row's tap constraint). Only the
        # equator-most band of each hemisphere keeps a remainder chunk —
        # ~12 pallas calls instead of 20 at O1280.
        self.half = half = (ny + 1) // 2
        RB = self.ROWS_PER_PROGRAM
        hemi_segs = []
        for (r0, r1, bi) in segs:
            if bi < 0 or r1 <= half or r0 >= half:
                hemi_segs.append([r0, r1, bi])
            else:
                hemi_segs.append([r0, half, bi])
                hemi_segs.append([half, r1, bi])

        def wsel_of(bi):
            w = self.LADDER[bi][1]
            return L if w is None else w

        for i in range(len(hemi_segs) - 1):
            a, b = hemi_segs[i], hemi_segs[i + 1]
            if a[2] < 0 or b[2] < 0 or a[1] != b[0] or a[1] == half:
                continue
            rem = (a[1] - a[0]) % RB
            if rem == 0:
                continue
            if wsel_of(a[2]) >= wsel_of(b[2]):
                take = min(RB - rem, b[1] - b[0] - 1)
                a[1] += take
                b[0] += take
            else:
                if a[1] - a[0] > rem:
                    a[1] -= rem
                    b[0] -= rem

        split = []
        for (r0, r1, bi) in hemi_segs:
            if r1 <= r0:
                continue
            if bi < 0:
                split.append((r0, r1, bi, 1))
                continue
            n = r1 - r0
            bulk = (n // RB) * RB
            if bulk:
                split.append((r0, r0 + bulk, bi, RB))
            if n - bulk:
                split.append((r0 + bulk, r1, bi, n - bulk))

        for (r0, r1, bi, Rp) in split:
            if bi < 0:
                slow_rows.extend(range(r0, r1))
                continue
            WSEL = self.LADDER[bi][1]
            if WSEL is None:
                WSEL = L
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
                "R": Rp, "rev": r0 >= half,
                "meta": jnp.asarray(meta.astype(np.int32)),
                "offs": jnp.asarray(
                    offs.reshape(nrows, NB, BS).astype(np.int32)),
            })

        # slow rows: caller-side gather (tiny polar circles)
        self.slow_rows = np.asarray(slow_rows, np.int64)
        self._split_slow()
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
        self._slow_contig()

    def _slow_contig(self):
        """Slow rows on reduced grids are the polar caps: their grid points
        form a contiguous PREFIX and SUFFIX of the point order. When that
        holds, apply() emits them as plain concat pieces — no zero padding
        and no full-output scatter (an extra ~1.7 GB pass at O1280)."""
        dst = np.asarray(self.slow_dst)
        pre_pts = 0
        while pre_pts < len(dst) and dst[pre_pts] == pre_pts:
            pre_pts += 1
        suf_pts = 0
        while (suf_pts < len(dst) - pre_pts
               and dst[len(dst) - 1 - suf_pts]
               == self.grid_size - 1 - suf_pts):
            suf_pts += 1
        self.slow_prefix_pts = pre_pts
        self.slow_suffix_pts = suf_pts
        self.slow_contig = (pre_pts + suf_pts == len(dst))

    def _split_slow(self):
        """Hemisphere-split gather indices for the slow rows (north rows
        index line_north directly; south global row g sits at latitude-half
        slot ny-1-g of line_south). slow_rows is globally ascending, so the
        north block precedes the south block — matching the concat order in
        apply() and the slow plane table order."""
        sr = self.slow_rows
        half = self.half
        self.slow_n_j = jnp.asarray(sr[sr < half].astype(np.int32))
        self.slow_s_h_j = jnp.asarray(
            (self.ny - 1 - sr[sr >= half]).astype(np.int32))

    # ------------------------------------------------------- cache round-trip
    def packed(self, planes_host) -> dict:
        """Host arrays for io.cache.save_packed: segment scalars + meta/offs
        + the per-segment TRANSPOSED weight planes (the exact device layout)
        + the slow-row maps and plane slice."""
        out = {"__plan__": np.asarray(
            [self.L, self.ny, self.grid_size, len(self.segments),
             self.half], np.int64)}
        for i, seg in enumerate(self.segments):
            out[f"seg{i}_scal"] = np.asarray(
                [seg["r0"], seg["r1"], seg["WSEL"], seg["NB"], seg["NXP"],
                 seg["base"], seg["span"], seg["size_pad"], seg["R"],
                 int(seg["rev"])],
                np.int64)
            out[f"seg{i}_meta"] = np.asarray(seg["meta"])
            out[f"seg{i}_offs"] = np.asarray(seg["offs"])
            out[f"seg{i}_planes"] = np.ascontiguousarray(np.swapaxes(
                planes_host[:, seg["r0"]:seg["r1"]], 0, 1))
        out["slow_rows"] = self.slow_rows
        out["slow_src"] = np.asarray(self.slow_src)
        out["slow_dst"] = np.asarray(self.slow_dst)
        out["slow_planes"] = np.ascontiguousarray(
            planes_host[:, self.slow_rows])
        return out

    @classmethod
    def from_packed(cls, arrs: dict):
        obj = cls.__new__(cls)
        meta = np.asarray(arrs["__plan__"])
        obj.L, obj.ny, obj.grid_size = int(meta[0]), int(meta[1]), int(meta[2])
        obj.half = int(meta[4])
        obj._ptabs = None
        obj.segments = []
        seg_planes = []
        for i in range(int(meta[3])):
            sc = np.asarray(arrs[f"seg{i}_scal"])
            obj.segments.append({
                "r0": int(sc[0]), "r1": int(sc[1]), "WSEL": int(sc[2]),
                "NB": int(sc[3]), "NXP": int(sc[4]), "base": int(sc[5]),
                "span": int(sc[6]), "size_pad": int(sc[7]), "R": int(sc[8]),
                "rev": bool(sc[9]),
                "meta": jnp.asarray(arrs[f"seg{i}_meta"]),
                "offs": jnp.asarray(arrs[f"seg{i}_offs"]),
            })
            seg_planes.append(arrs[f"seg{i}_planes"])  # stays mmap'd
        obj._seg_planes_host = (seg_planes, arrs["slow_planes"])
        obj.slow_rows = np.asarray(arrs["slow_rows"])
        obj.slow_src = jnp.asarray(arrs["slow_src"])
        obj.slow_dst = jnp.asarray(arrs["slow_dst"])
        obj.slow_rows_j = jnp.asarray(obj.slow_rows.astype(np.int32))
        obj.slow_points = int(obj.slow_src.shape[0])
        obj._split_slow()
        obj._slow_contig()
        return obj

    def tables(self, planes_host=None):
        """Device tables: per-segment row-major transposed weight planes +
        the slow-row slice. Built once per plan (shared by every nf);
        pass the result as a jit ARGUMENT (closure-captured device arrays
        get embedded as HLO constants on this platform). On a cache hit the
        transposed host copies come straight from mmap."""
        if self._ptabs is None:
            if self._seg_planes_host is not None:
                seg_hosts, slow_host = self._seg_planes_host
            else:
                ph = np.asarray(planes_host)
                seg_hosts = [np.ascontiguousarray(np.swapaxes(
                    ph[:, seg["r0"]:seg["r1"]], 0, 1))
                    for seg in self.segments]
                slow_host = ph[:, self.slow_rows]
            self._ptabs = (tuple(jnp.asarray(p) for p in seg_hosts),
                           jnp.asarray(slow_host))
        return self._ptabs


class ResampleCompact:
    """Per-field-count view of a SegmentPlan: binds nf for the kernel block
    shapes; all geometry/tables live on (and are shared through) the plan."""

    def __init__(self, fs, grid, nf):
        assert fs.kind == "resample"
        self.fs = fs
        self.nf = int(nf)
        plan = fs._seg_plan
        self.plan = plan
        self.L, self.ny, self.grid_size = plan.L, plan.ny, plan.grid_size
        self.half = plan.half
        self.segments = plan.segments
        self.slow_rows = plan.slow_rows
        self.slow_src = plan.slow_src
        self.slow_dst = plan.slow_dst
        self.slow_rows_j = plan.slow_rows_j
        self.slow_points = plan.slow_points
        self.slow_n_j = plan.slow_n_j
        self.slow_s_h_j = plan.slow_s_h_j
        self.slow_contig = plan.slow_contig
        self.slow_prefix_pts = plan.slow_prefix_pts
        self.slow_suffix_pts = plan.slow_suffix_pts

    def tables(self, planes=None):
        return self.plan.tables(
            self.fs._planes_host if planes is None else planes)

    def apply(self, line, tabs, shifts, interpret=False):
        """line: (line_north (half, nf, L), line_south (ny-half, nf, L))
        hemisphere pair (south in latitude-half order, never flipped), or a
        legacy single (ny, nf, L) array -> (nf, grid.size)."""
        if not isinstance(line, tuple):
            line = (line[: self.half], line[self.half:][::-1])
        line_n, line_s = line
        ny = self.ny
        segp, slowp = tabs

        vals = None
        if self.slow_points:
            pieces = []
            if self.slow_n_j.shape[0]:
                pieces.append(line_n[self.slow_n_j])
            if self.slow_s_h_j.shape[0]:
                pieces.append(line_s[self.slow_s_h_j])
            lsl = (pieces[0] if len(pieces) == 1
                   else jnp.concatenate(pieces, axis=0))  # (nslow, nf, L)
            lo = -shifts[0]
            acc = lsl * slowp[lo][:, None, :]
            for k, dc in enumerate(shifts):
                if dc == 0:
                    continue
                acc = acc + jnp.roll(lsl, -dc, axis=2) * slowp[k][:, None, :]
            vals = acc.transpose(0, 2, 1).reshape(
                -1, self.nf)[self.slow_src].T  # (nf, npts) in dst order

        # slow rows are the polar caps: emit them as plain head/tail concat
        # pieces instead of zero pads + a full-output scatter (which cost an
        # extra ~1.7 GB read+write pass at O1280). Statically decided: all
        # bases/spans/counts are Python ints.
        use_contig = (vals is not None and self.slow_contig
                      and len(self.segments) > 0
                      and self.segments[0]["base"] == self.slow_prefix_pts
                      and (self.segments[-1]["base"]
                           + self.segments[-1]["span"]
                           == self.grid_size - self.slow_suffix_pts))
        parts = []
        pos = 0
        if use_contig and self.slow_prefix_pts:
            parts.append(vals[:, : self.slow_prefix_pts])
            pos = self.slow_prefix_pts
        for seg, pt in zip(self.segments, segp):
            if seg.get("rev", False):
                blk = jax.lax.slice_in_dim(
                    line_s, ny - seg["r1"], ny - seg["r0"], axis=0)
            else:
                blk = line_n[seg["r0"]:seg["r1"]]
            out = resample_compact(
                seg["meta"], blk, pt,
                seg["offs"], shifts,
                self.nf, self.L, seg["WSEL"], seg["NB"], seg["NXP"],
                seg["size_pad"], R=seg.get("R", 1),
                rev=seg.get("rev", False), interpret=interpret)
            if seg["base"] != pos:  # non-contiguous slow rows: zero pad
                parts.append(jnp.zeros((self.nf, seg["base"] - pos),
                                       line_n.dtype))
            parts.append(out[:, : seg["span"]])
            pos = seg["base"] + seg["span"]
        if use_contig and self.slow_suffix_pts:
            parts.append(vals[:, self.slow_prefix_pts:])
            pos = self.grid_size
        if pos < self.grid_size:
            parts.append(jnp.zeros((self.nf, self.grid_size - pos),
                                   line_n.dtype))
        out = jnp.concatenate(parts, axis=1)
        if vals is not None and not use_contig:
            out = out.at[:, self.slow_dst].set(vals)
        return out

"""Pallas TPU kernels for the shift-structured fvm operators.

The XLA version of structured.py materializes one shifted copy of the field
per shift key (~22 full-array passes). These kernels stream each (row-tile,
level-tile) block through VMEM exactly once: the weight tables for a row tile
are fetched once per row tile (constant in the level grid dimension, so Pallas
keeps them resident), the field block plus its two row-neighbour blocks are
fetched once, and all shift contributions are applied in-register (static lane
shifts + row concatenations). Minimum HBM traffic per iteration:
f + S-tables + output — the speed-of-light for this stencil.

Layout contract (structured.py): fields (lo, ny, LI, nxw) with LI levels in
the sublane dim, x in the lane dim; weights (nk, ny, nxw); all shifts static.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

# level-tile rows (f32 sublane groups); env override for tuning sweeps
# LI 8 vs 16 measured within run-to-run noise on both gradient configs
# (O320 x 64: 2.6-2.8 ms either way; O640 x 137: 21-22 ms); 16 halves the
# level-tile count so it is kept as the default
LI = int(_os.environ.get("ATLAS_TPU_LI", "16"))
TJ = int(_os.environ.get("ATLAS_TPU_TJ", "8"))  # row-tile


def _cshift(a, dc):
    """Static lane shift with zero fill: out[..., c] = a[..., c + dc]."""
    if dc == 0:
        return a
    nxw = a.shape[-1]
    if dc > 0:
        pad = [(0, 0)] * (a.ndim - 1) + [(0, dc)]
        return jnp.pad(a, pad)[..., dc : dc + nxw]
    pad = [(0, 0)] * (a.ndim - 1) + [(-dc, 0)]
    return jnp.pad(a, pad)[..., :nxw]


def _roll_shift(a, dc):
    """Lane shift via circular roll: out[..., c] = a[..., (c + dc) % nxw].

    2.7x cheaper than pad+slice on the VPU (one rotate, no materialized
    padding). The wrapped lanes carry garbage, but the weight tables are zero
    wherever the shifted source would be out of range (no stencil neighbour
    there by construction), so every wrapped value is multiplied by 0.
    """
    if dc == 0:
        return a
    return pltpu.roll(a, -dc % a.shape[-1], axis=a.ndim - 1)


def build_gradient_kernel(runs, keys, ny_pad, nxw, nk):
    """runs: ((jt_start, jt_end, key_ids), ...) — contiguous row-tile ranges
    with their ACTIVE stencil keys; keys: (dj, dc) aligned with the stacked S
    arrays. Reduced grids activate only ~60% of the global key set per
    hemisphere (hemisphere row-alignment flips the dc sign range, pole keys
    touch only the first/last tile), so branching per tile range cuts the
    VPU FMA count accordingly.

    The field tile arrives once via the pipelined BlockSpec (traffic 1x); the
    two row-neighbour boundary rows are fetched with explicit small DMAs from
    the un-blocked HBM alias of the same array (traffic 2/TJ), so total field
    traffic is 1 + 2/TJ instead of the 3x of full neighbour tiles. The DMAs
    are double-buffered one grid step ahead (issue step i+1's rows while
    computing step i) so their latency is fully hidden.
    """

    def kernel(Sx_ref, Sy_ref, G_ref, f_ref, fany_ref, gx_ref, gy_ref, halo, sem):
        jt = pl.program_id(0)
        lt = pl.program_id(1)
        lo = pl.num_programs(1)
        step = jt * lo + lt
        nsteps = pl.num_programs(0) * lo

        def dmas(s, slot):
            # boundary rows j*TJ-1 and j*TJ+TJ for step s, clamped at the
            # poles (weights for out-of-range dj are zero there, so the
            # clamped garbage is masked out)
            jt_s = s // lo
            lt_s = s % lo
            prev = jnp.maximum(jt_s * TJ - 1, 0)
            nxt = jnp.minimum(jt_s * TJ + TJ, ny_pad - 1)
            return (
                pltpu.make_async_copy(
                    fany_ref.at[lt_s, prev], halo.at[slot, 0], sem.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    fany_ref.at[lt_s, nxt], halo.at[slot, 1], sem.at[slot, 1]
                ),
            )

        two = jnp.int32(2)
        slot = jax.lax.rem(step, two)

        @pl.when(step == 0)
        def _():
            for d in dmas(step, slot):
                d.start()

        @pl.when(step + 1 < nsteps)
        def _():
            for d in dmas(step + 1, jax.lax.rem(step + 1, two)):
                d.start()

        for d in dmas(step, slot):
            d.wait()

        f = f_ref[0]  # (TJ, LI, nxw)
        hp = halo[slot, 0][None]
        hn = halo[slot, 1][None]
        # hoisted neighbour-row variants: two concats per tile, not per key
        rows = {
            0: f,
            1: jnp.concatenate([f[1:], hn], axis=0),
            -1: jnp.concatenate([hp, f[:-1]], axis=0),
        }

        def apply_keys(key_ids):
            acc_x = jnp.zeros_like(f)
            acc_y = jnp.zeros_like(f)
            for k in key_ids:
                dj, dc = keys[k]
                fs = _roll_shift(rows[dj], dc)
                acc_x = acc_x + fs * Sx_ref[k][:, None, :]
                acc_y = acc_y + fs * Sy_ref[k][:, None, :]
            gx_ref[0] = acc_x * G_ref[0][:, None, :]
            gy_ref[0] = acc_y * G_ref[1][:, None, :]

        if len(runs) == 1:
            apply_keys(runs[0][2])
        else:
            for start, end, key_ids in runs:
                @pl.when((jt >= start) & (jt < end))
                def _(key_ids=key_ids):
                    apply_keys(key_ids)

    return kernel


@partial(jax.jit, static_argnames=("runs", "keys", "interpret"))
def gradient_pallas(runs, keys, Sx, Sy, G, ft, interpret=False):
    """ft: (lo, ny, LI, nxw); Sx/Sy: (nk, ny, nxw); G: (2, ny, nxw).

    Returns (gx, gy) each (lo, ny, LI, nxw). `keys` must be a tuple of (dj, dc)
    pairs aligned with the leading axis of Sx/Sy; key (0, 0) holds the self
    term (sum of all S). `runs` gives per-row-tile-range active key subsets
    (see build_gradient_kernel); pass ((0, ny//TJ, range(nk)),) to apply all
    keys everywhere.
    """
    lo, ny, li, nxw = ft.shape
    nk = Sx.shape[0]
    ny_t = ny // TJ
    assert ny % TJ == 0

    grid = (ny_t, lo)

    f_spec = pl.BlockSpec(
        (1, TJ, li, nxw), lambda jt, lt: (lt, jt, 0, 0), memory_space=pltpu.VMEM
    )
    f_any = pl.BlockSpec(memory_space=pl.ANY)
    S_spec = pl.BlockSpec(
        (nk, TJ, nxw), lambda jt, lt: (0, jt, 0), memory_space=pltpu.VMEM
    )
    G_spec = pl.BlockSpec(
        (2, TJ, nxw), lambda jt, lt: (0, jt, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, TJ, li, nxw), lambda jt, lt: (lt, jt, 0, 0), memory_space=pltpu.VMEM
    )

    kernel = build_gradient_kernel(runs, keys, ny, nxw, nk)
    gx, gy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[S_spec, S_spec, G_spec, f_spec, f_any],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct(ft.shape, ft.dtype),
            jax.ShapeDtypeStruct(ft.shape, ft.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 2, li, nxw), ft.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        # wide rows (O640+: nxw_pad >= 2688) exceed the conservative 16 MB
        # scoped default with double-buffered S tables; v5e has headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(100 * 2**20)),
        interpret=interpret,
    )(Sx, Sy, G, ft, ft)
    return gx, gy


class PallasGradient:
    """Gradient via the Pallas kernel, built from a StructuredFvm's tables."""

    def __init__(self, sfvm, dtype=jnp.float32):
        from ..util.constants import DEG2RAD

        s = sfvm.shifts
        self.sfvm = sfvm
        ny, nxw = s.ny, s.nxw
        # pad rows to a multiple of TJ and lanes to a multiple of 128
        self.ny_pad = -(-ny // TJ) * TJ
        self.nxw_pad = -(-nxw // 128) * 128
        items = [((0, 0), s.S_total_regular + s.S_total_pole)] + [
            (k, v) for k, v in list(s.keys_regular.items()) + list(s.keys_pole.items())
            if k != (0, 0)
        ]
        # fold any (0,0) regular/pole keys into the self term (already in total)
        self.keys = tuple(k for k, _ in items)
        nk = len(items)
        Sx = np.zeros((nk, self.ny_pad, self.nxw_pad), np.float64)
        Sy = np.zeros_like(Sx)
        for i, (k, S) in enumerate(items):
            Sx[i, :ny, :nxw] = S[:, :, 0]
            Sy[i, :ny, :nxw] = S[:, :, 1]
        G = np.zeros((2, self.ny_pad, self.nxw_pad), np.float64)
        G[0, :ny, :nxw] = 0.5 * DEG2RAD * s.metric_x * s.mask
        G[1, :ny, :nxw] = 0.5 * DEG2RAD * s.metric_y * s.mask
        self.Sx = jnp.asarray(Sx, dtype)
        self.Sy = jnp.asarray(Sy, dtype)
        self.G = jnp.asarray(G, dtype)
        self.ny, self.nxw = ny, nxw

        # per-row-tile active key subsets, merged into contiguous runs: only
        # ~60% of keys are nonzero in a given hemisphere on reduced grids, and
        # the pole keys touch only the first/last tile — the kernel branches
        # on the tile id and skips inactive FMAs
        ny_t = self.ny_pad // TJ
        act = np.zeros((nk, self.ny_pad), bool)
        for i, (_, S) in enumerate(items):
            act[i, :ny] = np.abs(S).sum(axis=(1, 2)) > 0
        runs = []
        for jt in range(ny_t):
            ids = tuple(np.flatnonzero(act[:, jt * TJ:(jt + 1) * TJ].any(axis=1)))
            if not ids:
                ids = (0,)  # padded tiles: write zeros via the self term
            if runs and runs[-1][2] == ids:
                runs[-1] = (runs[-1][0], jt + 1, ids)
            else:
                runs.append((jt, jt + 1, ids))
        self.runs = tuple(runs)

    def __call__(self, ft):
        """ft: (lo, ny_pad, LI, nxw_pad) tiled field (halo columns filled)."""
        interpret = jax.default_backend() not in ("tpu", "axon")
        return gradient_pallas(self.runs, self.keys, self.Sx, self.Sy, self.G,
                               ft, interpret=interpret)

    def tile(self, f):
        """(nlev, ny, nxw) -> padded tiled (lo, ny_pad, LI, nxw_pad)."""
        nlev = f.shape[0]
        lo = -(-nlev // LI)
        f = jnp.pad(
            f,
            (
                (0, lo * LI - nlev),
                (0, self.ny_pad - self.ny),
                (0, self.nxw_pad - self.nxw),
            ),
        )
        return jnp.transpose(
            f.reshape(lo, LI, self.ny_pad, self.nxw_pad), (0, 2, 1, 3)
        )

    def untile(self, ft, nlev):
        lo, nyp, li, nxwp = ft.shape
        out = jnp.transpose(ft, (0, 2, 1, 3)).reshape(lo * li, nyp, nxwp)
        return out[:nlev, : self.ny, : self.nxw]

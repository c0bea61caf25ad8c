"""Domain-decomposed shallow water: the fused Pallas kernels under shard_map.

TPU design (the distributed flagship path):
  * rows are split into POINT-balanced latitude bands
    (partition/simple.py:balanced_row_starts — the reference balances points,
    BandsPartitioner.cc:73, EqualRegionsPartitioner.cc:278-360), each shard
    holding a (ny_blk, nxw_pad) owned block padded to a common row count;
  * each RK3 stage runs the SAME fused Pallas stage kernel as the serial
    model (model/pallas_swe.py) on the shard's owned rows — the fast path is
    the distributed path, not a slow XLA fallback;
  * halo exchange is two static `ppermute`s of the stacked (h, u, v)
    boundary rows, issued BEFORE the interior kernel; only the two boundary
    output rows depend on it, recomputed afterwards by a tiny 6-row XLA
    stencil window. XLA's latency-hiding scheduler can thus overlap the ICI
    transfer with the interior Pallas compute — the TPU analog of the
    reference's nonblocking irecv/isend overlap
    (parallel/HaloExchange.h:151-225, "halo exchange fully hidden").

Validation: sharded steps equal the serial model's steps on the owned rows
to roundoff (tests/test_sharded_swe.py), on any nparts including 1 (where the
step time matches the serial Pallas stepper — no fallback path exists).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..partition.simple import balanced_row_starts
from ..util.constants import DEG2RAD
from .shallow_water import GRAVITY, ShallowWaterModel
from .pallas_swe import pick_tjs, swe_stage_pallas


class ShardedShallowWater:
    def __init__(self, grid, nparts: int, dtype=jnp.float32,
                 mesh: Mesh | None = None, axis_name: str = "bands"):
        """mesh may be 1-D or a multi-host (dcn, ici) mesh from
        parallel.multihost.host_aware_mesh — bands are then sharded over the
        axis PRODUCT in row-major order, so adjacent bands live on the same
        host (halo ppermutes ride ICI; only host-boundary bands cross DCN)."""
        self.grid = grid
        self.nparts = int(nparts)
        if mesh is not None and len(mesh.axis_names) > 1:
            axis_name = tuple(mesh.axis_names)
            self.nparts = int(mesh.devices.size)
        self.axis_name = axis_name
        self.dtype = jnp.dtype(dtype)
        self.serial = ShallowWaterModel(grid, dtype=dtype, use_cache=True)
        s = self.serial.sfvm.shifts
        self.nxw = s.nxw
        self.ny = s.ny
        self.nxw_pad = -(-s.nxw // 128) * 128

        self.starts = balanced_row_starts(grid.nx, self.nparts, min_rows=2)
        self.nyl = (self.starts[1:] - self.starts[:-1]).astype(np.int32)
        nyl_max = int(self.nyl.max())

        self._build_tables(nyl_max)
        if mesh is None:
            devices = np.array(jax.devices()[: self.nparts])
            mesh = Mesh(devices, (axis_name,))
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, P(axis_name))
        self._tables_dev = None
        self._step_fn = None
        self._run_fn = None

    # ------------------------------------------------------------------ setup
    def _build_tables(self, nyl_max: int):
        """Per-shard packed Pallas weights + 6-row boundary-window tables."""
        s = self.serial.sfvm.shifts
        ny, nxw, nxw_pad = self.ny, self.nxw, self.nxw_pad
        nparts = self.nparts

        # ---- packed stencil items, identical slot layout on every shard ----
        # REGULAR keys only, in the serial PallasShallowWater item order;
        # pole keys are applied as the same XLA post-fix the serial stepper
        # uses (_pole_fix) so every row's accumulation order is bit-identical
        # to the serial kernel's (cross-decomposition reproducibility,
        # reference analog atlas-benchmark.cc:25-28 bit-identical checksums)
        items = [((0, 0, False), s.S_total_regular)]
        for k, S in s.keys_regular.items():
            if k != (0, 0):
                items.append(((k[0], k[1], False), S))
        self.amax = amax = len(items)
        self.tjs = tjs = pick_tjs(amax, nxw_pad, np.dtype(self.dtype).itemsize)
        self.ny_blk = ny_blk = -(-nyl_max // tjs) * tjs
        # one run covering all tiles: per-shard inactive slots carry zero
        # weights (pole slots are nonzero only on the polar shards)
        self.runs = ((0, ny_blk // tjs, tuple(it[0] for it in items)),)

        Sx = np.zeros((nparts, amax, ny_blk, nxw_pad), np.float64)
        Sy = np.zeros_like(Sx)
        M = np.zeros((nparts, 6, ny_blk, nxw_pad), np.float64)
        Mg = np.zeros((6, ny, nxw), np.float64)
        Mg[0, :, :] = 0.5 * DEG2RAD * s.metric_x * s.mask
        Mg[1, :, :] = 0.5 * DEG2RAD * s.metric_y * s.mask
        Mg[2, :, :] = 0.5 * DEG2RAD * s.metric_y / s.cos_lat * s.mask
        Mg[3, :, :] = s.cos_lat
        Mg[4, :, :] = self.serial.coriolis
        Mg[5, :, :] = s.mask
        for p in range(nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            n = hi - lo
            for a, (_, S) in enumerate(items):
                Sx[p, a, :n, :nxw] = S[lo:hi, :, 0]
                Sy[p, a, :n, :nxw] = S[lo:hi, :, 1]
            M[p, :, :n, :nxw] = Mg[:, lo:hi]

        # ---- 8-row boundary windows [halo_n, own0, own1, own_last-1,
        # own_last, halo_s, pad, pad]: global rows [lo-1, lo, lo+1, hi-2,
        # hi-1, hi] — the SAME fused Pallas stage kernel re-runs on this
        # window so the two boundary output rows (window rows 1 and 4) are
        # bit-identical to what the serial kernel computes for them ----
        self.tjs_w = 8  # Mosaic-minimum row tile; one tile per window
        SxW = np.zeros((nparts, amax, 8, nxw_pad), np.float64)
        SyW = np.zeros_like(SxW)
        MW = np.zeros((nparts, 6, 8, nxw_pad), np.float64)
        for p in range(nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            rows = np.clip([lo - 1, lo, lo + 1, hi - 2, hi - 1, hi],
                           0, ny - 1)
            for a, (_, S) in enumerate(items):
                SxW[p, a, :6, :nxw] = S[rows, :, 0]
                SyW[p, a, :6, :nxw] = S[rows, :, 1]
            MW[p, :, :6, :nxw] = Mg[:, rows]

        # ---- pole post-fix (serial _pole_fix structure, per shard) --------
        # within-row antipodal shifts on the polar rows; non-polar shards
        # carry zero weights on dummy rows (adding -dt*cb*(+/-0) is an
        # exact identity, so the SPMD program stays uniform)
        pole_items = []
        if np.abs(s.S_total_pole).sum() > 0:
            pole_items.append(((0, 0), s.S_total_pole))
        for k, S in s.keys_pole.items():
            if k != (0, 0) and np.abs(S).sum() > 0:
                pole_items.append((k, S))
        self._pole_dcs = tuple(int(k[1]) for k, _ in pole_items)
        pole = None
        if pole_items:
            assert all(k[0] == 0 for k, _ in pole_items), \
                "pole keys are within-row (antipodal) shifts"
            grows = sorted(set().union(*[
                set(np.flatnonzero(np.abs(S).sum(axis=(1, 2)) > 0))
                for _, S in pole_items]))
            nr = max(len(grows), 1)
            prow = np.zeros((nparts, nr), np.int32)
            Spx = np.zeros((nparts, len(pole_items), nr, nxw_pad), np.float64)
            Spy = np.zeros_like(Spx)
            Mpx = np.zeros((nparts, nr, nxw_pad), np.float64)
            Mpy = np.zeros_like(Mpx)
            for p in range(nparts):
                lo, hi = self.starts[p], self.starts[p + 1]
                mine = [g_ for g_ in grows if lo <= g_ < hi]
                for i, g_ in enumerate(mine):
                    prow[p, i] = g_ - lo
                    for a, (_, S) in enumerate(pole_items):
                        Spx[p, a, i, :nxw] = S[g_, :, 0]
                        Spy[p, a, i, :nxw] = S[g_, :, 1]
                    Mpx[p, i, :nxw] = Mg[0, g_]
                    Mpy[p, i, :nxw] = Mg[1, g_]
            pole = {"rows": prow, "Spx": Spx, "Spy": Spy,
                    "Mx": Mpx, "My": Mpy}
        self._has_pole = pole is not None

        # ---- per-shard periodic ghost-column fills (owned rows only) -------
        hr, hd, hs = s.halo_rows, s.halo_dst, s.halo_src
        per_shard = []
        for p in range(nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            sel = np.flatnonzero((hr >= lo) & (hr < hi))
            per_shard.append((hr[sel] - lo, hd[sel], hs[sel]))
        wmax = max(max(len(x[0]) for x in per_shard), 1)
        # padding entries are identity writes onto a real column: harmless
        Lcol = int(s.L)
        rows_l = np.zeros((nparts, wmax), np.int32)
        dst_l = np.full((nparts, wmax), Lcol, np.int32)
        src_l = np.full((nparts, wmax), Lcol, np.int32)
        for p, (r_, d_, s_) in enumerate(per_shard):
            rows_l[p, : len(r_)] = r_
            dst_l[p, : len(d_)] = d_
            src_l[p, : len(s_)] = s_

        self._tables_host = {
            "Sx": Sx, "Sy": Sy, "M": M,
            "SxW": SxW, "SyW": SyW, "MW": MW,
            "xhalo_rows": rows_l, "xhalo_dst": dst_l, "xhalo_src": src_l,
            "nyl": self.nyl.reshape(nparts, 1),
        }
        if pole is not None:
            self._tables_host["pole"] = pole

    def _tbl(self):
        if self._tables_dev is None:
            def put(v):
                arr = jnp.asarray(
                    v, self.dtype if np.asarray(v).dtype.kind == "f" else None)
                return jax.device_put(arr, self._sharding)

            self._tables_dev = jax.tree_util.tree_map(put, self._tables_host)
        return self._tables_dev

    # ------------------------------------------------------------- field i/o
    def scatter(self, f):
        """Serial (ny, nxw) or (1, ny, nxw) -> sharded (nparts, ny_blk, nxw_pad).

        SWE state is single-level by construction; nlev > 1 is rejected
        rather than silently truncated (multi-level distributed fields go
        through ShardedFvm / DistributedStructuredColumns instead)."""
        f = np.asarray(f)
        if f.ndim == 3:
            if f.shape[0] != 1:
                raise ValueError(
                    f"ShardedShallowWater.scatter got nlev={f.shape[0]}; "
                    "the SWE state is single-level — use ShardedFvm for "
                    "multi-level fields")
            f = f[0]
        out = np.zeros((self.nparts, self.ny_blk, self.nxw_pad), f.dtype)
        for p in range(self.nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            out[p, : hi - lo, : self.nxw] = f[lo:hi]
        return jax.device_put(jnp.asarray(out, self.dtype), self._sharding)

    def gather(self, f_sharded):
        f = np.asarray(f_sharded)
        out = np.zeros((1, self.ny, self.nxw), f.dtype)
        for p in range(self.nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            out[0, lo:hi] = f[p, : hi - lo, : self.nxw]
        return out

    def scatter_state(self, state):
        return {k: self.scatter(v) for k, v in state.items()}

    def gather_state(self, state):
        return {k: self.gather(v) for k, v in state.items()}

    # ---------------------------------------------------------------- dynamics
    def _interpret(self):
        return jax.default_backend() not in ("tpu", "axon")

    def _compiled(self, nsteps: int | None):
        t = self._tbl()
        ax = self.axis_name
        nparts = self.nparts
        spec = P(self.axis_name)
        state_spec = {k: spec for k in ("h", "u", "v")}
        cfg = (ax, nparts, self.runs, self.amax, self.tjs, self._pole_dcs,
               self._interpret())

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(jax.tree_util.tree_map(lambda _: spec, t), state_spec,
                      P()),
            out_specs=state_spec,
            check_vma=False,
        )
        def run(tl, st, dt):
            tl = jax.tree_util.tree_map(lambda a: a[0], tl)
            huv = tuple(st[k][0] for k in ("h", "u", "v"))
            if nsteps is None:
                huv = _sharded_rk3(tl, huv, dt, *cfg)
            else:
                def body(_, x):
                    return _sharded_rk3(tl, x, dt, *cfg)

                huv = jax.lax.fori_loop(0, nsteps, body, huv)
            return {k: v[None] for k, v in zip(("h", "u", "v"), huv)}

        return jax.jit(run)

    def step(self, state, dt: float):
        if self._step_fn is None:
            self._step_fn = self._compiled(None)
        return self._step_fn(self._tbl(), state, jnp.asarray(dt, self.dtype))

    def run(self, state, dt: float, nsteps: int):
        """nsteps fused steps in one jitted program (fori_loop chain)."""
        if self._run_fn is None or self._run_fn[0] != nsteps:
            self._run_fn = (nsteps, self._compiled(nsteps))
        return self._run_fn[1](self._tbl(), state,
                               jnp.asarray(dt, self.dtype))


def _exchange_boundary_rows(huv, nyl, ax, nparts):
    """Stacked boundary-row ppermutes: returns (halo_north, halo_south),
    each (3, nxw_pad) rows [h, u, v] from the row-adjacent shards."""
    north = jnp.stack([f[0] for f in huv])
    south = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(f, nyl - 1, 1, 0)[0] for f in huv])
    to_south = [(p, p + 1) for p in range(nparts - 1)]
    to_north = [(p, p - 1) for p in range(1, nparts)]
    halo_n = jax.lax.ppermute(south, ax, to_south)
    halo_s = jax.lax.ppermute(north, ax, to_north)
    return halo_n, halo_s


def _apply_xhalo(tl, f):
    rows = tl["xhalo_rows"]
    return f.at[rows, tl["xhalo_dst"]].set(f[rows, tl["xhalo_src"]])


def _pole_fix_sharded(tl, dcs, cur, out, dt, cb):
    """Serial _pole_fix replayed per shard: within-row antipodal
    energy-gradient contribution added on the (local) polar rows. Non-polar
    shards execute the same adds with zero weights — exact identities —
    keeping the SPMD program uniform AND every row's float op sequence
    identical to the serial stepper's (bit-identical checksums across
    decompositions, reference atlas-benchmark.cc:25-28)."""
    from .pallas_swe import _lane_shift
    from .shallow_water import GRAVITY as _G

    p = tl["pole"]
    rows = p["rows"]
    h2, u2, v2 = (x[rows] for x in cur)
    g = jnp.asarray(_G, h2.dtype)
    E2 = g * h2 + jnp.asarray(0.5, h2.dtype) * (u2 * u2 + v2 * v2)
    accx = jnp.zeros_like(E2)
    accy = jnp.zeros_like(E2)
    for k, dc in enumerate(dcs):
        Es = _lane_shift(E2, dc)
        accx = accx + Es * p["Spx"][k]
        accy = accy + Es * p["Spy"][k]
    gx = accx * p["Mx"]
    gy = accy * p["My"]
    dtc = jnp.asarray(cb, gx.dtype) * jnp.asarray(dt, gx.dtype)
    oh, ou, ov = out
    ou = ou.at[rows].add(-dtc * gx)
    ov = ov.at[rows].add(-dtc * gy)
    return oh, ou, ov


def _sharded_stage(tl, prev, cur, dt, ca, cb, ax, nparts, runs, amax, tjs,
                   pole_dcs, interpret):
    """One fused RK stage: ppermute first, interior Pallas kernel, then the
    two boundary rows recomputed by re-running the SAME fused kernel on an
    8-row window around each band edge (overlap-friendly: only the window
    call depends on the exchange; bit-identical to the serial kernel)."""
    dtype = cur[0].dtype
    nyl = tl["nyl"][0]
    cur = tuple(_apply_xhalo(tl, f) for f in cur)
    halo_n, halo_s = _exchange_boundary_rows(cur, nyl, ax, nparts)

    # interior: the fused serial stage kernel on the owned block (boundary
    # output rows are wrong — they miss the halo contributions — and are
    # overwritten below)
    oi = swe_stage_pallas(runs, amax, tjs, tl["Sx"], tl["Sy"], tl["M"],
                          *prev, *cur, dt, jnp.asarray(ca, dtype),
                          jnp.asarray(cb, dtype), interpret=interpret)

    # boundary: the same kernel on the 8-row window [halo_n, own0, own1,
    # own_l-1, own_l, halo_s, 0, 0]; window rows 1 and 4 see exactly the
    # neighbor rows the serial kernel sees, so their outputs are
    # bit-identical to a serial whole-grid run; the rest is discarded
    nxw_pad = cur[0].shape[1]
    zpad = jnp.zeros((2, nxw_pad), dtype)
    z1 = jnp.zeros((1, nxw_pad), dtype)
    win_c, win_p = [], []
    for i in range(3):
        f, pv = cur[i], prev[i]
        last2 = jax.lax.dynamic_slice_in_dim(f, nyl - 2, 2, 0)
        last2p = jax.lax.dynamic_slice_in_dim(pv, nyl - 2, 2, 0)
        win_c.append(jnp.concatenate(
            [halo_n[i][None], f[0:2], last2, halo_s[i][None], zpad], axis=0))
        # prev is only read at the two computed rows (slots 1 and 4)
        win_p.append(jnp.concatenate(
            [z1, pv[0:2], last2p, z1, zpad], axis=0))
    runs_w = ((0, 1, runs[0][2]),)
    ob = swe_stage_pallas(runs_w, amax, 8, tl["SxW"], tl["SyW"], tl["MW"],
                          *win_p, *win_c, dt, jnp.asarray(ca, dtype),
                          jnp.asarray(cb, dtype), interpret=interpret)

    out = []
    for i in range(3):
        o = oi[i].at[0].set(ob[i][1])
        o = jax.lax.dynamic_update_slice_in_dim(o, ob[i][4][None],
                                                nyl - 1, 0)
        out.append(o)
    if pole_dcs:
        out = _pole_fix_sharded(tl, pole_dcs, cur, tuple(out), dt, cb)
    return tuple(out)


def _sharded_rk3(tl, huv, dt, ax, nparts, runs, amax, tjs, pole_dcs,
                 interpret):
    stage = partial(_sharded_stage, tl, ax=ax, nparts=nparts, runs=runs,
                    amax=amax, tjs=tjs, pole_dcs=pole_dcs,
                    interpret=interpret)
    s1 = stage(huv, huv, dt=dt, ca=0.0, cb=1.0)
    s2 = stage(huv, s1, dt=dt, ca=0.75, cb=0.25)
    s3 = stage(huv, s2, dt=dt, ca=1.0 / 3.0, cb=2.0 / 3.0)
    return s3

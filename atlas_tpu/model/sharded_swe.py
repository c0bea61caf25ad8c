"""Domain-decomposed shallow water: latitude bands over a device mesh.

The structured (nlev, ny, nxw) layout shards naturally over contiguous row
bands (the reference's bands/equal-bands partitioners, SURVEY 2.4): each shard
owns ny_loc rows plus one exchanged halo row per side, and every fvm shift
operator works unchanged on the extended local block. Halo exchange is two
`ppermute`s (north-going and south-going row slices) per RK stage — static
neighbour communication on the ICI, overlapped by XLA with the interior
compute.

Validation: one step of the sharded model equals the serial model's step on
the owned rows to roundoff.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .shallow_water import ShallowWaterModel, _swe_tendencies


class ShardedShallowWater:
    def __init__(self, grid, nparts: int, dtype=jnp.float32, mesh: Mesh | None = None, axis_name: str = "bands"):
        self.grid = grid
        self.nparts = int(nparts)
        self.axis_name = axis_name
        self.dtype = jnp.dtype(dtype)
        self.serial = ShallowWaterModel(grid, dtype=dtype)
        s = self.serial.sfvm.shifts
        self.nxw = s.nxw
        ny = s.ny
        self.ny_loc = -(-ny // self.nparts)
        self.ny_pad = self.ny_loc * self.nparts
        self.ny = ny

        self._build_tables()
        if mesh is None:
            devices = np.array(jax.devices()[: self.nparts])
            mesh = Mesh(devices, (axis_name,))
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, P(axis_name))
        self._tables_dev = None

    # ------------------------------------------------------------------ setup
    def _build_tables(self):
        """Per-shard tables with one dummy halo row top and bottom.

        Shard p owns global rows [p*ny_loc, (p+1)*ny_loc); its extended table
        block covers [own-1, own+1] with mask forced to 0 on the halo rows so
        their (garbage) outputs never contribute.
        """
        base = dict(self.serial._tbl())
        s = self.serial.sfvm.shifts
        nyl = self.ny_loc

        def pad_rows(a):
            # (ny, ...) -> (ny_pad, ...)
            pad = [(0, self.ny_pad - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
            return np.pad(np.asarray(a), pad)

        def stack(a, zero_halo=False):
            a = pad_rows(a)
            blocks = []
            for p in range(self.nparts):
                lo = p * nyl - 1
                hi = (p + 1) * nyl + 1
                rows = np.clip(np.arange(lo, hi), 0, self.ny_pad - 1)
                blk = a[rows].copy()
                if zero_halo:
                    blk[0] = 0
                    blk[-1] = 0
                blocks.append(blk)
            return np.stack(blocks)  # (nparts, nyl+2, ...)

        t = {}
        t["mask"] = stack(base["mask"], zero_halo=True)
        for k in ("metric_x", "metric_y", "cos_lat", "inv_cos", "lat", "coriolis"):
            if k in base:
                t[k] = stack(base[k])
        t["S_total_regular"] = stack(base["S_total_regular"], zero_halo=True)
        t["S_total_pole"] = stack(base["S_total_pole"], zero_halo=True)
        t["regular"] = {k: stack(v, zero_halo=True) for k, v in base["regular"].items()}
        t["pole"] = {k: stack(v, zero_halo=True) for k, v in base["pole"].items()}
        # x-halo column copies apply per shard on its own rows: remap global
        # halo_rows to (shard, local row incl. offset 1)
        hr = np.asarray(base["halo_rows"])
        hd = np.asarray(base["halo_dst"])
        hs = np.asarray(base["halo_src"])
        # each shard fills the x-halo columns of its own rows AND of the two
        # received halo rows (their ghost columns arrive stale)
        per_shard = []
        for p in range(self.nparts):
            lo = p * nyl - 1
            hi = (p + 1) * nyl + 1
            sel = np.flatnonzero((hr >= lo) & (hr < hi))
            per_shard.append((hr[sel] - lo, hd[sel], hs[sel]))
        wmax = max(max(len(x[0]) for x in per_shard), 1)
        # padding entries must NOT collide with real scatter targets (duplicate
        # scatter indices have undefined winners): real destinations are ghost
        # columns only, so an identity write to a real column (row 1, col L) is
        # conflict-free
        Lcol = int(s.L)
        rows_l = np.full((self.nparts, wmax), 1, dtype=np.int32)
        dst_l = np.full((self.nparts, wmax), Lcol, dtype=np.int32)
        src_l = np.full((self.nparts, wmax), Lcol, dtype=np.int32)
        for p, (r_, d_, s_) in enumerate(per_shard):
            rows_l[p, : len(r_)] = r_
            dst_l[p, : len(d_)] = d_
            src_l[p, : len(s_)] = s_
        # padding entries: copy row 0 col 0 onto itself (harmless)
        t["xhalo_rows"] = rows_l
        t["xhalo_dst"] = dst_l
        t["xhalo_src"] = src_l
        self._tables_host = t

    def _tbl(self):
        if self._tables_dev is None:
            d = {}
            for k, v in self._tables_host.items():
                if isinstance(v, dict):
                    d[k] = {
                        kk: jax.device_put(
                            jnp.asarray(vv, self.dtype if vv.dtype.kind == "f" else None),
                            self._sharding,
                        )
                        for kk, vv in v.items()
                    }
                else:
                    d[k] = jax.device_put(
                        jnp.asarray(v, self.dtype if v.dtype.kind == "f" else None),
                        self._sharding,
                    )
            self._tables_dev = d
        return self._tables_dev

    # ------------------------------------------------------------- field i/o
    def scatter(self, f_pad):
        """Serial (nlev, ny, nxw) -> sharded (nparts, nlev, ny_loc, nxw)."""
        f_pad = np.asarray(f_pad)
        nlev = f_pad.shape[0]
        out = np.zeros((self.nparts, nlev, self.ny_loc, self.nxw), f_pad.dtype)
        for p in range(self.nparts):
            lo = p * self.ny_loc
            hi = min((p + 1) * self.ny_loc, self.ny)
            out[p, :, : hi - lo] = f_pad[:, lo:hi]
        return jax.device_put(jnp.asarray(out), self._sharding)

    def gather(self, f_sharded):
        f = np.asarray(f_sharded)
        nlev = f.shape[1]
        out = np.zeros((nlev, self.ny, self.nxw), f.dtype)
        for p in range(self.nparts):
            lo = p * self.ny_loc
            hi = min((p + 1) * self.ny_loc, self.ny)
            out[:, lo:hi] = f[p, :, : hi - lo]
        return out

    def scatter_state(self, state):
        return {k: self.scatter(v) for k, v in state.items()}

    def gather_state(self, state):
        return {k: self.gather(v) for k, v in state.items()}

    # ---------------------------------------------------------------- dynamics
    def _compiled_step(self, state_treedef_keys):
        if getattr(self, "_step_fn", None) is not None:
            return self._step_fn
        t = self._tbl()
        ax = self.axis_name
        nparts = self.nparts
        spec = P(self.axis_name)

        def tree_spec(x):
            return jax.tree_util.tree_map(lambda _: spec, x)

        state_spec = {k: spec for k in state_treedef_keys}

        @partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(tree_spec(t), state_spec, P()),
            out_specs=state_spec,
        )
        def run(tl, st, dt):
            tl = jax.tree_util.tree_map(lambda a: a[0], tl)
            st = {k: v[0] for k, v in st.items()}
            out = _sharded_rk3(tl, st, dt, ax, nparts)
            return {k: v[None] for k, v in out.items()}

        self._step_fn = jax.jit(run)
        return self._step_fn

    def step(self, state, dt: float):
        fn = self._compiled_step(tuple(state.keys()))
        return fn(self._tbl(), state, jnp.asarray(dt, self.dtype))


def _exchange_row_halos(f, ax, nparts):
    """(nlev, ny_loc, nxw) -> (nlev, ny_loc+2, nxw) with neighbour rows."""
    down = [(p, p + 1) for p in range(nparts - 1)]  # towards south shard
    up = [(p, p - 1) for p in range(1, nparts)]
    from_north = jax.lax.ppermute(f[:, -1:], ax, down)  # my north halo row
    from_south = jax.lax.ppermute(f[:, :1], ax, up)
    return jnp.concatenate([from_north, f, from_south], axis=1)


def _apply_xhalo(tl, f_ext):
    rows = tl["xhalo_rows"]
    return f_ext.at[:, rows, tl["xhalo_dst"]].set(f_ext[:, rows, tl["xhalo_src"]])


def _sharded_tendencies(tl, st, ax, nparts):
    ext = {k: _apply_xhalo(tl, _exchange_row_halos(v, ax, nparts)) for k, v in st.items()}
    tend = _swe_tendencies(tl, ext)
    return {k: v[:, 1:-1] for k, v in tend.items()}


def _sharded_rk3(tl, st, dt, ax, nparts):
    def euler(s):
        k = _sharded_tendencies(tl, s, ax, nparts)
        return {n: s[n] + dt * k[n] for n in s}

    one = jnp.asarray(1.0, dt.dtype)
    s1 = euler(st)
    s2 = {n: 0.75 * st[n] + 0.25 * euler(s1)[n] for n in st}
    s3 = {n: st[n] / 3 + 2 * euler(s2)[n] / 3 for n in st}
    return s3

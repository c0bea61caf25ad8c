"""Band-sharded shift-structured fvm gradient: the serial Pallas fast path
under shard_map (VERDICT r4 ask #6a).

The general ShardedFvm (parallel/sharded.py) runs mesh gathers + segment
sums for ANY partitioner — the right tool for unstructured meshes. On
structured grids the serial fast path is the shift-structured Pallas
gradient (fvm/pallas_kernels.py); this class runs THAT kernel per
latitude band, mirroring the flagship SWE sharding (model/sharded_swe.py):

  * point-balanced row bands (partition/simple.balanced_row_starts);
  * per-shard slices of the SAME packed stencil tables, one run covering
    all keys (inactive keys carry zero weights — exact no-ops);
  * ppermute of the two boundary rows ahead of the interior kernel;
  * boundary output rows recomputed by re-running the same kernel on an
    8-row window, so gather(sharded) == serial Pallas BIT-FOR-BIT on any
    nparts (reference guarantee: atlas-benchmark.cc:25-28).

Reference behavior: the identical serial/distributed hot loop of
numerics/fvm/Nabla.cc:96-188 under atlas's domain decomposition.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fvm.pallas_kernels import LI, TJ, PallasGradient, gradient_pallas
from ..fvm.structured import StructuredFvm
from ..partition.simple import balanced_row_starts


class ShardedStructuredFvm:
    def __init__(self, grid, nparts: int, dtype=jnp.float32,
                 mesh: Mesh | None = None, axis_name: str = "bands",
                 use_cache: bool = True):
        self.grid = grid
        self.nparts = int(nparts)
        self.axis_name = axis_name
        self.dtype = jnp.dtype(dtype)
        self.sfvm = StructuredFvm(grid, use_cache=use_cache)
        self.serial = PallasGradient(self.sfvm, dtype=dtype)
        s = self.sfvm.shifts
        self.ny, self.nxw = s.ny, s.nxw
        self.nxw_pad = -(-s.nxw // 128) * 128

        self.starts = balanced_row_starts(grid.nx, self.nparts, min_rows=2)
        self.nyl = (self.starts[1:] - self.starts[:-1]).astype(np.int32)
        nyl_max = int(self.nyl.max())
        self.ny_blk = -(-nyl_max // TJ) * TJ
        self._build_tables()

        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[: self.nparts]), (axis_name,))
        self.mesh = mesh
        self._sharding = NamedSharding(mesh, P(axis_name))
        self._tables_dev = None

    # ------------------------------------------------------------------ setup
    def _build_tables(self):
        s = self.sfvm.shifts
        ny, nxw, nxw_pad = self.ny, self.nxw, self.nxw_pad
        nparts, ny_blk = self.nparts, self.ny_blk
        # the serial kernel's item list and order — bit parity requires the
        # identical accumulation order per row
        keys = self.serial.keys
        nk = len(keys)
        SxG = np.asarray(self.serial.Sx)  # (nk, ny_pad, nxw_pad) final dtype
        SyG = np.asarray(self.serial.Sy)
        GG = np.asarray(self.serial.G)

        # boundary window = ONE row tile of the kernel: 6 meaningful rows
        # [halo_n, own0, own1, own_l-1, own_l, halo_s] + TJ-6 zero rows
        # (TJ is env-overridable; the window padding must follow it)
        assert TJ >= 6, "gradient row tile must cover the 6-row window"
        self.tjs_w = TJ
        Sx = np.zeros((nparts, nk, ny_blk, nxw_pad), SxG.dtype)
        Sy = np.zeros_like(Sx)
        G = np.zeros((nparts, 2, ny_blk, nxw_pad), GG.dtype)
        SxW = np.zeros((nparts, nk, TJ, nxw_pad), SxG.dtype)
        SyW = np.zeros_like(SxW)
        GW = np.zeros((nparts, 2, TJ, nxw_pad), GG.dtype)
        for p in range(nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            n = hi - lo
            Sx[p, :, :n] = SxG[:, lo:hi]
            Sy[p, :, :n] = SyG[:, lo:hi]
            G[p, :, :n] = GG[:, lo:hi]
            rows = np.clip([lo - 1, lo, lo + 1, hi - 2, hi - 1, hi],
                           0, ny - 1)
            SxW[p, :, :6] = SxG[:, rows]
            SyW[p, :, :6] = SyG[:, rows]
            GW[p, :, :6] = GG[:, rows]

        # per-shard periodic ghost-column fills on owned rows
        hr, hd, hs = s.halo_rows, s.halo_dst, s.halo_src
        per = []
        for p in range(nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            sel = np.flatnonzero((hr >= lo) & (hr < hi))
            per.append((hr[sel] - lo, hd[sel], hs[sel]))
        wmax = max(max(len(x[0]) for x in per), 1)
        Lcol = int(s.L)
        rows_l = np.zeros((nparts, wmax), np.int32)
        dst_l = np.full((nparts, wmax), Lcol, np.int32)
        src_l = np.full((nparts, wmax), Lcol, np.int32)
        for p, (r_, d_, s_) in enumerate(per):
            rows_l[p, : len(r_)] = r_
            dst_l[p, : len(d_)] = d_
            src_l[p, : len(s_)] = s_

        self.keys = keys
        self.nk = nk
        self._tables_host = {
            "Sx": Sx, "Sy": Sy, "G": G,
            "SxW": SxW, "SyW": SyW, "GW": GW,
            "xhalo_rows": rows_l, "xhalo_dst": dst_l, "xhalo_src": src_l,
            "nyl": self.nyl.reshape(nparts, 1),
        }

    def _tbl(self):
        if self._tables_dev is None:
            self._tables_dev = jax.tree_util.tree_map(
                lambda v: jax.device_put(jnp.asarray(v), self._sharding),
                self._tables_host)
        return self._tables_dev

    # ------------------------------------------------------------- field i/o
    def scatter_field(self, f):
        """(npts[, nlev]) grid order -> sharded (nparts, lo, ny_blk, LI,
        nxw_pad) tiled blocks (ghost columns unfilled)."""
        f = np.asarray(f)
        if f.ndim == 1:
            f = f[:, None]
        nlev = f.shape[1]
        s = self.sfvm.shifts
        lo_t = -(-nlev // LI)
        fl = np.zeros((nlev, self.ny, self.nxw), f.dtype)
        fl[:, s.row_of_point, s.col_of_point] = f.T[:, : self.grid.size]
        out = np.zeros((self.nparts, lo_t, self.ny_blk, LI, self.nxw_pad),
                       f.dtype)
        for p in range(self.nparts):
            lo, hi = self.starts[p], self.starts[p + 1]
            blk = np.zeros((lo_t * LI, hi - lo, self.nxw), f.dtype)
            blk[:nlev] = fl[:, lo:hi]
            out[p, :, : hi - lo, :, : self.nxw] = np.transpose(
                blk.reshape(lo_t, LI, hi - lo, self.nxw), (0, 2, 1, 3))
        self._nlev = nlev
        return jax.device_put(jnp.asarray(out, self.dtype), self._sharding)

    def gather_grad(self, gxy):
        """Sharded (gx, gy) -> (npts, nlev, 2) grid order."""
        s = self.sfvm.shifts
        nlev = self._nlev
        out = np.zeros((self.grid.size, nlev, 2))
        for ci, g in enumerate(gxy):
            g = np.asarray(g)
            for p in range(self.nparts):
                lo, hi = self.starts[p], self.starts[p + 1]
                blk = np.transpose(g[p, :, : hi - lo], (0, 2, 1, 3)).reshape(
                    -1, hi - lo, self.nxw_pad)[:nlev, :, : self.nxw]
                sel = (s.row_of_point >= lo) & (s.row_of_point < hi)
                out[sel, :, ci] = blk[:, s.row_of_point[sel] - lo,
                                      s.col_of_point[sel]].T
        return out

    # --------------------------------------------------------------- gradient
    def gradient(self, ft_sharded):
        """Sharded tiled field -> (gx, gy) sharded tiled gradients."""
        t = self._tbl()
        ax = self.axis_name
        nparts = self.nparts
        nk, keys = self.nk, self.keys
        ny_blk = self.ny_blk
        interpret = jax.default_backend() not in ("tpu", "axon")
        runs = ((0, ny_blk // TJ, tuple(range(nk))),)
        runs_w = ((0, 1, tuple(range(nk))),)
        spec = P(ax)

        @partial(jax.shard_map, mesh=self.mesh,
                 in_specs=(jax.tree_util.tree_map(lambda _: spec, t), spec),
                 out_specs=(spec, spec), check_vma=False)
        def run(tl, ft):
            tl = jax.tree_util.tree_map(lambda a: a[0], tl)
            ft = ft[0]  # (lo, ny_blk, LI, nxw_pad)
            nyl = tl["nyl"][0]
            # periodic ghost columns on owned rows
            rows = tl["xhalo_rows"]
            ft = ft.at[:, rows, :, tl["xhalo_dst"]].set(
                ft[:, rows, :, tl["xhalo_src"]])
            # boundary-row exchange (one ppermute per direction)
            north = ft[:, 0]
            south = jax.lax.dynamic_slice_in_dim(ft, nyl - 1, 1, 1)[:, 0]
            halo_n = jax.lax.ppermute(
                south, ax, [(p, p + 1) for p in range(nparts - 1)])
            halo_s = jax.lax.ppermute(
                north, ax, [(p, p - 1) for p in range(1, nparts)])

            gx, gy = gradient_pallas(runs, keys, tl["Sx"], tl["Sy"],
                                     tl["G"], ft, interpret=interpret)

            # boundary rows: same kernel on a one-tile (TJ-row) window
            first2 = ft[:, 0:2]
            last2 = jax.lax.dynamic_slice_in_dim(ft, nyl - 2, 2, 1)
            zpad = jnp.zeros(
                (ft.shape[0], TJ - 6) + ft.shape[2:], ft.dtype)
            win = jnp.concatenate(
                [halo_n[:, None], first2, last2, halo_s[:, None], zpad],
                axis=1)  # (lo, TJ, LI, nxw_pad)
            wx, wy = gradient_pallas(runs_w, keys, tl["SxW"], tl["SyW"],
                                     tl["GW"], win, interpret=interpret)
            out = []
            for g, w in ((gx, wx), (gy, wy)):
                g = g.at[:, 0].set(w[:, 1])
                g = jax.lax.dynamic_update_slice_in_dim(
                    g, w[:, 4][:, None], nyl - 1, 1)
                out.append(g[None])
            return tuple(out)

        return run(t, ft_sharded)

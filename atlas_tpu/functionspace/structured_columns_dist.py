"""Distributed StructuredColumns: owned box + per-row halo-k bounds.

Reference behavior: atlas functionspace/detail/StructuredColumns_setup.cc:
88-470 — each rank derives from (grid, distribution, halo) its owned region
(j_begin_/j_end_, per-row i_begin_(j)/i_end_(j)), extends it by `halo` rows
and columns (periodic in x, clamped at the poles), and builds partition /
global_index / remote_index fields for the halo points; remote indices are
resolved against the owning rank's own layout
(StructuredColumns_create_remote_index.cc:43-120).

TPU design: a single controller computes every part's box (vectorized over
rows), pads all parts to one static (rows_loc, cols_loc) local box so fields
shard as (nparts, nloc) blocks over a jax device Mesh axis, and compiles the
halo exchange into a static edge-colored ppermute schedule
(parallel/halo.py). The per-row halo bounds follow the reference rule: for
halo row j', the needed i-range is the union over owned rows j within
|j - j'| <= halo of the owned x-extent mapped to row j' resolution, widened
by `halo` columns (periodic wrap through global-index modulo).
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ..parallel.halo import build_halo_schedule, apply_schedule
from .base import FunctionSpace


class DistributedStructuredColumns(FunctionSpace):
    """halo-k structured function space over an explicit distribution.

    Fields are (nparts, nloc, ...) blocks; nloc = rows_loc * cols_loc + 1
    (one dummy row for padded scatter slots). Points outside a part's ragged
    halo box are invalid (mask 0, global_index -1).
    """

    def __init__(self, grid, distribution=None, halo: int = 1,
                 nb_parts: int | None = None, partitioner: str = "equal_bands",
                 levels: int | None = None):
        from ..partition.distribution import Distribution

        if distribution is None:
            distribution = Distribution(grid, partitioner, nb_parts=nb_parts)
        self.grid = grid
        self.distribution = distribution
        self.halo = int(halo)
        self.levels = levels
        self.nparts = distribution.nb_parts
        self._build()

    # ------------------------------------------------------------------ setup
    def _build(self):
        grid = self.grid
        h = self.halo
        nparts = self.nparts
        ny = grid.ny
        nx = np.asarray(grid.nx, dtype=np.int64)
        xmin = np.asarray(grid.xmin, dtype=np.float64)
        dx = np.asarray(grid.dx, dtype=np.float64)
        part = self.distribution.partition
        ig, jg = grid.ij()

        # --- owned per-row spans (vectorized over points) -------------------
        # i_begin/i_end: (nparts, ny); rows with no owned points get [0, 0)
        key = part.astype(np.int64) * ny + jg
        order = np.argsort(key, kind="stable")
        ks = key[order]
        iss = ig[order]
        uniq, start = np.unique(ks, return_index=True)
        end = np.r_[start[1:], len(ks)]
        i_begin = np.zeros((nparts, ny), np.int64)
        i_end = np.zeros((nparts, ny), np.int64)
        up = (uniq // ny).astype(np.int64)
        uj = (uniq % ny).astype(np.int64)
        i_begin[up, uj] = iss[start]
        i_end[up, uj] = iss[end - 1] + 1
        # contiguity check (reference assumes row-contiguous ownership)
        counts = end - start
        if not np.array_equal(counts, i_end[up, uj] - i_begin[up, uj]):
            raise ValueError(
                "distribution is not row-contiguous; DistributedStructured"
                "Columns requires bands/checkerboard-like partitions"
            )
        owned_rows = i_end > i_begin  # (nparts, ny)
        self.j_begin = np.where(owned_rows.any(1), owned_rows.argmax(1), 0)
        self.j_end = np.where(
            owned_rows.any(1), ny - owned_rows[:, ::-1].argmax(1), 0
        )
        self.i_begin, self.i_end = i_begin, i_end

        # --- halo box per part ----------------------------------------------
        # halo row range (clamped at poles, reference clamps too)
        jb_h = np.maximum(self.j_begin - h, 0)
        je_h = np.minimum(self.j_end + h, ny)

        # per (part, row) halo i-range: union over owned source rows within
        # distance h of the owned x-extent mapped to this row, +- h columns
        ilo = np.full((nparts, ny), np.iinfo(np.int64).max, np.int64)
        ihi = np.full((nparts, ny), np.iinfo(np.int64).min, np.int64)
        for dj in range(-h, h + 1):
            # source row j = target row j' + dj (valid where owned)
            jprime = np.arange(ny)
            j = jprime + dj
            valid = (j >= 0) & (j < ny)
            jv = np.clip(j, 0, ny - 1)
            has = owned_rows[:, jv] & valid[None, :]  # (nparts, ny)
            x_lo = xmin[jv] + i_begin[:, jv] * dx[jv]
            x_hi = xmin[jv] + (i_end[:, jv] - 1) * dx[jv]
            lo = np.floor((x_lo - xmin[None, :]) / dx[None, :] + 0.5).astype(np.int64) - h
            hi = np.ceil((x_hi - xmin[None, :]) / dx[None, :] - 0.5).astype(np.int64) + h + 1
            ilo = np.where(has, np.minimum(ilo, lo), ilo)
            ihi = np.where(has, np.maximum(ihi, hi), ihi)
        in_box = ihi > ilo
        # full-row wrap: never carry more than nx + 2h columns
        width = np.where(in_box, ihi - ilo, 0)
        cap = nx[None, :] + 2 * h
        over = width > cap
        ihi = np.where(over, ilo + cap, ihi)
        self.ilo, self.ihi = ilo, ihi

        rows_loc = int((je_h - jb_h).max())
        cols_loc = int((ihi - ilo).max())
        self.jb_h, self.je_h = jb_h, je_h
        self.rows_loc, self.cols_loc = rows_loc, cols_loc
        nflat = rows_loc * cols_loc
        self.nloc = nflat + 1  # + dummy
        self.dummy = nflat

        # --- local point tables ---------------------------------------------
        # (nparts, rows_loc, cols_loc): global index (or -1), ghost flag
        r_idx = np.arange(rows_loc)
        c_idx = np.arange(cols_loc)
        jj = jb_h[:, None] + r_idx[None, :]  # (nparts, rows_loc)
        row_valid = jj < je_h[:, None]
        jjc = np.clip(jj, 0, ny - 1)
        ii = ilo[np.arange(nparts)[:, None], jjc][:, :, None] + c_idx[None, None, :]
        col_valid = ii < ihi[np.arange(nparts)[:, None], jjc][:, :, None]
        valid = row_valid[:, :, None] & col_valid & in_box[
            np.arange(nparts)[:, None], jjc][:, :, None]
        iw = np.mod(ii, nx[jjc][:, :, None])  # wrapped i
        # global index via row offsets
        row_off = np.concatenate([[0], np.cumsum(nx)])[:-1]
        gidx = np.where(valid, row_off[jjc][:, :, None] + iw, -1)
        own = valid & (part[np.clip(gidx, 0, grid.size - 1)] ==
                       np.arange(nparts)[:, None, None]) & (ii == iw)
        # note: periodic copies of a part's own points (ii != iw) are ghosts
        self.global_index = gidx
        self.owned_mask = own
        self.valid_mask = valid
        self.index_i = np.where(valid, ii, 0)
        self.index_j = np.where(valid, jjc[:, :, None], 0)
        self.partition = np.where(
            valid, part[np.clip(gidx, 0, grid.size - 1)], -1)

        # flat local index of global point g on its OWNER part
        owner_flat = np.full(grid.size, -1, np.int64)
        po, ro, co = np.nonzero(own)
        owner_flat[gidx[po, ro, co]] = ro * cols_loc + co
        self._owner_part_of = part
        self._owner_flat_of = owner_flat
        assert (owner_flat[part >= 0] >= 0).all(), "every point needs an owner slot"

        # remote index field (reference: remote_index = owner's local index)
        self.remote_index = np.where(
            valid, owner_flat[np.clip(gidx, 0, grid.size - 1)], -1)

        # --- halo exchange schedule ------------------------------------------
        pg, rg, cg = np.nonzero(valid & ~own)
        ghost_g = gidx[pg, rg, cg]
        self.schedule = build_halo_schedule(
            ghost_part=pg.astype(np.int64),
            ghost_local=(rg * cols_loc + cg).astype(np.int64),
            src_part=part[ghost_g].astype(np.int64),
            src_local=owner_flat[ghost_g],
            nparts=nparts,
            dummy_local=self.dummy,
        )
        self.nb_owned = own.reshape(nparts, -1).sum(1)

    # ---------------------------------------------------------------- fields
    def create_field(self, levels=None, dtype=np.float64):
        levels = levels if levels is not None else self.levels
        shape = (self.nparts, self.nloc)
        if levels:
            shape += (levels,)
        return np.zeros(shape, dtype)

    def scatter(self, f_global: np.ndarray) -> np.ndarray:
        """Grid-ordered global (size, ...) -> local blocks, owned slots only."""
        tail = f_global.shape[1:]
        out = np.zeros((self.nparts, self.nloc) + tail, f_global.dtype)
        po, ro, co = np.nonzero(self.owned_mask)
        out[po, ro * self.cols_loc + co] = f_global[
            self.global_index[po, ro, co]]
        return out

    def scatter_with_halos(self, f_global: np.ndarray) -> np.ndarray:
        """Scatter filling EVERY valid slot (host-side halo fill)."""
        tail = f_global.shape[1:]
        out = np.zeros((self.nparts, self.nloc) + tail, f_global.dtype)
        po, ro, co = np.nonzero(self.valid_mask)
        out[po, ro * self.cols_loc + co] = f_global[
            self.global_index[po, ro, co]]
        return out

    def gather(self, f_local: np.ndarray) -> np.ndarray:
        """Local blocks -> grid-ordered global array from owned slots."""
        f_local = np.asarray(f_local)
        tail = f_local.shape[2:]
        out = np.zeros((self.grid.size,) + tail, f_local.dtype)
        po, ro, co = np.nonzero(self.owned_mask)
        out[self.global_index[po, ro, co]] = f_local[
            po, ro * self.cols_loc + co]
        return out

    # ------------------------------------------------------------- exchange
    def halo_exchange(self, f_local, axis_name=None, mesh=None):
        """Fill ghost slots from owners.

        Host path (numpy in, no mesh): direct indexed copy. Device path: run
        the ppermute schedule under shard_map over `mesh` (or an implicit
        1-axis mesh over the first nparts devices).
        """
        if isinstance(f_local, np.ndarray):
            pg, rg, cg = np.nonzero(self.valid_mask & ~self.owned_mask)
            g = self.global_index[pg, rg, cg]
            src_p = self._owner_part_of[g]
            src_l = self._owner_flat_of[g]
            out = f_local.copy()
            out[pg, rg * self.cols_loc + cg] = f_local[src_p, src_l]
            return out
        return self._device_halo_exchange(f_local, axis_name, mesh)

    def _device_halo_exchange(self, f_local, axis_name, mesh):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        ax = axis_name or "sc"
        if mesh is None:
            devices = np.array(jax.devices()[: self.nparts])
            mesh = Mesh(devices, (ax,))
        sched = self.schedule

        @partial(jax.shard_map, mesh=mesh, in_specs=P(ax), out_specs=P(ax))
        def run(f):
            return apply_schedule(sched, f[0], ax)[None]

        return run(f_local)

    def checksum(self, f_local) -> str:
        from ..parallel.checksum import checksum

        return checksum(self.gather(np.asarray(f_local)))

    def __repr__(self):
        return (
            f"DistributedStructuredColumns({self.grid.name!r}, "
            f"nparts={self.nparts}, halo={self.halo}, "
            f"box={self.rows_loc}x{self.cols_loc})"
        )

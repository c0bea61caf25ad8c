"""GatherScatter, Collect and Locate.

Reference behavior:
 - parallel/GatherScatter.h:96-185 — local<->global field redistribution
   keyed by (partition, remote_index, global_index) descriptors; gather
   assembles the global field in global-index order from owned points,
   scatter is the inverse broadcast.
 - parallel/Collect.h:24-33 — fetch arbitrary remote elements given
   (partition, remote_index) request lists.
 - parallel/Locate.h / functionspace/Locate.h:43-63 — map global indices to
   (partition, remote index).

TPU design: the single-controller path is pure vectorized indexing over the
padded per-part layout (parts, max_pts); the in-jit path runs inside
shard_map, where gather = all_gather + static permutation and collect rides
the same edge-colored ppermute machinery as the halo exchange
(parallel/halo.py). No per-point Python in either path.
"""

from __future__ import annotations

import numpy as np


class GatherScatter:
    """Global gather/scatter for a padded sharded layout.

    loc_global_index: (nparts, max_loc) int64 — global index of each local
    slot, -1 for padding/ghost slots that do not own their point. Every
    global index in [0, glb_size) must be owned by exactly one slot.
    """

    def __init__(self, loc_global_index: np.ndarray, glb_size: int):
        gidx = np.asarray(loc_global_index, dtype=np.int64)
        self.nparts, self.max_loc = gidx.shape
        self.glb_size = int(glb_size)
        flat = gidx.ravel()
        owned = np.flatnonzero(flat >= 0)
        g = flat[owned]
        if len(g) != self.glb_size or len(np.unique(g)) != self.glb_size:
            raise ValueError(
                f"ownership must cover each of {self.glb_size} global points exactly "
                f"once (got {len(g)} owned slots, {len(np.unique(g))} unique)"
            )
        # glb -> flat local slot
        self._src_of_glb = np.empty(self.glb_size, dtype=np.int64)
        self._src_of_glb[g] = owned
        self._owned_flat = owned
        self._owned_glb = g

    # -- host (single-controller) path -------------------------------------
    def gather(self, loc):
        """loc: (nparts, max_loc, ...) -> (glb_size, ...) in global order."""
        loc = np.asarray(loc)
        flat = loc.reshape((self.nparts * self.max_loc,) + loc.shape[2:])
        return flat[self._src_of_glb]

    def scatter(self, glb):
        """glb: (glb_size, ...) -> (nparts, max_loc, ...); padding slots zero."""
        glb = np.asarray(glb)
        flat = np.zeros((self.nparts * self.max_loc,) + glb.shape[1:], glb.dtype)
        flat[self._owned_flat] = glb[self._owned_glb]
        return flat.reshape((self.nparts, self.max_loc) + glb.shape[1:])

    # -- in-jit path (call inside shard_map over the parts axis) -----------
    def gather_jit(self, f_loc, axis_name: str):
        """f_loc: (max_loc, ...) per shard -> replicated (glb_size, ...)."""
        import jax
        import jax.numpy as jnp

        allv = jax.lax.all_gather(f_loc, axis_name)  # (nparts, max_loc, ...)
        flat = allv.reshape((self.nparts * self.max_loc,) + f_loc.shape[1:])
        return flat[jnp.asarray(self._src_of_glb)]

    def scatter_jit(self, f_glb, axis_name: str):
        """replicated (glb_size, ...) -> per-shard (max_loc, ...)."""
        import jax
        import jax.numpy as jnp

        me = jax.lax.axis_index(axis_name)
        gidx_row = jnp.asarray(
            np.where(
                self._loc_gidx_padded() < 0, 0, self._loc_gidx_padded()
            )
        )[me]
        mask_row = jnp.asarray(self._loc_gidx_padded() >= 0)[me]
        vals = f_glb[gidx_row]
        mshape = mask_row.shape + (1,) * (f_glb.ndim - 1)
        return jnp.where(mask_row.reshape(mshape), vals, 0)

    def _loc_gidx_padded(self):
        out = np.full((self.nparts, self.max_loc), -1, dtype=np.int64)
        out.ravel()[self._owned_flat] = self._owned_glb
        return out


class Locate:
    """Global index -> (partition, remote/local index).

    Built from the same per-slot global-index table as GatherScatter
    (reference functionspace/Locate.h resolves via the distribution).
    """

    def __init__(self, loc_global_index: np.ndarray, glb_size: int):
        gidx = np.asarray(loc_global_index, dtype=np.int64)
        nparts, max_loc = gidx.shape
        self.part = np.full(glb_size, -1, dtype=np.int32)
        self.local = np.full(glb_size, -1, dtype=np.int64)
        p, l = np.nonzero(gidx >= 0)
        g = gidx[p, l]
        self.part[g] = p
        self.local[g] = l

    def __call__(self, global_indices):
        g = np.asarray(global_indices, dtype=np.int64)
        return self.part[g], self.local[g]


class Collect:
    """Fetch arbitrary remote elements: request[i] = (part[i], local[i]).

    Host path is direct indexing; the in-jit path builds a padded ppermute
    schedule once (same machinery as HaloSchedule) so collects compile into
    static collectives (reference parallel/Collect.h is the MPI analog).
    """

    def __init__(
        self,
        req_part: np.ndarray,
        req_local: np.ndarray,
        my_part: np.ndarray,
        nparts: int,
        max_loc: int,
    ):
        """req_part/req_local: flat request lists; my_part: requesting part
        per request. Results are returned per requesting part, padded."""
        from .halo import build_halo_schedule

        self.req_part = np.asarray(req_part, dtype=np.int32)
        self.req_local = np.asarray(req_local, dtype=np.int64)
        self.my_part = np.asarray(my_part, dtype=np.int32)
        self.nparts = int(nparts)
        self.max_loc = int(max_loc)
        counts = np.bincount(self.my_part, minlength=nparts)
        self.n_req = counts
        self.width = max(int(counts.max()) if counts.size else 0, 1)
        # result slot per request, per requesting part
        order = np.argsort(self.my_part, kind="stable")
        slot = np.empty(len(self.my_part), dtype=np.int64)
        pos = np.concatenate([[0], np.cumsum(counts)])
        for p in range(nparts):
            sel = order[pos[p] : pos[p + 1]]
            slot[sel] = np.arange(len(sel))
        self.slot = slot
        # schedule writes into a (width + 1) result buffer; last row = dummy
        self.sched = build_halo_schedule(
            ghost_part=self.my_part,
            ghost_local=slot,
            src_part=self.req_part,
            src_local=self.req_local,
            nparts=nparts,
            dummy_local=self.width,
        )

    def host(self, loc):
        """loc: (nparts, max_loc, ...) -> flat (n_requests, ...) results."""
        loc = np.asarray(loc)
        return loc[self.req_part, self.req_local]

    def jit(self, f_loc, axis_name: str):
        """f_loc: (max_loc, ...) per shard -> (width, ...) results per shard
        (rows beyond n_req[me] are padding)."""
        import jax.numpy as jnp

        out = jnp.zeros((self.width + 1,) + f_loc.shape[1:], f_loc.dtype)
        # the schedule's send maps index into the SOURCE field, its recv maps
        # into the result buffer; replicate apply() with two different arrays
        import jax

        me = jax.lax.axis_index(axis_name)
        lsrc = jnp.asarray(self.sched.local_src)
        ldst = jnp.asarray(self.sched.local_dst)
        out = out.at[ldst[me]].set(f_loc[lsrc[me]], mode="drop")
        for r in range(self.sched.n_rounds):
            send_idx = jnp.asarray(self.sched.send_idx[r])
            recv_idx = jnp.asarray(self.sched.recv_idx[r])
            buf = f_loc[send_idx[me]]
            buf = jax.lax.ppermute(buf, axis_name, self.sched.perm[r])
            out = out.at[recv_idx[me]].set(buf, mode="drop")
        return out[: self.width]

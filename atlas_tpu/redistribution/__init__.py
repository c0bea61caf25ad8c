"""Redistribution: same grid, different distribution -> reshuffle.

Reference behavior: atlas redistribution/detail/RedistributeGeneric.h (any
function-space pair via global-index matching) and the fast
RedistributeStructuredColumns path.

TPU design: with the single-controller model a redistribution between two
Distributions of the same grid is a static permutation between the two
(nparts, nown_max) shard layouts; over a device mesh it is an all_to_all —
expressed here as gather/scatter index products usable inside jit.
"""

from __future__ import annotations

import numpy as np


class Redistribution:
    def __init__(self, grid, dist_a, dist_b):
        assert len(dist_a.partition) == grid.size == len(dist_b.partition)
        self.grid = grid
        self.dist_a = dist_a
        self.dist_b = dist_b
        # shard layouts: global index lists per part
        self.idx_a = [dist_a.global_indices(p) for p in range(dist_a.nb_parts)]
        self.idx_b = [dist_b.global_indices(p) for p in range(dist_b.nb_parts)]
        self.nmax_a = max(len(x) for x in self.idx_a)
        self.nmax_b = max(len(x) for x in self.idx_b)

    def a_to_global(self, blocks: np.ndarray) -> np.ndarray:
        tail = blocks.shape[2:]
        out = np.zeros((self.grid.size,) + tail, blocks.dtype)
        for p, idx in enumerate(self.idx_a):
            out[idx] = blocks[p, : len(idx)]
        return out

    def global_to_b(self, flat: np.ndarray) -> np.ndarray:
        tail = flat.shape[1:]
        out = np.zeros((len(self.idx_b), self.nmax_b) + tail, flat.dtype)
        for p, idx in enumerate(self.idx_b):
            out[p, : len(idx)] = flat[idx]
        return out

    def execute(self, blocks_a: np.ndarray) -> np.ndarray:
        """(nparts_a, nmax_a, ...) -> (nparts_b, nmax_b, ...)."""
        return self.global_to_b(self.a_to_global(np.asarray(blocks_a)))


class ShardedRedistribution:
    """Device-resident redistribution over a 1-D jax device mesh.

    The host Redistribution above stages through a global array; this one
    keeps the field on the mesh: a precomputed (dest, slot) routing table
    turns the reshuffle into one `lax.all_to_all` plus static gathers —
    the TPU equivalent of the reference's point-to-point
    RedistributeStructuredColumns/Generic exchanges.

    Blocks are (nparts, nmax, ...) with each partition's points in
    Distribution.global_indices order, sharded on axis 0.
    """

    AXIS = "rd"

    def __init__(self, grid, dist_a, dist_b, mesh=None):
        import jax
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        assert dist_a.nb_parts == dist_b.nb_parts, (
            "sharded redistribution needs equal part counts (one per device)")
        np_ = dist_a.nb_parts
        if mesh is None:
            mesh = Mesh(np.array(jax.devices()[:np_]), (self.AXIS,))
        self.mesh = mesh
        self.nparts = np_

        idx_a = [dist_a.global_indices(p) for p in range(np_)]
        idx_b = [dist_b.global_indices(p) for p in range(np_)]
        self.nmax_a = max(len(x) for x in idx_a)
        self.nmax_b = max(len(x) for x in idx_b)

        # position of each global point inside its a-block / b-block
        pos_a = np.empty(grid.size, np.int64)
        part_a = np.empty(grid.size, np.int64)
        for p, idx in enumerate(idx_a):
            pos_a[idx] = np.arange(len(idx))
            part_a[idx] = p
        # per (source p, dest q) transfer lists
        kmax = 0
        send_lists = [[None] * np_ for _ in range(np_)]
        recv_lists = [[None] * np_ for _ in range(np_)]
        for q, idx in enumerate(idx_b):
            src = part_a[idx]
            for p in range(np_):
                sel = np.flatnonzero(src == p)
                send_lists[p][q] = pos_a[idx[sel]]   # slots in p's a-block
                recv_lists[q][p] = sel               # slots in q's b-block
                kmax = max(kmax, len(sel))
        self.kmax = kmax

        send_idx = np.zeros((np_, np_, kmax), np.int32)
        send_msk = np.zeros((np_, np_, kmax), np.float64)
        recv_idx = np.zeros((np_, np_, kmax), np.int32)
        for p in range(np_):
            for q in range(np_):
                s = send_lists[p][q]
                send_idx[p, q, : len(s)] = s
                send_msk[p, q, : len(s)] = 1.0
                r = recv_lists[p][q]
                recv_idx[p, q, : len(r)] = r

        sh = NamedSharding(mesh, P(self.AXIS))
        self._send_idx = jax.device_put(send_idx, sh)
        self._send_msk = jax.device_put(send_msk, sh)
        self._recv_idx = jax.device_put(recv_idx, sh)
        self._P = P
        self._build()

    def _build(self):
        import jax
        import jax.numpy as jnp

        ax = self.AXIS
        np_ = self.nparts
        nmax_b = self.nmax_b
        P = self._P

        def kernel(blk, send_idx, send_msk, recv_idx):
            # blk: (1, nmax_a, ...); indices (1, np_, kmax)
            blk, send_idx, recv_idx = blk[0], send_idx[0], recv_idx[0]
            msk = send_msk[0]
            send = blk[send_idx]                       # (np_, kmax, ...)
            send = send * msk.reshape(msk.shape + (1,) * (send.ndim - 2))
            recv = jax.lax.all_to_all(send, ax, split_axis=0, concat_axis=0)
            recv = recv.reshape((np_, -1) + recv.shape[2:])
            out = jnp.zeros((1, nmax_b) + blk.shape[1:], blk.dtype)
            return out.at[0, recv_idx.reshape(-1)].add(
                recv.reshape((-1,) + recv.shape[2:]))

        self._exec = jax.jit(jax.shard_map(
            kernel, mesh=self.mesh,
            in_specs=(P(ax), P(ax), P(ax), P(ax)),
            out_specs=P(ax),
        ))

    def execute(self, blocks_a):
        """(nparts, nmax_a, ...) sharded blocks -> (nparts, nmax_b, ...)."""
        return self._exec(blocks_a, self._send_idx, self._send_msk,
                          self._recv_idx)

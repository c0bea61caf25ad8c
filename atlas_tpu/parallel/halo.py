"""Static halo-exchange schedules over a jax device mesh.

Reference behavior: atlas parallel/HaloExchange.h — setup once from
(partition, remote_index) per ghost point, producing send/recv gather maps;
execute packs buffers, posts nonblocking sends/receives, unpacks.

TPU-native design (SURVEY.md sections 2.6, 7): communication becomes a STATIC
schedule of `jax.lax.ppermute` rounds compiled into the program. The directed
part-to-part transfer graph is edge-colored into rounds; in each round every
device sends at most one padded buffer and receives at most one. Pack/unpack
are gathers/scatters with precomputed padded index arrays (a dummy slot
absorbs padding writes). Everything is shape-static, jit/shard_map friendly,
and rides the ICI when parts map to a TPU mesh axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


def build_rounds(pairs: List[Tuple[int, int]]) -> List[List[Tuple[int, int]]]:
    """Greedy edge-coloring of directed (src, dst) pairs into permutation rounds.

    Each round has distinct sources and distinct destinations so it is a valid
    (partial) permutation for collective_permute.
    """
    remaining = list(dict.fromkeys(pairs))  # stable unique
    rounds = []
    while remaining:
        srcs = set()
        dsts = set()
        this_round = []
        rest = []
        for s, d in remaining:
            if s not in srcs and d not in dsts:
                this_round.append((s, d))
                srcs.add(s)
                dsts.add(d)
            else:
                rest.append((s, d))
        rounds.append(this_round)
        remaining = rest
    return rounds


@dataclass
class HaloSchedule:
    """Per-round padded pack/unpack maps for nparts shards.

    For round r:
      perm[r]               list of (src, dst) shard pairs
      send_idx[r]           (nparts, width_r) int32 local indices to pack
                            (padded with 0; padded slots are never unpacked)
      recv_idx[r]           (nparts, width_r) int32 local indices to write
                            (padded with `dummy` = the shard's scratch row)
    """

    nparts: int
    dummy: int  # local index of the padding row
    perm: List[List[Tuple[int, int]]]
    send_idx: List[np.ndarray]
    recv_idx: List[np.ndarray]

    @property
    def n_rounds(self) -> int:
        return len(self.perm)

    def apply(self, f_loc, axis_name: str):
        """Fill ghost rows of the local block. Call inside shard_map.

        f_loc: (nloc, ...) local block including the dummy row at index
        self.dummy. Returns f_loc with ghost rows filled from their owners.
        """
        import jax
        import jax.numpy as jnp

        for r in range(self.n_rounds):
            send_idx = jnp.asarray(self.send_idx[r])  # (nparts, w)
            recv_idx = jnp.asarray(self.recv_idx[r])
            me = jax.lax.axis_index(axis_name)
            buf = f_loc[send_idx[me]]  # (w, ...)
            buf = jax.lax.ppermute(buf, axis_name, self.perm[r])
            f_loc = f_loc.at[recv_idx[me]].set(buf, mode="drop")
        return f_loc


def build_halo_schedule(
    ghost_part: np.ndarray,
    ghost_local: np.ndarray,
    src_part: np.ndarray,
    src_local: np.ndarray,
    nparts: int,
    dummy_local: int,
) -> HaloSchedule:
    """Build the schedule from flat ghost descriptors.

    ghost_part[i], ghost_local[i]: where ghost i lives (shard, local row)
    src_part[i], src_local[i]:     where its owner value lives
    """
    pair_key = src_part.astype(np.int64) * nparts + ghost_part.astype(np.int64)
    pairs = [(int(k // nparts), int(k % nparts)) for k in np.unique(pair_key)]
    pairs = [(s, d) for s, d in pairs if s != d]
    rounds = build_rounds(pairs)

    # intra-shard ghosts (periodic copies on the same part) are handled as a
    # round-0 local copy fold: treat them as a separate local gather map
    local_mask = src_part == ghost_part
    local_src = src_local[local_mask]
    local_dst = ghost_local[local_mask]
    local_sp = ghost_part[local_mask]

    perm_list = []
    send_list = []
    recv_list = []
    for rnd in rounds:
        width = 0
        sel_per_pair = {}
        for s, d in rnd:
            sel = np.flatnonzero((src_part == s) & (ghost_part == d))
            sel_per_pair[(s, d)] = sel
            width = max(width, len(sel))
        width = max(width, 1)
        send_idx = np.zeros((nparts, width), dtype=np.int32)
        recv_idx = np.full((nparts, width), dummy_local, dtype=np.int32)
        for (s, d), sel in sel_per_pair.items():
            send_idx[s, : len(sel)] = src_local[sel]
            recv_idx[d, : len(sel)] = ghost_local[sel]
        perm_list.append(rnd)
        send_list.append(send_idx)
        recv_list.append(recv_idx)

    sched = HaloSchedule(
        nparts=nparts,
        dummy=dummy_local,
        perm=perm_list,
        send_idx=send_list,
        recv_idx=recv_list,
    )
    # attach local-copy maps (same-shard periodic ghosts), padded per shard
    counts = np.bincount(local_sp, minlength=nparts)
    width = max(int(counts.max()) if len(local_sp) else 0, 1)
    lsrc = np.zeros((nparts, width), dtype=np.int32)
    ldst = np.full((nparts, width), dummy_local, dtype=np.int32)
    order = np.argsort(local_sp, kind="stable")
    pos = np.concatenate([[0], np.cumsum(counts)])
    for p in range(nparts):
        sel = order[pos[p] : pos[p + 1]]
        lsrc[p, : len(sel)] = local_src[sel]
        ldst[p, : len(sel)] = local_dst[sel]
    sched.local_src = lsrc
    sched.local_dst = ldst
    return sched


def apply_schedule(sched: HaloSchedule, f_loc, axis_name: str):
    """Halo exchange inside shard_map: local periodic copies + ppermute rounds."""
    import jax
    import jax.numpy as jnp

    me = jax.lax.axis_index(axis_name)
    lsrc = jnp.asarray(sched.local_src)
    ldst = jnp.asarray(sched.local_dst)
    f_loc = f_loc.at[ldst[me]].set(f_loc[lsrc[me]], mode="drop")
    return sched.apply(f_loc, axis_name)


def apply_schedule_adjoint(sched: HaloSchedule, f_loc, axis_name: str):
    """Adjoint halo exchange inside shard_map.

    Reference behavior (parallel/HaloExchange.h:227-290 execute_adjoint): the
    transpose of "ghost <- owner copy" — every ghost value is SUMMED into its
    owner row and the ghost rows (and dummy row) are zeroed. Runs the forward
    ppermute rounds with reversed (src, dst) pairs.
    """
    import jax
    import jax.numpy as jnp

    me = jax.lax.axis_index(axis_name)
    dummy = sched.dummy

    # Ghost rows must only be consumed ONCE: snapshot them, then zero them in
    # f_loc up front so later rounds / reductions cannot double-count, and so
    # the dummy row (which padded gathers read) stays zero throughout.
    ghosts = f_loc  # snapshot of incoming values
    f_loc = f_loc.at[dummy].set(0)
    for r in range(sched.n_rounds):
        recv_idx = jnp.asarray(sched.recv_idx[r])
        f_loc = f_loc.at[recv_idx[me]].set(0)
    lsrc = jnp.asarray(sched.local_src)
    ldst = jnp.asarray(sched.local_dst)
    f_loc = f_loc.at[ldst[me]].set(0)

    ghosts = ghosts.at[dummy].set(0)  # padded gathers read zero

    # reversed ppermute rounds: gather ghost values, add into owner rows.
    # Padded send slots point at local row 0, but their ghost-side buffer
    # entries are exactly zero (they read the zeroed dummy row), so the adds
    # are no-ops.
    for r in range(sched.n_rounds):
        send_idx = jnp.asarray(sched.send_idx[r])  # forward pack map (owners)
        recv_idx = jnp.asarray(sched.recv_idx[r])  # forward unpack map (ghosts)
        rev = [(d, s) for (s, d) in sched.perm[r]]
        buf = ghosts[recv_idx[me]]
        buf = jax.lax.ppermute(buf, axis_name, rev)
        f_loc = f_loc.at[send_idx[me]].add(buf)

    # local (same-shard periodic) copies: owner += ghost; padded slots read
    # the zero dummy row and add into row 0 (no-op)
    f_loc = f_loc.at[lsrc[me]].add(ghosts[ldst[me]])
    return f_loc

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

"""Distribution: global index -> partition map (reference: atlas
grid/Distribution.h:31-70, grid/detail/distribution/*).
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config


class Distribution:
    def __init__(self, grid, partitioner=None, partition: np.ndarray | None = None, nb_parts: int | None = None):
        self.grid = grid
        if partition is None:
            from .partitioner import Partitioner

            if partitioner is None:
                partitioner = Partitioner("equal_regions", nb_parts=nb_parts or 1)
            elif isinstance(partitioner, (str, dict, Config)):
                partitioner = Partitioner(partitioner, nb_parts=nb_parts or 1)
            partition = partitioner.partition(grid)
            nb_parts = partitioner.nb_parts
        self.partition = np.asarray(partition, dtype=np.int32)
        assert len(self.partition) == grid.size
        self.nb_parts = int(nb_parts if nb_parts is not None else self.partition.max() + 1)
        self._nb_pts = np.bincount(self.partition, minlength=self.nb_parts).astype(np.int64)

    def nb_pts(self) -> np.ndarray:
        """Point count per partition."""
        return self._nb_pts

    @property
    def max_pts(self) -> int:
        return int(self._nb_pts.max())

    @property
    def min_pts(self) -> int:
        return int(self._nb_pts.min())

    def global_indices(self, part: int) -> np.ndarray:
        """Global indices owned by a partition, in grid order."""
        return np.flatnonzero(self.partition == part)

    def __getitem__(self, gidx):
        return self.partition[gidx]

    def __len__(self):
        return len(self.partition)

    def __repr__(self):
        return (
            f"Distribution(nb_parts={self.nb_parts}, min={self.min_pts}, max={self.max_pts})"
        )

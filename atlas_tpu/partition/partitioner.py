"""Partitioner base + factory (reference: atlas grid/Partitioner.h:68,
grid/detail/partitioner/*).

A Partitioner assigns every grid point to one of nb_parts partitions. On TPU
the partition becomes the static shard assignment over a jax device mesh.
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from ..util.factory import Factory

partitioner_factory = Factory("partitioner")


class Partitioner:
    """Base class. Subclasses implement partition(grid) -> int32[grid.size]."""

    type: str = "none"

    def __new__(cls, type_or_config=None, nb_parts: int | None = None, **kwargs):
        if cls is Partitioner:
            config = Config()
            if isinstance(type_or_config, str):
                config["type"] = type_or_config
            elif type_or_config is not None:
                config = Config(type_or_config)
            ptype = config.get_str("type", "equal_regions")
            if not partitioner_factory.has(ptype):
                raise KeyError(
                    f"No partitioner named {ptype!r}. Available: {partitioner_factory.keys()}"
                )
            sub_cls = partitioner_factory._builders[ptype]
            return object.__new__(sub_cls)
        return object.__new__(cls)

    def __init__(self, type_or_config=None, nb_parts: int | None = None, **kwargs):
        config = Config()
        if isinstance(type_or_config, (dict, Config)):
            config = Config(type_or_config)
        config.update(kwargs)
        if nb_parts is None:
            nb_parts = config.get_int("nb_parts", config.get_int("partitions", 1))
        self.nb_parts = int(nb_parts)
        self.config = config

    def partition(self, grid) -> np.ndarray:
        raise NotImplementedError

    def partition_distribution(self, grid):
        from .distribution import Distribution

        return Distribution(grid, partition=self.partition(grid), nb_parts=self.nb_parts)

    def __repr__(self):
        return f"{type(self).__name__}(nb_parts={self.nb_parts})"

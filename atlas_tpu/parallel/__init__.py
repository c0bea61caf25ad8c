from .halo import HaloSchedule, build_rounds
from .sharded import ShardedFvm

__all__ = ["HaloSchedule", "build_rounds", "ShardedFvm"]

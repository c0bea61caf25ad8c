from .halo import HaloSchedule, build_rounds, apply_schedule, apply_schedule_adjoint
from .gather_scatter import GatherScatter, Collect, Locate
from .sharded import ShardedFvm

__all__ = [
    "HaloSchedule",
    "build_rounds",
    "apply_schedule",
    "apply_schedule_adjoint",
    "GatherScatter",
    "Collect",
    "Locate",
    "ShardedFvm",
]

from .halo import HaloSchedule, build_rounds, apply_schedule, apply_schedule_adjoint
from .gather_scatter import GatherScatter, Collect, Locate
from .sharded import ShardedFvm
from .sharded_structured import ShardedStructuredFvm

__all__ = [
    "HaloSchedule",
    "build_rounds",
    "apply_schedule",
    "apply_schedule_adjoint",
    "GatherScatter",
    "Collect",
    "Locate",
    "ShardedFvm",
    "ShardedStructuredFvm",
]

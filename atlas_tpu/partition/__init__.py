from .partitioner import Partitioner, partitioner_factory
from .distribution import Distribution
from . import equal_regions as _equal_regions  # noqa: F401  (registers)
from . import simple as _simple  # noqa: F401  (registers)
from .matching import MatchingMeshPartitioner, MatchingPartitioner  # noqa: F401 (registers)

__all__ = ["Partitioner", "partitioner_factory", "Distribution", "MatchingMeshPartitioner", "MatchingPartitioner"]

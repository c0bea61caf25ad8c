from .interpolation import Interpolation, interpolation_factory
from .structured import StructuredInterpolation2D
from . import knn as _knn  # noqa: F401 (registers)
from . import finite_element as _fe  # noqa: F401 (registers)
from . import conservative as _cons  # noqa: F401 (registers)

__all__ = ["Interpolation", "interpolation_factory", "StructuredInterpolation2D"]

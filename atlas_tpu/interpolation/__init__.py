from .interpolation import Interpolation, MatrixCache, interpolation_factory
from .structured import StructuredInterpolation2D
from .structured3d import StructuredInterpolation3D
from .nonlinear import execute_nonlinear
from . import knn as _knn  # noqa: F401 (registers)
from . import finite_element as _fe  # noqa: F401 (registers)
from . import conservative as _cons  # noqa: F401 (registers)
from . import unstructured as _unstr  # noqa: F401 (registers)
from . import binning as _binning  # noqa: F401 (registers)
from . import spherical_vector as _sv  # noqa: F401 (registers)
from . import cubedsphere as _cs  # noqa: F401 (registers)


def assemble_global_matrix(method):
    """Gather an Interpolation method's weights into one global scipy CSR
    matrix for offline use (reference interpolation/AssembleGlobalMatrix.h)."""
    return method.matrix()


__all__ = [
    "Interpolation",
    "MatrixCache",
    "interpolation_factory",
    "StructuredInterpolation2D",
    "StructuredInterpolation3D",
    "execute_nonlinear",
    "assemble_global_matrix",
]

from .structured import StructuredGrid, reduced_gaussian
from .factory import Grid
from .gaussian import (
    gaussian_latitudes_npole_spole,
    gaussian_latitudes_npole_equator,
    gaussian_quadrature_npole_spole,
)
from .spacing import Spacing, LinearSpacing, GaussianSpacing, CustomSpacing
from .vertical import Vertical

__all__ = [
    "Grid",
    "StructuredGrid",
    "reduced_gaussian",
    "gaussian_latitudes_npole_spole",
    "gaussian_latitudes_npole_equator",
    "gaussian_quadrature_npole_spole",
    "Spacing",
    "LinearSpacing",
    "GaussianSpacing",
    "CustomSpacing",
    "Vertical",
]

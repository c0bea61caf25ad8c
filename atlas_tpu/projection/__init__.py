"""Projections: grid (x, y) space <-> geographic lon-lat.

Reference: atlas src/atlas/projection — types lonlat, rotated_lonlat, schmidt,
rotated_schmidt, mercator, lambert_azimuthal_equal_area,
lambert_conformal_conic, cubedsphere-equiangular/equidistant. Implemented here
as vectorized numpy transforms with a factory keyed by "type".
"""

from .projection import (
    Projection,
    LonLatProjection,
    RotatedLonLatProjection,
    SchmidtProjection,
    MercatorProjection,
    LambertAzimuthalEqualAreaProjection,
    LambertConformalConicProjection,
    projection_factory,
)

__all__ = [
    "Projection",
    "LonLatProjection",
    "RotatedLonLatProjection",
    "SchmidtProjection",
    "MercatorProjection",
    "LambertAzimuthalEqualAreaProjection",
    "LambertConformalConicProjection",
    "projection_factory",
]

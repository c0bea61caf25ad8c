"""Sphere geometry helpers (reference: atlas util/Earth.h, util/UnitSphere.h,
util/Point.h, util/Rotation.cc). All functions are vectorized numpy; angles in
degrees unless stated.
"""

from __future__ import annotations

import numpy as np

from .constants import DEG2RAD, EARTH_RADIUS, RAD2DEG


def lonlat_to_xyz(lonlat: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Convert (..., 2) lon-lat degrees to (..., 3) cartesian."""
    lonlat = np.asarray(lonlat, dtype=np.float64)
    lon = lonlat[..., 0] * DEG2RAD
    lat = lonlat[..., 1] * DEG2RAD
    coslat = np.cos(lat)
    return np.stack(
        [
            radius * coslat * np.cos(lon),
            radius * coslat * np.sin(lon),
            radius * np.sin(lat),
        ],
        axis=-1,
    )


def xyz_to_lonlat(xyz: np.ndarray) -> np.ndarray:
    """Convert (..., 3) cartesian to (..., 2) lon-lat degrees, lon in [0, 360)."""
    xyz = np.asarray(xyz, dtype=np.float64)
    r = np.linalg.norm(xyz, axis=-1)
    lon = np.arctan2(xyz[..., 1], xyz[..., 0]) * RAD2DEG
    lon = np.where(lon < 0.0, lon + 360.0, lon)
    lat = np.arcsin(np.clip(xyz[..., 2] / np.maximum(r, 1e-300), -1.0, 1.0)) * RAD2DEG
    return np.stack([lon, lat], axis=-1)


def central_angle(lonlat_a: np.ndarray, lonlat_b: np.ndarray) -> np.ndarray:
    """Great-circle central angle [rad] between two lon-lat degree points."""
    a = lonlat_to_xyz(lonlat_a)
    b = lonlat_to_xyz(lonlat_b)
    cross = np.linalg.norm(np.cross(a, b), axis=-1)
    dot = np.sum(a * b, axis=-1)
    return np.arctan2(cross, dot)


def great_circle_distance(lonlat_a, lonlat_b, radius: float = EARTH_RADIUS):
    return radius * central_angle(lonlat_a, lonlat_b)


class UnitSphere:
    radius = 1.0

    @staticmethod
    def distance(a, b):
        return central_angle(a, b)


class Earth:
    radius = EARTH_RADIUS

    @staticmethod
    def distance(a, b):
        return great_circle_distance(a, b)


def normalise_longitude(lon: np.ndarray, minimum: float = 0.0) -> np.ndarray:
    """Wrap longitudes into [minimum, minimum + 360)."""
    return (np.asarray(lon) - minimum) % 360.0 + minimum


class Rotation:
    """Rotated pole transform (reference: atlas util/Rotation.cc).

    Defined by the coordinates of the rotated south pole in the unrotated
    system and an optional additional rotation angle about the new polar axis.
    """

    def __init__(self, south_pole=(0.0, -90.0), rotation_angle: float = 0.0):
        self.south_pole = np.asarray(south_pole, dtype=np.float64)
        self.rotation_angle = float(rotation_angle)
        theta = -(90.0 + self.south_pole[1]) * DEG2RAD
        phi = -self.south_pole[0] * DEG2RAD
        angle = -self.rotation_angle * DEG2RAD
        # Rz(phi) then Ry(theta) then Rz(angle): unrotated <- rotated
        ct, st = np.cos(theta), np.sin(theta)
        cp, sp = np.cos(phi), np.sin(phi)
        ca, sa = np.cos(angle), np.sin(angle)
        rz_angle = np.array([[ca, sa, 0], [-sa, ca, 0], [0, 0, 1]])
        ry = np.array([[ct, 0, st], [0, 1, 0], [-st, 0, ct]])
        rz = np.array([[cp, sp, 0], [-sp, cp, 0], [0, 0, 1]])
        self._rotate = rz @ ry @ rz_angle  # rotated -> unrotated
        self._unrotate = self._rotate.T

    @property
    def rotated(self) -> bool:
        return (
            self.rotation_angle != 0.0
            or self.south_pole[0] != 0.0
            or self.south_pole[1] != -90.0
        )

    def rotate(self, lonlat: np.ndarray) -> np.ndarray:
        """Rotated coords -> unrotated (geographic) coords."""
        if not self.rotated:
            return np.asarray(lonlat, dtype=np.float64)
        xyz = lonlat_to_xyz(lonlat)
        return xyz_to_lonlat(xyz @ self._rotate.T)

    def unrotate(self, lonlat: np.ndarray) -> np.ndarray:
        """Geographic coords -> rotated coords."""
        if not self.rotated:
            return np.asarray(lonlat, dtype=np.float64)
        xyz = lonlat_to_xyz(lonlat)
        return xyz_to_lonlat(xyz @ self._unrotate.T)


def unique_lonlat_microdeg(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Unique int64 id per point from microdegree-quantized lon-lat.

    Reference: atlas util/Unique.h:35-47 packs (lat, lon) microdegrees into a
    single 64-bit key; used to resolve node ownership deterministically.
    """
    lon_u = np.round(normalise_longitude(np.asarray(lon, np.float64)) * 1e6).astype(
        np.int64
    )
    lat_u = np.round(np.asarray(lat, np.float64) * 1e6).astype(np.int64)
    return ((lat_u + 90_000_000) << 32) | (lon_u & 0xFFFFFFFF)

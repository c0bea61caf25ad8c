"""Projection implementations (vectorized numpy).

Reference: atlas projection/detail/*.cc. Each projection maps grid-space (x, y)
[degrees or meters] to geographic (lon, lat) degrees and back.
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from ..util.factory import Factory
from ..util.constants import DEG2RAD, RAD2DEG, EARTH_RADIUS
from ..util.geometry import Rotation

projection_factory = Factory("projection")


class Projection:
    """Identity (lonlat) projection; base class for all others.

    Reference: atlas projection/Projection.h — a handle with xy2lonlat /
    lonlat2xy and a Jacobian.
    """

    type = "lonlat"

    def __new__(cls, config=None, **kwargs):
        if cls is Projection and config:
            config = Config(config)
            ptype = config.get_str("type", "lonlat")
            sub = projection_factory.build(ptype, config)
            return sub
        return super().__new__(cls)

    def __init__(self, config=None, **kwargs):
        pass

    def xy2lonlat(self, xy: np.ndarray) -> np.ndarray:
        return np.array(xy, dtype=np.float64, copy=True)

    def lonlat2xy(self, lonlat: np.ndarray) -> np.ndarray:
        return np.array(lonlat, dtype=np.float64, copy=True)

    def jacobian(self, lonlat: np.ndarray) -> np.ndarray:
        """d(lon,lat)/d(x,y) at given points, shape (..., 2, 2)."""
        out = np.zeros(np.shape(lonlat)[:-1] + (2, 2))
        out[..., 0, 0] = 1.0
        out[..., 1, 1] = 1.0
        return out

    @property
    def identity(self) -> bool:
        return type(self) is Projection or type(self) is LonLatProjection

    def spec(self) -> Config:
        return Config(type=self.type)

    def __repr__(self):
        return f"{type(self).__name__}()"


@projection_factory.register("lonlat")
class LonLatProjection(Projection):
    type = "lonlat"


@projection_factory.register("rotated_lonlat")
class RotatedLonLatProjection(Projection):
    """Rotated-pole lon-lat (reference: projection/detail/LonLatProjection.cc +
    Rotation)."""

    type = "rotated_lonlat"

    def __init__(self, config=None, *, north_pole=None, south_pole=None, rotation_angle=0.0):
        if config is not None:
            config = Config(config)
            north_pole = config.get("north_pole", north_pole)
            south_pole = config.get("south_pole", south_pole)
            rotation_angle = config.get_float("rotation_angle", 0.0)
        if north_pole is not None and south_pole is None:
            south_pole = (north_pole[0] - 180.0, -north_pole[1])
        self.rotation = Rotation(south_pole or (0.0, -90.0), rotation_angle)

    def xy2lonlat(self, xy):
        return self.rotation.rotate(xy)

    def lonlat2xy(self, lonlat):
        return self.rotation.unrotate(lonlat)

    def spec(self):
        return Config(
            type=self.type,
            south_pole=list(map(float, self.rotation.south_pole)),
            rotation_angle=self.rotation.rotation_angle,
        )


@projection_factory.register("schmidt")
class SchmidtProjection(Projection):
    """Schmidt stretching by factor c (reference: projection/detail/SchmidtProjection.cc).

    New latitude satisfies sin(lat') = ((1-c^2) + (1+c^2) sin lat)/((1+c^2) + (1-c^2) sin lat).
    """

    type = "schmidt"

    def __init__(self, config=None, *, stretching_factor=1.0):
        if config is not None:
            config = Config(config)
            stretching_factor = config.get_float("stretching_factor", 1.0)
        self.c = float(stretching_factor)

    def xy2lonlat(self, xy):
        xy = np.asarray(xy, dtype=np.float64)
        c2 = self.c * self.c
        sinlat = np.sin(xy[..., 1] * DEG2RAD)
        new_sinlat = ((1.0 - c2) + (1.0 + c2) * sinlat) / ((1.0 + c2) + (1.0 - c2) * sinlat)
        out = np.array(xy, copy=True)
        out[..., 1] = np.arcsin(np.clip(new_sinlat, -1, 1)) * RAD2DEG
        return out

    def lonlat2xy(self, lonlat):
        lonlat = np.asarray(lonlat, dtype=np.float64)
        c2 = self.c * self.c
        sinlat = np.sin(lonlat[..., 1] * DEG2RAD)
        old_sinlat = ((c2 - 1.0) + (1.0 + c2) * sinlat) / ((1.0 + c2) + (c2 - 1.0) * sinlat)
        out = np.array(lonlat, copy=True)
        out[..., 1] = np.arcsin(np.clip(old_sinlat, -1, 1)) * RAD2DEG
        return out

    def spec(self):
        return Config(type=self.type, stretching_factor=self.c)


@projection_factory.register("rotated_schmidt")
class RotatedSchmidtProjection(SchmidtProjection):
    type = "rotated_schmidt"

    def __init__(self, config=None, **kw):
        config = Config(config or {})
        super().__init__(config)
        self._rot = RotatedLonLatProjection(config)

    def xy2lonlat(self, xy):
        return self._rot.xy2lonlat(super().xy2lonlat(xy))

    def lonlat2xy(self, lonlat):
        return super().lonlat2xy(self._rot.lonlat2xy(lonlat))


@projection_factory.register("mercator")
class MercatorProjection(Projection):
    """Mercator x/y in meters (reference: projection/detail/MercatorProjection.cc)."""

    type = "mercator"

    def __init__(self, config=None, *, longitude0=0.0, radius=EARTH_RADIUS):
        if config is not None:
            config = Config(config)
            longitude0 = config.get_float("longitude0", 0.0)
            radius = config.get_float("radius", EARTH_RADIUS)
        self.lon0 = float(longitude0)
        self.radius = float(radius)
        self._k = self.radius * DEG2RAD

    def xy2lonlat(self, xy):
        xy = np.asarray(xy, dtype=np.float64)
        lon = self.lon0 + xy[..., 0] / self._k
        lat = (2.0 * np.arctan(np.exp(xy[..., 1] / self.radius)) - 0.5 * np.pi) * RAD2DEG
        return np.stack([lon, lat], axis=-1)

    def lonlat2xy(self, lonlat):
        lonlat = np.asarray(lonlat, dtype=np.float64)
        x = (lonlat[..., 0] - self.lon0) * self._k
        y = self.radius * np.log(np.tan(0.25 * np.pi + 0.5 * lonlat[..., 1] * DEG2RAD))
        return np.stack([x, y], axis=-1)

    def spec(self):
        return Config(type=self.type, longitude0=self.lon0, radius=self.radius)


@projection_factory.register("lambert_azimuthal_equal_area")
class LambertAzimuthalEqualAreaProjection(Projection):
    """LAEA (reference: projection/detail/LambertAzimuthalEqualAreaProjection.cc)."""

    type = "lambert_azimuthal_equal_area"

    def __init__(self, config=None, *, central_longitude=0.0, standard_parallel=0.0, radius=EARTH_RADIUS):
        if config is not None:
            config = Config(config)
            central_longitude = config.get_float("central_longitude", 0.0)
            standard_parallel = config.get_float("standard_parallel", 0.0)
            radius = config.get_float("radius", EARTH_RADIUS)
        self.lon0 = float(central_longitude)
        self.lat0 = float(standard_parallel)
        self.radius = float(radius)

    def lonlat2xy(self, lonlat):
        lonlat = np.asarray(lonlat, dtype=np.float64)
        lam = (lonlat[..., 0] - self.lon0) * DEG2RAD
        phi = lonlat[..., 1] * DEG2RAD
        phi0 = self.lat0 * DEG2RAD
        denom = 1.0 + np.sin(phi0) * np.sin(phi) + np.cos(phi0) * np.cos(phi) * np.cos(lam)
        kp = self.radius * np.sqrt(2.0 / np.maximum(denom, 1e-300))
        x = kp * np.cos(phi) * np.sin(lam)
        y = kp * (np.cos(phi0) * np.sin(phi) - np.sin(phi0) * np.cos(phi) * np.cos(lam))
        return np.stack([x, y], axis=-1)

    def xy2lonlat(self, xy):
        xy = np.asarray(xy, dtype=np.float64)
        x = xy[..., 0] / self.radius
        y = xy[..., 1] / self.radius
        phi0 = self.lat0 * DEG2RAD
        rho = np.sqrt(x * x + y * y)
        c = 2.0 * np.arcsin(np.clip(0.5 * rho, -1, 1))
        sinc, cosc = np.sin(c), np.cos(c)
        safe_rho = np.where(rho == 0, 1.0, rho)
        phi = np.arcsin(np.clip(cosc * np.sin(phi0) + y * sinc * np.cos(phi0) / safe_rho, -1, 1))
        lam = np.arctan2(x * sinc, safe_rho * np.cos(phi0) * cosc - y * np.sin(phi0) * sinc)
        lon = self.lon0 + lam * RAD2DEG
        lat = phi * RAD2DEG
        lon = np.where(rho == 0, self.lon0, lon)
        lat = np.where(rho == 0, self.lat0, lat)
        return np.stack([lon, lat], axis=-1)

    def spec(self):
        return Config(
            type=self.type,
            central_longitude=self.lon0,
            standard_parallel=self.lat0,
            radius=self.radius,
        )


@projection_factory.register("lambert_conformal_conic")
class LambertConformalConicProjection(Projection):
    """LCC with one or two standard parallels
    (reference: projection/detail/LambertConformalConicProjection.cc)."""

    type = "lambert_conformal_conic"

    def __init__(self, config=None, *, longitude0=0.0, latitude0=0.0, latitude1=None, latitude2=None, radius=EARTH_RADIUS):
        if config is not None:
            config = Config(config)
            longitude0 = config.get_float("longitude0", 0.0)
            latitude0 = config.get_float("latitude0", 0.0)
            latitude1 = config.get("latitude1", None)
            latitude2 = config.get("latitude2", None)
            radius = config.get_float("radius", EARTH_RADIUS)
        self.lon0, self.lat0 = float(longitude0), float(latitude0)
        lat1 = float(latitude1) if latitude1 is not None else self.lat0
        lat2 = float(latitude2) if latitude2 is not None else lat1
        self.lat1, self.lat2 = lat1, lat2
        self.radius = float(radius)
        p1, p2 = lat1 * DEG2RAD, lat2 * DEG2RAD
        if abs(lat1 - lat2) < 1e-12:
            self.n = np.sin(p1)
        else:
            self.n = np.log(np.cos(p1) / np.cos(p2)) / np.log(
                np.tan(0.25 * np.pi + 0.5 * p2) / np.tan(0.25 * np.pi + 0.5 * p1)
            )
        self.F = np.cos(p1) * np.tan(0.25 * np.pi + 0.5 * p1) ** self.n / self.n
        self.rho0 = self._rho(self.lat0 * DEG2RAD)

    def _rho(self, phi):
        return self.radius * self.F / np.tan(0.25 * np.pi + 0.5 * phi) ** self.n

    def lonlat2xy(self, lonlat):
        lonlat = np.asarray(lonlat, dtype=np.float64)
        phi = lonlat[..., 1] * DEG2RAD
        dlam = (lonlat[..., 0] - self.lon0) * DEG2RAD
        rho = self._rho(phi)
        x = rho * np.sin(self.n * dlam)
        y = self.rho0 - rho * np.cos(self.n * dlam)
        return np.stack([x, y], axis=-1)

    def xy2lonlat(self, xy):
        xy = np.asarray(xy, dtype=np.float64)
        x, y = xy[..., 0], xy[..., 1]
        sign = np.sign(self.n) if np.isscalar(self.n) else np.sign(self.n)
        rho = sign * np.sqrt(x * x + (self.rho0 - y) ** 2)
        theta = np.arctan2(sign * x, sign * (self.rho0 - y))
        phi = 2.0 * np.arctan((self.radius * self.F / rho) ** (1.0 / self.n)) - 0.5 * np.pi
        lon = self.lon0 + theta / self.n * RAD2DEG
        lat = phi * RAD2DEG
        return np.stack([lon, lat], axis=-1)

    def spec(self):
        return Config(
            type=self.type,
            longitude0=self.lon0,
            latitude0=self.lat0,
            latitude1=self.lat1,
            latitude2=self.lat2,
            radius=self.radius,
        )

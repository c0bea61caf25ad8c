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


@projection_factory.register("variable_resolution")
class VariableResolutionProjection(Projection):
    """Variable-resolution (LAM stretching) projection.

    Reference: atlas projection/detail/VariableResolutionProjection.cc
    (Met Office scheme, Davies 2014 / Tang et al. 2013): an inner regular
    region maps to itself; outside it, successive delta_inner-sized intervals
    of the uniform index space stretch geometrically (width_i = delta_inner *
    r^i with r chosen so the widths reach delta_outer after the stretched
    zone), followed by a uniform coarse rim of spacing delta_outer.

    The map is piecewise linear with breakpoints every delta_inner, identical
    to the reference's remainder arithmetic (general_stretch :236-384), built
    once as breakpoint tables and evaluated with np.interp. The reference's
    +360 longitude normalization for lon < 180 is NOT applied; longitudes come
    back in the caller's frame.

    Config keys (flat, reference spec names): inner.dx, outer.dx, progression,
    inner.xmin/xmax..., outer.xmin/xend/ymin/yend, rim_widthx, rim_widthy.
    """

    def __init__(self, config=None, **kwargs):
        cfg = dict(config or {})
        cfg.update(kwargs)
        g = cfg.get
        self.delta_inner = float(g("inner.dx", g("delta_inner", 0.0)))
        self.delta_outer = float(g("outer.dx", g("delta_outer", self.delta_inner)))
        self.var_ratio = float(g("progression", 1.0))
        self.inner_xmin = float(g("inner.xmin", 0.0))
        self.inner_xend = float(g("inner.xend", 0.0))
        self.inner_ymin = float(g("inner.ymin", 0.0))
        self.inner_yend = float(g("inner.yend", 0.0))
        self.outer_xmin = float(g("outer.xmin", 0.0))
        self.outer_xend = float(g("outer.xend", 0.0))
        self.outer_ymin = float(g("outer.ymin", 0.0))
        self.outer_yend = float(g("outer.yend", 0.0))
        rimx = g("rim_widthx", g("outer.xwidth", 0.0))
        if "outer.nx" in cfg:
            rimx = self.delta_outer * cfg["outer.nx"]
        rimy = g("rim_widthy", g("outer.ywidth", rimx))
        if "outer.ny" in cfg:
            rimy = self.delta_outer * cfg["outer.ny"]
        self.rim_widthx = float(rimx)
        self.rim_widthy = float(rimy)
        self._cfg = cfg

        if self.var_ratio != 1.0:
            self._bx = self._breakpoints(
                self.outer_xmin, self.outer_xend, self.inner_xmin,
                self.inner_xend, self.rim_widthx)
            self._by = self._breakpoints(
                self.outer_ymin, self.outer_yend, self.inner_ymin,
                self.inner_yend, self.rim_widthy)

    def _breakpoints(self, outer_min, outer_end, inner_min, inner_end, rim_width):
        """(uniform breakpoints, stretched breakpoints) for one direction."""
        di, do = self.delta_inner, self.delta_outer
        eps = np.finfo(np.float32).eps
        n_rim = int(rim_width / do + eps)
        n_side = int((inner_min - outer_min + eps) / di)  # intervals per side
        n_st = n_side - n_rim
        if n_st < 0:
            raise ValueError("rim wider than the stretched zone")
        # the reference's new_ratio: adjust r so the stretched zone spans the
        # same distance counted in whole intervals (new_ratio :57-73)
        var_ints = int((2 * n_st + eps) / 2.0)
        log_r = (n_st - 0.5) * np.log(self.var_ratio)
        r = np.exp(log_r / max(var_ints, 1))
        widths = di * r ** np.arange(1, n_st + 1)      # stretched widths
        side = np.concatenate([widths, np.full(n_rim, do)])
        # uniform (index-space) breakpoints away from the inner edge
        u = di * np.arange(1, n_side + 1)
        s = np.cumsum(side)
        # full tables: [outer reversed from inner_min] + inner + [outer]
        ub = np.concatenate([inner_min - u[::-1], [inner_min, inner_end], inner_end + u])
        sb = np.concatenate([inner_min - s[::-1], [inner_min, inner_end], inner_end + s])
        return ub, sb

    def xy2lonlat(self, xy):
        xy = np.asarray(xy, dtype=np.float64)
        if self.var_ratio == 1.0:
            return xy.copy()
        out = np.empty_like(xy)
        out[..., 0] = np.interp(xy[..., 0], *self._bx)
        out[..., 1] = np.interp(xy[..., 1], *self._by)
        return out

    def lonlat2xy(self, lonlat):
        lonlat = np.asarray(lonlat, dtype=np.float64)
        if self.var_ratio == 1.0:
            return lonlat.copy()
        out = np.empty_like(lonlat)
        out[..., 0] = np.interp(lonlat[..., 0], self._bx[1], self._bx[0])
        out[..., 1] = np.interp(lonlat[..., 1], self._by[1], self._by[0])
        return out

    @property
    def identity(self):
        return False

    def spec(self):
        return Config(type="variable_resolution", **self._cfg)


@projection_factory.register("rotated_variable_resolution")
class RotatedVariableResolutionProjection(VariableResolutionProjection):
    """Variable-resolution stretching followed by a rotated-pole transform."""

    def __init__(self, config=None, **kwargs):
        cfg = dict(config or {})
        cfg.update(kwargs)
        rot_keys = {k: cfg.pop(k) for k in
                    ("north_pole", "south_pole", "rotation_angle") if k in cfg}
        super().__init__(cfg)
        self._rot = RotatedLonLatProjection(**rot_keys)

    def xy2lonlat(self, xy):
        return self._rot.xy2lonlat(super().xy2lonlat(xy))

    def lonlat2xy(self, lonlat):
        return super().lonlat2xy(self._rot.lonlat2xy(lonlat))

    def spec(self):
        s = super().spec()
        s["type"] = "rotated_variable_resolution"
        s.update(self._rot.spec())
        s["type"] = "rotated_variable_resolution"
        return s

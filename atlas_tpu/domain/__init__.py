"""Domains (reference: atlas domain/Domain.h, domain/detail/*): global,
rectangular, zonal band, empty."""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from ..util.factory import Factory

domain_factory = Factory("domain")


class Domain:
    type = "global"

    def __new__(cls, config=None, **kwargs):
        if cls is Domain and config:
            config = Config(config)
            return domain_factory.build(config.get_str("type", "global"), config)
        return super().__new__(cls)

    def __init__(self, config=None, **kwargs):
        pass

    def contains(self, lon, lat):
        return np.ones_like(np.asarray(lon), dtype=bool)

    @property
    def global_(self):
        return True

    def contains_north_pole(self):
        return True

    def contains_south_pole(self):
        return True

    def spec(self):
        return Config(type=self.type)


@domain_factory.register("global")
class GlobalDomain(Domain):
    pass


@domain_factory.register("rectangular")
class RectangularDomain(Domain):
    type = "rectangular"

    def __init__(self, config=None, *, xmin=None, xmax=None, ymin=None, ymax=None):
        if config is not None:
            config = Config(config)
            xmin = config.get_float("xmin")
            xmax = config.get_float("xmax")
            ymin = config.get_float("ymin")
            ymax = config.get_float("ymax")
        self.xmin, self.xmax = float(xmin), float(xmax)
        self.ymin, self.ymax = float(ymin), float(ymax)

    def contains(self, lon, lat):
        lon = np.asarray(lon)
        lat = np.asarray(lat)
        x = (lon - self.xmin) % 360.0 + self.xmin
        return (x >= self.xmin) & (x <= self.xmax) & (lat >= self.ymin) & (lat <= self.ymax)

    @property
    def global_(self):
        return False

    def contains_north_pole(self):
        return self.ymax >= 90.0

    def contains_south_pole(self):
        return self.ymin <= -90.0

    def spec(self):
        return Config(type=self.type, xmin=self.xmin, xmax=self.xmax, ymin=self.ymin, ymax=self.ymax)


@domain_factory.register("zonal_band")
class ZonalBandDomain(RectangularDomain):
    type = "zonal_band"

    def __init__(self, config=None, *, ymin=None, ymax=None):
        if config is not None:
            config = Config(config)
            ymin = config.get_float("ymin")
            ymax = config.get_float("ymax")
        super().__init__(xmin=0.0, xmax=360.0, ymin=ymin, ymax=ymax)

    def contains(self, lon, lat):
        lat = np.asarray(lat)
        return (lat >= self.ymin) & (lat <= self.ymax)


@domain_factory.register("empty")
class EmptyDomain(Domain):
    type = "empty"

    def contains(self, lon, lat):
        return np.zeros_like(np.asarray(lon), dtype=bool)

    @property
    def global_(self):
        return False

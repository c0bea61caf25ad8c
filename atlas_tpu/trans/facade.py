"""Trans facade: backend-dispatched spectral transforms.

Reference behavior: atlas trans/Trans.h — a handle constructed from
(grid, truncation, config) that dispatches to a registered backend
("local" -> TransLocal, "ectrans"/"ifs" -> TransIFS) and exposes
invtrans / dirtrans / invtrans_vordiv2wind. Here the backends are:

  "local"        rank-local TransLocal (trans_local.py)
  "distributed"  m-sharded TransDistributed over a device mesh (dist.py),
                 the TPU equivalent of the ectrans/TransIFS parallel path

invtrans_vordiv2wind chains VorDivToUV (Temperton 1991 recurrences,
vordiv.py) with the backend's inverse transform and divides out cos(lat),
matching the reference's invtrans_vordiv2wind (trans/local/TransLocal.cc
invtrans via VorDivToUVLocal).
"""

from __future__ import annotations

import numpy as np

from ..util.config import Config
from ..util.constants import DEG2RAD, EARTH_RADIUS
from ..util.factory import Factory
from .trans_local import TransLocal
from .dist import TransDistributed
from .vordiv import VorDivToUV

trans_factory = Factory("trans")
trans_factory.register("local")(TransLocal)
trans_factory.register("distributed")(TransDistributed)


class Trans:
    """Spectral transform handle (reference trans/Trans.h)."""

    def __init__(self, grid, truncation: int, config=None, **kwargs):
        cfg = Config(config or {})
        cfg.update(kwargs)
        backend = cfg.pop("type", "local")
        self.grid = grid
        self.truncation = int(truncation)
        self.radius = float(cfg.pop("radius", EARTH_RADIUS))
        self._impl = trans_factory.build(backend, grid, truncation, **cfg)
        self.backend = backend
        self._vd = None

    # ------------------------------------------------------------- passthru
    def invtrans(self, spectra):
        return self._impl.invtrans(spectra)

    def dirtrans(self, fields):
        return self._impl.dirtrans(fields)

    # --------------------------------------------------------- wind recipes
    def invtrans_vordiv2wind(self, vorticity, divergence):
        """Spectral vorticity/divergence -> grid-point (u, v) wind.

        VorDivToUV yields spectral U = u cos(lat), V = v cos(lat); after the
        inverse transform the cos(lat) factor is divided out pointwise.
        """
        if self._vd is None:
            self._vd = VorDivToUV(self.truncation, self.radius)
        U, V = self._vd.execute(np.asarray(vorticity), np.asarray(divergence))
        gp = self.invtrans(np.stack([np.asarray(U), np.asarray(V)]))
        gp = np.asarray(gp)
        lat = self.grid.lonlat()[:, 1]
        coslat = np.cos(lat * DEG2RAD)
        # polar rows: cos(lat) ~ 0 never occurs on Gaussian grids; clamp for
        # safety on arbitrary structured grids
        coslat = np.where(np.abs(coslat) < 1e-12, 1e-12, coslat)
        return gp[0] / coslat, gp[1] / coslat

    def __repr__(self):
        return f"Trans(T={self.truncation}, backend={self.backend!r})"

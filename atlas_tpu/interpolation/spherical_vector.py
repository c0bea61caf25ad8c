"""Spherical-vector interpolation: rotation-aware interpolation of (u, v) winds.

Reference behavior: atlas interpolation/method/sphericalvector/
SphericalVector.cc:36 + ComplexMatrixMultiply.h — take the scalar weights of a
base scheme and multiply each by the complex phase  e^{i (alpha_t - alpha_s)}
that parallel-transports the local (east, north) basis from the source point
to the target point along the connecting great circle; apply to the complex
field u + i v.  This removes the O(1) error scalar interpolation makes in
vector components near the poles.

alpha_s is the bearing of the great circle at the source, alpha_t its bearing
at the target (standard spherical trig, as reference's util greatCircleCourse,
util/UnitSphere.h greatCircleCourse).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..util.config import Config
from .interpolation import Method, interpolation_factory


def great_circle_course(lonlat1, lonlat2):
    """Bearings (deg, from north, eastward positive) of the great circle
    1->2 at point 1 and at point 2 (reference util::greatCircleCourse)."""
    lam1 = np.deg2rad(lonlat1[..., 0])
    phi1 = np.deg2rad(lonlat1[..., 1])
    lam2 = np.deg2rad(lonlat2[..., 0])
    phi2 = np.deg2rad(lonlat2[..., 1])
    dlam = lam2 - lam1
    a1 = np.arctan2(
        np.sin(dlam) * np.cos(phi2),
        np.cos(phi1) * np.sin(phi2) - np.sin(phi1) * np.cos(phi2) * np.cos(dlam),
    )
    a2 = np.arctan2(
        np.sin(dlam) * np.cos(phi1),
        -np.cos(phi2) * np.sin(phi1) + np.sin(phi2) * np.cos(phi1) * np.cos(dlam),
    )
    return np.rad2deg(a1), np.rad2deg(a2)


class SphericalVector(Method):
    """Wraps a base scheme's (idx, w) with complex rotation weights."""

    def __init__(self, config, source, target):
        from .interpolation import Interpolation
        from .structured import _target_points

        scheme = Config(config.get("scheme", {"type": "structured-bilinear"}))
        base = Interpolation(scheme, source, target)
        self.base = base
        self.nsrc = base.nsrc
        self.idx = base.idx
        self.w = base.w

        src_ll = np.asarray(
            source.lonlat() if hasattr(source, "lonlat") else source, dtype=np.float64
        ).reshape(-1, 2)
        tgt_ll = np.asarray(_target_points(target), dtype=np.float64).reshape(-1, 2)

        s = src_ll[base.idx]  # (ntgt, k, 2)
        t = np.broadcast_to(tgt_ll[:, None, :], s.shape)
        a_src, a_tgt = great_circle_course(s, t)
        # rotation taking a vector expressed in the source east/north basis to
        # the target basis: the great circle leaves the source at bearing a_src
        # and arrives at the target at bearing a_tgt, so the basis turns by
        # (a_src - a_tgt) in the u + iv convention (east real, north imaginary;
        # bearings are measured clockwise from north, hence the sign).
        theta = np.deg2rad(a_src - a_tgt)
        self.w_complex = base.w * np.exp(1j * theta)

    def execute_vector(self, u, v):
        """Interpolate the horizontal wind (u, v): returns (u_t, v_t)."""
        u = jnp.asarray(u)
        v = jnp.asarray(v)
        f = u + 1j * v
        wc = jnp.asarray(self.w_complex)
        vals = f[jnp.asarray(self.idx)]
        wshape = wc.shape + (1,) * (f.ndim - 1)
        out = (vals * wc.reshape(wshape)).sum(axis=1)
        return jnp.real(out), jnp.imag(out)

    def execute(self, field):
        """Scalar fields fall back to the base scheme (reference does the same
        for non-vector fields)."""
        return self.base.execute(field)


@interpolation_factory.register("spherical-vector")
def _sv(config, source, target):
    return SphericalVector(config, source, target)

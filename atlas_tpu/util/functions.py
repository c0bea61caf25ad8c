"""Analytic fields used by tests and validation.

Reference: atlas util/function/{SolidBodyRotation,VortexRollup,
SphericalHarmonic,MDPI_functions}.h — analytic wind/scalar fields with known
gradients, used to validate fvm operators and interpolation.

All functions accept lon/lat in degrees (numpy or jax arrays) and are written
with `numpy`-compatible ufuncs so they trace under jax as well.
"""

from __future__ import annotations

import numpy as np

from .constants import DEG2RAD, EARTH_RADIUS


class SolidBodyRotation:
    """Solid-body rotation wind field at angle beta to the equator.

    Reference: atlas util/function/SolidBodyRotation.h. With u0 the wind speed:
      u =  u0 (cos(beta) cos(lat) + sin(beta) cos(lon) sin(lat))
      v = -u0  sin(beta) sin(lon)
    The wind magnitude field has an analytic gradient/vorticity/divergence used
    by test_fvm_nabla_validation.cc.
    """

    def __init__(self, beta: float = 0.0, radius: float = EARTH_RADIUS, u0: float = 1.0):
        """beta in DEGREES (reference convention, SolidBodyRotation.cc:23)."""
        self.beta = float(beta)
        self.radius = float(radius)
        self.u0 = float(u0)
        self._cosb = np.cos(self.beta * DEG2RAD)
        self._sinb = np.sin(self.beta * DEG2RAD)

    def wind(self, lon, lat):
        x = lon * DEG2RAD
        y = lat * DEG2RAD
        u = self.u0 * (np.cos(y) * self._cosb + np.cos(x) * np.sin(y) * self._sinb)
        v = -self.u0 * np.sin(x) * self._sinb
        return u, v

    def wind_magnitude(self, lon, lat):
        u, v = self.wind(lon, lat)
        return np.sqrt(u * u + v * v)

    def wind_magnitude_squared(self, lon, lat):
        u, v = self.wind(lon, lat)
        return u * u + v * v

    def vordiv(self, lon, lat):
        """Analytic (vorticity, divergence) (SolidBodyRotation.cc:55-78)."""
        x = lon * DEG2RAD
        y = lat * DEG2RAD
        cos_x, sin_x = np.cos(x), np.sin(x)
        cos_y, sin_y = np.cos(y), np.sin(y)
        cosb, sinb = self._cosb, self._sinb
        ddx_u = -sin_x * sin_y * sinb
        ddy_cosy_v = (-sin_x * sinb) * (-sin_y)
        ddx_v = -cos_x * sinb
        ddy_cosy_u = (
            2 * cos_y * (-sin_y) * cosb
            + (-sin_y) * cos_x * sin_y * sinb
            + cos_y * cos_x * cos_y * sinb
        )
        metric = self.u0 / (self.radius * cos_y)
        div = metric * (ddx_u + ddy_cosy_v)
        vor = metric * (ddx_v - ddy_cosy_u)
        return vor, div

    def vorticity(self, lon, lat):
        return self.vordiv(lon, lat)[0]

    def divergence(self, lon, lat):
        return self.vordiv(lon, lat)[1]

    def wind_magnitude_squared_gradient(self, lon, lat):
        """d(u^2+v^2)/dx, /dy per meter on the sphere (reference
        windMagnitudeSquaredGradient)."""
        x = lon * DEG2RAD
        y = lat * DEG2RAD
        cosb, sinb = self._cosb, self._sinb
        u = np.cos(y) * cosb + np.cos(x) * np.sin(y) * sinb
        v = -np.sin(x) * sinb
        dudx = -np.sin(x) * np.sin(y) * sinb
        dudy = -np.sin(y) * cosb + np.cos(x) * np.cos(y) * sinb
        dvdx = -np.cos(x) * sinb
        metric_x = 1.0 / (self.radius * np.cos(y))
        metric_y = 1.0 / self.radius
        dfdx = 2.0 * (u * dudx + v * dvdx) * metric_x * self.u0**2
        dfdy = 2.0 * (u * dudy) * metric_y * self.u0**2
        return dfdx, dfdy


def vortex_rollup(lon, lat, t: float):
    """Time-dependent vortex roll-up scalar field.

    Reference: atlas util/function/VortexRollup.h (based on the test function of
    interpolation papers); smooth scalar on the sphere used in interpolation
    tests.
    """
    lam = lon * DEG2RAD
    theta = lat * DEG2RAD
    lambda_prime = np.arctan2(-np.cos(lam - 2 * np.pi * t), np.tan(theta))
    rho = 3.0 * np.sqrt(1.0 - np.cos(theta) ** 2 * np.sin(lam - 2 * np.pi * t) ** 2)
    omega = np.where(
        rho == 0.0, 0.0, (1.5 * np.sqrt(3.0) / np.cosh(rho) ** 2 * np.tanh(rho)) / np.where(rho == 0, 1.0, rho)
    )
    return 1.0 - np.tanh(0.2 * rho * np.sin(lambda_prime - omega * t))


def _legendre_pnm(n: int, m: int, x):
    """Associated Legendre P_n^m(x) (unnormalized, Condon-Shortley) via recurrence."""
    m_abs = abs(m)
    x = np.asarray(x, dtype=np.float64)
    pmm = np.ones_like(x)
    if m_abs > 0:
        somx2 = np.sqrt(np.maximum(0.0, (1.0 - x) * (1.0 + x)))
        fact = 1.0
        for _ in range(m_abs):
            pmm = -pmm * fact * somx2
            fact += 2.0
    if n == m_abs:
        return pmm
    pmmp1 = x * (2 * m_abs + 1) * pmm
    if n == m_abs + 1:
        return pmmp1
    pnm = pmmp1
    for nn in range(m_abs + 2, n + 1):
        pnm = (x * (2 * nn - 1) * pmmp1 - (nn + m_abs - 1) * pmm) / (nn - m_abs)
        pmm = pmmp1
        pmmp1 = pnm
    return pnm


def real_spherical_harmonic(lon, lat, n: int, m: int):
    """Real-valued spherical harmonic as in atlas util/function/SphericalHarmonic.h."""
    import math

    x = np.sin(np.asarray(lat, dtype=np.float64) * DEG2RAD)
    lam = np.asarray(lon, dtype=np.float64) * DEG2RAD
    m_abs = abs(m)
    norm = math.sqrt(
        (2 * n + 1) / (4 * math.pi) * math.factorial(n - m_abs) / math.factorial(n + m_abs)
    )
    p = _legendre_pnm(n, m_abs, x)
    if m > 0:
        return math.sqrt(2.0) * norm * p * np.cos(m * lam)
    if m < 0:
        return math.sqrt(2.0) * norm * p * np.sin(m_abs * lam)
    return norm * p


class MDPIFunctions:
    """Test functions from the MDPI interpolation-accuracy paper set.

    Reference: atlas util/function/MDPI_functions.h — sinusoid, harmonic,
    vortex, gulfstream fields over lon-lat degrees.
    """

    @staticmethod
    def sinusoid(lon, lat):
        length = 1.2 * np.pi
        lam = lon * DEG2RAD
        theta = lat * DEG2RAD
        return 2.0 - np.cos(np.pi * np.arccos(np.clip(np.cos(lam) * np.cos(theta), -1, 1)) / length)

    @staticmethod
    def harmonic(lon, lat):
        lam = lon * DEG2RAD
        theta = lat * DEG2RAD
        return 2.0 + (np.sin(2.0 * theta)) ** 16 * np.cos(16.0 * lam)

    @staticmethod
    def vortex(lon, lat):
        lam0, theta0 = 5.5, 0.2
        lam = lon * DEG2RAD
        theta = lat * DEG2RAD
        sinc = np.sin(theta0) * np.sin(theta) + np.cos(theta0) * np.cos(theta) * np.cos(lam - lam0)
        cosc = np.sqrt(np.maximum(0.0, 1 - sinc**2))
        lam_p = np.arctan2(
            np.cos(theta) * np.sin(lam - lam0),
            np.cos(theta0) * np.sin(theta) - np.sin(theta0) * np.cos(theta) * np.cos(lam - lam0),
        )
        rho = 3.0 * cosc
        vt = 3.0 * np.sqrt(3.0) / 2.0 / np.cosh(rho) ** 2 * np.tanh(rho)
        omega = np.where(rho == 0.0, 0.0, vt / np.where(rho == 0, 1.0, rho))
        return 2.0 + np.cos(theta) * np.sin(lam_p - omega * 6.0)

    @staticmethod
    def gulfstream(lon, lat):
        base = MDPIFunctions.sinusoid(lon, lat)
        lam = lon * DEG2RAD
        theta = lat * DEG2RAD
        gs_coeff = 3.0
        per_lam, per_theta = 1.0, 0.28
        lam_s, lam_e = 280.0 * DEG2RAD, 300.0 * DEG2RAD
        theta_s, theta_e = 25.0 * DEG2RAD, 40.0 * DEG2RAD
        in_box = (
            (lam >= lam_s) & (lam <= lam_e) & (theta >= theta_s) & (theta <= theta_e)
        )
        bump = gs_coeff * np.exp(
            -(((lam - lam_s) / per_lam) ** 2) - ((theta - 0.5 * (theta_s + theta_e)) / per_theta) ** 2
        )
        return base + np.where(in_box, bump, 0.0)

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

    def __init__(self, beta: float = 0.0, radius: float = EARTH_RADIUS, u0: float = 20.0):
        self.beta = float(beta)
        self.radius = float(radius)
        self.u0 = float(u0)

    def wind(self, lon, lat):
        x = lon * DEG2RAD
        y = lat * DEG2RAD
        cosb, sinb = np.cos(self.beta), np.sin(self.beta)
        u = self.u0 * (np.cos(y) * cosb + np.sin(y) * np.cos(x) * sinb)
        v = -self.u0 * np.sin(x) * sinb
        return u, v

    def wind_magnitude(self, lon, lat):
        u, v = self.wind(lon, lat)
        return np.sqrt(u * u + v * v)

    def vorticity(self, lon, lat):
        x = lon * DEG2RAD
        y = lat * DEG2RAD
        cosb, sinb = np.cos(self.beta), np.sin(self.beta)
        return 2.0 * self.u0 / self.radius * (
            -np.cos(x) * np.cos(y) * sinb + np.sin(y) * cosb
        )

    def divergence(self, lon, lat):
        return np.zeros_like(np.asarray(lon, dtype=np.float64) * np.asarray(lat))

    def wind_magnitude_gradient(self, lon, lat):
        """d|V|/dx, d|V|/dy (per meter, on the sphere of self.radius)."""
        x = lon * DEG2RAD
        y = lat * DEG2RAD
        cosb, sinb = np.cos(self.beta), np.sin(self.beta)
        u = self.u0 * (np.cos(y) * cosb + np.sin(y) * np.cos(x) * sinb)
        v = -self.u0 * np.sin(x) * sinb
        mag = np.sqrt(u * u + v * v)
        dudx = self.u0 * (-np.sin(y) * np.sin(x) * sinb)  # du/dlon
        dudy = self.u0 * (-np.sin(y) * cosb + np.cos(y) * np.cos(x) * sinb)  # du/dlat
        dvdx = -self.u0 * np.cos(x) * sinb
        dvdy = np.zeros_like(v)
        safe = np.where(mag > 0, mag, 1.0)
        dmdx = (u * dudx + v * dvdx) / safe
        dmdy = (u * dudy + v * dvdy) / safe
        # convert to per-meter: x-derivative has 1/(R cos y) metric
        metric_x = 1.0 / (self.radius * np.cos(y))
        metric_y = 1.0 / self.radius
        return dmdx * metric_x, dmdy * metric_y


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

"""Lambert Conformal Conic 1SP/2SP (+k_0 Michigan variant).

Numpy re-derivation of PROJ's lcc (reference:
/root/reference/src/projections/lcc.cpp — fwd :22-42, inv :44-76, cone-
constant setup :78-171). Tolerance pinned by test/gie/builtins.gie:3373-3435
(0.1 mm). The inverse uses the vectorized Newton iteration in
kernels/common.phi2 (reference src/phi2.cpp).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import msfn, phi2, tsfn

_EPS10 = 1e-10
_HALFPI = math.pi / 2
_FORTPI = math.pi / 4


@dataclass(frozen=True)
class LCCConsts:
    es: float
    e: float
    k0: float
    n: float      # cone constant
    rho0: float
    c: float
    spherical: bool


def setup_lcc(
    ell: Ellipsoid,
    lat_1: float,
    lat_2: float | None = None,
    lat_0: float | None = None,
    k0: float = 1.0,
) -> LCCConsts:
    """Compute cone constants. Angles in degrees (proj-string convention)."""
    phi1 = math.radians(lat_1)
    phi2_ = math.radians(lat_2) if lat_2 is not None else phi1
    if lat_0 is None:
        # PROJ: phi0 inherits lat_1 only in the 1SP case (no lat_2 given);
        # otherwise it keeps the pj_init default of 0 (reference lcc.cpp:89-95)
        lat_0 = lat_1 if lat_2 is None else 0.0
    phi0 = math.radians(lat_0)

    if abs(phi1 + phi2_) < _EPS10:
        raise ValueError("|lat_1 + lat_2| must be > 0")

    sinphi = math.sin(phi1)
    cosphi = math.cos(phi1)
    n = sinphi
    secant = abs(phi1 - phi2_) >= _EPS10

    if ell.es != 0.0:
        m1 = float(msfn(sinphi, cosphi, ell.es))
        ml1 = float(tsfn(phi1, sinphi, ell.e))
        if secant:
            sinphi2 = math.sin(phi2_)
            n = math.log(m1 / float(msfn(sinphi2, math.cos(phi2_), ell.es)))
            n /= math.log(ml1 / float(tsfn(phi2_, sinphi2, ell.e)))
        rho0 = m1 * ml1 ** (-n) / n
        c = rho0
        if abs(abs(phi0) - _HALFPI) < _EPS10:
            rho0 = 0.0
        else:
            rho0 *= float(tsfn(phi0, math.sin(phi0), ell.e)) ** n
        return LCCConsts(ell.es, ell.e, k0, n, rho0, c, spherical=False)

    if secant:
        n = math.log(cosphi / math.cos(phi2_)) / math.log(
            math.tan(_FORTPI + 0.5 * phi2_) / math.tan(_FORTPI + 0.5 * phi1)
        )
    c = cosphi * math.tan(_FORTPI + 0.5 * phi1) ** n / n
    rho0 = (
        0.0
        if abs(abs(phi0) - _HALFPI) < _EPS10
        else c * math.tan(_FORTPI + 0.5 * phi0) ** (-n)
    )
    return LCCConsts(0.0, 0.0, k0, n, rho0, c, spherical=True)


def lcc_fwd(lam: np.ndarray, phi: np.ndarray, C: LCCConsts):
    """(lam-from-lon0, phi) radians -> (x, y)/a."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)

    at_pole = np.abs(np.abs(phi) - _HALFPI) < _EPS10
    bad_pole = at_pole & (phi * C.n <= 0.0)
    if C.spherical:
        rho_main = C.c * np.tan(_FORTPI + 0.5 * phi) ** (-C.n)
    else:
        rho_main = C.c * tsfn(phi, np.sin(phi), C.e) ** C.n
    rho = np.where(at_pole, 0.0, rho_main)
    gamma = lam * C.n
    x = C.k0 * rho * np.sin(gamma)
    y = C.k0 * (C.rho0 - rho * np.cos(gamma))
    return np.where(bad_pole, np.nan, x), np.where(bad_pole, np.nan, y)


def lcc_inv(x: np.ndarray, y: np.ndarray, C: LCCConsts):
    """(x, y)/a -> (lam-from-lon0, phi) radians."""
    x = np.asarray(x, dtype=np.float64) / C.k0
    y = C.rho0 - np.asarray(y, dtype=np.float64) / C.k0
    rho = np.hypot(x, y)
    neg = C.n < 0.0
    if neg:
        rho = -rho
        x = -x
        y = -y
    nonzero = rho != 0.0
    safe_rho = np.where(nonzero, rho, 1.0)
    if C.spherical:
        phi = 2.0 * np.arctan((C.c / safe_rho) ** (1.0 / C.n)) - _HALFPI
    else:
        phi = phi2((safe_rho / C.c) ** (1.0 / C.n), C.e)
    lam = np.arctan2(x, y) / C.n
    phi = np.where(nonzero, phi, _HALFPI if C.n > 0 else -_HALFPI)
    lam = np.where(nonzero, lam, 0.0)
    return lam, phi

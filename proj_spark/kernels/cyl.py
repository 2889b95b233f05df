"""Cylindrical projections: cea, cass, eqc, mill, somerc.

Numpy re-derivations of:
  * cea    — /root/reference/src/projections/cea.cpp (Lambert cylindrical
    equal area; ellipsoidal via authalic latitude)
  * cass   — /root/reference/src/projections/cass.cpp (Cassini-Soldner;
    ellipsoidal series + spherical closed form; the +hyperbolic variant
    is not implemented)
  * eqc    — /root/reference/src/projections/eqc.cpp (Plate Carree)
  * mill   — /root/reference/src/projections/mill.cpp
  * somerc — /root/reference/src/projections/somerc.cpp (Swiss Oblique
    Mercator over the conformal sphere)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import authlat, authset, qsfn
from proj_spark.kernels.tmerc import _enfn, inv_mlfn, mlfn

EPS10 = 1e-10
HALFPI = math.pi / 2
FORTPI = math.pi / 4


# --------------------------------------------------------------------------
# cea
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class CEAConsts:
    e: float
    es: float
    one_es: float
    k0: float
    qp: float = 0.0
    apa: tuple = (0.0, 0.0, 0.0)


def setup_cea(ell: Ellipsoid, lat_ts: float | None = None, k0: float = 1.0) -> CEAConsts:
    t = math.radians(lat_ts) if lat_ts is not None else 0.0
    if lat_ts is not None:
        k0 = math.cos(t)
        if k0 < 0:
            raise ValueError("cea: |lat_ts| must be <= 90")
    if ell.es != 0.0:
        st = math.sin(t)
        k0 /= math.sqrt(1.0 - ell.es * st * st)
        return CEAConsts(ell.e, ell.es, ell.one_es, k0,
                         float(qsfn(1.0, ell.e, ell.one_es)), authset(ell.es))
    return CEAConsts(0.0, 0.0, 1.0, k0)


def cea_fwd(lam, phi, C: CEAConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    x = C.k0 * lam
    if C.es != 0.0:
        y = 0.5 * qsfn(np.sin(phi), C.e, C.one_es) / C.k0
    else:
        y = np.sin(phi) / C.k0
    return x, y


def cea_inv(x, y, C: CEAConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lam = x / C.k0
    if C.es != 0.0:
        phi = authlat(np.arcsin(np.clip(2.0 * y * C.k0 / C.qp, -1, 1)), C.apa)
        return lam, phi
    yk = y * C.k0
    t = np.abs(yk)
    phi = np.where(t >= 1.0,
                   np.where(yk < 0, -HALFPI, HALFPI),
                   np.arcsin(np.clip(yk, -1, 1)))
    return np.where(t - 1e-10 > 1.0, np.nan, lam), np.where(t - 1e-10 > 1.0, np.nan, phi)


# --------------------------------------------------------------------------
# cass
# --------------------------------------------------------------------------

_C1, _C2, _C3, _C4, _C5 = 1 / 6, 1 / 120, 1 / 24, 1 / 3, 1 / 15


@dataclass(frozen=True)
class CassConsts:
    es: float
    phi0: float
    m0: float = 0.0
    en: tuple = ()
    hyperbolic: bool = False


def setup_cass(ell: Ellipsoid, lat_0: float = 0.0,
               hyperbolic: bool = False) -> CassConsts:
    phi0 = math.radians(lat_0)
    if ell.es == 0.0:
        return CassConsts(0.0, phi0)
    en = _enfn(ell.n)
    m0 = float(mlfn(phi0, math.sin(phi0), math.cos(phi0), en))
    return CassConsts(ell.es, phi0, m0, en, hyperbolic)


def cass_fwd(lam, phi, C: CassConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if C.es == 0.0:
        x = np.arcsin(np.clip(np.cos(phi) * np.sin(lam), -1, 1))
        y = np.arctan2(np.tan(phi), np.cos(lam)) - C.phi0
        return x, y
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    M = mlfn(phi, sinphi, cosphi, C.en)
    nu = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
    tanphi = np.tan(phi)
    T = tanphi * tanphi
    A = lam * cosphi
    Cc = C.es * (cosphi * cosphi) / (1.0 - C.es)
    A2 = A * A
    x = nu * A * (1.0 - A2 * T * (_C1 + (8.0 - T + 8.0 * Cc) * A2 * _C2))
    y = M - C.m0 + nu * tanphi * A2 * (0.5 + (5.0 - T + 6.0 * Cc) * A2 * _C3)
    if C.hyperbolic:
        # Vanua Levu grid (reference cass.cpp:43-46): y -= y^3/(6 rho nu)
        rho = (nu * nu) * (1.0 - C.es) * nu
        y = y - y * y * y / (6.0 * rho * nu)
    return x, y


def cass_inv(x, y, C: CassConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if C.es == 0.0:
        dd = y + C.phi0
        phi = np.arcsin(np.clip(np.sin(dd) * np.cos(x), -1, 1))
        lam = np.arctan2(np.tan(x), np.cos(dd))
        return lam, phi
    phi1 = inv_mlfn(C.m0 + y, C.en)
    tanphi1 = np.tan(phi1)
    T1 = tanphi1 * tanphi1
    sinphi1 = np.sin(phi1)
    nu1_sq = 1.0 / (1.0 - C.es * sinphi1 * sinphi1)
    nu1 = np.sqrt(nu1_sq)
    rho1 = nu1_sq * (1.0 - C.es) * nu1
    D = x / nu1
    D2 = D * D
    phi = phi1 - (nu1 * tanphi1 / rho1) * D2 * (0.5 - (1.0 + 3.0 * T1) * D2 * _C3)
    lam = D * (1.0 + T1 * D2 * (-_C4 + (1.0 + 3.0 * T1) * D2 * _C5)) / np.cos(phi1)
    # series is ~1e-4 deg at wide |lam|; refine like the reference does
    # (cass.cpp calls pj_generic_inverse_2d with tol 1e-12)
    from proj_spark.kernels.common import generic_inverse_2d

    return generic_inverse_2d(x, y, lambda L, P: cass_fwd(L, P, C), lam, phi)


# --------------------------------------------------------------------------
# eqc / mill
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class EqcConsts:
    rc: float
    phi0: float


def setup_eqc(lat_ts: float = 0.0, lat_0: float = 0.0) -> EqcConsts:
    rc = math.cos(math.radians(lat_ts))
    if rc <= 0:
        raise ValueError("eqc: |lat_ts| must be < 90")
    return EqcConsts(rc, math.radians(lat_0))


def eqc_fwd(lam, phi, C: EqcConsts):
    return C.rc * np.asarray(lam, dtype=np.float64), (
        np.asarray(phi, dtype=np.float64) - C.phi0
    )


def eqc_inv(x, y, C: EqcConsts):
    return np.asarray(x, dtype=np.float64) / C.rc, (
        np.asarray(y, dtype=np.float64) + C.phi0
    )


def mill_fwd(lam, phi, _C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    return lam, np.log(np.tan(FORTPI + phi * 0.4)) * 1.25


def mill_inv(x, y, _C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    return x, 2.5 * (np.arctan(np.exp(0.8 * y)) - FORTPI)


# --------------------------------------------------------------------------
# somerc
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SomercConsts:
    e: float
    es: float
    rone_es: float
    hlf_e: float
    c: float
    sinp0: float
    cosp0: float
    K: float
    kR: float


def setup_somerc(ell: Ellipsoid, lat_0: float = 0.0, k0: float = 1.0) -> SomercConsts:
    phi0 = math.radians(lat_0)
    hlf_e = 0.5 * ell.e
    cp = math.cos(phi0) ** 2
    rone_es = 1.0 / ell.one_es
    c = math.sqrt(1.0 + ell.es * cp * cp * rone_es)
    sp = math.sin(phi0)
    sinp0 = sp / c
    phip0 = math.asin(sinp0)
    cosp0 = math.cos(phip0)
    spe = sp * ell.e
    K = math.log(math.tan(FORTPI + 0.5 * phip0)) - c * (
        math.log(math.tan(FORTPI + 0.5 * phi0))
        - hlf_e * math.log((1.0 + spe) / (1.0 - spe))
    )
    kR = k0 * math.sqrt(ell.one_es) / (1.0 - spe * spe)
    return SomercConsts(ell.e, ell.es, rone_es, hlf_e, c, sinp0, cosp0, K, kR)


def somerc_fwd(lam, phi, C: SomercConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sp = C.e * np.sin(phi)
    phip = (
        2.0 * np.arctan(
            np.exp(C.c * (np.log(np.tan(FORTPI + 0.5 * phi))
                          - C.hlf_e * np.log((1.0 + sp) / (1.0 - sp))) + C.K)
        ) - HALFPI
    )
    lamp = C.c * lam
    cp = np.cos(phip)
    phipp = np.arcsin(np.clip(C.cosp0 * np.sin(phip) - C.sinp0 * cp * np.cos(lamp), -1, 1))
    lampp = np.arcsin(np.clip(cp * np.sin(lamp) / np.cos(phipp), -1, 1))
    return C.kR * lampp, C.kR * np.log(np.tan(FORTPI + 0.5 * phipp))


def somerc_inv(x, y, C: SomercConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    phipp = 2.0 * (np.arctan(np.exp(y / C.kR)) - FORTPI)
    lampp = x / C.kR
    cp = np.cos(phipp)
    phip = np.arcsin(np.clip(C.cosp0 * np.sin(phipp) + C.sinp0 * cp * np.cos(lampp), -1, 1))
    lamp = np.arcsin(np.clip(cp * np.sin(lampp) / np.cos(phip), -1, 1))
    con = (C.K - np.log(np.tan(FORTPI + 0.5 * phip))) / C.c
    for _ in range(6):
        esp = C.e * np.sin(phip)
        delp = (
            (con + np.log(np.tan(FORTPI + 0.5 * phip))
             - C.hlf_e * np.log((1.0 + esp) / (1.0 - esp)))
            * (1.0 - esp * esp) * np.cos(phip) * C.rone_es
        )
        phip = phip - delp
        if np.all(np.abs(delp) < 1e-10):
            break
    return lamp / C.c, phip

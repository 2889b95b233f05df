"""Conic projections: Albers Equal Area (aea/leac), Equidistant Conic
(eqdc), Bonne (pseudoconic).

Numpy re-derivations of the reference kernels:
  * aea/leac — /root/reference/src/projections/aea.cpp (fwd :96-113,
    inv :115-155, setup :157-222; phi1_ Newton :44-67 -> common.auth_phi1)
  * eqdc     — /root/reference/src/projections/eqdc.cpp
  * bonne    — /root/reference/src/projections/bonne.cpp

All kernels are dimensionless (radius 1); plans.ProjectionStep applies
a/x0/y0/lam0.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import auth_phi1, msfn, qsfn
from proj_spark.kernels.tmerc import _enfn, inv_mlfn, mlfn

EPS10 = 1e-10
HALFPI = math.pi / 2


# --------------------------------------------------------------------------
# aea / leac
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class AEAConsts:
    e: float
    es: float
    one_es: float
    ellips: bool
    n: float
    n2: float
    c: float
    dd: float
    ec: float
    rho0: float
    en: tuple


def setup_aea(ell: Ellipsoid, lat_1: float, lat_2: float, lat_0: float = 0.0) -> AEAConsts:
    phi1 = math.radians(lat_1)
    phi2 = math.radians(lat_2)
    phi0 = math.radians(lat_0)
    if abs(phi1 + phi2) < EPS10:
        raise ValueError("aea: |lat_1 + lat_2| must be > 0")
    sinphi = math.sin(phi1)
    cosphi = math.cos(phi1)
    n = sinphi
    secant = abs(phi1 - phi2) >= EPS10
    ellips = ell.es > 0
    en = _enfn(ell.n)
    n2 = ec = 0.0
    if ellips:
        m1 = msfn(sinphi, cosphi, ell.es)
        ml1 = qsfn(sinphi, ell.e, ell.one_es)
        if secant:
            s2, c2 = math.sin(phi2), math.cos(phi2)
            m2 = msfn(s2, c2, ell.es)
            ml2 = qsfn(s2, ell.e, ell.one_es)
            n = (m1 * m1 - m2 * m2) / (ml2 - ml1)
        ec = 1.0 - 0.5 * ell.one_es * math.log((1.0 - ell.e) / (1.0 + ell.e)) / ell.e
        c = m1 * m1 + n * ml1
        dd = 1.0 / n
        rho0 = dd * math.sqrt(c - n * float(qsfn(math.sin(phi0), ell.e, ell.one_es)))
    else:
        if secant:
            n = 0.5 * (n + math.sin(phi2))
        n2 = n + n
        c = cosphi * cosphi + n2 * sinphi
        dd = 1.0 / n
        rho0 = dd * math.sqrt(c - n2 * math.sin(phi0))
    return AEAConsts(ell.e, ell.es, ell.one_es, ellips, n, n2, c, dd, ec, rho0, en)


def aea_fwd(lam, phi, C: AEAConsts):
    phi = np.asarray(phi, dtype=np.float64)
    if C.ellips:
        rho = C.c - C.n * qsfn(np.sin(phi), C.e, C.one_es)
    else:
        rho = C.c - C.n2 * np.sin(phi)
    with np.errstate(invalid="ignore"):
        rho = np.where(rho < 0, np.nan, C.dd * np.sqrt(np.maximum(rho, 0.0)))
    lamn = np.asarray(lam, dtype=np.float64) * C.n
    return rho * np.sin(lamn), C.rho0 - rho * np.cos(lamn)


def aea_inv(x, y, C: AEAConsts):
    x = np.asarray(x, dtype=np.float64)
    y = C.rho0 - np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    if C.n < 0:
        rho, x, y = -rho, -x, -y
    with np.errstate(divide="ignore", invalid="ignore"):
        phi_r = rho / C.dd
        if C.ellips:
            phi_q = (C.c - phi_r * phi_r) / C.n
            at_pole = np.abs(C.ec - np.abs(phi_q)) <= 1e-7
            phi = np.where(
                at_pole,
                np.where(phi_q < 0, -HALFPI, HALFPI),
                auth_phi1(phi_q, C.e, C.one_es),
            )
            phi = np.where(np.abs(phi_q) > 2, np.nan, phi)
        else:
            s = (C.c - phi_r * phi_r) / C.n2
            phi = np.where(np.abs(s) <= 1.0, np.arcsin(np.clip(s, -1, 1)),
                           np.where(s < 0, -HALFPI, HALFPI))
        lam = np.arctan2(x, y) / C.n
    zero = rho == 0
    phi = np.where(zero, HALFPI if C.n > 0 else -HALFPI, phi)
    lam = np.where(zero, 0.0, lam)
    return lam, phi


# --------------------------------------------------------------------------
# eqdc
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class EQDCConsts:
    ellips: bool
    n: float
    c: float
    rho0: float
    en: tuple


def setup_eqdc(ell: Ellipsoid, lat_1: float, lat_2: float, lat_0: float = 0.0) -> EQDCConsts:
    phi1 = math.radians(lat_1)
    phi2 = math.radians(lat_2)
    phi0 = math.radians(lat_0)
    if abs(phi1 + phi2) < EPS10:
        raise ValueError("eqdc: |lat_1 + lat_2| must be > 0")
    en = _enfn(ell.n)
    sinphi = math.sin(phi1)
    cosphi = math.cos(phi1)
    n = sinphi
    secant = abs(phi1 - phi2) >= EPS10
    ellips = ell.es > 0
    if ellips:
        m1 = msfn(sinphi, cosphi, ell.es)
        ml1 = float(mlfn(phi1, sinphi, cosphi, en))
        if secant:
            s2, c2 = math.sin(phi2), math.cos(phi2)
            ml2 = float(mlfn(phi2, s2, c2, en))
            n = (m1 - msfn(s2, c2, ell.es)) / (ml2 - ml1)
        c = ml1 + m1 / n
        rho0 = c - float(mlfn(phi0, math.sin(phi0), math.cos(phi0), en))
    else:
        if secant:
            n = (cosphi - math.cos(phi2)) / (phi2 - phi1)
        c = phi1 + math.cos(phi1) / n
        rho0 = c - phi0
    return EQDCConsts(ellips, n, c, rho0, en)


def eqdc_fwd(lam, phi, C: EQDCConsts):
    phi = np.asarray(phi, dtype=np.float64)
    if C.ellips:
        rho = C.c - mlfn(phi, np.sin(phi), np.cos(phi), C.en)
    else:
        rho = C.c - phi
    lamn = np.asarray(lam, dtype=np.float64) * C.n
    return rho * np.sin(lamn), C.rho0 - rho * np.cos(lamn)


def eqdc_inv(x, y, C: EQDCConsts):
    x = np.asarray(x, dtype=np.float64)
    y = C.rho0 - np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    if C.n < 0:
        rho, x, y = -rho, -x, -y
    phi = C.c - rho
    if C.ellips:
        phi = inv_mlfn(phi, C.en)
    lam = np.arctan2(x, y) / C.n
    zero = rho == 0
    phi = np.where(zero, HALFPI if C.n > 0 else -HALFPI, phi)
    lam = np.where(zero, 0.0, lam)
    return lam, phi


# --------------------------------------------------------------------------
# bonne
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class BonneConsts:
    ellips: bool
    es: float
    phi1: float
    cphi1: float   # sph: cot(phi1)
    am1: float     # ell: m1/(sqrt(1-es sin^2) sin) ; also holds sin(phi1) during setup
    m1: float
    en: tuple


def setup_bonne(ell: Ellipsoid, lat_1: float) -> BonneConsts:
    phi1 = math.radians(lat_1)
    if abs(phi1) < EPS10:
        raise ValueError("bonne: lat_1 must be nonzero")
    if ell.es > 0:
        en = _enfn(ell.n)
        s = math.sin(phi1)
        c = math.cos(phi1)
        m1 = float(mlfn(phi1, s, c, en))
        am1 = c / (math.sqrt(1.0 - ell.es * s * s) * s)
        return BonneConsts(True, ell.es, phi1, 0.0, am1, m1, en)
    cphi1 = 0.0 if abs(phi1) + EPS10 >= HALFPI else 1.0 / math.tan(phi1)
    return BonneConsts(False, 0.0, phi1, cphi1, 0.0, 0.0, ())


def bonne_fwd(lam, phi, C: BonneConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if C.ellips:
        E = np.sin(phi)
        c = np.cos(phi)
        rh = C.am1 + C.m1 - mlfn(phi, E, c, C.en)
        with np.errstate(divide="ignore", invalid="ignore"):
            Ea = c * lam / (rh * np.sqrt(1.0 - C.es * E * E))
            x = rh * np.sin(Ea)
            y = C.am1 - rh * np.cos(Ea)
        small = np.abs(rh) <= EPS10
        return np.where(small, 0.0, x), np.where(small, 0.0, y)
    rh = C.cphi1 + C.phi1 - phi
    with np.errstate(divide="ignore", invalid="ignore"):
        E = lam * np.cos(phi) / rh
        x = rh * np.sin(E)
        y = C.cphi1 - rh * np.cos(E)
    small = np.abs(rh) <= EPS10
    return np.where(small, 0.0, x), np.where(small, 0.0, y)


def bonne_inv(x, y, C: BonneConsts):
    x = np.asarray(x, dtype=np.float64)
    if C.ellips:
        y = C.am1 - np.asarray(y, dtype=np.float64)
        rh = np.copysign(np.hypot(x, y), C.phi1)
        phi = inv_mlfn(C.am1 + C.m1 - rh, C.en)
        with np.errstate(divide="ignore", invalid="ignore"):
            s = np.sin(phi)
            lm = rh * np.sqrt(1.0 - C.es * s * s) / np.cos(phi)
            lam = np.where(
                C.phi1 > 0, lm * np.arctan2(x, y), lm * np.arctan2(-x, -y)
            )
        lam = np.where(np.abs(np.abs(phi) - HALFPI) <= EPS10, 0.0, lam)
        return lam, phi
    y = C.cphi1 - np.asarray(y, dtype=np.float64)
    rh = np.copysign(np.hypot(x, y), C.phi1)
    phi = C.cphi1 + C.phi1 - rh
    with np.errstate(divide="ignore", invalid="ignore"):
        lm = rh / np.cos(phi)
        lam = np.where(C.phi1 > 0, lm * np.arctan2(x, y), lm * np.arctan2(-x, -y))
    lam = np.where(HALFPI - np.abs(phi) <= EPS10, 0.0, lam)
    return lam, phi

"""Catalogue continued: simple conics family (euler/murd1-3/pconic/
tissot/vitk1), calcofi line/station grid, tpeqd (two-point equidistant),
poly (American polyconic, sph+ell).

Numpy re-derivations of /root/reference/src/projections/{sconics,calcofi,
tpeqd,poly}.cpp.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import adjlon, msfn, phi2, tsfn
from proj_spark.kernels.tmerc import _enfn, mlfn

HALFPI = math.pi / 2
FORTPI = math.pi / 4
PI = math.pi
RAD2DEG = 180.0 / PI


# --------------------------------------------------------------------------
# simple conics
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class SconicsConsts:
    type: str
    n: float
    rho_c: float
    rho_0: float
    sig: float
    c1: float = 0.0
    c2: float = 0.0


def setup_sconics(type_: str, lat_1: float, lat_2: float, lat_0: float = 0.0) -> SconicsConsts:
    p1 = math.radians(lat_1)
    p2 = math.radians(lat_2)
    phi0 = math.radians(lat_0)
    del_ = 0.5 * (p2 - p1)
    sig = 0.5 * (p2 + p1)
    if abs(del_) < 1e-10 or abs(sig) < 1e-10:
        raise ValueError("sconics: |lat_1 - lat_2| and |lat_1 + lat_2| must be > 0")
    c1 = c2 = 0.0
    if type_ == "tissot":
        n = math.sin(sig)
        cs = math.cos(del_)
        rho_c = n / cs + cs / n
        rho_0 = math.sqrt((rho_c - 2 * math.sin(phi0)) / n)
    elif type_ == "murd1":
        rho_c = math.sin(del_) / (del_ * math.tan(sig)) + sig
        rho_0 = rho_c - phi0
        n = math.sin(sig)
    elif type_ == "murd2":
        cs = math.sqrt(math.cos(del_))
        rho_c = cs / math.tan(sig)
        rho_0 = rho_c + math.tan(sig - phi0)
        n = math.sin(sig) * cs
    elif type_ == "murd3":
        rho_c = del_ / (math.tan(sig) * math.tan(del_)) + sig
        rho_0 = rho_c - phi0
        n = math.sin(sig) * math.sin(del_) * math.tan(del_) / (del_ * del_)
    elif type_ == "euler":
        n = math.sin(sig) * math.sin(del_) / del_
        half = del_ * 0.5
        rho_c = half / (math.tan(half) * math.tan(sig)) + sig
        rho_0 = rho_c - phi0
    elif type_ == "pconic":
        n = math.sin(sig)
        c2 = math.cos(del_)
        c1 = 1.0 / math.tan(sig)
        d0 = phi0 - sig
        if abs(d0) - 1e-10 >= HALFPI:
            raise ValueError("pconic: |lat_0 - sig| must be < 90")
        rho_c = 0.0
        rho_0 = c2 * (c1 - math.tan(d0))
    elif type_ == "vitk1":
        cs = math.tan(del_)
        n = cs * math.sin(sig) / del_
        rho_c = del_ / (cs * math.tan(sig)) + sig
        rho_0 = rho_c - phi0
    else:
        raise ValueError(type_)
    return SconicsConsts(type_, n, rho_c, rho_0, sig, c1, c2)


def sconics_fwd(lam, phi, C: SconicsConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if C.type == "murd2":
        rho = C.rho_c + np.tan(C.sig - phi)
    elif C.type == "pconic":
        rho = C.c2 * (C.c1 - np.tan(phi - C.sig))
    else:
        rho = C.rho_c - phi
    lamn = lam * C.n
    return rho * np.sin(lamn), C.rho_0 - rho * np.cos(lamn)


def sconics_inv(x, y, C: SconicsConsts):
    x = np.asarray(x, dtype=np.float64)
    y = C.rho_0 - np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    if C.n < 0:
        rho, x, y = -rho, -x, -y
    lam = np.arctan2(x, y) / C.n
    if C.type == "pconic":
        phi = np.arctan(C.c1 - rho / C.c2) + C.sig
    elif C.type == "murd2":
        phi = C.sig - np.arctan(rho - C.rho_c)
    else:
        phi = C.rho_c - rho
    return lam, phi


# --------------------------------------------------------------------------
# calcofi (line/station units — the builder disables the a-scaling)
# --------------------------------------------------------------------------

_CF_LINE_RAD = 0.0034906585039886592
_CF_STATION_RAD = 0.0011635528346628863
_CF_O_LINE = 80.0
_CF_O_STATION = 60.0
_CF_O_LAM = -2.1144663887911301
_CF_O_PHI = 0.59602993955606354
_CF_ROT = 0.52359877559829882


@dataclass(frozen=True)
class CalcofiConsts:
    e: float
    es: float


def calcofi_fwd(lam, phi, C: CalcofiConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    bad = np.abs(np.abs(phi) - HALFPI) <= 1e-10
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.es != 0.0:
            y = -np.log(tsfn(phi, np.sin(phi), C.e))
            oy = -math.log(float(tsfn(_CF_O_PHI, math.sin(_CF_O_PHI), C.e)))
        else:
            y = np.log(np.tan(FORTPI + 0.5 * phi))
            oy = math.log(math.tan(FORTPI + 0.5 * _CF_O_PHI))
        l1 = (y - oy) * math.tan(_CF_ROT)
        l2 = -lam - l1 + _CF_O_LAM
        ry = l2 * math.cos(_CF_ROT) * math.sin(_CF_ROT) + y
        if C.es != 0.0:
            ry = phi2(np.exp(-ry), C.e)
        else:
            ry = HALFPI - 2.0 * np.arctan(np.exp(-ry))
        x = _CF_O_LINE - RAD2DEG * (ry - _CF_O_PHI) * 5.0 / math.cos(_CF_ROT)
        yy = _CF_O_STATION + RAD2DEG * (ry - phi) * 15.0 / math.sin(_CF_ROT)
    return np.where(bad, np.nan, x), np.where(bad, np.nan, yy)


def calcofi_inv(x, y, C: CalcofiConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ry = _CF_O_PHI - _CF_LINE_RAD * (x - _CF_O_LINE) * math.cos(_CF_ROT)
    phi = ry - _CF_STATION_RAD * (y - _CF_O_STATION) * math.sin(_CF_ROT)
    if C.es != 0.0:
        oy = -math.log(float(tsfn(_CF_O_PHI, math.sin(_CF_O_PHI), C.e)))
        rym = -np.log(tsfn(ry, np.sin(ry), C.e))
        xym = -np.log(tsfn(phi, np.sin(phi), C.e))
    else:
        oy = math.log(math.tan(FORTPI + 0.5 * _CF_O_PHI))
        rym = np.log(np.tan(FORTPI + 0.5 * ry))
        xym = np.log(np.tan(FORTPI + 0.5 * phi))
    l1 = (xym - oy) * math.tan(_CF_ROT)
    l2 = (rym - xym) / (math.cos(_CF_ROT) * math.sin(_CF_ROT))
    lam = _CF_O_LAM - (l1 + l2)
    return lam, phi


# --------------------------------------------------------------------------
# tpeqd
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class TpeqdConsts:
    cp1: float; sp1: float; cp2: float; sp2: float
    ccs: float; cs: float; sc: float
    r2z0: float; z02: float; dlam2: float
    hz0: float; thz0: float; rhshz0: float
    ca: float; sa: float; lp: float; lamc: float
    lam0: float


def setup_tpeqd(lat_1: float, lon_1: float, lat_2: float, lon_2: float) -> TpeqdConsts:
    phi_1 = math.radians(lat_1); lam_1 = math.radians(lon_1)
    phi_2 = math.radians(lat_2); lam_2 = math.radians(lon_2)
    if phi_1 == phi_2 and lam_1 == lam_2:
        raise ValueError("tpeqd: points must be distinct")
    lam0 = float(adjlon(np.array([0.5 * (lam_1 + lam_2)]))[0])
    dlam2 = float(adjlon(np.array([lam_2 - lam_1]))[0])
    cp1, cp2 = math.cos(phi_1), math.cos(phi_2)
    sp1, sp2 = math.sin(phi_1), math.sin(phi_2)
    cs = cp1 * sp2
    sc = sp1 * cp2
    ccs = cp1 * cp2 * math.sin(dlam2)
    cmsc = cs - sc * math.cos(dlam2)
    z02 = math.atan2(math.hypot(cp2 * math.sin(dlam2), cmsc),
                     sp1 * sp2 + cp1 * cp2 * math.cos(dlam2))
    if z02 == 0.0:
        raise ValueError("tpeqd: degenerate axis")
    hz0 = 0.5 * z02
    A12 = math.atan2(cp2 * math.sin(dlam2), cmsc)
    pp = math.asin(cp1 * math.sin(A12))
    ca, sa = math.cos(pp), math.sin(pp)
    lp = float(adjlon(np.array([math.atan2(cp1 * math.cos(A12), sp1) - hz0]))[0])
    dlam2 *= 0.5
    lamc = HALFPI - math.atan2(math.sin(A12) * sp1, math.cos(A12)) - dlam2
    return TpeqdConsts(cp1, sp1, cp2, sp2, ccs, cs, sc,
                       0.5 / z02, z02 * z02, dlam2, hz0, math.tan(hz0),
                       0.5 / math.sin(hz0), ca, sa, lp, lamc, lam0)


def tpeqd_fwd(lam, phi, C: TpeqdConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sp = np.sin(phi)
    cp = np.cos(phi)
    dl1 = lam + C.dlam2
    dl2 = lam - C.dlam2
    z1 = np.arccos(np.clip(C.sp1 * sp + C.cp1 * cp * np.cos(dl1), -1, 1))
    z2 = np.arccos(np.clip(C.sp2 * sp + C.cp2 * cp * np.cos(dl2), -1, 1))
    z1 = z1 * z1
    z2 = z2 * z2
    t = z1 - z2
    x = C.r2z0 * t
    t = C.z02 - t
    y = C.r2z0 * np.sqrt(np.maximum(4.0 * C.z02 * z2 - t * t, 0.0))
    y = np.where(C.ccs * sp - cp * (C.cs * np.sin(dl1) - C.sc * np.sin(dl2)) < 0, -y, y)
    return x, y


def tpeqd_inv(x, y, C: TpeqdConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    cz1 = np.cos(np.hypot(y, x + C.hz0))
    cz2 = np.cos(np.hypot(y, x - C.hz0))
    s = cz1 + cz2
    d = cz1 - cz2
    lam = -np.arctan2(d, s * C.thz0)
    phi = np.arccos(np.clip(np.hypot(C.thz0 * s, d) * C.rhshz0, -1, 1))
    phi = np.where(y < 0, -phi, phi)
    sp = np.sin(phi)
    cp = np.cos(phi)
    lam = lam - C.lp
    cs_ = np.cos(lam)
    phi = np.arcsin(np.clip(C.sa * sp + C.ca * cp * cs_, -1, 1))
    lam = np.arctan2(cp * np.sin(lam), C.sa * cp * cs_ - C.ca * sp) + C.lamc
    return lam, phi


# --------------------------------------------------------------------------
# poly (American polyconic)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class PolyConsts:
    es: float
    one_es: float
    phi0: float
    ml0: float
    en: tuple
    ellips: bool


def setup_poly(ell: Ellipsoid, lat_0: float = 0.0) -> PolyConsts:
    phi0 = math.radians(lat_0)
    if ell.es != 0.0:
        en = _enfn(ell.n)
        ml0 = float(mlfn(phi0, math.sin(phi0), math.cos(phi0), en))
        return PolyConsts(ell.es, ell.one_es, phi0, ml0, en, True)
    return PolyConsts(0.0, 1.0, phi0, -phi0, (), False)


def poly_fwd(lam, phi, C: PolyConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    TOL = 1e-10
    eq = np.abs(phi) <= TOL
    with np.errstate(divide="ignore", invalid="ignore"):
        sp = np.sin(phi)
        cp = np.cos(phi)
        if C.ellips:
            ms = np.where(np.abs(cp) > TOL, msfn(sp, cp, C.es) / sp, 0.0)
            E = lam * sp
            x = ms * np.sin(E)
            y = (mlfn(phi, sp, cp, C.en) - C.ml0) + ms * (1.0 - np.cos(E))
            x = np.where(eq, lam, x)
            y = np.where(eq, -C.ml0, y)
        else:
            cot = 1.0 / np.tan(phi)
            E = lam * sp
            x = np.where(eq, lam, np.sin(E) * cot)
            y = np.where(eq, C.ml0, phi - C.phi0 + cot * (1.0 - np.cos(E)))
    return x, y


def poly_inv(x, y, C: PolyConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    TOL = 1e-10
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.ellips:
            yy = y + C.ml0
            eq = np.abs(yy) <= TOL
            r = yy * yy + x * x
            phi = yy.copy()
            for _ in range(20):
                sp = np.sin(phi)
                cp = np.cos(phi)
                s2ph = sp * cp
                mlp = np.sqrt(1.0 - C.es * sp * sp)
                c = sp * mlp / cp
                ml = mlfn(phi, sp, cp, C.en)
                mlb = ml * ml + r
                mlp = C.one_es / (mlp * mlp * mlp)
                dPhi = (
                    (ml + ml + c * mlb - 2.0 * yy * (c * ml + 1.0))
                    / (C.es * s2ph * (mlb - 2.0 * yy * ml) / c
                       + 2.0 * (yy - ml) * (c * mlp - 1.0 / s2ph) - mlp - mlp)
                )
                phi = phi + dPhi
                if np.all(np.abs(dPhi) <= 1e-12):
                    break
            c = np.sin(phi)
            lam = np.arcsin(np.clip(x * np.tan(phi) * np.sqrt(1.0 - C.es * c * c), -1, 1)) / np.sin(phi)
            lam = np.where(eq, x, lam)
            phi = np.where(eq, 0.0, phi)
            return lam, phi
        yy = C.phi0 + y
        eq = np.abs(yy) <= TOL
        B = x * x + yy * yy
        phi = yy.copy()
        for _ in range(10):
            tp = np.tan(phi)
            dphi = (yy * (phi * tp + 1.0) - phi - 0.5 * (phi * phi + B) * tp) \
                / ((phi - yy) / tp - 1.0)
            phi = phi - dphi
            if np.all(np.abs(dphi) <= 1e-10):
                break
        lam = np.arcsin(np.clip(x * np.tan(phi), -1, 1)) / np.sin(phi)
        lam = np.where(eq, x, lam)
        phi = np.where(eq, 0.0, phi)
    return lam, phi

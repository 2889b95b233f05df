"""Catalogue batch 4: remaining small projections from the reference's
registry — pseudocylindricals (eck2, hatano, putp6/putp6p, mbt_fps, mbtfpq),
cylindrical/conic sphericals (tcea, ccon, rpoly, bertin1953, oea) and small
ellipsoidals (lcca, gstmerc, col_urban, nzmg).

Each kernel is a numpy re-derivation of the same-named reference file in
/root/reference/src/projections/ (constants are the published Snyder/author
values the reference also uses). Vectorized: fixed-trip Newton loops with
convergence masks; no-inverse ops raise like the reference errors.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels import tmerc as k_tmerc
from proj_spark.kernels.common import phi2, tsfn

HALFPI = math.pi / 2


def _aasin(v):
    return np.arcsin(np.clip(v, -1.0, 1.0))


# ---------------------------------------------------------------------------
# eck2 (reference src/projections/eck2.cpp:13-45)
# ---------------------------------------------------------------------------

_ECK2_FXC = 0.46065886596178063902
_ECK2_FYC = 1.44720250911653531871


def eck2_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    s = np.sqrt(4.0 - 3.0 * np.sin(np.abs(phi)))
    x = _ECK2_FXC * lam * s
    y = _ECK2_FYC * (2.0 - s)
    return x, np.where(phi < 0, -y, y)


def eck2_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    s = 2.0 - np.abs(y) / _ECK2_FYC
    lam = x / (_ECK2_FXC * s)
    phi = _aasin((4.0 - s * s) / 3.0)
    return lam, np.where(y < 0, -phi, phi)


# ---------------------------------------------------------------------------
# hatano (reference src/projections/hatano.cpp:20-63)
# ---------------------------------------------------------------------------

_HAT = dict(CN=2.67595, CS=2.43763, RCN=0.37369906014686373063,
            RCS=0.41023453108141924738, FYCN=1.75859, FYCS=1.93052,
            RYCN=0.56863737426006061674, RYCS=0.51799515156538134803,
            FXC=0.85, RXC=1.17647058823529411764)


def hatano_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64).copy()
    c = np.sin(phi) * np.where(phi < 0, _HAT["CS"], _HAT["CN"])
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(20):
        th1 = (phi + np.sin(phi) - c) / (1.0 + np.cos(phi))
        phi = np.where(done, phi, phi - th1)
        done |= np.abs(th1) < 1e-7
        if done.all():
            break
    half = 0.5 * phi
    x = _HAT["FXC"] * lam * np.cos(half)
    y = np.sin(half) * np.where(half < 0, _HAT["FYCS"], _HAT["FYCN"])
    return x, y


def hatano_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    th = y * np.where(y < 0, _HAT["RYCS"], _HAT["RYCN"])
    th = _aasin(th)
    lam = _HAT["RXC"] * x / np.cos(th)
    th = th + th
    phi = (th + np.sin(th)) * np.where(y < 0, _HAT["RCS"], _HAT["RCN"])
    return lam, _aasin(phi)


# ---------------------------------------------------------------------------
# putp6 / putp6p (reference src/projections/putp6.cpp:12-96)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Putp6Consts:
    C_x: float
    C_y: float
    A: float
    B: float
    D: float


PUTP6 = Putp6Consts(1.01346, 0.91910, 4.0, 2.1471437182129378784, 2.0)
PUTP6P = Putp6Consts(0.44329, 0.80404, 6.0, 5.61125, 3.0)


def putp6_fwd(lam, phi, C: Putp6Consts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    p = C.B * np.sin(phi)
    th = phi * 1.10265779
    done = np.zeros(th.shape, dtype=bool)
    for _ in range(10):
        r = np.sqrt(1.0 + th * th)
        V = ((C.A - r) * th - np.log(th + r) - p) / (C.A - 2.0 * r)
        th = np.where(done, th, th - V)
        done |= np.abs(V) < 1e-10
        if done.all():
            break
    r = np.sqrt(1.0 + th * th)
    return C.C_x * lam * (C.D - r), C.C_y * th


def putp6_inv(x, y, C: Putp6Consts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    th = y / C.C_y
    r = np.sqrt(1.0 + th * th)
    lam = x / (C.C_x * (C.D - r))
    phi = _aasin(((C.A - r) * th - np.log(th + r)) / C.B)
    return lam, phi


# ---------------------------------------------------------------------------
# mbt_fps (reference src/projections/mbt_fps.cpp:9-50)
# ---------------------------------------------------------------------------

def mbt_fps_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64).copy()
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    C1_2 = 1.0 / 3.0
    k = C3 * np.sin(phi)
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(10):
        t = phi / C2
        V = (C1 * np.sin(t) + np.sin(phi) - k) / (C1_2 * np.cos(t) + np.cos(phi))
        phi = np.where(done, phi, phi - V)
        done |= np.abs(V) < 1e-7
        if done.all():
            break
    t = phi / C2
    return 0.22248 * lam * (1.0 + 3.0 * np.cos(phi) / np.cos(t)), 1.44492 * np.sin(t)


def mbt_fps_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    C1, C2, C3 = 0.45503, 1.36509, 1.41546
    t = _aasin(y / 1.44492)
    phi = C2 * t
    lam = x / (0.22248 * (1.0 + 3.0 * np.cos(phi) / np.cos(t)))
    phi = _aasin((C1 * np.sin(t) + np.sin(phi)) / C3)
    return lam, phi


# ---------------------------------------------------------------------------
# mbtfpq (reference src/projections/mbtfpq.cpp:13-60)
# ---------------------------------------------------------------------------

def mbtfpq_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64).copy()
    Cc = 1.70710678118654752440
    c = Cc * np.sin(phi)
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(20):
        th1 = (np.sin(0.5 * phi) + np.sin(phi) - c) / (
            0.5 * np.cos(0.5 * phi) + np.cos(phi))
        phi = np.where(done, phi, phi - th1)
        done |= np.abs(th1) < 1e-7
        if done.all():
            break
    x = 0.31245971410378249250 * lam * (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi))
    y = 1.87475828462269495505 * np.sin(0.5 * phi)
    return x, y


def mbtfpq_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    RC = 0.58578643762690495119
    t = np.clip(0.53340209679417701685 * y, -1.0, 1.0)
    phi = 2.0 * np.arcsin(t)
    lam = 3.20041258076506210122 * x / (1.0 + 2.0 * np.cos(phi) / np.cos(0.5 * phi))
    phi = _aasin(RC * (t + np.sin(phi)))
    return lam, phi


# ---------------------------------------------------------------------------
# tcea (reference src/projections/tcea.cpp:8-30); k0 applied inside like the
# reference (x/k0, y*k0)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class TceaConsts:
    k0: float
    phi0: float


def tcea_fwd(lam, phi, C: TceaConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    x = np.cos(phi) * np.sin(lam) / C.k0
    y = C.k0 * (np.arctan2(np.tan(phi), np.cos(lam)) - C.phi0)
    return x, y


def tcea_inv(x, y, C: TceaConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    yy = y / C.k0 + C.phi0
    xx = x * C.k0
    t = np.sqrt(np.maximum(1.0 - xx * xx, 0.0))
    return np.arctan2(xx, t * np.cos(yy)), _aasin(t * np.sin(yy))


# ---------------------------------------------------------------------------
# ccon (reference src/projections/ccon.cpp:39-62)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class CconConsts:
    phi1: float
    ctgphi1: float
    sinphi1: float


def setup_ccon(lat_1: float) -> CconConsts:
    phi1 = math.radians(lat_1)
    if abs(phi1) < 1e-10:
        raise ValueError("ccon: |lat_1| must be > 0")
    return CconConsts(phi1, 1.0 / math.tan(phi1), math.sin(phi1))


def ccon_fwd(lam, phi, C: CconConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    r = C.ctgphi1 - np.tan(phi - C.phi1)
    return r * np.sin(lam * C.sinphi1), C.ctgphi1 - r * np.cos(lam * C.sinphi1)


def ccon_inv(x, y, C: CconConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    yy = C.ctgphi1 - y
    phi = C.phi1 - np.arctan(np.hypot(x, yy) - C.ctgphi1)
    return np.arctan2(x, yy) / C.sinphi1, phi


# ---------------------------------------------------------------------------
# rpoly (reference src/projections/rpoly.cpp:17-41) — no inverse
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RpolyConsts:
    phi0: float
    fxa: float
    fxb: float
    mode: bool


def setup_rpoly(lat_ts: float, lat_0: float) -> RpolyConsts:
    phi1 = abs(math.radians(lat_ts))
    mode = phi1 > 1e-9
    fxb = 0.5 * math.sin(phi1) if mode else 0.0
    fxa = 0.5 / fxb if mode else 0.0
    return RpolyConsts(math.radians(lat_0), fxa, fxb, mode)


def rpoly_fwd(lam, phi, C: RpolyConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    fa = np.tan(lam * C.fxb) * C.fxa if C.mode else 0.5 * lam
    flat = np.abs(phi) < 1e-9
    with np.errstate(divide="ignore", invalid="ignore"):
        cot = 1.0 / np.tan(np.where(flat, 1.0, phi))
        fa2 = 2.0 * np.arctan(fa * np.sin(phi))
        x = np.where(flat, fa + fa, np.sin(fa2) * cot)
        y = np.where(flat, -C.phi0, phi - C.phi0 + (1.0 - np.cos(fa2)) * cot)
    return x, y


# ---------------------------------------------------------------------------
# bertin1953 (reference src/projections/bertin1953.cpp:27-70) — no inverse;
# fixed rotation phi0=-42, lam shift -16.5 deg applied inside fwd.
# ---------------------------------------------------------------------------

_BERTIN_CDP = math.cos(math.radians(-42.0))
_BERTIN_SDP = math.sin(math.radians(-42.0))


def bertin1953_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64) + math.radians(-16.5)
    phi = np.asarray(phi, dtype=np.float64)
    fu, k, w = 1.4, 12.0, 1.68
    cosphi = np.cos(phi)
    x = np.cos(lam) * cosphi
    y = np.sin(lam) * cosphi
    z = np.sin(phi)
    z0 = z * _BERTIN_CDP + x * _BERTIN_SDP
    lam = np.arctan2(y, x * _BERTIN_CDP - z * _BERTIN_SDP)
    phi = _aasin(z0)
    lam = np.remainder(lam + math.pi, 2 * math.pi) - math.pi
    cond = lam + phi < -fu
    d = np.where(cond, (lam - phi + 1.6) * (lam + phi + fu) / 8.0, 0.0)
    lam = lam + d
    phi = phi - 0.8 * d * np.sin(phi + math.pi / 2.0)
    cosphi = np.cos(phi)
    d = np.sqrt(2.0 / (1.0 + cosphi * np.cos(lam / 2.0)))
    xo = w * d * cosphi * np.sin(lam / 2.0)
    yo = d * np.sin(phi)
    d = (1.0 - np.cos(lam * phi)) / k
    xo = np.where(yo < 0, xo * (1.0 + d), xo)
    yo = np.where(yo > 0, yo * (1.0 + d / 1.5 * xo * xo), yo)
    return xo, yo


# ---------------------------------------------------------------------------
# oea (reference src/projections/oea.cpp:13-50)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class OeaConsts:
    theta: float
    m: float
    n: float
    two_r_m: float
    two_r_n: float
    rm: float
    rn: float
    hm: float
    hn: float
    cp0: float
    sp0: float


def setup_oea(n: float, m: float, theta_deg: float, lat_0: float) -> OeaConsts:
    if n <= 0 or m <= 0:
        raise ValueError("oea: n and m must be > 0")
    theta = math.radians(theta_deg)
    phi0 = math.radians(lat_0)
    rn, rm = 1.0 / n, 1.0 / m
    return OeaConsts(theta, m, n, 2.0 * rm, 2.0 * rn, rm, rn,
                     0.5 * m, 0.5 * n, math.cos(phi0), math.sin(phi0))


def oea_fwd(lam, phi, C: OeaConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    cp, sp = np.cos(phi), np.sin(phi)
    cl = np.cos(lam)
    Az = np.arctan2(cp * np.sin(lam), C.cp0 * sp - C.sp0 * cp * cl) + C.theta
    shz = np.sin(0.5 * np.arccos(np.clip(C.sp0 * sp + C.cp0 * cp * cl, -1, 1)))
    M = _aasin(shz * np.sin(Az))
    N = _aasin(shz * np.cos(Az) * np.cos(M) / np.cos(M * C.two_r_m))
    y = C.n * np.sin(N * C.two_r_n)
    x = C.m * np.sin(M * C.two_r_m) * np.cos(N) / np.cos(N * C.two_r_n)
    return x, y


def oea_inv(x, y, C: OeaConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    N = C.hn * _aasin(y * C.rn)
    M = C.hm * _aasin(x * C.rm * np.cos(N * C.two_r_n) / np.cos(N))
    xp = 2.0 * np.sin(M)
    yp = 2.0 * np.sin(N) * np.cos(M * C.two_r_m) / np.cos(M)
    Az = np.arctan2(xp, yp) - C.theta
    cAz = np.cos(Az)
    z = 2.0 * _aasin(0.5 * np.hypot(xp, yp))
    sz, cz = np.sin(z), np.cos(z)
    phi = _aasin(C.sp0 * cz + C.cp0 * sz * cAz)
    lam = np.arctan2(sz * np.sin(Az), C.cp0 * cz - C.sp0 * sz * cAz)
    return lam, phi


# ---------------------------------------------------------------------------
# lcca (reference src/projections/lcca.cpp:74-151) — truncated cubic Lambert
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LccaConsts:
    en: tuple[float, ...]
    r0: float
    l: float
    M0: float
    C: float
    k0: float


def setup_lcca(ell: Ellipsoid, lat_0: float, k0: float = 1.0) -> LccaConsts:
    if lat_0 == 0.0:
        raise ValueError("lcca: lat_0 must be nonzero")
    phi0 = math.radians(lat_0)
    en = k_tmerc._enfn(ell.n)
    sl = math.sin(phi0)
    M0 = float(k_tmerc.mlfn(phi0, sl, math.cos(phi0), en))
    s2p0 = sl * sl
    R0 = 1.0 / (1.0 - ell.es * s2p0)
    N0 = math.sqrt(R0)
    R0 *= ell.one_es * N0
    r0 = N0 / math.tan(phi0)
    C = 1.0 / (6.0 * R0 * N0)
    return LccaConsts(en, r0, sl, M0, C, k0)


def lcca_fwd(lam, phi, C: LccaConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    S = k_tmerc.mlfn(phi, np.sin(phi), np.cos(phi), C.en) - C.M0
    dr = S * (1.0 + S * S * C.C)
    r = C.r0 - dr
    lml = lam * C.l
    return C.k0 * (r * np.sin(lml)), C.k0 * (C.r0 - r * np.cos(lml))


def lcca_inv(x, y, C: LccaConsts):
    x = np.asarray(x, dtype=np.float64) / C.k0
    y = np.asarray(y, dtype=np.float64) / C.k0
    theta = np.arctan2(x, C.r0 - y)
    dr = y - x * np.tan(0.5 * theta)
    lam = theta / C.l
    S = dr.copy()
    done = np.zeros(S.shape, dtype=bool)
    for _ in range(10):
        dif = (S * (1.0 + S * S * C.C) - dr) / (1.0 + 3.0 * S * S * C.C)
        S = np.where(done, S, S - dif)
        done |= np.abs(dif) < 1e-12
        if done.all():
            break
    phi = k_tmerc.inv_mlfn(S + C.M0, C.en)
    return lam, phi


# ---------------------------------------------------------------------------
# gstmerc (reference src/projections/gstmerc.cpp:22-90) — NOTE the kernel
# works in REAL metres scaled by ra (reference multiplies by P->ra so the
# generic a-scaling restores metres); constants n2/XS/YS carry a and k0.
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GstmercConsts:
    c: float
    n1: float
    n2: float
    XS: float
    YS: float
    ra: float
    a: float
    e: float


def setup_gstmerc(ell: Ellipsoid, lat_0: float, k0: float = 1.0) -> GstmercConsts:
    phi0 = math.radians(lat_0)
    es, e = ell.es, ell.e
    n1 = math.sqrt(1.0 + es * math.cos(phi0) ** 4 / (1.0 - es))
    phic = math.asin(math.sin(phi0) / n1)
    c = (math.log(float(tsfn(np.array([-phic]), np.array([-math.sin(phi0) / n1]), 0.0)[0]))
         - n1 * math.log(float(tsfn(np.array([-phi0]), np.array([-math.sin(phi0)]), e)[0])))
    n2 = k0 * ell.a * math.sqrt(1.0 - es) / (1.0 - es * math.sin(phi0) ** 2)
    XS = 0.0
    YS = -n2 * phic
    return GstmercConsts(c, n1, n2, XS, YS, ell.ra, ell.a, e)


def gstmerc_fwd(lam, phi, C: GstmercConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    L = C.n1 * lam
    Ls = C.c + C.n1 * np.log(tsfn(-phi, -np.sin(phi), C.e))
    sinLs1 = np.sin(L) / np.cosh(Ls)
    Ls1 = np.log(tsfn(-np.arcsin(sinLs1), -sinLs1, 0.0))
    x = (C.XS + C.n2 * Ls1) * C.ra
    y = (C.YS + C.n2 * np.arctan(np.sinh(Ls) / np.cos(L))) * C.ra
    return x, y


def gstmerc_inv(x, y, C: GstmercConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    L = np.arctan(np.sinh((x * C.a - C.XS) / C.n2) / np.cos((y * C.a - C.YS) / C.n2))
    sinC = np.sin((y * C.a - C.YS) / C.n2) / np.cosh((x * C.a - C.XS) / C.n2)
    LC = np.log(tsfn(-np.arcsin(sinC), -sinC, 0.0))
    lam = L / C.n1
    phi = -phi2(np.exp((LC - C.c) / C.n1), C.e)
    return lam, phi


# ---------------------------------------------------------------------------
# col_urban (reference src/projections/col_urban.cpp:19-67; IOGP GN7-2)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ColUrbanConsts:
    phi0: float
    es: float
    h0: float
    rho0: float
    A: float
    B: float
    C: float
    D: float


def setup_col_urban(ell: Ellipsoid, lat_0: float, h_0: float) -> ColUrbanConsts:
    phi0 = math.radians(lat_0)
    es = ell.es
    h0 = h_0 / ell.a
    sinphi0 = math.sin(phi0)
    nu0 = 1.0 / math.sqrt(1.0 - es * sinphi0 * sinphi0)
    A = 1.0 + h0 / nu0
    rho0 = (1.0 - es) / (1.0 - es * sinphi0 * sinphi0) ** 1.5
    B = math.tan(phi0) / (2.0 * rho0 * nu0)
    Cc = 1.0 + h0
    D = rho0 * (1.0 + h0 / (1.0 - es))
    return ColUrbanConsts(phi0, es, h0, rho0, A, B, Cc, D)


def col_urban_fwd(lam, phi, C: ColUrbanConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    cosphi, sinphi = np.cos(phi), np.sin(phi)
    nu = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
    lnc = lam * nu * cosphi
    x = C.A * lnc
    sinphi_m = np.sin(0.5 * (phi + C.phi0))
    rho_m = (1.0 - C.es) / (1.0 - C.es * sinphi_m * sinphi_m) ** 1.5
    G = 1.0 + C.h0 / rho_m
    y = G * C.rho0 * ((phi - C.phi0) + C.B * lnc * lnc)
    return x, y


def col_urban_inv(x, y, C: ColUrbanConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    phi = C.phi0 + y / C.D - C.B * (x / C.C) * (x / C.C)
    sinphi = np.sin(phi)
    nu = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
    lam = x / (C.C * nu * np.cos(phi))
    return lam, phi


# ---------------------------------------------------------------------------
# nzmg (reference src/projections/nzmg.cpp:38-110) — 6th-order complex
# polynomial on the International ellipsoid; fixed lam0/phi0/x0/y0 applied by
# the builder. Kernel works in units of a (reference divides via P->a scale).
# ---------------------------------------------------------------------------

_NZMG_BF = np.array([
    0.7557853228 + 0.0j, 0.249204646 + 0.003371507j,
    -0.001541739 + 0.041058560j, -0.10162907 + 0.01727609j,
    -0.26623489 - 0.36249218j, -0.6870983 - 1.1651967j,
])
_NZMG_TPSI = (0.6399175073, -0.1358797613, 0.063294409, -0.02526853,
              0.0117879, -0.0055161, 0.0026906, -0.001333, 0.00067, -0.00034)
_NZMG_TPHI = (1.5627014243, 0.5185406398, -0.03333098, -0.1052906,
              -0.0368594, 0.007317, 0.01220, 0.00394, -0.0013)
_NZMG_PHI0 = math.radians(-41.0)
_RAD_TO_SEC5 = 2.062648062470963551564733573
_SEC5_TO_RAD = 0.4848136811095359935899141023


def _zpoly(z: np.ndarray, coefs: np.ndarray) -> np.ndarray:
    """Horner evaluation of sum(c_k * z^k) for k=1..n (reference pj_zpoly1:
    a polynomial with zero constant term, multiplied through by z)."""
    acc = np.full(z.shape, coefs[-1], dtype=np.complex128)
    for c in coefs[-2::-1]:
        acc = acc * z + c
    return acc * z


def _zpolyd(z: np.ndarray, coefs: np.ndarray):
    """(value, derivative) of the same polynomial."""
    n = len(coefs) - 1
    acc = np.full(z.shape, coefs[-1], dtype=np.complex128)
    der = np.full(z.shape, coefs[-1] * (n + 1), dtype=np.complex128)
    for k in range(n - 1, -1, -1):
        acc = acc * z + coefs[k]
        der = der * z + coefs[k] * (k + 1)
    return acc * z, der


def nzmg_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = (np.asarray(phi, dtype=np.float64) - _NZMG_PHI0) * _RAD_TO_SEC5
    pr = np.full(phi.shape, _NZMG_TPSI[-1])
    for c in _NZMG_TPSI[-2::-1]:
        pr = c + phi * pr
    pr = pr * phi
    z = pr + 1j * lam
    w = _zpoly(z, _NZMG_BF)
    return w.imag, w.real


def nzmg_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = y + 1j * x
    target = p.copy()
    done = np.zeros(p.shape, dtype=bool)
    for _ in range(20):
        f, fp = _zpolyd(p, _NZMG_BF)
        dp = -(f - target) / fp
        p = np.where(done, p, p + dp)
        done |= (np.abs(dp.real) + np.abs(dp.imag)) <= 1e-10
        if done.all():
            break
    lam = p.imag
    pr = p.real
    phi = np.full(pr.shape, _NZMG_TPHI[-1])
    for c in _NZMG_TPHI[-2::-1]:
        phi = c + pr * phi
    phi = _NZMG_PHI0 + pr * phi * _SEC5_TO_RAD
    return lam, phi


# ---------------------------------------------------------------------------
# mod_ster family: mil_os, lee_os, gs48, alsk, gs50 (reference
# src/projections/mod_ster.cpp — oblique stereographic on the conformal
# sphere fed through a fixed complex polynomial; Snyder & Linck, USGS-NMD)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ModSterConsts:
    zcoeff: tuple          # complex coefficients C_1..C_n (value = sum C_k z^k)
    e: float               # eccentricity (0 for spherical variants)
    schio: float
    cchio: float
    lam0: float            # fixed central meridian [rad]
    phi0: float
    a: float               # fixed earth radius/semimajor [m]


_MODSTER_TABLES = {
    # name -> (coeffs, lam0_deg, phi0_deg, fixed_sphere_a, ell_override)
    "mil_os": ((0.924500 + 0j, 0j, 0.019430 + 0j), 20.0, 18.0, None, None),
    "lee_os": ((0.721316 + 0j, 0j, -0.0088162 - 0.00617325j),
               -165.0, -10.0, None, None),
    "gs48": ((0.98879 + 0j, 0j, -0.050909 + 0j, 0j, 0.075528 + 0j),
             -96.0, 39.0, 6370997.0, None),
    "alsk": (None, -152.0, 64.0, 6370997.0,
             ((0.9945303 + 0j, 0.0052083 - 0.0027404j, 0.0072721 + 0.0048181j,
               -0.0151089 - 0.1932526j, 0.0642675 - 0.1381226j,
               0.3582802 - 0.2884586j),
              (0.9972523 + 0j, 0.0052513 - 0.0041175j, 0.0074606 + 0.0048125j,
               -0.0153783 - 0.1968253j, 0.0636871 - 0.1408027j,
               0.3660976 - 0.2937382j))),
    "gs50": (None, -120.0, 45.0, 6370997.0,
             ((0.9827497 + 0j, 0.0210669 + 0.0053804j, -0.1031415 - 0.0571664j,
               -0.0323337 - 0.0322847j, 0.0502303 + 0.1211983j,
               0.0251805 + 0.0895678j, -0.0012315 - 0.1416121j,
               0.0072202 - 0.1317091j, -0.0194029 + 0.0759677j,
               -0.0210072 + 0.0834037j),
              (0.9842990 + 0j, 0.0211642 + 0.0037608j, -0.1036018 - 0.0575102j,
               -0.0329095 - 0.0320119j, 0.0499471 + 0.1223335j,
               0.0260460 + 0.0899805j, 0.0007388 - 0.1435792j,
               0.0075848 - 0.1334108j, -0.0216473 + 0.0776645j,
               -0.0225161 + 0.0853673j))),
}


def setup_mod_ster(name: str, es_user: float) -> ModSterConsts:
    coeffs, lam0_d, phi0_d, a_sph, pair = _MODSTER_TABLES[name]
    if pair is not None:           # alsk / gs50: fixed earth per es flag
        if es_user != 0.0:
            coeffs = pair[0]
            a = 6378206.4
            es = 0.00676866        # fixed Clarke-ish values (mod_ster.cpp)
        else:
            coeffs = pair[1]
            a = a_sph
            es = 0.0
    else:
        a = a_sph                  # may be None -> caller supplies ell.a
        es = 0.0                   # mil_os/lee_os/gs48 force es=0
    e = math.sqrt(es)
    phi0 = math.radians(phi0_d)
    if es != 0.0:
        esphi = e * math.sin(phi0)
        chio = 2.0 * math.atan(
            math.tan((HALFPI + phi0) * 0.5)
            * ((1.0 - esphi) / (1.0 + esphi)) ** (e * 0.5)) - HALFPI
    else:
        chio = phi0
    return ModSterConsts(tuple(coeffs), e, math.sin(chio), math.cos(chio),
                         math.radians(lam0_d), phi0, a)


def mod_ster_fwd(lam, phi, C: ModSterConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sinlon, coslon = np.sin(lam), np.cos(lam)
    esphi = C.e * np.sin(phi)
    chi = 2.0 * np.arctan(
        np.tan((HALFPI + phi) * 0.5)
        * ((1.0 - esphi) / (1.0 + esphi)) ** (C.e * 0.5)) - HALFPI
    schi, cchi = np.sin(chi), np.cos(chi)
    denom = 1.0 + C.schio * schi + C.cchio * cchi * coslon
    with np.errstate(divide="ignore", invalid="ignore"):
        s = np.where(denom == 0, np.nan, 2.0 / denom)
    z = s * cchi * sinlon + 1j * (s * (C.cchio * schi - C.schio * cchi * coslon))
    w = _zpoly(z, np.array(C.zcoeff))
    return w.real, w.imag


def mod_ster_inv(x, y, C: ModSterConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    p = x + 1j * y
    target = p.copy()
    done = np.zeros(p.shape, dtype=bool)
    coefs = np.array(C.zcoeff)
    for _ in range(20):
        f, fp = _zpolyd(p, coefs)
        dp = -(f - target) / fp
        p = np.where(done, p, p + dp)
        done |= (np.abs(dp.real) + np.abs(dp.imag)) <= 1e-12
        if done.all():
            break
    rh = np.hypot(p.real, p.imag)
    z = 2.0 * np.arctan(0.5 * rh)
    sinz, cosz = np.sin(z), np.cos(z)
    with np.errstate(divide="ignore", invalid="ignore"):
        chi = np.arcsin(np.clip(
            cosz * C.schio + p.imag * sinz * C.cchio / rh, -1, 1))
        phi = chi.copy()
        pdone = np.zeros(phi.shape, dtype=bool)
        for _ in range(20):
            esphi = C.e * np.sin(phi)
            dphi = 2.0 * np.arctan(
                np.tan((HALFPI + chi) * 0.5)
                * ((1.0 + esphi) / (1.0 - esphi)) ** (C.e * 0.5)) - HALFPI - phi
            phi = np.where(pdone, phi, phi + dphi)
            pdone |= np.abs(dphi) <= 1e-12
            if pdone.all():
                break
        lam = np.arctan2(p.real * sinz,
                         rh * C.cchio * cosz - p.imag * C.schio * sinz)
    origin = np.abs(rh) <= 1e-12
    lam = np.where(origin, 0.0, lam)
    phi = np.where(origin, C.phi0, phi)
    return lam, phi


# ---------------------------------------------------------------------------
# rouss — Roussilhe Stereographic (reference src/projections/rouss.cpp:41-154:
# bivariate series in (meridian-distance offset s, normalized longitude al))
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class RoussConsts:
    es: float
    k0: float
    s0: float
    en: dict
    A: tuple
    B: tuple
    C: tuple
    D: tuple


def setup_rouss(ell: Ellipsoid, lat_0: float, k0: float = 1.0) -> RoussConsts:
    from proj_spark.kernels.common import mdist, mdist_ini

    phi0 = math.radians(lat_0)
    en = mdist_ini(ell.es)
    sp0 = math.sin(phi0)
    s0 = float(mdist(np.array([phi0]), np.array([sp0]),
                     np.array([math.cos(phi0)]), en)[0])
    es2 = ell.es * sp0 * sp0
    t = 1.0 - es2
    N0 = 1.0 / math.sqrt(t)
    R2 = t * t / ell.one_es       # (R/R0)^2
    R4 = R2 * R2
    tt = math.tan(phi0)
    t2 = tt * tt
    A1 = R2 / 4.0
    A2 = R2 * (2 * t2 - 1.0 - 2.0 * es2) / 12.0
    A3 = R2 * tt * (1.0 + 4.0 * t2) / (12.0 * N0)
    A4 = R4 / 24.0
    A5 = R4 * (-1.0 + t2 * (11.0 + 12.0 * t2)) / 24.0
    A6 = R4 * (-2.0 + t2 * (11.0 - 2.0 * t2)) / 240.0
    B1 = tt / (2.0 * N0)
    B2 = R2 / 12.0
    B3 = R2 * (1.0 + 2.0 * t2 - 2.0 * es2) / 4.0
    B4 = R2 * tt * (2.0 - t2) / (24.0 * N0)
    B5 = R2 * tt * (5.0 + 4.0 * t2) / (8.0 * N0)
    B6 = R4 * (-2.0 + t2 * (-5.0 + 6.0 * t2)) / 48.0
    B7 = R4 * (5.0 + t2 * (19.0 + 12.0 * t2)) / 24.0
    B8 = R4 / 120.0
    C1 = A1
    C2 = A2
    C3 = R2 * tt * (1.0 + t2) / (3.0 * N0)
    C4 = R4 * (-3.0 + t2 * (34.0 + 22.0 * t2)) / 240.0
    C5 = R4 * (4.0 + t2 * (13.0 + 12.0 * t2)) / 24.0
    C6 = R4 / 16.0
    C7 = R4 * tt * (11.0 + t2 * (33.0 + t2 * 16.0)) / (48.0 * N0)
    C8 = R4 * tt * (1.0 + t2 * 4.0) / (36.0 * N0)
    D1 = tt / (2.0 * N0)
    D2 = R2 / 12.0
    D3 = R2 * (2 * t2 + 1.0 - 2.0 * es2) / 4.0
    D4 = R2 * tt * (1.0 + t2) / (8.0 * N0)
    D5 = R2 * tt * (1.0 + t2 * 2.0) / (4.0 * N0)
    D6 = R4 * (1.0 + t2 * (6.0 + t2 * 6.0)) / 16.0
    D7 = R4 * t2 * (3.0 + t2 * 4.0) / 8.0
    D8 = R4 / 80.0
    D9 = R4 * tt * (-21.0 + t2 * (178.0 - t2 * 26.0)) / 720.0
    D10 = R4 * tt * (29.0 + t2 * (86.0 + t2 * 48.0)) / (96.0 * N0)
    D11 = R4 * tt * (37.0 + t2 * 44.0) / (96.0 * N0)
    return RoussConsts(ell.es, k0, s0, en,
                       (A1, A2, A3, A4, A5, A6),
                       (B1, B2, B3, B4, B5, B6, B7, B8),
                       (C1, C2, C3, C4, C5, C6, C7, C8),
                       (D1, D2, D3, D4, D5, D6, D7, D8, D9, D10, D11))


def rouss_fwd(lam, phi, Q: RoussConsts):
    from proj_spark.kernels.common import mdist

    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    cp, sp = np.cos(phi), np.sin(phi)
    s = mdist(phi, sp, cp, Q.en) - Q.s0
    s2 = s * s
    al = lam * cp / np.sqrt(1.0 - Q.es * sp * sp)
    al2 = al * al
    A1, A2, A3, A4, A5, A6 = Q.A
    B1, B2, B3, B4, B5, B6, B7, B8 = Q.B
    x = Q.k0 * al * (1.0 + s2 * (A1 + s2 * A4)
                     - al2 * (A2 + s * A3 + s2 * A5 + al2 * A6))
    y = Q.k0 * (al2 * (B1 + al2 * B4)
                + s * (1.0 + al2 * (B3 - al2 * B6) + s2 * (B2 + s2 * B8)
                       + s * al2 * (B5 + s * B7)))
    return x, y


def rouss_inv(x, y, Q: RoussConsts):
    from proj_spark.kernels.common import inv_mdist

    x = np.asarray(x, dtype=np.float64) / Q.k0
    y = np.asarray(y, dtype=np.float64) / Q.k0
    x2 = x * x
    y2 = y * y
    C1, C2, C3, C4, C5, C6, C7, C8 = Q.C
    D1, D2, D3, D4, D5, D6, D7, D8, D9, D10, D11 = Q.D
    al = x * (1.0 - C1 * y2
              + x2 * (C2 + C3 * y - C4 * x2 + C5 * y2 - C7 * x2 * y)
              + y2 * (C6 * y2 - C8 * x2 * y))
    s = Q.s0 + y * (1.0 + y2 * (-D2 + D8 * y2)) + x2 * (
        -D1 + y * (-D3 + y * (-D5 + y * (-D7 + y * D11)))
        + x2 * (D4 + y * (D6 + y * D10) - x2 * D9))
    phi = inv_mdist(s, Q.en)
    sp = np.sin(phi)
    lam = al * np.sqrt(1.0 - Q.es * sp * sp) / np.cos(phi)
    return lam, phi


# ---------------------------------------------------------------------------
# imw_p — International Map of the World Polyconic (reference
# src/projections/imw_p.cpp; Snyder's modified-polyconic construction)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class ImwPConsts:
    es: float
    en: tuple
    phi_1: float
    phi_2: float
    lam_1: float
    sphi_1: float
    sphi_2: float
    R_1: float
    R_2: float
    C2: float
    P: float
    Q: float
    Pp: float
    Qp: float
    mode: str   # none | phi1zero | phi2zero


def setup_imw_p(ell: Ellipsoid, lat_1: float, lat_2: float,
                lon_1: float | None) -> ImwPConsts:
    phi_1 = math.radians(lat_1)
    phi_2 = math.radians(lat_2)
    delta = 0.5 * (phi_2 - phi_1)
    sig = 0.5 * (phi_2 + phi_1)
    if abs(delta) < 1e-10 or abs(sig) < 1e-10:
        raise ValueError("imw_p: |lat_1 - lat_2| and |lat_1 + lat_2| must be > 0")
    if phi_2 < phi_1:
        phi_1, phi_2 = phi_2, phi_1
    if lon_1 is not None:
        lam_1 = math.radians(lon_1)
    else:
        s = abs(math.degrees(sig))
        lam_1 = math.radians(2.0 if s <= 60 else (4.0 if s <= 76 else 8.0))
    en = k_tmerc._enfn(ell.n)

    def corner(phi):
        sp = math.sin(phi)
        R = 1.0 / (math.tan(phi) * math.sqrt(1.0 - ell.es * sp * sp))
        F = lam_1 * sp
        return R * math.sin(F), R * (1.0 - math.cos(F)), sp, R

    mode = "none"
    if phi_1 != 0.0:
        x1, y1, sphi_1, R_1 = corner(phi_1)
    else:
        mode = "phi1zero"
        x1, y1, sphi_1, R_1 = lam_1, 0.0, 0.0, 0.0
    if phi_2 != 0.0:
        x2, T2, sphi_2, R_2 = corner(phi_2)
    else:
        mode = "phi2zero"
        x2, T2, sphi_2, R_2 = lam_1, 0.0, 0.0, 0.0
    m1 = float(k_tmerc.mlfn(phi_1, sphi_1, math.cos(phi_1), en))
    m2 = float(k_tmerc.mlfn(phi_2, sphi_2, math.cos(phi_2), en))
    t = m2 - m1
    s = x2 - x1
    y2 = math.sqrt(t * t - s * s) + y1
    C2 = y2 - T2
    t = 1.0 / t
    return ImwPConsts(
        ell.es, en, phi_1, phi_2, lam_1, sphi_1, sphi_2, R_1, R_2, C2,
        (m2 * y1 - m1 * y2) * t, (y2 - y1) * t,
        (m2 * x1 - m1 * x2) * t, (x2 - x1) * t, mode)


def _imw_p_loc(lam, phi, C: ImwPConsts):
    """(x, y, yc) of the construction (reference loc_for)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        sp = np.sin(phi)
        m = k_tmerc.mlfn(phi, sp, np.cos(phi), C.en)
        xa = C.Pp + C.Qp * m
        ya = C.P + C.Q * m
        R = 1.0 / (np.tan(phi) * np.sqrt(1.0 - C.es * sp * sp))
        Cv = np.sqrt(np.maximum(R * R - xa * xa, 0.0))
        Cv = np.where(phi < 0, -Cv, Cv)
        Cv = Cv + ya - R
        if C.mode == "phi2zero":
            xb = lam
            yb = np.full_like(lam, C.C2)
        else:
            t = lam * C.sphi_2
            xb = C.R_2 * np.sin(t)
            yb = C.C2 + C.R_2 * (1.0 - np.cos(t))
        if C.mode == "phi1zero":
            xc = lam
            yc = np.zeros_like(lam)
        else:
            t = lam * C.sphi_1
            xc = C.R_1 * np.sin(t)
            yc = C.R_1 * (1.0 - np.cos(t))
        D = (xb - xc) / (yb - yc)
        B = xc + D * (Cv + R - yc)
        x = D * np.sqrt(np.maximum(R * R * (1 + D * D) - B * B, 0.0))
        x = np.where(phi > 0, -x, x)
        x = (B + x) / (1.0 + D * D)
        y = np.sqrt(np.maximum(R * R - x * x, 0.0))
        y = np.where(phi > 0, -y, y)
        y = y + Cv + R
    flat = phi == 0.0
    return (np.where(flat, lam, x), np.where(flat, 0.0, y),
            np.where(flat, 0.0, yc))


def imw_p_fwd(lam, phi, C: ImwPConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    x, y, _ = _imw_p_loc(lam, phi, C)
    return x, y


def imw_p_inv(x, y, C: ImwPConsts):
    """Alternating secant iteration on (phi via y, lam via x) — reference
    imw_p_e_inverse, vectorized with per-point masks; the 1000-iteration
    cap matches the reference — typical points converge in a handful of
    steps and the loop exits as soon as all points settle)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    TOL = 1e-10
    phi = np.full_like(x, C.phi_2)
    lam = x / np.cos(phi)
    done = np.zeros(x.shape, dtype=bool)
    for _ in range(1000):
        tx, ty, yc = _imw_p_loc(lam, phi, C)
        denom = ty - yc
        upd_phi = (denom != 0) | (np.abs(ty - y) > TOL)
        with np.errstate(divide="ignore", invalid="ignore"):
            phi_new = ((phi - C.phi_1) * (y - yc) / denom) + C.phi_1
        phi = np.where(done | ~upd_phi | (denom == 0), phi, phi_new)
        upd_lam = (tx != 0) & (np.abs(tx - x) > TOL)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = np.where(done | ~upd_lam, lam, lam * x / tx)
        done |= (np.abs(tx - x) <= TOL) & (np.abs(ty - y) <= TOL)
        if done.all():
            break
    return lam, phi


# ---------------------------------------------------------------------------
# bipc — Bipolar Conic of Western Hemisphere (reference
# src/projections/bipc.cpp; O.M. Miller / W. Briesemeister constants)
# ---------------------------------------------------------------------------

_BP = dict(
    lamB=-0.34894976726250681539, n=0.63055844881274687180,
    F=1.89724742567461030582, Azab=0.81650043674686363166,
    Azba=1.82261843856185925133, T=1.27246578267089012270,
    rhoc=1.20709121521568721927, cAzc=0.69691523038678375519,
    sAzc=0.71715351331143607555, C45=0.70710678118654752469,
    S45=0.70710678118654752410, C20=0.93969262078590838411,
    S20=-0.34202014332566873287, R110=1.91986217719376253360,
    R104=1.81514242207410275904,
)


def bipc_fwd(lam, phi, noskew: bool = False):
    B = _BP
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    cphi, sphi = np.cos(phi), np.sin(phi)
    sdlam0 = B["lamB"] - lam
    cdlam = np.cos(sdlam0)
    sdlam = np.sin(sdlam0)
    polar = np.abs(np.abs(phi) - HALFPI) < 1e-10
    with np.errstate(divide="ignore", invalid="ignore"):
        tphi = np.where(polar, np.inf, sphi / cphi)
        Az = np.where(polar, np.where(phi < 0, math.pi, 0.0),
                      np.arctan2(sdlam, B["C45"] * (tphi - cdlam)))
    tag = Az > B["Azba"]
    # tagged branch (Azab side)
    sd2_0 = lam + B["R110"]
    cdlam2 = np.cos(sd2_0)
    sdlam2 = np.sin(sd2_0)
    z_t = np.arccos(np.clip(B["S20"] * sphi + B["C20"] * cphi * cdlam2, -1, 1))
    with np.errstate(divide="ignore", invalid="ignore"):
        Az_t = np.where(polar, Az,
                        np.arctan2(sdlam2, B["C20"] * tphi - B["S20"] * cdlam2))
    # untagged branch (Azba side)
    z_u = np.arccos(np.clip(B["S45"] * (sphi + cphi * cdlam), -1, 1))
    z = np.where(tag, z_t, z_u)
    Az = np.where(tag, Az_t, Az)
    Av = np.where(tag, B["Azab"], B["Azba"])
    y0 = np.where(tag, B["rhoc"], -B["rhoc"])

    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.tan(0.5 * z) ** B["n"]
        r = B["F"] * t
        al0 = 0.5 * (B["R104"] - z)
        bad = al0 < 0.0
        al = np.arccos(np.clip(
            (t + np.where(bad, 0.0, al0) ** B["n"]) / B["T"], -1, 1))
        tt = B["n"] * (Av - Az)
        shadow = np.abs(tt) < al
        r = np.where(shadow,
                     r / np.cos(al + np.where(tag, tt, -tt)), r)
        x = r * np.sin(tt)
        y = y0 + np.where(tag, -r, r) * np.cos(tt)
    if noskew:
        x, y = (-x * B["cAzc"] - y * B["sAzc"],
                -y * B["cAzc"] + x * B["sAzc"])
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def bipc_inv(x, y, noskew: bool = False):
    B = _BP
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if noskew:
        x, y = (-x * B["cAzc"] + y * B["sAzc"],
                -y * B["cAzc"] - x * B["sAzc"])
    neg = x < 0.0
    yy = np.where(neg, B["rhoc"] - y, y + B["rhoc"])
    s = np.where(neg, B["S20"], B["S45"])
    c = np.where(neg, B["C20"], B["C45"])
    Av = np.where(neg, B["Azab"], B["Azba"])
    r = np.hypot(x, yy)
    rp = r.copy()
    rl = r.copy()
    Az = np.arctan2(x, yy)
    fAz = np.abs(Az)
    z = np.zeros_like(r)
    done = np.zeros(r.shape, dtype=bool)
    with np.errstate(divide="ignore", invalid="ignore"):
        for _ in range(10):
            z_i = 2.0 * np.arctan((r / B["F"]) ** (1.0 / B["n"]))
            al = np.arccos(np.clip(
                (np.tan(0.5 * z_i) ** B["n"]
                 + np.tan(0.5 * (B["R104"] - z_i)) ** B["n"]) / B["T"], -1, 1))
            r_new = np.where(fAz < al,
                             rp * np.cos(al + np.where(neg, Az, -Az)), r)
            z = np.where(done, z, z_i)
            newly = np.abs(rl - r_new) < 1e-10
            rl = np.where(done, rl, r_new)
            r = np.where(done, r, r_new)
            done |= newly
            if done.all():
                break
        Az2 = Av - Az / B["n"]
        phi = np.arcsin(np.clip(s * np.cos(z) + c * np.sin(z) * np.cos(Az2),
                                -1, 1))
        lam = np.arctan2(np.sin(Az2), c / np.tan(z) - s * np.cos(Az2))
    lam = np.where(neg, lam - B["R110"], B["lamB"] - lam)
    return lam, phi


# ---------------------------------------------------------------------------
# chamb — Chamberlin Trimetric (reference src/projections/chamb.cpp) —
# forward only (reference has no inverse)
# ---------------------------------------------------------------------------

def _chamb_vect(dphi, c1, s1, c2, s2, dlam):
    cdl = np.cos(dlam)
    small = (np.abs(dphi) <= 1.0) & (np.abs(dlam) <= 1.0)
    dp = np.sin(0.5 * dphi)
    dl = np.sin(0.5 * dlam)
    r_small = 2.0 * np.arcsin(np.clip(
        np.sqrt(dp * dp + c1 * c2 * dl * dl), -1, 1))
    r_big = np.arccos(np.clip(s1 * s2 + c1 * c2 * cdl, -1, 1))
    r = np.where(small, r_small, r_big)
    Az = np.where(np.abs(r) > 1e-9,
                  np.arctan2(c2 * np.sin(dlam), c1 * s2 - s1 * c2 * cdl), 0.0)
    r = np.where(np.abs(r) > 1e-9, r, 0.0)
    return r, Az


def _chamb_lc(b, c, a):
    return np.arccos(np.clip(0.5 * (b * b + c * c - a * a) / (b * c), -1, 1))


@dataclass(frozen=True)
class ChambConsts:
    ctl: tuple   # 3 x (phi, lam, cosphi, sinphi, vr, vAz, px, py)
    beta_1: float
    beta_2: float
    px: float
    py: float


def setup_chamb(lat1, lon1, lat2, lon2, lat3, lon3, lam0: float) -> ChambConsts:
    from proj_spark.kernels.common import adjlon

    pts = []
    for lat, lon in ((lat1, lon1), (lat2, lon2), (lat3, lon3)):
        phi = math.radians(lat)
        lam = float(adjlon(np.array([math.radians(lon) - lam0]))[0])
        pts.append([phi, lam, math.cos(phi), math.sin(phi)])
    v = []
    for i in range(3):
        j = (i + 1) % 3
        r, Az = _chamb_vect(
            np.array([pts[j][0] - pts[i][0]]), pts[i][2], pts[i][3],
            pts[j][2], pts[j][3], np.array([pts[j][1] - pts[i][1]]))
        if r[0] == 0.0:
            raise ValueError("chamb: control points must be distinct")
        v.append((float(r[0]), float(Az[0])))
    beta_0 = float(_chamb_lc(v[0][0], v[2][0], v[1][0]))
    beta_1 = float(_chamb_lc(v[0][0], v[1][0], v[2][0]))
    beta_2 = math.pi - beta_0
    p0y = v[2][0] * math.sin(beta_0)
    p1y = p0y
    py = 2.0 * p0y
    p2y = 0.0
    p1x = 0.5 * v[0][0]
    p0x = -p1x
    p2x = p0x + v[2][0] * math.cos(beta_0)
    px = p2x
    ctl = tuple(
        (pts[i][0], pts[i][1], pts[i][2], pts[i][3], v[i][0], v[i][1],
         (p0x, p1x, p2x)[i], (p0y, p1y, p2y)[i])
        for i in range(3))
    return ChambConsts(ctl, beta_1, beta_2, px, py)


def chamb_fwd(lam, phi, C: ChambConsts):
    from proj_spark.kernels.common import adjlon

    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    rs, azs = [], []
    at_ctl = np.full(lam.shape, -1, dtype=np.int64)
    for i, c in enumerate(C.ctl):
        r, Az = _chamb_vect(phi - c[0], c[2], c[3], cosphi, sinphi,
                            lam - c[1])
        at_ctl = np.where((at_ctl < 0) & (r == 0.0), i, at_ctl)
        rs.append(r)
        azs.append(adjlon(Az - c[5]))
    x = np.full(lam.shape, C.px)
    y = np.full(lam.shape, C.py)
    for i, c in enumerate(C.ctl):
        j = (i + 1) % 3
        a = _chamb_lc(c[4], rs[i], rs[j])
        a = np.where(azs[i] < 0.0, -a, a)
        if i == 0:
            x = x + rs[i] * np.cos(a)
            y = y - rs[i] * np.sin(a)
        elif i == 1:
            a = C.beta_1 - a
            x = x - rs[i] * np.cos(a)
            y = y - rs[i] * np.sin(a)
        else:
            a = C.beta_2 - a
            x = x + rs[i] * np.cos(a)
            y = y + rs[i] * np.sin(a)
    x = x / 3.0
    y = y / 3.0
    for i, c in enumerate(C.ctl):
        x = np.where(at_ctl == i, c[6], x)
        y = np.where(at_ctl == i, c[7], y)
    return x, y


# ---------------------------------------------------------------------------
# labrd — Laborde (Madagascar) (reference src/projections/labrd.cpp)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class LabrdConsts:
    e: float
    es: float
    one_es: float
    phi0: float
    k0: float
    kRg: float
    p0s: float
    A: float
    C: float
    Ca: float
    Cb: float
    Cc: float
    Cd: float


def setup_labrd(ell: Ellipsoid, lat_0: float, azi: float = 0.0,
                k0: float = 1.0) -> LabrdConsts:
    if lat_0 == 0.0:
        raise ValueError("labrd: lat_0 must be nonzero")
    phi0 = math.radians(lat_0)
    Az = math.radians(azi)
    sinp = math.sin(phi0)
    t = 1.0 - ell.es * sinp * sinp
    N = 1.0 / math.sqrt(t)
    R = ell.one_es * N / t
    kRg = k0 * math.sqrt(N * R)
    p0s = math.atan(math.sqrt(R / N) * math.tan(phi0))
    A = sinp / math.sin(p0s)
    t = ell.e * sinp
    C = (0.5 * ell.e * A * math.log((1.0 + t) / (1.0 - t))
         - A * math.log(math.tan(math.pi / 4 + 0.5 * phi0))
         + math.log(math.tan(math.pi / 4 + 0.5 * p0s)))
    t = Az + Az
    Cb = 1.0 / (12.0 * kRg * kRg)
    Ca = (1.0 - math.cos(t)) * Cb
    Cb = Cb * math.sin(t)
    Cc = 3.0 * (Ca * Ca - Cb * Cb)
    Cd = 6.0 * Ca * Cb
    return LabrdConsts(ell.e, ell.es, ell.one_es, phi0, k0, kRg, p0s, A, C,
                       Ca, Cb, Cc, Cd)


def labrd_fwd(lam, phi, Q: LabrdConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    V1 = Q.A * np.log(np.tan(math.pi / 4 + 0.5 * phi))
    t = Q.e * np.sin(phi)
    V2 = 0.5 * Q.e * Q.A * np.log((1.0 + t) / (1.0 - t))
    ps = 2.0 * (np.arctan(np.exp(V1 - V2 + Q.C)) - math.pi / 4)
    I1 = ps - Q.p0s
    cosps = np.cos(ps)
    cosps2 = cosps * cosps
    sinps = np.sin(ps)
    sinps2 = sinps * sinps
    I4 = Q.A * cosps
    I2 = 0.5 * Q.A * I4 * sinps
    I3 = I2 * Q.A * Q.A * (5.0 * cosps2 - sinps2) / 12.0
    I6 = I4 * Q.A * Q.A
    I5 = I6 * (cosps2 - sinps2) / 6.0
    I6 = I6 * (Q.A * Q.A
               * (5.0 * cosps2 * cosps2
                  + sinps2 * (sinps2 - 18.0 * cosps2)) / 120.0)
    t = lam * lam
    x = Q.kRg * lam * (I4 + t * (I5 + t * I6))
    y = Q.kRg * (I1 + t * (I2 + t * I3))
    x2 = x * x
    y2 = y * y
    V1 = 3.0 * x * y2 - x * x2
    V2 = y * y2 - 3.0 * x2 * y
    return x + Q.Ca * V1 + Q.Cb * V2, y + Q.Ca * V2 - Q.Cb * V1


def labrd_inv(x, y, Q: LabrdConsts):
    x = np.asarray(x, dtype=np.float64).copy()
    y = np.asarray(y, dtype=np.float64).copy()
    x2 = x * x
    y2 = y * y
    V1 = 3.0 * x * y2 - x * x2
    V2 = y * y2 - 3.0 * x2 * y
    V3 = x * (5.0 * y2 * y2 + x2 * (-10.0 * y2 + x2))
    V4 = y * (5.0 * x2 * x2 + y2 * (-10.0 * x2 + y2))
    x = x + (-Q.Ca * V1 - Q.Cb * V2 + Q.Cc * V3 + Q.Cd * V4)
    y = y + (Q.Cb * V1 - Q.Ca * V2 - Q.Cd * V3 + Q.Cc * V4)
    ps = Q.p0s + y / Q.kRg
    pe = ps + Q.phi0 - Q.p0s
    done = np.zeros(x.shape, dtype=bool)
    for _ in range(20):
        V1 = Q.A * np.log(np.tan(math.pi / 4 + 0.5 * pe))
        tpe = Q.e * np.sin(pe)
        V2 = 0.5 * Q.e * Q.A * np.log((1.0 + tpe) / (1.0 - tpe))
        t = ps - 2.0 * (np.arctan(np.exp(V1 - V2 + Q.C)) - math.pi / 4)
        pe = np.where(done, pe, pe + t)
        done |= np.abs(t) < 1e-10
        if done.all():
            break
    t = Q.e * np.sin(pe)
    t = 1.0 - t * t
    Re = Q.one_es / (t * np.sqrt(t))
    t = np.tan(ps)
    t2 = t * t
    s = Q.kRg * Q.kRg
    d = Re * Q.k0 * Q.kRg
    I7 = t / (2.0 * d)
    I8 = t * (5.0 + 3.0 * t2) / (24.0 * d * s)
    d = np.cos(ps) * Q.kRg * Q.A
    I9 = 1.0 / d
    d = d * s
    I10 = (1.0 + 2.0 * t2) / (6.0 * d)
    I11 = (5.0 + t2 * (28.0 + 24.0 * t2)) / (120.0 * d * s)
    x2 = x * x
    phi = pe + x2 * (-I7 + I8 * x2)
    lam = x * (I9 + x2 * (-I10 + x2 * I11))
    return lam, phi

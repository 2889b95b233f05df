"""More catalogue projections: airy, nsper/tpers, lagrng, vandg2/3/4,
times, bacon/apian/ortel, tobmerc, and the Patterson/Savric/Jenny
polynomial family (eqearth, natearth, natearth2, patterson, comill).

Numpy re-derivations of the same-named files in
/root/reference/src/projections/ (published polynomial constants).
Newton inverses use fixed-trip masked iteration.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import authlat, authset, qsfn

HALFPI = math.pi / 2
FORTPI = math.pi / 4
PI = math.pi
N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


def _mode(phi0: float) -> int:
    t = abs(phi0)
    if abs(t - HALFPI) < 1e-10:
        return S_POLE if phi0 < 0 else N_POLE
    return OBLIQ if t > 1e-10 else EQUIT


# --------------------------------------------------------------------------
# airy (fwd only, like the reference)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class AiryConsts:
    mode: int
    p_halfpi: float
    sinph0: float
    cosph0: float
    Cb: float
    no_cut: bool


def setup_airy(lat_0: float = 0.0, lat_b: float = 90.0, no_cut: bool = False) -> AiryConsts:
    phi0 = math.radians(lat_0)
    beta = 0.5 * (HALFPI - math.radians(lat_b))
    if abs(beta) < 1e-10:
        Cb = -0.5
    else:
        Cb = 1.0 / math.tan(beta)
        Cb *= Cb * math.log(math.cos(beta))
    mode = _mode(phi0)
    return AiryConsts(mode, math.copysign(HALFPI, phi0) if mode in (N_POLE, S_POLE) else 0.0,
                      math.sin(phi0), math.cos(phi0), Cb, no_cut)


def airy_fwd(lam, phi, C: AiryConsts):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    sinlam, coslam = np.sin(lam), np.cos(lam)
    EPS = 1e-10
    if C.mode in (EQUIT, OBLIQ):
        sinphi, cosphi = np.sin(phi), np.cos(phi)
        cosz = cosphi * coslam
        if C.mode == OBLIQ:
            cosz = C.sinph0 * sinphi + C.cosph0 * cosz
        s = 1.0 - cosz
        t = 0.5 * (1.0 + cosz)
        with np.errstate(divide="ignore", invalid="ignore"):
            Krho = np.where(np.abs(s) > EPS, -np.log(t) / s - C.Cb / t, 0.5 - C.Cb)
        x = Krho * cosphi * sinlam
        y = Krho * (C.cosph0 * sinphi - C.sinph0 * cosphi * coslam
                    if C.mode == OBLIQ else sinphi)
        bad = (not C.no_cut) & (cosz < -EPS)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)
    ph = np.abs(C.p_halfpi - phi)
    bad = (not C.no_cut) & ((ph - EPS) > HALFPI)
    ph = ph * 0.5
    t = np.tan(ph)
    with np.errstate(divide="ignore", invalid="ignore"):
        Krho = np.where(ph > EPS, -2.0 * (np.log(np.cos(ph)) / t + t * C.Cb), 0.0)
    x = Krho * sinlam
    y = Krho * coslam
    if C.mode == N_POLE:
        y = -y
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


# --------------------------------------------------------------------------
# nsper / tpers
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class NsperConsts:
    mode: int
    phi0: float
    sinph0: float
    cosph0: float
    p: float
    rp: float
    pn1: float
    pfact: float
    h: float
    tilt: bool = False
    cg: float = 1.0
    sg: float = 0.0
    cw: float = 1.0
    sw: float = 0.0


def setup_nsper(a: float, lat_0: float, height: float,
                tilt: float | None = None, azi: float | None = None) -> NsperConsts:
    phi0 = math.radians(lat_0)
    pn1 = height / a
    if pn1 <= 0 or pn1 > 1e10:
        raise ValueError("nsper: invalid height")
    p = 1.0 + pn1
    kw = {}
    if tilt is not None:
        om = math.radians(tilt)
        g = math.radians(azi or 0.0)
        kw = dict(tilt=True, cg=math.cos(g), sg=math.sin(g),
                  cw=math.cos(om), sw=math.sin(om))
    return NsperConsts(_mode(phi0), phi0, math.sin(phi0), math.cos(phi0),
                       p, 1.0 / p, pn1, (p + 1.0) / pn1, 1.0 / pn1, **kw)


def nsper_fwd(lam, phi, C: NsperConsts):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    sinphi, cosphi = np.sin(phi), np.cos(phi)
    coslam = np.cos(lam)
    if C.mode == OBLIQ:
        cosz = C.sinph0 * sinphi + C.cosph0 * cosphi * coslam
    elif C.mode == EQUIT:
        cosz = cosphi * coslam
    elif C.mode == S_POLE:
        cosz = -sinphi
    else:
        cosz = sinphi
    bad = cosz < C.rp
    with np.errstate(divide="ignore", invalid="ignore"):
        k = C.pn1 / (C.p - cosz)
        x = k * cosphi * np.sin(lam)
        if C.mode == OBLIQ:
            y = k * (C.cosph0 * sinphi - C.sinph0 * cosphi * coslam)
        elif C.mode == EQUIT:
            y = k * sinphi
        elif C.mode == N_POLE:
            y = k * cosphi * -coslam
        else:
            y = k * cosphi * coslam
        if C.tilt:
            yt = y * C.cg + x * C.sg
            ba = 1.0 / (yt * C.sw * C.h + C.cw)
            x2 = (x * C.cg - y * C.sg) * C.cw * ba
            y = yt * ba
            x = x2
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def nsper_inv(x, y, C: NsperConsts):
    x = np.asarray(x, dtype=np.float64).copy()
    y = np.asarray(y, dtype=np.float64).copy()
    if C.tilt:
        with np.errstate(divide="ignore", invalid="ignore"):
            yt = 1.0 / (C.pn1 - y * C.sw)
            bm = C.pn1 * x * yt
            bq = C.pn1 * y * C.cw * yt
            x = bm * C.cg + bq * C.sg
            y = bq * C.cg - bm * C.sg
    rh = np.hypot(x, y)
    with np.errstate(divide="ignore", invalid="ignore"):
        sinz2 = 1.0 - rh * rh * C.pfact
        bad = sinz2 < 0.0
        sinz = (C.p - np.sqrt(np.maximum(sinz2, 0.0))) / (C.pn1 / rh + rh / C.pn1)
        cosz = np.sqrt(np.maximum(1.0 - sinz * sinz, 0.0))
        if C.mode == OBLIQ:
            phi = np.arcsin(np.clip(cosz * C.sinph0 + y * sinz * C.cosph0 / rh, -1, 1))
            ys = (cosz - C.sinph0 * np.sin(phi)) * rh
            xs = x * sinz * C.cosph0
        elif C.mode == EQUIT:
            phi = np.arcsin(np.clip(y * sinz / rh, -1, 1))
            ys = cosz * rh
            xs = x * sinz
        elif C.mode == N_POLE:
            phi = np.arcsin(np.clip(cosz, -1, 1))
            ys = -y
            xs = x
        else:
            phi = -np.arcsin(np.clip(cosz, -1, 1))
            ys = y
            xs = x
        lam = np.arctan2(xs, ys)
    small = np.abs(rh) <= 1e-10
    phi = np.where(small, C.phi0, phi)
    lam = np.where(small, 0.0, lam)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


# --------------------------------------------------------------------------
# lagrng
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class LagrngConsts:
    w: float
    rw: float
    hw: float
    hrw: float
    a1: float
    a2: float


def setup_lagrng(W: float = 2.0, lat_1: float = 0.0) -> LagrngConsts:
    if W <= 0:
        raise ValueError("lagrng: W must be > 0")
    hw = 0.5 * W
    rw = 1.0 / W
    hrw = 0.5 * rw
    s1 = math.sin(math.radians(lat_1))
    if abs(abs(s1) - 1.0) < 1e-10:
        raise ValueError("lagrng: |lat_1| must be < 90")
    a1 = ((1.0 - s1) / (1.0 + s1)) ** hrw
    return LagrngConsts(W, rw, hw, hrw, a1, a1 * a1)


def lagrng_fwd(lam, phi, C: LagrngConsts):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    TOL = 1e-10
    sp = np.sin(phi)
    pole = np.abs(np.abs(sp) - 1.0) < TOL
    with np.errstate(divide="ignore", invalid="ignore"):
        v = C.a1 * ((1.0 + sp) / (1.0 - sp)) ** C.hrw
        lw = lam * C.rw
        c = 0.5 * (v + 1.0 / v) + np.cos(lw)
        x = np.where(c < TOL, np.nan, 2.0 * np.sin(lw) / c)
        y = np.where(c < TOL, np.nan, (v - 1.0 / v) / c)
    x = np.where(pole, 0.0, x)
    y = np.where(pole, np.where(phi < 0, -2.0, 2.0), y)
    return x, y


def lagrng_inv(x, y, C: LagrngConsts):
    x = np.asarray(x, dtype=np.float64); y = np.asarray(y, dtype=np.float64)
    TOL = 1e-10
    pole = np.abs(np.abs(y) - 2.0) < TOL
    x2 = x * x
    y2p = 2.0 + y
    y2m = 2.0 - y
    c = y2p * y2m - x2
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = 2.0 * np.arctan(((y2p * y2p + x2) / (C.a2 * (y2m * y2m + x2))) ** C.hw) - HALFPI
        lam = C.w * np.arctan2(4.0 * x, c)
    bad = np.abs(c) < TOL
    phi = np.where(pole, np.where(y < 0, -HALFPI, HALFPI), np.where(bad, np.nan, phi))
    lam = np.where(pole, 0.0, np.where(bad, np.nan, lam))
    return lam, phi


# --------------------------------------------------------------------------
# vandg2 / vandg3 / vandg4, times, bacon family, tobmerc
# --------------------------------------------------------------------------

def vandg2_fwd(lam, phi, C: dict):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    TOL = 1e-10
    vdg3 = C["vdg3"]
    bt = np.abs(2.0 / PI * phi)
    ct = np.sqrt(np.maximum(1.0 - bt * bt, 0.0))
    with np.errstate(divide="ignore", invalid="ignore"):
        at = 0.5 * np.abs(PI / lam - lam / PI)
        if vdg3:
            x1 = bt / (1.0 + ct)
            x = PI * (np.sqrt(at * at + 1.0 - x1 * x1) - at)
            y = PI * x1
        else:
            x1 = (ct * np.sqrt(1.0 + at * at) - at * ct * ct) / (1.0 + at * at * bt * bt)
            x = PI * x1
            y = PI * np.sqrt(np.maximum(1.0 - x1 * (x1 + 2.0 * at) + TOL, 0.0))
        x = np.where(lam < 0, -x, x)
        y = np.where(phi < 0, -y, y)
    zero = np.abs(lam) < TOL
    x = np.where(zero, 0.0, x)
    y = np.where(zero, PI * np.where(phi < 0, -bt, bt) / (1.0 + ct), y)
    return x, y


def vandg4_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    TOL = 1e-10
    with np.errstate(divide="ignore", invalid="ignore"):
        bt = np.abs(2.0 / PI * phi)
        bt2 = bt * bt
        ct = 0.5 * (bt * (8.0 - bt * (2.0 + bt2)) - 5.0) / (bt2 * (bt - 1.0))
        ct2 = ct * ct
        dt = 2.0 / PI * lam
        dt = dt + 1.0 / dt
        dt = np.sqrt(np.maximum(dt * dt - 4.0, 0.0))
        dt = np.where((np.abs(lam) - HALFPI) < 0.0, -dt, dt)
        dt2 = dt * dt
        x1 = (bt + ct) ** 2
        t = bt + 3.0 * ct
        ft = x1 * (bt2 + ct2 * dt2 - 1.0) + (1.0 - bt2) * (
            bt2 * (t * t + 4.0 * ct2) + ct2 * (12.0 * bt * ct + 4.0 * ct2))
        x1v = (dt * (x1 + ct2 - 1.0) + 2.0 * np.sqrt(np.maximum(ft, 0.0))) / (4.0 * x1 + dt2)
        x = HALFPI * x1v
        y = HALFPI * np.sqrt(np.maximum(1.0 + dt * np.abs(x1v) - x1v * x1v, 0.0))
        x = np.where(lam < 0, -x, x)
        y = np.where(phi < 0, -y, y)
    eq = np.abs(phi) < TOL
    axis = (np.abs(lam) < TOL) | (np.abs(np.abs(phi) - HALFPI) < TOL)
    x = np.where(eq, lam, np.where(axis, 0.0, x))
    y = np.where(eq, 0.0, np.where(axis, phi, y))
    return x, y


def times_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    T = np.tan(phi / 2.0)
    S2 = np.sin(FORTPI * T) ** 2
    return lam * (0.74482 - 0.34588 * S2), 1.70711 * T


def times_inv(x, y, C=None):
    T = np.asarray(y, dtype=np.float64) / 1.70711
    S2 = np.sin(FORTPI * T) ** 2
    return np.asarray(x, dtype=np.float64) / (0.74482 - 0.34588 * S2), 2.0 * np.arctan(T)


def bacon_fwd(lam, phi, C: dict):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    EPS = 1e-10
    HLFPI2 = HALFPI * HALFPI
    y = HALFPI * np.sin(phi) if C["bacn"] else phi
    ax = np.abs(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        f = 0.5 * (HLFPI2 / ax + ax)
        xg = ax - f + np.sqrt(np.maximum(f * f - y * y, 0.0))
        if C["ortl"]:
            xo = np.sqrt(np.maximum(HLFPI2 - phi * phi + EPS, 0.0)) + ax - HALFPI
            xg = np.where(ax >= HALFPI, xo, xg)
    x = np.where(ax < EPS, 0.0, np.where(lam < 0, -xg, xg))
    return x, y


def tobmerc_fwd(lam, phi, C: float):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    cosphi = np.cos(phi)
    bad = np.abs(phi) >= HALFPI
    x = C * lam * cosphi * cosphi
    y = C * np.arcsinh(np.tan(phi))
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def tobmerc_inv(x, y, C: float):
    phi = np.arctan(np.sinh(np.asarray(y, dtype=np.float64) / C))
    cosphi = np.cos(phi)
    return np.asarray(x, dtype=np.float64) / C / (cosphi * cosphi), phi


# --------------------------------------------------------------------------
# Patterson / Savric / Jenny polynomial family
# --------------------------------------------------------------------------

def _poly_newton(y, f, fder, max_y, max_iter=100, eps=1e-11):
    """Solve f(yc) == y for yc; y pre-clamped to [-max_y, max_y]."""
    y = np.clip(np.asarray(y, dtype=np.float64), -max_y, max_y)
    yc = y.copy()
    conv = np.zeros(y.shape, dtype=bool)
    for _ in range(max_iter):
        t = (f(yc) - y) / fder(yc)
        yc = np.where(conv, yc, yc - t)
        conv |= np.abs(t) < eps
        if conv.all():
            break
    return yc


_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_M = math.sqrt(3.0) / 2.0
_EE_MAXY = 1.3173627591574


@dataclass(frozen=True)
class EqearthConsts:
    es: float
    e: float
    qp: float
    rqda: float
    apa: tuple


def setup_eqearth(ell: Ellipsoid) -> EqearthConsts:
    if ell.es != 0.0:
        qp = float(qsfn(1.0, ell.e, ell.one_es))
        return EqearthConsts(ell.es, ell.e, qp, math.sqrt(0.5 * qp), authset(ell.es))
    return EqearthConsts(0.0, 0.0, 0.0, 1.0, (0.0, 0.0, 0.0))


def _ee_y(psi):
    p2 = psi * psi
    p6 = p2 * p2 * p2
    return psi * (_EE_A1 + _EE_A2 * p2 + p6 * (_EE_A3 + _EE_A4 * p2))


def _ee_dy(psi):
    p2 = psi * psi
    p6 = p2 * p2 * p2
    return _EE_A1 + 3 * _EE_A2 * p2 + p6 * (7 * _EE_A3 + 9 * _EE_A4 * p2)


def eqearth_fwd(lam, phi, C: EqearthConsts):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    sbeta = np.sin(phi)
    if C.es != 0.0:
        sbeta = np.clip(qsfn(sbeta, C.e, 1.0 - C.es) / C.qp, -1.0, 1.0)
    psi = np.arcsin(_EE_M * sbeta)
    x = lam * np.cos(psi) / (_EE_M * _ee_dy(psi)) * C.rqda
    return x, _ee_y(psi) * C.rqda


def eqearth_inv(x, y, C: EqearthConsts):
    x = np.asarray(x, dtype=np.float64) / C.rqda
    y = np.asarray(y, dtype=np.float64) / C.rqda
    # inputs at/beyond the published MAX_Y edge are the pole: snap psi to
    # the exact double-precision pole ordinate, else the ~1e-14 truncation
    # of the constant amplifies through asin'(1) into ~1e-7 rad of latitude
    psi_pole = math.asin(_EE_M)
    clamped = np.abs(y) >= _EE_MAXY
    yc = _poly_newton(y, _ee_y, _ee_dy, _EE_MAXY, max_iter=12)
    yc = np.where(clamped, np.copysign(psi_pole, y), yc)
    lam = _EE_M * x * _ee_dy(yc) / np.cos(yc)
    phi = np.arcsin(np.clip(np.sin(yc) / _EE_M, -1, 1))
    if C.es != 0.0:
        phi = authlat(phi, C.apa)
    return lam, phi


_NE_A = (0.8707, -0.131979, -0.013791, 0.003971, -0.001529)
_NE_B = (1.007226, 0.015085, -0.044475, 0.028874, -0.005916)
_NE_MAXY = 0.8707 * 0.52 * PI


def _ne_y(p):
    p2 = p * p
    p4 = p2 * p2
    return p * (_NE_B[0] + p2 * (_NE_B[1] + p4 * (_NE_B[2] + _NE_B[3] * p2 + _NE_B[4] * p4)))


def _ne_dy(p):
    p2 = p * p
    p4 = p2 * p2
    return _NE_B[0] + p2 * (3 * _NE_B[1] + p4 * (7 * _NE_B[2] + 9 * _NE_B[3] * p2
                                                 + 11 * _NE_B[4] * p4))


def natearth_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    p2 = phi * phi
    p4 = p2 * p2
    x = lam * (_NE_A[0] + p2 * (_NE_A[1] + p2 * (_NE_A[2] + p4 * p2 * (_NE_A[3] + p2 * _NE_A[4]))))
    return x, _ne_y(phi)


def natearth_inv(x, y, C=None):
    phi = _poly_newton(y, _ne_y, _ne_dy, _NE_MAXY)
    p2 = phi * phi
    p4 = p2 * p2
    lam = np.asarray(x, dtype=np.float64) / (
        _NE_A[0] + p2 * (_NE_A[1] + p2 * (_NE_A[2] + p4 * p2 * (_NE_A[3] + p2 * _NE_A[4]))))
    return lam, phi


_N2_A = (0.84719, -0.13063, -0.04515, 0.05494, -0.02326, 0.00331)
_N2_B = (1.01183, -0.02625, 0.01926, -0.00396)
_N2_MAXY = 0.84719 * 0.535117535153096 * PI


def _n2_y(p):
    p4 = (p * p) ** 2
    p2 = p * p
    return p * (_N2_B[0] + p4 * p4 * (_N2_B[1] + _N2_B[2] * p2 + _N2_B[3] * p4))


def _n2_dy(p):
    p2 = p * p
    p4 = p2 * p2
    return _N2_B[0] + p4 * p4 * (9 * _N2_B[1] + 11 * _N2_B[2] * p2 + 13 * _N2_B[3] * p4)


def natearth2_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64); phi = np.asarray(phi, dtype=np.float64)
    p2 = phi * phi
    p4 = p2 * p2
    p6 = p2 * p4
    x = lam * (_N2_A[0] + _N2_A[1] * p2 + p6 * p6 * (
        _N2_A[2] + _N2_A[3] * p2 + _N2_A[4] * p4 + _N2_A[5] * p6))
    return x, _n2_y(phi)


def natearth2_inv(x, y, C=None):
    phi = _poly_newton(y, _n2_y, _n2_dy, _N2_MAXY)
    p2 = phi * phi
    p4 = p2 * p2
    p6 = p2 * p4
    lam = np.asarray(x, dtype=np.float64) / (
        _N2_A[0] + _N2_A[1] * p2 + p6 * p6 * (
            _N2_A[2] + _N2_A[3] * p2 + _N2_A[4] * p4 + _N2_A[5] * p6))
    return lam, phi


_PT_K = (1.0148, 0.23185, -0.14499, 0.02406)
_PT_MAXY = 1.790857183


def _pt_y(p):
    p2 = p * p
    return p * (_PT_K[0] + p2 * p2 * (_PT_K[1] + p2 * (_PT_K[2] + _PT_K[3] * p2)))


def _pt_dy(p):
    p2 = p * p
    return _PT_K[0] + p2 * p2 * (5 * _PT_K[1] + p2 * (7 * _PT_K[2] + 9 * _PT_K[3] * p2))


def patterson_fwd(lam, phi, C=None):
    return np.asarray(lam, dtype=np.float64), _pt_y(np.asarray(phi, dtype=np.float64))


def patterson_inv(x, y, C=None):
    return np.asarray(x, dtype=np.float64), _poly_newton(y, _pt_y, _pt_dy, _PT_MAXY)


_CM_K = (0.9902, 0.1604, -0.03054)
_CM_MAXY = 0.6000207669862655 * PI


def _cm_y(p):
    p2 = p * p
    return p * (_CM_K[0] + p2 * (_CM_K[1] + _CM_K[2] * p2))


def _cm_dy(p):
    p2 = p * p
    return _CM_K[0] + p2 * (3 * _CM_K[1] + 5 * _CM_K[2] * p2)


def comill_fwd(lam, phi, C=None):
    return np.asarray(lam, dtype=np.float64), _cm_y(np.asarray(phi, dtype=np.float64))


def comill_inv(x, y, C=None):
    return np.asarray(x, dtype=np.float64), _poly_newton(y, _cm_y, _cm_dy, _CM_MAXY)

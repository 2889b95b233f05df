"""Oblique & special projections: omerc (Hotine Oblique Mercator), ocea
(Oblique Cylindrical Equal Area), krovak / mod_krovak, geos
(geostationary satellite view).

Numpy re-derivations of the reference kernels:
  * omerc  — /root/reference/src/projections/omerc.cpp (fwd :24-60,
    inv :62-95, two-point + alpha/gamma setup :97-233)
  * ocea   — /root/reference/src/projections/ocea.cpp
  * krovak — /root/reference/src/projections/krovak.cpp (S-JTSK, fixed
    Bessel ellipsoid, +czech sign convention, mod_krovak polynomial
    correction grid)
  * geos   — /root/reference/src/projections/geos.cpp (sph + ell)
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import adjlon, phi2, tsfn

HALFPI = math.pi / 2
FORTPI = math.pi / 4
PI = math.pi


# --------------------------------------------------------------------------
# omerc
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class OmercConsts:
    e: float
    A: float
    B: float
    E: float
    ArB: float
    BrA: float
    rB: float
    singam: float
    cosgam: float
    sinrot: float
    cosrot: float
    u_0: float
    v_pole_n: float
    v_pole_s: float
    no_rot: bool
    lam0: float


def setup_omerc(ell: Ellipsoid, params: dict, k0: float = 1.0) -> OmercConsts:
    TOL, EPS = 1e-7, 1e-10
    e, es, one_es = ell.e, ell.es, ell.one_es
    phi0 = math.radians(float(params.get("lat_0", 0.0)))
    no_rot = "no_rot" in params
    alp = "alpha" in params
    gam = "gamma" in params
    alpha_c = math.radians(float(params.get("alpha", 0.0)))
    gamma = math.radians(float(params.get("gamma", 0.0)))
    if alp or gam:
        lamc = math.radians(float(params.get("lonc", 0.0)))
        no_off = ("no_off" in params) or ("no_uoff" in params)
    else:
        lam1 = math.radians(float(params.get("lon_1", 0.0)))
        phi1 = math.radians(float(params.get("lat_1", 0.0)))
        lam2 = math.radians(float(params.get("lon_2", 0.0)))
        phi2_ = math.radians(float(params.get("lat_2", 0.0)))
        no_off = False
        if (abs(phi1) > HALFPI - TOL or abs(phi2_) > HALFPI - TOL
                or abs(phi1 - phi2_) <= TOL or abs(phi1) <= TOL):
            raise ValueError("omerc: invalid lat_1/lat_2")
    com = math.sqrt(one_es)
    if abs(phi0) > EPS:
        s0, c0 = math.sin(phi0), math.cos(phi0)
        con = 1.0 - es * s0 * s0
        B = c0 * c0
        B = math.sqrt(1.0 + es * B * B / one_es)
        A = B * k0 * com / con
        D = B * com / (c0 * math.sqrt(con))
        F = D * D - 1.0
        F = 0.0 if F <= 0 else math.copysign(math.sqrt(F), phi0)
        E = F = F + D
        E *= float(tsfn(phi0, s0, e)) ** B
    else:
        B = 1.0 / com
        A = k0
        E = D = F = 1.0
    if alp or gam:
        if alp:
            gamma0 = math.asin(math.sin(alpha_c) / D)
            if not gam:
                gamma = alpha_c
        else:
            gamma0 = gamma
            alpha_c = math.asin(D * math.sin(gamma0))
        lam0 = lamc - math.asin(0.5 * (F - 1.0 / F) * math.tan(gamma0)) / B
    else:
        H = float(tsfn(phi1, math.sin(phi1), e)) ** B
        L = float(tsfn(phi2_, math.sin(phi2_), e)) ** B
        F = E / H
        p = (L - H) / (L + H)
        J = E * E
        J = (J - L * H) / (J + L * H)
        con = lam1 - lam2
        if con < -PI:
            lam2 -= 2 * PI
        elif con > PI:
            lam2 += 2 * PI
        lam0 = float(adjlon(np.array([
            0.5 * (lam1 + lam2)
            - math.atan(J * math.tan(0.5 * B * (lam1 - lam2)) / p) / B
        ]))[0])
        gamma0 = math.atan(2.0 * math.sin(B * float(adjlon(np.array([lam1 - lam0]))[0]))
                           / (F - 1.0 / F))
        gamma = alpha_c = math.asin(D * math.sin(gamma0))
    rB = 1.0 / B
    ArB = A * rB
    if no_off:
        u_0 = 0.0
    else:
        u_0 = abs(ArB * math.atan(math.sqrt(D * D - 1.0) / math.cos(alpha_c)))
        if phi0 < 0:
            u_0 = -u_0
    Fh = 0.5 * gamma0
    return OmercConsts(
        e, A, B, E, ArB, 1.0 / ArB, rB,
        math.sin(gamma0), math.cos(gamma0), math.sin(gamma), math.cos(gamma),
        u_0, ArB * math.log(math.tan(FORTPI - Fh)),
        ArB * math.log(math.tan(FORTPI + Fh)), no_rot, lam0,
    )


def omerc_fwd(lam, phi, C: OmercConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    EPS, TOL = 1e-10, 1e-7
    with np.errstate(divide="ignore", invalid="ignore"):
        W = C.E / tsfn(phi, np.sin(phi), C.e) ** C.B
        S = 0.5 * (W - 1.0 / W)
        T = 0.5 * (W + 1.0 / W)
        V = np.sin(C.B * lam)
        U = (S * C.singam - V * C.cosgam) / T
        v = 0.5 * C.ArB * np.log((1.0 - U) / (1.0 + U))
        temp = np.cos(C.B * lam)
        u = np.where(np.abs(temp) < TOL, C.A * lam,
                     C.ArB * np.arctan2(S * C.cosgam + V * C.singam, temp))
    at_pole = np.abs(np.abs(phi) - HALFPI) <= EPS
    v = np.where(at_pole, np.where(phi > 0, C.v_pole_n, C.v_pole_s), v)
    u = np.where(at_pole, C.ArB * phi, u)
    bad = (~at_pole) & (np.abs(np.abs(U) - 1.0) < EPS)
    if C.no_rot:
        x, y = u, v
    else:
        u = u - C.u_0
        x = v * C.cosrot + u * C.sinrot
        y = u * C.cosrot - v * C.sinrot
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def omerc_inv(x, y, C: OmercConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    EPS = 1e-10
    if C.no_rot:
        v, u = y, x
    else:
        v = x * C.cosrot - y * C.sinrot
        u = y * C.cosrot + x * C.sinrot + C.u_0
    with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
        Qp = np.exp(-C.BrA * v)
        Sp = 0.5 * (Qp - 1.0 / Qp)
        Tp = 0.5 * (Qp + 1.0 / Qp)
        Vp = np.sin(C.BrA * u)
        Up = (Vp * C.cosgam + Sp * C.singam) / Tp
        at_pole = np.abs(np.abs(Up) - 1.0) < EPS
        ts = (C.E / np.sqrt((1.0 + Up) / (1.0 - Up))) ** (1.0 / C.B)
        ph = phi2(ts, C.e)
        lam = -C.rB * np.arctan2(Sp * C.cosgam - Vp * C.singam, np.cos(C.BrA * u))
    ph = np.where(at_pole, np.where(Up < 0, -HALFPI, HALFPI), ph)
    lam = np.where(at_pole, 0.0, lam)
    return lam, ph


# --------------------------------------------------------------------------
# ocea
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class OceaConsts:
    rok: float
    rtk: float
    sinphi: float
    cosphi: float
    lam0: float


def setup_ocea(params: dict, k0: float = 1.0) -> OceaConsts:
    rok = 1.0 / k0
    rtk = k0
    phi0 = math.radians(float(params.get("lat_0", 0.0)))
    if "alpha" in params:
        alpha = PI + math.radians(float(params["alpha"]))
        lonz = math.radians(float(params.get("lonc", 0.0)))
        lam_p = math.atan2(-math.cos(alpha), -math.sin(phi0) * math.sin(alpha)) + lonz
        phi_p = math.asin(math.cos(phi0) * math.sin(alpha))
    else:
        phi_1 = math.radians(float(params.get("lat_1", 0.0)))
        phi_2 = math.radians(float(params.get("lat_2", 0.0)))
        lam_1 = math.radians(float(params.get("lon_1", 0.0)))
        lam_2 = math.radians(float(params.get("lon_2", 0.0)))
        lam_p = math.atan2(
            math.cos(phi_1) * math.sin(phi_2) * math.cos(lam_1)
            - math.sin(phi_1) * math.cos(phi_2) * math.cos(lam_2),
            math.sin(phi_1) * math.cos(phi_2) * math.sin(lam_2)
            - math.cos(phi_1) * math.sin(phi_2) * math.sin(lam_1),
        )
        if lam_1 == -HALFPI:
            lam_p = -lam_p
        clm = math.cos(lam_p - lam_1)
        t1 = math.tan(phi_1)
        phi_p = (-HALFPI if clm >= 0 else HALFPI) if t1 == 0.0 else math.atan(-clm / t1)
    return OceaConsts(rok, rtk, math.sin(phi_p), math.cos(phi_p), lam_p + HALFPI)


def ocea_fwd(lam, phi, C: OceaConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sy = np.sin(lam)
    t = np.cos(lam)
    with np.errstate(divide="ignore", invalid="ignore"):
        x = np.arctan((np.tan(phi) * C.cosphi + C.sinphi * sy) / t)
    x = np.where(t < 0, x + PI, x) * C.rtk
    y = C.rok * (C.sinphi * np.sin(phi) - C.cosphi * np.cos(phi) * sy)
    return x, y


def ocea_inv(x, y, C: OceaConsts):
    xs = np.asarray(x, dtype=np.float64) / C.rtk
    ys = np.asarray(y, dtype=np.float64) / C.rok
    t = np.sqrt(np.maximum(1.0 - ys * ys, 0.0))
    s = np.sin(xs)
    phi = np.arcsin(np.clip(ys * C.sinphi + t * C.cosphi * s, -1, 1))
    lam = np.arctan2(t * C.sinphi * s - ys * C.cosphi, t * np.cos(xs))
    return lam, phi


# --------------------------------------------------------------------------
# krovak / mod_krovak
# --------------------------------------------------------------------------

_KV_S0 = 1.37008346281555
_KV_UQ = 1.04216856380474
_KV_X0, _KV_Y0 = 1089000.0, 654000.0
_KV_C = (2.946529277e-02, 2.515965696e-02, 1.193845912e-07, -4.668270147e-07,
         9.233980362e-12, 1.523735715e-12, 1.696780024e-18, 4.408314235e-18,
         -8.331083518e-24, -3.689471323e-24)


@dataclass(frozen=True)
class KrovakConsts:
    a: float
    e: float
    alpha: float
    k: float
    n: float
    rho0: float
    ad: float
    easting_northing: bool
    modified: bool
    x0: float
    y0: float
    lam0: float
    phi0: float


def setup_krovak(params: dict, modified: bool) -> KrovakConsts:
    # krovak pins the Bessel ellipsoid (reference krovak.cpp :219-222)
    a = 6377397.155
    es = 0.006674372230614
    e = math.sqrt(es)
    phi0 = math.radians(float(params["lat_0"])) if "lat_0" in params else 0.863937979737193
    lam0 = (math.radians(float(params["lon_0"])) if "lon_0" in params
            else 0.7417649320975901 - 0.308341501185665)
    k0 = float(params.get("k_0", params.get("k", 0.9999)))
    alpha = math.sqrt(1.0 + (es * math.cos(phi0) ** 4) / (1.0 - es))
    u0 = math.asin(math.sin(phi0) / alpha)
    g = ((1.0 + e * math.sin(phi0)) / (1.0 - e * math.sin(phi0))) ** (alpha * e / 2.0)
    k = math.tan(u0 / 2.0 + FORTPI) / math.tan(phi0 / 2.0 + FORTPI) ** alpha * g
    n0 = math.sqrt(1.0 - es) / (1.0 - es * math.sin(phi0) ** 2)
    return KrovakConsts(
        a, e, alpha, k, math.sin(_KV_S0), k0 * n0 / math.tan(_KV_S0),
        HALFPI - _KV_UQ, "czech" not in params, modified,
        float(params.get("x_0", 0.0)), float(params.get("y_0", 0.0)),
        lam0, phi0,
    )


def _mod_krovak_dxdy(Xr, Yr):
    C1, C2, C3, C4, C5, C6, C7, C8, C9, C10 = _KV_C
    Xr2 = Xr * Xr
    Yr2 = Yr * Yr
    Xr4 = Xr2 * Xr2
    Yr4 = Yr2 * Yr2
    dX = (C1 + C3 * Xr - C4 * Yr - 2 * C6 * Xr * Yr + C5 * (Xr2 - Yr2)
          + C7 * Xr * (Xr2 - 3 * Yr2) - C8 * Yr * (3 * Xr2 - Yr2)
          + 4 * C9 * Xr * Yr * (Xr2 - Yr2) + C10 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    dY = (C2 + C3 * Yr + C4 * Xr + 2 * C5 * Xr * Yr + C6 * (Xr2 - Yr2)
          + C8 * Xr * (Xr2 - 3 * Yr2) + C7 * Yr * (3 * Xr2 - Yr2)
          - 4 * C10 * Xr * Yr * (Xr2 - Yr2) + C9 * (Xr4 + Yr4 - 6 * Xr2 * Yr2))
    return dX, dY


def krovak_fwd(lam, phi, C: KrovakConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        esin = C.e * np.sin(phi)
        gfi = ((1.0 + esin) / (1.0 - esin)) ** (C.alpha * C.e / 2.0)
        u = 2.0 * (np.arctan(C.k * np.tan(phi / 2.0 + FORTPI) ** C.alpha / gfi) - FORTPI)
        deltav = -lam * C.alpha
        s = np.arcsin(np.clip(
            math.cos(C.ad) * np.sin(u) + math.sin(C.ad) * np.cos(u) * np.cos(deltav),
            -1, 1))
        cos_s = np.cos(s)
        d = np.arcsin(np.clip(np.cos(u) * np.sin(deltav) / cos_s, -1, 1))
        eps = C.n * d
        rho = C.rho0 * math.tan(_KV_S0 / 2.0 + FORTPI) ** C.n / np.tan(s / 2.0 + FORTPI) ** C.n
        X = rho * np.cos(eps)
        Y = rho * np.sin(eps)
    degenerate = cos_s < 1e-12
    X = np.where(degenerate, 0.0, X)
    Y = np.where(degenerate, 0.0, Y)
    if C.modified:
        Xr = X * C.a - _KV_X0
        Yr = Y * C.a - _KV_Y0
        dX, dY = _mod_krovak_dxdy(Xr, Yr)
        X = X - dX / C.a
        Y = Y - dY / C.a
    x, y = Y, X  # swap
    if C.easting_northing:
        x = -x - 2 * C.x0 / C.a
        y = -y - 2 * C.y0 / C.a
    return x, y


def krovak_inv(x, y, C: KrovakConsts):
    x = np.asarray(x, dtype=np.float64).copy()
    y = np.asarray(y, dtype=np.float64).copy()
    if C.easting_northing:
        x, y = -y - 2 * C.x0 / C.a, -x - 2 * C.y0 / C.a
    else:
        x, y = y, x
    if C.modified:
        Xr = x * C.a - _KV_X0
        Yr = y * C.a - _KV_Y0
        dX, dY = _mod_krovak_dxdy(Xr, Yr)
        x = x + dX / C.a
        y = y + dY / C.a
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = np.hypot(x, y)
        eps = np.arctan2(y, x)
        d = eps / math.sin(_KV_S0)
        s = np.where(
            rho == 0.0, HALFPI,
            2.0 * (np.arctan((C.rho0 / rho) ** (1.0 / C.n)
                             * math.tan(_KV_S0 / 2.0 + FORTPI)) - FORTPI),
        )
        u = np.arcsin(np.clip(
            math.cos(C.ad) * np.sin(s) - math.sin(C.ad) * np.cos(s) * np.cos(d), -1, 1))
        deltav = np.arcsin(np.clip(np.cos(s) * np.sin(d) / np.cos(u), -1, 1))
        lam = -deltav / C.alpha  # lam0 re-added by ProjectionStep
        fi1 = u.copy()
        phi = fi1
        for _ in range(100):
            esin = C.e * np.sin(fi1)
            phi = 2.0 * (np.arctan(
                C.k ** (-1.0 / C.alpha)
                * np.tan(u / 2.0 + FORTPI) ** (1.0 / C.alpha)
                * ((1.0 + esin) / (1.0 - esin)) ** (C.e / 2.0)
            ) - FORTPI)
            if np.all(np.abs(fi1 - phi) < 1e-15):
                break
            fi1 = phi
    return lam, phi


# --------------------------------------------------------------------------
# geos
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class GeosConsts:
    es: float
    radius_p: float
    radius_p2: float
    radius_p_inv2: float
    radius_g: float
    radius_g_1: float
    C: float
    flip_axis: bool


def setup_geos(ell: Ellipsoid, h: float, sweep: str = "y") -> GeosConsts:
    if sweep not in ("x", "y"):
        raise ValueError("geos: sweep must be x or y")
    radius_g_1 = h / ell.a
    if radius_g_1 <= 0 or radius_g_1 > 1e10:
        raise ValueError("geos: invalid h")
    radius_g = 1.0 + radius_g_1
    Cc = radius_g * radius_g - 1.0
    if ell.es != 0.0:
        return GeosConsts(ell.es, math.sqrt(ell.one_es), ell.one_es,
                          1.0 / ell.one_es, radius_g, radius_g_1, Cc, sweep == "x")
    return GeosConsts(0.0, 1.0, 1.0, 1.0, radius_g, radius_g_1, Cc, sweep == "x")


def geos_fwd(lam, phi, C: GeosConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.es != 0.0:
            ph = np.arctan(C.radius_p2 * np.tan(phi))
            r = C.radius_p / np.hypot(C.radius_p * np.cos(ph), np.sin(ph))
        else:
            ph = phi
            r = 1.0
        Vx = r * np.cos(lam) * np.cos(ph)
        Vy = r * np.sin(lam) * np.cos(ph)
        Vz = r * np.sin(ph)
        bad = ((C.radius_g - Vx) * Vx - Vy * Vy - Vz * Vz * C.radius_p_inv2) < 0.0
        tmp = C.radius_g - Vx
        if C.flip_axis:
            x = C.radius_g_1 * np.arctan(Vy / np.hypot(Vz, tmp))
            y = C.radius_g_1 * np.arctan(Vz / tmp)
        else:
            x = C.radius_g_1 * np.arctan(Vy / tmp)
            y = C.radius_g_1 * np.arctan(Vz / np.hypot(Vy, tmp))
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def geos_inv(x, y, C: GeosConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        Vx = -1.0
        if C.flip_axis:
            Vz = np.tan(y / C.radius_g_1)
            Vy = np.tan(x / C.radius_g_1) * np.hypot(1.0, Vz)
        else:
            Vy = np.tan(x / C.radius_g_1)
            Vz = np.tan(y / C.radius_g_1) * np.hypot(1.0, Vy)
        if C.es != 0.0:
            aa = Vz / C.radius_p
            aa = Vy * Vy + aa * aa + Vx * Vx
        else:
            aa = Vy * Vy + Vz * Vz + Vx * Vx
        b = 2.0 * C.radius_g * Vx
        det = b * b - 4.0 * aa * C.C
        bad = det < 0.0
        k = (-b - np.sqrt(np.maximum(det, 0.0))) / (2.0 * aa)
        Vxk = C.radius_g + k * Vx
        Vyk = Vy * k
        Vzk = Vz * k
        lam = np.arctan2(Vyk, Vxk)
        phi = np.arctan(Vzk * np.cos(lam) / Vxk)
        if C.es != 0.0:
            phi = np.arctan(C.radius_p_inv2 * np.tan(phi))
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

"""Azimuthal projections: stere (+ups), sterea, laea, gnom, ortho, aeqd.

Numpy re-derivations of the reference kernels:
  * stere  — /root/reference/src/projections/stere.cpp (ssfn_ :31-36,
    e_fwd :38-95, e_inv :135-185, s_fwd :97-133, s_inv :187-231,
    setup :233-292; ups wrapper :294-…)
  * sterea — /root/reference/src/projections/sterea.cpp over the Gauss
    sphere (src/gauss.cpp -> kernels.common.gauss_*)
  * laea   — /root/reference/src/projections/laea.cpp
  * gnom   — /root/reference/src/projections/gnom.cpp (spherical here;
    the geodesic-based ellipsoidal variant lives in kernels/karney.py)
  * ortho  — /root/reference/src/projections/ortho.cpp (spherical + the
    closed-form/Newton ellipsoidal path :140-300)
  * aeqd   — /root/reference/src/projections/aeqd.cpp (spherical all
    modes; ellipsoidal polar via meridian distance here; the
    geodesic-based ellipsoidal oblique lives in kernels/karney.py)

Modes follow the reference enum: N_POLE/S_POLE when |lat_0|=90,
EQUIT when lat_0=0, OBLIQ otherwise. All kernels dimensionless.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import (
    authlat,
    authset,
    gauss_fwd,
    gauss_ini,
    gauss_inv,
    qsfn,
    tsfn,
)
from proj_spark.kernels.tmerc import _enfn, inv_mlfn, mlfn

EPS10 = 1e-10
HALFPI = math.pi / 2
FORTPI = math.pi / 4

N_POLE, S_POLE, EQUIT, OBLIQ = 0, 1, 2, 3


def _mode(phi0: float) -> int:
    t = abs(phi0)
    if abs(t - HALFPI) < EPS10:
        return S_POLE if phi0 < 0 else N_POLE
    return OBLIQ if t > EPS10 else EQUIT


# --------------------------------------------------------------------------
# stere
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class StereConsts:
    e: float
    es: float
    phi0: float
    mode: int
    akm1: float
    sinX1: float = 0.0
    cosX1: float = 0.0
    sinph0: float = 0.0
    cosph0: float = 0.0


def _ssfn(phi, sinphi, e):
    sinphi = sinphi * e
    return np.tan(0.5 * (HALFPI + phi)) * ((1.0 - sinphi) / (1.0 + sinphi)) ** (0.5 * e)


def setup_stere(ell: Ellipsoid, lat_0: float = 90.0, lat_ts: float | None = None,
                k0: float = 1.0) -> StereConsts:
    phi0 = math.radians(lat_0)
    mode = _mode(phi0)
    phits = abs(math.radians(lat_ts)) if lat_ts is not None else HALFPI
    e = ell.e
    if ell.es != 0.0:
        if mode in (N_POLE, S_POLE):
            if abs(phits - HALFPI) < EPS10:
                akm1 = 2.0 * k0 / math.sqrt((1 + e) ** (1 + e) * (1 - e) ** (1 - e))
            else:
                t = math.sin(phits)
                akm1 = math.cos(phits) / float(tsfn(phits, t, e))
                t *= e
                akm1 /= math.sqrt(1.0 - t * t)
            return StereConsts(e, ell.es, phi0, mode, akm1)
        t = math.sin(phi0)
        X = 2.0 * math.atan(float(_ssfn(phi0, t, e))) - HALFPI
        t *= e
        akm1 = 2.0 * k0 * math.cos(phi0) / math.sqrt(1.0 - t * t)
        return StereConsts(e, ell.es, phi0, mode, akm1,
                           sinX1=math.sin(X), cosX1=math.cos(X))
    # sphere
    if mode in (N_POLE, S_POLE):
        akm1 = (math.cos(phits) / math.tan(FORTPI - 0.5 * phits)
                if abs(phits - HALFPI) >= EPS10 else 2.0 * k0)
        return StereConsts(0.0, 0.0, phi0, mode, akm1)
    return StereConsts(0.0, 0.0, phi0, mode, 2.0 * k0,
                       sinph0=math.sin(phi0), cosph0=math.cos(phi0))


def stere_fwd(lam, phi, C: StereConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sinlam = np.sin(lam)
    coslam = np.cos(lam)
    sinphi = np.sin(phi)
    if C.es != 0.0:
        if C.mode in (OBLIQ, EQUIT):
            X = 2.0 * np.arctan(_ssfn(phi, sinphi, C.e)) - HALFPI
            sinX = np.sin(X)
            cosX = np.cos(X)
            if C.mode == OBLIQ:
                A = C.akm1 / (C.cosX1 * (1.0 + C.sinX1 * sinX + C.cosX1 * cosX * coslam))
                y = A * (C.cosX1 * sinX - C.sinX1 * cosX * coslam)
            else:
                A = C.akm1 / (1.0 + cosX * coslam)
                y = A * sinX
            x = A * cosX
        else:
            if C.mode == S_POLE:
                phi = -phi
                coslam = -coslam
                sinphi = -sinphi
            x = np.where(
                np.abs(phi - HALFPI) < 1e-15, 0.0, C.akm1 * tsfn(phi, sinphi, C.e)
            )
            y = -x * coslam
        return x * sinlam, y
    # sphere
    cosphi = np.cos(phi)
    if C.mode in (OBLIQ, EQUIT):
        if C.mode == EQUIT:
            denom = 1.0 + cosphi * coslam
        else:
            denom = 1.0 + C.sinph0 * sinphi + C.cosph0 * cosphi * coslam
        with np.errstate(divide="ignore", invalid="ignore"):
            yk = C.akm1 / denom
            x = yk * cosphi * sinlam
            y = yk * (sinphi if C.mode == EQUIT
                      else C.cosph0 * sinphi - C.sinph0 * cosphi * coslam)
        bad = denom <= EPS10
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)
    if C.mode == N_POLE:
        coslam = -coslam
        phi = -phi
    with np.errstate(divide="ignore", invalid="ignore"):
        yk = C.akm1 * np.tan(FORTPI + 0.5 * phi)
    return sinlam * yk, yk * coslam


def stere_inv(x, y, C: StereConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    rho = np.hypot(x, y)
    if C.es != 0.0:
        if C.mode in (OBLIQ, EQUIT):
            tp = 2.0 * np.arctan2(rho * C.cosX1, C.akm1)
            cosphi = np.cos(tp)
            sinphi = np.sin(tp)
            with np.errstate(divide="ignore", invalid="ignore"):
                phi_l = np.where(
                    rho == 0.0,
                    np.arcsin(np.clip(cosphi * C.sinX1, -1, 1)),
                    np.arcsin(np.clip(cosphi * C.sinX1 + y * sinphi * C.cosX1 / rho, -1, 1)),
                )
            tp = np.tan(0.5 * (HALFPI + phi_l))
            xw = x * sinphi
            yw = rho * C.cosX1 * cosphi - y * C.sinX1 * sinphi
            halfpi = HALFPI
            halfe = 0.5 * C.e
        else:
            yy = -y if C.mode == N_POLE else y
            tp = -rho / C.akm1
            phi_l = HALFPI - 2.0 * np.arctan(tp)
            xw = x
            yw = yy
            halfpi = -HALFPI
            halfe = -0.5 * C.e
        phi = phi_l
        for _ in range(8):
            sinphi = C.e * np.sin(phi_l)
            phi = 2.0 * np.arctan(tp * ((1.0 + sinphi) / (1.0 - sinphi)) ** halfe) - halfpi
            if np.all(np.abs(phi_l - phi) < 1e-10):
                break
            phi_l = phi
        if C.mode == S_POLE:
            phi = -phi
        lam = np.where((xw == 0) & (yw == 0), 0.0, np.arctan2(xw, yw))
        return lam, phi
    # sphere
    c = 2.0 * np.arctan(rho / C.akm1)
    sinc = np.sin(c)
    cosc = np.cos(c)
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.mode == EQUIT:
            phi = np.where(np.abs(rho) <= EPS10, 0.0, np.arcsin(np.clip(y * sinc / rho, -1, 1)))
            lam = np.where((cosc != 0) | (x != 0), np.arctan2(x * sinc, cosc * rho), 0.0)
        elif C.mode == OBLIQ:
            phi = np.where(
                np.abs(rho) <= EPS10, C.phi0,
                np.arcsin(np.clip(cosc * C.sinph0 + y * sinc * C.cosph0 / rho, -1, 1)),
            )
            cc = cosc - C.sinph0 * np.sin(phi)
            lam = np.where((cc != 0) | (x != 0), np.arctan2(x * sinc * C.cosph0, cc * rho), 0.0)
        else:
            yy = -y if C.mode == N_POLE else y
            phi = np.where(
                np.abs(rho) <= EPS10, C.phi0,
                np.arcsin(np.clip(cosc if C.mode == N_POLE else -cosc, -1, 1)),
            )
            lam = np.where((x == 0) & (yy == 0), 0.0, np.arctan2(x, yy))
    return lam, phi


# --------------------------------------------------------------------------
# sterea (oblique stereographic on the Gauss sphere)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class StereaConsts:
    k0: float
    phic0: float
    sinc0: float
    cosc0: float
    R2: float
    g: dict = field(hash=False)


def setup_sterea(ell: Ellipsoid, lat_0: float = 0.0, k0: float = 1.0) -> StereaConsts:
    phi0 = math.radians(lat_0)
    g = gauss_ini(ell.e, phi0)
    return StereaConsts(k0, g["chi0"], math.sin(g["chi0"]), math.cos(g["chi0"]),
                        2.0 * g["rc"], g)


def sterea_fwd(lam, phi, C: StereaConsts):
    lam_s, phi_s = gauss_fwd(np.asarray(lam, dtype=np.float64),
                             np.asarray(phi, dtype=np.float64), C.g)
    sinc = np.sin(phi_s)
    cosc = np.cos(phi_s)
    cosl = np.cos(lam_s)
    k = C.k0 * C.R2 / (1.0 + C.sinc0 * sinc + C.cosc0 * cosc * cosl)
    return k * cosc * np.sin(lam_s), k * (C.cosc0 * sinc - C.sinc0 * cosc * cosl)


def sterea_inv(x, y, C: StereaConsts):
    x = np.asarray(x, dtype=np.float64) / C.k0
    y = np.asarray(y, dtype=np.float64) / C.k0
    rho = np.hypot(x, y)
    with np.errstate(divide="ignore", invalid="ignore"):
        c = 2.0 * np.arctan2(rho, C.R2)
        sinc = np.sin(c)
        cosc = np.cos(c)
        phi_s = np.where(
            rho == 0.0, C.phic0,
            np.arcsin(np.clip(cosc * C.sinc0 + y * sinc * C.cosc0 / rho, -1, 1)),
        )
        lam_s = np.where(
            rho == 0.0, 0.0,
            np.arctan2(x * sinc, rho * C.cosc0 * cosc - y * C.sinc0 * sinc),
        )
    return gauss_inv(lam_s, phi_s, C.g)


# --------------------------------------------------------------------------
# laea
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class LAEAConsts:
    e: float
    es: float
    one_es: float
    phi0: float
    mode: int
    sinb1: float = 0.0
    cosb1: float = 0.0
    qp: float = 0.0
    rq: float = 0.0
    dd: float = 0.0
    xmf: float = 0.0
    ymf: float = 0.0
    apa: tuple = (0.0, 0.0, 0.0)


def setup_laea(ell: Ellipsoid, lat_0: float = 0.0) -> LAEAConsts:
    phi0 = math.radians(lat_0)
    mode = _mode(phi0)
    if ell.es != 0.0:
        qp = float(qsfn(1.0, ell.e, ell.one_es))
        apa = authset(ell.es)
        if mode in (N_POLE, S_POLE):
            return LAEAConsts(ell.e, ell.es, ell.one_es, phi0, mode,
                              qp=qp, dd=1.0, apa=apa)
        rq = math.sqrt(0.5 * qp)
        if mode == EQUIT:
            return LAEAConsts(ell.e, ell.es, ell.one_es, phi0, mode,
                              qp=qp, rq=rq, dd=1.0 / rq, xmf=1.0,
                              ymf=0.5 * qp, apa=apa)
        sinphi = math.sin(phi0)
        sinb1 = float(qsfn(sinphi, ell.e, ell.one_es)) / qp
        cosb1 = math.sqrt(1.0 - sinb1 * sinb1)
        dd = math.cos(phi0) / (math.sqrt(1.0 - ell.es * sinphi * sinphi) * rq * cosb1)
        return LAEAConsts(ell.e, ell.es, ell.one_es, phi0, mode,
                          sinb1=sinb1, cosb1=cosb1, qp=qp, rq=rq, dd=dd,
                          xmf=rq * dd, ymf=rq / dd, apa=apa)
    return LAEAConsts(0.0, 0.0, 1.0, phi0, mode,
                      sinb1=math.sin(phi0), cosb1=math.cos(phi0))


def laea_fwd(lam, phi, C: LAEAConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sinlam = np.sin(lam)
    coslam = np.cos(lam)
    if C.es != 0.0:
        sinphi = np.sin(phi)
        q = qsfn(sinphi, C.e, C.one_es)
        with np.errstate(divide="ignore", invalid="ignore"):
            if C.mode in (OBLIQ, EQUIT):
                sinb = q / C.qp
                cosb2 = 1.0 - sinb * sinb
                cosb = np.sqrt(np.maximum(cosb2, 0.0))
                if C.mode == OBLIQ:
                    b = 1.0 + C.sinb1 * sinb + C.cosb1 * cosb * coslam
                    b = np.sqrt(2.0 / b)
                    y = C.ymf * b * (C.cosb1 * sinb - C.sinb1 * cosb * coslam)
                else:
                    b = np.sqrt(2.0 / (1.0 + cosb * coslam))
                    y = b * sinb * C.ymf
                x = C.xmf * b * cosb * sinlam
                return x, y
            if C.mode == N_POLE:
                bchk = HALFPI + phi
                q = C.qp - q
            else:
                bchk = phi - HALFPI
                q = C.qp + q
            b = np.sqrt(np.maximum(q, 0.0))
            ok = q >= 1e-15
            x = np.where(ok, b * sinlam, 0.0)
            y = np.where(ok, coslam * (b if C.mode == S_POLE else -b), 0.0)
            bad = np.abs(bchk) < EPS10  # antipode: outside domain
            x = np.where(bad, np.nan, x)
            y = np.where(bad, np.nan, y)
        return x, y
    # sphere
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    if C.mode in (OBLIQ, EQUIT):
        if C.mode == EQUIT:
            yk = 1.0 + cosphi * coslam
        else:
            yk = 1.0 + C.sinb1 * sinphi + C.cosb1 * cosphi * coslam
        with np.errstate(divide="ignore", invalid="ignore"):
            yk = np.where(yk <= EPS10, np.nan, np.sqrt(2.0 / yk))
            x = yk * cosphi * sinlam
            y = yk * (sinphi if C.mode == EQUIT
                      else C.cosb1 * sinphi - C.sinb1 * cosphi * coslam)
        return x, y
    if C.mode == N_POLE:
        coslam = -coslam
    bad = np.abs(phi + C.phi0) < EPS10
    yv = FORTPI - phi * 0.5
    yv = 2.0 * (np.cos(yv) if C.mode == S_POLE else np.sin(yv))
    x = yv * sinlam
    y = yv * coslam
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def laea_inv(x, y, C: LAEAConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if C.es != 0.0:
        with np.errstate(divide="ignore", invalid="ignore"):
            if C.mode in (OBLIQ, EQUIT):
                xs = x / C.dd
                ys = y * C.dd
                rho = np.hypot(xs, ys)
                # asin domain (reference laea.cpp e_inverse asin_argument
                # guard): rho/(2 rq) > 1 is outside the disk -> NaN
                dom = 0.5 * rho / C.rq > 1.0
                arg = np.clip(0.5 * rho / C.rq, -1, 1)
                sCe = 2.0 * np.arcsin(arg)
                cCe = np.cos(sCe)
                sCe = np.sin(sCe)
                xs2 = xs * sCe
                if C.mode == OBLIQ:
                    ab = cCe * C.sinb1 + ys * sCe * C.cosb1 / rho
                    ys2 = rho * C.cosb1 * cCe - ys * C.sinb1 * sCe
                else:
                    ab = ys * sCe / rho
                    ys2 = rho * cCe
                zero = rho < EPS10
                lam = np.where(zero, 0.0, np.arctan2(xs2, ys2))
                phi = np.where(
                    zero, C.phi0, authlat(np.arcsin(np.clip(ab, -1, 1)), C.apa)
                )
                return np.where(dom, np.nan, lam), np.where(dom, np.nan, phi)
            yy = -y if C.mode == N_POLE else y
            q = x * x + yy * yy
            ab = 1.0 - q / C.qp
            if C.mode == S_POLE:
                ab = -ab
            zero = q == 0.0
            # reference polar branch uses raw asin(ab): beyond-the-disk
            # |ab| > 1 is a domain error -> NaN (tiny rounding overshoot
            # still clipped)
            dom = np.abs(ab) > 1.0 + 1e-12
            lam = np.where(zero, 0.0, np.arctan2(x, yy))
            phi = np.where(zero, C.phi0, authlat(np.arcsin(np.clip(ab, -1, 1)), C.apa))
            return np.where(dom, np.nan, lam), np.where(dom, np.nan, phi)
    # sphere
    rh = np.hypot(x, y)
    half = rh * 0.5
    with np.errstate(invalid="ignore"):
        c = 2.0 * np.arcsin(np.clip(half, -1, 1))
        sinz = np.sin(c)
        cosz = np.cos(c)
        if C.mode == EQUIT:
            phi = np.where(np.abs(rh) <= EPS10, 0.0,
                           np.arcsin(np.clip(y * sinz / rh, -1, 1)))
            xs = x * sinz
            ys = cosz * rh
        elif C.mode == OBLIQ:
            phi = np.where(
                np.abs(rh) <= EPS10, C.phi0,
                np.arcsin(np.clip(cosz * C.sinb1 + y * sinz * C.cosb1 / rh, -1, 1)),
            )
            xs = x * sinz * C.cosb1
            ys = (cosz - np.sin(phi) * C.sinb1) * rh
        elif C.mode == N_POLE:
            phi = HALFPI - c
            xs = x
            ys = -y
        else:
            phi = c - HALFPI
            xs = x
            ys = y
        bad = half > 1.0
        lam = np.where(
            (ys == 0.0) & (C.mode in (EQUIT, OBLIQ)), 0.0, np.arctan2(xs, ys)
        )
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


# --------------------------------------------------------------------------
# gnom (spherical)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class GnomConsts:
    phi0: float
    mode: int
    sinph0: float
    cosph0: float
    es: float = 0.0
    geod: object = None  # karney.GeodConsts on the unit ellipsoid


def setup_gnom(ell: Ellipsoid, lat_0: float = 0.0) -> GnomConsts:
    phi0 = math.radians(lat_0)
    if ell.es != 0.0:
        # ellipsoidal gnomonic via Karney geodesics on the unit ellipsoid
        # (reference gnom.cpp:206 geod_init(&Q->g, 1, P->f))
        from proj_spark.kernels import karney

        return GnomConsts(phi0, _mode(phi0), math.sin(phi0),
                          math.cos(phi0), ell.es,
                          karney.geod_consts(1.0, ell.f))
    return GnomConsts(phi0, _mode(phi0), math.sin(phi0), math.cos(phi0))


def gnom_fwd(lam, phi, C: GnomConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if C.es != 0.0:
        # reference gnom.cpp gnom_e_forward: rho = m12/M12 (Karney's
        # generalization of the gnomonic, exact for geodesics thru center)
        from proj_spark.kernels import karney

        r = karney.geod_inverse(
            C.geod, np.full_like(phi, math.degrees(C.phi0)),
            np.zeros_like(lam), np.degrees(phi), np.degrees(lam),
            want_scale=True)
        with np.errstate(divide="ignore", invalid="ignore"):
            rho = r["m12"] / r["M12"]
            az = np.radians(r["azi1"])
            x = rho * np.sin(az)
            y = rho * np.cos(az)
        bad = ~(r["M12"] > 0.0)
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    coslam = np.cos(lam)
    if C.mode == EQUIT:
        d = cosphi * coslam
    elif C.mode == OBLIQ:
        d = C.sinph0 * sinphi + C.cosph0 * cosphi * coslam
    elif C.mode == S_POLE:
        d = -sinphi
    else:
        d = sinphi
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        x = inv * cosphi * np.sin(lam)
        if C.mode == EQUIT:
            y = inv * sinphi
        elif C.mode == OBLIQ:
            y = inv * (C.cosph0 * sinphi - C.sinph0 * cosphi * coslam)
        elif C.mode == N_POLE:
            y = inv * cosphi * -coslam
        else:
            y = inv * cosphi * coslam
    bad = d <= EPS10
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def gnom_inv(x, y, C: GnomConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if C.es != 0.0:
        # reference gnom.cpp gnom_e_inverse: Newton on distance s along the
        # azi0 geodesic; solve rho(s) = rho (or 1/rho(s) = 1/rho far out)
        from proj_spark.kernels import karney

        eps = 0.01 * math.sqrt(np.finfo(float).eps)
        lat0 = np.full_like(x, math.degrees(C.phi0))
        lon0 = np.zeros_like(x)
        azi0 = np.degrees(np.arctan2(x, y))
        rho = np.hypot(x, y)
        s = np.arctan(rho)
        little = rho <= 1.0
        rho = np.where(little, rho, 1.0 / np.where(rho != 0, rho, 1.0))
        trip = np.zeros(x.shape, dtype=bool)
        with np.errstate(divide="ignore", invalid="ignore"):
            for _ in range(10):
                r = karney.geod_direct(C.geod, lat0, lon0, azi0, s,
                                       want_scale=True)
                if trip.all():
                    break
                m, M = r["m12"], r["M12"]
                ds = np.where(little, (m - rho * M) * M,
                              (rho * m - M) * m)
                s = np.where(trip, s, s - ds)
                trip |= ~(np.abs(ds) >= eps)
            r = karney.geod_direct(C.geod, lat0, lon0, azi0, s)
        lam = np.radians(r["lon2"])
        phi = np.radians(r["lat2"])
        return (np.where(trip, lam, np.nan), np.where(trip, phi, np.nan))
    rh = np.hypot(x, y)
    z = np.arctan(rh)
    sinz = np.sin(z)
    cosz = np.sqrt(1.0 - sinz * sinz)
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.mode == OBLIQ:
            raw = cosz * C.sinph0 + y * sinz * C.cosph0 / rh
            phi = np.where(np.abs(raw) >= 1.0,
                           np.where(raw > 0, HALFPI, -HALFPI),
                           np.arcsin(np.clip(raw, -1, 1)))
            ys = (cosz - C.sinph0 * np.sin(phi)) * rh
            xs = x * sinz * C.cosph0
        elif C.mode == EQUIT:
            raw = y * sinz / rh
            phi = np.where(np.abs(raw) >= 1.0,
                           np.where(raw > 0, HALFPI, -HALFPI),
                           np.arcsin(np.clip(raw, -1, 1)))
            ys = cosz * rh
            xs = x * sinz
        elif C.mode == S_POLE:
            phi = z - HALFPI
            xs, ys = x, y
        else:
            phi = HALFPI - z
            xs, ys = x, -y
        lam = np.arctan2(xs, ys)
    small = np.abs(rh) <= EPS10
    return np.where(small, 0.0, lam), np.where(small, C.phi0, phi)


# --------------------------------------------------------------------------
# ortho
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class OrthoConsts:
    e: float
    es: float
    one_es: float
    phi0: float
    mode: int
    sinph0: float
    cosph0: float
    k0: float
    sinalpha: float
    cosalpha: float
    nu0: float = 0.0
    y_shift: float = 0.0
    y_scale: float = 1.0


def setup_ortho(ell: Ellipsoid, lat_0: float = 0.0, k0: float = 1.0,
                alpha: float = 0.0) -> OrthoConsts:
    phi0 = math.radians(lat_0)
    mode = _mode(phi0)
    s0, c0 = math.sin(phi0), math.cos(phi0)
    al = math.radians(alpha)
    if ell.es != 0.0:
        nu0 = 1.0 / math.sqrt(1.0 - ell.es * s0 * s0)
        return OrthoConsts(ell.e, ell.es, ell.one_es, phi0, mode, s0, c0, k0,
                           math.sin(al), math.cos(al), nu0,
                           ell.es * nu0 * s0 * c0,
                           1.0 / math.sqrt(1.0 - ell.es * c0 * c0))
    return OrthoConsts(0.0, 0.0, 1.0, phi0, mode, s0, c0, k0,
                       math.sin(al), math.cos(al))


def ortho_fwd(lam, phi, C: OrthoConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    cosphi = np.cos(phi)
    sinphi = np.sin(phi)
    coslam = np.cos(lam)
    sinlam = np.sin(lam)
    if C.es != 0.0:
        bad = C.sinph0 * sinphi + C.cosph0 * cosphi * coslam < -EPS10
        nu = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
        xp = nu * cosphi * sinlam
        yp = (nu * (sinphi * C.cosph0 - cosphi * C.sinph0 * coslam)
              + C.es * (C.nu0 * C.sinph0 - nu * sinphi) * C.cosph0)
        x = (C.cosalpha * xp - C.sinalpha * yp) * C.k0
        y = (C.sinalpha * xp + C.cosalpha * yp) * C.k0
        return np.where(bad, np.nan, x), np.where(bad, np.nan, y)
    if C.mode == EQUIT:
        bad = cosphi * coslam < -EPS10
        yp = sinphi
    elif C.mode == OBLIQ:
        bad = C.sinph0 * sinphi + C.cosph0 * cosphi * coslam < -EPS10
        yp = C.cosph0 * sinphi - C.sinph0 * cosphi * coslam
    else:
        cl = -coslam if C.mode == N_POLE else coslam
        bad = np.abs(phi - C.phi0) - EPS10 > HALFPI
        yp = cosphi * cl
    xp = cosphi * sinlam
    x = (xp * C.cosalpha - yp * C.sinalpha) * C.k0
    y = (xp * C.sinalpha + yp * C.cosalpha) * C.k0
    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def _ortho_s_inv(x, y, C: OrthoConsts):
    rh = np.hypot(x, y)
    sinc = np.minimum(rh, 1.0)
    bad = (rh - 1.0) > EPS10
    cosc = np.sqrt(1.0 - sinc * sinc)
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.mode == N_POLE:
            phi = np.arccos(sinc)
            lam = np.arctan2(x, -y)
        elif C.mode == S_POLE:
            phi = -np.arccos(sinc)
            lam = np.arctan2(x, y)
        else:
            if C.mode == EQUIT:
                raw = y * sinc / rh
                xs = x * sinc
                ys = cosc * rh
            else:
                raw = cosc * C.sinph0 + y * sinc * C.cosph0 / rh
                ys = (cosc - C.sinph0 * raw) * rh
                xs = x * sinc * C.cosph0
            phi = np.where(np.abs(raw) >= 1.0,
                           np.where(raw < 0, -HALFPI, HALFPI),
                           np.arcsin(np.clip(raw, -1, 1)))
            lam = np.where(
                ys == 0.0,
                np.where(xs == 0.0, 0.0, np.where(xs < 0, -HALFPI, HALFPI)),
                np.arctan2(xs, ys),
            )
        small = np.abs(rh) <= EPS10
        phi = np.where(small, C.phi0, phi)
        lam = np.where(small, 0.0, lam)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


def ortho_inv(x, y, C: OrthoConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    xr = (C.cosalpha * x + C.sinalpha * y) / C.k0
    yr = (-C.sinalpha * x + C.cosalpha * y) / C.k0
    if C.es == 0.0:
        return _ortho_s_inv(xr, yr, C)
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.mode in (N_POLE, S_POLE):
            rh2 = xr * xr + yr * yr
            sign = 1.0 if C.mode == N_POLE else -1.0
            phi = np.where(
                rh2 >= 1.0 - 1e-15, 0.0,
                np.arccos(np.sqrt(np.clip(rh2 * C.one_es / (1.0 - C.es * rh2), 0, 1))) * sign,
            )
            lam = np.arctan2(xr, yr * (-1.0 if C.mode == N_POLE else 1.0))
            bad = (rh2 - 1.0) > EPS10
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)
        if C.mode == EQUIT:
            # equation of the ellipse (reference ortho.cpp e_inverse):
            # points outside x^2 + (y*a/b)^2 = 1 are outside the domain
            bad = xr * xr + yr * yr / C.one_es > 1.0 + 1e-11
            sinphi2 = np.where(yr == 0.0, 0.0,
                               1.0 / (((1.0 - C.es) / yr) ** 2 + C.es))
            at_pole = sinphi2 > 1.0 - 1e-11
            phi = np.arcsin(np.sqrt(np.clip(sinphi2, 0, 1))) * np.sign(yr)
            sinlam = xr * np.sqrt((1.0 - C.es * sinphi2) / np.maximum(1.0 - sinphi2, 1e-300))
            lam = np.where(
                np.abs(sinlam) - 1.0 > -1e-15,
                HALFPI * np.sign(xr),
                np.arcsin(np.clip(sinlam, -1, 1)),
            )
            phi = np.where(at_pole, HALFPI * np.sign(yr), phi)
            lam = np.where(at_pole, 0.0, lam)
            return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)
        # oblique: spherical first guess + 2D Newton (reference :255-300),
        # after the reference's unit-disk guard on the recentered coords
        yc = (yr - C.y_shift) / C.y_scale
        bad = xr * xr + yc * yc > 1.0 + 1e-11
        lam, phi = _ortho_s_inv(xr, yc, C)
        conv = np.zeros(np.broadcast(lam, phi).shape, dtype=bool)
        for _ in range(20):
            cosphi = np.cos(phi)
            sinphi = np.sin(phi)
            coslam = np.cos(lam)
            sinlam = np.sin(lam)
            ome = 1.0 - C.es * sinphi * sinphi
            nu = 1.0 / np.sqrt(ome)
            xn = nu * cosphi * sinlam
            yn = (nu * (sinphi * C.cosph0 - cosphi * C.sinph0 * coslam)
                  + C.es * (C.nu0 * C.sinph0 - nu * sinphi) * C.cosph0)
            rho = (1.0 - C.es) * nu / ome
            j11 = -rho * sinphi * sinlam
            j12 = nu * cosphi * coslam
            j21 = rho * (cosphi * C.cosph0 + sinphi * C.sinph0 * coslam)
            j22 = nu * C.sinph0 * cosphi * sinlam
            det = j11 * j22 - j12 * j21
            dx = xr - xn
            dy = yr - yn
            dphi = (j22 * dx - j12 * dy) / det
            dlam = (-j21 * dx + j11 * dy) / det
            phi = phi + dphi
            over = phi > HALFPI
            under = phi < -HALFPI
            phi = np.where(over, np.pi - phi, phi)
            phi = np.where(under, -np.pi - phi, phi)
            lam = np.where(over | under, lam + np.pi, lam) + dlam
            conv |= (np.abs(dphi) < 1e-12) & (np.abs(dlam) < 1e-12)
            if np.all(conv):
                break
        # reference: 20 Newton rounds without convergence is a domain
        # error (points at/beyond the horizon rim)
        bad = bad | ~conv
        lam = np.remainder(lam + np.pi, 2 * np.pi) - np.pi
        return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)


# --------------------------------------------------------------------------
# aeqd (spherical all modes; ellipsoidal polar)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class AEQDConsts:
    phi0: float
    mode: int
    sinph0: float
    cosph0: float
    es: float
    Mp: float = 0.0
    en: tuple = ()
    guam: bool = False
    e: float = 0.0
    M1: float = 0.0
    geod: object = None  # karney.GeodConsts on the unit ellipsoid


def setup_aeqd(ell: Ellipsoid, lat_0: float = 0.0,
               guam: bool = False) -> AEQDConsts:
    phi0 = math.radians(lat_0)
    mode = _mode(phi0)
    if ell.es != 0.0:
        en = _enfn(ell.n)
        if guam:
            # reference aeqd.cpp:300-304 e_guam setup
            M1 = float(mlfn(phi0, math.sin(phi0), math.cos(phi0), en))
            return AEQDConsts(phi0, mode, math.sin(phi0), math.cos(phi0),
                              ell.es, 0.0, en, True, ell.e, M1)
        if mode in (N_POLE, S_POLE):
            Mp = float(mlfn(HALFPI if mode == N_POLE else -HALFPI,
                            1.0 if mode == N_POLE else -1.0, 0.0, en))
            return AEQDConsts(phi0, mode, math.sin(phi0), math.cos(phi0),
                              ell.es, Mp, en)
        # oblique/equatorial ellipsoidal: Karney geodesics on the unit
        # ellipsoid (reference aeqd.cpp:280 geod_init(&Q->g, 1, P->f))
        from proj_spark.kernels import karney

        return AEQDConsts(phi0, mode, math.sin(phi0), math.cos(phi0),
                          ell.es, 0.0, en,
                          geod=karney.geod_consts(1.0, ell.f))
    return AEQDConsts(phi0, mode, math.sin(phi0), math.cos(phi0), 0.0)


def aeqd_fwd(lam, phi, C: AEQDConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    sinlam = np.sin(lam)
    coslam = np.cos(lam)
    if C.es != 0.0 and C.guam:
        # reference aeqd.cpp e_guam_fwd
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        t = 1.0 / np.sqrt(1.0 - C.es * sinphi * sinphi)
        x = lam * cosphi * t
        y = (mlfn(phi, sinphi, cosphi, C.en) - C.M1
             + 0.5 * lam * lam * cosphi * sinphi * t)
        return x, y
    if C.es != 0.0 and C.mode in (EQUIT, OBLIQ):
        # reference aeqd.cpp aeqd_e_forward: geodesic azimuth+distance
        from proj_spark.kernels import karney

        r = karney.geod_inverse(
            C.geod, np.full_like(phi, math.degrees(C.phi0)),
            np.zeros_like(lam), np.degrees(phi), np.degrees(lam))
        az = np.radians(r["azi1"])
        s12 = r["s12"]
        near = (np.abs(lam) < EPS10) & (np.abs(phi - C.phi0) < EPS10)
        return (np.where(near, 0.0, s12 * np.sin(az)),
                np.where(near, 0.0, s12 * np.cos(az)))
    if C.es != 0.0:  # polar ellipsoidal
        cl = -coslam if C.mode == N_POLE else coslam
        ph = -phi if C.mode == N_POLE else phi
        rho = np.abs(C.Mp - mlfn(phi, np.sin(phi), np.cos(phi), C.en))
        return rho * sinlam, rho * cl
    if C.mode in (EQUIT, OBLIQ):
        cosphi = np.cos(phi)
        sinphi = np.sin(phi)
        if C.mode == EQUIT:
            cosc = cosphi * coslam
        else:
            cosc = C.sinph0 * sinphi + C.cosph0 * cosphi * coslam
        with np.errstate(divide="ignore", invalid="ignore"):
            c = np.arccos(np.clip(cosc, -1, 1))
            k = np.where(np.abs(np.abs(cosc) - 1.0) < 1e-14, 1.0, c / np.sin(c))
            x = k * cosphi * sinlam
            if C.mode == EQUIT:
                y = k * sinphi
            else:
                y = k * (C.cosph0 * sinphi - C.sinph0 * cosphi * coslam)
        anti = (np.abs(np.abs(cosc) - 1.0) < 1e-14) & (cosc < 0)
        return np.where(anti, np.nan, x), np.where(anti, np.nan, y)
    # polar spherical
    ph = -phi if C.mode == N_POLE else phi
    cl = -coslam if C.mode == N_POLE else coslam
    yv = HALFPI + ph
    bad = np.abs(ph - HALFPI) < EPS10
    return np.where(bad, np.nan, yv * sinlam), np.where(bad, np.nan, yv * cl)


def aeqd_inv(x, y, C: AEQDConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    if C.es != 0.0 and C.guam:
        # reference aeqd.cpp e_guam_inv: 3-step fixed-point on phi
        x2 = 0.5 * x * x
        phi = np.full_like(x, C.phi0)
        t = np.zeros_like(x)
        for _ in range(3):
            t = C.e * np.sin(phi)
            t = np.sqrt(1.0 - t * t)
            phi = inv_mlfn(C.M1 + y - x2 * np.tan(phi) * t, C.en)
        lam = x * t / np.cos(phi)
        return lam, phi
    if C.es != 0.0 and C.mode in (EQUIT, OBLIQ):
        # reference aeqd.cpp aeqd_e_inverse: geodesic direct shot
        from proj_spark.kernels import karney

        s12 = np.hypot(x, y)
        azi1 = np.degrees(np.arctan2(x, y))
        r = karney.geod_direct(
            C.geod, np.full_like(x, math.degrees(C.phi0)),
            np.zeros_like(x), azi1, s12)
        small = s12 < EPS10
        return (np.where(small, 0.0, np.radians(r["lon2"])),
                np.where(small, C.phi0, np.radians(r["lat2"])))
    if C.es != 0.0:  # polar ellipsoidal
        rho = np.hypot(x, y)
        phi = inv_mlfn(C.Mp - rho if C.mode == N_POLE else C.Mp + rho, C.en)
        lam = np.arctan2(x, -y if C.mode == N_POLE else y)
        return lam, phi
    c_rh = np.hypot(x, y)
    bad = c_rh - EPS10 > np.pi
    c_rh = np.minimum(c_rh, np.pi)
    with np.errstate(divide="ignore", invalid="ignore"):
        if C.mode in (OBLIQ, EQUIT):
            sinc = np.sin(c_rh)
            cosc = np.cos(c_rh)
            if C.mode == EQUIT:
                phi = np.arcsin(np.clip(y * sinc / c_rh, -1, 1))
                xs = x * sinc
                ys = cosc * c_rh
            else:
                phi = np.arcsin(
                    np.clip(cosc * C.sinph0 + y * sinc * C.cosph0 / c_rh, -1, 1)
                )
                ys = (cosc - C.sinph0 * np.sin(phi)) * c_rh
                xs = x * sinc * C.cosph0
            lam = np.where(ys == 0.0, 0.0, np.arctan2(xs, ys))
        elif C.mode == N_POLE:
            phi = HALFPI - c_rh
            lam = np.arctan2(x, -y)
        else:
            phi = c_rh - HALFPI
            lam = np.arctan2(x, y)
    small = c_rh < EPS10
    phi = np.where(small, C.phi0, phi)
    lam = np.where(small, 0.0, lam)
    return np.where(bad, np.nan, lam), np.where(bad, np.nan, phi)

"""Quadrilateralized Spherical Cube (COBE sky cube).

Numpy re-derivation of /root/reference/src/projections/qsc.cpp (O'Neill &
Laubscher 1976 equations; ellipsoid handled via the geodetic->geocentric
latitude shift of Lambers & Kolb 2012). The cube face is fixed at setup
from lon_0/lat_0; the four in-face areas are vectorized masks.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid

EPS10 = 1e-10
FORTPI = math.pi / 4
HALFPI = math.pi / 2


@dataclass(frozen=True)
class QscConsts:
    face: str          # front right back left top bottom
    es: float
    a: float
    b: float
    one_minus_f: float
    one_minus_f_squared: float


def setup_qsc(ell: Ellipsoid, lam0: float, phi0: float) -> QscConsts:
    if phi0 >= HALFPI - FORTPI / 2.0:
        face = "top"
    elif phi0 <= -(HALFPI - FORTPI / 2.0):
        face = "bottom"
    elif abs(lam0) <= FORTPI:
        face = "front"
    elif abs(lam0) <= HALFPI + FORTPI:
        face = "right" if lam0 > 0 else "left"
    else:
        face = "back"
    omf = 1.0 - ell.f
    return QscConsts(face, ell.es, ell.a, ell.a * math.sqrt(1.0 - ell.es),
                     omf, omf * omf)


def _shift_lon(lon, offset):
    s = lon + offset
    s = np.where(s < -math.pi, s + 2 * math.pi, s)
    return np.where(s > math.pi, s - 2 * math.pi, s)


def _equat_theta_area(phi, y, x):
    """theta + area on an equatorial face (qsc.cpp:76-99)."""
    theta = np.arctan2(y, x)
    area = np.full(theta.shape, 0, dtype=np.int64)
    a1 = (theta > FORTPI) & (theta <= HALFPI + FORTPI)
    a2 = (theta > HALFPI + FORTPI) | (theta <= -(HALFPI + FORTPI))
    a3 = ~a1 & ~a2 & (np.abs(theta) > FORTPI)
    area[a1] = 1
    area[a2] = 2
    area[a3] = 3
    theta = np.where(a1, theta - HALFPI, theta)
    theta = np.where(a2, np.where(theta >= 0, theta - math.pi,
                                  theta + math.pi), theta)
    theta = np.where(a3, theta + HALFPI, theta)
    small = phi < EPS10
    return np.where(small, 0.0, theta), np.where(small, 0, area)


def qsc_fwd(lam, phi_in, C: QscConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi_in = np.asarray(phi_in, dtype=np.float64)
    if C.es != 0.0:
        lat = np.arctan(C.one_minus_f_squared * np.tan(phi_in))
    else:
        lat = phi_in

    lon = lam
    if C.face == "top":
        phi = HALFPI - lat
        c0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
        c1 = (lon > HALFPI + FORTPI) | (lon <= -(HALFPI + FORTPI))
        c2 = (lon > -(HALFPI + FORTPI)) & (lon <= -FORTPI)
        area = np.where(c0, 0, np.where(c1, 1, np.where(c2, 2, 3)))
        theta = np.where(
            c0, lon - HALFPI,
            np.where(c1, np.where(lon > 0, lon - math.pi, lon + math.pi),
                     np.where(c2, lon + HALFPI, lon)))
    elif C.face == "bottom":
        phi = HALFPI + lat
        c0 = (lon >= FORTPI) & (lon <= HALFPI + FORTPI)
        c1 = (lon < FORTPI) & (lon >= -FORTPI)
        c2 = (lon < -FORTPI) & (lon >= -(HALFPI + FORTPI))
        area = np.where(c0, 0, np.where(c1, 1, np.where(c2, 2, 3)))
        theta = np.where(
            c0, -lon + HALFPI,
            np.where(c1, -lon,
                     np.where(c2, -lon - HALFPI,
                              np.where(lon > 0, -lon + math.pi,
                                       -lon - math.pi))))
    else:
        if C.face == "right":
            lon = _shift_lon(lon, HALFPI)
        elif C.face == "back":
            lon = _shift_lon(lon, math.pi)
        elif C.face == "left":
            lon = _shift_lon(lon, -HALFPI)
        sinlat, coslat = np.sin(lat), np.cos(lat)
        sinlon, coslon = np.sin(lon), np.cos(lon)
        q = coslat * coslon
        r = coslat * sinlon
        s = sinlat
        if C.face == "front":
            phi = np.arccos(np.clip(q, -1, 1))
            theta, area = _equat_theta_area(phi, s, r)
        elif C.face == "right":
            phi = np.arccos(np.clip(r, -1, 1))
            theta, area = _equat_theta_area(phi, s, -q)
        elif C.face == "back":
            phi = np.arccos(np.clip(-q, -1, 1))
            theta, area = _equat_theta_area(phi, s, -r)
        else:  # left
            phi = np.arccos(np.clip(-r, -1, 1))
            theta, area = _equat_theta_area(phi, s, q)

    with np.errstate(divide="ignore", invalid="ignore"):
        mu = np.arctan(
            (12.0 / math.pi)
            * (theta + np.arccos(np.clip(np.sin(theta) * math.cos(FORTPI),
                                         -1, 1)) - HALFPI))
        t = np.sqrt(np.maximum(
            (1.0 - np.cos(phi)) / (np.cos(mu) ** 2)
            / (1.0 - np.cos(np.arctan(1.0 / np.cos(theta)))), 0.0))
    mu = mu + np.where(area == 1, HALFPI,
                       np.where(area == 2, math.pi,
                                np.where(area == 3, math.pi + HALFPI, 0.0)))
    return t * np.cos(mu), t * np.sin(mu)


def qsc_inv(x, y, C: QscConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    nu = np.arctan(np.sqrt(x * x + y * y))
    mu = np.arctan2(y, x)
    a0 = (x >= 0.0) & (x >= np.abs(y))
    a1 = ~a0 & (y >= 0.0) & (y >= np.abs(x))
    a2 = ~a0 & ~a1 & (x < 0.0) & (-x >= np.abs(y))
    a3 = ~a0 & ~a1 & ~a2
    area = np.where(a0, 0, np.where(a1, 1, np.where(a2, 2, 3)))
    mu = np.where(a1, mu - HALFPI, mu)
    mu = np.where(a2, np.where(mu < 0, mu + math.pi, mu - math.pi), mu)
    mu = np.where(a3, mu + HALFPI, mu)

    with np.errstate(divide="ignore", invalid="ignore"):
        t = (math.pi / 12.0) * np.tan(mu)
        tantheta = np.sin(t) / (np.cos(t) - 1.0 / math.sqrt(2.0))
        theta = np.arctan(tantheta)
        cosmu = np.cos(mu)
        tannu = np.tan(nu)
        cosphi = 1.0 - cosmu * cosmu * tannu * tannu * (
            1.0 - np.cos(np.arctan(1.0 / np.cos(theta))))
        cosphi = np.clip(cosphi, -1.0, 1.0)

    if C.face == "top":
        phi = np.arccos(cosphi)
        out_phi = HALFPI - phi
        out_lam = np.where(
            area == 0, theta + HALFPI,
            np.where(area == 1, np.where(theta < 0, theta + math.pi,
                                         theta - math.pi),
                     np.where(area == 2, theta - HALFPI, theta)))
    elif C.face == "bottom":
        phi = np.arccos(cosphi)
        out_phi = phi - HALFPI
        out_lam = np.where(
            area == 0, -theta + HALFPI,
            np.where(area == 1, -theta,
                     np.where(area == 2, -theta - HALFPI,
                              np.where(theta < 0, -theta - math.pi,
                                       -theta + math.pi))))
    else:
        q = cosphi
        t2 = q * q
        s = np.where(t2 >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t2, 0.0))
                     * np.sin(theta))
        t2 = t2 + s * s
        r = np.where(t2 >= 1.0, 0.0, np.sqrt(np.maximum(1.0 - t2, 0.0)))
        # rotate (q, r, s) into the correct area
        r2 = np.where(area == 1, -s, np.where(area == 2, -r,
                                              np.where(area == 3, s, r)))
        s2 = np.where(area == 1, r, np.where(area == 2, -s,
                                             np.where(area == 3, -r, s)))
        r, s = r2, s2
        if C.face == "right":
            q, r = -r, q
        elif C.face == "back":
            q, r = -q, -r
        elif C.face == "left":
            q, r = r, -q
        out_phi = np.arccos(np.clip(-s, -1, 1)) - HALFPI
        out_lam = np.arctan2(r, q)
        if C.face == "right":
            out_lam = _shift_lon(out_lam, -HALFPI)
        elif C.face == "back":
            out_lam = _shift_lon(out_lam, -math.pi)
        elif C.face == "left":
            out_lam = _shift_lon(out_lam, HALFPI)

    if C.es != 0.0:
        neg = out_phi < 0.0
        tanphi = np.tan(out_phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            xa = C.b / np.sqrt(tanphi * tanphi + C.one_minus_f_squared)
            out_phi = np.arctan(
                np.sqrt(np.maximum(C.a * C.a - xa * xa, 0.0))
                / (C.one_minus_f * xa))
        out_phi = np.where(neg, -out_phi, out_phi)
    return out_lam, out_phi

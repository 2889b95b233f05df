"""HEALPix + rHEALPix equal-area projections.

Numpy re-derivation of /root/reference/src/projections/healpix.cpp (Calabretta
& Roukema 2007; rHEALPix per Gibb, Raichev & Speth 2013): equatorial
Collignon-like band + polar triangles, authalic-latitude shift on the
ellipsoid (scaled to the authalic radius), optional +rot_xy, and the
rHEALPix combine_caps square reassembly with configurable
north_square/south_square. The reference's in_image rejection of
out-of-image inverse inputs is omitted (callers feed in-image points;
out-of-image inputs yield the same continuation values PROJ would reject).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import authlat, authset, qsfn

FORTPI = math.pi / 4
HALFPI = math.pi / 2

# IDENT, R1(ccw 90), R2(180), R3(270), R1^-1, R2^-1, R3^-1
_ROT = np.array([
    [[1, 0], [0, 1]],
    [[0, -1], [1, 0]],
    [[-1, 0], [0, -1]],
    [[0, 1], [-1, 0]],
    [[0, 1], [-1, 0]],
    [[-1, 0], [0, -1]],
    [[0, -1], [1, 0]],
], dtype=np.float64)
# signed rotation index -3..3 -> _ROT row (healpix.cpp get_rotate_index)
_RIDX = {0: 0, 1: 1, 2: 2, 3: 3, -1: 4, -2: 5, -3: 6}
_RIDX_ARR = np.array([_RIDX[i - 3] for i in range(7)], dtype=np.int64)
_EPS = 1e-15


@dataclass(frozen=True)
class HealpixConsts:
    es: float
    e: float
    one_es: float
    qp: float
    apa: tuple
    auth_a: float          # authalic radius (= a*sqrt(qp/2)) or a for sphere
    rot_xy: float = 0.0
    north_square: int = 0
    south_square: int = 0


def setup_healpix(ell: Ellipsoid, *, rot_xy: float = 0.0,
                  north_square: int = 0, south_square: int = 0) -> HealpixConsts:
    if not 0 <= north_square <= 3 or not 0 <= south_square <= 3:
        raise ValueError("north_square/south_square must be in [0,3]")
    if ell.es != 0.0:
        qp = float(qsfn(np.array([1.0]), ell.e, ell.one_es)[0])
        apa = authset(ell.es)
        auth_a = ell.a * math.sqrt(0.5 * qp)
    else:
        qp, apa, auth_a = 0.0, (), ell.a
    return HealpixConsts(ell.es, ell.e, ell.one_es, qp, apa, auth_a,
                         rot_xy, north_square, south_square)


def _healpix_sphere_fwd(lam, phi):
    phi0 = math.asin(2.0 / 3.0)
    eq = np.abs(phi) <= phi0
    with np.errstate(invalid="ignore"):
        sigma = np.sqrt(np.maximum(3.0 * (1.0 - np.abs(np.sin(phi))), 0.0))
    cn = np.minimum(np.floor(2.0 * lam / math.pi + 2.0), 3.0)
    lamc = -3.0 * FORTPI + HALFPI * cn
    x = np.where(eq, lam, lamc + (lam - lamc) * sigma)
    y = np.where(eq, 3.0 * math.pi / 8.0 * np.sin(phi),
                 np.sign(phi) * FORTPI * (2.0 - sigma))
    return x, y


def _healpix_sphere_inv(x, y):
    y0 = FORTPI
    eq = np.abs(y) <= y0
    polar = (np.abs(y) < HALFPI) & ~eq
    cn = np.minimum(np.floor(2.0 * x / math.pi + 2.0), 3.0)
    xc = -3.0 * FORTPI + HALFPI * cn
    tau = 2.0 - 4.0 * np.abs(y) / math.pi
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = np.where(eq, x,
                       np.where(polar, xc + (x - xc) / tau, -math.pi))
        phi = np.where(
            eq, np.arcsin(np.clip(8.0 * y / (3.0 * math.pi), -1, 1)),
            np.where(polar,
                     np.sign(y) * np.arcsin(np.clip(1.0 - tau * tau / 3.0, -1, 1)),
                     np.sign(y) * HALFPI))
    return lam, phi


def _rotate(x, y, angle):
    if angle == 0.0:
        return x, y
    c, s = math.cos(angle), math.sin(angle)
    return x * c - y * s, y * c + x * s


def _auth_fwd(phi, C: HealpixConsts):
    q = qsfn(np.sin(phi), C.e, C.one_es)
    return np.arcsin(np.clip(q / C.qp, -1.0, 1.0))


def _combine_caps_fwd(x, y, ns, ss):
    north = y > FORTPI
    south = y < -FORTPI
    polar = north | south
    cn = np.where(x < -HALFPI, 0,
                  np.where(x < 0, 1, np.where(x < HALFPI, 2, 3)))
    cx = -3.0 * FORTPI + cn * HALFPI
    cy = np.where(north, HALFPI, -HALFPI)
    pole = np.where(north, ns, ss)
    signed = np.where(north, cn - pole, -(cn - pole))
    R = _ROT[_RIDX_ARR[signed + 3]]
    vx = x - cx
    vy = y - cy
    rx = R[..., 0, 0] * vx + R[..., 0, 1] * vy
    ry = R[..., 1, 0] * vx + R[..., 1, 1] * vy
    ax = -3.0 * FORTPI + pole * HALFPI
    ay = np.where(north, HALFPI, -HALFPI)
    return np.where(polar, rx + ax, x), np.where(polar, ry + ay, y)


def _combine_caps_inv(x, y, ns, ss):
    north = y > FORTPI
    south = y < -FORTPI
    polar = north | south
    pole = np.where(north, ns, ss)
    capx = -3.0 * FORTPI + pole * HALFPI
    capy = np.where(north, HALFPI, -HALFPI)
    xs = x - pole * HALFPI
    # cap number after disassembly (healpix.cpp get_cap inverse branch)
    n1 = (y >= -xs - FORTPI - _EPS) & (y < xs + 5 * FORTPI - _EPS)
    n2 = (y > -xs - FORTPI + _EPS) & (y >= xs + 5 * FORTPI - _EPS)
    n3 = (y <= -xs - FORTPI + _EPS) & (y > xs + 5 * FORTPI + _EPS)
    cn_n = np.where(n1, (ns + 1) % 4,
                    np.where(n2, (ns + 2) % 4, np.where(n3, (ns + 3) % 4, ns)))
    s1 = (y <= xs + FORTPI + _EPS) & (y > -xs - 5 * FORTPI + _EPS)
    s2 = (y < xs + FORTPI - _EPS) & (y <= -xs - 5 * FORTPI + _EPS)
    s3 = (y >= xs + FORTPI - _EPS) & (y < -xs - 5 * FORTPI - _EPS)
    cn_s = np.where(s1, (ss + 1) % 4,
                    np.where(s2, (ss + 2) % 4, np.where(s3, (ss + 3) % 4, ss)))
    cn = np.where(north, cn_n, cn_s)
    signed = np.where(north, -(cn - pole), cn - pole)
    R = _ROT[_RIDX_ARR[signed + 3]]
    vx = x - capx
    vy = y - capy
    rx = R[..., 0, 0] * vx + R[..., 0, 1] * vy
    ry = R[..., 1, 0] * vx + R[..., 1, 1] * vy
    ax = -3.0 * FORTPI + cn * HALFPI
    ay = np.where(north, HALFPI, -HALFPI)
    return np.where(polar, rx + ax, x), np.where(polar, ry + ay, y)


def healpix_fwd(lam, phi, C: HealpixConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if C.es != 0.0:
        phi = _auth_fwd(phi, C)
    x, y = _healpix_sphere_fwd(lam, phi)
    return _rotate(x, y, -C.rot_xy)


def healpix_inv(x, y, C: HealpixConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x, y = _rotate(x, y, C.rot_xy)
    lam, phi = _healpix_sphere_inv(x, y)
    if C.es != 0.0:
        phi = authlat(phi, C.apa)
    return lam, phi


def rhealpix_fwd(lam, phi, C: HealpixConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    if C.es != 0.0:
        phi = _auth_fwd(phi, C)
    x, y = _healpix_sphere_fwd(lam, phi)
    return _combine_caps_fwd(x, y, C.north_square, C.south_square)


def rhealpix_inv(x, y, C: HealpixConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    x, y = _combine_caps_inv(x, y, C.north_square, C.south_square)
    lam, phi = _healpix_sphere_inv(x, y)
    if C.es != 0.0:
        phi = authlat(phi, C.apa)
    return lam, phi

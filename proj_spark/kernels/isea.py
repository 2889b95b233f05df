"""Icosahedral Snyder Equal Area (+proj=isea), plane mode.

Numpy re-derivation of /root/reference/src/projections/isea.cpp (Snyder
1992 via Evenden/Sahr's libproj4 lineage; inverse per the recent PROJ
addition following brsr.github.io/2021/08/31/snyder-equal-area.html):

  * forward — rotate to the chosen icosahedron orientation (isea_ctran,
    :560-580), per-face Snyder equal-area triangle projection
    (isea_snyder_forward, :364-505), planar face layout (isea_tri_plane,
    :656-667);
  * inverse — planar face lookup by rotate/shear (cartesianToGeo,
    :1102-1196), Newton solve of the Snyder azimuth equation and
    re-rotation (icosahedronToSphere, :1201-1268).

Supports +orient=isea (default) and +orient=pole, the cases the reference
accelerates with precomputed planar projections. Vectorized with per-face
masks; per-point state loops are fixed-trip with convergence masking.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

DEG120 = math.radians(120.0)
DEG180 = math.pi
E_RAD = 0.91843818701052843323
F_RAD = 0.18871053078356206978
SDC2VOS = 0.6523581397843681859886783      # g
TANG = 0.76393202250021030358019673567     # tan(g)
TAN30 = 0.57735026918962576450914878
COT_THETA = 1.0 / TAN30
COS_G = 0.80901699437494742410229341718281905886     # cos 36
SIN_G = 0.587785252292473129168705954639072768597652  # sin 36
COS_SDC2VOS = 0.7946544722917661229596057297879189448539
SIN_G_COS_SDC2VOS = SIN_G * COS_SDC2VOS
SQRT3 = 1.73205080756887729352744634150587236694280525381038
SIN60 = SQRT3 / 2.0
COS30 = SQRT3 / 2.0
TABLE_G = TANG * SIN60
TABLE_H = 0.25 * TANG
RPRIME_OVER_R = 0.9103832815095032
ISEA_STD_LAT = 1.01722196792335072101
ISEA_STD_LONG = 0.19634954084936207740
AZMAX = math.radians(120.0)
WEST_VERTEX_LON = math.radians(-144.0)
_PRECISION = math.radians(1e-11)
_PREC_DEF = math.radians(1e-5)

# icosahedron face centers (lat, lon) — facesCenterDodecahedronVertices
_FACE_CENTERS = [
    (E_RAD, math.radians(-144)), (E_RAD, math.radians(-72)),
    (E_RAD, 0.0), (E_RAD, math.radians(72)), (E_RAD, math.radians(144)),
    (F_RAD, math.radians(-144)), (F_RAD, math.radians(-72)),
    (F_RAD, 0.0), (F_RAD, math.radians(72)), (F_RAD, math.radians(144)),
    (-F_RAD, math.radians(-108)), (-F_RAD, math.radians(-36)),
    (-F_RAD, math.radians(36)), (-F_RAD, math.radians(108)),
    (-F_RAD, math.radians(180)), (-E_RAD, math.radians(-108)),
    (-E_RAD, math.radians(-36)), (-E_RAD, math.radians(36)),
    (-E_RAD, math.radians(108)), (-E_RAD, math.radians(180)),
]


def _az_adjustment(tri: int) -> float:
    if (5 <= tri <= 9) or tri in (15, 16):
        return math.pi
    if tri >= 17:
        return -math.pi
    return 0.0


def _triangle_xy(tri: int):
    cx = TABLE_G * ((tri % 5) - 2) * 2.0
    if tri > 9:
        cx += TABLE_G
    cy = (5.0, 1.0, -1.0, -5.0)[tri // 5] * TABLE_H
    return cx * RPRIME_OVER_R, cy * RPRIME_OVER_R


@dataclass(frozen=True)
class IseaConsts:
    o_lat: float
    o_lon: float
    o_az: float
    a: float
    # inverse-layout constants (metres; initialize(), isea.cpp:1326-1367)
    R2: float
    Rprime: float
    tri_width: float
    center_to_base: float
    y_offsets: tuple
    xo: float
    yo: float
    sx: float
    sy: float
    inv_orient: tuple | None   # (lat, lon) of ISEAPlanarProjection orientation


def setup_isea(ell, orient: str = "isea", lat_0=None, lon_0=None,
               azi: float = 0.0, mode: str = "plane") -> IseaConsts:
    if mode != "plane":
        raise NotImplementedError("isea: only +mode=plane is supported")
    if orient == "isea":
        o_lat, o_lon = ISEA_STD_LAT, ISEA_STD_LONG
        inv_orient = ((E_RAD + F_RAD) / 2, math.radians(-11.25))
    elif orient == "pole":
        o_lat, o_lon = math.pi / 2, 0.0
        inv_orient = (0.0, 0.0)
    else:
        raise ValueError("isea: orient must be isea or pole")
    if lat_0 is not None:
        o_lat = math.radians(lat_0)
        inv_orient = None
    if lon_0 is not None:
        o_lon = math.radians(lon_0)
        inv_orient = None
    if azi != 0.0:
        inv_orient = None

    if ell.es > 0:
        a2 = ell.a * ell.a
        c2 = ell.b * ell.b
        log1pe = math.log((1 + ell.e) / (1 - ell.e))
        S = math.pi * (2 * a2 + c2 / ell.e * log1pe)
        R2 = S / (4 * math.pi)
        Rprime = RPRIME_OVER_R * math.sqrt(R2)
    else:
        R2 = ell.a * ell.a
        Rprime = RPRIME_OVER_R * ell.a
    rtang = Rprime * TANG
    c2b = rtang / 2.0
    tw = rtang * SQRT3
    return IseaConsts(
        o_lat, o_lon, math.radians(azi), ell.a, R2, Rprime, tw, c2b,
        (-2 * c2b, -4 * c2b, -5 * c2b, -7 * c2b),
        2.5 * tw, -1.5 * c2b, 1.0 / tw, 1.0 / (3 * c2b), inv_orient)


def _wrap_pi(x):
    x = np.mod(x, 2 * math.pi)
    x = np.where(x > math.pi, x - 2 * math.pi, x)
    return np.where(x < -math.pi, x + 2 * math.pi, x)


def _ctran(o_lat, o_lon, o_az, lam, phi):
    """isea_ctran: rotate to orientation (isea.cpp:527-580)."""
    alpha = o_lat
    beta = o_lon + math.pi
    dlam = lam - beta
    cos_p, sin_p = np.cos(phi), np.sin(phi)
    cos_a, sin_a = math.cos(alpha), math.sin(alpha)
    cos_dl, sin_dl = np.cos(dlam), np.sin(dlam)
    sin_phip = sin_a * sin_p - cos_a * cos_p * cos_dl
    lambdap = np.arctan2(cos_p * sin_dl,
                         sin_a * cos_p * cos_dl + cos_a * sin_p) + beta
    lambdap = _wrap_pi(lambdap)
    lat = np.arcsin(np.clip(sin_phip, -1, 1))
    lon = _wrap_pi(lambdap - (-o_az + o_lon))
    return lon, lat


def isea_fwd(lam, phi, C: IseaConsts):
    """Full plane-mode forward; output in units of the semi-major axis."""
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    lon, lat = _ctran(C.o_lat, C.o_lon, C.o_az, lam, phi)
    sin_lat, cos_lat = np.sin(lat), np.cos(lat)

    out_x = np.full_like(lam, np.nan)
    out_y = np.full_like(lam, np.nan)
    out_tri = np.full(lam.shape, -1, dtype=np.int64)
    remaining = np.ones(lam.shape, dtype=bool)
    eps = np.finfo(float).eps

    with np.errstate(divide="ignore", invalid="ignore"):
        for i, (clat, clon) in enumerate(_FACE_CENTERS):
            if not remaining.any():
                break
            s0, c0 = math.sin(clat), math.cos(clat)
            dlon = lon - clon
            clcl = cos_lat * np.cos(dlon)
            cosz = s0 * sin_lat + c0 * clcl
            z = np.arccos(np.clip(cosz, -1, 1))
            cand = remaining & (z <= SDC2VOS + 0.000005)
            if not cand.any():
                continue
            Az = np.arctan2(cos_lat * np.sin(dlon), c0 * sin_lat - s0 * clcl)
            Az = Az - _az_adjustment(i)
            Az = np.where(Az < 0.0, Az + 2 * math.pi, Az)
            mult = np.zeros(lam.shape)
            for _ in range(7):
                low = Az < 0.0
                Az = np.where(low, Az + DEG120, Az)
                mult -= low
                high = Az > DEG120 + eps
                Az = np.where(high, Az - DEG120, Az)
                mult += high
            cosAz, sinAz = np.cos(Az), np.sin(Az)
            q = np.arctan2(TANG, cosAz + sinAz * COT_THETA)
            cand &= z <= q + 0.000005
            if not cand.any():
                continue
            H = np.arccos(np.clip(
                sinAz * SIN_G_COS_SDC2VOS - cosAz * COS_G, -1, 1))
            Ag = Az + math.radians(36) + H - DEG180
            Azprime = np.arctan2(
                2.0 * Ag,
                RPRIME_OVER_R * RPRIME_OVER_R * TANG * TANG
                - 2.0 * Ag * COT_THETA)
            dprime = RPRIME_OVER_R * TANG / (np.cos(Azprime)
                                             + np.sin(Azprime) * COT_THETA)
            f = dprime / (2.0 * RPRIME_OVER_R * np.sin(q / 2.0))
            rho = 2.0 * RPRIME_OVER_R * f * np.sin(z / 2.0)
            Azprime = Azprime + DEG120 * mult
            x = rho * np.sin(Azprime)
            y = rho * np.cos(Azprime)
            out_x = np.where(cand, x, out_x)
            out_y = np.where(cand, y, out_y)
            out_tri = np.where(cand, i, out_tri)
            remaining &= ~cand

    # plane layout (isea_tri_plane)
    ok = out_tri >= 0
    tri = np.where(ok, out_tri, 0)
    down = (tri // 5) % 2 == 1
    out_x = np.where(down, -out_x, out_x)
    out_y = np.where(down, -out_y, out_y)
    tcx = np.array([_triangle_xy(i)[0] for i in range(20)])[tri]
    tcy = np.array([_triangle_xy(i)[1] for i in range(20)])[tri]
    return (np.where(ok, out_x + tcx, np.nan),
            np.where(ok, out_y + tcy, np.nan))


def isea_inv(X, Y, C: IseaConsts):
    """Plane-mode inverse (units-of-a in); only for the precomputed
    isea/pole orientations like the reference."""
    if C.inv_orient is None:
        raise NotImplementedError(
            "isea: inverse only implemented for +orient=isea/pole")
    x_m = np.asarray(X, dtype=np.float64) * C.a + C.xo
    y_m = np.asarray(Y, dtype=np.float64) * C.a + C.yo
    epsilon = 1e-11

    sr = -SIN60
    cr = 0.5
    wrap = (x_m < 0) | ((x_m < C.tri_width / 2) & (y_m < 0)
                        & (y_m * cr < x_m * sr))
    x_m = np.where(wrap, x_m + 5 * C.tri_width, x_m)
    shearX = 1.0 / SQRT3
    yp = -(x_m * sr + y_m * cr)
    x = (x_m * cr - y_m * sr + yp * shearX) * C.sx
    y = yp * C.sy

    x = np.where((x < 0) | ((y > x) & (x < 5 - epsilon)), x + epsilon,
                 np.where((x > 5) | ((y < x) & (x > 0 + epsilon)),
                          x - epsilon, x))
    y = np.where((y < 0) | ((x > y) & (y < 6 - epsilon)), y + epsilon,
                 np.where((y > 6) | ((x < y) & (y > 0 + epsilon)),
                          y - epsilon, y))

    inside = (x >= 0) & (x <= 5) & (y >= 0) & (y <= 6)
    ix = np.clip(x.astype(np.int64), 0, 4)
    iy = np.clip(y.astype(np.int64), 0, 5)
    on_rhombus = inside & ((iy == ix) | (iy == ix + 1))
    rhombus = ix + iy
    top = (x - ix) > (y - iy)
    face_top = np.array([0, 10, 1, 11, 2, 12, 3, 13, 4, 14])
    face_bot = np.array([5, 15, 6, 16, 7, 17, 8, 18, 9, 19])
    rh = np.clip(rhombus, 0, 9)
    face = np.where(top, face_top[rh], face_bot[rh])
    face = np.where(on_rhombus, face, -1)

    ok = face >= 0
    f = np.where(ok, face, 0)
    fy = f // 5
    fx = f - 5 * fy
    rx = x_m - (2 * fx + fy // 2 + 1) * C.tri_width / 2.0
    ry = y_m - (np.array(C.y_offsets)[np.clip(fy, 0, 3)]
                + 3 * C.center_to_base)

    lat, lon, good = _icosahedron_to_sphere(f, rx, ry, C)
    ok &= good
    lon = np.where(lon < -math.pi - epsilon, lon + 2 * math.pi, lon)
    lon = np.where(lon > math.pi + epsilon, lon - 2 * math.pi, lon)
    return np.where(ok, lon, np.nan), np.where(ok, lat, np.nan)


def _icosahedron_to_sphere(face, x, y, C: IseaConsts):
    """icosahedronToSphere (isea.cpp:1201-1268), vectorized."""
    with np.errstate(divide="ignore", invalid="ignore"):
        Az = np.arctan2(x, y)
        rho = np.sqrt(x * x + y * y)
        adj = np.where((face <= 4) | ((face >= 10) & (face <= 14)),
                       0.0, math.radians(180.0))
        Az = Az + adj
        for _ in range(5):
            low = Az < 0
            adj = np.where(low, adj + AZMAX, adj)
            Az = np.where(low, Az + AZMAX, Az)
            high = Az > AZMAX
            adj = np.where(high, adj - AZMAX, adj)
            Az = np.where(high, Az - AZMAX, Az)

        sinAz, cosAz = np.sin(Az), np.cos(Az)
        cotAz = cosAz / sinAz
        area = (C.Rprime * TANG) ** 2 / (2 * (cotAz + COT_THETA))
        target = area / C.R2 - WEST_VERTEX_LON
        Az_e = Az.copy()
        done = np.zeros(Az.shape, dtype=bool)
        for _ in range(60):
            sinAe, cosAe = np.sin(Az_e), np.cos(Az_e)
            H = np.arccos(np.clip(
                sinAe * SIN_G_COS_SDC2VOS - cosAe * COS_G, -1, 1))
            FAz = target - H - Az_e
            F2Az = (cosAe * SIN_G_COS_SDC2VOS + sinAe * COS_G) / np.sin(H) - 1
            dAz = -FAz / F2Az
            Az_e = np.where(done, Az_e, Az_e + dAz)
            done |= np.abs(dAz) <= _PRECISION
            if done.all():
                break
        sinAe, cosAe = np.sin(Az_e), np.cos(Az_e)
        q = np.arctan2(TANG, cosAe + sinAe * COT_THETA)
        d = C.Rprime * TANG / (cosAz + sinAz * COT_THETA)
        ffac = d / (2 * C.Rprime * np.sin(q / 2.0))
        z = 2 * np.arcsin(np.clip(rho / (2 * C.Rprime * ffac), -1, 1))
        Az_e = Az_e - adj

        s0 = np.sin(np.array([c[0] for c in _FACE_CENTERS]))[face]
        c0 = np.cos(np.array([c[0] for c in _FACE_CENTERS]))[face]
        lon0 = np.array([c[1] for c in _FACE_CENTERS])[face]
        sinz, cosz = np.sin(z), np.cos(z)
        c0sz = c0 * sinz
        lat_sin = s0 * cosz + c0sz * np.cos(Az_e)
        lat = np.arcsin(np.clip(lat_sin, -1, 1))
        lon = lon0 + np.arctan2(np.sin(Az_e) * c0sz, cosz - s0 * np.sin(lat))

        # revertOrientation
        o_lat, o_lon = C.inv_orient
        polar = (lat < -math.pi / 2 + _PREC_DEF) | (lat > math.pi / 2 - _PREC_DEF)
        lon_use = np.where(polar, 0.0, lon)
        if o_lat != 0.0 or o_lon != 0.0:
            sl, cl = np.sin(lat), np.cos(lat)
            slon, clon = np.sin(lon_use), np.cos(lon_use)
            clcl = clon * cl
            rlat = np.arcsin(np.clip(
                sl * math.cos(o_lat) - clcl * math.sin(o_lat), -1, 1))
            rlon = np.arctan2(
                slon * cl,
                clcl * math.cos(o_lat) + sl * math.sin(o_lat)) - o_lon
        else:
            rlat = lat
            rlon = lon_use
    return rlat, rlon, np.ones(rlat.shape, dtype=bool)

"""Interrupted / composite pseudocylindricals: goode, igh, igh_o, imoll,
imoll_o — zone-dispatched compositions of the sinusoidal and Mollweide
kernels (kernels.pseudocyl), vectorized with per-zone masks.

Re-derivations of the reference zone tables:
  * goode   — /root/reference/src/projections/goode.cpp:15-38 (sinu below
              40d44'11.8", moll above with Y_COR shift)
  * igh     — src/projections/igh.cpp:54-190 (12 zones, dy0 stitching)
  * igh_o   — src/projections/igh_o.cpp (oceanic-view variant, 12 zones)
  * imoll   — src/projections/imoll.cpp (6 moll zones, x0 seam matching)
  * imoll_o — src/projections/imoll_o.cpp (oceanic variant)

All spherical (es forced 0 like the reference); x/y in units of the radius.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.pseudocyl import (
    moll_fwd, moll_inv, setup_gn_sinu, setup_moll, sinu_fwd, sinu_inv,
)

_D = math.radians
_PHI_BOUND = (40 + 44 / 60.0 + 11.8 / 3600.0) * math.pi / 180.0
_EPS = 1e-10
_SPH = Ellipsoid.sphere(1.0)
_SINU = setup_gn_sinu(_SPH, proj="sinu")
_MOLL = setup_moll("moll")


def _sinu(lam, phi):
    return sinu_fwd(lam, phi, _SINU)


def _moll(lam, phi):
    return moll_fwd(lam, phi, _MOLL)


@dataclass(frozen=True)
class Zone:
    is_moll: bool
    lam0: float
    x0: float
    y0: float


def _zone_fwd(zones, zsel, lam, phi):
    """Apply per-zone fwd: lam-=lam0, kernel, +x0/+y0. ``zsel`` is the
    1-based zone index array."""
    x = np.full(lam.shape, np.nan)
    y = np.full(lam.shape, np.nan)
    for i, z in enumerate(zones, 1):
        m = zsel == i
        if not m.any():
            continue
        f = _moll if z.is_moll else _sinu
        zx, zy = f(lam[m] - z.lam0, phi[m])
        x[m] = zx + z.x0
        y[m] = zy + z.y0
    return x, y


def _zone_inv(zones, zsel, x, y, ok_fn):
    lam = np.full(x.shape, np.nan)
    phi = np.full(x.shape, np.nan)
    for i, z in enumerate(zones, 1):
        m = zsel == i
        if not m.any():
            continue
        f = moll_inv if z.is_moll else sinu_inv
        C = _MOLL if z.is_moll else _SINU
        zl, zp = f(x[m] - z.x0, y[m] - z.y0, C)
        zl = zl + z.lam0
        ok = ok_fn(i, zl, zp)
        lam[m] = np.where(ok, zl, np.nan)
        phi[m] = np.where(ok, zp, np.nan)
    return lam, phi


# ---------------------------------------------------------------------------
# goode
# ---------------------------------------------------------------------------

_Y_COR = 0.05280


def goode_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    xs, ys = _sinu(lam, phi)
    xm, ym = _moll(lam, phi)
    ym = ym - np.where(phi >= 0, _Y_COR, -_Y_COR)
    use_sinu = np.abs(phi) <= _PHI_BOUND
    return np.where(use_sinu, xs, xm), np.where(use_sinu, ys, ym)


def goode_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ls, ps = sinu_inv(x, y, _SINU)
    ym = y + np.where(y >= 0, _Y_COR, -_Y_COR)
    lm, pm = moll_inv(x, ym, _MOLL)
    use_sinu = np.abs(y) <= _PHI_BOUND
    return np.where(use_sinu, ls, lm), np.where(use_sinu, ps, pm)


# ---------------------------------------------------------------------------
# igh — 12 zones (reference igh.cpp:243-295)
# ---------------------------------------------------------------------------

def _igh_dy0() -> float:
    """Stitching offset: sinu and moll y at the transition latitude differ;
    moll zones shift by dy0 so the composite is continuous (igh.cpp:272-276:
    dy0 = y_sinu(phi_bound) - y_moll(phi_bound) at the zone center)."""
    _, ym = _moll(np.array([0.0]), np.array([_PHI_BOUND]))
    _, ys = _sinu(np.array([0.0]), np.array([_PHI_BOUND]))
    return float(ys[0] - ym[0])


_IGH_DY0 = _igh_dy0()

_IGH_ZONES = [
    Zone(True, -_D(100), -_D(100), _IGH_DY0),   # 1
    Zone(True, _D(30), _D(30), _IGH_DY0),       # 2
    Zone(False, -_D(100), -_D(100), 0.0),       # 3
    Zone(False, _D(30), _D(30), 0.0),           # 4
    Zone(False, -_D(160), -_D(160), 0.0),       # 5
    Zone(False, -_D(60), -_D(60), 0.0),         # 6
    Zone(False, _D(20), _D(20), 0.0),           # 7
    Zone(False, _D(140), _D(140), 0.0),         # 8
    Zone(True, -_D(160), -_D(160), -_IGH_DY0),  # 9
    Zone(True, -_D(60), -_D(60), -_IGH_DY0),    # 10
    Zone(True, _D(20), _D(20), -_IGH_DY0),      # 11
    Zone(True, _D(140), _D(140), -_IGH_DY0),    # 12
]


def _igh_zsel_fwd(lam, phi):
    z = np.zeros(lam.shape, dtype=np.int64)
    top = phi >= _PHI_BOUND
    mid = (phi >= 0) & ~top
    low = (phi >= -_PHI_BOUND) & (phi < 0)
    bot = phi < -_PHI_BOUND
    z[top] = np.where(lam[top] <= -_D(40), 1, 2)
    z[mid] = np.where(lam[mid] <= -_D(40), 3, 4)
    for m, base in ((low, 5), (bot, 9)):
        lz = np.where(
            lam[m] <= -_D(100), base,
            np.where(lam[m] <= -_D(20), base + 1,
                     np.where(lam[m] <= _D(80), base + 2, base + 3)))
        z[m] = lz
    return z


def igh_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    return _zone_fwd(_IGH_ZONES, _igh_zsel_fwd(lam, phi), lam, phi)


def _igh_ok(z, lam, phi):
    d = _D
    e = _EPS
    if z == 1:
        return ((lam >= -d(180) - e) & (lam <= -d(40) + e)) | (
            (lam >= -d(40) - e) & (lam <= -d(10) + e)
            & (phi >= d(60) - e) & (phi <= d(90) + e))
    if z == 2:
        return ((lam >= -d(40) - e) & (lam <= d(180) + e)) | (
            (lam >= -d(180) - e) & (lam <= -d(160) + e)
            & (phi >= d(50) - e) & (phi <= d(90) + e)) | (
            (lam >= -d(50) - e) & (lam <= -d(40) + e)
            & (phi >= d(60) - e) & (phi <= d(90) + e))
    ranges = {3: (-180, -40), 4: (-40, 180), 5: (-180, -100), 6: (-100, -20),
              7: (-20, 80), 8: (80, 180), 9: (-180, -100), 10: (-100, -20),
              11: (-20, 80), 12: (80, 180)}
    lo, hi = ranges[z]
    return (lam >= d(lo) - e) & (lam <= d(hi) + e)


def igh_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y90 = _IGH_DY0 + math.sqrt(2.0)
    z = np.zeros(x.shape, dtype=np.int64)
    inside = ~((y > y90 + _EPS) | (y < -y90 + _EPS))
    top = inside & (y >= _PHI_BOUND)
    mid = inside & (y >= 0) & ~top
    low = inside & (y >= -_PHI_BOUND) & (y < 0)
    bot = inside & (y < -_PHI_BOUND)
    z[top] = np.where(x[top] <= -_D(40), 1, 2)
    z[mid] = np.where(x[mid] <= -_D(40), 3, 4)
    for m, base in ((low, 5), (bot, 9)):
        z[m] = np.where(
            x[m] <= -_D(100), base,
            np.where(x[m] <= -_D(20), base + 1,
                     np.where(x[m] <= _D(80), base + 2, base + 3)))
    return _zone_inv(_IGH_ZONES, z, x, y, _igh_ok)


# ---------------------------------------------------------------------------
# igh_o — oceanic view (reference igh_o.cpp)
# ---------------------------------------------------------------------------

_IGHO_ZONES = [
    Zone(True, -_D(140), -_D(140), _IGH_DY0),   # 1
    Zone(True, -_D(10), -_D(10), _IGH_DY0),     # 2
    Zone(True, _D(130), _D(130), _IGH_DY0),     # 3
    Zone(False, -_D(140), -_D(140), 0.0),       # 4
    Zone(False, -_D(10), -_D(10), 0.0),         # 5
    Zone(False, _D(130), _D(130), 0.0),         # 6
    Zone(False, -_D(110), -_D(110), 0.0),       # 7
    Zone(False, _D(20), _D(20), 0.0),           # 8
    Zone(False, _D(150), _D(150), 0.0),         # 9
    Zone(True, -_D(110), -_D(110), -_IGH_DY0),  # 10
    Zone(True, _D(20), _D(20), -_IGH_DY0),      # 11
    Zone(True, _D(150), _D(150), -_IGH_DY0),    # 12
]


def _igho_zsel(lam, phi, top_bound):
    z = np.zeros(lam.shape, dtype=np.int64)
    top = phi >= top_bound
    mid = (phi >= 0) & ~top
    low = (phi >= -top_bound) & (phi < 0)
    bot = phi < -top_bound
    z[top] = np.where(lam[top] <= -_D(90), 1,
                      np.where(lam[top] >= _D(60), 3, 2))
    z[mid] = np.where(lam[mid] <= -_D(90), 4,
                      np.where(lam[mid] >= _D(60), 6, 5))
    z[low] = np.where(lam[low] <= -_D(60), 7,
                      np.where(lam[low] >= _D(90), 9, 8))
    z[bot] = np.where(lam[bot] <= -_D(60), 10,
                      np.where(lam[bot] >= _D(90), 12, 11))
    return z


def igh_o_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    return _zone_fwd(_IGHO_ZONES, _igho_zsel(lam, phi, _PHI_BOUND), lam, phi)


def _igho_ok(z, lam, phi):
    d = _D
    e = _EPS
    if z == 1:
        return ((lam >= -d(180) - e) & (lam <= -d(90) + e)) | (
            (lam >= d(160) - e) & (lam <= d(180) + e)
            & (phi >= d(50) - e) & (phi <= d(90) + e))
    if z == 3:
        return ((lam >= d(60) - e) & (lam <= d(180) + e)) | (
            (lam >= -d(180) - e) & (lam <= -d(160) + e)
            & (phi >= d(50) - e) & (phi <= d(90) + e))
    if z == 11:
        return ((lam >= -d(60) - e) & (lam <= d(90) + e)) | (
            (lam >= d(90) - e) & (lam <= d(100) + e)
            & (phi >= -d(90) - e) & (phi <= -d(40) + e))
    ranges = {2: (-90, 60), 4: (-180, -90), 5: (-90, 60), 6: (60, 180),
              7: (-180, -60), 8: (-60, 90), 9: (90, 180), 10: (-180, -60),
              12: (90, 180)}
    lo, hi = ranges[z]
    return (lam >= d(lo) - e) & (lam <= d(hi) + e)


def igh_o_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y90 = _IGH_DY0 + math.sqrt(2.0)
    inside = ~((y > y90 + _EPS) | (y < -y90 + _EPS))
    z = _igho_zsel(x, y, _PHI_BOUND)
    z = np.where(inside, z, 0)
    return _zone_inv(_IGHO_ZONES, z, x, y, _igho_ok)


# ---------------------------------------------------------------------------
# imoll — 6 Mollweide zones with x0 seam matching (reference imoll.cpp)
# ---------------------------------------------------------------------------

def _moll_x_at(lam_rel, phi):
    x, _ = _moll(np.array([lam_rel]), np.array([phi]))
    return float(x[0])


def _make_imoll_zones(zone_defs, matches):
    """zone_defs: list of (is_moll, lon0_deg); matches: list of
    (zone, ref_zone, lam_deg, phi1, phi2) applying
    x0[zone] += x_at(ref) - x_at(zone) (reference compute_zone_offset)."""
    zones = [Zone(True, _D(lz), _D(lz), 0.0) for _, lz in zone_defs]
    for zi, ri, lam_d, phi1, phi2 in matches:
        z = zones[zi - 1]
        r = zones[ri - 1]
        lam = _D(lam_d)
        x1 = _moll_x_at(lam - z.lam0, phi1) + z.x0
        x2 = _moll_x_at(lam - r.lam0, phi2) + r.x0
        zones[zi - 1] = Zone(True, z.lam0, z.x0 + (x2 - x1), z.y0)
    return zones


_IMOLL_ZONES = _make_imoll_zones(
    [(True, -100), (True, 30), (True, -160), (True, -60), (True, 20), (True, 140)],
    [
        (3, 1, -160, 0.0 - _EPS, 0.0 + _EPS),
        (2, 1, -40, 0.0 + _EPS, 0.0 + _EPS),
        (4, 1, -100, 0.0 - _EPS, 0.0 + _EPS),
        (5, 2, -20, 0.0 - _EPS, 0.0 + _EPS),
        (6, 2, 80, 0.0 - _EPS, 0.0 + _EPS),
    ],
)


def _imoll_fwd_scalar_x(zones, zsel_fn, lam, phi):
    x, y = _zone_fwd(zones, zsel_fn(np.asarray([lam]), np.asarray([phi])),
                     np.asarray([lam]), np.asarray([phi]))
    return float(x[0])


def _imoll_zsel(lam, phi):
    z = np.zeros(lam.shape, dtype=np.int64)
    north = phi >= 0
    z[north] = np.where(lam[north] <= -_D(40), 1, 2)
    s = ~north
    z[s] = np.where(
        lam[s] <= -_D(100), 3,
        np.where(lam[s] <= -_D(20), 4, np.where(lam[s] <= _D(80), 5, 6)))
    return z


def _seam(zones, zsel_fn, lam_d, phi):
    a = _imoll_fwd_scalar_x(zones, zsel_fn, _D(lam_d) - _EPS, phi)
    b = _imoll_fwd_scalar_x(zones, zsel_fn, _D(lam_d) + _EPS, phi)
    return (a + b) / 2.0


_IMOLL_B12 = _seam(_IMOLL_ZONES, _imoll_zsel, -40, 0.0 + _EPS)
_IMOLL_B34 = _seam(_IMOLL_ZONES, _imoll_zsel, -100, 0.0 - _EPS)
_IMOLL_B45 = _seam(_IMOLL_ZONES, _imoll_zsel, -20, 0.0 - _EPS)
_IMOLL_B56 = _seam(_IMOLL_ZONES, _imoll_zsel, 80, 0.0 - _EPS)


def imoll_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    return _zone_fwd(_IMOLL_ZONES, _imoll_zsel(lam, phi), lam, phi)


def _imoll_ok(z, lam, phi):
    d = _D
    e = _EPS
    ranges = {1: (-180, -40), 2: (-40, 180), 3: (-180, -100), 4: (-100, -20),
              5: (-20, 80), 6: (80, 180)}
    lo, hi = ranges[z]
    base = (lam >= d(lo) - e) & (lam <= d(hi) + e)
    if z <= 2:
        return base & (phi >= -e)
    return base & (phi <= e)


def imoll_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y90 = math.sqrt(2.0)
    inside = ~((y > y90 + _EPS) | (y < -y90 + _EPS))
    z = np.zeros(x.shape, dtype=np.int64)
    north = inside & (y >= 0)
    south = inside & (y < 0)
    z[north] = np.where(x[north] <= _IMOLL_B12, 1, 2)
    z[south] = np.where(
        x[south] <= _IMOLL_B34, 3,
        np.where(x[south] <= _IMOLL_B45, 4,
                 np.where(x[south] <= _IMOLL_B56, 5, 6)))
    return _zone_inv(_IMOLL_ZONES, z, x, y, _imoll_ok)


# ---------------------------------------------------------------------------
# imoll_o — oceanic variant (reference imoll_o.cpp)
# ---------------------------------------------------------------------------

def _imoll_o_zsel(lam, phi):
    z = np.zeros(lam.shape, dtype=np.int64)
    north = phi >= 0
    z[north] = np.where(lam[north] <= -_D(90), 1,
                        np.where(lam[north] >= _D(60), 3, 2))
    s = ~north
    z[s] = np.where(lam[s] <= -_D(60), 4,
                    np.where(lam[s] >= _D(90), 6, 5))
    return z


_IMOLL_O_ZONES = _make_imoll_zones(
    [(True, -140), (True, -10), (True, 130), (True, -110), (True, 20), (True, 150)],
    [
        (2, 1, -90, 0.0 + _EPS, 0.0 + _EPS),
        (3, 2, 60, 0.0 + _EPS, 0.0 + _EPS),
        (4, 1, -180, 0.0 - _EPS, 0.0 + _EPS),
        (5, 2, -60, 0.0 - _EPS, 0.0 + _EPS),
        (6, 3, 90, 0.0 - _EPS, 0.0 + _EPS),
    ],
)

_IMOLL_O_B12 = _seam(_IMOLL_O_ZONES, _imoll_o_zsel, -90, 0.0 + _EPS)
_IMOLL_O_B23 = _seam(_IMOLL_O_ZONES, _imoll_o_zsel, 60, 0.0 + _EPS)
_IMOLL_O_B45 = _seam(_IMOLL_O_ZONES, _imoll_o_zsel, -60, 0.0 - _EPS)
_IMOLL_O_B56 = _seam(_IMOLL_O_ZONES, _imoll_o_zsel, 90, 0.0 - _EPS)


def imoll_o_fwd(lam, phi, C=None):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    return _zone_fwd(_IMOLL_O_ZONES, _imoll_o_zsel(lam, phi), lam, phi)


def _imoll_o_ok(z, lam, phi):
    d = _D
    e = _EPS
    ranges = {1: (-180, -90), 2: (-90, 60), 3: (60, 180),
              4: (-180, -60), 5: (-60, 90), 6: (90, 180)}
    lo, hi = ranges[z]
    base = (lam >= d(lo) - e) & (lam <= d(hi) + e)
    if z <= 3:
        return base & (phi >= -e)
    return base & (phi <= e)


def imoll_o_inv(x, y, C=None):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    y90 = math.sqrt(2.0)
    inside = ~((y > y90 + _EPS) | (y < -y90 + _EPS))
    z = np.zeros(x.shape, dtype=np.int64)
    north = inside & (y >= 0)
    south = inside & (y < 0)
    z[north] = np.where(x[north] <= _IMOLL_O_B12, 1,
                        np.where(x[north] >= _IMOLL_O_B23, 3, 2))
    z[south] = np.where(x[south] <= _IMOLL_O_B45, 4,
                        np.where(x[south] >= _IMOLL_O_B56, 6, 5))
    return _zone_inv(_IMOLL_O_ZONES, z, x, y, _imoll_o_ok)

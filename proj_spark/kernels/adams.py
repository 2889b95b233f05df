"""Guyou / Peirce Quincuncial / Adams square projections — the conformal
square family, sharing one elliptic-integral core.

Re-derivation of /root/reference/src/projections/adams.cpp (Evenden's
libproj4 lineage; math from O.S. Adams, USC&GS Special Publication 153,
1929): per-mode (a, b) angles, m/n via the spherical relations, then the
incomplete elliptic integral F(phi | m=1/2) evaluated with the even
Chebyshev series (ell_int_5, adams.cpp:78-105). Peirce shapes square /
diamond / nhemisphere / shemisphere / horizontal / vertical including the
southern-hemisphere fold-out and scrollx/scrolly (adams.cpp:198-276).

Forward-only like the reference except adams_ws2 (2D-Newton inverse).
All spherical, vectorized.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.kernels.common import generic_inverse_2d

_TOL = 1e-9
_RSQRT2 = 0.7071067811865475244008443620
_SHD = 1.8540746773013719 * 2


def _aasin(v):
    return np.arcsin(np.clip(v, -1.0, 1.0))


def _aacos(v):
    return np.arccos(np.clip(v, -1.0, 1.0))


def ell_int_5(phi: np.ndarray) -> np.ndarray:
    """Incomplete elliptic integral of the first kind, k^2 = 0.5, via the
    even Chebyshev series (better than 1e-7)."""
    C0 = 2.19174570831038
    C = (-8.58691003636495e-07, 2.02692115653689e-07, 3.12960480765314e-05,
         5.30394739921063e-05, -0.0012804644680613, -0.00575574836830288,
         0.0914203033408211)
    y = phi * (2.0 / math.pi)
    y = 2.0 * y * y - 1.0
    y2 = 2.0 * y
    d1 = np.zeros_like(phi)
    d2 = np.zeros_like(phi)
    for c in C:
        d1, d2 = y2 * d1 - d2 + c, d1
    return phi * (y * d1 - d2 + 0.5 * C0)


@dataclass(frozen=True)
class AdamsConsts:
    mode: str                 # guyou|peirce_q|adams_hemi|adams_ws1|adams_ws2
    shape: str = "diamond"    # peirce_q only
    scrollx: float = 0.0
    scrolly: float = 0.0


def setup_adams(mode: str, params: dict | None = None) -> AdamsConsts:
    params = params or {}
    if mode != "peirce_q":
        return AdamsConsts(mode)
    shape = str(params.get("shape", "diamond"))
    if shape not in ("square", "diamond", "nhemisphere", "shemisphere",
                     "horizontal", "vertical"):
        raise ValueError(f"peirce_q: invalid shape {shape!r}")
    sx = float(params.get("scrollx", 0.0))
    sy = float(params.get("scrolly", 0.0))
    if abs(sx) > 1 or abs(sy) > 1:
        raise ValueError("peirce_q: |scrollx|/|scrolly| must be <= 1")
    return AdamsConsts(mode, shape, sx, sy)


def adams_fwd(lam, phi, C: AdamsConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    bad = np.zeros(lam.shape, dtype=bool)

    if C.mode == "guyou":
        bad |= (np.abs(lam) - _TOL) > math.pi / 2
        pole = np.abs(np.abs(phi) - math.pi / 2) < _TOL
        sl, sp, cp = np.sin(lam), np.sin(phi), np.cos(phi)
        a = _aacos((cp * sl - sp) * _RSQRT2)
        b = _aacos((cp * sl + sp) * _RSQRT2)
        sm = lam < 0
        sn = phi < 0
    elif C.mode == "peirce_q":
        if C.shape == "nhemisphere":
            bad |= phi < -_TOL
        if C.shape == "shemisphere":
            bad |= phi > -_TOL
        sl, cl, cp = np.sin(lam), np.cos(lam), np.cos(phi)
        a = _aacos(cp * (sl + cl) * _RSQRT2)
        b = _aacos(cp * (sl - cl) * _RSQRT2)
        sm = sl < 0
        sn = cl > 0
        pole = np.zeros(lam.shape, dtype=bool)
    elif C.mode == "adams_hemi":
        sp = np.sin(phi)
        bad |= (np.abs(lam) - _TOL) > math.pi / 2
        av = np.cos(phi) * np.sin(lam)
        sm = (sp + av) < 0
        sn = (sp - av) < 0
        a = _aacos(av)
        b = math.pi / 2 - phi
        pole = np.zeros(lam.shape, dtype=bool)
    elif C.mode == "adams_ws1":
        sp = np.tan(0.5 * phi)
        bv = np.cos(_aasin(sp)) * np.sin(0.5 * lam)
        a = _aacos((bv - sp) * _RSQRT2)
        b = _aacos((bv + sp) * _RSQRT2)
        sm = lam < 0
        sn = phi < 0
        pole = np.zeros(lam.shape, dtype=bool)
    else:  # adams_ws2
        spp = np.tan(0.5 * phi)
        av = np.cos(_aasin(spp)) * np.sin(0.5 * lam)
        sm = (spp + av) < 0
        sn = (spp - av) < 0
        b = _aacos(spp)
        a = _aacos(av)
        pole = np.zeros(lam.shape, dtype=bool)

    m = _aasin(np.sqrt(1.0 + np.minimum(0.0, np.cos(a + b))))
    m = np.where(sm, -m, m)
    n = _aasin(np.sqrt(np.abs(1.0 - np.maximum(0.0, np.cos(a - b)))))
    n = np.where(sn, -n, n)
    x = ell_int_5(m)
    y = ell_int_5(n)

    if C.mode == "peirce_q":
        south = phi < 0
        if C.shape in ("square", "diamond"):
            y = np.where(south & (lam < -0.75 * math.pi), _SHD - y, y)
            x = np.where(south & (lam < -0.25 * math.pi)
                         & (lam >= -0.75 * math.pi), -_SHD - x, x)
            y = np.where(south & (lam < 0.25 * math.pi)
                         & (lam >= -0.25 * math.pi), -_SHD - y, y)
            x = np.where(south & (lam < 0.75 * math.pi)
                         & (lam >= 0.25 * math.pi), _SHD - x, x)
            y = np.where(south & (lam >= 0.75 * math.pi), _SHD - y, y)
        if C.shape == "square":
            x, y = _RSQRT2 * (x - y), _RSQRT2 * (x + y)
        if C.shape == "horizontal":
            x = np.where(south, _SHD - x, x)
            x = x - _SHD / 2
        if C.shape == "vertical":
            y = np.where(south, _SHD - y, y)
            y = y - _SHD / 2
        if C.scrollx != 0.0 and C.shape == "horizontal":
            xthresh = _SHD / 2
            x = x + C.scrollx * (xthresh * 4.0)
            x = np.where(x >= xthresh * 2.0, x - _SHD * 2.0, x)
            x = np.where(x < -xthresh * 2.0, x + _SHD * 2.0, x)
        if C.scrolly != 0.0 and C.shape == "vertical":
            ythresh = _SHD / 2
            y = y + C.scrolly * (ythresh * 4.0)
            y = np.where(y >= ythresh * 2.0, y - _SHD * 2.0, y)
            y = np.where(y < -ythresh * 2.0, y + _SHD * 2.0, y)

    if C.mode in ("adams_hemi", "adams_ws2"):
        x, y = _RSQRT2 * (x - y), _RSQRT2 * (x + y)

    if C.mode == "guyou":
        x = np.where(pole, 0.0, x)
        y = np.where(pole, np.where(phi < 0, -1.85407, 1.85407), y)

    return np.where(bad, np.nan, x), np.where(bad, np.nan, y)


def peirce_q_square_inv(x, y, C: AdamsConsts):
    """Vectorized seed heuristics of the reference's
    peirce_q_square_inverse (adams.cpp — per-quadrant initial guesses,
    trial-and-repeat derived) + the shared 2D-Newton refiner."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ax, ay = np.abs(x), np.abs(y)
    conds = [
        (x == 0) & (y < 0),
        (x > 0) & (ay < 1e-7),
        (x < 0) & (ay < 1e-7),
        (ax < 1e-7) & (y > 0),
        (x >= 0) & (y <= 0),
        (x >= 0) & (y >= 0),
        (x <= 0) & (y >= 0) & (ax < ay),
        (x <= 0) & (y >= 0),
    ]
    lam0 = np.select(conds, [
        -math.pi / 4, math.pi / 4, -3 * math.pi / 4, 3 * math.pi / 4,
        0.0, math.pi / 2, math.pi * 0.9, -math.pi * 0.9,
    ], default=-math.pi / 2)
    phi0 = np.select(conds, [
        np.where(ay < 2.622057580396, math.pi / 4, 0.0),
        0.0,
        math.pi / 2 / 2.622057574224 * x + math.pi / 2,
        0.0, 0.0, 0.0, 0.0, 0.0,
    ], default=0.0)
    lam, phi = generic_inverse_2d(
        x, y, lambda L, P: adams_fwd(L, P, C), lam0, phi0, deltol=1e-10)
    # exact center is the north pole (reference early-return)
    origin = (x == 0) & (y == 0)
    return (np.where(origin, 0.0, lam),
            np.where(origin, math.pi / 2, phi))


def peirce_q_diamond_inv(x, y, C: AdamsConsts):
    """Vectorized seed heuristics of the reference's
    peirce_q_diamond_inverse (adams.cpp) + the shared 2D-Newton refiner."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    conds = [
        (x > 0) & (y == 0),
        (x == 0) & (y < 0),
        (x >= 0) & (y <= 0),
        (x >= 0) & (y >= 0),
        (x <= 0) & (y >= 0),
    ]
    lam0 = np.select(conds, [
        math.pi / 2, 0.0, math.pi / 4, 3 * math.pi / 4, -3 * math.pi / 4,
    ], default=-math.pi / 4)
    phi0 = np.select(conds, [0.0, math.pi / 4, 0.0, 0.0, 0.0], default=0.0)
    far = (np.abs(x) > 1.8540746773013719 + 1e-3) | \
          (np.abs(y) > 1.8540746773013719 + 1e-3)
    phi0 = np.where(far, -math.pi / 4, phi0)
    lam, phi = generic_inverse_2d(
        x, y, lambda L, P: adams_fwd(L, P, C), lam0, phi0, deltol=1e-10)
    origin = (x == 0) & (y == 0)
    return (np.where(origin, 0.0, lam),
            np.where(origin, math.pi / 2, phi))


def adams_ws2_inv(x, y, C: AdamsConsts):
    """2D-Newton inverse (reference adams_inverse, adams.cpp:289-311 —
    WS2 only) with the same rough seed."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    phi0 = np.clip(y / 2.62181347, -1.0, 1.0) * (math.pi / 2)
    with np.errstate(invalid="ignore"):
        lam0 = np.where(
            np.abs(phi0) >= math.pi / 2, 0.0,
            np.clip(x / 2.62205760 / np.cos(phi0), -1.0, 1.0) * math.pi)
    return generic_inverse_2d(
        x, y, lambda L, P: adams_fwd(L, P, C), lam0, phi0, deltol=1e-10)

"""Mercator / Web Mercator.

Reference: /root/reference/src/projections/merc.cpp (ellipsoidal fwd :13-22,
spherical fwd :24-29, inverses :31-43, webmerc = spherical kernel on WGS84
with k0 forced to 1, :76-84). Fixture values: test/gie/builtins.gie:3885-3926
(50 nm) and test/gie/4D-API_cs2cs-style.gie:231-241 (EPSG guidance note 7-2).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid
from proj_spark.kernels.common import msfn, sinhpsi2tanphi


@dataclass(frozen=True)
class MercConsts:
    e: float
    k0: float
    spherical: bool


def setup_merc(ell: Ellipsoid, lat_ts: float | None = None, k0: float = 1.0) -> MercConsts:
    if lat_ts is not None:
        phits = abs(math.radians(lat_ts))
        if phits >= math.pi / 2:
            raise ValueError("|lat_ts| must be < 90")
        if ell.es != 0.0:
            k0 = float(msfn(math.sin(phits), math.cos(phits), ell.es))
        else:
            k0 = math.cos(phits)
    return MercConsts(ell.e, k0, spherical=ell.is_sphere)


def setup_webmerc(ell: Ellipsoid) -> MercConsts:
    """webmerc: spherical formulas with the ellipsoid's ``a``, k0=1."""
    return MercConsts(ell.e, 1.0, spherical=True)


def merc_fwd(lam: np.ndarray, phi: np.ndarray, C: MercConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    x = C.k0 * lam
    if C.spherical:
        y = C.k0 * np.arcsinh(np.tan(phi))
    else:
        sphi = np.sin(phi)
        cphi = np.cos(phi)
        y = C.k0 * (np.arcsinh(sphi / cphi) - C.e * np.arctanh(C.e * sphi))
    return x, y


def merc_inv(x: np.ndarray, y: np.ndarray, C: MercConsts):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lam = x / C.k0
    with np.errstate(over="ignore"):  # sinh overflow -> inf -> arctan=pi/2
        if C.spherical:
            phi = np.arctan(np.sinh(y / C.k0))
        else:
            phi = np.arctan(sinhpsi2tanphi(np.sinh(y / C.k0), C.e))
    return lam, phi

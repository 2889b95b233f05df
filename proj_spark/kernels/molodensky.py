"""Molodensky datum shift (abridged + full), vectorized.

Re-derivation of /root/reference/src/transformations/molodensky.cpp
(calc_standard_params :88-130, calc_abridged_params :132-166, RN/RM
radii :55-86). Forward adds the computed (dlam, dphi, dh) deltas; the
reverse applies the negated deltas evaluated at the input point — the
same approximation the reference uses (tolerance pinned at 2 m / 1 m
roundtrip by test/gie/more_builtins.gie:36-56).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from proj_spark.crs import Ellipsoid

HALFPI = math.pi / 2


@dataclass(frozen=True)
class MolodenskyConsts:
    a: float
    es: float
    f: float
    dx: float
    dy: float
    dz: float
    da: float
    df: float
    abridged: bool


def _rn(a: float, es: float, phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    return a / np.sqrt(1.0 - es * s * s)


def _rm(a: float, es: float, phi: np.ndarray) -> np.ndarray:
    s = np.sin(phi)
    out = (a * (1.0 - es)) / (1.0 - es * s * s) ** 1.5
    out = np.where(phi == 0.0, a * (1.0 - es), out)
    return np.where(np.abs(phi) == HALFPI, a / math.sqrt(1.0 - es), out)


def _deltas(lam, phi, z, C: MolodenskyConsts):
    slam, clam = np.sin(lam), np.cos(lam)
    sphi, cphi = np.sin(phi), np.cos(phi)
    if C.abridged:
        adffda = C.a * C.df + C.f * C.da
        dphi = (
            -C.dx * sphi * clam - C.dy * sphi * slam + C.dz * cphi
            + adffda * np.sin(2.0 * phi)
        ) / _rm(C.a, C.es, phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            dlam = (-C.dx * slam + C.dy * clam) / (_rn(C.a, C.es, phi) * cphi)
        dh = (C.dx * cphi * clam + C.dy * cphi * slam + C.dz * sphi
              - C.da + adffda * sphi * sphi)
        return dlam, dphi, dh
    rho = _rm(C.a, C.es, phi)
    nu = _rn(C.a, C.es, phi)
    dphi = (
        -C.dx * sphi * clam - C.dy * sphi * slam + C.dz * cphi
        + (nu * C.es * sphi * cphi * C.da) / C.a
        + sphi * cphi * (rho / (1.0 - C.f) + nu * (1.0 - C.f)) * C.df
    ) / (rho + z)
    with np.errstate(divide="ignore", invalid="ignore"):
        dlam = (-C.dx * slam + C.dy * clam) / ((nu + z) * cphi)
    dh = (C.dx * cphi * clam + C.dy * cphi * slam + C.dz * sphi
          - (C.a / nu) * C.da + nu * (1.0 - C.f) * sphi * sphi * C.df)
    return dlam, dphi, dh


def setup_molodensky(ell: Ellipsoid, params: dict) -> MolodenskyConsts:
    return MolodenskyConsts(
        ell.a, ell.es, ell.f,
        float(params.get("dx", 0.0)), float(params.get("dy", 0.0)),
        float(params.get("dz", 0.0)), float(params.get("da", 0.0)),
        float(params.get("df", 0.0)), "abridged" in params,
    )


def molodensky_fwd(lam, phi, z, C: MolodenskyConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    dlam, dphi, dh = _deltas(lam, phi, z, C)
    return lam + dlam, phi + dphi, z + dh


def molodensky_inv(lam, phi, z, C: MolodenskyConsts):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    z = np.asarray(z, dtype=np.float64)
    dlam, dphi, dh = _deltas(lam, phi, z, C)
    return lam - dlam, phi - dphi, z - dh

"""Shared numeric helpers, vectorized over numpy arrays.

These reproduce PROJ's small numeric support routines:
  * ``tsfn``  — Snyder (7-10) exp(-isometric latitude); reference src/tsfn.cpp
  * ``msfn``  — cosphi/sqrt(1-es sin^2 phi);            reference src/msfn.cpp
  * ``sinhpsi2tanphi`` / ``phi2`` — conformal->geographic latitude via
    Newton iteration (GeographicLib tauf);              reference src/phi2.cpp
  * ``adjlon`` — wrap longitude to (-pi, pi];           reference src/adjlon.cpp

All functions accept scalars or ndarrays and never branch per-element in
Python: data-dependent iteration uses fixed-trip-count loops with masks,
which keeps them safe to call from Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np

TWO_PI = 2.0 * np.pi


def adjlon(lon: np.ndarray) -> np.ndarray:
    """Wrap radians longitude into [-pi, pi]."""
    lon = np.asarray(lon, dtype=np.float64)
    out = np.remainder(lon + np.pi, TWO_PI) - np.pi
    # keep +pi as +pi (remainder maps it to -pi)
    return np.where((out == -np.pi) & (lon > 0), np.pi, out)


def msfn(sinphi: np.ndarray, cosphi: np.ndarray, es: float) -> np.ndarray:
    return cosphi / np.sqrt(1.0 - es * sinphi * sinphi)


def tsfn(phi: np.ndarray, sinphi: np.ndarray, e: float) -> np.ndarray:
    """exp(-psi): uses the sign-stable cos/(1+sin) form like the reference."""
    cosphi = np.cos(phi)
    stable = np.where(
        sinphi > 0,
        cosphi / (1.0 + sinphi),
        (1.0 - sinphi) / np.where(cosphi == 0.0, np.finfo(np.float64).tiny, cosphi),
    )
    return np.exp(e * np.arctanh(e * sinphi)) * stable


def sinhpsi2tanphi(taup: np.ndarray, e: float) -> np.ndarray:
    """tan(chi) -> tan(phi), Newton iteration (<=5 trips, converges in ~2)."""
    taup = np.asarray(taup, dtype=np.float64)
    e2m = 1.0 - e * e
    rooteps = np.sqrt(np.finfo(np.float64).eps)
    tol = rooteps / 10.0
    tmax = 2.0 / rooteps
    stol = tol * np.maximum(1.0, np.abs(taup))
    # initial guess: large-|tau'| closed form beyond chi ~ 89.18 deg
    tau = np.where(np.abs(taup) > 70.0, taup * np.exp(e * np.arctanh(e)), taup / e2m)
    big = ~(np.abs(tau) < tmax)  # inf/nan pass through untouched
    done = big.copy()
    for _ in range(5):
        if done.all():
            break
        tau1 = np.sqrt(1.0 + tau * tau)
        sig = np.sinh(e * np.arctanh(e * tau / tau1))
        taupa = np.sqrt(1.0 + sig * sig) * tau - sig * tau1
        dtau = (taup - taupa) * (1.0 + e2m * tau * tau) / (
            e2m * tau1 * np.sqrt(1.0 + taupa * taupa)
        )
        tau = np.where(done, tau, tau + dtau)
        done |= ~(np.abs(dtau) >= stol)
    return tau


def phi2(ts: np.ndarray, e: float) -> np.ndarray:
    """exp(-psi) -> geographic latitude (radians)."""
    return np.arctan(sinhpsi2tanphi((1.0 / ts - ts) / 2.0, e))

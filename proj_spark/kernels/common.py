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
    """Wrap radians longitude into [-pi, pi].

    Fast path: most batches are already in range (lam0 == 0 pipelines),
    so a single vectorized range check skips the remainder+where entirely
    (the reference's adjlon has the same early-out, src/adjlon.cpp:45)."""
    lon = np.asarray(lon, dtype=np.float64)
    with np.errstate(invalid="ignore"):
        if not np.any((lon > np.pi) | (lon < -np.pi)):
            return lon
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


def qsfn(sinphi: np.ndarray, e: float, one_es: float) -> np.ndarray:
    """Authalic q (reference src/qsfn.cpp)."""
    sinphi = np.asarray(sinphi, dtype=np.float64)
    if e < 1e-7:
        return sinphi + sinphi
    con = e * sinphi
    return one_es * (
        sinphi / (1.0 - con * con) - (0.5 / e) * np.log((1.0 - con) / (1.0 + con))
    )


def authset(es: float) -> tuple[float, float, float]:
    """Series coefficients for authalic->geographic latitude
    (reference src/auth.cpp pj_authset)."""
    P00, P01, P02 = 1 / 3, 31 / 180, 517 / 5040
    P10, P11 = 23 / 360, 251 / 3780
    P20 = 761 / 45360
    t = es * es
    return (
        es * P00 + t * P01 + t * es * P02,
        t * P10 + t * es * P11,
        t * es * P20,
    )


def authlat(beta: np.ndarray, apa: tuple[float, float, float]) -> np.ndarray:
    """Authalic latitude beta -> geographic latitude (src/auth.cpp pj_authlat)."""
    t = beta + beta
    return beta + apa[0] * np.sin(t) + apa[1] * np.sin(t + t) + apa[2] * np.sin(3 * t)


def auth_phi1(qs: np.ndarray, e: float, one_es: float) -> np.ndarray:
    """Latitude from authalic q by Newton iteration (reference aea.cpp phi1_)."""
    qs = np.asarray(qs, dtype=np.float64)
    phi = np.arcsin(np.clip(0.5 * qs, -1.0, 1.0))
    if e < 1e-7:
        return phi
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(15):
        if done.all():
            break
        sinpi = np.sin(phi)
        cospi = np.cos(phi)
        con = e * sinpi
        com = 1.0 - con * con
        with np.errstate(divide="ignore", invalid="ignore"):
            dphi = (
                0.5 * com * com / cospi
                * (qs / one_es - sinpi / com
                   + 0.5 / e * np.log((1.0 - con) / (1.0 + con)))
            )
        phi = np.where(done, phi, phi + dphi)
        done |= ~(np.abs(dphi) > 1e-10)
    return phi


# 2D Newton inverse on a forward kernel (reference pj_generic_inverse_2d):
# implementation lives in kernels/_generic_inv.py (two-pass Jacobian-refresh
# policy, see its module docstring); re-exported here for the callers.
from proj_spark.kernels._generic_inv import generic_inverse_2d  # noqa: E402,F401


# --------------------------------------------------------------------------
# Gauss conformal sphere (reference src/gauss.cpp) — basis of sterea
# --------------------------------------------------------------------------

FORTPI = np.pi / 4
HALFPI = np.pi / 2


def _srat(esinp, ratexp):
    return ((1.0 - esinp) / (1.0 + esinp)) ** ratexp


def gauss_ini(e: float, phi0: float) -> dict:
    """Constants of the Gauss conformal sphere about phi0 (pj_gauss_ini)."""
    import math

    es = e * e
    sphi = math.sin(phi0)
    cphi2 = math.cos(phi0) ** 2
    rc = math.sqrt(1.0 - es) / (1.0 - es * sphi * sphi)
    C = math.sqrt(1.0 + es * cphi2 * cphi2 / (1.0 - es))
    chi = math.asin(sphi / C)
    ratexp = 0.5 * C * e
    # south-pole guard (reference gauss.cpp:73-78): the 0/0 limit is 1/srat
    if 0.5 * phi0 + FORTPI < 1e-10:
        K = 1.0 / _srat(e * sphi, ratexp)
    else:
        K = math.tan(0.5 * chi + FORTPI) / (
            math.tan(0.5 * phi0 + FORTPI) ** C * _srat(e * sphi, ratexp)
        )
    return {"C": C, "K": K, "e": e, "ratexp": ratexp, "chi0": chi, "rc": rc}

def gauss_fwd(lam, phi, g: dict):
    """Geodetic -> Gauss-sphere (pj_gauss)."""
    sphi = np.sin(phi)
    phi_s = (
        2.0 * np.arctan(
            g["K"] * np.tan(0.5 * phi + FORTPI) ** g["C"] * _srat(g["e"] * sphi, g["ratexp"])
        ) - HALFPI
    )
    return g["C"] * lam, phi_s


def gauss_inv(lam_s, phi_s, g: dict):
    """Gauss-sphere -> geodetic, fixed-point iteration (pj_inv_gauss)."""
    lam = np.asarray(lam_s, dtype=np.float64) / g["C"]
    num = np.tan(0.5 * np.asarray(phi_s, dtype=np.float64) + FORTPI) / g["K"]
    num = num ** (1.0 / g["C"])
    phi = np.asarray(phi_s, dtype=np.float64).copy()
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(20):
        if done.all():
            break
        nphi = 2.0 * np.arctan(num * _srat(g["e"] * np.sin(phi), -0.5 * g["e"])) - HALFPI
        newdone = np.abs(nphi - phi) < 1e-14
        phi = np.where(done, phi, nphi)
        done |= newdone
    return lam, phi


# --------------------------------------------------------------------------
# exact meridian distance (reference src/proj_mdist.cpp — Evenden's series)
# --------------------------------------------------------------------------

def mdist_ini(es: float):
    """Coefficients (E, b[], es) for proj_mdist/proj_inv_mdist."""
    ens = es
    numf = twon1 = denfi = 1.0
    denf = 1.0
    twon = 4.0
    E = [1.0]
    Es = 1.0
    El = 1.0
    i = 1
    for i in range(1, 20):
        numf *= twon1 * twon1
        den = twon * denf * denf * twon1
        T = numf / den
        E.append(T * ens)
        Es -= E[i]
        ens *= es
        twon *= 4.0
        denfi += 1.0
        denf *= denfi
        twon1 += 2.0
        if Es == El:
            break
        El = Es
    nb = i - 1
    b = [0.0] * i
    b[0] = Esum = 1.0 - Es
    numf = denf = 1.0
    numfi, denfi = 2.0, 3.0
    for j in range(1, i):
        Esum -= E[j]
        numf *= numfi
        denf *= denfi
        b[j] = Esum * numf / denf
        numfi += 2.0
        denfi += 2.0
    return {"nb": nb, "es": es, "E": Es, "b": tuple(b)}


def mdist(phi, sphi, cphi, m) -> np.ndarray:
    sc = sphi * cphi
    sphi2 = sphi * sphi
    D = phi * m["E"] - m["es"] * sc / np.sqrt(1.0 - m["es"] * sphi2)
    b = m["b"]
    s = np.full_like(np.asarray(phi, dtype=np.float64), b[m["nb"]])
    for i in range(m["nb"], 0, -1):
        s = b[i - 1] + sphi2 * s
    return D + sc * s


def inv_mdist(dist, m) -> np.ndarray:
    dist = np.asarray(dist, dtype=np.float64)
    k = 1.0 / (1.0 - m["es"])
    phi = dist.copy()
    done = np.zeros(phi.shape, dtype=bool)
    for _ in range(20):
        s = np.sin(phi)
        t = 1.0 - m["es"] * s * s
        step = (mdist(phi, s, np.cos(phi), m) - dist) * (t * np.sqrt(t)) * k
        phi = np.where(done, phi, phi - step)
        done |= np.abs(step) < 1e-14
        if done.all():
            break
    return phi

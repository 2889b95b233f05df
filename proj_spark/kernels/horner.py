"""Horner polynomial evaluation (+proj=horner) — the Engsager/Poder
"gen_pol" engine for classic Danish / System-45 / Storebaelt transforms.

Numpy re-derivation of /root/reference/src/transformations/horner.cpp:
double real 2D Horner (backward summation, :174-201), complex Horner
(:216-238), origin offsets, +range validity circle, and the iterative
inverses used when no inverse coefficients are given (:310-375, :430-480).
Coefficient array layout is identical to gen_pol's triangular packing.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def _n_real(order: int) -> int:
    return (order + 1) * (order + 2) // 2


@dataclass(frozen=True)
class HornerConsts:
    order: int
    range: float
    inverse_tolerance: float
    complex_poly: bool
    has_inv: bool
    uneg: bool
    vneg: bool
    fwd_u: tuple = ()
    fwd_v: tuple = ()
    inv_u: tuple = ()
    inv_v: tuple = ()
    fwd_c: tuple = ()
    inv_c: tuple = ()
    fwd_origin: tuple = (0.0, 0.0)
    inv_origin: tuple = (0.0, 0.0)


def setup_horner(params: dict) -> HornerConsts:
    def coefs(key, n):
        if key not in params:
            return ()
        vals = [float(v) for v in str(params[key]).split(",")]
        if len(vals) != n:
            raise ValueError(f"horner: +{key} expects {n} coefficients")
        return tuple(vals)

    order = int(params.get("deg", 0))
    complex_poly = "fwd_c" in params or "inv_c" in params
    if complex_poly:
        n = 2 * order + 2
        fwd_c = coefs("fwd_c", n)
        inv_c = coefs("inv_c", n)
        has_inv = "inv_c" in params or "inv_origin" in params
        fwd_u = fwd_v = inv_u = inv_v = ()
    else:
        n = _n_real(order)
        fwd_u = coefs("fwd_u", n)
        fwd_v = coefs("fwd_v", n)
        inv_u = coefs("inv_u", n)
        inv_v = coefs("inv_v", n)
        has_inv = ("inv_u" in params or "inv_v" in params
                   or "inv_origin" in params)
        fwd_c = inv_c = ()
    return HornerConsts(
        order,
        float(params.get("range", 500000.0)),
        float(params.get("inv_tolerance", 0.001)),
        complex_poly, has_inv,
        "uneg" in params, "vneg" in params,
        fwd_u, fwd_v, inv_u, inv_v, fwd_c, inv_c,
        coefs("fwd_origin", 2) or (0.0, 0.0),
        coefs("inv_origin", 2) or (0.0, 0.0))


def _real_eval(order, cx, cy, e, n, order_offset=0):
    """double_real_horner_eval (horner.cpp:174-201), vectorized."""
    ix = _n_real(order)
    iy = ix
    ix -= 1
    iy -= 1
    E = np.full_like(e, cx[ix])
    N = np.full_like(n, cy[iy])
    for r in range(order, order_offset, -1):
        iy -= 1
        u = np.full_like(n, cy[iy])
        ix -= 1
        v = np.full_like(e, cx[ix])
        for c in range(order, r - 1, -1):
            iy -= 1
            u = n * u + cy[iy]
            ix -= 1
            v = e * v + cx[ix]
        N = e * N + u
        E = n * E + v
    return E, N


def _single_eval(order, cx, x, order_offset=0):
    """single_real_horner_eval: 1D Horner over the first order+1 entries."""
    i = order + 1
    i -= 1
    u = np.full_like(x, cx[i])
    for r in range(order, order_offset, -1):
        i -= 1
        u = x * u + cx[i]
    return u


def _complex_eval(order, c, e, n, order_offset=0):
    """complex_horner_eval (horner.cpp:216-238), vectorized."""
    i = 2 * order + 2
    beg = order_offset * 2
    i -= 1
    E = np.full_like(e, c[i])
    i -= 1
    N = np.full_like(n, c[i])
    while i > beg:
        i -= 1
        w = n * E + e * N + c[i]
        i -= 1
        N = n * N - e * E + c[i]
        E = w
    return E, N


def horner_fwd(u, v, C: HornerConsts):
    e = np.asarray(u, dtype=np.float64) - C.fwd_origin[0]
    n = np.asarray(v, dtype=np.float64) - C.fwd_origin[1]
    if C.complex_poly:
        if C.uneg:
            e = -e
        if C.vneg:
            n = -n
    bad = (np.abs(n) > C.range) | (np.abs(e) > C.range)
    if C.complex_poly:
        E, N = _complex_eval(C.order, C.fwd_c, e, n)
    else:
        E, N = _real_eval(C.order, C.fwd_u, C.fwd_v, e, n)
    return np.where(bad, np.nan, E), np.where(bad, np.nan, N)


def horner_inv(u, v, C: HornerConsts):
    if C.has_inv:
        e = np.asarray(u, dtype=np.float64) - C.inv_origin[0]
        n = np.asarray(v, dtype=np.float64) - C.inv_origin[1]
        if C.complex_poly:
            if C.uneg:
                e = -e
            if C.vneg:
                n = -n
        bad = (np.abs(n) > C.range) | (np.abs(e) > C.range)
        if C.complex_poly:
            E, N = _complex_eval(C.order, C.inv_c, e, n)
        else:
            E, N = _real_eval(C.order, C.inv_u, C.inv_v, e, n)
        return np.where(bad, np.nan, E), np.where(bad, np.nan, N)
    if C.complex_poly:
        return _complex_iter_inv(u, v, C)
    return _real_iter_inv(u, v, C)


def _real_iter_inv(u, v, C: HornerConsts):
    """real_iterative_inverse_impl (horner.cpp:310-375): 2x2 quasi-Newton
    on the forward coefficients."""
    e = np.asarray(u, dtype=np.float64)
    n = np.asarray(v, dtype=np.float64)
    bad = (np.abs(n) > C.range) | (np.abs(e) > C.range)
    de = e - C.fwd_u[0]
    dn = n - C.fwd_v[0]
    x0 = np.zeros_like(e)
    y0 = np.zeros_like(e)
    converged = np.zeros(e.shape, dtype=bool)
    for _ in range(32):
        Mb, Mc = _real_eval(C.order, C.fwd_u, C.fwd_v, x0, y0, 1)
        Ma = _single_eval(C.order, C.fwd_u, x0, 1)
        Md = _single_eval(C.order, C.fwd_v, y0, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            idet = 1.0 / (Ma * Md - Mb * Mc)
            x = idet * (Md * de - Mb * dn)
            y = idet * (Ma * dn - Mc * de)
        newly = (np.abs(x - x0) < C.inverse_tolerance) & (
            np.abs(y - y0) < C.inverse_tolerance)
        x0 = np.where(converged, x0, x)
        y0 = np.where(converged, y0, y)
        converged |= newly
        if converged.all():
            break
    bad |= ~converged
    return (np.where(bad, np.nan, x0 + C.fwd_origin[0]),
            np.where(bad, np.nan, y0 + C.fwd_origin[1]))


def _complex_iter_inv(u, v, C: HornerConsts):
    """complex_iterative_inverse_impl (horner.cpp:430-480)."""
    e = np.asarray(u, dtype=np.float64)
    n = np.asarray(v, dtype=np.float64)
    bad = (np.abs(n) > C.range) | (np.abs(e) > C.range)
    dZ = (n - C.fwd_c[0]) + 1j * (e - C.fwd_c[1])
    w0 = np.zeros_like(e, dtype=np.complex128)
    converged = np.zeros(e.shape, dtype=bool)
    for _ in range(32):
        E, N = _complex_eval(C.order, C.fwd_c, w0.imag, w0.real, 1)
        det = N + 1j * E
        with np.errstate(divide="ignore", invalid="ignore"):
            w1 = dZ / det
        newly = (np.abs(w1.real - w0.real) < C.inverse_tolerance) & (
            np.abs(w1.imag - w0.imag) < C.inverse_tolerance)
        w0 = np.where(converged, w0, w1)
        converged |= newly
        if converged.all():
            break
    bad |= ~converged
    E = w0.imag
    N = w0.real
    if C.uneg:
        E = -E
    if C.vneg:
        N = -N
    return (np.where(bad, np.nan, E + C.fwd_origin[0]),
            np.where(bad, np.nan, N + C.fwd_origin[1]))

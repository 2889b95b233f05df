"""Geodetic (lam, phi, h) <-> geocentric cartesian (X, Y, Z).

Reference: /root/reference/src/conversions/cart.cpp — forward is
Hofmann-Wellenhof & Moritz eq. 5-27 (:139-154); inverse is the Bowring-style
closed form (:156-239) including the polar height fallback via the
geocentric radius. Unlike projection kernels these produce REAL metres
(PROJ marks cart's IO units CARTESIAN; no a-scaling in finalize).
"""

from __future__ import annotations

import numpy as np

from proj_spark.crs import Ellipsoid


def cart_fwd(lam: np.ndarray, phi: np.ndarray, h: np.ndarray, ell: Ellipsoid):
    lam = np.asarray(lam, dtype=np.float64)
    phi = np.asarray(phi, dtype=np.float64)
    h = np.asarray(h, dtype=np.float64)
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    N = ell.a if ell.es == 0 else ell.a / np.sqrt(1.0 - ell.es * sinphi * sinphi)
    X = (N + h) * cosphi * np.cos(lam)
    Y = (N + h) * cosphi * np.sin(lam)
    Z = (N * (1.0 - ell.es) + h) * sinphi
    return X, Y, Z


def cart_inv(X: np.ndarray, Y: np.ndarray, Z: np.ndarray, ell: Ellipsoid):
    X = np.asarray(X, dtype=np.float64)
    Y = np.asarray(Y, dtype=np.float64)
    Z = np.asarray(Z, dtype=np.float64)

    x_a = X * ell.ra
    y_a = Y * ell.ra
    z_a = Z * ell.ra
    p_a = np.sqrt(x_a * x_a + y_a * y_a)

    b_a = 1.0 - ell.f
    pb = p_a * b_a
    norm = np.sqrt(z_a * z_a + pb * pb)
    nz = norm != 0
    inv_norm = np.where(nz, 1.0 / np.where(nz, norm, 1.0), 0.0)
    c = np.where(nz, pb * inv_norm, 1.0)
    s = np.where(nz, z_a * inv_norm, 0.0)

    y_phi = z_a + ell.e2s * b_a * s * s * s
    x_phi = p_a - ell.es * c * c * c
    norm_phi = np.sqrt(y_phi * y_phi + x_phi * x_phi)
    npz = norm_phi != 0
    inv_np = np.where(npz, 1.0 / np.where(npz, norm_phi, 1.0), 0.0)
    cosphi = np.where(npz, x_phi * inv_np, 1.0)
    sinphi = np.where(npz, y_phi * inv_np, 0.0)

    near_axis = x_phi <= 0  # no unique solution very close to the earth axis
    phi = np.where(
        near_axis,
        np.where(Z >= 0, np.pi / 2, -np.pi / 2),
        np.arctan(y_phi / np.where(near_axis, 1.0, x_phi)),
    )
    cosphi = np.where(near_axis, 0.0, cosphi)
    sinphi = np.where(near_axis, np.where(Z >= 0, 1.0, -1.0), sinphi)
    lam = np.arctan2(y_a, x_a)

    polar = cosphi < 1e-6
    # geocentric radius at latitude (exact for the polar fallback)
    c2 = cosphi * cosphi
    s2 = sinphi * sinphi
    b2 = b_a * b_a
    r = ell.a * np.sqrt((c2 + b2 * b2 * s2) / (c2 + b2 * s2))
    N = ell.a if ell.es == 0 else ell.a / np.sqrt(1.0 - ell.es * sinphi * sinphi)
    safe_cos = np.where(polar, 1.0, cosphi)
    h = np.where(polar, np.abs(Z) - r, ell.a * p_a / safe_cos - N)
    return lam, phi, h

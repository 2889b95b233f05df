"""Distortion analysis — the proj_factors analogue.

The reference computes meridional/parallel scale, areal scale, angular
distortion, Tissot axes and convergence by numerical differentiation of
the projection (reference /root/reference/src/factors.cpp:15-114, struct
P5_FACTORS src/proj.h:206-221). Same approach here: central differences
on the compiled pipeline's forward, vectorized over arrays — once kernels
exist, distortion analysis is free.
"""

from __future__ import annotations

import math

import numpy as np

from proj_spark.plans.pipeline import compile_pipeline, parse_params, tokenize
from proj_spark.crs import resolve_ellipsoid

DEG = math.pi / 180.0


def factors(spec: str, lon_deg, lat_deg, h: float = 1e-5):
    """Returns a dict of arrays: h (meridional scale), k (parallel scale),
    s (areal scale), omega (max angular distortion, degrees), a/b (Tissot
    semi-axes), conv (meridian convergence, degrees).

    ``h`` is the finite-difference step in degrees.
    """
    pipe = compile_pipeline(spec)
    ell = resolve_ellipsoid(parse_params(tokenize(spec)))
    lon = np.asarray(lon_deg, dtype=np.float64)
    lat = np.asarray(lat_deg, dtype=np.float64)

    x_e, y_e, _, _ = pipe.fwd_deg(lon + h, lat)
    x_w, y_w, _, _ = pipe.fwd_deg(lon - h, lat)
    x_n, y_n, _, _ = pipe.fwd_deg(lon, lat + h)
    x_s, y_s, _, _ = pipe.fwd_deg(lon, lat - h)

    dh = 2.0 * h * DEG
    x_l = (x_e - x_w) / dh   # dx/dlam
    y_l = (y_e - y_w) / dh
    x_p = (x_n - x_s) / dh   # dx/dphi
    y_p = (y_n - y_s) / dh

    phi = np.radians(lat)
    sinphi = np.sin(phi)
    cosphi = np.cos(phi)
    t = 1.0 - ell.es * sinphi * sinphi
    # radii of curvature
    N = ell.a / np.sqrt(t)                 # prime vertical
    M = ell.a * (1.0 - ell.es) / t ** 1.5  # meridian

    k = np.hypot(x_l, y_l) / (N * cosphi)
    hh = np.hypot(x_p, y_p) / M
    s = (y_p * x_l - x_p * y_l) / (M * N * cosphi)
    ap = np.sqrt(np.maximum(hh * hh + k * k + 2.0 * s, 0.0))
    bp = np.sqrt(np.maximum(hh * hh + k * k - 2.0 * s, 0.0))
    a = 0.5 * (ap + bp)
    b = 0.5 * np.abs(ap - bp)
    with np.errstate(divide="ignore", invalid="ignore"):
        # max angular distortion 2*arcsin((a-b)/(a+b)); with a=(a'+b')/2 and
        # b=(a'-b')/2 this is 2*arcsin(b'/a') (Snyder eq. 4-9)
        omega = 2.0 * np.degrees(np.arcsin(np.clip(bp / ap, -1, 1)))
    conv = -np.degrees(np.arctan2(x_p, y_p))
    return {"h": hh, "k": k, "s": s, "omega": omega, "a": a, "b": b, "conv": conv}

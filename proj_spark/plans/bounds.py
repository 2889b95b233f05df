"""Bounding-box transformation — analogue of proj_trans_bounds
(reference src/4D_api.cpp:1441-1606).

Samples ``densify_pts`` points along each edge of the input rectangle,
runs them through the compiled pipeline, and returns the envelope of the
finite results.  Like the reference: edge densification (not just the 4
corners) captures projection curvature; for geographic OUTPUT the
antimeridian case is handled by detecting a longitude span > 180 deg and
re-aggregating modulo 360 (4D_api.cpp:1529-1560).
"""

from __future__ import annotations

import numpy as np

from proj_spark.plans.pipeline import Pipeline, compile_pipeline


def trans_bounds(spec_or_pipe, xmin: float, ymin: float, xmax: float,
                 ymax: float, densify_pts: int = 21,
                 direction: str = "fwd"):
    """Return (xmin, ymin, xmax, ymax) of the transformed rectangle.

    ``spec_or_pipe``: proj-string or compiled Pipeline. Input/output are
    degrees on angular sides and metres on projected sides (same
    convention as Pipeline.fwd_deg/inv_deg). NaN results (points outside
    the projection domain) are dropped; raises if nothing survives.
    """
    if densify_pts < 2:
        raise ValueError("trans_bounds: densify_pts must be >= 2")
    pipe = (spec_or_pipe if isinstance(spec_or_pipe, Pipeline)
            else compile_pipeline(spec_or_pipe))

    tx = np.linspace(xmin, xmax, densify_pts)
    ty = np.linspace(ymin, ymax, densify_pts)
    ex = np.concatenate([tx, tx, np.full(densify_pts, xmin),
                         np.full(densify_pts, xmax)])
    ey = np.concatenate([np.full(densify_pts, ymin),
                         np.full(densify_pts, ymax), ty, ty])

    run = pipe.fwd_deg if direction == "fwd" else pipe.inv_deg
    ox, oy, _, _ = run(ex.copy(), ey.copy())
    ok = np.isfinite(ox) & np.isfinite(oy)
    if not ok.any():
        raise ValueError("trans_bounds: no finite points in output")
    ox, oy = ox[ok], oy[ok]

    out_angular = (pipe.right == "rad") if direction == "fwd" \
        else (pipe.left == "rad")
    x0, x1 = float(ox.min()), float(ox.max())
    if out_angular and (x1 - x0) > 180.0:
        # antimeridian crossing: re-aggregate longitudes in [0, 360)
        lon = np.mod(ox, 360.0)
        x0, x1 = float(lon.min()), float(lon.max())
        if x1 - x0 > 180.0:  # genuinely global extent: keep raw envelope
            x0, x1 = float(ox.min()), float(ox.max())
        else:
            if x0 > 180.0:
                x0 -= 360.0
            if x1 > 180.0:
                x1 -= 360.0
            if x1 < x0:
                x0, x1 = x1, x0
    return x0, float(oy.min()), x1, float(oy.max())

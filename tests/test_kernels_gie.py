"""Conformance of numpy kernels against PROJ's gie regression fixtures.

Fixtures are data-only extracts (tools/extract_gie.py) of
/root/reference/test/gie/*.gie — each point is (operation, direction,
tolerance, accept, expect). We assert the same tolerances the reference
asserts (50 nm for ellipsoidal tmerc, 75/40 um for Helmert, etc.), measuring
angular error as geodesic-ish metres so tolerances are comparable.
"""

from __future__ import annotations

import json
import math
import pathlib

import numpy as np
import pytest

from proj_spark.plans.pipeline import compile_pipeline

FIXDIR = pathlib.Path(__file__).parent / "fixtures" / "gie"
EARTH_R = 6378137.0

CASES = []
for f in sorted(FIXDIR.glob("*.json")):
    for block in json.loads(f.read_text()):
        CASES.append(block)


def _angular_err_m(lon1, lat1, lon2, lat2):
    """Small-angle geodesic distance in metres between two lon/lat degrees."""
    lat = math.radians((lat1 + lat2) / 2)
    dlon = abs(lon1 - lon2)
    if dlon > 180:
        dlon = 360 - dlon
    dx = math.radians(dlon) * math.cos(lat) * EARTH_R
    dy = math.radians(lat1 - lat2) * EARTH_R
    return math.hypot(dx, dy)


@pytest.mark.parametrize(
    "block", CASES, ids=[f"{i}:{c['operation'][:60]}" for i, c in enumerate(CASES)]
)
def test_gie_block(block):
    pipe = compile_pipeline(block["operation"])
    for pt in block["points"]:
        accept = pt["accept"]
        expect = pt["expect"]
        tol = pt["tol"]
        inverse = pt["dir"] == "inverse"

        x = np.array([accept[0]])
        y = np.array([accept[1]])
        z = np.array([accept[2]]) if len(accept) > 2 else None
        t = np.array([accept[3]]) if len(accept) > 3 else None

        if inverse:
            rx, ry, rz, _ = pipe.inv_deg(x, y, z, t)
            out_angular = pipe.left == "rad"
        else:
            rx, ry, rz, _ = pipe.fwd_deg(x, y, z, t)
            out_angular = pipe.right == "rad"

        gx, gy = float(rx[0]), float(ry[0])
        ex, ey = expect[0], expect[1]
        assert np.isfinite(gx) and np.isfinite(gy), (
            f"NaN result for {block['operation']} accept={accept}"
        )
        if out_angular:
            err = _angular_err_m(gx, gy, ex, ey)
        else:
            err = math.hypot(gx - ex, gy - ey)
        assert err <= tol, (
            f"{block['operation']}\n dir={pt['dir']} accept={accept}\n"
            f" got=({gx!r}, {gy!r}) expect=({ex!r}, {ey!r}) err={err:g} tol={tol:g}"
        )
        if len(expect) > 2 and rz is not None:
            err_z = abs(float(rz[0]) - expect[2])
            assert err_z <= max(tol, 1e-4), (
                f"{block['operation']} z err={err_z:g} tol={tol:g}"
            )


def test_roundtrip_property():
    """fwd∘inv drift below 1e-9 deg for the flagship ops on a lat/lon grid."""
    specs = [
        "+proj=tmerc +ellps=GRS80",
        "+proj=utm +zone=32 +ellps=GRS80",
        "+proj=lcc +ellps=GRS80 +lat_1=0.5 +lat_2=2",
        "+proj=merc +ellps=GRS80",
        "+proj=webmerc +ellps=WGS84",
    ]
    rng = np.random.default_rng(42)
    lon = rng.uniform(-2.5, 2.5, 500) + 9.0  # near zone 32 meridian
    lat = rng.uniform(-80, 80, 500)
    for spec in specs:
        pipe = compile_pipeline(spec)
        x, y, _, _ = pipe.fwd_deg(lon, lat)
        lon2, lat2, _, _ = pipe.inv_deg(x, y)
        assert np.nanmax(np.abs(lon2 - lon)) < 1e-9, spec
        assert np.nanmax(np.abs(lat2 - lat)) < 1e-9, spec


def test_utm_auto_matches_fixed_zone():
    """Per-point zone selection equals the fixed-zone kernel in each zone."""
    auto = compile_pipeline("+proj=utm +ellps=GRS80")
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 2000)
    lat = rng.uniform(-80, 84, 2000)
    ax, ay, _, _ = auto.fwd_deg(lon, lat)
    from proj_spark.kernels.tmerc import utm_zone_from_lon

    zones = utm_zone_from_lon(lon)
    for zone in np.unique(zones):
        sel = zones == zone
        south = lat[sel] < 0
        fixed_n = compile_pipeline(f"+proj=utm +zone={zone} +ellps=GRS80")
        fx, fy, _, _ = fixed_n.fwd_deg(lon[sel], lat[sel])
        fy = fy + np.where(south, 10000000.0, 0.0)
        np.testing.assert_allclose(ax[sel], fx, rtol=0, atol=1e-6)
        np.testing.assert_allclose(ay[sel], fy, rtol=0, atol=1e-6)

"""Vincenty geodesic + proj_factors-analogue tests."""

from __future__ import annotations

import math

import numpy as np

from proj_spark.crs import ELLIPSOIDS
from proj_spark.kernels.geodesic import (
    geod_direct,
    geod_inverse,
    geod_polygon_area,
    setup_vincenty,
)
from proj_spark.plans.factors import factors

C = setup_vincenty(ELLIPSOIDS["WGS84"])


def test_inverse_known_baseline():
    # Flinders Peak <-> Buninyong: the classic Vincenty test pair
    # (published in Vincenty 1975 / Geoscience Australia): 54972.271 m
    s12, a1, a2, ok = geod_inverse(
        np.array([144.42486788889]), np.array([-37.95103341667]),
        np.array([143.92649552778]), np.array([-37.65282113889]), C)
    assert ok.all()
    assert abs(s12[0] - 54972.271) < 0.01
    assert abs(a1[0] - (360 - 52.869444)) % 360 < 0.01 or abs(a1[0] + 52.869) < 0.5


def test_direct_inverse_roundtrip():
    rng = np.random.default_rng(5)
    lon1 = rng.uniform(-180, 180, 300)
    lat1 = rng.uniform(-80, 80, 300)
    azi = rng.uniform(-180, 180, 300)
    s = rng.uniform(10.0, 5e6, 300)
    lon2, lat2, _ = geod_direct(lon1, lat1, azi, s, C)
    s12, a1, _, ok = geod_inverse(lon1, lat1, lon2, lat2, C)
    m = ok
    assert m.mean() > 0.98  # a few near-antipodal may not converge
    np.testing.assert_allclose(s12[m], s[m], rtol=0, atol=1e-3)
    # azimuth agreement modulo 360
    da = (a1[m] - azi[m] + 540) % 360 - 180
    assert np.abs(da).max() < 1e-5


def test_inverse_matches_haversine_on_sphere():
    from proj_spark.crs import Ellipsoid

    S = setup_vincenty(Ellipsoid.sphere(6371000.0))
    lon1, lat1, lon2, lat2 = 10.0, 50.0, 11.0, 51.0
    s12, _, _, ok = geod_inverse(
        np.array([lon1]), np.array([lat1]), np.array([lon2]), np.array([lat2]), S)
    hav = 2 * 6371000.0 * math.asin(math.sqrt(
        math.sin(math.radians((lat2 - lat1) / 2)) ** 2
        + math.cos(math.radians(lat1)) * math.cos(math.radians(lat2))
        * math.sin(math.radians((lon2 - lon1) / 2)) ** 2))
    assert ok.all() and abs(s12[0] - hav) < 1e-6


def test_polygon_area_perimeter():
    # 1x1 degree quad near the equator: ~111km x 111km
    lons = np.array([0.0, 1.0, 1.0, 0.0])
    lats = np.array([0.0, 0.0, 1.0, 1.0])
    area, perim = geod_polygon_area(lons, lats, C)
    assert abs(abs(area) - 111194.9**2 * 1.0) / 111194.9**2 < 0.02
    assert abs(perim - 4 * 111000) / (4 * 111000) < 0.01


def test_polygon_area_antimeridian_ring():
    """A 1x1-degree quad straddling the antimeridian must get the same area
    as the equivalent quad at lon 0 — edge deltas are wrapped into [-pi,pi)
    so the +179.5 -> -179.5 edge contributes 1 degree, not 359."""
    lons_am = np.array([179.5, -179.5, -179.5, 179.5])
    lons_gm = np.array([-0.5, 0.5, 0.5, -0.5])
    lats = np.array([0.0, 0.0, 1.0, 1.0])
    area_am, perim_am = geod_polygon_area(lons_am, lats, C)
    area_gm, perim_gm = geod_polygon_area(lons_gm, lats, C)
    assert abs(area_am - area_gm) / abs(area_gm) < 1e-9
    assert abs(perim_am - perim_gm) < 1.0


def test_factors_mercator():
    """Mercator: h == k == sec(phi)-ish (conformal => omega ~ 0, a == b)."""
    out = factors("+proj=merc +ellps=WGS84", np.array([10.0]), np.array([45.0]))
    es = ELLIPSOIDS["WGS84"].es
    sin45 = math.sin(math.radians(45))
    expected_k = 1.0 / math.cos(math.radians(45)) * math.sqrt(1 - es * sin45 * sin45)
    assert abs(out["k"][0] - expected_k) < 1e-6
    assert abs(out["h"][0] - out["k"][0]) < 1e-6   # conformal
    assert abs(out["omega"][0]) < 1e-4
    assert abs(out["conv"][0]) < 1e-6


def test_factors_cea_equal_area():
    out = factors("+proj=cea +ellps=WGS84", np.array([5.0]), np.array([30.0]))
    assert abs(out["s"][0] - 1.0) < 1e-6  # equal-area: areal scale 1


def test_factors_tmerc_convergence():
    """tmerc meridian convergence ~ sin(phi) * dlam."""
    out = factors("+proj=tmerc +ellps=WGS84", np.array([3.0]), np.array([50.0]))
    approx = math.degrees(math.atan(math.tan(math.radians(3.0)) * math.sin(math.radians(50.0))))
    assert abs(out["conv"][0] - approx) < 0.01

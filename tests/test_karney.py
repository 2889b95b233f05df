"""Karney geodesic tests against the reference's embedded GeographicLib
test set (/root/reference/src/tests/geodtest.c:43-146, data-only
extraction in tests/fixtures/geodtest_cases.json) plus cross-checks
vs the Vincenty implementation and antipodal robustness."""

import json
import pathlib

import numpy as np
import pytest

from proj_spark.kernels import geodesic as V
from proj_spark.kernels import karney as K

WGS84 = K.geod_consts(6378137.0, 1 / 298.257223563)
CASES = np.array(json.load(open(
    pathlib.Path(__file__).parent / "fixtures" / "geodtest_cases.json")))


def test_geodtest_inverse():
    lat1, lon1, azi1, lat2, lon2, azi2, s12, a12, m12, M12, M21, _ = CASES.T
    r = K.geod_inverse(WGS84, lat1, lon1, lat2, lon2, want_scale=True)
    # geodtest.c:138-145 tolerances
    np.testing.assert_allclose(r["azi1"], azi1, atol=1e-13)
    np.testing.assert_allclose(r["azi2"], azi2, atol=1e-13)
    np.testing.assert_allclose(r["s12"], s12, atol=1e-8)
    np.testing.assert_allclose(r["a12"], a12, atol=1e-13)
    np.testing.assert_allclose(r["m12"], m12, atol=1e-8)
    np.testing.assert_allclose(r["M12"], M12, atol=1e-15)
    np.testing.assert_allclose(r["M21"], M21, atol=1e-15)


def test_geodtest_direct():
    lat1, lon1, azi1, lat2, lon2, azi2, s12, a12, m12, _, _, _ = CASES.T
    d = K.geod_direct(WGS84, lat1, lon1, azi1, s12, want_scale=True)
    np.testing.assert_allclose(d["lat2"], lat2, atol=1e-13)
    np.testing.assert_allclose(
        d["lon2"], np.remainder(lon2 + 180.0, 360.0) - 180.0, atol=1e-13)
    np.testing.assert_allclose(d["azi2"], azi2, atol=1e-13)
    np.testing.assert_allclose(d["a12"], a12, atol=1e-13)
    np.testing.assert_allclose(d["m12"], m12, atol=1e-8)


def test_matches_vincenty_where_it_converges():
    rng = np.random.default_rng(7)
    n = 5000
    lat1 = rng.uniform(-89.9, 89.9, n)
    lon1 = rng.uniform(-180, 180, n)
    lat2 = rng.uniform(-89.9, 89.9, n)
    lon2 = rng.uniform(-180, 180, n)
    VC = V.VinConsts(WGS84.a, WGS84.b, WGS84.f)
    s_v, a1_v, _, ok = V.geod_inverse(lon1, lat1, lon2, lat2, VC)
    r = K.geod_inverse(WGS84, lat1, lon1, lat2, lon2)
    m = ok & np.isfinite(s_v)
    assert m.sum() > n * 0.99
    assert np.abs(r["s12"][m] - s_v[m]).max() < 5e-4  # Vincenty's accuracy
    da = np.abs((r["azi1"][m] - a1_v[m] + 180) % 360 - 180)
    assert da.max() < 1e-6


def test_antipodal_finite_and_consistent():
    lat1 = np.array([0.0, 30.0, -30.0, 0.5, 10.0, 0.0])
    lon1 = np.array([0.0, 0.0, 0.0, 0.0, 20.0, 0.0])
    lat2 = np.array([0.5, -29.9, 29.9, -0.3, -10.05, 0.0])
    lon2 = np.array([179.5, 179.8, -179.8, 179.99, -159.95, 180.0])
    r = K.geod_inverse(WGS84, lat1, lon1, lat2, lon2)
    assert np.isfinite(r["s12"]).all()
    assert (r["s12"] > 19.9e6).all()
    # close the triangle with the direct problem
    d = K.geod_direct(WGS84, lat1, lon1, r["azi1"], r["s12"])
    np.testing.assert_allclose(d["lat2"], lat2, atol=1e-8)
    dlon = np.abs((d["lon2"] - lon2 + 180) % 360 - 180)
    assert dlon.max() < 1e-8


def test_equatorial_and_meridional():
    r = K.geod_inverse(WGS84, [0.0], [10.0], [0.0], [50.0])
    # equatorial arc: s = a * lam12
    np.testing.assert_allclose(r["s12"][0],
                               WGS84.a * np.radians(40.0), rtol=1e-12)
    assert abs(r["azi1"][0] - 90.0) < 1e-12
    r = K.geod_inverse(WGS84, [10.0], [7.0], [55.0], [7.0])
    assert abs(r["azi1"][0]) < 1e-12  # due north
    d = K.geod_direct(WGS84, [10.0], [7.0], [0.0], r["s12"])
    np.testing.assert_allclose(d["lat2"][0], 55.0, atol=1e-9)


def test_pole_crossing_direct():
    d = K.geod_direct(WGS84, [80.0], [0.0], [0.0], [3.0e6])
    # shoots over the north pole onto the far meridian
    assert d["lat2"][0] < 90.0
    assert abs(abs(d["lon2"][0]) - 180.0) < 1e-6
    assert abs(abs(d["azi2"][0]) - 180.0) < 1e-6


def test_short_lines():
    rng = np.random.default_rng(3)
    n = 500
    lat1 = rng.uniform(-80, 80, n)
    lon1 = rng.uniform(-180, 180, n)
    dlat = rng.uniform(-1e-5, 1e-5, n)
    dlon = rng.uniform(-1e-5, 1e-5, n)
    r = K.geod_inverse(WGS84, lat1, lon1, lat1 + dlat, lon1 + dlon)
    assert np.isfinite(r["s12"]).all()
    assert (r["s12"] < 5.0).all()
    d = K.geod_direct(WGS84, lat1, lon1, r["azi1"], r["s12"])
    np.testing.assert_allclose(d["lat2"], lat1 + dlat, atol=1e-11)


def test_coincident_points():
    r = K.geod_inverse(WGS84, [10.0, -90.0], [20.0, 0.0],
                       [10.0, -90.0], [20.0, 0.0])
    np.testing.assert_allclose(r["s12"], 0.0, atol=1e-9)


def test_geodtest_area():
    """S12 column of the reference's embedded test set (geodtest.c:145
    tolerance 0.1 m^2)."""
    lat1, lon1, azi1, lat2, lon2, azi2, s12, a12, m12, M12, M21, S12 = \
        CASES.T
    r = K.geod_inverse(WGS84, lat1, lon1, lat2, lon2, want_area=True)
    np.testing.assert_allclose(r["S12"], S12, atol=0.1)


def test_polygon_area_octant():
    import math

    area0 = 4 * math.pi * K.authalic_c2(WGS84)
    a, p = K.geod_polygon_area(WGS84, [0.0, 90.0, 0.0], [0.0, 0.0, 90.0])
    assert abs(a - area0 / 8) < 1.0
    # perimeter: three quarter-circumference arcs (two meridional + one
    # equatorial)
    assert 2.99e7 < p < 3.01e7


def test_polygon_area_orientation_and_wrap():
    a_ccw, _ = K.geod_polygon_area(
        WGS84, [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0])
    a_cw, _ = K.geod_polygon_area(
        WGS84, [0.0, 0.0, 1.0, 1.0], [0.0, 1.0, 1.0, 0.0])
    assert a_ccw > 0 and abs(a_ccw + a_cw) < 1e-3
    # antimeridian-crossing ring: 2-deg wide, ~twice the area, positive
    # (not exactly 2x: the single 2-deg top geodesic sags below the
    # parallel more than two 1-deg ones)
    a_am, _ = K.geod_polygon_area(
        WGS84, [179.0, -179.0, -179.0, 179.0], [0.0, 0.0, 1.0, 1.0])
    assert abs(a_am - 2 * a_ccw) / a_am < 1e-4


def test_polygon_area_pole_encircling():
    import math

    lons = np.arange(0.0, 360.0, 10.0)
    lats = np.full_like(lons, 80.0)
    a, _ = K.geod_polygon_area(WGS84, lons, lats)
    cap = 2 * math.pi * K.authalic_c2(WGS84) \
        * (1 - math.sin(math.radians(80.0)))
    assert abs(a - cap) / cap < 0.005  # chord-ring vs parallel-cap

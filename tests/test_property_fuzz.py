"""Property-based fuzzing (hypothesis) of the numerical cores.

These don't pin values — the gie corpus does that — they pin INVARIANTS
over the whole input domain: inverse∘forward identity, geodesic triangle
closure, symmetry under endpoint swap, and graceful NaN propagation.
"""

import math

import numpy as np
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from proj_spark.kernels import karney as K
from proj_spark.plans.pipeline import compile_pipeline

WGS84 = K.geod_consts(6378137.0, 1 / 298.257223563)

lats = st.floats(-89.99, 89.99, allow_nan=False)
lons = st.floats(-179.99, 179.99, allow_nan=False)


@settings(max_examples=200, deadline=None)
@given(lats, lons, lats, lons)
def test_geod_inverse_direct_closure(lat1, lon1, lat2, lon2):
    r = K.geod_inverse(WGS84, [lat1], [lon1], [lat2], [lon2])
    assert np.isfinite(r["s12"][0])
    d = K.geod_direct(WGS84, [lat1], [lon1], r["azi1"], r["s12"])
    # land back on the target (mm-level; antipodal worst case microns-off)
    km = 111.0
    assert abs(d["lat2"][0] - lat2) * km < 1e-6
    dlon = abs((d["lon2"][0] - lon2 + 180.0) % 360.0 - 180.0)
    assert dlon * km * max(math.cos(math.radians(lat2)), 1e-3) < 1e-5


@settings(max_examples=200, deadline=None)
@given(lats, lons, lats, lons)
def test_geod_inverse_symmetry(lat1, lon1, lat2, lon2):
    a = K.geod_inverse(WGS84, [lat1], [lon1], [lat2], [lon2])
    b = K.geod_inverse(WGS84, [lat2], [lon2], [lat1], [lon1])
    assert abs(a["s12"][0] - b["s12"][0]) < 1e-6
    # forward azimuth of the reverse path is the back azimuth + 180
    diff = (a["azi1"][0] - b["azi2"][0] + 180.0) % 360.0 - 180.0
    assert abs(abs(diff) - 180.0) < 1e-6 or a["s12"][0] < 1.0


@settings(max_examples=100, deadline=None)
@given(st.floats(-80, 80), st.floats(-170, 170))
def test_utm_roundtrip_domain(lat, lon):
    zone = int((lon + 180) // 6) + 1
    p = compile_pipeline(f"+proj=utm +zone={zone} +ellps=WGS84")
    X, Y, _, _ = p.fwd_deg(np.array([lon]), np.array([lat]))
    lo, la, _, _ = p.inv_deg(X, Y)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


@settings(max_examples=100, deadline=None)
@given(st.floats(-85, 85), st.floats(-179.9, 179.9))
def test_webmerc_nan_propagation_and_roundtrip(lat, lon):
    p = compile_pipeline("+proj=webmerc +ellps=WGS84")
    X, Y, _, _ = p.fwd_deg(np.array([lon, np.nan]), np.array([lat, lat]))
    assert np.isnan(X[1]) and np.isnan(Y[1])  # in-band error propagation
    lo, la, _, _ = p.inv_deg(X[:1], Y[:1])
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(lons, st.floats(-80, 80)),
                min_size=3, max_size=8, unique=True))
def test_polygon_area_orientation_antisymmetry(ring):
    lons_ = [p[0] for p in ring]
    lats_ = [p[1] for p in ring]
    # Near-antipodal vertex pairs admit two (nearly) equal-length geodesics;
    # reversing traversal can legitimately pick the mirror path, so the edge
    # itself changes and antisymmetry does not apply (same ambiguity exists
    # in GeographicLib).  Exclude edges within 150 km of half-circumference.
    edges = K.geod_inverse(WGS84,
                           [p[1] for p in ring], lons_,
                           [ring[(i + 1) % len(ring)][1] for i in range(len(ring))],
                           [ring[(i + 1) % len(ring)][0] for i in range(len(ring))])
    assume(float(np.max(edges["s12"])) < 19_850_000.0)
    a_fwd, per_fwd = K.geod_polygon_area(WGS84, lons_, lats_)
    a_rev, per_rev = K.geod_polygon_area(WGS84, lons_[::-1], lats_[::-1])
    area0 = 4 * math.pi * K.authalic_c2(WGS84)
    # reversing orientation flips the sign (mod pole-wrap normalization)
    flipped = min(abs(a_fwd + a_rev), abs(abs(a_fwd + a_rev) - area0))
    assert flipped < max(1e-3 * max(abs(a_fwd), 1.0), 1.0)
    assert abs(per_fwd - per_rev) < 1e-3

"""Unit coverage for registry ops with no gie fixtures (sch) and smoke
roundtrips for batch-4 additions."""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark.plans.pipeline import compile_pipeline


def test_sch_peg_origin_and_roundtrip():
    p = compile_pipeline("+proj=sch +plat_0=30 +plon_0=50 +phdg_0=70 +ellps=WGS84")
    x, y, z, _ = p.fwd(np.array([np.radians(50.0)]), np.array([np.radians(30.0)]),
                       np.array([0.0]))
    # the peg point maps to (s, c) = (0, 0) at h = h0
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6 and abs(z[0]) < 1e-6
    lam = np.radians(np.array([49.0, 52.0, 50.5]))
    phi = np.radians(np.array([29.0, 31.5, 30.2]))
    h = np.array([100.0, 5.0, -20.0])
    X, Y, Z, _ = p.fwd(lam, phi, h.copy())
    l2, p2, h2, _ = p.inv(X, Y, Z)
    np.testing.assert_allclose(l2, lam, atol=1e-12)
    np.testing.assert_allclose(p2, phi, atol=1e-12)
    np.testing.assert_allclose(h2, h, atol=1e-6)


def test_sch_requires_peg():
    with pytest.raises(ValueError):
        compile_pipeline("+proj=sch +ellps=WGS84")


@pytest.mark.parametrize("spec,min_good", [
    ("+proj=ob_tran +o_proj=moll +o_lon_p=40 +o_lat_p=50 +lon_0=60 +R=6400000", 1.0),
    # imw_p: the reference's alternating-secant inverse can diverge far
    # outside the lat_1..lat_2 band; bipc roundtrips can break exactly on
    # the Azba branch seam (both inherited semantics, not bugs here).
    ("+proj=imw_p +lat_1=15 +lat_2=40 +ellps=GRS80", 0.95),
    ("+proj=bipc +ellps=GRS80", 0.95),
    ("+proj=qsc +lon_0=100 +ellps=GRS80", 1.0),   # right cube face
    ("+proj=qsc +lat_0=90 +ellps=GRS80", 1.0),    # top cube face
    ("+proj=rhealpix +north_square=1 +south_square=2 +R=6370997", 1.0),
    ("+proj=lsat +lsat=2 +path=12 +ellps=GRS80", 1.0),
    ("+proj=adams_ws2 +R=6370997", 1.0),
])
def test_batch4_roundtrips(spec, min_good):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-25, 25, 50)
    lat = rng.uniform(-55, 55, 50)
    p = compile_pipeline(spec)
    x, y, _, _ = p.fwd_deg(lon, lat)
    lon2, lat2, _, _ = p.inv_deg(x, y)
    good = (np.isclose(lon2, lon, atol=1e-6)
            & np.isclose(lat2, lat, atol=1e-6))
    assert good.mean() >= min_good, f"{good.sum()}/{good.size} roundtrip"


# Horner self-test constants from the reference's own unit suite
# (/root/reference/test/unit/gie_self_tests.cpp:802-960): TC32 -> UTM32
# real polynomial and "System Storebaelt" complex polynomial.
TC32 = (
    "+proj=horner +ellps=intl +range=500000 "
    "+fwd_origin=877605.269066,6125810.306769 "
    "+inv_origin=877605.760036,6125811.281773 +deg=4 "
    "+fwd_v=6.1258112678e+06,9.9999971567e-01,1.5372750011e-10,5.9300860915e-15,2.2609497633e-19,4.3188227445e-05,2.8225130416e-10,7.8740007114e-16,-1.7453997279e-19,1.6877465415e-10,-1.1234649773e-14,-1.7042333358e-18,-7.9303467953e-15,-5.2906832535e-19,3.9984284847e-19 "
    "+fwd_u=8.7760574982e+05,9.9999752475e-01,2.8817299305e-10,5.5641310680e-15,-1.5544700949e-18,-4.1357045890e-05,4.2106213519e-11,2.8525551629e-14,-1.9107771273e-18,3.3615590093e-10,2.4380247154e-14,-2.0241230315e-18,1.2429019719e-15,5.3886155968e-19,-1.0167505000e-18 "
    "+inv_v=6.1258103208e+06,1.0000002826e+00,-1.5372762184e-10,-5.9304261011e-15,-2.2612705361e-19,-4.3188331419e-05,-2.8225549995e-10,-7.8529116371e-16,1.7476576773e-19,-1.6875687989e-10,1.1236475299e-14,1.7042518057e-18,7.9300735257e-15,5.2881862699e-19,-3.9990736798e-19 "
    "+inv_u=8.7760527928e+05,1.0000024735e+00,-2.8817540032e-10,-5.5627059451e-15,1.5543637570e-18,4.1357152105e-05,-4.2114813612e-11,-2.8523713454e-14,1.9109017837e-18,-3.3616407783e-10,-2.4382678126e-14,2.0245020199e-18,-1.2441377565e-15,-5.3885232238e-19,1.0167203661e-18"
)

SB = (
    "+proj=horner +ellps=intl +range=500000 "
    "+fwd_origin=4.94690026817276e+05,6.13342113183056e+06 "
    "+inv_origin=6.19480258923588e+05,6.13258568148837e+06 +deg=3 "
    "+fwd_c=6.13258562111350e+06,6.19480105709997e+05,9.99378966275206e-01,-2.82153291753490e-02,-2.27089979140026e-10,-1.77019590701470e-09,1.08522286274070e-14,2.11430298751604e-15 "
    "+inv_c=6.13342118787027e+06,4.94690181709311e+05,9.99824464710368e-01,2.82279070814774e-02,7.66123542220864e-11,1.78425334628927e-09,-1.05584823306400e-14,-3.32554258683744e-15"
)


def test_horner_tc32_roundtrip():
    p = compile_pipeline(TC32)
    u = np.array([878354.8539])
    v = np.array([6125305.4245])
    x, y, _, _ = p.fwd(u, v, None, None)
    u2, v2, _, _ = p.inv(x, y, None, None)
    assert np.hypot(u2[0] - u[0], v2[0] - v[0]) < 0.01


def test_horner_storebaelt_complex():
    p = compile_pipeline(SB)
    # utm32_ed50(620000, 6130000) = sb_ed50(495136.8544, 6130821.2945)
    x, y, _, _ = p.fwd(np.array([495136.8544]), np.array([6130821.2945]),
                       None, None)
    assert np.hypot(x[0] - 620000.0, y[0] - 6130000.0) < 0.001
    u, v, _, _ = p.inv(np.array([620000.0]), np.array([6130000.0]), None, None)
    assert np.hypot(u[0] - 495136.8544, v[0] - 6130821.2945) < 0.001


def test_horner_iterative_inverse_fwd_only():
    # the reference's fwd-only variant widens +range to 1e7: the iterative
    # inverse range-checks the RAW coordinates (gie_self_tests.cpp:898-905)
    spec = TC32.split(" +inv_v=")[0].replace(
        "+inv_origin=877605.760036,6125811.281773 ", "").replace(
        "+range=500000", "+range=10000000")
    p = compile_pipeline(spec + " ")
    u = np.array([878354.8539])
    v = np.array([6125305.4245])
    x, y, _, _ = p.fwd(u, v, None, None)
    u2, v2, _, _ = p.inv(x, y, None, None)
    assert np.hypot(u2[0] - u[0], v2[0] - v[0]) < 0.01


def test_horner_complex_iterative_inverse_fwd_only():
    spec = SB.split(" +inv_c=")[0].replace(
        "+inv_origin=6.19480258923588e+05,6.13258568148837e+06 ", "").replace(
        "+range=500000", "+range=10000000")
    p = compile_pipeline(spec)
    a_u, a_v = 495136.8544, 6130821.2945
    x, y, _, _ = p.fwd(np.array([a_u]), np.array([a_v]), None, None)
    u2, v2, _, _ = p.inv(x, y, None, None)
    assert np.hypot(u2[0] - a_u, v2[0] - a_v) < 0.01


def test_horner_hatt_to_ggrs():
    spec = ("+proj=horner +ellps=bessel +fwd_origin=0.0,0.0 +deg=2 "
            "+range=10000000 "
            "+fwd_u=370552.68,0.9997155,-1.08e-09,0.0175123,2.04e-09,1.63e-09 "
            "+fwd_v=4511927.23,0.9996979,5.60e-10,-0.0174755,-1.65e-09,-6.50e-10")
    p = compile_pipeline(spec)
    x, y, _, _ = p.fwd(np.array([-10157.950]), np.array([-21121.093]),
                       None, None)
    assert np.hypot(x[0] - 360028.794, y[0] - 4490989.862) < 0.1


def test_trans_bounds_utm():
    from proj_spark.plans.bounds import trans_bounds

    x0, y0, x1, y1 = trans_bounds("+proj=utm +zone=32 +ellps=GRS80",
                                  6.0, 50.0, 12.0, 56.0)
    # envelope must contain the corner images and reflect edge curvature:
    # a dense grid of interior points stays inside
    import numpy as np

    from proj_spark.plans.pipeline import compile_pipeline
    p = compile_pipeline("+proj=utm +zone=32 +ellps=GRS80")
    gx, gy = np.meshgrid(np.linspace(6, 12, 40), np.linspace(50, 56, 40))
    X, Y, _, _ = p.fwd_deg(gx.ravel(), gy.ravel())
    assert x0 <= X.min() and X.max() <= x1
    assert y0 <= Y.min() + 1e-6 and Y.max() <= y1 + 1e-6
    # northern edge bulges north of the corner images in UTM
    Xc, Yc, _, _ = p.fwd_deg(np.array([6.0, 12.0]), np.array([56.0, 56.0]))
    assert y1 > Yc.max() - 1e-9


def test_trans_bounds_inverse_merc():
    from proj_spark.plans.bounds import trans_bounds

    x0, y0, x1, y1 = trans_bounds(
        "+proj=merc +ellps=WGS84", -19500000.0, 0.0, 19500000.0, 1000000.0,
        direction="inv")
    assert abs(x0 + 175.171480403) < 1e-6 and abs(x1 - 175.171480403) < 1e-6
    assert abs(y0) < 1e-9 and 8.9 < y1 < 9.1


def test_trans_bounds_antimeridian_wrap():
    from proj_spark.plans.bounds import trans_bounds

    # rotated-pole output crossing the antimeridian: ob_tran o_lon_p moves
    # the seam; a small rectangle maps to lons near +-180 -> the wrap logic
    # must yield a tight [~179, ~-179]-style span, not a 358-degree one
    x0, y0, x1, y1 = trans_bounds(
        "+proj=longlat +ellps=WGS84", 179.0, -5.0, 181.0, 5.0)
    assert x1 - x0 <= 2.0 + 1e-9


def test_crs_to_crs_utm_to_webmerc():
    """4D-API gie semantics: init=epsg:26915 inverse -> epsg:3857 forward
    equals the hand-built pipeline the corpus tests."""
    import numpy as np

    from proj_spark.plans.pipeline import compile_crs_to_crs, compile_pipeline

    p = compile_crs_to_crs("EPSG:26915", "EPSG:3857")
    ref = compile_pipeline(
        "proj=pipeline step init=epsg:26915 inv step init=epsg:3857")
    x = np.array([500000.0, 482000.0])
    y = np.array([4649776.0, 4700000.0])
    X1, Y1, _, _ = p.fwd(x.copy(), y.copy(), None, None)
    X2, Y2, _, _ = ref.fwd(x.copy(), y.copy(), None, None)
    assert np.allclose(X1, X2, atol=1e-9) and np.allclose(Y1, Y2, atol=1e-9)
    # roundtrip through the reverse planner
    q = compile_crs_to_crs("EPSG:3857", "EPSG:26915")
    xb, yb, _, _ = q.fwd(X1.copy(), Y1.copy(), None, None)
    assert np.allclose(xb, x, atol=1e-6) and np.allclose(yb, y, atol=1e-6)


def test_crs_to_crs_datum_path():
    """potsdam (BETA2007 nadgrids) -> WGS84 longlat through the planner
    matches the DHDN corpus pair."""
    import numpy as np

    from proj_spark.plans.pipeline import compile_crs_to_crs

    p = compile_crs_to_crs("+proj=latlong +datum=potsdam",
                           "+proj=longlat +ellps=WGS84")
    lam, phi, _, _ = p.fwd_deg(np.array([7.483333333333]),
                               np.array([53.5]))
    assert abs(lam[0] - 7.482506019176) < 1e-8
    assert abs(phi[0] - 53.498461143331) < 1e-8

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

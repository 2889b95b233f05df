"""Unit tests for the EPSG registry resolver (sources/epsg.py) beyond
the GIGS end-to-end coverage in test_kernels_gie."""

import numpy as np
import pytest

from proj_spark.sources.epsg import (_sexagesimal_to_deg, epsg_to_proj)


def test_sexagesimal_conversion():
    # 50.4752134 = 50 deg 47' 52.134"
    assert abs(_sexagesimal_to_deg(50.4752134)
               - (50 + 47 / 60 + 52.134 / 3600)) < 1e-12
    assert abs(_sexagesimal_to_deg(-12.3045)
               + (12 + 30 / 60 + 45 / 3600)) < 1e-12
    assert _sexagesimal_to_deg(0.0) == 0.0


def test_geographic_and_geocentric():
    assert epsg_to_proj(4326) == "+proj=longlat +a=6378137.0 +rf=298.257223563"
    assert epsg_to_proj(4978).startswith("+proj=geocent +a=6378137.0")
    # Paris prime meridian carried as +pm
    assert "+pm=2.3372291" in epsg_to_proj(4807)


def test_projected_variants():
    s = epsg_to_proj(32631)  # WGS84 / UTM 31N as a plain TM conversion
    assert "+proj=tmerc" in s and "+x_0=500000.0" in s and "+k=0.9996" in s
    s = epsg_to_proj(2049)   # Hartebeesthoek Lo21: TM South Orientated
    assert "+axis=wsu" in s
    s = epsg_to_proj(2921)   # NAD83(HARN) Utah North (ft): axis units
    assert "+to_meter=0.3048" in s
    s = epsg_to_proj(23700)  # EOV: degenerate HOM-B == somerc
    assert "+proj=somerc" in s
    s = epsg_to_proj(31370)  # Belgian Lambert 72: 29.2985" correction
    assert "+proj=lcc" in s


def test_unknown_codes_raise():
    with pytest.raises(KeyError):
        epsg_to_proj(99999999)


def test_init_roundtrip_through_pipeline():
    from proj_spark.plans.pipeline import compile_pipeline

    p = compile_pipeline("+init=epsg:32633")  # UTM 33N
    q = compile_pipeline("+proj=utm +zone=33 +ellps=WGS84")
    lon = np.array([15.0, 12.3])
    lat = np.array([55.0, 48.9])
    X1, Y1, _, _ = p.fwd_deg(lon.copy(), lat.copy())
    X2, Y2, _, _ = q.fwd_deg(lon.copy(), lat.copy())
    np.testing.assert_allclose(X1, X2, atol=1e-6)
    np.testing.assert_allclose(Y1, Y2, atol=1e-6)


def test_compound_crs_resolution():
    """EPSG:9707 (WGS 84 + EGM96 height) resolves to the horizontal spec
    plus +geoidgrids from the registry's geoid-model rows (CT 10084/9708,
    param 8666) expanded through grid_alternatives (reference
    data/sql/compound_crs.sql + grid_alternatives.sql)."""
    s = epsg_to_proj("9707")
    assert s.startswith("+proj=longlat")
    assert "+geoidgrids=" in s
    assert "@us_nga_egm96_15.tif" in s and "@egm96_15.gtx" in s
    # the 'HHHH+VVVV' pair spelling resolves identically
    assert epsg_to_proj("4326+5773") == s


def test_compound_crs_transform_matches_vgridshift():
    """Orthometric->ellipsoidal through the compound CRS equals a direct
    +proj=vgridshift over the same (bundled downsampled EGM96) grid, and
    the inverse roundtrips."""
    from proj_spark.plans.pipeline import compile_crs_to_crs, compile_pipeline

    p = compile_crs_to_crs("EPSG:9707", "EPSG:4326")
    lon = np.array([2.0, -70.0, 151.0])
    lat = np.array([49.0, -33.0, -33.9])
    h = np.zeros(3)
    x, y, z, _ = p.fwd_deg(lon, lat, h)
    v = compile_pipeline("+proj=vgridshift +grids=egm96_15.gtx "
                         "+multiplier=1.0")
    _, _, n, _ = v.fwd(np.radians(lon), np.radians(lat), np.zeros(3))
    np.testing.assert_allclose(z, n, atol=1e-9)   # h = H + N at H=0
    xi, yi, zi, _ = p.inv_deg(x, y, z)
    np.testing.assert_allclose(zi, h, atol=1e-9)
    np.testing.assert_allclose(xi, lon, atol=1e-12)
    np.testing.assert_allclose(yi, lat, atol=1e-12)


def test_compound_crs_vertical_ft_units():
    """A compound whose vertical axis is not metres gets +vto_meter
    (EPSG:6130 GCVD54 height (ft), international feet)."""
    s = epsg_to_proj("4326+6130")
    assert "+vto_meter=0.3048" in s


def test_vertical_only_code_raises():
    with pytest.raises(NotImplementedError):
        epsg_to_proj("5773")
    with pytest.raises(NotImplementedError):
        # compound with no bundled geoid model for its vertical part
        epsg_to_proj("3902")

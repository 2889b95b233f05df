"""Planetary (IAU_2015) WKT2 + PROJJSON export/import (round 5).

The reference expresses planetary specifics in text CRSs as: a
GEODCRS with CS[spherical,2] for ocentric CRSs (io.cpp cs subtype),
west-direction axes for ographic CRSs on retrograde bodies, a
PROJCRS-over-ocentric base identified by its IAU id (WKT2 base nodes
carry no CS — reference test_crs.cpp:3430 Mercury ocentric), and
PROJ-authority named methods (SINUSOIDAL/MOLLWEIDE/ROBINSON)."""

import math

import numpy as np


def _pt(spec):
    from proj_spark.plans.pipeline import compile_pipeline

    p = compile_pipeline(spec)
    x, y, _, _ = p.fwd_deg(np.array([17.25]), np.array([33.5]))
    return (float(x[0]), float(y[0]))


def _close(got, want, rel=1e-5):
    return all((math.isnan(g) and math.isnan(w)) or
               abs(g - w) <= rel * max(1.0, abs(w))
               for g, w in zip(got, want))


def test_iau_full_wkt2_and_projjson_roundtrip():
    """Every IAU_2015 CRS exports WKT2 AND PROJJSON that round-trip
    numerically through the repo's own independent readers."""
    from proj_spark.sources.epsg import _load, epsg_to_proj
    from proj_spark.sources.projjson import projjson_to_proj
    from proj_spark.sources.wkt import wkt_to_proj
    from proj_spark.sources.wkt_out import epsg_to_projjson, epsg_to_wkt2

    db = _load()
    codes = [k for t in ("geodetic_crs", "projected_crs")
             for k in db[t] if k.startswith("IAU_2015:")]
    assert len(codes) > 2000
    for c in codes:
        want = _pt(epsg_to_proj(c))
        assert _close(_pt(wkt_to_proj(epsg_to_wkt2(c))), want), c
        assert _close(_pt(projjson_to_proj(epsg_to_projjson(c))), want), c


def test_ocentric_wkt_shape():
    """Mars ocentric (49902): GEODCRS + CS[spherical,2] + planetocentric
    axes + IAU_2015 id; reading it back restores +geoc."""
    from proj_spark.sources.wkt import wkt_to_proj
    from proj_spark.sources.wkt_out import epsg_to_wkt2

    w = epsg_to_wkt2("IAU_2015:49902")
    assert w.startswith("GEODCRS[")
    assert "CS[spherical,2]" in w
    assert "planetocentric latitude" in w.lower()
    assert 'ID["IAU_2015",49902]' in w
    assert "+geoc" in wkt_to_proj(w)


def test_projected_over_ocentric_base_id_recovery():
    """Mercury ocentric eqc (19912): the base carries no CS node — the
    reader recovers the spherical base through the IAU id, accepting
    BOTH the bundled 'IAU_2015' spelling and the reference's
    'ID[\"IAU\",code,2015]' edition spelling (test_crs.cpp:3430)."""
    from proj_spark.sources.epsg import epsg_to_proj
    from proj_spark.sources.wkt import wkt_to_proj
    from proj_spark.sources.wkt_out import epsg_to_wkt2

    w = epsg_to_wkt2("IAU_2015:19912")
    assert "BASEGEODCRS" in w and 'ID["IAU_2015",19902]' in w
    s = wkt_to_proj(w)
    assert "+geoc" in s
    assert _close(_pt(s), _pt(epsg_to_proj("IAU_2015:19912")))
    # the reference's own id spelling: authority IAU, edition 2015
    w2 = w.replace('ID["IAU_2015",19902]', 'ID["IAU",19902,2015]')
    assert "+geoc" in wkt_to_proj(w2)


def test_proj_named_method_id():
    """Sinusoidal conversions carry ID["PROJ","SINUSOIDAL"]; both the
    id and the bare method name resolve on read."""
    from proj_spark.sources.wkt import wkt_to_proj
    from proj_spark.sources.wkt_out import epsg_to_wkt2

    w = epsg_to_wkt2("IAU_2015:49920")
    assert 'METHOD["Sinusoidal",ID["PROJ","SINUSOIDAL"]]' in w
    assert "+proj=sinu" in wkt_to_proj(w)
    # name-only resolution (no ID node)
    w_no_id = w.replace(',ID["PROJ","SINUSOIDAL"]', "")
    assert "+proj=sinu" in wkt_to_proj(w_no_id)


def test_west_ographic_axes_roundtrip():
    """Mars ographic (49901): west-direction longitude axis in both
    text forms restores +axis=wnu."""
    from proj_spark.sources.projjson import projjson_to_proj
    from proj_spark.sources.wkt import wkt_to_proj
    from proj_spark.sources.wkt_out import epsg_to_projjson, epsg_to_wkt2

    w = epsg_to_wkt2("IAU_2015:49901")
    assert ",west," in w
    assert "+axis=wnu" in wkt_to_proj(w)
    j = epsg_to_projjson("IAU_2015:49901")
    assert '"direction": "west"' in j
    assert "+axis=wnu" in projjson_to_proj(j)


def test_iau_wkt1_gdal_west_and_refusals():
    """WKT1-GDAL expresses west axes with AXIS nodes (round-trips
    +axis=wnu); ocentric CRSs and the axis-less ESRI dialect refuse
    explicitly — silent sign flips are the failure mode under test."""
    import pytest

    from proj_spark.sources.wkt import wkt_to_proj
    from proj_spark.sources.wkt_out import epsg_to_wkt1

    w = epsg_to_wkt1("IAU_2015:49901", "GDAL")
    assert 'AXIS["Longitude",WEST]' in w
    assert "+axis=wnu" in wkt_to_proj(w)
    # west-north projected cs (Mercury ographic eqc)
    wp = epsg_to_wkt1("IAU_2015:19911", "GDAL")
    assert 'AXIS["Westing",WEST]' in wp
    assert "+axis=wnu" in wkt_to_proj(wp)
    with pytest.raises(NotImplementedError):
        epsg_to_wkt1("IAU_2015:49902", "GDAL")    # ocentric
    with pytest.raises(NotImplementedError):
        epsg_to_wkt1("IAU_2015:49901", "ESRI")    # west in ESRI

"""Per-point candidate-operation dispatch (plans.dispatch) vs the
reference's proj_trans alternative-operation semantics (4D_api.cpp
:217-360 selection, :421-535 retry + gridless fallback)."""

import numpy as np
import pytest

from proj_spark.plans.dispatch import (
    Candidate, CandidateDispatch, candidate, crs_to_crs_dispatch)
from proj_spark.plans.pipeline import compile_pipeline
from proj_spark.sources.ntv2 import synth_grid, write_gsb


@pytest.fixture(scope="module")
def grid_path(tmp_path_factory):
    # synth grid covers lon [0,10], lat [40,45]
    g = synth_grid(west_deg=0.0, south_deg=40.0, res_deg=0.5,
                   width=21, height=11, name="DISP")
    p = tmp_path_factory.mktemp("disp") / "disp.gsb"
    write_gsb(str(p), [g])
    return str(p)


def test_bbox_dispatch_retry_and_fallback(grid_path):
    """The reference's ntv2_0.gsb example (4D_api.cpp:431-437): a point
    inside the grid candidate's area-of-use bbox but outside the actual
    grid gets an invalid result, is retried, and lands on the Helmert-tier
    fallback. Points outside the bbox skip the grid candidate entirely."""
    disp = CandidateDispatch([
        # area-of-use deliberately LARGER than the grid extent
        candidate(f"+proj=hgridshift +grids={grid_path} +ellps=GRS80",
                  src_bbox=(-5.0, 35.0, 15.0, 55.0), accuracy=0.05,
                  name="grid"),
        candidate("+proj=geogoffset +dlon=3600 +ellps=GRS80",
                  accuracy=2.0, name="helmert-tier"),
    ])
    #         in-grid        in-bbox-not-grid   out-of-bbox
    lon = np.array([5.0,     -3.0,              120.0])
    lat = np.array([42.0,    50.0,              10.0])
    x, y, _, _ = disp.fwd_deg(lon, lat)
    # in-grid point: grid shift applied (value != +1 deg offset)
    direct = compile_pipeline(
        f"+proj=hgridshift +grids={grid_path} +ellps=GRS80")
    gx, gy, _, _ = direct.fwd_deg(lon[:1], lat[:1])
    assert np.isclose(x[0], gx[0]) and np.isclose(y[0], gy[0])
    assert abs(x[0] - 5.0) < 0.01 and abs(x[0] - 5.0) > 0.0  # real shift
    # retry case: geogoffset +dlon=3600 arcsec == +1 degree
    assert np.isclose(x[1], -2.0) and np.isclose(y[1], 50.0)
    # out-of-bbox case: fallback candidate directly
    assert np.isclose(x[2], 121.0) and np.isclose(y[2], 10.0)


def test_ranking_accuracy_then_area():
    """Better accuracy wins; equal accuracy -> smaller pseudo-area wins;
    unknown accuracy (<0) ranks after every known one."""
    mk = lambda dlon, **kw: candidate(
        f"+proj=geogoffset +dlon={dlon} +ellps=GRS80", **kw)
    disp = CandidateDispatch([
        mk(7200, src_bbox=(-180, -90, 180, 90), accuracy=-1.0),   # unknown
        mk(3600, src_bbox=(-20, -20, 20, 20), accuracy=1.0),      # coarse
        mk(1800, src_bbox=(-10, -10, 10, 10), accuracy=1.0),      # finer area
        mk(900, src_bbox=(-5, -5, 5, 5), accuracy=5.0),           # worse acc
    ])
    lon = np.array([0.0, 15.0, 60.0])
    lat = np.array([0.0, 15.0, 0.0])
    x, _, _, _ = disp.fwd_deg(lon, lat)
    assert np.isclose(x[0], 0.5)   # smallest-area among accuracy=1.0
    assert np.isclose(x[1], 16.0)  # only the coarse 1.0-acc bbox matches
    assert np.isclose(x[2], 62.0)  # only the unknown-accuracy world op


def test_no_gridless_candidate_yields_nan(grid_path):
    disp = CandidateDispatch([
        candidate(f"+proj=hgridshift +grids={grid_path} +ellps=GRS80",
                  src_bbox=(0.0, 40.0, 10.0, 45.0), accuracy=0.05),
    ])
    x, y, _, _ = disp.fwd_deg(np.array([120.0]), np.array([10.0]))
    assert np.isnan(x[0]) and np.isnan(y[0])


def test_inverse_uses_dst_bbox():
    disp = CandidateDispatch([
        candidate("+proj=geogoffset +dlon=3600 +ellps=GRS80",
                  dst_bbox=(-10, -10, 10, 10), accuracy=1.0),
        candidate("+proj=geogoffset +dlon=-3600 +ellps=GRS80",
                  accuracy=2.0),
    ])
    # inverse of +1deg offset: x-1; point (5,5) in dst bbox -> first op
    x, _, _, _ = disp.inv_deg(np.array([5.0, 50.0]), np.array([5.0, 5.0]))
    assert np.isclose(x[0], 4.0)
    assert np.isclose(x[1], 51.0)  # second candidate (inverse of -1deg)


def test_crs_to_crs_dispatch_mixed_region(grid_path):
    """cs2cs-style: same CRS pair, two datum-op candidates (regional grid
    vs global Helmert); a mixed-region point set splits per point."""
    disp = crs_to_crs_dispatch(
        [(f"+nadgrids={grid_path}",
          {"src_bbox": (-5.0, 35.0, 15.0, 55.0), "accuracy": 0.05}),
         ("+towgs84=100,0,0", {"accuracy": 2.0})],
        src="+proj=latlong +ellps=GRS80",
        dst="+proj=latlong +datum=WGS84",
    )
    lon = np.array([5.0, 120.0])
    lat = np.array([42.0, 10.0])
    x, y, _, _ = disp.fwd_deg(lon, lat)
    ref_grid = compile_pipeline(
        f"+proj=hgridshift +grids={grid_path} +ellps=GRS80")
    gx, gy, _, _ = ref_grid.fwd_deg(lon[:1], lat[:1])
    assert np.isclose(x[0], gx[0], atol=1e-9)
    # towgs84 100m x-offset at lat 10: roughly +100m/(111km*cos10) deg shift
    assert 120.0 - x[1] > 1e-4 and abs(y[1] - 10.0) < 1e-3
    assert np.isfinite(x).all()


# ------------------------------------------------- registry-driven lists

def test_epsg_registry_candidates_ed50():
    """ED50 (EPSG:4230) -> WGS84: the registry yields regional Helmert
    candidates with bbox + accuracy; per-point dispatch picks regionally
    and falls back to ballpark outside every area of use."""
    from proj_spark.sources.epsg_ops import (candidate_operations,
                                             crs_to_crs_epsg_dispatch)

    cands = candidate_operations("EPSG:4230", "EPSG:4326")
    assert len(cands) > 5
    assert cands[-1].name == "ballpark"
    real = [c for c in cands if c.name != "ballpark"]
    assert all(c.src_bbox is not None for c in real)
    assert all(c.accuracy > 0 for c in real)

    disp = crs_to_crs_epsg_dispatch("EPSG:4230", "EPSG:4326")
    lon = np.array([-3.7, -155.0])
    lat = np.array([40.4, 20.0])
    x, y, _, _ = disp.fwd_deg(lon, lat)
    # Madrid: ED50->WGS84 shift is ~ -4.4"/-4.2" (about 100-130 m SW)
    assert -0.0020 < x[0] - lon[0] < -0.0008
    assert -0.0020 < y[0] - lat[0] < -0.0008
    # Hawaii: outside every ED50 area of use -> ballpark no-op
    assert x[1] == lon[1] and y[1] == lat[1]


def test_epsg_registry_helmert_parity_dhdn():
    """EPSG:1777 (DHDN->WGS84, position vector 598.1,73.7,418.2,
    0.202,0.045,-2.455,6.7) must match the engine's own +towgs84 chain
    on a German point at sub-mm level."""
    from proj_spark.plans.pipeline import compile_crs_to_crs
    from proj_spark.sources.epsg_ops import candidate_operations

    cands = candidate_operations("EPSG:4314", "EPSG:4326")
    op = next(c for c in cands if "EPSG:1777" in c.name)
    lon = np.array([9.0, 13.4])
    lat = np.array([51.0, 52.5])
    gx, gy, _, _ = op.pipeline.fwd_deg(lon, lat)
    ref = compile_crs_to_crs(
        "+proj=latlong +ellps=bessel "
        "+towgs84=598.1,73.7,418.2,0.202,0.045,-2.455,6.7",
        "+proj=latlong +datum=WGS84")
    wx, wy, _, _ = ref.fwd_deg(lon, lat)
    np.testing.assert_allclose(gx, wx, atol=1e-9)
    np.testing.assert_allclose(gy, wy, atol=1e-9)


def test_epsg_registry_grid_ops_skipped_when_missing():
    """NAD27->WGS84 is grid-dominated in the registry (NADCON/NTv2);
    without the grid files those candidates are dropped (reference
    skipNonInstantiable) and the dispatch still resolves every point via
    the remaining Helmert/ballpark tiers."""
    from proj_spark.sources.epsg_ops import crs_to_crs_epsg_dispatch

    disp = crs_to_crs_epsg_dispatch("EPSG:4267", "EPSG:4326")
    assert all(not c.needs_grids for c in disp.candidates)
    x, y, _, _ = disp.fwd_deg(np.array([-100.0]), np.array([40.0]))
    assert np.isfinite(x[0]) and np.isfinite(y[0])


def test_epsg_registry_coordinate_frame_sign():
    """A 9607 (coordinate frame) row must produce the same result as the
    equivalent position-vector parameters with negated rotations
    (EPSG:1309 DHDN->ETRS89: -1.04,-0.35,3.08 CF == 1.04,0.35,-3.08 PV)."""
    from proj_spark.plans.pipeline import compile_crs_to_crs
    from proj_spark.sources.epsg_ops import candidate_operations

    cands = candidate_operations("EPSG:4314", "EPSG:4258")
    op = next(c for c in cands if "EPSG:1309" in c.name)
    lon = np.array([10.0])
    lat = np.array([50.0])
    gx, gy, _, _ = op.pipeline.fwd_deg(lon, lat)
    ref = compile_crs_to_crs(
        "+proj=latlong +ellps=bessel "
        "+towgs84=582.0,105.0,414.0,1.04,0.35,-3.08,8.3",
        "+proj=latlong +ellps=GRS80")
    wx, wy, _, _ = ref.fwd_deg(lon, lat)
    np.testing.assert_allclose(gx, wx, atol=1e-9)
    np.testing.assert_allclose(gy, wy, atol=1e-9)


def test_epsg_registry_kinematic_itrf2014_gda2020():
    """ITRF2014 (EPSG:9000) -> GDA2020 (EPSG:7844) resolves to the
    time-dependent coordinate-frame row EPSG:8049 (method 1056, published
    between the geocentric CRSs 7789->7842 — the datum bridge) and matches
    the reference's kinematic anchor (test/gie/GDA.gie:66-75, tol 40 um)
    at coordinate epoch 2018.0."""
    from proj_spark.sources.epsg_ops import candidate_operations
    from proj_spark.plans.pipeline import compile_pipeline

    cands = candidate_operations("EPSG:9000", "EPSG:7844")
    op = next(c for c in cands if "EPSG:8049" in c.name)
    assert op.meta["method"] == "1056"
    # rates: mas/yr registry columns -> arcsec/yr proj params
    assert abs(op.meta["drx"] - 0.00150379) < 1e-12
    assert abs(op.meta["dry"] - 0.00118346) < 1e-12
    assert abs(op.meta["drz"] - 0.00120716) < 1e-12
    assert op.meta["t_epoch"] == 2020.0

    # GDA.gie geocentric anchor, run through the full geographic pipeline
    acc = np.array([-4052052.6588]), np.array([4212835.9938]), \
        np.array([-2545104.6946])
    exp = np.array([-4052052.7373, 4212835.9835, -2545104.5867])
    t = np.array([2018.0])
    inv_cart = compile_pipeline("+proj=pipeline +step +inv +proj=cart "
                                "+ellps=GRS80")
    fwd_cart = compile_pipeline("+proj=pipeline +step +proj=cart "
                                "+ellps=GRS80")
    lon, lat, h, _ = inv_cart.fwd(*acc, t)
    x, y, z, _ = op.pipeline.fwd_deg(np.degrees(lon), np.degrees(lat), h, t)
    X, Y, Z, _ = fwd_cart.fwd(np.radians(x), np.radians(y), z, t)
    got = np.array([X[0], Y[0], Z[0]])
    np.testing.assert_allclose(got, exp, atol=4e-5)


def test_epsg_registry_time_dep_pv_units():
    """EPSG:7790 ITRF2008->ITRF2014 (method 1053, PV, geocentric domain
    5332->7789) is found under the geog2D pair 8999->9000 via the datum
    bridge; mm / mas / ppb registry units land as m / arcsec / ppm with
    per-year rates."""
    from proj_spark.sources.epsg_ops import candidate_operations

    cands = candidate_operations("8999", "9000")
    op = next(c for c in cands if "EPSG:7790" in c.name)
    m = op.meta
    assert m["method"] == "1053"
    assert "+convention=position_vector" in op.pipeline.spec
    assert abs(m["tx"] - (-0.0016)) < 1e-12      # -1.6 mm
    assert abs(m["ds"] - 0.00002) < 1e-15        # 0.02 ppb -> ppm
    assert abs(m["dtz"] - 0.0001) < 1e-15        # 0.1 mm/yr -> m/yr
    assert abs(m["dds"] - (-0.00003)) < 1e-15    # -0.03 ppb/yr -> ppm/yr
    assert m["t_epoch"] == 2010.0


def test_epsg_registry_molodensky_badekas_amersfoort():
    """EPSG:1066 Amersfoort->ETRS89 (method 9636, Molodensky-Badekas CF)
    lowers pivot 3903453.148/368135.313/5012970.306 and microradian
    rotations; parity vs a hand-built +proj=molobadekas pipeline using the
    published arcsec equivalents (1.9848 urad = 0.40939 arcsec etc.)."""
    from proj_spark.sources.epsg_ops import candidate_operations
    from proj_spark.plans.pipeline import compile_pipeline

    cands = candidate_operations("EPSG:4289", "EPSG:4258")
    op = next(c for c in cands if "EPSG:1066" in c.name)
    assert abs(op.meta["px"] - 3903453.148) < 1e-9
    ref = compile_pipeline(
        "+proj=pipeline "
        "+step +proj=cart +ellps=bessel "
        "+step +proj=molobadekas +x=593.032 +y=26.0 +z=478.741 "
        "+rx=0.409394387439237 +ry=-0.359705195614311 +rz=1.86849100345688 "
        "+s=4.0772 +px=3903453.148 +py=368135.313 +pz=5012970.306 "
        "+convention=coordinate_frame "
        "+step +inv +proj=cart +ellps=GRS80")
    lon = np.array([5.387, 6.57])
    lat = np.array([52.156, 53.22])
    gx, gy, _, _ = op.pipeline.fwd_deg(lon, lat)
    wx, wy, _, _ = ref.fwd_deg(lon, lat)
    np.testing.assert_allclose(gx, wx, atol=1e-9)
    np.testing.assert_allclose(gy, wy, atol=1e-9)
    # and the kinematic/static inverse roundtrips
    bx, by, _, _ = op.pipeline.inv_deg(gx, gy)
    np.testing.assert_allclose(bx, lon, atol=1e-9)
    np.testing.assert_allclose(by, lat, atol=1e-9)


def test_concatenated_operation_mgi_ferro():
    """EPSG:3896 'MGI (Ferro) to WGS 84 (2)' — a published 2-step chain
    (9601 longitude rotation EPSG:3895, then 9606 position-vector Helmert
    EPSG:1618) — resolves from concatenated_operation(_step).sql and
    equals the engine's own step-by-step execution (reference
    coordinateoperationfactory.cpp createOperations walks the steps)."""
    from proj_spark.sources.epsg_ops import candidate_operations
    from proj_spark.plans.pipeline import compile_pipeline

    c = next(c for c in candidate_operations("EPSG:4805", "EPSG:4326")
             if "EPSG:3896" in c.name)
    assert c.accuracy == 1.5
    steps = c.meta["steps"]
    assert [s["code"] for s, _ in steps] == ["3895", "1618"]
    assert all(not inv for _, inv in steps)

    lon = np.array([30.0, 32.5, 29.1])   # Ferro-referenced longitudes
    lat = np.array([47.0, 47.9, 46.6])
    gx, gy, _, _ = c.pipeline.fwd_deg(lon, lat)

    # step-by-step: engine-compiled 9601 then the direct 1618 candidate
    rot = compile_pipeline("+proj=geogoffset +dlon=-63600.00000000001 "
                           "+ellps=bessel")
    mx, my, _, _ = rot.fwd_deg(lon, lat)
    helm = next(c for c in candidate_operations("EPSG:4312", "EPSG:4326")
                if "EPSG:1618" in c.name)
    hx, hy, _, _ = helm.pipeline.fwd_deg(mx, my)
    np.testing.assert_allclose(gx, hx, atol=1e-12)
    np.testing.assert_allclose(gy, hy, atol=1e-12)

    # inverse row (WGS84 -> MGI Ferro) roundtrips through the chain
    r = next(c for c in candidate_operations("EPSG:4326", "EPSG:4805")
             if "EPSG:3896" in c.name)
    bx, by, _, _ = r.pipeline.fwd_deg(gx, gy)
    np.testing.assert_allclose(bx, lon, atol=1e-9)
    np.testing.assert_allclose(by, lat, atol=1e-9)


def test_concatenated_operation_coverage():
    """A broad slice of the registry's published chains resolves: every
    chain whose steps lower (helmert / loadable grid / offset methods)
    is indexed; chains with unavailable grids are dropped whole
    (skipNonInstantiable)."""
    from proj_spark.sources.epsg_ops import _ops_by_crs

    ix = _ops_by_crs()["idx"]
    concats = [o for ops in ix.values() for o in ops
               if o["kind"] == "concat"]
    assert len(concats) >= 100
    # chaining invariant: each step's matched end feeds the next
    from proj_spark.sources.epsg_ops import _canon_code
    for op in concats:
        cur = op["src"]
        for sop, inv in op["steps"]:
            a, b = (sop["src"], sop["dst"]) if not inv else (
                sop["dst"], sop["src"])
            assert _canon_code(a) == _canon_code(cur), op["code"]
            cur = b
        assert _canon_code(cur) == _canon_code(op["dst"]), op["code"]


def test_offset_op_tokyo_1892():
    """Direct other_transformation candidates: EPSG:5133 'Tokyo 1892 to
    Tokyo (1)' (9619 geographic2D offsets) resolves between the geog
    pair and applies the published arc-second offsets."""
    from proj_spark.sources.epsg_ops import candidate_operations

    cands = candidate_operations("EPSG:5132", "EPSG:4301")
    op = next(c for c in cands if "EPSG:5133" in c.name)
    lon = np.array([139.0])
    lat = np.array([36.0])
    gx, gy, _, _ = op.pipeline.fwd_deg(lon, lat)
    m = op.meta
    np.testing.assert_allclose(gx, lon + m["dlon"] / 3600.0, atol=1e-12)
    np.testing.assert_allclose(gy, lat + m["dlat"] / 3600.0, atol=1e-12)

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

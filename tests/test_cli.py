"""Tests for the batch coordinate CLI (proj/cct/geod analogue)."""

import io

import numpy as np

from proj_spark.cli import run_cct, run_geod


def _run(fn, argv, text):
    out = io.StringIO()
    rc = fn(argv, io.StringIO(text), out)
    assert rc == 0
    return out.getvalue().splitlines()


def test_cct_forward_matches_pipeline():
    lines = _run(run_cct, ["+proj=utm", "+zone=32", "+ellps=GRS80"],
                 "12 55\n")
    x, y = (float(v) for v in lines[0].split())
    from proj_spark.plans.pipeline import compile_pipeline
    p = compile_pipeline("+proj=utm +zone=32 +ellps=GRS80")
    X, Y, _, _ = p.fwd_deg(np.array([12.0]), np.array([55.0]))
    assert abs(x - X[0]) < 1e-6 and abs(y - Y[0]) < 1e-6


def test_cct_inverse_roundtrip_and_passthrough():
    fwd = _run(run_cct, ["+proj=merc", "+ellps=WGS84"], "10 45\n")
    x, y = (float(v) for v in fwd[0].split())
    inv = _run(run_cct, ["-I", "+proj=merc", "+ellps=WGS84"],
               f"{x} {y}\n# note\njunk line\n")
    lon, lat = (float(v) for v in inv[0].split())
    assert abs(lon - 10) < 1e-9 and abs(lat - 45) < 1e-9
    assert inv[1] == "# note"
    assert inv[2] == "junk line"


def test_cct_4d_pipeline():
    # gie/cct convention: angular lanes presented in degrees either side
    lines = _run(run_cct, ["proj=unitconvert", "xy_in=grad", "xy_out=deg"],
                 "50 50 1 2000\n")
    vals = [float(v) for v in lines[0].split()]
    assert abs(vals[0] - 45.0) < 1e-9 and abs(vals[1] - 45.0) < 1e-9
    assert vals[2] == 1.0 and vals[3] == 2000.0


def test_geod_inverse_jfk_lhr():
    # the canonical GeographicLib example pair
    lines = _run(run_geod, ["-i", "+ellps=WGS84"], "40.6 -73.8 51.6 -0.5\n")
    azi1, azi2, s12 = (float(v) for v in lines[0].split())
    assert abs(s12 - 5551759.400) < 0.01
    assert abs(azi1 - 51.198883) < 1e-5


def test_geod_direct_closes_inverse():
    inv = _run(run_geod, ["-i", "+ellps=WGS84"], "10 20 -30 150\n")
    azi1, _, s12 = (float(v) for v in inv[0].split())
    d = _run(run_geod, ["+ellps=WGS84"], f"10 20 {azi1} {s12}\n")
    lat2, lon2, _ = (float(v) for v in d[0].split())
    assert abs(lat2 - (-30)) < 1e-6 and abs(lon2 - 150) < 1e-6


def test_cs2cs_epsg_pair():
    import io

    from proj_spark.cli import run_cs2cs

    out = io.StringIO()
    rc = run_cs2cs(["EPSG:4326", "EPSG:32633"], io.StringIO("15 55\n"), out)
    assert rc == 0
    x, y = (float(v) for v in out.getvalue().split())
    from proj_spark.plans.pipeline import compile_pipeline
    p = compile_pipeline("+proj=utm +zone=33 +ellps=WGS84")
    X, Y, _, _ = p.fwd_deg(np.array([15.0]), np.array([55.0]))
    assert abs(x - X[0]) < 1e-6 and abs(y - Y[0]) < 1e-6


def test_cs2cs_registry_dispatch():
    """--dispatch: per-point registry candidate selection — a Spanish
    point takes a regional ED50 Helmert op, Hawaii takes the ballpark."""
    import io

    from proj_spark.cli import run_cs2cs

    out = io.StringIO()
    rc = run_cs2cs(["--dispatch", "-d", "7", "EPSG:4230", "EPSG:4326"],
                   io.StringIO("-3.7 40.4\n-155.0 20.0\n"), out)
    assert rc == 0
    lines = out.getvalue().strip().splitlines()
    x0, y0 = (float(v) for v in lines[0].split())
    x1, y1 = (float(v) for v in lines[1].split())
    assert -0.002 < x0 - (-3.7) < -0.0008 and -0.002 < y0 - 40.4 < -0.0008
    assert x1 == -155.0 and y1 == 20.0


def test_projinfo_pair_ranked_candidates():
    """projinfo mode mirrors the reference's candidate-list shapes
    (test/cli/test_projinfo.yaml): count header, per-operation id/name +
    accuracy + area, PROJ string; static selection order with the
    ballpark last."""
    import io as _io

    from proj_spark.cli import run_projinfo

    out = _io.StringIO()
    assert run_projinfo(["-s", "EPSG:4230", "-t", "EPSG:4326"], out) == 0
    lines = out.getvalue().splitlines()
    assert lines[0].startswith("Candidate operations found: ")
    n = int(lines[0].split(": ")[1])
    assert n >= 20
    assert lines[1].startswith("---")
    # first candidate is the best-accuracy, smallest-area Gibraltar op
    assert "Operation No. 1:" in lines[2]
    assert "EPSG:1629" in lines[4] and "1.0 m" in lines[4]
    # accuracies are non-decreasing down the list, ballpark last
    accs = []
    infos = [ln for ln in lines if " m, bbox " in ln or "Ballpark" in ln]
    assert infos[-1].startswith("unknown id, Ballpark")
    for ln in infos[:-1]:
        accs.append(float(ln.split(", ")[-2].split(" m")[0]))
    assert accs == sorted(accs)
    # every non-ballpark candidate prints its pipeline
    assert sum(1 for ln in lines if ln.startswith("+proj=pipeline")) == n - 1


def test_projinfo_single_crs():
    import io as _io

    from proj_spark.cli import run_projinfo

    out = _io.StringIO()
    assert run_projinfo(["EPSG:32632"], out) == 0
    assert "+proj=tmerc" in out.getvalue()
    out = _io.StringIO()
    assert run_projinfo(["EPSG:4326+5773"], out) == 0
    assert "+geoidgrids=" in out.getvalue()

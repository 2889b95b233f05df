"""The gie CLI runner (proj_spark/gie.py) against the reference's own
.gie files — full-file parity, including the commands the extracted-fixture
harness (test_kernels_gie.py) cannot carry: ``expect failure`` domain
edges, ``roundtrip``, ``direction reverse``, HUGE_VAL lanes.

Only quick files run here (the full corpus sweep lives in the CLI; see
COVERAGE.md). builtins.gie alone is 2,408 checks and runs in ~90 s, so it
is capped to the corpus files that finish fast; the unitconvert and
more_builtins files carry the semantics this round fixed (mixed-unit z
classes, singular affine, reverse direction, NaN roundtrips).
"""

from __future__ import annotations

import io
import os

import pytest

REF = "/root/reference/test/gie"

FILES_EXPECT_CLEAN = [
    "axisswap.gie",
    "unitconvert.gie",
    "GDA.gie",
    "more_builtins.gie",
    "ellipsoid.gie",
    "4D-API_cs2cs-style.gie",
    "gridshift.gie",
    "geotiff_grids.gie",
    "deformation.gie",
    "defmodel.gie",
    "tinshift.gie",
]


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference corpus absent")
@pytest.mark.parametrize("fname", FILES_EXPECT_CLEAN)
def test_reference_gie_file_clean(fname):
    from proj_spark.gie import run_gie_text

    path = os.path.join(REF, fname)
    rep = run_gie_text(open(path, errors="replace").read(), name=fname)
    assert rep.total > 0, f"{fname}: no checks executed"
    assert rep.failed == 0, f"{fname}: {rep.failures[:5]}"


GIGS = "/root/reference/test/gigs"


@pytest.mark.skipif(not os.path.isdir(GIGS), reason="GIGS corpus absent")
def test_gigs_corpus_clean():
    """The complete GIGS conformance corpus (all 20 files — the extracted
    fixtures carry the 51xx series; this runs everything, 1,170 checks)."""
    import glob

    from proj_spark.gie import GieReport, run_gie_text

    total = GieReport()
    for path in sorted(glob.glob(os.path.join(GIGS, "*.gie"))):
        total += run_gie_text(open(path, errors="replace").read(), name=path)
    assert total.total >= 1100
    assert total.failed == 0, total.failures[:5]


def test_gie_runner_dsl_semantics():
    """DSL semantics on an inline file: expect failure via NaN, roundtrip,
    reverse direction, HUGE_VAL lanes, tolerance units, comments."""
    from proj_spark.gie import run_gie_text

    text = """
leading prose is ignored (outside the gie region)
<gie>
operation +proj=merc +R=6400000   # comment
tolerance 1 mm
accept 12 55
expect 1340412.8655316 7387101.1430967  # from the engine's own merc
roundtrip 2
direction reverse
accept 1340412.8655316 7387101.1430967
expect 12 55
direction forward
accept 0 91
expect failure errno coord_transfm_invalid_coord
operation +proj=nosuchop
accept 1 2
expect failure
</gie>
"""
    rep = run_gie_text(text, name="inline")
    assert rep.failed == 0, rep.failures
    assert rep.total == 5  # 2 expects + 1 roundtrip + 2 failures


def test_gie_cli_mode(tmp_path, capsys):
    from proj_spark.cli import main

    f = tmp_path / "t.gie"
    f.write_text("<gie>\noperation +proj=utm +zone=32 +ellps=GRS80\n"
                 "tolerance 1 mm\naccept 12 55\n"
                 "expect 691875.6321396608 6098907.825005012\n</gie>\n")
    assert main(["gie", str(f)]) == 0
    out = capsys.readouterr().out
    assert "1 ok" in out and "0 failed" in out

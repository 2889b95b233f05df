"""NRCan auxiliary authority (round 5): data-only nrcan.sql bundled
verbatim (reference data/sql/nrcan.sql). Its 99 rows are
coordinate_metadata entries — a CRS definition (embedded PROJJSON) plus
a coordinate epoch (reference proj_db_table_defs.sql coordinate_metadata;
the CoordinateMetadata objects proj_create returns for NRCAN:* codes) —
and 2 byn geoid-model grid_transformations. The PROJJSON definitions
carry an explicit ``geoid_model`` member, honored over the
vertical-CRS-code lookup (reference io.cpp PROJJSON parser)."""

import math

import numpy as np
import pytest


def test_nrcan_all_99_rows_resolve_with_epoch():
    from proj_spark.sources.epsg import _load, coordinate_metadata

    db = _load()
    assert len(db["coordinate_metadata"]) == 99
    for k in db["coordinate_metadata"]:
        spec, epoch = coordinate_metadata(k)
        assert "+proj=" in spec and "+geoidgrids=" in spec
        assert epoch in (1997.0, 2002.0, 2010.0)


def test_nrcan_mtm1_definition_values():
    """MTM zone 1 carried inside the PROJJSON definition: TM with
    lon_0=-53, k=0.9999, x_0=304800 on GRS80, CGVD28 via the HT2_1997
    geoid model named by its explicit geoid_model member."""
    from proj_spark.sources.epsg import coordinate_metadata

    spec, epoch = coordinate_metadata("NRCAN:NAD83_CSRS_1997_MTM1_HT2_1997")
    assert epoch == 1997.0
    for frag in ("+proj=tmerc", "+lon_0=-53.0", "+k=0.9999",
                 "+x_0=304800.0", "+rf=298.257222101",
                 "+geoidgrids=@ca_nrc_HT2_1997.tif,@HT2_1997.byn"):
        assert frag in spec, (frag, spec)


def test_nrcan_horizontal_compiles_vertical_needs_grid():
    """The horizontal part compiles and projects (MTM zone 10 parity
    with a hand-built spec); the full compound spec raises the
    grid-absence error naming the byn/tif candidates (no NRCan grids in
    this offline sandbox — reference behavior without PROJ_NETWORK)."""
    from proj_spark.plans.pipeline import compile_pipeline
    from proj_spark.sources.epsg import coordinate_metadata

    spec, _ = coordinate_metadata("NRCAN:NAD83_CSRS_1997_MTM10_HT2_1997")
    horiz = spec.split(" +geoidgrids=")[0]
    p = compile_pipeline(horiz)
    q = compile_pipeline("+proj=tmerc +lat_0=0 +lon_0=-79.5 +k=0.9999 "
                         "+x_0=304800 +y_0=0 +ellps=GRS80")
    lon = np.array([-79.4, -80.1])
    lat = np.array([43.7, 44.2])
    x1, y1, _, _ = p.fwd_deg(lon, lat)
    x2, y2, _, _ = q.fwd_deg(lon, lat)
    np.testing.assert_allclose(x1, x2, atol=1e-9)
    np.testing.assert_allclose(y1, y2, atol=1e-9)
    with pytest.raises(FileNotFoundError, match="HT2_1997"):
        compile_pipeline(spec)


def test_nrcan_geoid_model_member_selects_named_op():
    """geoid_grids_for_op resolves the NRCan grid_transformation rows
    loaded from nrcan.sql and expands through grid_alternatives."""
    from proj_spark.sources.epsg import geoid_grids_for_op

    grids = geoid_grids_for_op("HT2_1997_NAD83CSRSV7")
    assert grids == "@ca_nrc_HT2_1997.tif,@HT2_1997.byn"
    with pytest.raises(KeyError):
        geoid_grids_for_op("NOT_A_GEOID_OP")


def test_nrcan_urn_and_cli(capsys):
    """URN coordinateMetadata spelling resolves through crs_to_crs's
    spec path, and projinfo prints the epoch."""
    from proj_spark.cli import main
    from proj_spark.plans.pipeline import compile_crs_to_crs

    # horizontal-only pair: strip vertical by using the CRS as source
    # and a plain target; grid absence must be the ONLY failure mode
    with pytest.raises(FileNotFoundError, match="HT2"):
        compile_crs_to_crs(
            "urn:ogc:def:coordinateMetadata:NRCAN::"
            "NAD83_CSRS_1997_MTM1_HT2_1997", "EPSG:4326")

    assert main(["projinfo", "NRCAN:NAD83_CSRS_2010_UTM10_CGVD2013_2010"]
                ) == 0
    out = capsys.readouterr().out
    assert "Coordinate epoch: 2010.0" in out
    assert "+proj=utm" in out or "+proj=tmerc" in out

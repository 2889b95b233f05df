"""Spark-facing function surface.

Two tiers, chosen by cost:
  * Pure Column expressions (JVM, whole-stage codegen) for everything
    elementary: slippy tiles, UTM zone selection, webmerc forward,
    haversine distance, bbox predicates. These stay inside codegen spans,
    push down, and never cross the Python boundary.
  * Arrow-batched pandas UDFs ONLY for series kernels (tmerc/lcc/datum
    pipelines) and S2 cell encoding, where the math genuinely needs numpy.
    One UDF per *pipeline*, not per step — steps are fused driver-side by
    plans.compile_pipeline, so a cs2cs-style chain costs a single
    JVM->Arrow->numpy->Arrow->JVM round trip per batch.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from proj_spark import cells
from proj_spark.plans.pipeline import Pipeline, compile_pipeline

# ---------------------------------------------------------------------------
# pandas UDF factories (numpy kernels)
# ---------------------------------------------------------------------------


def transform_udf(spec: str, direction: str = "fwd"):
    """pandas UDF (lon_or_x, lat_or_y) -> struct<x double, y double>.

    The full pipeline (compiled driver-side) is closure-captured; executors
    run pure numpy over Arrow batches — the distributed analogue of
    proj_trans_generic's strided columnar loop (reference 4D_api.cpp:609-705).
    """
    pipe = compile_pipeline(spec)

    @pandas_udf("x double, y double")
    def _udf(a: pd.Series, b: pd.Series) -> pd.DataFrame:
        av = a.to_numpy(dtype=np.float64)
        bv = b.to_numpy(dtype=np.float64)
        if direction == "fwd":
            x, y, _, _ = pipe.fwd_deg(av, bv)
        else:
            x, y, _, _ = pipe.inv_deg(av, bv)
        return pd.DataFrame({"x": x, "y": y})

    return _udf


def transform3d_udf(spec: str, direction: str = "fwd"):
    """pandas UDF (x, y, z) -> struct<x,y,z double> for datum pipelines."""
    pipe = compile_pipeline(spec)

    @pandas_udf("x double, y double, z double")
    def _udf(a: pd.Series, b: pd.Series, c: pd.Series) -> pd.DataFrame:
        av = a.to_numpy(dtype=np.float64)
        bv = b.to_numpy(dtype=np.float64)
        cv = c.to_numpy(dtype=np.float64)
        if direction == "fwd":
            x, y, z, _ = pipe.fwd_deg(av, bv, cv)
        else:
            x, y, z, _ = pipe.inv_deg(av, bv, cv)
        return pd.DataFrame({"x": x, "y": y, "z": z})

    return _udf


def lonlat_udf():
    """pandas UDF phash -> struct<lon double, lat double>: the canonical
    deterministic image coordinates (sources.synth.lonlat_from_phash)."""
    from proj_spark.sources.synth import lonlat_from_phash

    @pandas_udf("lon double, lat double")
    def _udf(ph: pd.Series) -> pd.DataFrame:
        lon, lat = lonlat_from_phash(ph.to_numpy())
        return pd.DataFrame({"lon": lon, "lat": lat})

    return _udf


def s2_cell_udf(level: int):
    """pandas UDF (lon, lat) -> int64 S2 cell id at ``level``."""

    @pandas_udf("long")
    def _udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
        cid = cells.s2_cell_id(
            lon.to_numpy(dtype=np.float64), lat.to_numpy(dtype=np.float64), level
        )
        return pd.Series(cid)

    return _udf


# ---------------------------------------------------------------------------
# pure Column expressions (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------

WEBMERC_A = 6378137.0
WEBMERC_MAX_LAT = cells.WEBMERC_MAX_LAT


def lon_from_key(key: Column) -> Column:
    """Deterministic oracle-checkable lon from an integer key (FIXTURES §5)."""
    return (key % 36000) / 100.0 - 180.0


def lat_from_key(key: Column) -> Column:
    return (key % 17000) / 100.0 - 85.0


def webmerc_x(lon: Column) -> Column:
    return F.radians(lon) * F.lit(WEBMERC_A)


def webmerc_y(lat: Column) -> Column:
    phi = F.radians(clip_lat(lat))
    # asinh(tan phi) written as ln(tan + sec): identical in DuckDB oracles
    return F.log(F.tan(phi) + 1.0 / F.cos(phi)) * F.lit(WEBMERC_A)


def clip_lat(lat: Column) -> Column:
    return F.least(F.greatest(lat, F.lit(-WEBMERC_MAX_LAT)), F.lit(WEBMERC_MAX_LAT))


def tile_x(lon: Column, zoom: int) -> Column:
    n = F.lit(float(1 << zoom))
    return F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * n), F.lit(0)),
        F.lit((1 << zoom) - 1),
    ).cast("long")


def tile_y(lat: Column, zoom: int) -> Column:
    n = F.lit(float(1 << zoom))
    phi = F.radians(clip_lat(lat))
    yy = (1.0 - F.log(F.tan(phi) + 1.0 / F.cos(phi)) / F.lit(math.pi)) / 2.0
    return F.least(
        F.greatest(F.floor(yy * n), F.lit(0)), F.lit((1 << zoom) - 1)
    ).cast("long")


def utm_zone(lon: Column) -> Column:
    """UTM zone 1..60 (reference tmerc.cpp:763-767 floor formula)."""
    wrapped = lon - F.floor((lon + 180.0) / 360.0) * 360.0
    return F.least(
        F.greatest(F.floor((wrapped + 180.0) / 6.0), F.lit(0)), F.lit(59)
    ).cast("int") + 1


def haversine_m(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle metres on the authalic-ish sphere R=6371000."""
    r = F.lit(6371000.0)
    p1 = F.radians(lat1)
    p2 = F.radians(lat2)
    dphi = p2 - p1
    dlmb = F.radians(lon2 - lon1)
    a = F.sin(dphi / 2) ** 2 + F.cos(p1) * F.cos(p2) * F.sin(dlmb / 2) ** 2
    return 2 * r * F.asin(F.sqrt(a))

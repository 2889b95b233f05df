"""Streaming geospatial operators (Structured Streaming).

The reference is a batch per-point library (stdin/stdout filters,
/root/reference/src/apps/proj.cpp) — streaming is genuinely new surface,
built per SURVEY §2.6 as Spark-native:

  * ``stream_tile_counts`` — the streaming twin of the batch tile
    heatmap: event-time tumbling windows + watermark for late data, tile
    id via the same JVM Column math as batch (functions.tile_x/y), so
    batch/stream parity is by construction (same expressions).
  * ``stream_cell_session_stats`` — custom stateful operator over
    ``applyInPandasWithState``: per-S2-cell running session (count,
    bbox, first/last seen) with timeout-based emission. The pattern
    slot for "custom stateful operator" in the north star.
  * ``streaming_images_source`` — deterministic rate-source adapter that
    replays the synthetic image table as a stream (id -> phash -> coords
    derived exactly like sources.synth), so tests and demos need no
    external system.

All stages keep Column-expression math JVM-side; only cell encoding uses
a pandas UDF, identical to the batch path.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from proj_spark.functions import lonlat_udf, s2_cell_udf, tile_x, tile_y


def streaming_images_source(spark, rows_per_second: int = 1000) -> DataFrame:
    """rate source -> deterministic (image_id, phash, lon, lat, ts)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )  # columns: timestamp, value
    from proj_spark.sources.synth import splitmix64  # noqa: F401  (doc link)

    @F.pandas_udf("long")
    def _phash(v: pd.Series) -> pd.Series:
        from proj_spark.sources.synth import splitmix64 as sm

        return pd.Series(sm(v.to_numpy(dtype=np.int64).astype(np.uint64)).view(np.int64))

    df = rate.select(
        F.col("timestamp").alias("ts"),
        F.format_string("img%012d", F.col("value")).alias("image_id"),
        _phash(F.col("value")).alias("phash"),
    )
    return df.withColumn("c", lonlat_udf()("phash")).select(
        "ts", "image_id", "phash", F.col("c.lon").alias("lon"), F.col("c.lat").alias("lat")
    )


def stream_tile_counts(
    events: DataFrame,
    zoom: int = 6,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Windowed per-tile counts with late-data handling.

    Output schema: (window struct, tile_x, tile_y, n). In append mode a
    window closes when the watermark passes its end — the streaming
    contract a 100 TB ingest pipeline needs for idempotent downstream
    writes (each closed window is final, so sinks can commit per window).
    """
    return (
        events.withWatermark(ts_col, watermark)
        .withColumn("tile_x", tile_x(F.col(lon_col), zoom))
        .withColumn("tile_y", tile_y(F.col(lat_col), zoom))
        .groupBy(F.window(F.col(ts_col), window), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_SESSION_SCHEMA = (
    "cell long, n long, min_lon double, max_lon double, "
    "min_lat double, max_lat double, closed boolean"
)
_STATE_SCHEMA = "n long, min_lon double, max_lon double, min_lat double, max_lat double"


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Accumulate per-cell stats; emit a final row when the group times out."""
    (cell,) = key
    if state.hasTimedOut:
        n, mnx, mxx, mny, mxy = state.get
        state.remove()
        yield pd.DataFrame(
            {"cell": [cell], "n": [n], "min_lon": [mnx], "max_lon": [mxx],
             "min_lat": [mny], "max_lat": [mxy], "closed": [True]}
        )
        return
    n, mnx, mxx, mny, mxy = state.get if state.exists else (0, 180.0, -180.0, 90.0, -90.0)
    for pdf in pdfs:
        n += len(pdf)
        mnx = min(mnx, float(pdf["lon"].min()))
        mxx = max(mxx, float(pdf["lon"].max()))
        mny = min(mny, float(pdf["lat"].min()))
        mxy = max(mxy, float(pdf["lat"].max()))
    state.update((n, mnx, mxx, mny, mxy))
    state.setTimeoutDuration(30_000)
    yield pd.DataFrame(
        {"cell": [cell], "n": [n], "min_lon": [mnx], "max_lon": [mxx],
         "min_lat": [mny], "max_lat": [mxy], "closed": [False]}
    )


def stream_cell_session_stats(points: DataFrame, level: int = 6) -> DataFrame:
    """Custom stateful op: per-cell running stats with processing-time
    timeout (applyInPandasWithState). Emits progressive rows (closed=false)
    and a final row on timeout (closed=true)."""
    cells = points.withColumn("cell", s2_cell_udf(level)(F.col("lon"), F.col("lat")))
    return cells.groupBy("cell").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )

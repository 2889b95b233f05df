"""Structured Streaming operator tests (memory source/sink, processAllAvailable)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from proj_spark.streaming import stream_cell_session_stats, stream_tile_counts


@pytest.fixture()
def events_stream(spark, tmp_path):
    """File-source stream of deterministic events written as json batches."""
    src = tmp_path / "src"
    src.mkdir()
    rows = []
    for i in range(500):
        lon = (i * 9973 % 36000) / 100.0 - 180.0
        lat = (i * 7919 % 17000) / 100.0 - 85.0
        ts = f"2026-01-01T00:{i % 50 + 10:02d}:{i % 60:02d}"
        rows.append(f'{{"ts": "{ts}", "lon": {lon}, "lat": {lat}, "image_id": "img{i}"}}')
    (src / "batch0.json").write_text("\n".join(rows))
    schema = "ts timestamp, lon double, lat double, image_id string"
    return spark.readStream.schema(schema).json(str(src))


def test_stream_tile_counts_matches_batch(spark, events_stream, tmp_path):
    out = stream_tile_counts(events_stream, zoom=4, window="5 minutes",
                             watermark="10 minutes")
    q = (
        out.writeStream.format("memory").queryName("tiles_stream")
        .outputMode("complete").start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select window.start as ws, tile_x, tile_y, n from tiles_stream"
        ).toPandas()
    finally:
        q.stop()

    # batch twin over the same data — same Column expressions by construction
    from proj_spark.functions import tile_x, tile_y

    batch = (
        spark.read.schema("ts timestamp, lon double, lat double, image_id string")
        .json(str(tmp_path / "src"))
        .withColumn("tile_x", tile_x(F.col("lon"), 4))
        .withColumn("tile_y", tile_y(F.col("lat"), 4))
        .groupBy(F.window("ts", "5 minutes").alias("w"), "tile_x", "tile_y")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "tile_x", "tile_y", "n")
        .toPandas()
    )
    key = ["ws", "tile_x", "tile_y"]
    g = got.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(g) == len(b)
    assert (g["n"].to_numpy() == b["n"].to_numpy()).all()


def test_stream_cell_session_stats(spark, events_stream):
    out = stream_cell_session_stats(events_stream.select("lon", "lat"), level=4)
    q = (
        out.writeStream.format("memory").queryName("cells_stream")
        .outputMode("update").start()
    )
    try:
        # NOTE: processAllAvailable() never quiesces under
        # ProcessingTimeTimeout (timeout sweeps keep scheduling batches),
        # so poll the sink until all 500 events are accounted for.
        deadline = time.time() + 120
        got = None
        while time.time() < deadline:
            got = spark.sql(
                "select cell, max(n) as n from cells_stream group by cell"
            ).toPandas()
            if len(got) and got["n"].sum() == 500:
                break
            time.sleep(2)
    finally:
        q.stop()
    assert got is not None and got["n"].sum() == 500
    assert (got["n"] >= 1).all()
    assert got["cell"].nunique() == len(got)

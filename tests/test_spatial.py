"""Spatial operators vs brute-force oracles on deterministic synthetic data."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from proj_spark.operators import knn as knn_ops
from proj_spark.operators import spatial_join as sj
from proj_spark.operators import tiles as tile_ops
from proj_spark.sources import synth


@pytest.fixture(scope="module")
def polys():
    return synth.make_polygons(count=24)


@pytest.fixture(scope="module")
def points_pdf():
    n = 4000
    ids = np.arange(n, dtype=np.int64)
    ph = synth.splitmix64(ids.astype(np.uint64)).view(np.int64)
    lon, lat = synth.lonlat_from_phash(ph)
    return pd.DataFrame({"pid": ids, "lon": lon, "lat": lat})


def brute_force_matches(points_pdf, polys):
    lon = points_pdf["lon"].to_numpy()
    lat = points_pdf["lat"].to_numpy()
    pid = points_pdf["pid"].to_numpy()
    rows = set()
    for p in polys:
        inside = sj._point_in_poly(lon, lat, p)
        for q in pid[inside]:
            rows.add((int(q), p.polygon_id))
    return rows


def test_spatial_join_matches_bruteforce(spark, polys, points_pdf):
    pts = spark.createDataFrame(points_pdf)
    got = sj.spatial_join(pts, polys, lon_col="lon", lat_col="lat", level=10)
    got_rows = {(int(r.pid), r.polygon_id) for r in got.collect()}
    expect = brute_force_matches(points_pdf, polys)
    missing = expect - got_rows
    extra = got_rows - expect
    assert not missing, f"cover prefilter dropped true matches: {sorted(missing)[:5]}"
    assert not extra, f"ray-cast accepted wrong pairs: {sorted(extra)[:5]}"
    assert len(expect) > 0, "degenerate fixture: no matches at all"


def test_spatial_join_smj_same_result(spark, polys, points_pdf):
    pts = spark.createDataFrame(points_pdf)
    b = sj.spatial_join(pts, polys, lon_col="lon", lat_col="lat", level=10, strategy="broadcast")
    s = sj.spatial_join(pts, polys, lon_col="lon", lat_col="lat", level=10, strategy="smj")
    rb = {(int(r.pid), r.polygon_id) for r in b.collect()}
    rs = {(int(r.pid), r.polygon_id) for r in s.collect()}
    assert rb == rs


def test_knn_matches_bruteforce(spark, points_pdf):
    qs = spark.createDataFrame(points_pdf.head(150).rename(columns={"pid": "qid"}))
    rs = spark.createDataFrame(points_pdf.tail(1200).rename(columns={"pid": "rid", "lon": "rlon", "lat": "rlat"}))
    fast = knn_ops.knn_join(
        qs, rs, 3, q_id="qid", q_lon="lon", q_lat="lat",
        r_id="rid", r_lon="rlon", r_lat="rlat", cell_deg=6.0,
    )
    slow = knn_ops.knn_bruteforce(
        qs, rs, 3, q_id="qid", q_lon="lon", q_lat="lat",
        r_id="rid", r_lon="rlon", r_lat="rlat",
    )
    f = {(int(r.qid), int(r.rid), r.rank) for r in fast.collect()}
    s = {(int(r.qid), int(r.rid), r.rank) for r in slow.collect()}
    assert f == s
    assert len(f) == 150 * 3


def test_knn_guarded_tail_no_ref_broadcast(spark, points_pdf):
    """With the ref side over the broadcast threshold, the plan must not
    broadcast the ref table anywhere — unsettled queries ring-expand to the
    full-cover cell instead — and results still match brute force."""
    qs = spark.createDataFrame(points_pdf.head(60).rename(columns={"pid": "qid"}))
    rs = spark.createDataFrame(
        points_pdf.tail(800).rename(columns={"pid": "rid", "lon": "rlon", "lat": "rlat"}))
    fast = knn_ops.knn_join(
        qs, rs, 3, q_id="qid", q_lon="lon", q_lat="lat",
        r_id="rid", r_lon="rlon", r_lat="rlat", cell_deg=6.0,
        tail_broadcast_rows=0,  # force the over-threshold path
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    # the only broadcasts allowed are the settled-id / anti-join id lists
    # (single-column), never a 3-column ref relation
    import re as _re
    for m in _re.finditer(r"BroadcastExchange[^\n]*", plan):
        assert "rlon" not in m.group(0) and "rlat" not in m.group(0), m.group(0)
    slow = knn_ops.knn_bruteforce(
        qs, rs, 3, q_id="qid", q_lon="lon", q_lat="lat",
        r_id="rid", r_lon="rlon", r_lat="rlat",
    )
    f = {(int(r.qid), int(r.rid), r.rank) for r in fast.collect()}
    s = {(int(r.qid), int(r.rid), r.rank) for r in slow.collect()}
    assert f == s
    assert len(f) == 60 * 3


def test_tile_assign_and_cover(spark, polys, points_pdf):
    pts = spark.createDataFrame(points_pdf)
    tiled = tile_ops.assign_tiles(pts, zoom=6)
    rows = tiled.collect()
    # oracle: numpy slippy math must agree with the Column expressions
    from proj_spark import cells

    lon = points_pdf["lon"].to_numpy()
    lat = points_pdf["lat"].to_numpy()
    tx, ty = cells.slippy_tile(lon, lat, 6)
    got = {int(r.pid): (r.tile_x, r.tile_y) for r in rows}
    for i, p in enumerate(points_pdf["pid"]):
        assert got[int(p)] == (tx[i], ty[i])

    # tile cover contains the tile of every point inside each polygon bbox
    cover = tile_ops.polygon_tile_cover(polys, zoom=6)
    cover_set = set(zip(cover.tile_x, cover.tile_y, cover.polygon_id))
    for p in polys:
        min_lon, min_lat, max_lon, max_lat = p.bbox
        wrapped_lon = ((lon + 180.0) % 360.0) - 180.0
        in_bbox = (
            ((wrapped_lon >= min_lon) & (wrapped_lon <= max_lon)
             | ((wrapped_lon + 360 >= min_lon) & (wrapped_lon + 360 <= max_lon)))
            & (lat >= min_lat) & (lat <= max_lat)
        )
        for a, b in zip(tx[in_bbox], ty[in_bbox]):
            assert (a, b, p.polygon_id) in cover_set, (p.polygon_id, a, b)


def test_images_df_deterministic(spark):
    df = synth.images_df(spark, 64, real_png=True)
    rows = {r.image_id: r for r in df.collect()}
    assert len(rows) == 64
    # caption byte-equality + pixel fidelity for the PNG half
    for i in (0, 2, 10):
        r = rows[f"img{i:012d}"]
        ref = synth.make_image_row(i, real_png=True)
        assert r.caption == ref["caption"]
        assert r.phash == ref["phash"]
        px = synth.decode_png(bytes(r.bytes))
        ref_px = synth._gradient_pixels(int(np.uint64(np.int64(r.phash))), r.w, r.h)
        assert np.array_equal(px, ref_px), "decoded pixels must be bit-exact"


def test_fused_join_matches_relational(spark):
    """spatial_join_fused (broadcast cover index inside the UDF) returns the
    same (point, polygon) set as the relational cell-cover join."""
    from pyspark.sql import functions as F

    from proj_spark.functions import s2_cell_udf
    from proj_spark.operators.spatial_join import spatial_join, spatial_join_fused
    from proj_spark.sources.synth import make_polygons

    polys = make_polygons(24)
    pts = (
        spark.range(5000)
        .withColumn("lon", ((F.col("id") * 9973) % 36000) / 100.0 - 180.0)
        .withColumn("lat", ((F.col("id") * 7919) % 17000) / 100.0 - 85.0)
        .withColumn("cell", s2_cell_udf(10)(F.col("lon"), F.col("lat")))
    )
    rel = spatial_join(pts, polys, level=8, cell_col="cell", cell_level=10)
    fus = spatial_join_fused(pts, polys, level=8, cell_col="cell", cell_level=10)
    a = {(r.id, r.polygon_id) for r in rel.select("id", "polygon_id").collect()}
    b = {(r.id, r.polygon_id) for r in fus.select("id", "polygon_id").collect()}
    assert a == b and len(a) > 0

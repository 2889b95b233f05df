"""Physical-plan shape assertions for the contract queries.

Correctness says WHAT a query computes; these tests pin HOW Spark runs
it — the properties that decide whether the plan survives a 100x
scale-up: JVM-only paths stay out of Python, scans prune columns,
aggregations combine map-side, small sides broadcast, and the flagship
fused kernel does exactly one Arrow crossing.
"""

import re

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def entry(spark):
    import __spark_entry__ as e
    return e


SF = "/root/testdata/sf0.001"


def test_tile_assign_is_jvm_only_with_partial_agg(spark, entry):
    df = entry.queries()["tile_assign_z8"](spark, SF)
    plan = _plan(df)
    assert "EvalPython" not in plan  # slippy tiles are Column math
    # partial aggregation before the exchange (map-side combine)
    assert re.search(r"HashAggregate.*partial", plan, re.I | re.S)


def test_webmerc_scan_prunes_columns(spark, entry):
    df = entry.queries()["webmerc_project"](spark, SF)
    plan = _plan(df)
    assert "EvalPython" not in plan
    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m, plan
    # only the two key columns are read — bytes/caption never touched
    assert "o_orderkey" in m.group(1) and "o_custkey" in m.group(1)
    assert "caption" not in m.group(1) and "bytes" not in m.group(1)


def test_exact_dedup_partial_agg(spark, entry):
    df = entry.queries()["exact_dedup_hashes"](spark, SF)
    plan = _plan(df)
    assert "EvalPython" not in plan  # md5 + groupBy are JVM
    assert re.search(r"HashAggregate.*partial", plan, re.I | re.S)


def test_minhash_xx_tier_is_jvm_only(spark):
    from proj_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(dedup.minhash_signatures_xx(docs))
    assert "EvalPython" not in plan


def test_knn_uses_broadcast_not_shuffle_cross(spark, entry):
    df = entry.queries()["knn_nation_k3"](spark, SF)
    plan = _plan(df)
    # the 25-row nation ref side must be broadcast (oracle-tier
    # crossJoin is a BroadcastNestedLoopJoin, never a shuffle cartesian)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_flagship_single_arrow_crossing(spark):
    """The fused flagship kernel pays exactly ONE Python/Arrow stage:
    phash -> CRS chain -> cell -> cover matches all inside one UDF."""
    from proj_spark.functions import image_geo_udf
    from pyspark.sql import functions as F

    imgs = spark.read.parquet(f"{SF}/events.parquet").limit(100)
    g = image_geo_udf()
    df = imgs.withColumn("geo", g(F.xxhash64("event_id")))
    plan = _plan(df)
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 1


def test_lsh_pair_join_is_equi_join_on_band(spark):
    """The minhash LSH candidate join must be a hash equi-join on the
    band key, not a theta/cartesian join — this is THE property that
    makes near-dup detection O(n) instead of O(n^2) at 100 TB."""
    from proj_spark.operators import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan


def test_ivf_join_is_equi_join_and_ids_only(spark):
    """The IVF candidate join must be a hash equi-join on list_id (not
    cartesian), and the list-id join must move ONLY ids — the embedding
    arrays are attached by id-joins after the candidate set is formed
    (otherwise the heavy vectors cross the candidate shuffle twice)."""
    from proj_spark.operators.similarity import ivf_topk

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = ivf_topk(e, 3, dim=64, n_hint=500)
    plan = _plan(out)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
    # the list-id join's own keys/outputs never include an embedding col:
    # every join on list_id must reference only ids + list_id
    for m in re.finditer(r"Join [^\n]*list_id[^\n]*", plan):
        assert "embedding" not in m.group(0), m.group(0)


def test_codebook_sampler_filters_before_sort(spark):
    """The IVF codebook sampler must prune with a deterministic
    hash-threshold Filter before its bounded sort — at 100 TB the sort
    input is ~4x sample_rows rows, never the whole table (VERDICT r4 #7).
    The selected set is the global smallest sample_rows hashes either
    way, so the codebook is unchanged."""
    import numpy as np
    from pyspark.sql import functions as F

    from proj_spark.operators.similarity import kmeans_codebook

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    # sample_rows far below n so the threshold path engages
    small = kmeans_codebook(e, 4, 64, sample_rows=32, n_hint=e.count())
    full = kmeans_codebook(e, 4, 64, sample_rows=32, n_hint=None)
    assert np.allclose(small, full), \
        "threshold sampler changed the codebook"
    # plan shape: build the sampler lineage the same way and check Filter
    # precedes TakeOrdered in the physical plan
    frac = F.abs(F.xxhash64(F.col("vec_id").cast("string"), F.lit(0x1FF)))
    plan = _plan(e.select("vec_id", "embedding")
                 .filter(frac < F.lit(2**40))
                 .orderBy(frac).limit(32))
    assert "Filter" in plan and "TakeOrdered" in plan


def test_kmeans_codebook_empty_and_dim_guards(spark):
    """Empty input raises a clear ValueError (not IndexError), and a dim
    mismatch is reported (ADVICE r4: the dim parameter is now used)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from proj_spark.operators.similarity import kmeans_codebook

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    empty = e.filter(F.lit(False))
    with _pytest.raises(ValueError, match="empty"):
        kmeans_codebook(empty, 4, 64, n_hint=0)
    with _pytest.raises(ValueError, match="dim|expected"):
        kmeans_codebook(e.limit(8), 4, 63, n_hint=8)


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    """Two tables bucketed+sorted on the cell key must join with ZERO
    Exchange operators — the co-location contract for 100 TB cell joins."""
    from pyspark.sql import functions as F

    from proj_spark.operators.bucketing import (assert_no_shuffle_join,
                                                bucketed_join,
                                                join_exchange_count,
                                                write_bucketed)

    events = spark.read.parquet(f"{SF}/events.parquet").limit(2000) \
        .withColumn("cell", F.xxhash64("event_id") % 64)
    dims = events.select("cell").distinct() \
        .withColumn("weight", F.rand(7))
    write_bucketed(events, "ev_b", "cell", 8, sort_cols=["cell"])
    write_bucketed(dims, "dim_b", "cell", 8, sort_cols=["cell"])
    try:
        # disable broadcast so the join must be SortMergeJoin: the test is
        # about bucketing removing the exchanges, not about broadcasting
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed_join(spark, "ev_b", "dim_b", "cell")
        j.write.format("noop").mode("overwrite").save()
        assert_no_shuffle_join(j)
        # sanity: the same join over plain (unbucketed) frames shuffles
        plain = events.join(dims, "cell")
        assert join_exchange_count(plain) > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS dim_b")

"""Bucketed co-located joins — shuffle elimination for repeated joins on
the same key (s2_cell, image_id).

At 100 TB, the dominant cost of a cell-keyed join is the exchange of the
fact side. Writing both sides bucketed (and sorted) by the join key into
the session catalog lets every later join run as a SortMergeJoin with NO
Exchange on either side: Spark trusts the on-disk hash-bucket layout
(`spark.sql.sources.bucketing.enabled`, on by default). This module is
the thin, tested wrapper the pipelines use; `assert_no_shuffle_join`
makes the plan property checkable instead of folklore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   num_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (+ optionally sorted) parquet table in
    the session catalog. Sorting by the join key makes the downstream
    SortMergeJoin sort-free as well."""
    w = df.write.format("parquet").mode(mode) \
        .bucketBy(num_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketing tables on the bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def join_exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("ReusedExchange")


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the join plan contains any shuffle exchange — the
    invariant a co-located bucketed join must satisfy."""
    n = join_exchange_count(df)
    if n != 0:
        raise AssertionError(
            f"expected a shuffle-free co-located join, found {n} "
            f"Exchange operator(s):\n"
            + df._jdf.queryExecution().executedPlan().toString())

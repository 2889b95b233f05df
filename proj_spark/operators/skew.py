"""Skew handling: cell histograms + deterministic salted repartitioning.

The north rule prescribes "cell-prefix range partitioning with salted
repartitioning for skewed megacells". At 10^12 rows a single hot S2 cell
(every image geotagged in one city) would otherwise pin one reducer while
the rest of the cluster idles.

Two mechanisms, composable:

  * AQE skew-join splitting (spark.sql.adaptive.skewJoin.*) — free, runtime,
    enabled by proj_spark.session.get_spark. Handles *join*-side skew.
  * Explicit deterministic salting (this module) — for aggregation skew and
    for when the salt must be stable across a checkpoint/resume boundary
    (AQE decisions are not reproducible run-to-run; a salt derived from a
    histogram computed once and persisted IS). Determinism requirement per
    SURVEY §7 "must stay deterministic for resume".

The reference has no notion of data skew (it is a per-point library, see
/root/reference/src/apps/proj.cpp stdin loop); this operator exists because
the *distribution* of the work is ours to manage.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cell_histogram(df: DataFrame, cell_col: str = "cell", top: int = 1024) -> pd.DataFrame:
    """Driver-side (cell, count) for the ``top`` heaviest cells.

    One cheap pre-pass (map-side partial aggregation makes this a
    near-pure-scan); the result is tiny and reusable across stages.
    """
    return (
        df.groupBy(cell_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"))
        .limit(top)
        .toPandas()
    )


def salt_factors(hist: pd.DataFrame, target_rows_per_task: int, cell_col: str = "cell") -> dict[int, int]:
    """cell -> number of salt buckets (only cells exceeding the target)."""
    out: dict[int, int] = {}
    for cell, cnt in zip(hist[cell_col], hist["cnt"]):
        f = math.ceil(cnt / target_rows_per_task)
        if f > 1:
            out[int(cell)] = int(f)
    return out


def salted(
    df: DataFrame,
    factors: dict[int, int],
    cell_col: str = "cell",
    salt_col: str = "salt",
    row_key: str | Sequence[str] | None = None,
) -> DataFrame:
    """Add a deterministic salt column: 0 for cold cells, hash(row_key) %
    factor for hot ones. Deterministic given the same ``factors`` dict, so a
    resumed run reproduces identical partition contents (unlike rand() or
    monotonically_increasing_id(), both of which depend on runtime
    partitioning). ``row_key`` may name one or several content columns; when
    omitted the salt is derived from ALL columns of the row, which is stable
    across runs for identical content.
    """
    if not factors:
        return df.withColumn(salt_col, F.lit(0))
    items = sorted(factors.items())
    cell_lit = F.create_map(
        *[F.lit(v) for kv in items for v in kv]  # cell -> factor
    )
    factor = F.coalesce(cell_lit.getItem(F.col(cell_col)), F.lit(1))
    if row_key is None:
        key_cols = [F.col(c) for c in df.columns]
    elif isinstance(row_key, str):
        key_cols = [F.col(row_key)]
    else:
        key_cols = [F.col(c) for c in row_key]
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*key_cols), factor).cast("int")
    )


def salted_cover(cover: DataFrame, factors: dict[int, int], cell_col: str = "cell",
                 salt_col: str = "salt") -> DataFrame:
    """Explode the (small) build side across every salt bucket of hot cells
    so `probe.join(cover, [cell, salt])` stays an equi-join."""
    if not factors:
        return cover.withColumn(salt_col, F.lit(0))
    items = sorted(factors.items())
    cell_lit = F.create_map(*[F.lit(v) for kv in items for v in kv])
    factor = F.coalesce(cell_lit.getItem(F.col(cell_col)), F.lit(1))
    return cover.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), factor - 1))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def repartition_by_cell_prefix(
    df: DataFrame, num_partitions: int, cell_col: str = "cell", salt_col: str | None = None
) -> DataFrame:
    """Range-partition on (cell[, salt]).

    S2 ids are Hilbert-ordered, so ranges of the int64 id are spatially
    contiguous: a parent cell is exactly a bit-prefix range
    (proj_spark.cells.parent_id). Range partitioning therefore gives each
    task a compact spatial neighborhood — locality for the subsequent
    cell-cover join and for manifest bookkeeping (lineage.py), while the
    salt splits megacells across tasks.
    """
    cols = [F.col(cell_col)] + ([F.col(salt_col)] if salt_col else [])
    return df.repartitionByRange(num_partitions, *cols)

"""k-nearest-neighbors join via cell-ring expansion + windowed top-k.

Strategy (per SURVEY §2.6): bucket both sides on a lon/lat grid of width
``w`` degrees; each query joins refs in its 3x3 neighbor ring (one int64
equality join). A query is *settled* when it has >= k candidates whose k-th
distance is within the ring's guaranteed radius (w scaled by cos(lat) —
nothing outside the ring can be closer). Unsettled queries re-run with a
3x wider ring; the final tail falls back to a broadcast brute-force pass.

At 10^12 scale: round 1 settles the dense bulk with a single shuffle on the
grid key; the geometric expansion bounds rounds at O(log(spacing)); the
brute-force tail is the sparse-region residue (polar caps, empty oceans) —
a tiny broadcast join, not a cross join of the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from proj_spark.functions import haversine_m

_EARTH_DEG_M = 111194.9  # metres per degree of latitude (sphere R=6371000)


_DIVISORS = (
    0.25, 0.5, 1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0, 8.0, 9.0, 10.0, 12.0,
    15.0, 18.0, 20.0, 24.0, 30.0, 36.0, 40.0, 45.0, 60.0, 72.0, 90.0, 120.0, 180.0, 360.0,
)


def _snap_w(w: float) -> float:
    """Smallest divisor of 360 >= w, so the lon grid wraps seamlessly."""
    for d in _DIVISORS:
        if d >= w:
            return d
    return 360.0


def _nx(w: float) -> int:
    """Columns in the lon grid; lon=180 wraps onto column 0."""
    return max(int(round(360.0 / w)), 1)


def _with_grid(df: DataFrame, lon: str, lat: str, w: float, prefix: str) -> DataFrame:
    nx = _nx(w)
    return df.withColumn(
        f"{prefix}gx",
        (F.floor((F.col(lon) + 180.0) / w) % nx).cast("long"),
    ).withColumn(f"{prefix}gy", F.floor((F.col(lat) + 90.0) / w).cast("long"))


def _ring_candidates(q: DataFrame, r: DataFrame, w: float, cols_q, cols_r) -> DataFrame:
    nx = _nx(w)
    # at nx<=2 the +-1 lon offsets collapse onto the same cell under the
    # modulo wrap; dedupe them or candidates (and hence top-k rows) duplicate
    dxs = (-1, 0, 1) if nx >= 3 else ((0, 1) if nx == 2 else (0,))
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    qx = (
        q.withColumn("_dx", F.explode(F.array(*[F.lit(d) for d in dxs])))
        .withColumn("_dy", F.explode(offsets))
        .withColumn("qgx", ((F.col("qgx") + F.col("_dx")) + nx) % nx)
        .withColumn("qgy", F.col("qgy") + F.col("_dy"))
        .drop("_dx", "_dy")
    )
    return qx.join(
        r,
        (qx["qgx"] == r["rgx"]) & (qx["qgy"] == r["rgy"]),
    ).select(*cols_q, *cols_r)


def knn_join(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    *,
    q_id: str,
    q_lon: str,
    q_lat: str,
    r_id: str,
    r_lon: str,
    r_lat: str,
    cell_deg: float = 4.0,
    rounds: int = 2,
    tail_broadcast_rows: int = 2_000_000,
    tail_buckets: int = 1024,
    refs_rows: int | None = None,
) -> DataFrame:
    """Returns (q_id, r_id, dist_m, rank) with exactly min(k, |refs|) rows
    per query. Deterministic tie-break on (dist_m, r_id).

    ``tail_broadcast_rows`` guards the brute-force tail: the ref side is
    only ever broadcast when its row count is at or below this threshold
    (~50 MB of (id, lon, lat) at the default). Above it, unsettled queries
    keep expanding rings — each an equi-join shuffle, never a broadcast —
    until w=360 where the single grid cell covers the globe and every
    query settles by construction. The w=360 round is SALTED: a plain grid
    join there would put all |remaining|x|refs| candidates on one constant
    key (one task — the exact skew this path exists to avoid), so refs are
    bucketed into ``tail_buckets`` hash partitions, remaining queries are
    exploded over the bucket ids, the join runs on the bucket key, and
    top-k is taken per (query, bucket) first, then globally over the
    B*k survivors per query. Pass ``refs_rows`` if the caller already
    knows the count to skip the sizing job.
    """
    q = queries.select(q_id, q_lon, q_lat)
    r = refs.select(r_id, r_lon, r_lat)
    r_rows = refs_rows if refs_rows is not None else r.count()
    broadcast_tail = r_rows <= tail_broadcast_rows

    win = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(r_id).asc())
    results = None
    w = _snap_w(cell_deg)
    remaining = q
    round_no = 0

    while True:
        round_no += 1
        full_cover = w >= 360.0  # one cell; all refs are candidates
        if full_cover and r_rows > tail_broadcast_rows:
            # Salted full-cover round: the single grid cell would make the
            # equi-join key constant (all candidates in ONE task). Bucket
            # refs by hash, fan queries out over the bucket ids, join on
            # the bucket key (parallelism = tail_buckets), take per-bucket
            # top-k, then the exact global top-k over B*k rows per query.
            B = max(int(tail_buckets), 1)
            rb = r.withColumn(
                "_b", F.pmod(F.xxhash64(F.col(r_id)), F.lit(B)).cast("int")
            )
            qb = remaining.withColumn(
                "_b", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
            ).withColumn("_b", F.col("_b").cast("int"))
            win_b = Window.partitionBy(q_id, "_b").orderBy(
                F.col("dist_m").asc(), F.col(r_id).asc()
            )
            cand = qb.join(rb, "_b").withColumn(
                "dist_m",
                haversine_m(F.col(q_lon), F.col(q_lat), F.col(r_lon), F.col(r_lat)),
            )
            topk = (
                cand.withColumn("_rkb", F.row_number().over(win_b))
                .filter(F.col("_rkb") <= k)
                .drop("_rkb", "_b")
                .withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
            )
        else:
            qg = _with_grid(remaining, q_lon, q_lat, w, "q")
            rg = _with_grid(r, r_lon, r_lat, w, "r")
            cand = _ring_candidates(
                qg, rg, w, [q_id, q_lon, q_lat], [r_id, r_lon, r_lat]
            ).withColumn(
                "dist_m", haversine_m(F.col(q_lon), F.col(q_lat), F.col(r_lon), F.col(r_lat))
            )
            topk = (
                cand.withColumn("rank", F.row_number().over(win))
                .filter(F.col("rank") <= k)
            )
        if full_cover:
            # candidate set is complete: top-k is exact, everything settles
            results_round = topk.select(q_id, r_id, "dist_m", "rank")
            results = (results_round if results is None
                       else results.unionByName(results_round))
            return results
        # settled: k-th neighbor within the ring guarantee radius
        guarantee = (
            F.lit(w * _EARTH_DEG_M)
            * F.cos(F.radians(F.least(F.abs(F.col(q_lat)) + w, F.lit(89.9))))
        )
        stats = topk.groupBy(q_id).agg(
            F.count("*").alias("_n"),
            F.max(F.when(F.col("rank") == k, F.col("dist_m"))).alias("_kth"),
            F.max(guarantee).alias("_guar"),
        )
        settled_ids = stats.filter(
            (F.col("_n") >= k) & (F.col("_kth") <= F.col("_guar"))
        ).select(q_id)
        settled = topk.join(F.broadcast(settled_ids), q_id, "inner").select(
            q_id, r_id, "dist_m", "rank"
        )
        results = settled if results is None else results.unionByName(settled)
        remaining = remaining.join(F.broadcast(settled_ids), q_id, "left_anti")
        w = _snap_w(w * 3.0)
        if broadcast_tail and round_no >= rounds:
            break

    # brute-force tail: the queries grid rounds could not settle. The ring
    # radius grows 3x per round, so after ``rounds`` expansions only queries
    # in genuinely ref-empty regions remain; the ref side is small (guarded
    # by tail_broadcast_rows above), so the tail is a broadcast nested-loop
    # over the remainder, never a shuffle cross join of the full tables.
    tail = (
        remaining.crossJoin(F.broadcast(r))
        .withColumn(
            "dist_m", haversine_m(F.col(q_lon), F.col(q_lat), F.col(r_lon), F.col(r_lat))
        )
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(q_id, r_id, "dist_m", "rank")
    )
    return results.unionByName(tail)


def knn_bruteforce(
    queries: DataFrame,
    refs: DataFrame,
    k: int,
    *,
    q_id: str,
    q_lon: str,
    q_lat: str,
    r_id: str,
    r_lon: str,
    r_lat: str,
) -> DataFrame:
    """Reference implementation (cross join + window); oracle-comparable."""
    win = Window.partitionBy(q_id).orderBy(F.col("dist_m").asc(), F.col(r_id).asc())
    return (
        queries.select(q_id, q_lon, q_lat)
        .crossJoin(refs.select(r_id, r_lon, r_lat))
        .withColumn(
            "dist_m", haversine_m(F.col(q_lon), F.col(q_lat), F.col(r_lon), F.col(r_lat))
        )
        .withColumn("rank", F.row_number().over(win))
        .filter(F.col("rank") <= k)
        .select(q_id, r_id, "dist_m", "rank")
    )

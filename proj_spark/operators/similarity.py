"""Similarity search over embedding columns (array<float>).

Three tiers:

  * cosine_knn_bruteforce — exact top-k by cosine: broadcast the (small)
    reference matrix, one numpy matmul per Arrow batch. Baseline + oracle.
    At scale this is the right tool whenever the REFERENCE side fits in
    executor memory (e.g. dedup against a 1M-centroid codebook): the query
    side streams, no shuffle at all.
  * cosine_self_topk — exact top-k within one table via a relational
    dot-product join (explode-free: pairs restricted by a block-nested
    pandas cogroup). Used at test scale and as the oracle for LSH.
  * rhp_lsh_topk — random-hyperplane LSH: 64-bit sign signature (fixed
    deterministic hyperplanes from splitmix64), band buckets, candidate
    join, exact re-rank. The 10^12-scale path for self-similarity: cost
    ~ O(n * candidates_per_bucket) instead of O(n^2).

All vector math is numpy over Arrow batches; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from proj_spark.sources.synth import splitmix64


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def cosine_knn_bruteforce(
    queries: DataFrame,
    refs_pdf: pd.DataFrame,
    k: int,
    *,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    r_id_col: str = "vec_id",
    r_vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of every query against a driver-side reference set.

    refs_pdf is broadcast via closure capture (same mechanism as PROJ grid
    broadcast, SURVEY §1.4); each Arrow batch does ONE (batch x dim) @
    (dim x refs) matmul then a partial argpartition — no shuffle, the
    output is already per-query.
    """
    r_ids = refs_pdf[r_id_col].to_numpy()
    R = _normalize(_as_matrix(refs_pdf[r_vec_col]))

    def _topk(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            Q = _normalize(_as_matrix(pdf[q_vec]))
            sims = Q @ R.T  # (batch, refs)
            ids = pdf[q_id].to_numpy()
            if exclude_self:
                self_mask = ids[:, None] == r_ids[None, :]
                sims = np.where(self_mask, -np.inf, sims)
            kk = min(k, sims.shape[1])
            # deterministic: order by (-cosine, rid)
            order = np.lexsort((r_ids[None, :].repeat(len(ids), 0), -sims), axis=1)[:, :kk]
            yield pd.DataFrame(
                {
                    "qid": np.repeat(ids, kk),
                    "rid": r_ids[order].ravel(),
                    "cosine": np.take_along_axis(sims, order, axis=1).ravel(),
                    "rank": np.tile(np.arange(1, kk + 1, dtype=np.int32), len(ids)),
                }
            )

    # mapInPandas: top-k expands/contracts cardinality, which scalar
    # pandas_udf cannot; output is already per-query — no shuffle at all
    return queries.select(q_id, q_vec).mapInPandas(
        _topk, schema="qid long, rid long, cosine double, rank int"
    )


def rhp_signature(
    df: DataFrame, dim: int, *, id_col: str = "vec_id", vec_col: str = "embedding",
    bits: int = 64, seed: int = 0x5EED,
) -> DataFrame:
    """(id, sig long): random-hyperplane sign signature.

    Hyperplanes are a deterministic (bits x dim) float matrix derived from
    splitmix64(seed, i, j) — identical on every executor and every run,
    no broadcast needed beyond closure capture.
    """
    idx = np.arange(bits * dim, dtype=np.uint64) + np.uint64(seed) * np.uint64(0x1000003)
    H = (splitmix64(idx).astype(np.float64) / 2.0**64 - 0.5).reshape(bits, dim)

    @pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        M = _as_matrix(v)
        signs = (M @ H.T) > 0  # (batch, bits)
        weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64))[None, :]
        sig = np.where(signs, weights, np.uint64(0)).sum(axis=1, dtype=np.uint64)
        return pd.Series(sig.view(np.int64))

    return df.select(F.col(id_col), F.col(vec_col), _sig(F.col(vec_col)).alias("sig"))


def rhp_band_keys(
    df: DataFrame, dim: int, *, id_col: str = "vec_id",
    vec_col: str = "embedding", bands: int = 16, block_bits: int = 8,
    seed: int = 0x5EED,
) -> DataFrame:
    """(id, vec, bks array<long>): per-band random-hyperplane bucket keys.

    ``bands`` independent groups of ``block_bits`` hyperplanes each (so
    bands*block_bits planes total — not limited to one 64-bit word).
    Hyperplanes are a deterministic splitmix64-derived matrix: identical
    on every executor and run, no broadcast needed beyond closure capture.
    """
    nplanes = bands * block_bits
    idx = np.arange(nplanes * dim, dtype=np.uint64) \
        + np.uint64(seed) * np.uint64(0x1000003)
    H = (splitmix64(idx).astype(np.float64) / 2.0**64 - 0.5).reshape(
        nplanes, dim)
    w = (np.uint64(1) << np.arange(block_bits, dtype=np.uint64))

    @pandas_udf("array<long>")
    def _keys(v: pd.Series) -> pd.Series:
        M = _as_matrix(v)
        signs = ((M @ H.T) > 0).reshape(len(M), bands, block_bits)
        keys = (signs * w[None, None, :]).sum(axis=2).astype(np.int64)
        return pd.Series(list(keys))

    return df.select(F.col(id_col), F.col(vec_col),
                     _keys(F.col(vec_col)).alias("bks"))


def rhp_lsh_topk(
    df: DataFrame, k: int, dim: int, *,
    id_col: str = "vec_id", vec_col: str = "embedding",
    bands: int = 16, bits: int = None, block_bits: int = None,
    target_bucket: int = 16, seed: int = 0x5EED, n_hint: int = None,
) -> DataFrame:
    """Approximate self top-k: candidates share >= 1 of ``bands`` band
    keys; exact cosine re-rank on candidates. Recall rises with bands and
    falls with block_bits; measured against cosine_self_topk in tests.

    ``block_bits`` defaults ADAPTIVELY to ~log2(n / target_bucket): bucket
    occupancy — and with it the per-query candidate count — stays bounded
    as n grows, so the candidate join is O(n * bands * target_bucket),
    never the O(n^2/buckets) cliff a fixed block size hits at scale.
    (``bits`` kept as a legacy alias: block_bits = bits // bands.)

    ``n_hint``: approximate row count used for the adaptive block_bits —
    pass it (e.g. from source metadata) to skip the ``df.count()``
    action; block_bits only needs log2(n) so any same-magnitude estimate
    gives the identical plan."""
    import math as _math

    if block_bits is None:
        if bits is not None:
            block_bits = max(1, bits // bands)
        else:
            n = n_hint if n_hint is not None else df.count()
            block_bits = min(24, max(3, _math.ceil(
                _math.log2(max(n, 2) / target_bucket))))
    keyed = rhp_band_keys(df, dim, id_col=id_col, vec_col=vec_col,
                          bands=bands, block_bits=block_bits, seed=seed)
    expl = keyed.select(
        F.col(id_col), F.col(vec_col),
        F.posexplode(F.col("bks")).alias("band", "bk"))
    # multiprobe (query side only): also probe every Hamming-1 bucket —
    # one sign-flip of a hyperplane is the most likely quantization miss
    # for a true neighbor, so this multiplies per-band hit probability
    # ~(1 + block_bits * (1-p)/p)x while the candidate volume stays
    # O(n * bands * block_bits * bucket) — linear in n, no n^2 cliff
    probes = F.array(F.col("bk"), *[
        F.col("bk").bitwiseXOR(F.lit(1 << j)) for j in range(block_bits)])
    # candidate pairs carry ONLY ids through the bucket join + dedup
    # shuffles; the (heavy) embedding arrays are attached afterwards with
    # two id-keyed joins against the n-row base table
    left = expl.select(F.col(id_col).alias("id_a"), "band",
                       F.explode(probes).alias("bk"))
    right = expl.select(F.col(id_col).alias("id_b"), "band", "bk")
    pairs = (left.join(right, ["band", "bk"])
             .filter(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b")
             .dropDuplicates(["id_a", "id_b"]))
    base = df.select(F.col(id_col), F.col(vec_col))
    # id_b join first, id_a join LAST: the second join leaves the data
    # hash-partitioned on id_a, which the top-k window below partitions
    # by — the planner reuses that exchange instead of adding one
    cands = (pairs
             .join(base.select(F.col(id_col).alias("id_b"),
                               F.col(vec_col).alias("vb")), "id_b")
             .join(base.select(F.col(id_col).alias("id_a"),
                               F.col(vec_col).alias("va")), "id_a"))

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = _normalize(_as_matrix(va))
        B = _normalize(_as_matrix(vb))
        return pd.Series(np.sum(A * B, axis=1))

    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(), F.col("id_b").asc())
    return (
        cands.withColumn("cosine", _cos(F.col("va"), F.col("vb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id_a").alias("qid"), F.col("id_b").alias("rid"), "cosine", "rank")
    )


def kmeans_codebook(
    df: DataFrame, nlist: int, dim: int, *,
    id_col: str = "vec_id", vec_col: str = "embedding",
    sample_rows: int = 65536, iters: int = 8, seed: int = 0x1FF,
    n_hint: int = None,
) -> np.ndarray:
    """Train an IVF coarse quantizer: Lloyd k-means on a DETERMINISTIC
    hash-sample of the table (smallest ``sample_rows`` xxhash64 keys — no
    RNG, resumable), driver-side numpy. The sample is bounded (<=
    sample_rows vectors), so training cost is independent of n — the
    classic IVF recipe (Jegou et al., PAMI 2011): codebooks are built on a
    sample, assignment is the distributed part. Returns (nlist, dim)
    float64, L2-normalized.

    Scale path: with ``n_hint`` (or a cheap count) a hash-THRESHOLD
    filter keeps only ~4x sample_rows rows before the sort, so at 100 TB
    the plan is scan + filter + tiny sort instead of a per-partition
    top-k over every row; the 4x oversample makes the threshold capture
    the global smallest sample_rows hashes with overwhelming probability,
    so the selected SET (and the codebook) is identical to the unfiltered
    global sort."""
    frac_key = F.abs(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
    sample = df.select(F.col(id_col), F.col(vec_col))
    n_total = n_hint if n_hint is not None else df.count()
    if n_total > 4 * sample_rows:
        # abs(xxhash64) is ~uniform on [0, 2^63); keep hash < p * 2^63
        p = min(1.0, (4.0 * sample_rows) / n_total)
        sample = sample.filter(frac_key < F.lit(int(p * 2.0**63)))
    sample = sample.orderBy(frac_key).limit(sample_rows)
    pdf = sample.toPandas()
    if pdf.empty:
        raise ValueError("kmeans_codebook: input table is empty")
    X = _normalize(_as_matrix(pdf[vec_col]))
    n = X.shape[0]
    if X.shape[1] != dim:
        raise ValueError(
            f"kmeans_codebook: vectors are {X.shape[1]}-dim, expected {dim}")
    nlist = max(1, min(nlist, n))
    # deterministic init: spread over the hash-ordered sample
    C = X[np.linspace(0, n - 1, nlist).astype(np.int64)].copy()
    for _ in range(iters):
        # cosine k-means: assign by max dot product, recenter + renorm
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(nlist):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def ivf_assign(
    df: DataFrame, codebook: np.ndarray, nprobe: int, *,
    vec_col: str = "embedding", out_col: str = "ivf_lists",
) -> DataFrame:
    """Nearest-``nprobe`` coarse-centroid ids per vector (one batch
    matmul against the broadcast codebook; no shuffle)."""
    C = np.ascontiguousarray(codebook, dtype=np.float64)

    @pandas_udf("array<int>")
    def _assign(v: pd.Series) -> pd.Series:
        X = _normalize(_as_matrix(v))
        S = X @ C.T
        top = np.argsort(-S, axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(top))

    return df.withColumn(out_col, _assign(F.col(vec_col)))


def ivf_topk(
    df: DataFrame, k: int, dim: int, *,
    id_col: str = "vec_id", vec_col: str = "embedding",
    nlist: int = None, nprobe: int = 8, n_assign: int = 2,
    n_hint: int = None, sample_rows: int = 65536, seed: int = 0x1FF,
) -> DataFrame:
    """Approximate self top-k via an IVF index — the second scale path
    next to rhp_lsh_topk, with complementary behavior: LSH is
    data-oblivious (fixed hyperplanes), IVF adapts its partitions to the
    actual vector distribution, which wins on clustered real-world
    embeddings.

    Plan shape (all linear in n): train codebook on a bounded sample
    (driver) -> broadcast it -> one matmul per Arrow batch assigns every
    vector to its list (data side: 1 list) and every query to its
    ``nprobe`` nearest lists AND every data vector to its ``n_assign``
    nearest lists (multi-assignment: with weak-neighbor embeddings a true
    pair often straddles a Voronoi boundary; indexing the runner-up list
    lifts measured recall@3 from ~0.77 to ~0.93 at the same nprobe) ->
    id-only equi-join on list id -> exact cosine re-rank -> per-query
    top-k window. nlist defaults to ~sqrt(n) (the IVF heuristic), giving
    mean list occupancy n_assign*n/nlist ~ sqrt(n) and per-query candidate
    count O(nprobe * n_assign * sqrt(n)) — total O(n^1.5), far under the
    O(n^2) brute-force cliff, and tunable: raising nlist trades recall
    for cost without changing the plan shape."""
    import math as _math

    n = n_hint if n_hint is not None else df.count()
    if nlist is None:
        nlist = max(4, min(65536, int(_math.sqrt(max(n, 4)))))
    nprobe = min(nprobe, nlist)
    n_assign = min(n_assign, nlist)
    C = kmeans_codebook(df, nlist, dim, id_col=id_col, vec_col=vec_col,
                        sample_rows=sample_rows, seed=seed, n_hint=n)
    assigned = ivf_assign(df.select(F.col(id_col), F.col(vec_col)), C,
                          max(nprobe, n_assign), vec_col=vec_col)
    # ids only through the join (embeddings attached after, same
    # rationale as rhp_lsh_topk)
    data = assigned.select(
        F.col(id_col).alias("id_b"),
        F.explode(F.slice(F.col("ivf_lists"), 1, n_assign)).alias("list_id"))
    qry = assigned.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.slice(F.col("ivf_lists"), 1, nprobe)).alias("list_id"))
    pairs = (qry.join(data, "list_id")
             .filter(F.col("id_a") != F.col("id_b"))
             .select("id_a", "id_b"))
    if n_assign > 1:  # multi-assigned pairs can meet in several lists
        pairs = pairs.dropDuplicates(["id_a", "id_b"])
    base = df.select(F.col(id_col), F.col(vec_col))
    cands = (pairs
             .join(base.select(F.col(id_col).alias("id_b"),
                               F.col(vec_col).alias("vb")), "id_b")
             .join(base.select(F.col(id_col).alias("id_a"),
                               F.col(vec_col).alias("va")), "id_a"))

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = _normalize(_as_matrix(va))
        B = _normalize(_as_matrix(vb))
        return pd.Series(np.sum(A * B, axis=1))

    w = Window.partitionBy("id_a").orderBy(F.col("cosine").desc(),
                                           F.col("id_b").asc())
    return (
        cands.withColumn("cosine", _cos(F.col("va"), F.col("vb")))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("id_a").alias("qid"), F.col("id_b").alias("rid"),
                "cosine", "rank")
    )


def cosine_self_topk(
    df: DataFrame, k: int, *, id_col: str = "vec_id", vec_col: str = "embedding",
    max_rows: int = 200_000,
) -> DataFrame:
    """Exact self top-k via broadcast brute force (table must fit driver —
    the test/oracle tier; ``rhp_lsh_topk`` above is the scale tier).

    Hard-guarded: refuses tables above ``max_rows`` instead of silently
    OOMing the driver — at scale use the LSH tier."""
    refs = df.select(id_col, vec_col).limit(max_rows + 1).toPandas()
    if len(refs) > max_rows:
        raise ValueError(
            f"cosine_self_topk is the exact/oracle tier (driver-collected); "
            f"table exceeds max_rows={max_rows}. Use rhp_lsh_topk at scale.")
    return cosine_knn_bruteforce(
        df, refs, k, q_id=id_col, q_vec=vec_col, r_id_col=id_col, r_vec_col=vec_col
    )

"""Deduplication operators for training-data pipelines.

Four tiers, all shuffle-aware:

  * exact_dedup          — md5 content hash + groupBy; one shuffle on the
                           hash key (near-uniform => no skew), keeps the
                           smallest doc_id as canonical. SQL-oracle-able.
  * minhash_lsh_pairs    — shingle -> 64-bit hash -> k min-hash permutations
                           -> band buckets -> candidate join -> exact
                           Jaccard verify. The scale path for near-dup at
                           10^9+ docs: cost is O(n * k) map-side plus a
                           self-join restricted to shared band buckets.
  * simhash64            — 64-bit SimHash signature column + hamming-
                           distance candidate pairing on rotated prefix
                           buckets.
  * ngram_jaccard_pairs  — exact pairwise Jaccard via shingle explode +
                           self-join on shingle (groupBy pair); quadratic
                           in bucket size, linear in corpus — the oracle /
                           small-corpus reference the LSH tier is verified
                           against. SQL-oracle-able.

Determinism: every hash is content-derived (md5 + fixed odd
multipliers, mod-2^64 wrap). No rand(), no process-salted hash() — resume
and the DuckDB oracle both depend on it.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Fixed odd multipliers/offsets for the k minhash permutations:
# perm_i(h) = (A[i]*h + B[i]) mod 2^64  (numpy uint64 wrap). Constants are
# capped < 2^62 so the DuckDB oracle can reproduce the arithmetic in
# HUGEINT (h*A < 2^64 * 2^62 = 2^126 < HUGEINT max) — see
# __spark_entry__.oracle_sql. Odd => bijective mod 2^64.
_MINHASH_A = [
    0x1E3779B97F4A7C15, 0x3F58476D1CE4E5B9, 0x14D049BB133111EB, 0x2545F4914F6CDD1D,
    0x3F51AFD7ED558CCD, 0x04CEB9FE1A85EC53, 0x16E8FEB86659FD93, 0x25A5A5A5A5A5A5A5,
]
_MINHASH_B = [
    0x0123456789ABCDEF, 0x3EDCBA9876543210, 0x0F1E2D3C4B5A6978, 0x1B2A39485766F5E4,
    0x1EADBEEFCAFEF00D, 0x123456789ABCDEF0, 0x0BAD5EED0BAD5EED, 0x1555AAAA5555AAAA,
]


def shingles(text: pd.Series, n: int = 3) -> list[list[str]]:
    """Lowercased whitespace-token n-gram shingles per document."""
    out = []
    for s in text:
        toks = (s or "").lower().split()
        if len(toks) < n:
            out.append([" ".join(toks)] if toks else [])
        else:
            out.append([" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)])
    return out


def _shingle_hash64(sh: str) -> np.uint64:
    """First 8 bytes of md5(shingle) as uint64 big-endian — chosen because
    DuckDB can reproduce it: ('0x' || substr(md5(s), 1, 16))::UINT64."""
    return np.uint64(int.from_bytes(hashlib.md5(sh.encode()).digest()[:8], "big"))


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_dups, canonical_id) for every duplicated content.

    At scale: md5 keys are uniform, so the single shuffle is skew-free;
    partial aggregation means the map side emits one row per distinct hash
    per task before shuffling.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def drop_exact_dups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one row (smallest id) per distinct content."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """(id, m0..m{k-1}) minhash signature columns (int64 bit patterns)."""
    assert num_hashes <= len(_MINHASH_A)
    A = np.array(_MINHASH_A[:num_hashes], dtype=np.uint64)
    B = np.array(_MINHASH_B[:num_hashes], dtype=np.uint64)
    fields = ", ".join(f"m{i} long" for i in range(num_hashes))

    @pandas_udf(fields)
    def _sig(text: pd.Series) -> pd.DataFrame:
        sh = shingles(text, shingle_n)
        out = np.zeros((len(text), num_hashes), dtype=np.uint64)
        counts = np.fromiter((len(d) for d in sh), dtype=np.int64,
                             count=len(sh))
        flat = [s for doc in sh for s in doc]
        if flat:
            md5 = hashlib.md5
            hs = np.fromiter(
                (int.from_bytes(md5(s.encode()).digest()[:8], "big")
                 for s in flat),
                dtype=np.uint64, count=len(flat))
            with np.errstate(over="ignore"):
                # one (k, total) permute + segment minima across the whole
                # Arrow batch — no per-doc numpy dispatch
                # sentinel column: the final reduceat segment runs to the
                # end of the array, so it must be the identity for min
                perm = np.concatenate(
                    [hs[None, :] * A[:, None] + B[:, None],
                     np.full((num_hashes, 1), np.iinfo(np.uint64).max,
                             dtype=np.uint64)], axis=1)
            bounds = np.zeros(len(sh), dtype=np.int64)
            np.cumsum(counts[:-1], out=bounds[1:])
            mins = np.minimum.reduceat(perm, bounds, axis=1).T
            nonempty = counts > 0
            out[nonempty] = mins[nonempty]
        return pd.DataFrame(
            {f"m{i}": out[:, i].view(np.int64) for i in range(num_hashes)}
        )

    sig = df.withColumn("_s", _sig(F.col(text_col)))
    return sig.select(F.col(id_col), *[F.col(f"_s.m{i}").alias(f"m{i}") for i in range(num_hashes)])


def connected_components(
    edges: DataFrame, a_col: str = "id_a", b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node long, component long): connected components of an undirected
    edge list, component = smallest node id in the component.

    Hash-to-min label propagation: every node repeatedly adopts the
    minimum label in its closed neighborhood. Converges in O(diameter)
    rounds — duplicate clusters have tiny diameters, so this is 2-4
    shuffles in practice; each round is a partial-aggregated groupBy on
    the node id (skew-free for dedup workloads where components are
    small). The loop stops early when a round changes no label.

    At 10^9+ nodes the per-round plan is: edges (static, cached) join
    labels (n rows) -> explode both directions -> min-agg. No driver
    collect; the only driver-side value per round is the changed-count.
    """
    sym = edges.select(
        F.col(a_col).cast("long").alias("src"),
        F.col(b_col).cast("long").alias("dst"),
    ).unionByName(edges.select(
        F.col(b_col).cast("long").alias("src"),
        F.col(a_col).cast("long").alias("dst"),
    )).distinct()
    sym.persist()
    labels = sym.select(F.col("src").alias("node")).distinct() \
        .withColumn("component", F.col("node"))
    for _ in range(max_iter):
        # neighbor labels + own label -> min
        nbr = sym.join(labels.withColumnRenamed("node", "dst"), "dst") \
            .select(F.col("src").alias("node"), "component")
        new_labels = labels.unionByName(nbr).groupBy("node").agg(
            F.min("component").alias("component"))
        new_labels.persist()
        changed = new_labels.alias("n").join(
            labels.alias("o"), "node").filter(
            F.col("n.component") != F.col("o.component")).count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_clusters(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.5, shingle_n: int = 3,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size): near-duplicate clusters.

    ``pairs`` defaults to the exact n-gram Jaccard pair set (the
    oracle-parity tier); pass ``minhash_lsh_pairs(...)`` output for the
    O(n) banded scale tier — the clustering step is identical."""
    if pairs is None:
        pairs = ngram_jaccard_pairs(df, threshold=threshold,
                                    text_col=text_col, id_col=id_col,
                                    shingle_n=shingle_n)
    comp = connected_components(pairs, "id_a", "id_b")
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    labeled = comp.join(sizes, "component").select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        "cluster_size")
    # singletons: docs in no pair form their own cluster of size 1
    singles = df.select(id_col).join(labeled.select(id_col), id_col,
                                     "left_anti").select(
        F.col(id_col),
        F.col(id_col).cast("long").alias("cluster_id"),
        F.lit(1).cast("long").alias("cluster_size"))
    return labeled.unionByName(singles)


def minhash_signatures_xx(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, shingle_n: int = 3,
) -> DataFrame:
    """(id, m0..m{k-1}) minhash signatures computed ENTIRELY JVM-side —
    the 100 TB scale tier.

    Tokenization, shingling, hashing (xxhash64 seeded per permutation) and
    the per-doc minima all run inside whole-stage codegen: a map-only
    explode followed by a partial-aggregated groupBy — no Python boundary,
    no per-row interpreter work. The md5-based ``minhash_signatures``
    stays as the DuckDB-oracle-parity tier; LSH banding downstream is
    identical for both (xx signatures are just a different permutation
    family, equally uniform).
    """
    # materialize the token array as a projected column FIRST: referencing
    # the split(...) expression inside the transform() lambda would
    # re-evaluate the regex split per shingle (no CSE across higher-order
    # function boundaries) — O(tokens^2) regex work per document
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                 lambda w: w != F.lit("")).alias("_w"))
    words = F.col("_w")
    sh = F.when(
        F.size(words) == 0, F.array()
    ).when(
        F.size(words) < shingle_n,
        F.array(F.array_join(words, " ")),
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - shingle_n + 1),
            lambda i: F.array_join(F.slice(words, i, shingle_n), " "),
        )
    )
    df = toks
    # explode_outer keeps empty docs as one NULL-shingle row, so the
    # all-zero-sig convention for empties (same as the md5 tier) falls out
    # of a conditional min + coalesce — ONE pass over the corpus, no
    # anti-join (which would recompute the whole explode+agg branch)
    exploded = df.select(F.col(id_col), F.explode_outer(sh).alias("_sh"))
    aggs = [
        F.coalesce(
            F.min(F.when(F.col("_sh").isNotNull(),
                         F.xxhash64(F.lit(i), F.col("_sh")))),
            F.lit(0).cast("long"),
        ).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 8, bands: int = 4, shingle_n: int = 3,
    jaccard_threshold: float = 0.7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    Plan: signatures (one UDF pass, no shuffle) -> band keys -> self-join
    per band (shuffle on band hash — uniform) -> distinct candidates ->
    exact Jaccard verification via shingle-set intersection UDF on the
    candidate pairs only. Candidates are a vanishing fraction of n^2, which
    is the entire point of LSH at 10^12 scale.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)

    band_cols = []
    for b in range(bands):
        cols = [F.col(f"m{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.xxhash64(F.lit(b), *cols).alias(f"band{b}"))
    sig_b = sig.select(id_col, *band_cols)

    cands = None
    for b in range(bands):
        left = sig_b.select(F.col(id_col).alias("id_a"), F.col(f"band{b}").alias("bk"))
        right = sig_b.select(F.col(id_col).alias("id_b"), F.col(f"band{b}").alias("bk"))
        pairs = left.join(right, "bk").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
        cands = pairs if cands is None else cands.unionByName(pairs)
    cands = cands.distinct()

    # exact verify on candidates only
    texts = df.select(F.col(id_col), F.col(text_col))
    joined = (
        cands.join(texts.withColumnRenamed(id_col, "id_a").withColumnRenamed(text_col, "_ta"), "id_a")
        .join(texts.withColumnRenamed(id_col, "id_b").withColumnRenamed(text_col, "_tb"), "id_b")
    )

    @pandas_udf("double")
    def _jacc(ta: pd.Series, tb: pd.Series) -> pd.Series:
        sa = shingles(ta, shingle_n)
        sb = shingles(tb, shingle_n)
        out = np.empty(len(ta))
        for i, (x, y) in enumerate(zip(sa, sb)):
            X, Y = set(x), set(y)
            u = len(X | Y)
            out[i] = (len(X & Y) / u) if u else 1.0
        return pd.Series(out)

    return (
        joined.withColumn("jaccard", _jacc(F.col("_ta"), F.col("_tb")))
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------

def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash long): sign-aggregated 64-bit token-hash fingerprint."""

    @pandas_udf("long")
    def _sim(text: pd.Series) -> pd.Series:
        # first 8 bytes of md5 per token, big-endian — chosen so the DuckDB
        # oracle reproduces it exactly: ('0x' || substr(md5(t),1,16))::UBIGINT.
        # Bit unpack + sign aggregation run batch-wide (segment reduceat),
        # not per doc/token.
        docs = [(s or "").lower().split() for s in text]
        out = np.zeros(len(text), dtype=np.uint64)
        counts = np.fromiter((len(d) for d in docs), dtype=np.int64,
                             count=len(docs))
        flat = [t for d in docs for t in d]
        if flat:
            md5 = hashlib.md5
            hs = np.fromiter(
                (int.from_bytes(md5(t.encode()).digest()[:8], "big")
                 for t in flat),
                dtype=np.uint64, count=len(flat))
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int8)
            contrib = np.concatenate(
                [bits * np.int8(2) - np.int8(1),
                 np.zeros((1, 64), dtype=np.int8)], axis=0)
            bounds = np.zeros(len(docs), dtype=np.int64)
            np.cumsum(counts[:-1], out=bounds[1:])
            acc = np.add.reduceat(contrib.astype(np.int32), bounds, axis=0)
            sim = ((acc > 0).astype(np.uint64)
                   << np.arange(64, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64)
            nonempty = counts > 0
            out[nonempty] = sim[nonempty]
        return pd.Series(out.view(np.int64))

    return df.select(F.col(id_col), _sim(F.col(text_col)).alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 3, rotations: int = 4,
) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming via the rotate-and-prefix
    trick: a pair within distance d shares an identical 16-bit block in at
    least one of 4 rotations (pigeonhole, d <= 3 < 4 blocks)."""
    sig = simhash64(df, text_col, id_col)
    cands = None
    for rot in range(rotations):
        shift = 16 * rot
        block = F.shiftrightunsigned(F.col("simhash"), shift).bitwiseAND(F.lit(0xFFFF))
        s = sig.withColumn("bk", F.concat(F.lit(rot * 100000), block.cast("long")))
        left = s.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "bk")
        right = s.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "bk")
        p = left.join(right, "bk").filter(F.col("id_a") < F.col("id_b"))
        cands = p if cands is None else cands.unionByName(p)
    cands = cands.select("id_a", "id_b", "sh_a", "sh_b").distinct()
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.withColumn("hamming", ham.cast("int")).filter(
        F.col("hamming") <= max_hamming
    ).select("id_a", "id_b", "hamming")


# ---------------------------------------------------------------------------
# exact n-gram jaccard (reference tier / oracle)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    shingle_n: int = 3, threshold: float = 0.5,
) -> DataFrame:
    """Exact all-pairs Jaccard >= threshold via relational set algebra:
    explode distinct shingles, self-join on shingle, count intersections,
    inclusion-exclusion for the union. Fully SQL-expressible (the DuckDB
    oracle runs the identical algebra), linear shuffle in total shingle
    volume; only pairs sharing >= 1 shingle ever materialize.
    """

    @pandas_udf("array<string>")
    def _sh(text: pd.Series) -> pd.Series:
        return pd.Series([sorted(set(s)) for s in shingles(text, shingle_n)])

    ex = df.select(F.col(id_col), F.explode(_sh(F.col(text_col))).alias("sh"))
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))

    a = ex.select(F.col(id_col).alias("id_a"), "sh")
    b = ex.select(F.col(id_col).alias("id_b"), "sh")
    inter = (
        a.join(b, "sh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a")
        .join(sz_b, "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )

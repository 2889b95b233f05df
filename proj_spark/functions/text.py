"""Text analysis for large-scale training-data pipelines.

Everything here is either a pure Column expression (JVM codegen, pushes
down, oracle-checkable in ANSI SQL) or a vectorized pandas UDF (the rolling
fingerprint, where per-token iteration genuinely needs numpy).

Semantics are pinned so a DuckDB oracle can reproduce them exactly:
token = maximal run of non-whitespace after trim(); all ratios are plain
double divisions rounded at the query layer, not here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# Tiny English function-word list for the language-ID heuristic. Kept SHORT
# and frozen: the oracle SQL must embed the identical list.
EN_STOPWORDS = ("the", "a", "an", "and", "of", "to", "in", "is", "for", "on")

_WS = r"\s+"


def tokens(text: Column) -> Column:
    """array<string> of whitespace-delimited tokens (empty text -> ['''])."""
    return F.split(F.trim(text), _WS)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    """Mean token length = non-space chars / token count."""
    nonspace = F.length(F.regexp_replace(text, _WS, ""))
    return nonspace / token_count(text)


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    n = F.length(text)
    p = n - F.length(F.regexp_replace(text, r"[!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, p / n).otherwise(F.lit(0.0))


def upper_ratio(text: Column) -> Column:
    n = F.length(text)
    u = n - F.length(F.regexp_replace(text, "[A-Z]", ""))
    return F.when(n > 0, u / n).otherwise(F.lit(0.0))


def digit_ratio(text: Column) -> Column:
    n = F.length(text)
    d = n - F.length(F.regexp_replace(text, "[0-9]", ""))
    return F.when(n > 0, d / n).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are English function words (lowercased)."""
    toks = F.split(F.trim(F.lower(text)), _WS)
    sw = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits / F.size(toks)


def is_english_heuristic(text: Column, threshold: float = 0.05) -> Column:
    """Language ID by function-word density — the classic cheap n-gram-free
    heuristic; real pipelines swap in fastText at this exact call site."""
    return (stopword_ratio(text) >= threshold).cast("boolean")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: length band + low punct/digit noise +
    plausible mean token length. Weights are arbitrary but FROZEN (oracle
    reproduces them)."""
    n = char_count(text).cast("double")
    len_band = F.when((n >= 200) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    atl = avg_token_len(text)
    tok_band = F.when((atl >= 2.0) & (atl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.3))
    noise = punct_ratio(text) + digit_ratio(text)
    noise_band = F.when(noise <= 0.2, F.lit(1.0)).otherwise(F.lit(0.2))
    return (0.4 * len_band + 0.3 * tok_band + 0.3 * noise_band).cast("double")


# ---------------------------------------------------------------------------
# document fingerprint (rolling hash) — pandas UDF tier
# ---------------------------------------------------------------------------

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _fnv1a_bytes_vec(texts: pd.Series) -> np.ndarray:
    """FNV-1a over utf-8 bytes, vectorized ACROSS the batch: the chain is
    inherently sequential per document, so iterate over byte POSITIONS
    (max doc length steps) with the whole batch updated per step — one
    numpy op per position instead of one Python op per byte per doc."""
    enc = [(s or "").encode("utf-8") for s in texts]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    L = int(lens.max()) if n else 0
    M = np.zeros((n, max(L, 1)), dtype=np.uint64)
    for k, b in enumerate(enc):
        if b:
            M[k, :len(b)] = np.frombuffer(b, dtype=np.uint8)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wrap is the algorithm
        for i in range(L):
            act = lens > i
            if not act.any():
                break
            h = np.where(act, (h ^ M[:, i]) * _FNV_PRIME, h)
    return h


_FP64 = None


def fingerprint64(text: Column) -> Column:
    """64-bit FNV-1a content fingerprint (order-sensitive, byte-exact).

    UDF is created lazily — pandas_udf needs an active SparkSession, which
    doesn't exist at import time.
    """
    global _FP64
    if _FP64 is None:
        @pandas_udf("long")
        def _fp(t: pd.Series) -> pd.Series:
            return pd.Series(_fnv1a_bytes_vec(t).view(np.int64))
        _FP64 = _fp
    return _FP64(text)


def rolling_fingerprints(window: int = 50):
    """pandas UDF text -> array<long>: polynomial rolling hashes of
    ``window``-token spans (near-dup span detection / dedup at passage
    granularity). mod-2^64 wrap arithmetic, base 1099511628211.

    Fully batch-vectorized: token hashes come from the byte-position FNV-1a
    kernel over the batch's flattened token list (content-deterministic
    across executors, unlike the process-salted builtin hash), and the
    rolling recurrence h_{j+1} = h_j*base + t_{j+w} - t_j*base^w is computed
    in closed form h_j = sum_i t_{j+i} * base^(w-1-i) as one sliding-window
    dot product over the whole batch — no per-token Python anywhere."""
    base = np.uint64(0x100000001B3)
    # powers [base^(w-1), ..., base, 1] via wrapping multiplies (numpy **
    # on uint64 is not a reliable modular power)
    p = np.empty(window, dtype=np.uint64)
    p[window - 1] = np.uint64(1)
    with np.errstate(over="ignore"):
        for i in range(window - 2, -1, -1):
            p[i] = p[i + 1] * base

    @pandas_udf("array<long>")
    def _udf(text: pd.Series) -> pd.Series:
        toks_per_doc = [(s or "").lower().split() for s in text]
        lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                           count=len(toks_per_doc))
        flat = [t for doc in toks_per_doc for t in doc]
        th = (_fnv1a_bytes_vec(pd.Series(flat)) if flat
              else np.empty(0, dtype=np.uint64))
        starts = np.zeros(len(lens), dtype=np.int64)
        if len(lens) > 1:
            starts[1:] = np.cumsum(lens)[:-1]
        # one sliding dot product over the flat batch; windows straddling a
        # doc boundary are computed then discarded (~w wasted per doc).
        # chunked so the (N, w) product stays ~tens of MB.
        hflat = np.empty(max(len(th) - window + 1, 0), dtype=np.uint64)
        if len(th) >= window:
            sw = np.lib.stride_tricks.sliding_window_view(th, window)
            step = max(1 << 18, window)
            with np.errstate(over="ignore"):  # mod-2^64 wrap IS the algorithm
                for lo in range(0, sw.shape[0], step):
                    blk = sw[lo:lo + step]
                    hflat[lo:lo + blk.shape[0]] = (blk * p).sum(
                        axis=1, dtype=np.uint64)
        out = []
        with np.errstate(over="ignore"):
            for st, ln in zip(starts, lens):
                if ln == 0:
                    out.append([])
                elif ln <= window:
                    h = (th[st:st + ln] * p[window - ln:]).sum(dtype=np.uint64)
                    out.append([np.int64(h)])
                else:
                    out.append(hflat[st:st + ln - window + 1]
                               .view(np.int64).tolist())
        return pd.Series(out)

    return _udf

"""Bloom-filter-accelerated exact dedup of a new batch against a corpus.

The standard shape for INCREMENTAL corpus ingestion at 100 TB: the seen
corpus is huge, the incoming batch is small, and a plain dedup join would
shuffle the corpus on every ingest. Instead:

1. **Build** (once per corpus version, cost = one corpus scan): every
   document's content hash sets ``K`` bits in an ``M``-bit Bloom filter.
   The only driver-side data is the DISTINCT SET BIT POSITIONS —
   bounded by ``M`` (a design constant, default 2^20 ≈ 130 KiB of
   bitmap), never by corpus size. Public LLM pipelines use exactly this
   structure for paragraph/document membership (e.g. Dolma's Bloom-based
   dedup); CCNet and C4 shard hashes for the same reason.
2. **Probe** (per batch, map-only): the bitmap broadcasts to executors;
   an Arrow-batched pandas UDF checks each batch row's K positions with
   vectorized numpy — no shuffle, no JVM↔driver traffic per row.
3. **Verify** (exactness): Bloom filters have false positives but ZERO
   false negatives, so rows whose bits are all set — and only those —
   are confirmed with an exact semi-join against the corpus hashes.
   The final answer is therefore EXACTLY the join result while the
   join's left side shrank from |batch| to |candidates| (≈ true dups +
   fp_rate·|batch|); at the default sizing the verify join touches ~1%
   of a disjoint batch.

The position formula is the same universal-hash family the MinHash
fragments use — ``((A_i·(h mod P) + B_i) mod P) mod M`` over the 56-bit
md5 content hash — rendered identically in Spark SQL (build side) and
numpy (probe side); ``tests/test_datapipe.py`` pins the two renderings
bit-equal.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine_spark.datapipe.fragments import MINHASH_P, Dialect, _lcg

BLOOM_M = 1 << 20  #: filter size in bits (130 KiB bitmap)
BLOOM_K = 5        #: hash functions per key

#: deterministic universal-hash coefficients (distinct from the MinHash
#: family's draws: different seed).
_rng = _lcg(0xB100F)
BLOOM_A = [next(_rng) % (10**9) + 1 for _ in range(BLOOM_K)]
BLOOM_B = [next(_rng) % (10**9) for _ in range(BLOOM_K)]


def content_hash56(d: Dialect, text: str = "text") -> str:
    """56-bit content hash both engines agree on (case-normalized)."""
    return d.hash56(f"lower({text})")


def _positions_sql(h: str, m: int = BLOOM_M) -> str:
    """Spark SQL array of the K bit positions for hash column ``h``."""
    terms = ", ".join(
        f"cast((({a} * ({h} % {MINHASH_P}) + {b}) % {MINHASH_P}) % {m} as bigint)"
        for a, b in zip(BLOOM_A, BLOOM_B)
    )
    return f"array({terms})"


def _positions_np(h: np.ndarray, m: int = BLOOM_M) -> np.ndarray:
    """(n,) int64 hashes → (n, K) int64 bit positions; same formula as
    :func:`_positions_sql`. ``h % P < 2^32`` and ``A < 2^30`` keep every
    intermediate under 2^62 — exact in int64, matching SQL bigint."""
    hp = h.astype(np.int64) % MINHASH_P
    cols = [
        ((a * hp + b) % MINHASH_P) % m for a, b in zip(BLOOM_A, BLOOM_B)
    ]
    return np.stack(cols, axis=1)


def build_bloom(
    df: DataFrame, hash_col: str, m: int = BLOOM_M
) -> np.ndarray:
    """Corpus hashes → packed uint8 bitmap of length ``m/8``.

    Distributed: positions are computed and DISTINCTed cluster-side (one
    shuffle of (position) ints, ≤ m distinct values); the driver collects
    only the distinct positions — O(m) by construction.
    """
    pos = (
        df.select(F.explode(F.expr(_positions_sql(hash_col, m))).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(m // 8, dtype=np.uint8)
    if pos:
        p = np.array([r["p"] for r in pos], dtype=np.int64)
        np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
    return bits


def bloom_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    m: int = BLOOM_M,
) -> DataFrame:
    """(batch doc_id, text) vs corpus → (doc_id, text_hash, is_dup).

    ``is_dup`` is EXACT (identical to a plain semi-join on the content
    hash): the Bloom probe only prunes the verify join's input.
    """
    d = Dialect("spark")
    spark = batch.sparkSession
    h_expr = content_hash56(d, text_col)
    corpus_h = corpus.select(F.expr(h_expr).alias("h"))
    bits_bc = spark.sparkContext.broadcast(build_bloom(corpus_h, "h", m))

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h: pd.Series) -> pd.Series:
        bits = bits_bc.value
        pos = _positions_np(h.to_numpy(np.int64), m)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1).astype(bool))

    hashed = batch.select(
        "doc_id",
        F.expr(f"md5(lower({text_col}))").alias("text_hash"),
        F.expr(h_expr).alias("h"),
    )
    cand = hashed.filter(maybe_seen(F.col("h")))
    verified = cand.join(
        corpus.select(
            F.expr(f"md5(lower({text_col}))").alias("text_hash")
        ).distinct(),
        "text_hash",
        "left_semi",
    ).select("doc_id", F.lit(True).alias("is_dup"))
    return (
        hashed.select("doc_id", "text_hash")
        .join(verified, "doc_id", "left")
        .select(
            "doc_id",
            "text_hash",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )

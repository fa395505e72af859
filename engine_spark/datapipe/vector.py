"""Arrow-batched vector kernels: the production scale path for embedding ops.

The oracle-gated queries in ``datapipe/queries.py`` compute dot products as
Catalyst higher-order-function folds, because a left-fold evaluates in the
same order in Spark and DuckDB and therefore hashes bit-identically — the
property the cross-engine correctness gate needs. But Spark interprets HOF
lambdas row-at-a-time (they never enter whole-stage codegen), so at 100 TB
the folds burn executor CPU on every row.

This module provides the same kernels as vectorized pandas UDFs: Arrow
moves columns to Python in batches, numpy does the math as matrix ops.
Measured at sf0.1 / local[32] (best-of-2, steady state):

| kernel                                  | HOF fold | Arrow+numpy |
|-----------------------------------------|----------|-------------|
| hyperplane bucketing (64×dim-16 / row)  | 0.87 s   | 0.21 s (4.1×)|
| pair cosine verify (53k pairs, dim 64)  | 0.78 s   | 0.32 s (2.4×)|

Divergence vs the fold: ≤ 4e-16 (numpy pairwise summation vs strict
left-fold — last-bit noise). Gates keep the fold so both engines agree
bit-for-bit; production pipelines at scale should use these.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def hyperplane_buckets_udf(planes: list[list[list[float]]], proj_dim: int) -> Column:
    """Column factory: all LSH-table bucket ids of an ``array<double>``
    column in one matrix multiply per Arrow batch.

    ``planes`` is tables × bits × dim (the same deterministic hyperplanes
    the fold path inlines as literals). Returns ``array<int>`` of one
    bucket id per table.
    """
    P = np.asarray(planes, dtype=np.float64)[:, :, :proj_dim]  # T x B x D
    PM = P.reshape(-1, proj_dim).T  # D x (T*B)
    W = 1 << np.arange(P.shape[1])  # bit weights within a table

    @pandas_udf("array<int>")
    def _buckets(vd: pd.Series) -> pd.Series:
        M = np.vstack(vd.map(lambda v: v[:proj_dim]).to_numpy())
        S = (M @ PM) >= 0
        S = S.reshape(len(M), P.shape[0], P.shape[1])
        return pd.Series(list((S * W).sum(axis=2).astype("int32")))

    return _buckets


def cosine_udf() -> Column:
    """Pairwise cosine of two ``array<double>`` columns, one numpy pass per
    Arrow batch."""

    @pandas_udf("double")
    def _cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        A = np.vstack(va.to_numpy())
        B = np.vstack(vb.to_numpy())
        d = (A * B).sum(axis=1)
        na = np.linalg.norm(A, axis=1)
        nb = np.linalg.norm(B, axis=1)
        return pd.Series(d / (na * nb))

    return _cos


def dedup_embedding_cosine_arrow(
    vectors: DataFrame,
    planes: list[list[list[float]]],
    proj_dim: int,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "vd",
    bucket_cap: int = 128,
) -> DataFrame:
    """The dedup_embedding_cosine flow with Arrow kernels in both hot spots.

    Identical plan shape to the gated query — row-local signatures, bucket
    keys as the only join keys, occupancy-capped buckets (groups over
    ``bucket_cap`` members are excluded: they are mass-duplicate clusters,
    exact-hash dedup's job — the cap bounds the within-bucket self-join to
    ≤ cap²/2 pairs per bucket at ANY corpus size), exact verify on
    candidates only — but the 64 projections/row and the per-pair cosine
    run as numpy matrix ops. At corpus scale also raise the table bit
    width so expected occupancy stays ≪ cap (bits ≈ log2(N / 32)).
    Returns ``(vec_a, vec_b, cos_sim)``.
    """
    buckets = hyperplane_buckets_udf(planes, proj_dim)
    # cached: one row per vector with its 8 bucket ids — the count branch
    # and both self-join sides read it instead of re-running the UDF
    sig = (
        vectors.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
        .withColumn("bks", buckets("v"))
        .cache()
    )
    tabs = sig.select(
        "vid", F.posexplode("bks").alias("tab", "bucket")
    )
    # Occupancy cap via groupBy-count + keyed semi-join, NOT a window: a
    # window partitioned by (tab, bucket) funnels a mass-duplicate corpus
    # — the exact regime this cap exists for — through ONE unsplittable
    # window task before the filter can drop the hot bucket, and AQE skew
    # handling applies to joins only. The groupBy partial-aggregates
    # map-side (a hot bucket ships one row per map task, keys-only
    # projection off the cached sig) and AQE broadcasts the eligible list
    # or skew-splits the semi join at runtime.
    eligible = (
        sig.select(F.posexplode("bks").alias("tab", "bucket"))
        .groupBy("tab", "bucket")
        .count()
        .filter(F.col("count") <= bucket_cap)
        .drop("count")
    )
    tabs = tabs.join(eligible, ["tab", "bucket"], "semi")
    # keys-only candidate generation (guide §2.3 / §8: every shuffle but
    # the last moves a lightweight proxy): the self-join and the pair
    # dedup shuffle (vid, vid) int pairs — the r13 shape carried the full
    # vector payload through BOTH exchanges (8 copies per vector through
    # the self-join, one more through dropDuplicates). The payload is
    # re-attached ONCE from the cached sig for the verify kernel.
    cand = (
        tabs.alias("a")
        .join(
            tabs.alias("b"),
            (F.col("a.tab") == F.col("b.tab"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") < F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    vs = sig.select("vid", "v")
    cand = cand.join(
        vs.withColumnsRenamed({"vid": "vec_a", "v": "va"}), "vec_a"
    ).join(vs.withColumnsRenamed({"vid": "vec_b", "v": "vb"}), "vec_b")
    cos = cosine_udf()
    return (
        cand.withColumn("cos_sim", cos("va", "vb"))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )


def lsh_bits_for(n_vectors: int, target_occupancy: int = 32,
                 min_bits: int = 8, max_bits: int = 24) -> int:
    """Table bit-width that keeps EXPECTED bucket occupancy near
    ``target_occupancy`` on hash-uniform data: bits = ceil(log2(n /
    target)), clamped. This is the corpus-size knob the fixed-constant
    gate pins for its oracle (LSH_BITS=8 suits the sf-scale testdata);
    a production run sizes tables from its actual corpus so the
    bucket-cap exclusion stays a SKEW guard (mass-duplicate clusters),
    not a capacity limit: with occupancy ~32 against cap 128, only
    >4x-overdense buckets drop."""
    if n_vectors <= 0:
        return min_bits
    bits = max(0, (max(1, (n_vectors + target_occupancy - 1)
                       // target_occupancy) - 1).bit_length())
    return max(min_bits, min(max_bits, bits))


def embedding_pairs(
    vectors: DataFrame,
    proj_dim: int = 16,
    tables: int = 8,
    threshold: float = 0.8,
    bucket_cap: int = 128,
    bits: int | None = None,
    n_vectors: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "vd",
) -> DataFrame:
    """Corpus-size-aware near-dup pairs: the production entry point over
    ``dedup_embedding_cosine_arrow``. When ``bits`` is not given it is
    derived from the corpus size via :func:`lsh_bits_for` (one count()
    of the input — a scan, paid once, versus a quadratic blow-up risk
    from under-sized tables). Hyperplanes are the same deterministic
    LCG family the gate inlines, at the chosen width."""
    from engine_spark.datapipe import fragments as FR

    if bits is None:
        if n_vectors is None:
            n_vectors = vectors.count()
        bits = lsh_bits_for(n_vectors)
    planes = FR.hyperplanes(tables, bits, proj_dim)
    return dedup_embedding_cosine_arrow(
        vectors, planes, proj_dim, threshold,
        id_col=id_col, vec_col=vec_col, bucket_cap=bucket_cap,
    )

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
    sig = vectors.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("v")
    ).withColumn("bks", buckets("v"))
    tabs = sig.select(
        "vid", "v", F.posexplode("bks").alias("tab", "bucket")
    )
    # window-count cap (not groupBy+semi-join): the bucket UDF runs once,
    # the count rides the same (tab, bucket) shuffle the self-join needs
    from pyspark.sql import Window as _W

    tabs = (
        tabs.withColumn(
            "bsz", F.count(F.lit(1)).over(_W.partitionBy("tab", "bucket"))
        )
        .filter(F.col("bsz") <= bucket_cap)
        .drop("bsz")
    )
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
            F.col("a.v").alias("va"),
            F.col("b.vid").alias("vec_b"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    cos = cosine_udf()
    return (
        cand.withColumn("cos_sim", cos("va", "vb"))
        .filter(F.col("cos_sim") >= threshold)
        .select("vec_a", "vec_b", "cos_sim")
    )

"""Deterministic sampling for training-data pipelines.

`df.sample()` is seed-dependent per partitioning and not reproducible
across engines or re-partitions; these operators sample by CONTENT HASH,
so the same row is always in or out — reproducible across runs, engines,
cluster sizes, and incremental reprocessing (a re-run of one partition
selects the same rows). Standard technique for train/eval splits.

All row-local (map-only): hash56(key) % DENOM < rate * DENOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from engine_spark.datapipe.fragments import Dialect

DENOM = 1_000_000


def _bucket_expr(d: Dialect, key: str, salt: str) -> str:
    """Uniform bucket in [0, DENOM) from the md5 of (salt || key)."""
    salted = f"concat('{salt}', {key})"
    return f"({d.hash56(salted)} % {DENOM})"


def hash_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = "s0", dialect=None
) -> DataFrame:
    """Keep ~rate of rows, chosen by content hash of ``key_col``."""
    d = dialect or Dialect("spark")
    return df.filter(
        F.expr(f"{_bucket_expr(d, key_col, salt)} < {int(rate * DENOM)}")
    )


def train_eval_split(
    df: DataFrame, key_col: str, eval_rate: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, reproducible train/eval split."""
    d = Dialect("spark")
    cut = int(eval_rate * DENOM)
    b = _bucket_expr(d, key_col, salt)
    return (
        df.filter(F.expr(f"{b} >= {cut}")),
        df.filter(F.expr(f"{b} < {cut}")),
    )


def stratified_hash_sample(
    df: DataFrame, key_col: str, strata_col: str, rates: dict[str, float],
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum rates (e.g. downsample dominant languages)."""
    d = Dialect("spark")
    b = _bucket_expr(d, key_col, salt)
    cond = F.lit(False)
    for stratum, rate in rates.items():
        cond = cond | (
            (F.col(strata_col) == stratum) & F.expr(f"{b} < {int(rate * DENOM)}")
        )
    return df.filter(cond)

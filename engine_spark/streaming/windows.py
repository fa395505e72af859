"""Streaming window builders — the incremental execution of the batch
window semantics in operators/windows.py.

Native Spark streaming handles every time-based window; count-based
windows (length/lengthBatch — reference window/mod.rs:63,645) need keyed
state because arrival *count* isn't a Catalyst concept; they live in
``state.py`` (applyInPandasWithState).

Watermark choice: the reference has no late-data machinery (SURVEY §1) — a
0-delay watermark reproduces its semantics exactly; pass ``late`` to be
strictly more tolerant than the reference.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    late: str = "0 seconds",
) -> DataFrame:
    """timeBatch(d)/TUMBLING — streaming groupBy(window); append-mode
    emission when the watermark passes window end (the reference's batch
    flush, window/mod.rs:965)."""
    out = (
        df.withWatermark(ts_col, late)
        .groupBy(F.window(F.col(ts_col), duration), *[F.col(c) for c in group_by])
        .agg(*aggs)
    )
    return out.withColumn("window_start", F.col("window.start")).withColumn(
        "window_end", F.col("window.end")
    ).drop("window")


def hopping(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    late: str = "0 seconds",
) -> DataFrame:
    """SLIDING(size, slide) — native hopping window (the reference parses
    this and errors; converter.rs:659-667)."""
    out = (
        df.withWatermark(ts_col, late)
        .groupBy(
            F.window(F.col(ts_col), duration, slide),
            *[F.col(c) for c in group_by],
        )
        .agg(*aggs)
    )
    return out.withColumn("window_start", F.col("window.start")).withColumn(
        "window_end", F.col("window.end")
    ).drop("window")


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    late: str = "0 seconds",
) -> DataFrame:
    """session(gap[, key]) — native session_window with state-store session
    merging (replaces the reference's 1,900-LoC session processor)."""
    out = (
        df.withWatermark(ts_col, late)
        .groupBy(
            F.session_window(F.col(ts_col), gap),
            *[F.col(c) for c in group_by],
        )
        .agg(*aggs)
    )
    return out.withColumn("session_start", F.col("session_window.start")).withColumn(
        "session_end", F.col("session_window.end")
    ).drop("session_window")

"""Timestamp-type-agnostic epoch conversions.

The driver's parquet stores event time as TIMESTAMP_NTZ (naive,
isAdjustedToUTC=false); user streams may carry TIMESTAMP (TZ-adjusted).
Direct ``cast(ts as long/double)`` and ``unix_micros(ts)`` are legal only on
TIMESTAMP, so every operator that needs epoch arithmetic (range frames,
time-bounded join conditions, delay computations) routes through these
helpers. The intermediate ``cast(ts as timestamp)`` is exact — the session
time zone is pinned to UTC in engine_spark.session.get_spark, so an NTZ
wall-clock maps to the identical epoch the DuckDB oracle computes.

All helpers are pure Catalyst expressions (whole-stage-codegen'd; never a
Python hop).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_ts(c: Column | str) -> Column:
    """Normalize TIMESTAMP_NTZ → TIMESTAMP (no-op on TIMESTAMP)."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp")


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds as BIGINT (truncating) — range-frame ORDER BY key."""
    return as_ts(c).cast("long")


def epoch_seconds_d(c: Column | str) -> Column:
    """Epoch seconds as DOUBLE (microsecond-precise fraction)."""
    return as_ts(c).cast("double")


def epoch_micros(c: Column | str) -> Column:
    """Exact integer microseconds since the epoch."""
    return F.unix_micros(as_ts(c))

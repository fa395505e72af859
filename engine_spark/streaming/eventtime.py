"""Event-time watermarking that tolerates TIMESTAMP_NTZ columns.

Spark only watermarks TIMESTAMP columns — ``withWatermark`` on an NTZ
event-time column raises ``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE``. The
driver's parquet testdata stores event time as TIMESTAMP_NTZ, so a stream
derived from it (or any NTZ source) must be cast before watermarking.

The cast is wall-clock preserving end-to-end: NTZ→TIMESTAMP interprets the
naive value in the session zone, and every downstream conversion back to
pandas/python produces session-local naive datetimes again — the same wall
clock, under any session timezone. Operators capture the ORIGINAL ts type
from the input schema for their output schema, so an NTZ input round-trips
as NTZ output (pinned by tests/test_timestamp_types.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def watermarked(df: DataFrame, ts_col: str, late: str) -> DataFrame:
    """``df.withWatermark(ts_col, late)``, casting an NTZ event-time column
    to TIMESTAMP first (wall-clock preserving; see module docstring)."""
    if isinstance(df.schema[ts_col].dataType, T.TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df.withWatermark(ts_col, late)

"""Shared pytest fixtures: one SparkSession per test session.

Mirrors the reference's AppRunner harness (reference tests/common/mod.rs:31-83):
tests build tiny deterministic event sets with explicit timestamps, run one
operator, and assert exact output vectors.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from engine_spark.session import get_spark

    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def ts(minute: int, second: int = 0, hour: int = 12) -> datetime:
    """Deterministic event-time helper: 2026-01-01 HH:MM:SS UTC (naive —
    session timezone is UTC)."""
    return datetime(2026, 1, 1, hour, minute, second)


def rows(df, *cols, order_by=None):
    """Collect as a sorted list of plain tuples for exact comparison."""
    if cols:
        df = df.select(*cols)
    out = [tuple(r) for r in df.collect()]
    return sorted(out, key=lambda t: tuple(repr(x) for x in t))

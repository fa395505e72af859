"""Catalog tests: parquet reads, nanos-timestamp conversion, error paths."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from engine_spark.catalog import TESTDATA_TABLES, Catalog

SF = "/root/testdata/sf0.001"


def test_all_tables_readable(spark):
    cat = Catalog(spark, SF)
    for t in TESTDATA_TABLES:
        assert cat[t].count() > 0


def test_events_ts_is_timestamp(spark):
    ev = Catalog(spark, SF)["events"]
    # parquet written with or without isAdjustedToUTC — both are timestamps
    assert isinstance(
        ev.schema["ts"].dataType, (T.TimestampType, T.TimestampNTZType)
    )
    # values are sane wall-clock times, not 1970-epoch garbage
    row = ev.select("ts").first()
    assert row["ts"].year >= 2000


def test_missing_table_raises_keyerror(spark):
    with pytest.raises(KeyError, match="not found"):
        Catalog(spark, "/root/testdata/nope")["lineitem"]


def test_table_cache_returns_same_plan(spark):
    cat = Catalog(spark, SF)
    assert cat["nation"] is cat["nation"]

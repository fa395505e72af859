"""Both Spark timestamp types must flow through every epoch-arithmetic path.

The driver's parquet stores event time as TIMESTAMP_NTZ (naive micros,
isAdjustedToUTC=false); programmatic streams carry TIMESTAMP. Direct
``cast(ts as long/double)`` / ``unix_micros(ts)`` are TIMESTAMP-only, so every
operator that does epoch arithmetic routes through
engine_spark.functions.timeutils — these tests pin that contract for the four
operator families that broke when the testdata switched types (range-frame
windows, pattern quantifiers/ranks, SQL pattern time bounds).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine_spark.functions.timeutils import (
    as_ts,
    epoch_micros,
    epoch_seconds,
    epoch_seconds_d,
)
from engine_spark.operators import pattern, windows

from tests.conftest import rows, ts

TS_TYPES = ("timestamp", "timestamp_ntz")


def _events(spark, ts_type: str):
    df = spark.createDataFrame(
        [
            (1, ts(0), "a", 1.0),
            (1, ts(1), "a", 2.0),
            (1, ts(2), "b", 3.0),
            (1, ts(30), "b", 4.0),  # outside the 10-min horizon of ts(0..2)
            (2, ts(0), "a", 5.0),
            (2, ts(9), "b", 6.0),
        ],
        "user_id long, ts timestamp, kind string, value double",
    )
    return df.withColumn("ts", F.col("ts").cast(ts_type))


@pytest.mark.parametrize("ts_type", TS_TYPES)
def test_timeutils_roundtrip(spark, ts_type):
    df = _events(spark, ts_type)
    got = df.select(
        epoch_seconds("ts").alias("s"),
        epoch_seconds_d("ts").alias("d"),
        epoch_micros("ts").alias("us"),
        as_ts("ts").alias("t"),
    ).collect()[0]
    base = int(ts(0).replace(tzinfo=__import__("datetime").timezone.utc).timestamp())
    assert got.s == base
    assert got.d == float(base)
    assert got.us == base * 1_000_000


@pytest.mark.parametrize("ts_type", TS_TYPES)
def test_time_sliding_both_types(spark, ts_type):
    df = _events(spark, ts_type)
    out = windows.time_sliding(
        df, "ts", 600, partition_by=["user_id"], aggs={"n": F.count(F.lit(1))}
    )
    got = rows(out.filter(F.col("user_id") == 1), "ts", "n")
    assert [n for _, n in got] == [1, 2, 3, 1]
    # output ts type preserved
    assert out.schema["ts"].dataType.simpleString() == ts_type


@pytest.mark.parametrize("ts_type", TS_TYPES)
def test_followed_by_both_types(spark, ts_type):
    df = _events(spark, ts_type)
    out = pattern.followed_by(
        df,
        "ts",
        ["user_id"],
        F.col("kind") == "a",
        F.col("kind") == "b",
        within_seconds=600,
    )
    got = rows(out, "user_id", "e1_value", "e2_value", "delay_seconds")
    assert (1, 1.0, 3.0, 120.0) in got
    assert (1, 2.0, 3.0, 60.0) in got
    assert (2, 5.0, 6.0, 540.0) in got
    assert all(d <= 600 for *_, d in got)


@pytest.mark.parametrize("ts_type", TS_TYPES)
def test_count_quantifier_both_types(spark, ts_type):
    df = _events(spark, ts_type)
    out = pattern.count_quantifier(
        df, "ts", ["user_id"], F.col("kind") == "a", min_count=2, within_seconds=600
    )
    got = rows(out, "user_id", "match_count")
    assert got == [(1, 2)]

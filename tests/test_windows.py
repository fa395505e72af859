"""Window operator tests — exact outputs on tiny event sets.

Modeled on reference tests/app_runner_windows.rs:10-45 (filter + length
window with explicit expected vectors).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine_spark.operators import windows
from tests.conftest import rows, ts


def events(spark):
    data = [
        # (user, ts, amount)
        ("u1", ts(0), 10.0),
        ("u1", ts(1), 20.0),
        ("u1", ts(2), 30.0),
        ("u1", ts(10), 40.0),
        ("u2", ts(0, 30), 5.0),
        ("u2", ts(11), 7.0),
    ]
    return spark.createDataFrame(data, "user string, ts timestamp, amount double")


def test_length_sliding_last2(spark):
    out = windows.length_sliding(
        events(spark), "ts", 2, partition_by=["user"],
        aggs={"s": F.sum("amount")},
    )
    got = rows(out, "user", "ts", "s")
    # per-event trailing-2 sums
    assert ("u1", ts(0), 10.0) in got
    assert ("u1", ts(1), 30.0) in got
    assert ("u1", ts(2), 50.0) in got
    assert ("u1", ts(10), 70.0) in got
    assert ("u2", ts(0, 30), 5.0) in got
    assert ("u2", ts(11), 12.0) in got


def test_length_batch_pairs(spark):
    out = windows.length_batch(
        events(spark), "ts", 2, partition_by=["user"],
        aggs=[F.sum("amount").alias("s"), F.count(F.lit(1)).alias("n")],
    )
    got = rows(out, "user", "batch_id", "s", "n")
    assert got == [
        ("u1", 0, 30.0, 2),
        ("u1", 1, 70.0, 2),
        ("u2", 0, 12.0, 2),
    ]


def test_time_sliding_range_frame(spark):
    out = windows.time_sliding(
        events(spark), "ts", 120, partition_by=["user"],
        aggs={"s": F.sum("amount")},
    )
    got = dict(
        ((u, t), s) for u, t, s in rows(out, "user", "ts", "s")
    )
    assert got[("u1", ts(0))] == 10.0
    assert got[("u1", ts(1))] == 30.0
    assert got[("u1", ts(2))] == 60.0  # 10+20+30 within 2 min
    assert got[("u1", ts(10))] == 40.0  # others expired
    assert got[("u2", ts(11))] == 7.0


def test_time_batch_tumbling(spark):
    out = windows.time_batch(
        events(spark), "ts", "5 minutes", group_by=["user"],
        aggs=[F.sum("amount").alias("s")],
    )
    got = rows(out, "user", "window_start", "s")
    assert ("u1", ts(0), 60.0) in got
    assert ("u1", ts(10), 40.0) in got
    assert ("u2", ts(0), 5.0) in got
    assert ("u2", ts(10), 7.0) in got


def test_hopping_window(spark):
    out = windows.time_sliding_hop(
        events(spark), "ts", "10 minutes", "5 minutes", group_by=["user"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    got = rows(out.filter(F.col("user") == "u1"), "window_start", "n")
    # events at 12:00,12:01,12:02 and 12:10; hops at :55,:00,:05,:10
    assert (ts(55, 0, 11), 3) in got
    assert (ts(0), 3) in got
    assert (ts(5), 1) in got
    assert (ts(10), 1) in got


def test_session_window_gap(spark):
    out = windows.session(
        events(spark), "ts", "3 minutes", group_by=["user"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("amount").alias("s")],
    )
    got = rows(out, "user", "n", "s")
    # u1: {12:00,12:01,12:02} then {12:10}; u2: two singletons
    assert got == [
        ("u1", 1, 40.0),
        ("u1", 3, 60.0),
        ("u2", 1, 5.0),
        ("u2", 1, 7.0),
    ]


def test_sort_window_topn(spark):
    out = windows.sort_window(
        events(spark), 2, [F.col("amount").desc()], partition_by=["user"]
    )
    got = rows(out, "user", "amount")
    assert got == [("u1", 30.0), ("u1", 40.0), ("u2", 5.0), ("u2", 7.0)]


def test_frequent_items_threshold(spark):
    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)] * 1, "item string"
    )
    out = windows.frequent_items(df, "item", 0.3)
    got = rows(out, "item", "freq")
    assert got == [("a", 6), ("b", 3)]


def test_keyless_window_requires_opt_in(spark):
    import pytest

    with pytest.raises(ValueError, match="un-keyed"):
        windows.length_sliding(events(spark), "ts", 2, aggs={"s": F.sum("amount")})
    # explicit opt-in works
    out = windows.length_sliding(
        events(spark), "ts", 2, aggs={"s": F.sum("amount")},
        tiebreak=["user"], allow_global=True,
    )
    assert out.count() == 6

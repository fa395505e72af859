"""Join operator tests (reference join_input_stream.rs types + table joins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine_spark.operators import joins
from tests.conftest import rows, ts


def stream(spark):
    return spark.createDataFrame(
        [("a", ts(0), 1.0), ("b", ts(1), 2.0), ("c", ts(2), 3.0)],
        "k string, ts timestamp, v double",
    )


def dim(spark):
    return spark.createDataFrame(
        [("a", "alpha"), ("b", "beta"), ("d", "delta")], "k string, name string"
    )


def test_enrich_inner(spark):
    out = joins.enrich(stream(spark), dim(spark), ["k"], "inner")
    assert rows(out, "k", "name") == [("a", "alpha"), ("b", "beta")]


def test_enrich_left_outer_null_pads(spark):
    out = joins.enrich(stream(spark), dim(spark), ["k"], "left")
    assert rows(out, "k", "name") == [("a", "alpha"), ("b", "beta"), ("c", None)]


def test_enrich_full_outer(spark):
    out = joins.enrich(stream(spark), dim(spark), ["k"], "full")
    got = rows(out, "k", "name")
    assert ("c", None) in got and ("d", "delta") in got and len(got) == 4


def test_enrich_forced_broadcast_plan(spark):
    out = joins.enrich(stream(spark), dim(spark), ["k"], "inner", broadcast_table=True)
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_in_table_semi_and_anti(spark):
    s, member = stream(spark), dim(spark).select("k")
    semi = joins.in_table(s, member, s["k"] == member["k"])
    assert [r[0] for r in rows(semi, "k")] == ["a", "b"]
    anti = joins.in_table(s, member, s["k"] == member["k"], negate=True)
    assert [r[0] for r in rows(anti, "k")] == ["c"]


def test_windowed_join_time_bound(spark):
    left = spark.createDataFrame(
        [("a", ts(0)), ("b", ts(10))], "k string, lts timestamp"
    )
    right = spark.createDataFrame(
        [("a", ts(1)), ("a", ts(9)), ("b", ts(30))], "k string, rts timestamp"
    )
    out = joins.windowed_join(
        left.withColumnRenamed("k", "lk"),
        right.withColumnRenamed("k", "rk"),
        "lts", "rts", 120,
        F.col("lk") == F.col("rk"),
        "inner",
    )
    got = rows(out, "lk", "lts", "rts")
    # a@12:00 matches a@12:01 (60 s) but not a@12:09 (540 s); b@12:10 ∉ ±120 s of 12:30
    assert got == [("a", ts(0), ts(1))]


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("x", ts(5)), ("x", ts(20))], "sym string, tts timestamp"
    )
    quotes = spark.createDataFrame(
        [("x", ts(0), 99.0), ("x", ts(4), 101.0), ("x", ts(21), 105.0)],
        "sym string, qts timestamp, px double",
    )
    out = joins.asof_join(trades, quotes, ["sym"], "tts", "qts", "backward")
    got = rows(out, "tts", "qts", "px")
    # trade@12:05 → latest quote ≤ 12:05 is 12:04@101; trade@12:20 → 12:04@101
    assert set(got) == {(ts(5), ts(4), 101.0), (ts(20), ts(4), 101.0)}


def test_salted_join_matches_plain_join(spark):
    from pyspark.sql import functions as F2

    left = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 99)], "k string, v int"
    )
    right = spark.createDataFrame([("hot", "H"), ("cold", "C")], "k string, name string")
    salted = joins.salted_join(left, right, ["k"], "inner", 4)
    plain = left.join(right, ["k"], "inner")
    assert salted.count() == plain.count() == 51
    got = salted.groupBy(F2.col("name")).count().collect()
    assert {(r["name"], r["count"]) for r in got} == {("H", 50), ("C", 1)}

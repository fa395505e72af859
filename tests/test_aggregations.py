"""Aggregator registry + deterministic-numeric tests."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from engine_spark.operators import aggregations as agg
from tests.conftest import rows


def df(spark):
    return spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g1", 3.0), ("g2", 10.0), ("g2", 10.0)],
        "g string, x double",
    )


def test_registry_resolves_all_reference_names(spark):
    for name in ("sum", "avg", "count", "distinctCount", "min", "max",
                 "minForever", "maxForever", "stddev", "first", "last"):
        assert agg.resolve(name) is not None
    with pytest.raises(KeyError):
        agg.resolve("nope")


def test_basic_aggregators(spark):
    out = df(spark).groupBy("g").agg(
        agg.resolve("sum")("x").alias("s"),
        agg.resolve("distinctCount")("x").alias("dc"),
        agg.resolve("min")("x").alias("mn"),
        agg.resolve("max")("x").alias("mx"),
    )
    assert rows(out, "g", "s", "dc", "mn", "mx") == [
        ("g1", 6.0, 3, 1.0, 3.0),
        ("g2", 20.0, 1, 10.0, 10.0),
    ]


def test_decimal_sum_order_independent(spark):
    # doubles that famously don't sum associatively
    data = [(0.1,)] * 10
    d = spark.createDataFrame(data, "x double").repartition(7)
    out = d.agg(agg.decimal_sum("x").alias("s")).collect()[0]
    assert out["s"] == 1.0  # exact, any partitioning


def test_decimal_avg(spark):
    out = df(spark).groupBy("g").agg(agg.decimal_avg("x").alias("a"))
    assert rows(out, "g", "a") == [("g1", 2.0), ("g2", 10.0)]


def test_stddev_pop_det_clamps_to_zero(spark):
    # constant column: variance must be exactly 0.0, never NaN
    d = spark.createDataFrame([(5.5,)] * 4, "x double")
    out = d.agg(agg.stddev_pop_det("x").alias("sd")).collect()[0]
    assert out["sd"] == 0.0 and not math.isnan(out["sd"])


def test_stddev_pop_det_value(spark):
    d = spark.createDataFrame([(2.0,), (4.0,), (4.0,), (4.0,), (5.0,), (5.0,), (7.0,), (9.0,)], "x double")
    out = d.agg(agg.stddev_pop_det("x").alias("sd")).collect()[0]
    assert out["sd"] == pytest.approx(2.0)


def test_cohort_retention_invariants(spark):
    """Cohort matrix on the sf0.001 events: every user lands in exactly one
    cohort, offset-0 actives per cohort equal that cohort's size (the first
    active day IS the cohort day), offsets are non-negative, and the matrix
    total equals the distinct (user, day) pair count."""
    from pyspark.sql import functions as F
    from engine_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["events_cohort_retention"].spark(spark, sf).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    n_users = ev.select("user_id").distinct().count()
    n_pairs = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct().count()
    assert all(r.day_offset >= 0 for r in rows)
    day0 = sum(r.n_active_users for r in rows if r.day_offset == 0)
    assert day0 == n_users  # everyone is active on their own cohort day
    assert sum(r.n_active_users for r in rows) == n_pairs


def test_json_props_totals_and_null_tolerance(spark):
    """from_json extraction: gate totals reconcile with the raw table, and
    a malformed props row degrades to NULL (skipped by sum/min/max, still
    counted in n_events) instead of failing the query."""
    from pyspark.sql import functions as F
    from engine_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["events_json_props"].spark(spark, sf).collect()
    ev = spark.read.parquet(f"{sf}/events.parquet")
    assert sum(r.n_events for r in out) == ev.count()
    ksum = ev.select(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("s")
    ).collect()[0]["s"]
    assert sum(r.sum_k for r in out) == ksum

    # malformed row → NULL k, aggregation survives
    bad = spark.createDataFrame(
        [("click", '{"k": 3}'), ("click", "not json"), ("view", '{"j": 1}')],
        "event_type string, props string",
    )
    k = F.from_json(F.col("props"), "k BIGINT")["k"]
    got = (
        bad.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
        .collect()
    )
    by = {r.event_type: r for r in got}
    assert (by["click"].n, by["click"].s) == (2, 3)
    assert (by["view"].n, by["view"].s) == (1, None)

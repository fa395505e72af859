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

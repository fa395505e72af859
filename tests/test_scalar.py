"""Scalar function registry tests (reference builtin_wrapper.rs names)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine_spark.functions.scalar import resolve
from tests.conftest import rows


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_string_functions(spark):
    fn = resolve
    assert one(spark, fn("concat")(F.lit("ab"), F.lit("cd"))) == "abcd"
    assert one(spark, fn("upper")(F.lit("ab"))) == "AB"
    assert one(spark, fn("left")(F.lit("hello"), 2)) == "he"
    assert one(spark, fn("right")(F.lit("hello"), 2)) == "lo"
    assert one(spark, fn("position")("ll", F.lit("hello"))) == 3
    assert one(spark, fn("repeat")(F.lit("ab"), 3)) == "ababab"
    assert one(spark, fn("lpad")(F.lit("5"), 3, "0")) == "005"
    assert one(spark, fn("substring")(F.lit("hello"), 2, 3)) == "ell"


def test_math_functions(spark):
    fn = resolve
    assert one(spark, fn("maximum")(F.lit(3), F.lit(7))) == 7
    assert one(spark, fn("minimum")(F.lit(3), F.lit(7))) == 3
    assert one(spark, fn("mod")(F.lit(7), 3)) == 1
    assert one(spark, fn("sign")(F.lit(-2.5))) == -1.0
    assert one(spark, fn("trunc")(F.lit(3.9))) == 3
    assert one(spark, fn("power")(F.lit(2.0), F.lit(10.0))) == 1024.0


def test_case_insensitive_lookup(spark):
    assert one(spark, resolve("UPPER")(F.lit("x"))) == "X"
    with pytest.raises(KeyError):
        resolve("no_such_fn")


def test_conversion_and_null(spark):
    fn = resolve
    assert one(spark, fn("cast")(F.lit("42"), "int")) == 42
    assert one(spark, fn("coalesce")(F.lit(None).cast("int"), F.lit(9))) == 9
    assert one(spark, fn("nullif")(F.lit(5), F.lit(5))) is None
    assert one(spark, fn("default")(F.lit(None).cast("string"), "d")) == "d"
    assert one(spark, fn("if")(F.lit(True), 1, 2)) == 1


def test_instance_of_uses_static_type(spark):
    fn = resolve
    # a numeric column is NOT instanceOfString even though it casts cleanly
    assert one(spark, fn("instanceofstring")(F.lit(42))) is False
    assert one(spark, fn("instanceofinteger")(F.lit(42))) is True
    assert one(spark, fn("instanceofstring")(F.lit("42"))) is True
    # null value: runtime check fails regardless of declared type
    assert one(spark, fn("instanceofinteger")(F.lit(None).cast("int"))) is False


def test_like_and_dateadd(spark):
    fn = resolve
    assert one(spark, fn("like")(F.lit("hello"), "he%")) is True
    got = one(spark, fn("dateadd")(F.lit("2026-01-01").cast("timestamp"), 1, "day"))
    assert str(got)[:10] == "2026-01-02"

"""Extension surface tests (§2i registration points)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from engine_spark import extensions as ext
from engine_spark.functions.scalar import resolve
from engine_spark.operators.aggregations import resolve as agg_resolve


def test_add_scalar_function_column_builder(spark):
    ext.add_scalar_function("double_it", lambda c: c * 2)
    out = spark.range(3).select(resolve("double_it")(F.col("id")).alias("v"))
    assert [r["v"] for r in out.collect()] == [0, 2, 4]


def test_add_pandas_function(spark):
    import pandas as pd

    def plus_one(s: pd.Series) -> pd.Series:
        return s + 1

    ext.add_pandas_function(spark, "plus_one_t", plus_one, "long")
    out = spark.range(3).select(F.expr("plus_one_t(id)").alias("v"))
    assert [r["v"] for r in out.collect()] == [1, 2, 3]


def test_add_aggregator(spark):
    ext.add_aggregator("sumsq", lambda c: F.sum(c * c))
    df = spark.createDataFrame([(2.0,), (3.0,)], "x double")
    out = df.agg(agg_resolve("sumSq")("x").alias("s")).collect()[0]
    assert out["s"] == 13.0


def test_add_window_factory_in_sql(spark):
    from engine_spark.plans import SqlApp

    def every_other(df, ts, params, partition_by, aggs, allow_global):
        from pyspark.sql import Window

        w = (
            Window.partitionBy(*(partition_by or []))
            if partition_by
            else Window.partitionBy()
        ).orderBy(ts)
        out = df.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") % int(params[0]) == 1
        ).drop("_rn")
        for name, col in (aggs or {}).items():
            out = out.withColumn(name, F.lit(None))
        return out

    ext.add_window("everyother", every_other)
    app = SqlApp(spark)
    app.register_stream("S", spark.createDataFrame([(i,) for i in range(6)], "v int"))
    outs = app.sql("INSERT INTO Out SELECT v FROM S WINDOW('everyOther', 2);")
    assert sorted(r["v"] for r in outs["Out"].collect()) == [0, 2, 4]


def test_script_function(spark):
    ext.add_script_function(
        spark,
        "shout",
        "def run(s):\n    return (s or '') + '!'\n",
        "string",
    )
    out = spark.createDataFrame([("hi",)], "s string").select(
        F.expr("shout(s)").alias("v")
    )
    assert out.collect()[0]["v"] == "hi!"


def test_script_function_requires_run(spark):
    with pytest.raises(ValueError, match="must define run"):
        ext.add_script_function(spark, "bad", "x = 1", "string")


def test_load_plugin(spark, tmp_path, monkeypatch):
    plugin = tmp_path / "my_plugin.py"
    plugin.write_text(
        "from engine_spark import extensions as ext\n"
        "def register():\n"
        "    ext.add_scalar_function('from_plugin', lambda c: c + 100)\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    ext.load_plugin("my_plugin")
    out = spark.range(1).select(resolve("from_plugin")(F.col("id")).alias("v"))
    assert out.collect()[0]["v"] == 100


def test_load_plugin_without_hook(tmp_path, monkeypatch):
    plugin = tmp_path / "bad_plugin.py"
    plugin.write_text("x = 1\n")
    monkeypatch.syspath_prepend(str(tmp_path))
    with pytest.raises(ValueError, match="no register"):
        ext.load_plugin("bad_plugin")

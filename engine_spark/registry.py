"""Query registry core: the (Spark plan, DuckDB oracle) table and decorator.

Lives in its own leaf module so both ``engine_spark.queries`` (core
operators) and ``engine_spark.datapipe.queries`` (LLM-data-pipeline
operators) can register entries without importing each other — importing
either registration module in isolation must not require the other to be
fully initialized (``engine_spark.queries`` validates the final registry
order at the end of its own import, after it has pulled in datapipe).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    spark: SparkQuery
    oracle: str | None  # None → non-SQL-expressible, driver does rows-only check
    doc: str = ""


QUERIES: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: SparkQuery):
        QUERIES[name] = QueryDef(spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco

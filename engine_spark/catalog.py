"""Named-table catalog over a directory of parquet files.

Mirrors the reference's SqlCatalog (stream/table registry keyed by name,
reference: src/sql_compiler/catalog.rs) but tables are lazy Spark DataFrames
over parquet — column pruning and predicate pushdown reach the scan for free.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazily resolves table names to DataFrames; registers temp views on use.

    ``Catalog(spark, sf_dir)[name]`` or ``catalog.table(name)`` returns the
    DataFrame; ``register_all()`` creates temp views so ``spark.sql`` works
    against the same names the DuckDB oracle sees.
    """

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, f"{name}.parquet")

    #: columns stored as TIMESTAMP(NANOS) in the driver's parquet. With
    #: spark.sql.legacy.parquet.nanosAsLong=true they scan as LongType nanos;
    #: convert via exact integer division (``div`` — no double rounding at
    #: 1e18 magnitudes) to a microsecond timestamp matching what DuckDB sees.
    NANOS_TS_COLS = {"events": ("ts",)}

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            p = self.path(name)
            if not os.path.exists(p):
                raise KeyError(f"table {name!r} not found under {self.base_dir}")
            df = self.spark.read.parquet(p)
            for c in self.NANOS_TS_COLS.get(name, ()):
                if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
                    df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
            self._cache[name] = df
        return self._cache[name]

    def __getitem__(self, name: str) -> DataFrame:
        return self.table(name)

    def register_all(self, names: tuple[str, ...] = TESTDATA_TABLES) -> None:
        for n in names:
            if os.path.exists(self.path(n)):
                self.table(n).createOrReplaceTempView(n)

    def register(self, name: str, df: DataFrame) -> None:
        """Register a derived/programmatic table (CREATE STREAM equivalent)."""
        self._cache[name] = df
        df.createOrReplaceTempView(name)

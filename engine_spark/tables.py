"""Tables + DML + on-demand queries + incremental aggregation (§2g).

Reference surface:
- ``InMemoryTable`` / DML processors (insert_into_table_processor.rs,
  update_table_processor.rs, delete_table_processor.rs)
- on-demand query API: Find/Select/Insert/Update/Delete/UpdateOrInsert
  (on_demand_query.rs:17-25)
- incremental multi-granularity aggregation (core/aggregation/mod.rs,
  time_period.rs:8; queried via query_aggregation(within, per),
  eventflux_app_runtime.rs:982-993)

Spark-first: a Table is a versioned DataFrame (copy-on-write). UPDATE and
DELETE are projections/filters producing a new version — exactly the
file-rewrite model Delta/Iceberg use at scale; swap ``persist_path`` for a
Delta table to get ACID + time travel on a cluster. No row-at-a-time
mutation exists in Spark, and none is needed: a 100 TB UPDATE is a
partition-pruned rewrite of affected files only.

Incremental aggregation: partial aggregates (count/sum/min/max) cascade
second → minute → hour → day — each level re-aggregates the previous one
(sums add, mins min, avg derives as sum/count at query time), so building
all granularities costs one scan of the raw data plus tiny rollups.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference time_period.rs:8 (SECONDS..YEARS); each is a date_trunc unit
GRANULARITIES = ["second", "minute", "hour", "day", "month", "year"]
_ORDER = GRANULARITIES


class Table:
    """Mutable named relation (reference InMemoryTable, table/mod.rs:277)."""

    def __init__(self, df: DataFrame, persist_path: str | None = None):
        self._df = df
        self.persist_path = persist_path
        self._version = 0

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def current_path(self) -> str | None:
        if not self.persist_path:
            return None
        return f"{self.persist_path}/v{self._version:05d}"

    def _swap(self, new_df: DataFrame) -> None:
        if self.persist_path:
            # each version lands in a NEW directory: writing over the files
            # the new plan is READING deletes them mid-job (the classic
            # parquet self-overwrite failure). Versioned dirs are also the
            # table-format model (Delta/Iceberg snapshots) — old versions
            # stay readable until vacuumed.
            self._version += 1
            new_df.write.mode("overwrite").parquet(self.current_path)
            new_df = new_df.sparkSession.read.parquet(self.current_path)
        self._df = new_df

    # -- DML (reference §2g processors) ---------------------------------
    def insert(self, rows: DataFrame) -> None:
        """INSERT INTO table (insert_into_table_processor.rs)."""
        self._swap(self._df.unionByName(rows))

    def update(self, set: dict[str, Column], where: Column) -> None:
        """UPDATE table SET … WHERE … (update_table_processor.rs +
        set_attribute.rs): projection with conditional replacement."""
        cols = []
        for c in self._df.columns:
            if c in set:
                cols.append(F.when(where, set[c]).otherwise(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        self._swap(self._df.select(*cols))

    def delete(self, where: Column) -> None:
        """DELETE FROM table WHERE … (delete_table_processor.rs)."""
        self._swap(self._df.filter(~where))

    def upsert(self, rows: DataFrame, keys: Sequence[str]) -> None:
        """UpdateOrInsert (on_demand_query.rs): replace matching keys,
        insert the rest — an anti-join + union (Delta MERGE shape)."""
        existing = self._df.join(rows.select(*keys), list(keys), "left_anti")
        self._swap(existing.unionByName(rows))

    # -- on-demand queries (on_demand_query.rs:17-25) --------------------
    def find(self, condition: Column) -> DataFrame:
        return self._df.filter(condition)

    def select(self, *cols: Column | str) -> DataFrame:
        return self._df.select(*cols)


class IncrementalAggregation:
    """Multi-granularity rollups (reference aggregation_runtime /
    incremental_executor; no SQL DDL existed in the reference either —
    tests there are #[ignore], app_runner_aggregations.rs:15).

    ``specs`` maps output name → source column; partials kept are
    count/sum (DECIMAL-exact)/min/max, so any level re-aggregates from the
    level below without revisiting raw data.
    """

    def __init__(
        self,
        df: DataFrame,
        ts_col: str,
        group_by: Sequence[str],
        value_col: str,
        granularities: Sequence[str] = ("second", "minute", "hour", "day"),
    ):
        order = sorted(granularities, key=_ORDER.index)
        self.group_by = list(group_by)
        self.levels: dict[str, DataFrame] = {}
        prev: DataFrame | None = None
        for g in order:
            # date_trunc, not F.window: identical bucket starts for the
            # fixed-period units, and it also handles calendar units
            # (month) that F.window's interval arithmetic rejects.
            if prev is None:
                base = df.groupBy(
                    F.date_trunc(g, F.col(ts_col)).alias("bucket_start"),
                    *self.group_by,
                ).agg(
                    F.count(F.lit(1)).alias("cnt"),
                    F.sum(F.col(value_col).cast("decimal(18,4)")).alias("sum_dec"),
                    F.min(value_col).alias("min_v"),
                    F.max(value_col).alias("max_v"),
                )
            else:
                base = prev.groupBy(
                    F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
                    *self.group_by,
                ).agg(
                    F.sum("cnt").alias("cnt"),
                    F.sum("sum_dec").alias("sum_dec"),
                    F.min("min_v").alias("min_v"),
                    F.max("max_v").alias("max_v"),
                )
            self.levels[g] = base
            prev = base

    def query(
        self,
        per: str,
        within: tuple | None = None,
    ) -> DataFrame:
        """query_aggregation(within, per) (eventflux_app_runtime.rs:982-993):
        rows of (group, bucket_start, cnt, sum, avg, min, max) at the chosen
        granularity, optionally bounded to [start, end)."""
        lvl = self.levels[per]
        if within is not None:
            lo, hi = within
            lvl = lvl.filter(
                (F.col("bucket_start") >= F.lit(lo)) & (F.col("bucket_start") < F.lit(hi))
            )
        return lvl.select(
            *self.group_by,
            "bucket_start",
            "cnt",
            F.col("sum_dec").cast("double").alias("sum_v"),
            (F.col("sum_dec").cast("double") / F.col("cnt")).alias("avg_v"),
            "min_v",
            "max_v",
        )


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict | None = None,
) -> DataFrame:
    """JDBC-backed table (reference jdbc_table.rs with compile_condition
    predicate pushdown): Spark's JDBC source pushes filters and column
    pruning to the database natively — the reference's hand-built SQL
    generation (docs/writing_extensions.md:40-47) is the built-in behavior
    here. Requires a JDBC driver jar on the classpath; none ships in this
    environment, so connection attempts fail at read time with the driver
    error, but plan construction (and pushdown) is the standard Spark path.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()

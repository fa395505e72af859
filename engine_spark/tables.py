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
    """Mutable named relation (reference InMemoryTable, table/mod.rs:277).

    With ``partition_by`` (requires ``persist_path``) DML becomes
    partition-pruned: an UPDATE/DELETE rewrites only the partitions its
    predicate touches; every other partition's files are HARDLINKED from
    the previous snapshot into the new version directory — same bytes, no
    rewrite, prior snapshot intact. The links are the local-filesystem
    stand-in for a Delta/Iceberg manifest re-referencing unchanged data
    files; at 100 TB this is the difference between rewriting the table
    and rewriting one partition.
    """

    def __init__(
        self,
        df: DataFrame,
        persist_path: str | None = None,
        partition_by: Sequence[str] | None = None,
    ):
        self._df = df
        self.persist_path = persist_path
        self.partition_by = list(partition_by or [])
        if self.partition_by and not persist_path:
            raise ValueError("partition_by requires persist_path")
        self._version = 0
        self._columns = list(df.columns)
        self._schema = {f.name: f.dataType for f in df.schema.fields}
        if self.partition_by:
            # persist the initial snapshot so the first DML already has a
            # partitioned version to link unaffected partitions from
            self._write_full(df)

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def current_path(self) -> str | None:
        if not self.persist_path:
            return None
        return f"{self.persist_path}/v{self._version:05d}"

    # -- snapshot plumbing ----------------------------------------------
    def _reorder(self, df: DataFrame) -> DataFrame:
        """Partitioned reads return partition columns last with inferred
        types — restore the declared order and dtypes."""
        return df.select(
            *[F.col(c).cast(self._schema[c]).alias(c) for c in self._columns]
        )

    def _write_full(self, new_df: DataFrame) -> None:
        writer = new_df.write.mode("overwrite")
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.parquet(self.current_path)
        self._df = self._reorder(
            new_df.sparkSession.read.parquet(self.current_path)
        )

    def _swap(self, new_df: DataFrame) -> None:
        if self.persist_path:
            # each version lands in a NEW directory: writing over the files
            # the new plan is READING deletes them mid-job (the classic
            # parquet self-overwrite failure). Versioned dirs are also the
            # table-format model (Delta/Iceberg snapshots) — old versions
            # stay readable until vacuumed.
            self._version += 1
            self._write_full(new_df)
        else:
            self._df = new_df

    @staticmethod
    def _part_segment(k: str, v) -> str:
        if v is None:
            return f"{k}=__HIVE_DEFAULT_PARTITION__"
        if isinstance(v, bool):
            return f"{k}={str(v).lower()}"
        return f"{k}={v}"  # simple types; exotic values need URL-escaping

    def _affected(self, pred_df: DataFrame) -> list[dict]:
        """Distinct partition tuples present in ``pred_df`` — the collect
        is bounded by the partition count, never the row count."""
        return [
            r.asDict()
            for r in pred_df.select(*self.partition_by).distinct().collect()
        ]

    def _partition_pred(self, parts: list[dict]) -> Column:
        p = F.lit(False)
        for d in parts:
            c = F.lit(True)
            for k in self.partition_by:
                c = c & F.col(k).eqNullSafe(F.lit(d[k]))
            p = p | c
        return p

    def _swap_partial(self, parts: list[dict], new_affected: DataFrame) -> None:
        """New snapshot = rewritten affected partitions + hardlinks to every
        untouched partition file of the previous snapshot."""
        import os

        spark = self._df.sparkSession
        old_root = self.current_path
        self._version += 1
        new_root = self.current_path
        new_affected.write.partitionBy(*self.partition_by).mode(
            "overwrite"
        ).parquet(new_root)

        affected_dirs = {
            tuple(self._part_segment(k, d[k]) for k in self.partition_by)
            for d in parts
        }
        depth_max = len(self.partition_by)

        def walk(old_dir: str, depth: int, prefix: tuple) -> None:
            for entry in os.listdir(old_dir):
                src = os.path.join(old_dir, entry)
                if not os.path.isdir(src) or "=" not in entry:
                    continue
                cur = prefix + (entry,)
                if depth + 1 == depth_max:
                    if cur in affected_dirs:
                        continue  # rewritten above
                    dst = os.path.join(new_root, *cur)
                    os.makedirs(dst, exist_ok=True)
                    for f in os.listdir(src):
                        sf = os.path.join(src, f)
                        if os.path.isfile(sf):
                            os.link(sf, os.path.join(dst, f))
                else:
                    walk(src, depth + 1, cur)

        walk(old_root, 0, ())
        self._df = self._reorder(spark.read.parquet(new_root))

    def _can_prune(self) -> bool:
        return bool(self.partition_by) and self.persist_path is not None

    # -- DML (reference §2g processors) ---------------------------------
    def insert(self, rows: DataFrame) -> None:
        """INSERT INTO table (insert_into_table_processor.rs). Partitioned:
        only the partitions the new rows land in are rewritten."""
        if self._can_prune():
            parts = self._affected(rows)
            if not parts:
                return
            keep = self._df.filter(self._partition_pred(parts))
            self._swap_partial(parts, keep.unionByName(rows))
            return
        self._swap(self._df.unionByName(rows))

    def update(self, set: dict[str, Column], where: Column) -> None:
        """UPDATE table SET … WHERE … (update_table_processor.rs +
        set_attribute.rs): projection with conditional replacement.
        Partitioned: only partitions containing matching rows are
        rewritten — unless the SET touches a partition column (rows would
        migrate between partitions; falls back to a full rewrite)."""
        cols = []
        for c in self._df.columns:
            if c in set:
                cols.append(F.when(where, set[c]).otherwise(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        if self._can_prune() and not any(k in self.partition_by for k in set):
            parts = self._affected(self._df.filter(where))
            if not parts:
                return
            new_affected = self._df.filter(self._partition_pred(parts)).select(*cols)
            self._swap_partial(parts, new_affected)
            return
        self._swap(self._df.select(*cols))

    def delete(self, where: Column) -> None:
        """DELETE FROM table WHERE … (delete_table_processor.rs).
        Partitioned: only partitions containing matching rows are
        rewritten (a fully-deleted partition simply has no directory in
        the new snapshot)."""
        if self._can_prune():
            parts = self._affected(self._df.filter(where))
            if not parts:
                return
            new_affected = self._df.filter(self._partition_pred(parts)).filter(
                ~where
            )
            self._swap_partial(parts, new_affected)
            return
        self._swap(self._df.filter(~where))

    def upsert(self, rows: DataFrame, keys: Sequence[str]) -> None:
        """UpdateOrInsert (on_demand_query.rs): replace matching keys,
        insert the rest — an anti-join + union (Delta MERGE shape).
        Partitioned: touches the new rows' partitions plus any partition
        holding an existing row with a replaced key."""
        if self._can_prune():
            touched = rows.select(*self.partition_by).unionByName(
                self._df.join(
                    rows.select(*keys), list(keys), "left_semi"
                ).select(*self.partition_by)
            )
            parts = self._affected(touched)
            if not parts:
                return
            keep = self._df.filter(self._partition_pred(parts)).join(
                rows.select(*keys), list(keys), "left_anti"
            )
            self._swap_partial(parts, keep.unionByName(rows))
            return
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
    here. Any JDBC driver jar on the classpath works; the end-to-end test
    uses the Derby embedded driver that ships inside Spark's own jars
    (tests/test_tables.py::test_jdbc_table_end_to_end_with_embedded_derby:
    write → read-back → pushdown assert → enrichment join).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


class CacheTable:
    """Bounded in-memory table with size-capped eviction (reference
    cache_table.rs: table type ``cache`` with a required ``max_size``
    property; insert trims beyond max_size via trim_if_needed, plus
    update/delete/find/contains on equality conditions). The reference's
    config layer additionally declares ``CacheEvictionPolicy``
    {Fifo, Lru (default), Lfu} (application_config.rs:651-671) without
    wiring it into the table — here all three policies are implemented:

    - ``fifo``: evict the oldest INSERT (the reference's actual
      ``trim_if_needed`` behavior — pop_front on the VecDeque);
    - ``lru``: evict the least-recently TOUCHED row (find/contains/update
      hits refresh recency);
    - ``lfu``: evict the least-frequently touched row (ties broken by
      insertion order, oldest first).

    Scale shape: a cache table is bounded by construction (max_size rows),
    so its Spark face is a broadcast dimension — ``df`` builds a DataFrame
    that enrichment joins broadcast; the row store itself is driver-side
    exactly like the reference's in-process VecDeque. Row identity for
    update/delete/find is whole-row or column-subset equality, matching
    InMemoryCompiledCondition's value comparison.
    """

    def __init__(
        self,
        spark: SparkSession,
        schema: str,
        max_size: int,
        policy: str = "fifo",
    ):
        if max_size < 1:
            raise ValueError("max_size must be >= 1")
        if policy not in ("fifo", "lru", "lfu"):
            raise ValueError(f"unknown eviction policy {policy!r}")
        self.spark = spark
        self.schema = schema
        self.max_size = max_size
        self.policy = policy
        self._rows: list[dict] = []  # insertion order preserved
        self._seq = 0
        self._meta: dict[int, list] = {}  # id(row slot) -> [last_touch, freq]
        self._ids: list[int] = []  # parallel to _rows: stable slot ids

    # -- internals -------------------------------------------------------
    def _touch(self, idx: int) -> None:
        self._seq += 1
        m = self._meta[self._ids[idx]]
        m[0] = self._seq
        m[1] += 1

    def _evict_if_needed(self) -> None:
        while len(self._rows) > self.max_size:
            if self.policy == "fifo":
                victim = 0
            elif self.policy == "lru":
                victim = min(
                    range(len(self._rows)),
                    key=lambda i: self._meta[self._ids[i]][0],
                )
            else:  # lfu; ties -> oldest insertion (list order)
                victim = min(
                    range(len(self._rows)),
                    key=lambda i: (self._meta[self._ids[i]][1], i),
                )
            self._meta.pop(self._ids[victim])
            self._rows.pop(victim)
            self._ids.pop(victim)

    def _matches(self, row: dict, cond: dict) -> bool:
        return all(row.get(k) == v for k, v in cond.items())

    # -- reference Table API --------------------------------------------
    def insert(self, row: dict) -> None:
        self._seq += 1
        slot = self._seq
        self._rows.append(dict(row))
        self._ids.append(slot)
        self._meta[slot] = [self._seq, 1]
        self._evict_if_needed()

    def update(self, cond: dict, set_values: dict) -> bool:
        updated = False
        for i, row in enumerate(self._rows):
            if self._matches(row, cond):
                row.update(set_values)
                self._touch(i)
                updated = True
        return updated

    def delete(self, cond: dict) -> bool:
        keep = [
            (r, s) for r, s in zip(self._rows, self._ids)
            if not self._matches(r, cond)
        ]
        changed = len(keep) != len(self._rows)
        for s in set(self._ids) - {s for _, s in keep}:
            self._meta.pop(s)
        self._rows = [r for r, _ in keep]
        self._ids = [s for _, s in keep]
        return changed

    def find(self, cond: dict) -> dict | None:
        for i, row in enumerate(self._rows):
            if self._matches(row, cond):
                self._touch(i)
                return dict(row)
        return None

    def contains(self, cond: dict) -> bool:
        return self.find(cond) is not None

    def all_rows(self) -> list[dict]:
        return [dict(r) for r in self._rows]

    def __len__(self) -> int:
        return len(self._rows)

    # -- Spark face ------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        """Current contents as a broadcast-sized DataFrame (≤ max_size
        rows by construction) for enrichment joins. Field names come from
        Spark's own DDL parser (naive string-splitting broke on legal
        spacing like ``"k int,v string"``); a row missing a schema column
        yields NULL there instead of raising at read time."""
        from pyspark.sql.types import StructType

        names = [f.name for f in StructType.fromDDL(self.schema).fields]
        return self.spark.createDataFrame(
            [tuple(r.get(n) for n in names) for r in self._rows]
            if self._rows
            else [],
            self.schema,
        )

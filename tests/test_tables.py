"""Table DML, on-demand queries, output rate limiting, incremental agg."""

from __future__ import annotations

from pyspark.sql import functions as F

from engine_spark.operators import output_rate as orate
from engine_spark.tables import IncrementalAggregation, Table
from tests.conftest import rows, ts


def _table(spark) -> Table:
    return Table(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id int, name string, v double"
        )
    )


def test_insert_update_delete(spark):
    t = _table(spark)
    t.insert(spark.createDataFrame([(4, "d", 40.0)], "id int, name string, v double"))
    t.update({"v": F.col("v") * 10}, F.col("id") == 1)
    t.delete(F.col("id") == 2)
    assert rows(t.df, "id", "v") == [(1, 100.0), (3, 30.0), (4, 40.0)]


def test_upsert_replaces_and_inserts(spark):
    t = _table(spark)
    t.upsert(
        spark.createDataFrame([(2, "B2", 99.0), (9, "z", 1.0)], "id int, name string, v double"),
        ["id"],
    )
    assert rows(t.df, "id", "name") == [
        (1, "a"), (2, "B2"), (3, "c"), (9, "z"),
    ]


def test_find_on_demand(spark):
    t = _table(spark)
    assert rows(t.find(F.col("v") > 15), "id") == [(2,), (3,)]


def events(spark):
    return spark.createDataFrame(
        [("u1", ts(0), i) for i in range(7)]
        + [("u2", ts(1), 10)],
        "user string, ts timestamp, i int",
    ).withColumn("ts", F.col("ts") + F.make_interval(secs=F.col("i")))


def test_output_first_every_n(spark):
    out = orate.first_every_n(events(spark), "ts", 3, ["user"])
    got = rows(out, "user", "i")
    assert got == [("u1", 0), ("u1", 3), ("u1", 6), ("u2", 10)]


def test_output_last_every_n(spark):
    out = orate.last_every_n(events(spark), "ts", 3, ["user"])
    # partial trailing batch (and u2's single event) emit nothing
    assert rows(out, "user", "i") == [("u1", 2), ("u1", 5)]


def test_output_last_every_interval(spark):
    df = spark.createDataFrame(
        [("u1", ts(0), 1), ("u1", ts(3), 2), ("u1", ts(7), 3)],
        "user string, ts timestamp, i int",
    )
    out = orate.last_every_interval(df, "ts", "5 minutes", ["user"])
    assert rows(out, "i") == [(2,), (3,)]


def test_incremental_agg_cascade_matches_direct(spark):
    df = spark.createDataFrame(
        [("a", ts(0, 10), 1.0), ("a", ts(0, 40), 2.0), ("a", ts(2), 10.0), ("b", ts(59), 5.0)],
        "g string, ts timestamp, v double",
    )
    agg = IncrementalAggregation(df, "ts", ["g"], "v",
                                 granularities=("second", "minute", "hour"))
    # minute level: a@12:00 → (2 events, sum 3), a@12:02 → (1, 10), b@12:59
    got = rows(agg.query(per="minute"), "g", "cnt", "sum_v")
    assert got == [("a", 1, 10.0), ("a", 2, 3.0), ("b", 1, 5.0)]
    # hour level re-aggregates the minute level
    got_h = rows(agg.query(per="hour"), "g", "cnt", "sum_v", "min_v", "max_v")
    assert got_h == [("a", 3, 13.0, 1.0, 10.0), ("b", 1, 5.0, 5.0, 5.0)]


def test_incremental_agg_within_bounds(spark):
    df = spark.createDataFrame(
        [("a", ts(0), 1.0), ("a", ts(30), 2.0)], "g string, ts timestamp, v double"
    )
    agg = IncrementalAggregation(df, "ts", ["g"], "v", granularities=("minute",))
    out = agg.query(per="minute", within=(ts(0), ts(10)))
    assert rows(out, "sum_v") == [(1.0,)]


def test_snapshot_every_interval(spark):
    from engine_spark.operators.output_rate import snapshot_every_interval

    df = spark.createDataFrame(
        [("k1", ts(0), 1.0), ("k1", ts(2), 2.0), ("k1", ts(7), 3.0), ("k2", ts(1), 9.0)],
        "k string, ts timestamp, v double",
    )
    out = snapshot_every_interval(df, "ts", "5 minutes", ["k"])
    got = rows(out, "k", "v", "snapshot_ts")
    # last-known value per key per 5-min tick
    assert ("k1", 2.0, ts(5)) in got and ("k1", 3.0, ts(10)) in got
    assert ("k2", 9.0, ts(5)) in got


def test_table_parquet_persistence_roundtrip(spark, tmp_path):
    """persist_path: every DML version lands on disk; a fresh reader sees
    the current version (the Delta-swap seam)."""
    p = str(tmp_path / "t")
    t = Table(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string"),
        persist_path=p,
    )
    t.delete(F.col("id") == 1)
    t.insert(spark.createDataFrame([(3, "c")], "id int, name string"))
    # the table's own view
    assert rows(t.df, "id", "name") == [(2, "b"), (3, "c")]
    # an independent reader of the current persisted version
    assert rows(spark.read.parquet(t.current_path), "id", "name") == [
        (2, "b"), (3, "c"),
    ]
    # prior versions remain readable (snapshot model)
    assert t.current_path.endswith("v00002")


def test_partitioned_update_rewrites_only_affected_partition(spark, tmp_path):
    """Partition-pruned DML: an UPDATE matching only region=1 must leave
    every other partition's files BYTE-IDENTICAL (hardlinked from the
    previous snapshot, the manifest-reuse model), and a fully-deleted
    partition disappears from the new snapshot."""
    import os

    p = str(tmp_path / "pt")
    t = Table(
        spark.createDataFrame(
            [(i, i % 3, float(i)) for i in range(30)],
            "id int, region int, v double",
        ),
        persist_path=p,
        partition_by=["region"],
    )
    v0 = t.current_path

    def part_files(root, part):
        d = os.path.join(root, part)
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        ) if os.path.isdir(d) else None

    t.update({"v": F.col("v") + 1000}, F.col("region") == 1)
    v1 = t.current_path
    assert v1 != v0
    # unaffected partitions: identical file lists, same inodes (hardlinks)
    for part in ("region=0", "region=2"):
        assert part_files(v0, part) == part_files(v1, part)
        for f in part_files(v1, part):
            s0 = os.stat(os.path.join(v0, part, f))
            s1 = os.stat(os.path.join(v1, part, f))
            assert s0.st_ino == s1.st_ino, f"{part}/{f} was rewritten"
    # affected partition: new files, updated values
    got = rows(t.df.filter("region = 1"), "v")
    assert all(v >= 1000 for (v,) in got) and len(got) == 10
    # untouched data still correct through the table view
    assert set(rows(t.df.filter("region = 0"), "v")) == {
        (float(i),) for i in range(30) if i % 3 == 0
    }

    # DELETE an entire partition: its directory is absent from the snapshot
    t.delete(F.col("region") == 2)
    v2 = t.current_path
    assert part_files(v2, "region=2") is None
    assert part_files(v2, "region=0") == part_files(v0, "region=0")
    assert t.df.count() == 20


def test_partitioned_insert_and_upsert_prune(spark, tmp_path):
    import os

    p = str(tmp_path / "pt2")
    t = Table(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id int, g string, v double"
        ),
        persist_path=p,
        partition_by=["g"],
    )
    v0 = t.current_path
    # insert into a NEW partition: existing partitions untouched
    t.insert(spark.createDataFrame([(3, "c", 3.0)], "id int, g string, v double"))
    v1 = t.current_path
    for part in ("g=a", "g=b"):
        f0 = sorted(os.listdir(os.path.join(v0, part)))
        f1 = sorted(os.listdir(os.path.join(v1, part)))
        assert f0 == f1
    assert rows(t.df, "id", "g", "v") == [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)]

    # upsert replacing id=1 (lives in g=a) + inserting id=9 into g=z:
    # g=b must remain linked
    t.upsert(
        spark.createDataFrame([(1, "a", 99.0), (9, "z", 9.0)], "id int, g string, v double"),
        ["id"],
    )
    v2 = t.current_path
    sb1 = os.stat(os.path.join(v1, "g=b", sorted(os.listdir(os.path.join(v1, "g=b")))[0]))
    sb2 = os.stat(os.path.join(v2, "g=b", sorted(os.listdir(os.path.join(v2, "g=b")))[0]))
    assert sb1.st_ino == sb2.st_ino
    assert rows(t.df, "id", "v") == [(1, 99.0), (2, 2.0), (3, 3.0), (9, 9.0)]


def test_jdbc_table_end_to_end_with_embedded_derby(spark, tmp_path):
    """Real JDBC round-trip against the Derby embedded driver that ships in
    Spark's own jars (no external database needed): write a dimension table
    through Spark's JDBC sink, read it back with jdbc_table, assert filter
    pushdown reaches the JDBC relation, and enrich a fact frame with it."""
    from engine_spark.tables import jdbc_table

    url = f"jdbc:derby:{tmp_path}/dimdb;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    dim = spark.createDataFrame(
        [(1, "eu"), (2, "us"), (3, "apac")], "id int, region string"
    )
    w = dim.write.format("jdbc").option("url", url).option("dbtable", "dim")
    for k, v in props.items():
        w = w.option(k, v)
    w.mode("overwrite").save()

    t = jdbc_table(spark, url, "dim", props)
    assert sorted((r["id"], r["region"]) for r in t.collect()) == [
        (1, "eu"), (2, "us"), (3, "apac"),
    ]

    # predicate pushdown: the filter must land in the JDBC scan, not Spark
    filtered = t.filter(F.col("id") >= 2)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(ID,2)" in plan.replace(
        "id", "ID"
    )
    assert filtered.count() == 2

    # enrichment join (the reference's jdbc_table use case, jdbc_table.rs)
    facts = spark.createDataFrame([(10.0, 1), (20.0, 2), (5.0, 1)], "v double, id int")
    got = sorted(
        (r["region"], r["v"])
        for r in facts.join(F.broadcast(t), "id").select("region", "v").collect()
    )
    assert got == [("eu", 5.0), ("eu", 10.0), ("us", 20.0)]


def test_cache_table_fifo_eviction_matches_reference(spark):
    """Reference cache_table.rs trim_if_needed pops the OLDEST insert once
    len > max_size — exact FIFO parity, plus the find/update/delete API."""
    from engine_spark.tables import CacheTable

    t = CacheTable(spark, "k int, v string", max_size=3, policy="fifo")
    for k, v in [(1, "a"), (2, "b"), (3, "c")]:
        t.insert({"k": k, "v": v})
    t.insert({"k": 4, "v": "d"})  # evicts k=1 (oldest insert)
    assert [r["k"] for r in t.all_rows()] == [2, 3, 4]
    # touching k=2 must NOT save it under fifo (reference has no recency)
    assert t.find({"k": 2}) == {"k": 2, "v": "b"}
    t.insert({"k": 5, "v": "e"})
    assert [r["k"] for r in t.all_rows()] == [3, 4, 5]
    assert t.update({"k": 4}, {"v": "D"}) is True
    assert t.find({"k": 4})["v"] == "D"
    assert t.delete({"k": 3}) is True
    assert t.delete({"k": 99}) is False
    assert len(t) == 2 and not t.contains({"k": 3})


def test_cache_table_lru_and_lfu_policies(spark):
    """The reference config layer declares Lru (default) and Lfu eviction
    (application_config.rs:651-671) without wiring them; here they work."""
    from engine_spark.tables import CacheTable

    lru = CacheTable(spark, "k int", max_size=3, policy="lru")
    for k in (1, 2, 3):
        lru.insert({"k": k})
    lru.find({"k": 1})  # 1 is now most-recently used
    lru.insert({"k": 4})  # evicts 2 (least recently touched)
    assert sorted(r["k"] for r in lru.all_rows()) == [1, 3, 4]

    lfu = CacheTable(spark, "k int", max_size=3, policy="lfu")
    for k in (1, 2, 3):
        lfu.insert({"k": k})
    for _ in range(3):
        lfu.find({"k": 1})
    lfu.find({"k": 3})
    lfu.insert({"k": 4})  # evicts 2 (lowest touch count; 4 is fresh but ties lose to OLDER — 2 has freq 1, 4 has freq 1, 2 is older)
    assert sorted(r["k"] for r in lfu.all_rows()) == [1, 3, 4]


def test_cache_table_broadcast_enrichment(spark):
    """The Spark face: a cache table is ≤ max_size rows by construction,
    so enrichment joins broadcast it — no shuffle of the stream side."""
    from engine_spark.tables import CacheTable

    t = CacheTable(spark, "code string, label string", max_size=10)
    t.insert({"code": "a", "label": "alpha"})
    t.insert({"code": "b", "label": "beta"})
    facts = spark.range(100).select(
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("code"),
        F.col("id").alias("n"),
    )
    j = facts.join(F.broadcast(t.df), "code")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:400]
    assert j.count() == 100
    got = j.filter(F.col("n") == 0).select("label").first()["label"]
    assert got == "alpha"


def test_cache_table_df_tolerates_spacing_and_missing_cols(spark):
    """`.df` must use Spark's DDL parser (not naive ', ' splitting) and
    emit NULL for a row inserted without some schema column."""
    from engine_spark.tables import CacheTable

    t = CacheTable(spark, "k int,v string", max_size=3)  # no space after comma
    t.insert({"k": 1, "v": "a"})
    t.insert({"k": 2})  # missing v -> NULL, not KeyError
    got = {r.k: r.v for r in t.df.collect()}
    assert got == {1: "a", 2: None}

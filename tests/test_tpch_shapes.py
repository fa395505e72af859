"""Plan- and semantics-level tests for the round-10 TPC-H shape gates.

The oracle sweep (tools/check_correctness.py) proves VALUE equality against
DuckDB; these tests pin the properties the oracle cannot see:

- Q11/Q15 share ONE fact subtree at runtime (AQE ReusedExchange) — the
  scalar-threshold branch must not cost a second scan of lineitem;
- Q13's LEFT OUTER join keeps zero-order customers (the driver testdata has
  none, so DuckDB would agree with an accidental INNER join there);
- Q2's min-equality keeps ALL tied suppliers, not an arbitrary one.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from engine_spark.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _final_plan(df) -> str:
    df.collect()  # AQE finalizes (and reuses exchanges) only at runtime
    return df._jdf.queryExecution().executedPlan().toString()


def test_q11_reuses_fact_exchange(spark):
    plan = _final_plan(QUERIES["agg_q11_important_parts"].spark(spark, SF_DIR))
    assert "ReusedExchange" in plan, (
        "the global-mean branch must reuse the per-part aggregate's "
        "exchange, not rescan lineitem"
    )


def test_q15_reuses_fact_exchange(spark):
    plan = _final_plan(QUERIES["join_q15_top_supplier"].spark(spark, SF_DIR))
    assert "ReusedExchange" in plan, (
        "the scalar-max branch must reuse the per-supplier aggregate's "
        "exchange — the explicit isNotNull(l_suppkey) keeps both subtrees "
        "canonically equal"
    )


def test_q13_outer_join_keeps_zero_order_customers(spark, tmp_path):
    # synthetic sf_dir: customer 3 has NO orders, customer 2 has only an
    # excluded-priority order — both must land in the c_count=0 bucket
    cust = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["c_custkey", "c_name"]
    )
    orders = spark.createDataFrame(
        [
            (10, 1, "1-URGENT"),
            (11, 1, "2-HIGH"),
            (12, 2, "4-NOT SPECIFIED"),
        ],
        ["o_orderkey", "o_custkey", "o_orderpriority"],
    )
    cust.write.parquet(str(tmp_path / "customer.parquet"))
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["c_count"]: r["custdist"]
        for r in QUERIES["join_q13_order_distribution"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out == {2: 1, 0: 2}


def test_q2_keeps_all_tied_minimum_suppliers(spark):
    res = QUERIES["join_q2_min_cost_supplier"].spark(spark, SF_DIR)
    got = res.collect()
    assert got, "Q2 must return rows at sf0.001"
    # recompute each part's floor independently and check every returned
    # row sits exactly on it (equality, not approximate)
    from engine_spark.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    eu = (
        cat["nation"]
        .join(
            cat["region"].filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
    )
    floors = {
        r["l_partkey"]: r["floor"]
        for r in (
            cat["lineitem"]
            .join(
                cat["supplier"].join(
                    eu, F.col("s_nationkey") == F.col("n_nationkey")
                ),
                F.col("s_suppkey") == F.col("l_suppkey"),
            )
            .filter(F.col("l_quantity") > 0)
            .groupBy("l_partkey")
            .agg(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                    "floor"
                )
            )
            .collect()
        )
    }
    for row in got:
        assert row["unit_price"] == floors[row["p_partkey"]]


def test_q4_semi_join_counts_each_order_once(spark):
    # total qualifying orders must equal the count of DISTINCT late orders
    # in the window — a plain inner join would multiply by late-line count
    res = QUERIES["join_q4_priority_checking"].spark(spark, SF_DIR)
    total = sum(r["n_orders"] for r in res.collect())
    from engine_spark.catalog import Catalog

    cat = Catalog(spark, SF_DIR)
    o = cat["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01 00:00:00").cast("timestamp"))
    )
    li = cat["lineitem"].select("l_orderkey", "l_shipdate")
    distinct_late = (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
            ),
        )
        .select("o_orderkey")
        .distinct()
        .count()
    )
    assert total == distinct_late

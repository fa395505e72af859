"""Measured scaling curves: the same operator chains on 1x vs 10x parquet.

The 100 TB claim everyone hand-waves is a scaling EXPONENT claim: a chain
whose runtime grows by ~Nx on Nx rows is shuffle/scan-bound and survives a
cluster scale-up; one that grows faster is hiding quadratic work. This
probe materializes nothing new — it reuses bench.py's cached 10x
replicated parquet (.benchdata) and times each chain on the 1x original
and the 10x replica, reporting the growth ratio (ideal: <= replication
factor; fixed job overhead makes small inputs LOOK slower per row, so
ratios well under 10 are expected at these sizes).

Usage: python tools/scaling_probe.py [sf_dir]   (default /root/testdata/sf0.1)
Prints one JSON line: {"chains": {name: {"t1": s, "t10": s, "ratio": r}}}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from pyspark.sql import functions as F

    from engine_spark.catalog import Catalog
    from engine_spark.datapipe.queries import minhash_signatures, shingles_of
    from engine_spark.operators import pattern, windows
    from engine_spark.operators.aggregations import dec
    from engine_spark.session import get_spark

    spark = get_spark("scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, sf_dir)

    rep_root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata",
        f"{os.path.basename(sf_dir.rstrip('/'))}_rep10",
    )
    if not os.path.exists(rep_root):
        raise SystemExit(f"run bench.py first to materialize {rep_root}")
    rep = {t: spark.read.parquet(os.path.join(rep_root, t))
           for t in ("events", "lineitem", "documents")}
    # embeddings have no _rep10 copy; the key-shifted sf1 replica (same
    # 10x duplication regime) stands in when it has been materialized
    emb10 = os.path.join(os.path.dirname(rep_root), "sf1",
                         "embeddings.parquet")
    if os.path.exists(emb10):
        rep["embeddings"] = spark.read.parquet(emb10)

    def filter_chain(d):
        return d.filter(
            (F.col("l_quantity") > 45) & (F.col("l_returnflag") != "N")
        ).select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )

    def agg_chain(d):
        return d.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum(dec("l_quantity")).alias("sq"),
            F.avg(dec("l_extendedprice")).alias("ap"),
            F.count(F.lit(1)).alias("n"),
        )

    def cep_chain(d):
        return windows.time_sliding(
            d, "ts", 600, partition_by=("user_id",),
            aggs={"n": F.count(F.lit(1))},
        )

    def pattern_chain(d):
        return pattern.followed_by(
            d, "ts", ["user_id"],
            first=F.col("event_type") == "signup",
            second=F.col("event_type") == "purchase",
            within_seconds=1800,
        )

    def minhash_chain(d):
        return minhash_signatures(shingles_of(d, materialize=False))

    def exsub_chain(d):
        # ExactSubstr removal spans: NO candidate-pair join anywhere, so
        # the 10x-replicated corpus (every gram's count x10) must grow
        # ~linearly — the dup-mark semi-join stays multiplicity 1 per
        # position regardless of how corpus-hot a gram is. This is the
        # adversarial regime for pair-based dedup and the null case here.
        from engine_spark.datapipe.spans import exact_substr_cuts

        return exact_substr_cuts(d.repartition(32), 8)

    def simhash_chain(d):
        # capped chunk blocking: 10x docs must grow the candidate join
        # ~linearly (bucket cap bounds per-bucket pair volume; without it
        # the replicated corpus's 10x-fatter buckets would cost 100x)
        from engine_spark.datapipe.queries import (
            SP as _SPD,
            _simhash_expr,
            simhash_pairs,
        )

        # same single-row-group mitigation as q_dedup_simhash: the 56
        # interpreted filters of the signature otherwise run on one task
        s = d.repartition(32).select(
            "doc_id", F.expr(_simhash_expr(_SPD)).alias("sim")
        )
        return simhash_pairs(s)

    def embedding_chain(d):
        # r13 occupancy cap: the 10x-duplicated corpus fattens every
        # hyperplane bucket 10x — without the cap the within-bucket
        # verify is ~100x pairs (the r12 sweep measured 10.95x wall);
        # capped, growth must track the replication factor
        from engine_spark.datapipe.queries import (
            COSINE_T,
            LSH_PROJ_DIM,
            PLANES,
            SP as _SPD,
            _vecd,
        )
        from engine_spark.datapipe.vector import dedup_embedding_cosine_arrow

        vecs = d.repartition(32).select(
            "vec_id", F.expr(_vecd(_SPD)).alias("vd")
        )
        return dedup_embedding_cosine_arrow(
            vecs, PLANES, LSH_PROJ_DIM, COSINE_T
        )

    def segment_chain(d):
        from engine_spark.datapipe.segments import dedup_segments

        return dedup_segments(d.select("doc_id", "text"))

    def shuffle_chain(d):
        from engine_spark.datapipe.packing import shuffle_shards

        return shuffle_shards(d.select("doc_id"), n_shards=32)

    def fuzzy_chain(d):
        # the replicated corpus repeats every prefix 10x — exactly the
        # block-growth regime the groupBy+join cap (not a window) handles
        from engine_spark.datapipe.queries import fuzzy_pairs

        return fuzzy_pairs(d.select("doc_id", "text"))

    def gapfill_chain(d):
        # the dense grid generates from per-key aggregated spans, so 10x
        # events must NOT mean 10x grid rows (key count drives the grid)
        from pyspark.sql import Window as W

        hourly = d.groupBy(
            "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.count(F.lit(1)).alias("n"))
        grid = (
            hourly.groupBy("user_id")
            .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
            .select("user_id", F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")).alias("hour"))
        )
        w = W.partitionBy("user_id").orderBy("hour")
        return grid.join(hourly, ["user_id", "hour"], "left").select(
            "user_id", "hour",
            F.last("n", ignorenulls=True).over(w).alias("filled"),
        )

    def bm25_chain(d):
        # index aggregations scale with postings; the broadcast query set
        # bounds scoring at postings-of-queried-terms, so 10x docs must
        # cost ~10x index work, never 10x * |queries| scoring work
        from engine_spark.datapipe.queries import BM25_QUERIES, bm25_scores

        qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")
        return bm25_scores(d.select("doc_id", "text"), qdf)

    def cohort_chain(d):
        # collect_set(day) is calendar-bounded per user: 10x events over
        # the same user/day span combine map-side to the SAME set sizes.
        # Times the gate's OWN plan (shared helper), so SCALE.md can never
        # drift from what the engine actually runs.
        from engine_spark.queries import cohort_retention

        return cohort_retention(d)

    def funnel_chain(d):
        # all three stage minima resolve in ONE user-keyed exchange; 10x
        # events over the same users must cost ~one bigger window pass,
        # never three more fact shuffles. Times the gate's OWN plan.
        from engine_spark.queries import funnel_stages

        return funnel_stages(d)

    def q17_chain(d):
        # TPC-H Q17 shape (mirrors q_join_q17): brand-pruned part dim
        # broadcast into the fact, per-part mean as window sums over ONE
        # partkey exchange — 10x lineitem must cost ~one bigger window
        # pass, never a second fact scan or a join blow-up
        from pyspark.sql import Window as W

        p = cat["part"].filter(F.col("p_brand") == "Brand#23").select("p_partkey")
        li = d.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        w = W.partitionBy("l_partkey")
        avg_qty = (
            F.sum(F.col("l_quantity").cast("decimal(18,4)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        )
        return (
            li.withColumn("part_avg", avg_qty)
            .filter(F.col("l_quantity") < F.lit(0.5) * F.col("part_avg"))
            .agg(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
                .cast("double").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
        )

    def q20_chain(d):
        # TPC-H Q20 shape (mirrors q_join_q20): ONE (partkey, suppkey)
        # aggregate, per-part totals as a window ON that aggregate (the
        # oracle's second CTE + self-join shape would pay a second fact
        # pass) — the window input is pair-sized, so 10x lineitem grows
        # the first aggregate linearly and the window sub-linearly
        from pyspark.sql import Window as W

        sq = (
            d.filter(
                (F.col("l_shipdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("2000-01-01 00:00:00").cast("timestamp"))
            )
            .groupBy("l_partkey", "l_suppkey")
            .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("supp_qty"))
        )
        part_qty = F.sum("supp_qty").over(W.partitionBy("l_partkey"))
        p = cat["part"].filter(F.col("p_name").like("small%")).select("p_partkey")
        return (
            sq.withColumn("part_qty", part_qty)
            .filter(
                F.col("supp_qty").cast("double")
                > F.lit(0.3) * F.col("part_qty").cast("double")
            )
            .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
            .select("l_suppkey").distinct()
        )

    chains = {
        "filter_project": (filter_chain, "lineitem"),
        "hash_aggregate": (agg_chain, "lineitem"),
        "sliding_window_cep": (cep_chain, "events"),
        "pattern_followed_by": (pattern_chain, "events"),
        "minhash_signatures": (minhash_chain, "documents"),
        "simhash_dedup": (simhash_chain, "documents"),
        "exact_substr_cuts": (exsub_chain, "documents"),
        "segment_dedup": (segment_chain, "documents"),
        **({"embedding_dedup": (embedding_chain, "embeddings")}
           if "embeddings" in rep else {}),
        "seeded_shuffle": (shuffle_chain, "documents"),
        "fuzzy_dedup": (fuzzy_chain, "documents"),
        "events_gapfill": (gapfill_chain, "events"),
        "bm25_retrieval": (bm25_chain, "documents"),
        "cohort_retention": (cohort_chain, "events"),
        "events_funnel": (funnel_chain, "events"),
        "tpch_q17_corr_avg": (q17_chain, "lineitem"),
        "tpch_q20_share_window": (q20_chain, "lineitem"),
    }

    def t(df) -> float:
        df.write.format("noop").mode("overwrite").save()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    out = {}
    for name, (build, tbl) in chains.items():
        t1 = t(build(cat[tbl]))
        t10 = t(build(rep[tbl]))
        out[name] = {
            "t1": round(t1, 4),
            "t10": round(t10, 4),
            "ratio": round(t10 / t1, 2),
        }
    print(json.dumps({"sf": sf_dir, "replication": 10, "chains": out}))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""End-to-end training-corpus preprocessing with the datapipe operators.

Composes the stages a 100 TB pipeline runs, on the sf0.01 testdata:

  exact dedup -> segment (paragraph) dedup -> MinHash-LSH near-dup
  clusters -> quality + surprisal filters -> domain-weighted mixing ->
  sequence packing -> seeded shuffle -> chunking

Run:  python examples/datapipe_pipeline.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from engine_spark.catalog import Catalog
from engine_spark.datapipe.cluster import dedup_clusters
from engine_spark.datapipe.packing import (
    chunk_documents, domain_mix_sample, sequence_pack,
)
from engine_spark.datapipe.queries import surprisal_scores
from engine_spark.session import get_spark


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("datapipe-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = Catalog(spark, sf_dir)["documents"]
    n0 = docs.count()

    # 1. exact dedup: keep the lowest doc_id per normalized-text hash
    keep_exact = (
        docs.select("doc_id", F.expr("md5(lower(text))").alias("h"))
        .groupBy("h").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    docs = docs.join(keep_exact, "doc_id")

    # 1b. segment-level dedup: drop repeated 8-token segments corpus-wide
    #     and rewrite the surviving documents (kills shared boilerplate)
    from engine_spark.datapipe.segments import dedup_segments
    rewritten = dedup_segments(docs).filter(F.col("n_kept") > 0)
    docs = docs.drop("text").join(
        rewritten.select("doc_id", F.col("new_text").alias("text")), "doc_id"
    )

    # 2. near-dup: MinHash signatures -> banded candidates -> verified pairs
    #    -> connected components -> keep each cluster's canonical doc
    from engine_spark.registry import QUERIES
    import engine_spark.queries  # noqa: F401
    pairs = QUERIES["dedup_minhash_lsh"].spark(spark, sf_dir).select(
        "doc_a", "doc_b"
    )
    clusters = dedup_clusters(pairs)
    drop = clusters.filter(~F.col("is_canonical")).select(
        F.col("doc_id")
    )
    docs = docs.join(drop, "doc_id", "anti")

    # 3. quality: token-count floor + unigram-surprisal band
    scored = surprisal_scores(docs)
    docs = docs.join(
        scored.filter(
            (F.col("n_tokens") >= 15)
            & F.col("mean_surprisal").between(3.0, 12.0)
        ).select("doc_id"),
        "doc_id",
    )

    # 4. domain mixing: target corpus proportions over `source`
    weights = {"src0": 0.2, "src1": 0.2, "src2": 0.2, "src3": 0.2, "src4": 0.2}
    mixed = domain_mix_sample(docs, weights)

    # 5. sequence packing (64-token sequences, 8 shards)
    with_counts = mixed.withColumn(
        "n_tokens",
        F.expr("CAST(size(filter(split(lower(text), ' '), t -> t <> '')) AS BIGINT)"),
    )
    packed = sequence_pack(with_counts, "n_tokens", seq_len=64, n_shards=8)

    # 6. reproducible training order: seeded shard + position
    from engine_spark.datapipe.packing import shuffle_shards
    order = shuffle_shards(mixed, seed=7, n_shards=8)

    # 7. retrieval chunks over the same kept set
    chunks = chunk_documents(mixed)

    print(f"documents: {n0} -> kept {mixed.count()}")
    packed.select("doc_id", "shard", "seq_first", "seq_last").show(5)
    order.orderBy("shard", "pos").show(5)
    chunks.groupBy().agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.countDistinct("chunk_hash").alias("distinct_chunks"),
    ).show()
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])

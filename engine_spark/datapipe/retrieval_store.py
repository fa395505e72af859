"""Incremental (streaming) BM25 index over an append-only corpus.

Batch BM25 (``bm25_scores``) re-tokenizes the whole corpus per run; a live
retrieval service over a growing corpus cannot. This module keeps a
persistent POSTINGS STORE — per new-document micro-batch it appends one
epoch directory of (doc_id, term, tf, dl) rows PARTITIONED BY a term-hash
bucket, plus a one-row corpus-stats sidecar — and answers queries against
the accumulated index without ever re-reading document text.

Scale design:

- postings are partitioned by ``bucket = pmod(xxhash64(term), N_BUCKETS)``
  INSIDE each epoch dir, so a query's terms prune the scan to their
  buckets (~|query terms| / N_BUCKETS of the index) via parquet partition
  pruning — the same literal-IN mechanism as the persisted IVF index;
- per-epoch corpus stats (n_docs, total_len) live in a ``_stats.json``
  sidecar (the leading underscore hides it from the parquet reader);
  query-time N and avgdl are the driver-side sum over epochs — epoch-count
  bounded, and compaction keeps the epoch count O(1);
- document frequency is computed AT QUERY TIME from the pruned postings of
  the queried terms only — exact over the full corpus, never
  vocabulary-sized state on the driver;
- epoch commit is stage + atomic rename on the Hadoop FS API (hdfs:///s3a
  ready), so a crash-replayed ``foreachBatch`` epoch is a no-op and state
  growth is exactly-once — the same protocol as the Bloom/minhash stores;
- compaction merges epochs ``<= upto`` into one ``epoch-<upto>-c`` dir.
  Unlike the Bloom store (whose set-union state is idempotent under
  double-representation), duplicated postings WOULD double-count tf — so
  readers resolve the canonical epoch set at LISTING time: a ``-c`` dir
  shadows every plain epoch with id <= its own, making a crash between
  publish and victim-removal harmless;
- searches running CONCURRENTLY with compaction get snapshot isolation:
  ``compact(upto, vacuum=False)`` publishes the ``-c`` dir but leaves the
  shadowed victims on disk, so a query that resolved its epoch listing
  before the publish keeps reading its intact (bit-identical)
  pre-compaction snapshot; a later ``vacuum()`` — after a grace period
  longer than the slowest query — reclaims the shadowed dirs.

Contract: doc_ids are append-only and unique across epochs (each document
is ingested once — re-ingesting under the same id would double its
postings, exactly like inserting a duplicate row into any append-only
store). Scoring matches ``bm25_scores`` bit-for-bit: same tokenizer, same
contribution expression, same rounded-DECIMAL sum (test-pinned by feeding
one corpus in two epochs and comparing against the batch path).

Reference parity: the reference engine has no retrieval surface — this is
part of the brief-mandated LLM-data-pipeline extensions, the incremental
face of the ``search_bm25`` gate.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine_spark.datapipe import fragments as FR
from engine_spark.datapipe.fragments import Dialect
from engine_spark.fsio import EpochLog, HadoopFS

_SP = Dialect("spark")

N_BUCKETS = 64

#: explicit schema for every epoch read: an epoch whose batch produced no
#: postings (idle trigger, token-less docs) is a dir with only _SUCCESS +
#: _stats.json — schema inference would throw; an explicit schema returns
#: an empty frame and keeps the stats contribution
POSTINGS_SCHEMA = "doc_id bigint, term string, tf bigint, dl bigint, bucket bigint"


class IncrementalBM25Index:
    """Persistent postings store + query-time BM25 scoring.

    Wire into a stream with ``foreachBatch(lambda df, eid:
    index.add_batch(df, eid))``, or drive from any batch loop; query with
    ``search(qdf, topk)`` where ``qdf`` is (q_id INT, term STRING).
    """

    def __init__(self, spark: SparkSession, state_dir: str,
                 n_buckets: int | None = None):
        self.spark = spark
        self.state_dir = state_dir.rstrip("/")
        self.post_dir = f"{self.state_dir}/postings"
        self._fs = HadoopFS(spark, self.state_dir)
        self._fs.mkdirs(self.post_dir)
        self._log = EpochLog(self._fs, self.post_dir)
        # The bucket count is PART OF THE STORE'S ON-DISK LAYOUT: postings
        # written under one modulus are unreachable through another (the
        # pruning filter would look in the wrong partitions and silently
        # miss them — ADVICE r10). Persist it in a store-level sidecar at
        # creation and read it back on every reopen; an explicit argument
        # that contradicts the persisted layout fails loudly.
        meta_path = f"{self.state_dir}/_meta.json"
        if self._fs.exists(meta_path):
            persisted = int(
                json.loads(self._fs.read_bytes(meta_path).decode())["n_buckets"]
            )
            if n_buckets is not None and n_buckets != persisted:
                raise ValueError(
                    f"store at {self.state_dir} was written with "
                    f"n_buckets={persisted}; reopening with {n_buckets} "
                    "would prune queries to the wrong buckets"
                )
            self.n_buckets = persisted
        else:
            self.n_buckets = int(n_buckets if n_buckets is not None else N_BUCKETS)
            self._fs.write_bytes(
                meta_path, json.dumps({"n_buckets": self.n_buckets}).encode()
            )

    # -- state ----------------------------------------------------------
    # Listing / commit / compaction-watermark bookkeeping delegates to the
    # shared EpochLog (fsio.py) — one shadow-resolution protocol for the
    # BM25 postings store and the persisted IVF index's ingest epochs.
    def _epoch_path(self, epoch_id: int, compacted: bool = False) -> str:
        return self._log.path(epoch_id, compacted)

    def committed(self, epoch_id: int) -> bool:
        """True when the epoch's dir exists or the compaction sidecar's
        merged-id set contains it (see ``EpochLog.committed``)."""
        return self._log.committed(epoch_id)

    def _epochs(self) -> list[tuple[int, str]]:
        """Canonical (epoch_id, dir) list with ``-c`` shadow resolution
        (see ``EpochLog.canonical``)."""
        return self._log.canonical()

    def _publish(self, postings: DataFrame, stats, final: str) -> bool:
        """``stats`` is a dict, or a callable invoked with the staging dir
        AFTER the parquet write (stats from the written postings)."""
        from engine_spark.fsio import publish_parquet_dir

        payload = (
            (lambda staging: json.dumps(stats(staging)).encode())
            if callable(stats)
            else json.dumps(stats).encode()
        )
        return publish_parquet_dir(
            self._fs, postings, self.state_dir, final,
            partition_by="bucket",
            sidecar=("_stats.json", payload),
        )

    def _read_epoch(self, path: str) -> DataFrame:
        return self.spark.read.schema(POSTINGS_SCHEMA).parquet(path)

    # -- ingest ---------------------------------------------------------
    def add_batch(self, docs: DataFrame, epoch_id: int,
                  text_col: str = "text") -> None:
        """Tokenize the batch and commit its postings exactly once."""
        final = self._epoch_path(epoch_id)
        if self.committed(epoch_id):
            return
        # ONE tokenization pass per epoch, and only two jobs: the former
        # shape paid three (eager localCheckpoint of tf, a stats job, a
        # tf⋈dl join feeding the write). Here tf flows straight into the
        # write — dl = sum(tf) over a doc_id window, identical values to
        # the join, no materialization barrier — and the sidecar stats
        # job reads the just-WRITTEN distinct-pair postings for
        # total_len (Σ tf ≡ Σ per-doc dl) plus a count of the raw batch
        # for n_docs (token-less docs are corpus members), never
        # re-tokenizing anything. (df.observe would fold the stats into
        # the write job itself, but observation metrics do not propagate
        # through a parquet write command in Spark 4.1.2.)
        from pyspark.sql import Window

        # repartition the RAW batch by doc_id before tokenizing: hash(doc_id)
        # satisfies the clustering of BOTH the (doc_id, term) aggregate
        # (subset key) and the dl window, so the tf groupBy and the window
        # reuse this one exchange — 3 shuffles/epoch -> 2, and the one
        # shuffle moves each document's text once instead of its postings
        # pairs twice (r14; plan-verified on the parquet source)
        tok = docs.repartition("doc_id").select(
            "doc_id", F.explode(F.expr(FR.tokens(_SP, text_col))).alias("term")
        )
        tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
        postings = tf.withColumn(
            "dl", F.sum("tf").over(Window.partitionBy("doc_id"))
        ).withColumn(
            "bucket", F.expr(f"pmod(xxhash64(term), {self.n_buckets})")
        )

        def _stats(staging: str) -> dict:
            n_docs, total_len = (
                docs.agg(F.count(F.lit(1)).alias("n")).crossJoin(
                    self.spark.read.schema(POSTINGS_SCHEMA)
                    .parquet(staging)
                    .agg(F.coalesce(F.sum("tf"), F.lit(0)).alias("t"))
                )
            ).collect()[0]
            return {"n_docs": n_docs, "total_len": int(total_len)}

        self._publish(postings, _stats, final)

    # -- query ----------------------------------------------------------
    def corpus_stats(self) -> tuple[int, int]:
        n, t = 0, 0
        for _, path in self._epochs():
            s = json.loads(self._fs.read_bytes(f"{path}/_stats.json").decode())
            n += s["n_docs"]
            t += s["total_len"]
        return n, t

    def search(self, qdf: DataFrame, topk: int = 10,
               exclude_self: bool = False) -> DataFrame:
        """(q_id, doc_id, score, rnk): BM25 top-k against the whole
        accumulated index. The scan is pruned to the query terms' buckets
        at the parquet source (literal bucket IN, PartitionFilters).
        ``exclude_self`` drops candidates with doc_id == q_id BEFORE
        ranking — the more-like-this contract where query ids are seed
        document ids (the search_hybrid_rrf gate's lexical side)."""
        from engine_spark.datapipe.queries import _bm25_contrib, r6

        epochs = self._epochs()
        if not epochs:
            raise ValueError("search on an empty index")
        # one driver round-trip for terms AND their buckets (was two)
        tb = (
            qdf.select("term").distinct()
            .withColumn(
                "b", F.expr(f"pmod(xxhash64(term), {self.n_buckets})")
            )
            .collect()
        )
        terms = [r["term"] for r in tb]
        buckets = sorted({r["b"] for r in tb})
        parts = [self._read_epoch(p) for _, p in epochs]
        post = parts[0]
        for p in parts[1:]:
            post = post.unionByName(p)
        post = post.filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )
        dfq = post.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        n_docs, total_len = self.corpus_stats()
        stats = self.spark.createDataFrame(
            [(n_docs, total_len)], "n_docs long, total_len long"
        )
        contrib = F.broadcast(qdf).join(post, "term")
        if exclude_self:
            contrib = contrib.filter(F.col("doc_id") != F.col("q_id"))
        contrib = (
            contrib.join(F.broadcast(dfq), "term")
            .crossJoin(F.broadcast(stats))
            .select("q_id", "doc_id", F.expr(_bm25_contrib()).alias("s"))
        )
        scored = contrib.groupBy("q_id", "doc_id").agg(
            F.expr(r6("CAST(sum(s) AS DOUBLE)")).alias("score")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= topk)
            .select("q_id", "doc_id", "score", "rnk")
        )

    # -- maintenance ----------------------------------------------------
    def compact(self, upto_epoch: int, vacuum: bool = True) -> int:
        """Merge every canonical epoch with id <= ``upto_epoch`` into ONE
        ``epoch-<upto>-c`` dir, then remove the originals. Returns the
        number of dirs merged. Publish-first ordering + listing-time
        shadowing makes a crash mid-removal harmless (shadowed dirs are
        never read); like the Bloom store, only compact epochs the stream
        can no longer replay (upto < newest committed epoch).

        ``vacuum=False`` defers the victim removal to a later
        :meth:`vacuum` call — SNAPSHOT ISOLATION for a live service where
        searches run concurrently with maintenance: a search plans its
        scan from the epoch listing it resolved at build time, so deleting
        victims out from under an in-flight query would fail (or, with
        ignoreMissingFiles, silently lose postings). With deferred vacuum
        the in-flight query keeps reading its intact pre-compaction
        snapshot (bit-identical postings — compaction only re-groups
        them), while every listing AFTER the -c publish resolves to the
        compacted set via shadowing. The caller grants a grace period
        longer than its slowest query before vacuuming, exactly the
        Delta/Iceberg VACUUM contract.

        Validation (stale/phantom/too-high watermarks) and shadow
        bookkeeping are the shared ``EpochLog`` protocol; only the merge
        itself — postings union + summed stats — is BM25-specific."""
        victims = self._log.compact_victims(upto_epoch)
        if len(victims) <= 1:
            return 0
        merged = self._read_epoch(victims[0][1])
        for _, p in victims[1:]:
            merged = merged.unionByName(self._read_epoch(p))
        n, t = 0, 0
        for _, p in victims:
            s = json.loads(self._fs.read_bytes(f"{p}/_stats.json").decode())
            n += s["n_docs"]
            t += s["total_len"]
        stats = {
            "n_docs": n,
            "total_len": t,
            "epochs": sorted(self._log.merged_ids(victims)),
        }
        final = self._epoch_path(upto_epoch, compacted=True)
        if not self._publish(merged, stats, final):
            raise RuntimeError(f"compaction publish to {final} failed")
        if vacuum:
            for _, p in victims:
                self._fs.delete(p)
        return len(victims)

    def vacuum(self) -> int:
        """Delete every epoch dir shadowed by the maximal ``-c`` dir (see
        ``EpochLog.vacuum`` for the grace-period caller contract)."""
        return self._log.vacuum()


def hybrid_search_incremental(
    spark: SparkSession,
    bm25: IncrementalBM25Index,
    ivf_path: str,
    qdf: DataFrame,
    *,
    n_seed_queries: int,
    pool: int = 20,
    topk: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """Reciprocal-rank fusion over the two LIVE stores — the incremental
    face of the ``search_hybrid_rrf`` gate.

    The lexical pool comes from the incremental BM25 postings store
    (``qdf`` = (q_id, term), q_id aligned with the seed DOCUMENT ids —
    the gate's more-like-this contract, so the seed excludes itself from
    its own lexical ranking exactly as the gate does), the semantic pool
    from the persisted IVF index (seeds = its first ``n_seed_queries``
    vectors, self-excluded likewise), and the fusion is the gate's own
    ``fuse_rrf`` — ONE shared implementation, not a copy. Both pools are
    top-``pool`` bounded, so the fusion join is dimension-sized
    regardless of corpus size.
    """
    from engine_spark.datapipe.ivf import ivf_index_search
    from engine_spark.datapipe.queries import fuse_rrf

    lex = (
        bm25.search(qdf, topk=pool, exclude_self=True)
        .select("q_id", F.col("doc_id").alias("cand_id"),
                F.col("rnk").alias("lex_rnk"))
    )
    sem = (
        ivf_index_search(
            spark, ivf_path, n_queries=n_seed_queries, nprobe=nprobe, topk=pool
        )
        .select("q_id", "cand_id", F.col("rnk").alias("sem_rnk"))
    )
    return fuse_rrf(lex, sem, topk)

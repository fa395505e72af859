"""Shared-substring-run detection between document pairs.

Exact-substring duplication is the third axis of corpus dedup (beside
set-overlap Jaccard and signature-based MinHash/SimHash): two documents
that share a long *contiguous* token run are near-certainly quoting or
mirroring each other even when their overall shingle overlap is small, and
verbatim runs are exactly what a language model memorizes (the motivation
for suffix-array substring dedup in the public literature — see PAPERS.md).

A distributed suffix array is overkill for run *detection*; the same
answer falls out of the n-gram inverted index the pipeline already builds:

1. k-gram + POSITION per document (row-local transform + posexplode);
2. document-frequency cap on the gram key (identical to the Jaccard
   candidate index: a corpus stop-gram would fan out quadratically);
3. equi-join on the gram → matched position pairs (pa, pb);
4. gaps-and-islands: within one (doc_a, doc_b) pair, matches on the same
   DIAGONAL (pa - pb constant) at consecutive pa form one run —
   ``island = pa - row_number()`` groups them without any iteration;
5. a run of m consecutive matching k-grams = a shared token run of
   m + k - 1 tokens.

Every step is a keyed shuffle (gram, then pair+diagonal) — no all-pairs,
no driver data. The df-cap can split a run containing a capped hot gram
into two shorter runs; both engines apply the same cap, and a run whose
every window is corpus-hot is the stop-phrase class a dedup pass should
not fire on anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine_spark.datapipe import fragments as FR
from engine_spark.datapipe.fragments import Dialect

SPAN_K = 3           #: gram width for run detection
SPAN_DF_CAP = 64     #: gram occurrences above this are excluded from matching
MIN_SPAN_TOKENS = 10  #: shortest shared run worth reporting


def positional_grams(docs: DataFrame, k: int = SPAN_K) -> DataFrame:
    """(doc_id, pos, gram) — every k-gram with its 1-based token position."""
    d = Dialect("spark")
    toks = docs.select("doc_id", F.expr(FR.tokens(d)).alias("toks"))
    grams = toks.select(
        "doc_id", F.posexplode(F.expr(FR.grams_all(d, "toks", k))).alias("p0", "gram")
    )
    return grams.select("doc_id", (F.col("p0") + 1).alias("pos"), "gram")


def substring_run_pairs(
    docs: DataFrame,
    k: int = SPAN_K,
    df_cap: int = SPAN_DF_CAP,
    min_span: int = MIN_SPAN_TOKENS,
) -> DataFrame:
    """(doc_a, doc_b, max_span, n_runs) for pairs sharing a token run of at
    least ``min_span`` tokens."""
    # the positional index is consumed three times (df count, and both
    # sides of the match join) — materialize it once; at cluster scale the
    # same index would be written to parquet rather than recomputed per
    # consumer (cache() keeps the plan identical across invocations, so
    # repeated gate runs share it)
    inv = positional_grams(docs, k).cache()
    # combine-enabled df-cap: groupBy().count() shuffles one partial row per
    # (gram, partition), then a keyed semi-join prunes — the gram-keyed
    # partitioning is reused by the match join below. (A Window.partitionBy
    # count would shuffle every positional gram row with no combine.)
    ok = (
        inv.groupBy("gram")
        .count()
        .filter(F.col("count") <= df_cap)
        .drop("count")
    )
    inv2 = inv.join(ok, "gram", "semi").cache()
    m = (
        inv2.alias("a")
        .join(
            inv2.alias("b"),
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    diag = (F.col("pa") - F.col("pb")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    runs = (
        m.select("doc_a", "doc_b", "pa", diag)
        .withColumn("isl", F.col("pa") - F.row_number().over(w))
        .groupBy("doc_a", "doc_b", "diag", "isl")
        .agg((F.count(F.lit(1)) + (k - 1)).alias("span"))
    )
    return (
        runs.groupBy("doc_a", "doc_b")
        .agg(F.max("span").alias("max_span"), F.count(F.lit(1)).alias("n_runs"))
        .filter(F.col("max_span") >= min_span)
    )


# ---------------------------------------------------------------------------
# corpus-level exact-substring removal ranges (ExactSubstr dedup)
# ---------------------------------------------------------------------------

EXSUB_K = 8  #: duplicated token runs of at least this length are cut


def exact_substr_cuts(docs: DataFrame, k: int = EXSUB_K) -> DataFrame:
    """Per-document removal ranges for corpus-duplicated token runs — the
    ExactSubstr dedup of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better"), word-granularity: any run of >= k
    consecutive tokens that occurs at least twice anywhere in the corpus
    (another document OR a second time in the same document) is marked for
    removal, and overlapping/adjacent marks merge into maximal cut spans.

    Unlike ``substring_run_pairs`` (pairwise max-span REPORTING), this is
    the corpus-level REMOVAL action: output is one row per document with
    the merged span inventory a trainer-side scrubber applies. The public
    formulation builds a corpus suffix array; the same marks fall out of
    the positional k-gram index with NO pairwise join at all:

    1. (doc_id, pos, gram-hash) per position — row-local, map-only;
    2. gram hashes with total corpus count >= 2 are "duplicated" — one
       combine-enabled groupBy on the hash;
    3. a position is cut iff its gram is duplicated — keyed semi-join,
       multiplicity 1 per position row (no df-cap needed: a corpus-hot
       gram still joins each position exactly once, so there is no
       quadratic regime anywhere — a better scale story than any
       candidate-pair dedup);
    4. per-doc merge of overlapping/adjacent k-windows into maximal spans:
       gaps-and-islands with a distance threshold (new island when the
       next duplicated position starts more than k after the previous —
       i.e. the windows neither overlap nor touch), one window + one
       groupBy on the doc key.

    Returns (doc_id, pos-sorted) span rows: one per maximal cut span.
    """
    # consumed twice (corpus count and join-back) and deliberately NOT
    # cached: the index is a map-only projection, and recomputing two
    # embarrassingly-parallel passes beats materializing a TB-scale
    # columnar cache (measured locally too: the InMemoryRelation build
    # cost ~5x the projection itself). hash56 (shared md5-derived BIGINT
    # fragment) keys the shuffle at 8 bytes instead of a 32-char md5
    # string; both engines hash identically by construction, so a
    # truncation collision — one expected per ~7e16 gram pairs — flips
    # the same position on both sides and is a correct-by-spec false
    # dup-mark, not a divergence.
    inv = positional_gram_hashes(docs, k)
    dup = inv.groupBy("h").count().filter(F.col("count") >= 2).drop("count")
    cut = inv.join(dup, "h", "semi")
    return merge_marks_to_spans(cut, k)


def positional_gram_hashes(docs: DataFrame, k: int = EXSUB_K) -> DataFrame:
    """(doc_id, pos, h): every k-gram position with its hash56 — the
    shared index of the batch and incremental ExactSubstr paths."""
    d = Dialect("spark")
    return positional_grams(docs, k).select(
        "doc_id", "pos", F.expr(d.hash56("gram")).alias("h")
    )


def merge_marks_to_spans(marks: DataFrame, k: int = EXSUB_K) -> DataFrame:
    """(doc_id, pos, …) cut marks → (doc_id, span_start, span_end) maximal
    spans: gaps-and-islands with the k-distance threshold (marks within k
    positions overlap or touch as k-token windows and merge)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = marks.select("doc_id", "pos").withColumn(
        "_new",
        F.when(
            F.lag("pos").over(w).isNull()
            | ((F.col("pos") - F.lag("pos").over(w)) > k),
            1,
        ).otherwise(0),
    ).withColumn(
        "island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (k - 1)).alias("span_end"),
    )


# ---------------------------------------------------------------------------
# incremental (streaming) ExactSubstr over an append-only corpus
# ---------------------------------------------------------------------------

class IncrementalExactSubstr:
    """Persistent gram-count store + per-batch duplicate-run cut marks —
    the streaming twin of :func:`exact_substr_cuts`, for the corpus that
    arrives as micro-batches and cannot be re-scanned per epoch.

    State per gram hash: the occurrence count so far plus the FIRST
    occurrence's (doc_id, pos). That first position is what makes the
    semantics match the batch pass exactly: when a gram's second
    occurrence arrives in a later epoch, the first occurrence —
    committed epochs ago, when the gram was still unique — must be cut
    RETROACTIVELY. The store keeps one row per gram per touching epoch
    (append-only deltas, the filequeue/minhash exactly-once idiom:
    stage + atomic rename, a crash-replayed epoch is a no-op), and
    reads aggregate the deltas; counts are capped at 2 on write (only
    the 0->1->2 transitions matter — a gram's 1000th occurrence changes
    nothing, so state per gram is O(1) and hot grams cannot bloat it).

    ``process_batch(batch_df, epoch_id)`` returns cut MARKS
    (doc_id, pos, retro): every k-gram start position the batch makes
    duplicated — batch positions whose gram already existed (or repeats
    in-batch), plus retro marks for stored first occurrences whose gram
    just crossed count 2. Feed the accumulated marks through
    :func:`merge_marks_to_spans` for scrubber spans. The union of all
    epochs' marks equals the batch pass on the full corpus (pytest
    pins this parity), with one caveat: marks for one doc can arrive
    across epochs, so span MERGING is the consumer's final step, not
    per-epoch output.
    """

    def __init__(self, spark: SparkSession, state_dir: str, k: int = EXSUB_K):
        import os

        self.spark = spark
        self.state_dir = state_dir
        self.k = k
        self.gram_dir = os.path.join(state_dir, "grams")
        os.makedirs(self.gram_dir, exist_ok=True)

    def _epoch_path(self, epoch_id: int) -> str:
        import os

        return os.path.join(self.gram_dir, f"epoch-{int(epoch_id):010d}")

    def committed(self, epoch_id: int) -> bool:
        import os

        return os.path.exists(self._epoch_path(epoch_id))

    def _store(
        self, before_epoch: int, restrict_to: DataFrame | None = None
    ) -> DataFrame | None:
        """Aggregated gram state from epochs strictly before
        ``before_epoch`` (crash replays see exactly the pre-epoch state):
        (h, count, first_doc, first_pos) — count capped at 2; the first
        occurrence is the (epoch, doc_id, pos)-minimal one.

        ``restrict_to`` (a (h) frame, micro-batch-sized) prunes the
        deltas BEFORE aggregating via a broadcast semi-join — the
        TB-scale delta store then streams map-side and only the handful
        of batch-matching rows reach the (tiny) aggregation; without it
        the groupBy would shuffle the whole store every epoch."""
        import os

        epochs = [
            d for d in os.listdir(self.gram_dir)
            if d.startswith("epoch-") and int(d.split("-")[1]) < before_epoch
        ]
        if not epochs:
            return None
        deltas = self.spark.read.parquet(
            *[os.path.join(self.gram_dir, d) for d in sorted(epochs)]
        )
        if restrict_to is not None:
            deltas = deltas.join(F.broadcast(restrict_to), "h", "semi")
        return deltas.groupBy("h").agg(
            F.least(F.sum("add"), F.lit(2)).alias("count"),
            F.min(F.struct("epoch", "first_doc", "first_pos")).alias("_f"),
        ).select(
            "h", "count",
            F.col("_f.first_doc").alias("first_doc"),
            F.col("_f.first_pos").alias("first_pos"),
        )

    def _commit(self, delta: DataFrame, epoch_id: int) -> None:
        import os
        import shutil
        import uuid

        final = self._epoch_path(epoch_id)
        if os.path.exists(final):
            return
        staging = os.path.join(
            self.state_dir, "_staging", f"e{uuid.uuid4().hex}"
        )
        delta.write.mode("overwrite").parquet(staging)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        try:
            os.rename(staging, final)
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
            if not os.path.exists(final):
                # NOT the lost-a-publish-race case: the epoch's counts
                # would be silently gone and its grams could never reach
                # count 2 — a permanent, invisible correctness loss
                raise

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """(doc_id, pos, retro) cut marks introduced by this batch; the
        batch's gram delta commits exactly once. Scale shape: the batch
        gram index is micro-batch-sized and BROADCAST against the
        TB-scale store (which streams map-side — never shuffled on the
        gram key); everything else is combine-enabled aggregation over
        the batch itself."""
        inv = positional_gram_hashes(batch_df, self.k).localCheckpoint(
            eager=True
        )
        # in-batch occurrence stats per gram: count + first position
        batch_stats = inv.groupBy("h").agg(
            F.count(F.lit(1)).alias("bcount"),
            F.min(F.struct("doc_id", "pos")).alias("bfirst"),
        )
        # store side pruned to THIS batch's grams before aggregation (the
        # broadcast semi-join inside _store): the left join below then
        # runs over two micro-batch-sized frames — the accumulated store
        # is never shuffled on the gram key, per the class contract
        store = self._store(
            before_epoch=epoch_id, restrict_to=batch_stats.select("h")
        )
        if store is not None:
            joined = batch_stats.alias("b").join(
                store.alias("s"), "h", "left"
            ).select(
                "h", "bcount", "bfirst",
                F.coalesce(F.col("s.count"), F.lit(0)).alias("scount"),
                F.col("s.first_doc").alias("sfd"),
                F.col("s.first_pos").alias("sfp"),
            )
        else:
            joined = batch_stats.select(
                "h", "bcount", "bfirst",
                F.lit(0).alias("scount"),
                F.lit(None).cast("long").alias("sfd"),
                F.lit(None).cast("int").alias("sfp"),
            )
        joined = joined.withColumn(
            "total", F.col("bcount") + F.col("scount")
        ).localCheckpoint(eager=True)

        # batch positions cut: every position of a gram with total >= 2
        dup_h = joined.filter(F.col("total") >= 2).select("h")
        batch_marks = inv.join(F.broadcast(dup_h), "h", "semi").select(
            "doc_id", "pos", F.lit(False).alias("retro")
        )
        # retro marks: stored UNIQUE gram (scount == 1) just crossed 2 —
        # its first occurrence, committed epochs ago, becomes a cut
        retro_marks = joined.filter(
            (F.col("scount") == 1) & (F.col("bcount") >= 1)
        ).select(
            F.col("sfd").alias("doc_id"),
            F.col("sfp").alias("pos"),
            F.lit(True).alias("retro"),
        )
        marks = batch_marks.unionByName(retro_marks).distinct()

        # delta: one row per batch gram (count capped at 2 on write; the
        # first-occurrence candidate only matters while the store side is
        # still unique, and the read-side min() picks the global first)
        delta = joined.select(
            "h",
            F.least(F.col("bcount"), F.lit(2)).alias("add"),
            F.lit(int(epoch_id)).alias("epoch"),
            F.col("bfirst.doc_id").alias("first_doc"),
            F.col("bfirst.pos").alias("first_pos"),
        )
        self._commit(delta, epoch_id)
        return marks

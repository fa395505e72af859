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
    d = Dialect("spark")
    inv = positional_grams(docs, k).select(
        "doc_id", "pos", F.expr(d.hash56("gram")).alias("h")
    )
    dup = inv.groupBy("h").count().filter(F.col("count") >= 2).drop("count")
    cut = inv.join(dup, "h", "semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = cut.withColumn(
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

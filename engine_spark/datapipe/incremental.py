"""Incremental (streaming) near-duplicate detection over an append-only corpus.

Batch dedup re-scans the whole corpus; a 100 TB ingestion pipeline cannot.
This module keeps a persistent MinHash *signature store* — one 32-component
signature plus 8 LSH band keys per document ever ingested — and, per
micro-batch of new documents:

1. computes batch signatures with the same explode + codegen'd min-aggregate
   plan as the batch gate (map-only + one keyed combine; see
   datapipe/queries.py q_dedup_minhash_lsh for the measured rationale);
2. finds candidates = batch bands ⋈ corpus bands (equi join on
   ``(band, bkey)``; the batch side is BROADCAST — a micro-batch is small by
   definition, so the TB-scale corpus store streams map-side and never
   shuffles) plus batch-internal band collisions;
3. verifies candidates by **estimated Jaccard** = fraction of equal
   signature components (the standard MinHash estimator,
   E[matches/K] = J). Signature-only verification is what makes the state
   bounded: ~300 bytes per corpus document, and the original text is never
   re-read;
4. commits the batch's signatures to the store as one idempotent
   epoch-named directory (stage + atomic rename, the same exactly-once
   protocol as sources/filequeue) — a crash-replayed epoch is a no-op, so
   foreachBatch delivery gives exactly-once state growth.

Trade-off vs the batch gate: the batch path verifies with EXACT Jaccard over
shingle sets; storing shingle sets per corpus doc would be unbounded, so the
incremental path accepts the estimator's ±1/sqrt(K) noise. With K=32 and
threshold 0.5 the estimator's σ ≈ 0.09 — pairs near the threshold can flip;
pairs at J ≥ 0.8 (the dedup regime) virtually never miss.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine_spark.datapipe import fragments as FR
from engine_spark.datapipe.fragments import (
    LSH_BANDS,
    MINHASH_A,
    MINHASH_B,
    MINHASH_K,
    Dialect,
)

_SP = Dialect("spark")
_MH_COLS = [f"mh{i}" for i in range(MINHASH_K)]


def minhash_signatures(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, mh0..mh31) — row-local shingling, one keyed combine."""
    toks = docs.select("doc_id", F.expr(FR.tokens(_SP, text_col)).alias("toks"))
    sh = toks.select(
        "doc_id", F.expr(FR.shingles(_SP, "toks", 2)).alias("sh")
    ).filter(F.expr(_SP.size("sh")) > 0)
    exploded = sh.select(
        "doc_id", F.explode(F.expr(FR.shingle_hashes(_SP, "sh"))).alias("h")
    )
    return exploded.groupBy("doc_id").agg(
        *[
            F.min(
                F.expr(f"({MINHASH_A[i]} * h + {MINHASH_B[i]}) % {FR.MINHASH_P}")
            ).alias(_MH_COLS[i])
            for i in range(MINHASH_K)
        ]
    )


def band_keys(sig: DataFrame) -> DataFrame:
    """(doc_id, band, bkey) — 8 row-local md5 band keys per signature."""
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(FR.band_key(_SP, _MH_COLS, b)).alias("bkey"),
            )
            for b in range(LSH_BANDS)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )


def estimated_jaccard_cond() -> F.Column:
    """matches/K over the 32 components of the a_/b_ prefixed signatures."""
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0) for c in _MH_COLS
    )
    return (matches / F.lit(float(MINHASH_K))).alias("est_jaccard")


class IncrementalMinHashDeduper:
    """Persistent signature store + per-batch near-dup detection.

    ``process_batch(batch_df, epoch_id)`` returns the near-dup pairs the
    batch introduces — (new doc, prior-or-batch doc, est_jaccard) — and
    commits the batch's signatures exactly once. Wire into a streaming
    query with ``foreachBatch(lambda df, eid: sink(dedup.process_batch(df,
    eid)))`` or drive it directly from any batch loop.
    """

    def __init__(
        self,
        spark: SparkSession,
        state_dir: str,
        threshold: float = 0.5,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.threshold = threshold
        self.sig_dir = os.path.join(state_dir, "sigs")
        os.makedirs(self.sig_dir, exist_ok=True)

    # -- state ---------------------------------------------------------------
    def _epoch_path(self, epoch_id: int) -> str:
        return os.path.join(self.sig_dir, f"epoch-{int(epoch_id):010d}")

    def committed(self, epoch_id: int) -> bool:
        return os.path.exists(self._epoch_path(epoch_id))

    def corpus_signatures(self, before_epoch: int | None = None) -> DataFrame | None:
        """Every committed signature; None when the store is empty.

        ``before_epoch`` restricts the read to epochs strictly earlier than
        the given id — process_batch uses it so a crash-replay of an
        already-committed epoch sees exactly the state that existed when the
        epoch first ran (its own signatures excluded), keeping the returned
        pair set deterministic across replays.
        """
        epochs = [d for d in os.listdir(self.sig_dir) if d.startswith("epoch-")]
        if before_epoch is not None:
            epochs = [d for d in epochs if int(d.split("-")[1]) < before_epoch]
        if not epochs:
            return None
        return self.spark.read.parquet(
            *[os.path.join(self.sig_dir, d) for d in sorted(epochs)]
        )

    def _commit(self, sig: DataFrame, epoch_id: int) -> None:
        final = self._epoch_path(epoch_id)
        if os.path.exists(final):  # crash replay of a committed epoch
            return
        staging = os.path.join(self.state_dir, "_staging", f"e{uuid.uuid4().hex}")
        sig.write.mode("overwrite").parquet(staging)
        os.makedirs(os.path.dirname(final), exist_ok=True)
        try:
            os.rename(staging, final)  # atomic publish
        except OSError:
            shutil.rmtree(staging, ignore_errors=True)
            if not os.path.exists(final):
                # NOT the lost-a-publish-race case: swallowing here would
                # silently drop the epoch's signatures from the store and
                # every future near-dup against them (same fix as the
                # ExactSubstr store)
                raise

    # -- per-batch -----------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> DataFrame:
        """Detect near-dups introduced by the batch, then commit its
        signatures. Replays of an already-committed epoch still return the
        pair set (deterministic) without growing state."""
        sig = minhash_signatures(batch_df).localCheckpoint(eager=True)
        new_bands = band_keys(sig)

        # Exclude this epoch (and any later ones) from the corpus read: on a
        # crash replay of a committed epoch the store already holds the
        # batch's own signatures, and including them would re-emit every
        # batch-internal pair a second time via the batch⋈corpus join (in
        # both orientations) — non-deterministic replay output.
        corpus = self.corpus_signatures(before_epoch=epoch_id)
        prefixed_new = sig.select(
            F.col("doc_id").alias("doc_new"),
            *[F.col(c).alias(f"a_{c}") for c in _MH_COLS],
        )

        # batch ⋈ corpus: broadcast the (small) batch band index
        pair_frames = []
        if corpus is not None:
            corpus_bands = band_keys(corpus)
            cand = (
                corpus_bands.alias("c")
                .join(
                    F.broadcast(new_bands.alias("n")),
                    (F.col("c.band") == F.col("n.band"))
                    & (F.col("c.bkey") == F.col("n.bkey"))
                    & (F.col("c.doc_id") != F.col("n.doc_id")),
                )
                .select(
                    F.col("n.doc_id").alias("doc_new"),
                    F.col("c.doc_id").alias("doc_prior"),
                )
                .distinct()
            )
            prefixed_corpus = corpus.select(
                F.col("doc_id").alias("doc_prior"),
                *[F.col(c).alias(f"b_{c}") for c in _MH_COLS],
            )
            pair_frames.append(
                cand.join(F.broadcast(prefixed_new), "doc_new").join(
                    prefixed_corpus, "doc_prior"
                )
            )

        # batch-internal collisions (both docs new; doc_new > doc_prior
        # orders the pair deterministically)
        internal = (
            new_bands.alias("x")
            .join(
                new_bands.alias("y"),
                (F.col("x.band") == F.col("y.band"))
                & (F.col("x.bkey") == F.col("y.bkey"))
                & (F.col("x.doc_id") > F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("doc_new"),
                F.col("y.doc_id").alias("doc_prior"),
            )
            .distinct()
        )
        prefixed_new_b = sig.select(
            F.col("doc_id").alias("doc_prior"),
            *[F.col(c).alias(f"b_{c}") for c in _MH_COLS],
        )
        pair_frames.append(
            internal.join(F.broadcast(prefixed_new), "doc_new").join(
                F.broadcast(prefixed_new_b), "doc_prior"
            )
        )

        pairs = pair_frames[0]
        for f in pair_frames[1:]:
            pairs = pairs.unionByName(f)
        out = (
            pairs.withColumn("est_jaccard", estimated_jaccard_cond())
            .filter(F.col("est_jaccard") >= self.threshold)
            .select("doc_new", "doc_prior", "est_jaccard")
        )
        out = out.localCheckpoint(eager=True)  # detect before state grows
        self._commit(sig, epoch_id)
        return out

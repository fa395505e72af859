"""Bloom-filter-accelerated exact dedup of a new batch against a corpus.

The standard shape for INCREMENTAL corpus ingestion at 100 TB: the seen
corpus is huge, the incoming batch is small, and a plain dedup join would
shuffle the corpus on every ingest. Instead:

1. **Build** (once per corpus version, cost = one corpus scan): every
   document's content hash sets ``K`` bits in an ``M``-bit Bloom filter.
   The only driver-side data is the DISTINCT SET BIT POSITIONS —
   bounded by ``M`` (a design constant, default 2^20 ≈ 130 KiB of
   bitmap), never by corpus size. Public LLM pipelines use exactly this
   structure for paragraph/document membership (e.g. Dolma's Bloom-based
   dedup); CCNet and C4 shard hashes for the same reason.
2. **Probe** (per batch, map-only): the bitmap broadcasts to executors;
   an Arrow-batched pandas UDF checks each batch row's K positions with
   vectorized numpy — no shuffle, no JVM↔driver traffic per row.
3. **Verify** (exactness): Bloom filters have false positives but ZERO
   false negatives, so rows whose bits are all set — and only those —
   are confirmed with an exact semi-join against the corpus hashes.
   The final answer is therefore EXACTLY the join result while the
   join's left side shrank from |batch| to |candidates| (≈ true dups +
   fp_rate·|batch|); at the default sizing the verify join touches ~1%
   of a disjoint batch.

The position formula is the same universal-hash family the MinHash
fragments use — ``((A_i·(h mod P) + B_i) mod P) mod M`` over the 56-bit
md5 content hash — rendered identically in Spark SQL (build side) and
numpy (probe side); ``tests/test_datapipe.py`` pins the two renderings
bit-equal.
"""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine_spark.datapipe.fragments import MINHASH_P, Dialect, _lcg
from engine_spark.fsio import HadoopFS

BLOOM_M = 1 << 20  #: filter size in bits (130 KiB bitmap)
BLOOM_K = 5        #: hash functions per key

#: deterministic universal-hash coefficients (distinct from the MinHash
#: family's draws: different seed).
_rng = _lcg(0xB100F)
BLOOM_A = [next(_rng) % (10**9) + 1 for _ in range(BLOOM_K)]
BLOOM_B = [next(_rng) % (10**9) for _ in range(BLOOM_K)]


def content_hash56(d: Dialect, text: str = "text") -> str:
    """56-bit content hash both engines agree on (case-normalized)."""
    return d.hash56(f"lower({text})")


def _positions_sql(h: str, m: int = BLOOM_M) -> str:
    """Spark SQL array of the K bit positions for hash column ``h``."""
    terms = ", ".join(
        f"cast((({a} * ({h} % {MINHASH_P}) + {b}) % {MINHASH_P}) % {m} as bigint)"
        for a, b in zip(BLOOM_A, BLOOM_B)
    )
    return f"array({terms})"


def _positions_np(h: np.ndarray, m: int = BLOOM_M) -> np.ndarray:
    """(n,) int64 hashes → (n, K) int64 bit positions; same formula as
    :func:`_positions_sql`. ``h % P < 2^32`` and ``A < 2^30`` keep every
    intermediate under 2^62 — exact in int64, matching SQL bigint."""
    hp = h.astype(np.int64) % MINHASH_P
    cols = [
        ((a * hp + b) % MINHASH_P) % m for a, b in zip(BLOOM_A, BLOOM_B)
    ]
    return np.stack(cols, axis=1)


def build_bloom(
    df: DataFrame, hash_col: str, m: int = BLOOM_M
) -> np.ndarray:
    """Corpus hashes → packed uint8 bitmap of length ``m/8``.

    Distributed: positions are computed and DISTINCTed cluster-side (one
    shuffle of (position) ints, ≤ m distinct values); the driver collects
    only the distinct positions — O(m) by construction.
    """
    pos = (
        # NULL hashes (NULL text upstream) carry no identity: no bits set
        df.filter(F.col(hash_col).isNotNull())
        .select(F.explode(F.expr(_positions_sql(hash_col, m))).alias("p"))
        .distinct()
        .collect()
    )
    bits = np.zeros(m // 8, dtype=np.uint8)
    if pos:
        p = np.array([r["p"] for r in pos], dtype=np.int64)
        np.bitwise_or.at(bits, p >> 3, (1 << (p & 7)).astype(np.uint8))
    return bits


def probe_udf(bits_bc, m: int = BLOOM_M):
    """Vectorized membership probe against a broadcast bitmap: the one
    place the bit-indexing expression lives (shared by the batch and
    streaming paths)."""

    @F.pandas_udf(T.BooleanType())
    def maybe_seen(h: pd.Series) -> pd.Series:
        bits = bits_bc.value
        # NULL hash (NULL text upstream: md5(lower(NULL)) is NULL) →
        # "never seen": a NULL document has no content identity, and a
        # crawled corpus WILL contain them — the probe must stay a total
        # function per the datapipe's degrade-don't-crash convention.
        null = h.isna().to_numpy()
        pos = _positions_np(h.fillna(0).to_numpy(np.int64), m)
        hit = (bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1) & ~null)

    return maybe_seen


def bloom_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    m: int = BLOOM_M,
) -> DataFrame:
    """(batch doc_id, text) vs corpus → (doc_id, text_hash, is_dup).

    ``is_dup`` is EXACT (identical to a plain semi-join on the content
    hash): the Bloom probe only prunes the verify join's input.
    """
    d = Dialect("spark")
    spark = batch.sparkSession
    h_expr = content_hash56(d, text_col)
    corpus_h = corpus.select(F.expr(h_expr).alias("h"))
    bits_bc = spark.sparkContext.broadcast(build_bloom(corpus_h, "h", m))
    maybe_seen = probe_udf(bits_bc, m)

    hashed = batch.select(
        "doc_id",
        F.expr(f"md5(lower({text_col}))").alias("text_hash"),
        F.expr(h_expr).alias("h"),
    )
    cand = hashed.filter(maybe_seen(F.col("h")))
    verified = cand.join(
        corpus.select(
            F.expr(f"md5(lower({text_col}))").alias("text_hash")
        ).distinct(),
        "text_hash",
        "left_semi",
    ).select("doc_id", F.lit(True).alias("is_dup"))
    return (
        hashed.select("doc_id", "text_hash")
        .join(verified, "doc_id", "left")
        .select(
            "doc_id",
            "text_hash",
            F.coalesce("is_dup", F.lit(False)).alias("is_dup"),
        )
    )


class BloomDedupStore:
    """Streaming exactly-once EXACT dedup against an append-only corpus.

    The exact-content sibling of :class:`incremental.SignatureStore`
    (near-dup): per micro-batch of new documents it answers "seen this
    exact text before?" without ever re-scanning prior text. State per
    committed epoch:

    - ``epoch-N/`` parquet of the batch's distinct content hashes: the
      full 128-bit md5 (the verify side — full-width so a 56-bit probe
      collision can never drop a distinct document) plus its 56-bit
      probe key;
    - ``epoch-N/_bloom`` the batch's M-bit Bloom bitmap (M/8 bytes, a
      constant ~130 KiB regardless of batch size — the probe side;
      underscore-prefixed so the parquet reader ignores it, and INSIDE
      the epoch directory so the commit is ONE atomic rename).

    Per batch: OR the prior epochs' bitmaps driver-side (tiny), probe
    the batch map-only through the broadcast union bitmap, then verify
    only Bloom-positive rows with a semi-join that BROADCASTS the
    candidate md5s — the corpus hash store streams map-side and never
    shuffles. Batch-internal repeats are caught by a keyed first-wins
    rank. Commit is stage + atomic rename (same protocol as
    sources/filequeue): a crash-replayed epoch reads only strictly
    earlier state, returns the identical answer, and does not grow
    state.

    ``normalize=True`` (default) case-folds text before hashing — the
    whole-document convention; pass ``normalize=False`` for
    exact-content matching (what segment dedup uses).
    """

    def __init__(
        self,
        spark,
        state_dir: str,
        m: int = BLOOM_M,
        normalize: bool = True,
    ):
        self.spark = spark
        self.state_dir = state_dir
        self.m = m
        self.normalize = normalize
        self.hash_dir = f"{state_dir}/hashes"
        # All state I/O goes through the Hadoop FileSystem API (fsio.py)
        # so the store runs against the same substrate as the Spark
        # checkpoint dir — hdfs://, s3a://, file:// or a bare local path —
        # not only a POSIX mount (round-7 advice; same treatment
        # signature_table already has in datapipe/queries.py).
        self._fs = HadoopFS(spark, state_dir)
        self._fs.mkdirs(self.hash_dir)

    # -- state ---------------------------------------------------------------
    def _epoch_path(self, epoch_id: int) -> str:
        return f"{self.hash_dir}/epoch-{int(epoch_id):010d}"

    def committed(self, epoch_id: int) -> bool:
        return self._fs.exists(self._epoch_path(epoch_id))

    def _epochs(self, before_epoch: int) -> list[str]:
        out = []
        for d, is_dir in self._fs.list_names(self.hash_dir):
            # committed epochs are DIRECTORIES named epoch-<10 digits>
            # (or epoch-<10 digits>-c for a compacted run covering all
            # epochs <= that id); anything else (stray files, foreign
            # formats) is ignored rather than crashing the stream
            if not d.startswith("epoch-") or not is_dir:
                continue
            suffix = d.split("-", 1)[1]
            if suffix.endswith("-c"):
                suffix = suffix[:-2]
            if suffix.isdigit() and int(suffix) < before_epoch:
                out.append(d)
        return sorted(out)

    def _union_bitmap(self, before_epoch: int) -> np.ndarray:
        bits = np.zeros(self.m // 8, dtype=np.uint8)
        for d in self._epochs(before_epoch):
            raw = self._fs.read_bytes(f"{self.hash_dir}/{d}/_bloom")
            bits |= np.frombuffer(raw, dtype=np.uint8)
        return bits

    def _corpus_hashes(self, before_epoch: int):
        eps = self._epochs(before_epoch)
        if not eps:
            return None
        return self.spark.read.parquet(
            *[f"{self.hash_dir}/{d}" for d in eps]
        )

    def _commit(self, hashes: "DataFrame", epoch_id: int) -> None:
        final = self._epoch_path(epoch_id)
        if self._fs.exists(final):  # crash replay of a committed epoch
            return
        bitmap = build_bloom(hashes, "h", self.m)
        staging = f"{self.state_dir}/_staging/e{uuid.uuid4().hex}"
        hashes.write.mode("overwrite").parquet(staging)
        # bitmap goes INSIDE the staged directory so both artifacts
        # publish in the ONE atomic rename below — no window where the
        # epoch parquet exists without its bitmap
        self._fs.write_bytes(f"{staging}/_bloom", bitmap.tobytes())
        if not self._fs.rename(staging, final):  # atomic publish
            # lost the replay race (Hadoop rename refuses an existing
            # destination): no-op, retire our staging copy
            self._fs.delete(staging)

    # -- maintenance ---------------------------------------------------------
    def compact(self, upto_epoch: int) -> int:
        """Merge every epoch dir with id <= ``upto_epoch`` into ONE
        ``epoch-<upto>-c`` dir (union of hashes + OR of bitmaps), then
        remove the originals. Returns the number of dirs merged.

        Why: a long-lived stream accumulates one directory per
        micro-batch; thousands of tiny parquet dirs make the map-side
        corpus scan listing-bound. Compaction restores O(1) state dirs.

        Crash-safe by publish-first ordering: the merged dir lands in one
        atomic rename BEFORE any original is removed — a crash mid-removal
        leaves some epochs double-represented, which is harmless (dedup
        state is a set union; duplicates cannot change any is_dup answer).

        Replay-safe: only compact epochs the stream can no longer replay.
        Structured Streaming's foreachBatch re-runs at most the LATEST
        batch after a crash, so ``upto_epoch`` must be < the newest
        committed epoch; compacting the newest would let its replay see
        its own hashes and flag its rows as dups. Enforced here.
        """
        newest = -1
        for d in self._epochs(1 << 62):
            sid = d.split("-", 1)[1]
            newest = max(newest, int(sid[:-2] if sid.endswith("-c") else sid))
        if upto_epoch >= newest:
            raise ValueError(
                f"compact(upto_epoch={upto_epoch}) must be strictly below "
                f"the newest committed epoch ({newest}): the newest batch "
                "is the one foreachBatch may still replay"
            )
        final = self._epoch_path(upto_epoch) + "-c"
        if self._fs.exists(final):
            # a prior compact already published this id; re-compacting the
            # same watermark can't be atomic (the target exists) — callers
            # compact to a HIGHER watermark as the stream advances
            raise ValueError(
                f"already compacted at epoch {upto_epoch}; pick a higher "
                "upto_epoch"
            )
        victims = self._epochs(upto_epoch + 1)
        if len(victims) <= 1:
            return 0
        merged = self.spark.read.parquet(
            *[f"{self.hash_dir}/{d}" for d in victims]
        ).distinct()
        bits = self._union_bitmap(upto_epoch + 1)
        staging = f"{self.state_dir}/_staging/c{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(staging)
        self._fs.write_bytes(f"{staging}/_bloom", bits.tobytes())
        if not self._fs.rename(staging, final):  # publish FIRST (atomic)
            raise RuntimeError(f"compaction publish to {final} failed")
        final_name = final.rsplit("/", 1)[-1]
        for d in victims:  # then retire originals; crash here is harmless
            if d != final_name:
                self._fs.delete(f"{self.hash_dir}/{d}")
        return len(victims)

    # -- per-batch -----------------------------------------------------------
    def process_batch(
        self,
        batch_df: "DataFrame",
        epoch_id: int,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> "DataFrame":
        """(id, text) batch → (id, is_dup); commits exactly once.

        ``is_dup`` is True when the same text (case-normalized unless the
        store was built with ``normalize=False``) was seen in ANY earlier
        epoch or earlier in this batch (first occurrence wins, ordered by
        ``id_col`` — deterministic across replays). EXACT: the 56-bit key
        only drives the Bloom probe; dup decisions verify against the
        full 128-bit md5. ``id_col`` defaults to doc_id; pass a different
        unique key to dedup at another granularity (e.g. segment uids —
        see segments.dedup_segments_stream).
        """
        from pyspark.sql import Window

        norm = f"lower({text_col})" if self.normalize else text_col
        # h is DERIVED from full (its first 14 hex digits) — one md5 per
        # row, and the probe key is structurally the verify key's prefix
        # (the invariant the zero-false-negative claim rests on)
        hashed = batch_df.select(
            id_col, F.expr(f"md5({norm})").alias("full")
        ).withColumn(
            "h",
            F.expr("cast(conv(substring(full, 1, 14), 16, 10) as bigint)"),
        ).localCheckpoint(eager=True)

        # batch-internal repeats: keyed first-wins rank (one shuffle of
        # ~50-byte rows on a near-unique key). NULL text (NULL md5) rows
        # have no content identity — never dups of each other, so the
        # window's null-grouping must not mark them.
        first = Window.partitionBy("full").orderBy(id_col)
        internal = hashed.withColumn(
            "_dup_internal",
            (F.row_number().over(first) > 1) & F.col("full").isNotNull(),
        )

        # vs prior corpus: broadcast union bitmap, map-only probe
        bits_bc = self.spark.sparkContext.broadcast(
            self._union_bitmap(epoch_id)
        )
        maybe_seen = probe_udf(bits_bc, self.m)

        corpus = self._corpus_hashes(epoch_id)
        if corpus is None:
            flagged = internal.select(
                id_col, F.col("_dup_internal").alias("is_dup")
            )
        else:
            cand = (
                hashed.filter(maybe_seen(F.col("h")))
                .select("full")
                .distinct()
            )
            # candidate md5s broadcast; the corpus store streams map-side
            seen = (
                corpus.select("full")
                .join(F.broadcast(cand), "full", "left_semi")
                .distinct()
                .withColumn("_dup_prior", F.lit(True))
            )
            flagged = (
                internal.join(seen, "full", "left")
                .select(
                    id_col,
                    (
                        F.col("_dup_internal")
                        | F.coalesce("_dup_prior", F.lit(False))
                    ).alias("is_dup"),
                )
            )
        out = flagged.localCheckpoint(eager=True)  # answer before state grows
        # NULL hashes carry no identity — never persisted to state
        self._commit(
            hashed.filter(F.col("full").isNotNull())
            .select("h", "full")
            .distinct(),
            epoch_id,
        )
        return out

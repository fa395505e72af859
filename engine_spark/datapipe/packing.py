"""Corpus-assembly operators: sequence packing and domain mixing.

The last mile of a training-data pipeline, after dedup/quality/sampling:
deciding *which* documents enter the corpus in what proportions (domain
mixing) and *where* each document's tokens land in the fixed-length
training sequences (packing). The reference engine has no equivalent —
these are brief-mandated LLM-data-pipeline operators, built Spark-first.

**Sequence packing** uses the concatenate-and-chunk formulation standard in
LLM training (documents are laid end-to-end in a deterministic order and
the token stream is cut into fixed ``seq_len`` windows; a document may span
a sequence boundary). That formulation is exactly a prefix sum:

    offset(doc)  = Σ n_tokens of all earlier docs      (window cumsum)
    seq_first    = offset       // seq_len
    seq_last     = (offset + n_tokens - 1) // seq_len

A single global order would funnel the cumsum through one partition, so
packing is SHARDED: documents hash into ``n_shards`` independent token
streams and the prefix sum runs per shard (``Window.partitionBy(shard)``) —
one shuffle on the shard key, per-shard sort, no global bottleneck. Shard
count scales with the cluster; each shard is an independent training-data
file, which is how packed corpora are materialized in practice anyway.

**Domain mixing** computes, from target weights w_s over the ``source``
column, the largest total corpus T every target can satisfy
(T = min_s count_s / w_s — the binding domain is fully consumed) and
hash-samples each domain at rate w_s·T/count_s. Content-hash sampling (see
``sampling.py``) keeps the draw reproducible across engines and cluster
sizes. The per-domain stats aggregate is dimension-sized (one row per
domain) and broadcast back — the corpus itself is touched by exactly one
map-only filter pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine_spark.datapipe.fragments import Dialect
from engine_spark.datapipe.sampling import DENOM, _bucket_expr

PACK_SEQ_LEN = 64
PACK_SHARDS = 16
PACK_SALT = "pack"


def shard_expr(d: Dialect, key: str, n_shards: int = PACK_SHARDS,
               salt: str = PACK_SALT) -> str:
    """Deterministic shard in [0, n_shards) by content hash."""
    salted = f"concat('{salt}', {key})"
    return f"({d.hash56(salted)} % {n_shards})"


def sequence_pack(
    df: DataFrame,
    n_tokens_col: str,
    doc_id: str = "doc_id",
    seq_len: int = PACK_SEQ_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Assign every document a position in the packed token stream.

    Returns the input columns plus ``shard``, ``seq_first``, ``seq_last``
    (which fixed-length sequences the document's tokens occupy) and
    ``begin_off`` (token offset inside seq_first). Documents with zero
    tokens are excluded (they occupy no stream position).
    """
    d = Dialect("spark")
    sharded = df.filter(F.col(n_tokens_col) >= 1).withColumn(
        "shard", F.expr(shard_expr(d, doc_id, n_shards))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(doc_id)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = F.col("_cum") - F.col(n_tokens_col)  # first token's stream offset
    return (
        sharded.withColumn("_cum", F.sum(n_tokens_col).over(w))
        .withColumn("begin_off", off % seq_len)
        .withColumn("seq_first", F.floor(off / seq_len))
        .withColumn("seq_last", F.floor((F.col("_cum") - 1) / seq_len))
        .drop("_cum")
    )


def shuffle_shards(
    df: DataFrame,
    key: str = "doc_id",
    seed: int = 42,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Deterministic seeded corpus shuffle: (key) → (key, shard, pos).

    Training-order randomization for corpus assembly: every row gets a
    pseudo-random but fully REPRODUCIBLE position — ``shard`` (which
    output file) and ``pos`` (1-based order inside the shard) — derived
    only from ``md5(seed, key)``, so any subset of shards can be
    re-materialized bit-identically (resumable jobs, A/B data ablations
    on the same order).

    Scale shape: there is NO global sort. Shard assignment is a
    row-local hash; the per-shard ordering window is exactly the
    per-output-file collation a sharded write pays anyway, and
    ``n_shards`` scales with the corpus (pick corpus_rows / shard_target
    so one shard ≈ one output file's worth). With hash-derived sort keys
    every shard is uniform — no skewed partitions.
    """
    d = Dialect("spark")
    h = d.hash56(f"concat('shuffle:{seed}:', cast({key} as string))")
    w = Window.partitionBy("shard").orderBy("h", key)
    return (
        df.select(key, F.expr(h).alias("h"))
        .withColumn("shard", F.col("h") % n_shards)
        .select(
            key,
            "shard",
            F.row_number().over(w).cast("bigint").alias("pos"),
        )
    )


CHUNK_W = 32       #: tokens per chunk
CHUNK_STRIDE = 24  #: tokens between chunk starts (W - STRIDE = overlap)


def chunk_exprs(d: Dialect, toks: str, w: int = CHUNK_W,
                stride: int = CHUNK_STRIDE) -> str:
    """Array of chunk structs ``{idx, tok_start, tok_end}`` over a token
    list: fixed-width windows with overlap, last window clipped. Row-local
    (explode downstream) — the standard retrieval/context chunking shape.

    Chunk count = 1 for n ≤ w else ceil((n - w) / stride) + 1, so every
    token lands in ≥ 1 chunk and starts advance by exactly ``stride``.
    """
    n = d.size(toks)
    n_chunks = (
        f"(CASE WHEN {n} <= {w} THEN 1 "
        f"ELSE CAST(ceil(CAST({n} - {w} AS DOUBLE) / {stride}) AS INT) + 1 END)"
    )
    idx = "CAST(i - 1 AS BIGINT)"
    start = f"CAST((i - 1) * {stride} + 1 AS BIGINT)"
    end = f"CAST(least((i - 1) * {stride} + {w}, {n}) AS BIGINT)"
    body = (
        f"{{'idx': {idx}, 'tok_start': {start}, 'tok_end': {end}}}"
        if not d.spark
        else f"struct({idx} AS idx, {start} AS tok_start, {end} AS tok_end)"
    )
    return d.transform(d.seq1(n_chunks), "i", body)


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    w: int = CHUNK_W,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Output: (doc_id, chunk_idx, tok_start, tok_end, chunk_tokens,
    chunk_hash) — chunk_hash is the md5 of the space-joined chunk tokens
    (content address for downstream chunk-level dedup / retrieval keys).
    Map-only: tokenize + per-row struct transform + explode; no shuffle.
    """
    from engine_spark.datapipe import fragments as FR

    d = Dialect("spark")
    toks = docs.select(
        "doc_id", F.expr(FR.tokens(d, text_col)).alias("toks")
    ).filter(F.expr(d.size("toks")) >= 1)
    ch = toks.select(
        "doc_id",
        "toks",
        F.explode(F.expr(chunk_exprs(d, "toks", w, stride))).alias("c"),
    )
    chunk_toks = "slice(toks, c.tok_start, c.tok_end - c.tok_start + 1)"
    return ch.select(
        "doc_id",
        F.col("c.idx").alias("chunk_idx"),
        F.col("c.tok_start").alias("tok_start"),
        F.col("c.tok_end").alias("tok_end"),
        F.expr("CAST(c.tok_end - c.tok_start + 1 AS INT)").alias("chunk_tokens"),
        F.expr(f"md5({d.arr_join(chunk_toks)})").alias("chunk_hash"),
    )


def sequence_pack_stream(
    df: DataFrame,
    n_tokens_col: str,
    doc_id: str = "doc_id",
    seq_len: int = PACK_SEQ_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Streaming-incremental packing: the per-shard token stream CONTINUES
    across micro-batches (state = one cumulative count per shard), so an
    appended crawl snapshot packs after the existing corpus instead of
    restarting every offset at zero.

    Emits the same columns as :func:`sequence_pack` — every input column
    is carried through, plus ``shard``/``begin_off``/``seq_first``/
    ``seq_last``. Within a micro-batch, documents pack in ``doc_id``
    order; across batches, in arrival order — identical to the batch
    operator whenever arrival respects doc_id order (pinned by the parity
    test). State is one LONG per shard: bounded by ``n_shards`` forever.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    d = Dialect("spark")
    sharded = df.filter(F.col(n_tokens_col) >= 1).withColumn(
        "shard", F.expr(shard_expr(d, doc_id, n_shards))
    )
    in_cols = list(df.columns)
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {in_types[c]}" for c in in_cols]
        + ["shard bigint", "begin_off bigint", "seq_first bigint",
           "seq_last bigint"]
    )

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cum = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            doc_id, kind="mergesort"
        )
        offs, firsts, lasts = [], [], []
        for ntok in rows[n_tokens_col]:
            ntok = int(ntok)
            off = cum
            cum += ntok
            offs.append(off % seq_len)
            firsts.append(off // seq_len)
            lasts.append((cum - 1) // seq_len)
        state.update((cum,))
        if len(rows):
            out = rows[in_cols].copy()
            out["shard"] = key[0]
            out["begin_off"] = offs
            out["seq_first"] = firsts
            out["seq_last"] = lasts
            yield out

    return sharded.groupBy("shard").applyInPandasWithState(
        run, out_schema, "cum long", "append", GroupStateTimeout.NoTimeout
    )


def domain_mix_rates(
    counts: DataFrame, weights: dict[str, float], source_col: str = "source"
) -> DataFrame:
    """Per-domain keep rates achieving the target mixture.

    ``counts``: one row per domain with a ``n`` column. Domains absent from
    ``weights`` get rate 0 (dropped). The result is dimension-sized.

    Raises ``ValueError`` when a domain in ``weights`` has no rows in
    ``counts``: the target mixture is unsatisfiable (min(count/weight) over
    present domains only would silently emit 100% of the others instead).
    The check is dimension-sized — ``counts`` has one row per domain, so the
    collect is bounded regardless of corpus size.
    """
    # ONE bounded collect (counts is one row per domain) feeds both the
    # absent-domain check and the rate computation — the per-domain
    # aggregation behind `counts` (a full corpus scan at scale) runs once,
    # not once for the check and again when rates are consumed.
    rows = counts.select(source_col, "n").collect()
    absent = sorted(set(weights) - {r[0] for r in rows})
    if absent:
        raise ValueError(
            f"domain_mix target domains absent from corpus: {absent} — "
            "the requested mixture is unsatisfiable (remove them from "
            "`weights` or supply rows for them)"
        )
    # T = min over targeted domains of count/weight: the largest corpus for
    # which every domain can supply its target share. Same IEEE-double op
    # order as the SQL oracle: t = min(n / w); rate = (w * t) / n.
    t = min(float(r[1]) / weights[r[0]] for r in rows if r[0] in weights)
    rates = [
        (r[0], (weights[r[0]] * t) / float(r[1]))
        for r in rows
        if r[0] in weights
    ]
    return counts.sparkSession.createDataFrame(
        rates, f"{source_col} string, rate double"
    )


def domain_mix_sample(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Hash-sample ``df`` so the kept rows match the target domain mixture.

    One tiny aggregation (rows = #domains) joined back broadcast; the data
    pass is a map-only filter. Reproducible: membership depends only on
    (salt, key) content hashes and the domain counts.
    """
    d = Dialect("spark")
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n"))
    rates = domain_mix_rates(counts, weights, source_col)
    # explicit floor: Spark's double->BIGINT cast truncates but DuckDB's
    # ROUNDS - a rate*DENOM of .9999 would diverge between the engines
    cut = F.expr(f"CAST(floor(rate * {DENOM}) AS BIGINT)")
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(F.expr(_bucket_expr(d, key_col, salt)) < cut)
        .drop("rate")
    )

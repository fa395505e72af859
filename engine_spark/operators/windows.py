"""Window operators.

The reference registers exactly 10 window processors (reference:
src/core/config/eventflux_context.rs:417-439, dispatch
src/core/query/processor/stream/window/mod.rs:572-592). Each was a bespoke
stateful Rust processor; here each is a declarative Spark plan:

- time-based windows (time, timeBatch, externalTime, externalTimeBatch,
  session) → native ``window()`` / ``session_window()`` / range-frame window
  functions. Catalyst handles partial aggregation, AQE handles skew.
- count-based windows (length, lengthBatch, sort) → window functions in batch;
  the streaming variants live in engine_spark.streaming.state.
- lossyCounting → approximate frequent-items (see ``frequent_items``).

Batch semantics note: the reference's sliding windows emit per *event*
(current + expired pairs, reference tests/app_runner_windows.rs:26-45). The
batch-mode equivalent of "the aggregate the query would have emitted at each
event" is a window-function frame ending at the current row — that's what the
``*_sliding`` operators compute. Tumbling/batch windows agree exactly with
``groupBy(window(...))``.

Scale notes: every operator below shuffles at most once, on the user-supplied
partition keys. Global (un-keyed) sliding windows order the whole stream — at
100 TB you always pass ``partition_by`` (the reference had the same
constraint: one process = one global order).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from engine_spark.functions.timeutils import epoch_seconds


def _partition_spec(partition_by: Sequence[str] | None, allow_global: bool):
    """Keyless sliding windows degrade to one global sort task at scale, so
    they must be requested explicitly (``allow_global=True``)."""
    if partition_by:
        return Window.partitionBy(*partition_by)
    if not allow_global:
        raise ValueError(
            "un-keyed sliding window would single-partition the whole input; "
            "pass partition_by=… or allow_global=True to opt in"
        )
    return Window.partitionBy()


def _wspec(partition_by: Sequence[str] | None, order_by: str | Column, allow_global: bool = False):
    return _partition_spec(partition_by, allow_global).orderBy(order_by)


# ---------------------------------------------------------------------------
# time-based windows
# ---------------------------------------------------------------------------

def time_batch(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """timeBatch(d) / externalTimeBatch(tsAttr, d) — tumbling time window.

    Reference: window/mod.rs:965 (timeBatch), :1472 (externalTimeBatch); the
    SQL ``WINDOW TUMBLING(d)`` maps here (sql_compiler/converter.rs:650-657).
    Native ``groupBy(window(...))`` — partial aggregation map-side, one
    shuffle on (window, *group_by).
    """
    keys = [F.window(F.col(ts_col), duration).alias("w"), *[F.col(c) for c in group_by]]
    out = df.groupBy(*keys).agg(*aggs)
    return out.withColumn("window_start", F.col("w.start")).withColumn(
        "window_end", F.col("w.end")
    ).drop("w")


def time_sliding_hop(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """SQL ``WINDOW SLIDING(size, slide)`` — hopping window.

    The reference parses this but errors "not yet implemented"
    (sql_compiler/converter.rs:659-667); native in Spark via
    ``window(ts, size, slide)``.
    """
    keys = [F.window(F.col(ts_col), duration, slide).alias("w"), *[F.col(c) for c in group_by]]
    out = df.groupBy(*keys).agg(*aggs)
    return out.withColumn("window_start", F.col("w.start")).withColumn(
        "window_end", F.col("w.end")
    ).drop("w")


def time_sliding(
    df: DataFrame,
    ts_col: str,
    duration_seconds: int,
    partition_by: Sequence[str] | None = None,
    aggs: dict[str, Column] | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """time(d) / externalTime(tsAttr, d) — per-event sliding time window.

    Reference: window/mod.rs:196 (time), :1332 (externalTime): each arriving
    event sees the aggregate of events in the last ``d``. Batch equivalent: a
    range frame ``[ts - d, ts]`` per row — one shuffle on partition keys, sort
    within partitions, no self-join.

    ``aggs`` maps output-column-name → aggregate Column (built on input cols).
    """
    w = (
        _wspec(partition_by, epoch_seconds(ts_col), allow_global)
        .rangeBetween(-duration_seconds, 0)
    )
    out = df
    for name, agg in (aggs or {}).items():
        out = out.withColumn(name, agg.over(w))
    return out


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """session(gap[, key]) — gap-based session window.

    Reference: session_window_processor.rs:27 (622 LoC of bespoke session
    state). Native ``session_window`` — Spark merges adjacent sessions in the
    streaming state store; in batch it's a single shuffle + sort-merge.
    """
    keys = [
        F.session_window(F.col(ts_col), gap).alias("w"),
        *[F.col(c) for c in group_by],
    ]
    out = df.groupBy(*keys).agg(*aggs)
    return out.withColumn("session_start", F.col("w.start")).withColumn(
        "session_end", F.col("w.end")
    ).drop("w")


# ---------------------------------------------------------------------------
# count-based windows (batch variants; streaming in streaming/state.py)
# ---------------------------------------------------------------------------

def length_sliding(
    df: DataFrame,
    ts_col: str,
    n: int,
    partition_by: Sequence[str] | None = None,
    aggs: dict[str, Column] | None = None,
    tiebreak: Sequence[str] = (),
    allow_global: bool = False,
) -> DataFrame:
    """length(n) — last n events, per-event emission.

    Reference: window/mod.rs:63. Batch equivalent: rows-frame of the previous
    n-1 rows plus the current row, ordered by event time.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = (
        _partition_spec(partition_by, allow_global)
        .orderBy(*order)
        .rowsBetween(-(n - 1), 0)
    )
    out = df
    for name, agg in (aggs or {}).items():
        out = out.withColumn(name, agg.over(w))
    return out


def length_batch(
    df: DataFrame,
    ts_col: str,
    n: int,
    partition_by: Sequence[str] | None = None,
    group_cols: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    tiebreak: Sequence[str] = (),
    allow_global: bool = False,
) -> DataFrame:
    """lengthBatch(n) — tumbling count batches of n events.

    Reference: window/mod.rs:645 (+815-LoC state holder). Batch equivalent:
    batch_id = floor((row_number-1)/n); aggregate per batch.
    """
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = _partition_spec(partition_by, allow_global).orderBy(*order)
    batched = df.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / n)
    )
    keys = [*(partition_by or ()), "batch_id", *group_cols]
    return batched.groupBy(*keys).agg(*aggs)


def sort_window(
    df: DataFrame,
    n: int,
    order_by: Sequence[Column],
    partition_by: Sequence[str] | None = None,
    allow_global: bool = False,
) -> DataFrame:
    """sort(n, attr, 'asc'/'desc'…) — keep top/bottom-n events by sort keys.

    Reference: sort_window_processor.rs:25 (bounded priority buffer). Batch
    equivalent: row_number ≤ n per partition. At scale this is the classic
    per-key top-k: Spark pushes a partial top-k before the shuffle when the
    frame allows (rank + filter), so the full sort never materializes.
    """
    w = _partition_spec(partition_by, allow_global).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n).drop("_rn")


def frequent_items(
    df: DataFrame,
    item_col: str,
    min_support: float,
) -> DataFrame:
    """lossyCounting(support) — frequent-items over the window.

    Reference: window/mod.rs:1654. Lossy counting approximates "items with
    frequency ≥ support·N"; in Spark the exact computation is a single
    map-side-combined groupBy (the approximation existed because the reference
    was memory-bound row-at-a-time — a distributed count is not).

    Single scan: the total N is recovered as ``sum(freq) over ()`` on the
    *grouped* result (tiny — one row per distinct item), never a second pass
    over the input.
    """
    from pyspark.sql import Window as W

    grouped = df.groupBy(item_col).agg(F.count(F.lit(1)).alias("freq"))
    total = F.sum("freq").over(W.partitionBy())
    return (
        grouped.withColumn("_thr", F.lit(min_support) * total)
        .filter(F.col("freq") >= F.col("_thr"))
        .drop("_thr")
    )


def unique_window(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str | Column,
    partition_by: Sequence[str] | None = None,
    keep_first: bool = False,
) -> DataFrame:
    """unique(attrs…) / firstUnique(attrs…) (reference
    tests/compatibility/windows.rs:852-905 — syntax defined, tests
    #[ignore]d upstream): the window retains ONE event per distinct key —
    the newest (unique: a same-key arrival expels its predecessor) or the
    first (firstUnique: later same-key arrivals are dropped). Batch
    relation = that retained set. One window-function pass, no join."""
    from pyspark.sql import Window as W

    keys = [*(partition_by or []), *key_cols]
    ord_c = F.col(order_col) if isinstance(order_col, str) else order_col
    w = W.partitionBy(*[F.col(k) for k in keys]).orderBy(
        ord_c.asc() if keep_first else ord_c.desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def delay_window(df: DataFrame, ts_col: str, delay_seconds: float) -> DataFrame:
    """delay(d) (reference windows.rs delay test, #[ignore]d upstream):
    every event exits the window d after it entered — the relation with
    the event-time column shifted by +d (the emission time a downstream
    join or window sees). Map-only, no shuffle."""
    ms = int(round(delay_seconds * 1000))
    return df.withColumn(
        ts_col, F.col(ts_col) + F.expr(f"INTERVAL {ms} MILLISECONDS")
    )


def frequent_window(
    df: DataFrame,
    item_col: str,
    n: int,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """frequent(n, attr) (reference Misra-Gries frequent window;
    windows.rs frequent test #[ignore]d upstream): keep the events whose
    attr value is among the n most frequent values. Exact here — the
    counting the reference approximates row-at-a-time is one map-side-
    combined groupBy; the survivors list is distinct-item-sized and
    broadcast back, so the event relation never collects. Deterministic
    tie-break on the item value."""
    from pyspark.sql import Window as W

    pb = list(partition_by or [])
    counts = df.groupBy(*[F.col(c) for c in [*pb, item_col]]).agg(
        F.count(F.lit(1)).alias("_freq")
    )
    if pb:
        w = W.partitionBy(*[F.col(c) for c in pb]).orderBy(
            F.col("_freq").desc(), F.col(item_col).asc()
        )
        top = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= n)
            .select(*pb, item_col)
        )
    else:
        # global top-n: orderBy+limit compiles to TakeOrderedAndProject —
        # per-partition heaps, no single-partition window funnel even
        # when the distinct-item relation is large
        top = (
            counts.orderBy(F.col("_freq").desc(), F.col(item_col).asc())
            .limit(n)
            .select(item_col)
        )
    return df.join(F.broadcast(top), [*pb, item_col], "left_semi")


def lossy_counting_window(
    df: DataFrame,
    item_col: str,
    min_support: float,
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """lossyCounting(support, attr) as an EVENT relation: keep events
    whose attr frequency is ≥ support·N (the reference window's admit
    contract; frequent_items above is the grouped-summary face). The
    distinct-item count table is broadcast back — no global window, no
    single-partition funnel."""
    pb = list(partition_by or [])
    counts = df.groupBy(*[F.col(c) for c in [*pb, item_col]]).agg(
        F.count(F.lit(1)).alias("_freq")
    )
    if pb:
        from pyspark.sql import Window as W

        keep = (
            counts.withColumn("_tot", F.sum("_freq").over(W.partitionBy(*pb)))
            .filter(F.col("_freq") >= F.lit(min_support) * F.col("_tot"))
            .select(*pb, item_col)
        )
    else:
        # global total as a broadcast one-row scalar joined back — no
        # single-partition window over the distinct-item relation
        total = counts.agg(F.sum("_freq").alias("_tot"))
        keep = (
            counts.crossJoin(F.broadcast(total))
            .filter(F.col("_freq") >= F.lit(min_support) * F.col("_tot"))
            .select(item_col)
        )
    return df.join(F.broadcast(keep), [*pb, item_col], "left_semi")

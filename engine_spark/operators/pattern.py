"""CEP pattern matching — batch (relational) formulations.

The reference's core differentiator is `FROM PATTERN (e1=A -> e2=B) WITHIN d`
(reference: state-element algebra state_element.rs:15-22, NFA processors
stream_pre_state_processor.rs / count_pre_state_processor.rs, ~6k LoC of
bespoke per-key NFA state). On Spark the same semantics split:

- **batch/historical**: every pattern construct is relational — a
  followed-by is a time-bounded join + first-match rank; absence is an
  anti-join; a count quantifier is a range-frame count. These scale like any
  Spark join (one shuffle on the partition key) and Catalyst can push
  per-position filters to the scan — something the reference's row-at-a-time
  NFA never could.
- **streaming**: a per-key NFA via applyInPandasWithState
  (engine_spark.streaming.nfa) for event-at-a-time semantics.

PATTERN mode (skip-till-next-match) vs SEQUENCE mode (strict adjacency,
reference pattern/sequence_stream_receiver.rs) are both provided.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from engine_spark.functions.timeutils import epoch_micros, epoch_seconds


def followed_by(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    first: Column,
    second: Column,
    within_seconds: int,
    strict: bool = False,
    dedupe: bool = True,
) -> DataFrame:
    """`e1=A -> e2=B WITHIN d` — for each A event, the earliest subsequent B
    event on the same key within d (PATTERN mode: events between A and B are
    skipped; reference converter.rs:1498-1543).

    Returns one row per matched pair with ``e1_*`` / ``e2_*`` prefixed columns
    plus ``delay_seconds``. With ``strict=True`` (SEQUENCE mode) the B event
    must be the key's *immediately next* event after A.

    ``dedupe`` (default True) collapses byte-identical duplicate A events to
    ONE match — relational set semantics, consistent with a SQL oracle's
    GROUP BY. Pass ``dedupe=False`` for the reference's per-arriving-event
    semantics (stream_pre_state_processor.rs: each duplicate A opens its own
    state and fires its own match), which is also what the streaming NFA
    emits — use it when batch/stream parity on at-least-once duplicate input
    matters more than set semantics.
    """
    if strict:
        return _followed_by_strict(
            df, ts_col, key_cols, first, second, within_seconds
        )
    # PATTERN mode as ONE window pass instead of join + rank: the A×B join
    # multiplies every (A, B-within-d) pair per key before the rank throws
    # all but the earliest away — quadratic on a hot key. Here both sides
    # shuffle ONCE on the key; ordering by epoch micros DESC with a
    # growing range frame (unbounded preceding .. 1 preceding = events
    # strictly LATER than this row) makes min(b_struct) an incremental
    # running aggregate, so each A reads its earliest following B in O(1)
    # amortized. The WITHIN bound is applied afterward: if the earliest
    # following B is outside d, no B inside d exists. BYTE-IDENTICAL
    # duplicate A rows collapse to ONE match (relational set semantics —
    # consistent with the SQL oracle's GROUP BY and with SEQUENCE mode's
    # full-identity rank; the streaming NFA keeps the reference's
    # state-per-arriving-event duplicate semantics,
    # stream_pre_state_processor.rs).
    payload = [c for c in df.columns if c not in key_cols]
    tagged = (
        df.withColumn("_is_a", first.cast("boolean"))
        .withColumn("_is_b", second.cast("boolean"))
        .filter(F.col("_is_a") | F.col("_is_b"))
        .withColumn("_us", epoch_micros(F.col(ts_col)))
    )
    b_struct = F.when(
        F.col("_is_b"),
        F.struct(
            F.col("_us").alias("_bus"),
            *[F.col(c).alias(f"e2_{c}") for c in payload],
        ),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_us").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    within_us = int(within_seconds) * 1_000_000
    m = (
        tagged.withColumn("_nb", F.min(b_struct).over(w))
        .filter(
            F.col("_is_a")
            & F.col("_nb").isNotNull()
            & (F.col("_nb._bus") <= F.col("_us") + F.lit(within_us))
        )
    )
    # duplicate-A collapse WITHOUT a new exchange: e2_*/delay are
    # functionally determined by the A identity (deterministic min), and
    # the matches are already partitioned by key — sorting the matched set
    # within each key partition and keeping rows that differ from their
    # predecessor (null-safe struct compare) dedupes in place, where a
    # dropDuplicates would reshuffle on the full identity
    if dedupe:
        ident = F.struct(*[F.col(c).alias(c) for c in payload])
        w2 = Window.partitionBy(*key_cols).orderBy(ident)
        m = (
            m.withColumn("_prev", F.lag(ident).over(w2))
            .filter(F.col("_prev").isNull() | ~F.col("_prev").eqNullSafe(ident))
            .drop("_prev")
        )
    # exact integer microseconds → one double division; bit-identical to a
    # SQL oracle computing (epoch_us(b) - epoch_us(a)) / 1e6
    return m.select(
        *key_cols,
        *[F.col(c).alias(f"e1_{c}") for c in payload],
        *[F.col(f"_nb.e2_{c}").alias(f"e2_{c}") for c in payload],
        ((F.col("_nb._bus") - F.col("_us")).cast("double") / F.lit(1000000.0)).alias(
            "delay_seconds"
        ),
    )


def _followed_by_strict(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    first: Column,
    second: Column,
    within_seconds: int,
) -> DataFrame:
    """SEQUENCE mode (strict adjacency) — the join + rank + anti-join
    formulation; strictness needs every event of the key between A and B,
    which the A/B-only window pass above does not see."""
    e1 = df.filter(first).select(
        *key_cols, *[F.col(c).alias(f"e1_{c}") for c in df.columns if c not in key_cols]
    )
    e2 = df.filter(second).select(
        *[F.col(c).alias(f"_k2_{c}") for c in key_cols],
        *[F.col(c).alias(f"e2_{c}") for c in df.columns if c not in key_cols],
    )
    l_ts, r_ts = F.col(f"e1_{ts_col}"), F.col(f"e2_{ts_col}")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_k2_{k}"))
    cond = cond & (r_ts > l_ts) & (r_ts <= l_ts + F.expr(f"INTERVAL {within_seconds} SECONDS"))
    j = e1.join(e2, cond, "inner").drop(*[f"_k2_{k}" for k in key_cols])
    e1_ident = [c for c in j.columns if c.startswith("e1_")]
    w = Window.partitionBy(*key_cols, *e1_ident).orderBy(r_ts, F.col(f"e2_{ts_col}"))
    out = j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    # SEQUENCE: no event of any type may sit between A and B on this key
    nxt = df.select(
        *[F.col(c).alias(f"_n_{c}") for c in (*key_cols, ts_col)]
    )
    between = F.lit(True)
    for k in key_cols:
        between = between & (F.col(k) == F.col(f"_n_{k}"))
    between = between & (F.col(f"_n_{ts_col}") > l_ts) & (F.col(f"_n_{ts_col}") < r_ts)
    out = out.join(nxt, between, "left_anti")
    return out.withColumn(
        "delay_seconds",
        (epoch_micros(r_ts) - epoch_micros(l_ts)).cast("double") / F.lit(1000000.0),
    )


def absent(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    first: Column,
    absent_filter: Column,
    within_seconds: int,
) -> DataFrame:
    """`e1=A NOT B FOR d` — A events with *no* B on the same key within d
    (reference absent_stream_state_element.rs + timer wheel). Anti-join: the
    timer wheel becomes a time-range predicate.
    """
    e1 = df.filter(first)
    e2 = df.filter(absent_filter).select(
        *[F.col(c).alias(f"_b_{c}") for c in (*key_cols, ts_col)]
    )
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_b_{k}"))
    l_ts, r_ts = F.col(ts_col), F.col(f"_b_{ts_col}")
    cond = cond & (r_ts > l_ts) & (r_ts <= l_ts + F.expr(f"INTERVAL {within_seconds} SECONDS"))
    return e1.join(e2, cond, "left_anti")


def count_quantifier(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    event_filter: Column,
    min_count: int,
    within_seconds: int,
) -> DataFrame:
    """`e1=A{m,} WITHIN d` — rows where ≥ m matching events occurred on the
    key in the trailing d window, ending at this event (reference
    count_pre_state_processor.rs). Range-frame count — no join, one shuffle.
    """
    filtered = df.filter(event_filter)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(epoch_seconds(ts_col))
        .rangeBetween(-within_seconds, 0)
    )
    return (
        filtered.withColumn("match_count", F.count(F.lit(1)).over(w))
        .filter(F.col("match_count") >= min_count)
    )


def logical_and(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    first: Column,
    second: Column,
    within_seconds: int,
) -> DataFrame:
    """`e1=A AND e2=B` — both branches must arrive (either order) within d
    of each other on the same key (reference logical_pre_state_processor.rs,
    converter.rs:1660-1676: the state completes when the later of the two
    arrives).

    Relational form: key-equi join with |tA − tB| ≤ d — the same shape as a
    windowed stream-stream join, so Catalyst/AQE handle skew, and in
    streaming the bound is the state-eviction horizon. Emits one row per
    (A, B) pair with ``e1_*``/``e2_*`` columns plus ``matched_at`` =
    the later timestamp (when the NFA would have fired).
    """
    e1 = df.filter(first).select(
        *key_cols, *[F.col(c).alias(f"e1_{c}") for c in df.columns if c not in key_cols]
    )
    e2 = df.filter(second).select(
        *[F.col(c).alias(f"_k2_{c}") for c in key_cols],
        *[F.col(c).alias(f"e2_{c}") for c in df.columns if c not in key_cols],
    )
    l_ts, r_ts = F.col(f"e1_{ts_col}"), F.col(f"e2_{ts_col}")
    cond = F.lit(True)
    for k in key_cols:
        cond = cond & (F.col(k) == F.col(f"_k2_{k}"))
    delta = F.expr(f"INTERVAL {within_seconds} SECONDS")
    cond = cond & (r_ts >= l_ts - delta) & (r_ts <= l_ts + delta)
    j = e1.join(e2, cond, "inner").drop(*[f"_k2_{k}" for k in key_cols])
    return j.withColumn("matched_at", F.greatest(l_ts, r_ts))


def logical_or(
    df: DataFrame,
    key_cols: Sequence[str],
    first: Column,
    second: Column,
) -> DataFrame:
    """`e1=A OR e2=B` — either branch completes the state (reference
    logical_pre_state_processor.rs OR mode). Relationally a disjunctive
    filter with a branch tag — no join, no shuffle, fully pushed to scan.
    """
    return df.filter(first | second).withColumn(
        "branch", F.when(first, F.lit("first")).otherwise(F.lit("second"))
    )


def first_match_only(
    matches: DataFrame,
    key_cols: Sequence[str],
    e1_ts_col: str,
) -> DataFrame:
    """Non-EVERY semantics: the pattern fires once per key — keep only the
    earliest-starting match (reference every_state_element.rs: EVERY restarts
    the state machine after each match; WITHOUT every, it stops after the
    first). Apply on the output of ``followed_by``/``logical_and``.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(e1_ts_col), *[F.col(c) for c in matches.columns if c.startswith("e1_")]
    )
    return matches.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")


def count_quantifier_bounded(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    event_filter: Column,
    min_count: int,
    max_count: int,
    within_seconds: int,
) -> DataFrame:
    """`e1=A{m,n} WITHIN d` with BOTH bounds (reference
    count_pre_state_processor.rs; converter.rs:1608-1645): the match set is
    the trailing window's events, capped at n — a row fires when the
    trailing-d count is in [m, n]. Above n the NFA would have emitted at n
    and restarted; the relational batch form reports the capped count.
    """
    filtered = df.filter(event_filter)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(epoch_seconds(ts_col))
        .rangeBetween(-within_seconds, 0)
    )
    return (
        filtered.withColumn("match_count", F.count(F.lit(1)).over(w))
        .filter(
            (F.col("match_count") >= min_count) & (F.col("match_count") <= max_count)
        )
    )


def collection_aggregates(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    event_filter: Column,
    within_seconds: int,
    aggs: dict[str, Column],
) -> DataFrame:
    """Collection aggregators over a quantified match set — `sum(e1.x)`,
    `avg(e1.x)`, … evaluated over the events collected by a count/window
    quantifier (reference collection_aggregation_executor.rs:1-30 runs a
    batch aggregate over the bounded matched-event chain).

    Relational form: the matched-event chain IS the trailing range frame, so
    each aggregate is a window function over it — one shuffle on the key, no
    join, no array materialization.
    """
    filtered = df.filter(event_filter)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(epoch_seconds(ts_col))
        .rangeBetween(-within_seconds, 0)
    )
    out = filtered
    for name, agg in aggs.items():
        out = out.withColumn(name, agg.over(w))
    return out

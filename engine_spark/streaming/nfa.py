"""Per-key pattern NFA on ``applyInPandasWithState`` — the streaming
execution of the CEP constructs (reference stream_pre_state_processor.rs /
count_pre_state_processor.rs / absent + timer wheel, ~6k LoC of bespoke
state machine; here ~200 lines over Spark's state store).

Design:
- match predicates are evaluated as Catalyst expressions *before* the
  stateful operator (``_is_a``/``_is_b`` boolean columns) — the Python NFA
  only sequences; filtering stays JVM-side and pushes to the scan;
- state per key is flat arrays (open-start timestamps + payloads), so the
  state store serializes compactly;
- within-batch ordering: events are sorted by event time inside each
  micro-batch (the reference's junction guarantees arrival order;
  micro-batching makes this explicit — SURVEY §7 hard spot (a));
- watermark + EventTimeTimeout evict state exactly where the reference's
  window buffer expiry / timer wheel did.

Scale: state is per key-group in the state store (RocksDB on a real
cluster), partitioned by the grouping key — the same shuffle a streaming
aggregation pays. No global state, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

US = 1_000_000


def _set_timeout(state: GroupState, deadline_ms: int) -> None:
    """Event-time timeouts must not be earlier than the current watermark —
    clamp (the deadline already passed; fire at the next possible tick)."""
    wm = state.getCurrentWatermarkMs()
    state.setTimeoutTimestamp(max(deadline_ms, wm + 1))


def _us(ts) -> int:
    return int(pd.Timestamp(ts).value // 1000)  # ns → µs


def followed_by_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    first: Column,
    second: Column,
    within_seconds: int,
    value_col: str,
    late: str = "0 seconds",
) -> DataFrame:
    """Streaming `e1=A -> e2=B WITHIN d` per key (EVERY semantics: every A
    opens a state; each A takes its earliest B — first-match, PATTERN mode).

    Output: (key, e1_ts, e1_value, e2_ts, e2_value, delay_seconds).
    """
    within_us = within_seconds * US
    tagged = df.withWatermark(ts_col, late).withColumn(
        "_is_a", first.cast("boolean")
    ).withColumn("_is_b", second.cast("boolean"))

    out_schema = (
        f"{key_col} string, e1_ts timestamp, e1_value double, "
        f"e2_ts timestamp, e2_value double, delay_seconds double"
    )
    state_schema = "starts_ts array<long>, starts_val array<double>"

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        starts: list[tuple[int, float]] = []
        if state.exists:
            sts, svs = state.get
            starts = list(zip(sts or [], svs or []))
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(ts_col, kind="mergesort")
        out = []
        for _, r in rows.iterrows():
            t = _us(r[ts_col])
            if bool(r["_is_b"]):
                kept = []
                for ta, va in starts:
                    if t > ta and t - ta <= within_us:
                        out.append(
                            (
                                key[0],
                                pd.Timestamp(ta * 1000),
                                va,
                                pd.Timestamp(t * 1000),
                                float(r[value_col]),
                                (t - ta) / US,
                            )
                        )
                    elif t - ta <= within_us:
                        kept.append((ta, va))  # B not after A: keep open
                    # else: expired start, drop
                starts = kept
            if bool(r["_is_a"]):
                starts.append((t, float(r[value_col])))
        # evict expired opens relative to the newest event seen
        if len(rows):
            now = _us(rows[ts_col].iloc[-1])
            starts = [(ta, va) for ta, va in starts if now - ta <= within_us]
        if starts:
            state.update(([t for t, _ in starts], [v for _, v in starts]))
            # timeout once every open start is past its deadline
            _set_timeout(state, max(t for t, _ in starts) // 1000 + within_seconds * 1000)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    key_col, "e1_ts", "e1_value", "e2_ts", "e2_value", "delay_seconds",
                ],
            )

    return tagged.groupBy(key_col).applyInPandasWithState(
        run, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def absent_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    first: Column,
    absent: Column,
    within_seconds: int,
    value_col: str,
    late: str = "0 seconds",
) -> DataFrame:
    """Streaming `e1=A NOT B FOR d`: emit A once d elapses with no B on the
    key (reference absent_stream_state_element.rs + timer_wheel.rs — the
    timer wheel becomes an event-time state timeout).

    Emission is driven by the watermark: an A is emitted when the watermark
    passes ``A.ts + d`` with no cancelling B seen.
    """
    within_us = within_seconds * US
    tagged = df.withWatermark(ts_col, late).withColumn(
        "_is_a", first.cast("boolean")
    ).withColumn("_is_b", absent.cast("boolean"))

    out_schema = f"{key_col} string, e1_ts timestamp, e1_value double"
    state_schema = "starts_ts array<long>, starts_val array<double>"

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        starts: list[tuple[int, float]] = []
        if state.exists:
            sts, svs = state.get
            starts = list(zip(sts or [], svs or []))
        if state.hasTimedOut:
            # watermark passed the earliest deadline: emit all survivors
            # whose window fully elapsed (watermark ≥ ts + d)
            wm_ms = state.getCurrentWatermarkMs()
            ready = [(t, v) for t, v in starts if wm_ms * 1000 >= t + within_us]
            starts = [(t, v) for t, v in starts if wm_ms * 1000 < t + within_us]
            if starts:
                state.update(([t for t, _ in starts], [v for _, v in starts]))
                _set_timeout(state, min(t for t, _ in starts) // 1000 + within_seconds * 1000)
            else:
                state.remove()
            if ready:
                yield pd.DataFrame(
                    [(key[0], pd.Timestamp(t * 1000), v) for t, v in ready],
                    columns=[key_col, "e1_ts", "e1_value"],
                )
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        for _, r in rows.iterrows():
            t = _us(r[ts_col])
            if bool(r["_is_b"]):
                # cancel every open A the B falls within
                starts = [
                    (ta, va) for ta, va in starts if not (t > ta and t - ta <= within_us)
                ]
            if bool(r["_is_a"]):
                starts.append((t, float(r[value_col])))
        # Flush matured As on the DATA path too: Spark never sets hasTimedOut
        # for a key that receives data every micro-batch, so a busy key would
        # otherwise defer its "A with no B within d" emissions indefinitely
        # (the reference's timer wheel fires at the deadline regardless of
        # traffic). Any open A whose deadline the watermark has passed was
        # not cancelled by the rows above — emit it now.
        wm_ms = state.getCurrentWatermarkMs()
        ready = [(t, v) for t, v in starts if wm_ms * 1000 >= t + within_us]
        starts = [(t, v) for t, v in starts if wm_ms * 1000 < t + within_us]
        if starts:
            state.update(([t for t, _ in starts], [v for _, v in starts]))
            _set_timeout(state, min(t for t, _ in starts) // 1000 + within_seconds * 1000)
        else:
            state.remove()
        if ready:
            yield pd.DataFrame(
                [(key[0], pd.Timestamp(t * 1000), v) for t, v in ready],
                columns=[key_col, "e1_ts", "e1_value"],
            )
        return

    return tagged.groupBy(key_col).applyInPandasWithState(
        run, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )


def length_batch_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    n: int,
    value_col: str,
) -> DataFrame:
    """Streaming lengthBatch(n): emit (count, sum, min, max) once every n
    events per key (reference window/mod.rs:645 + 815-LoC state holder —
    here the state is the partial batch buffer).
    """
    out_schema = (
        f"{key_col} string, batch_id long, n long, "
        f"sum_value double, min_value double, max_value double"
    )
    state_schema = "batch_id long, buf_ts array<long>, buf_val array<double>"

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        batch_id, buf = 0, []
        if state.exists:
            bid, bts, bvs = state.get
            batch_id = bid or 0
            buf = list(zip(bts or [], bvs or []))
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        out = []
        for _, r in rows.iterrows():
            buf.append((_us(r[ts_col]), float(r[value_col])))
            if len(buf) == n:
                vals = [v for _, v in buf]
                out.append(
                    (key[0], batch_id, n, float(sum(vals)), min(vals), max(vals))
                )
                batch_id += 1
                buf = []
        state.update((batch_id, [t for t, _ in buf], [v for _, v in buf]))
        if out:
            yield pd.DataFrame(
                out,
                columns=[key_col, "batch_id", "n", "sum_value", "min_value", "max_value"],
            )

    return df.groupBy(key_col).applyInPandasWithState(
        run, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def time_sliding_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    duration_seconds: int,
    value_col: str,
    late: str = "0 seconds",
) -> DataFrame:
    """Streaming time(d): per-EVENT emission of the trailing-d aggregate
    (reference window/mod.rs:196 — every arrival sees the aggregate over
    the last d). State per key = the in-window event buffer; arrivals evict
    expired entries, append, and emit one row. Eviction keeps state ≤ the
    events inside d per key — the same bound the reference's window buffer
    held.

    Output: (key, ts, n, sum_value, min_value, max_value).
    """
    dur_us = duration_seconds * US
    tagged = df.withWatermark(ts_col, late)

    out_schema = (
        f"{key_col} string, ts timestamp, n long, "
        f"sum_value double, min_value double, max_value double"
    )
    state_schema = "buf_ts array<long>, buf_val array<double>"

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        buf: list[tuple[int, float]] = []
        if state.exists:
            bts, bvs = state.get
            buf = list(zip(bts or [], bvs or []))
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        out = []
        for _, r in rows.iterrows():
            t = _us(r[ts_col])
            buf = [(bt, bv) for bt, bv in buf if t - bt < dur_us]
            buf.append((t, float(r[value_col])))
            vals = [v for _, v in buf]
            out.append(
                (
                    key[0],
                    pd.Timestamp(t * 1000),
                    len(vals),
                    float(sum(vals)),
                    min(vals),
                    max(vals),
                )
            )
        if buf:
            state.update(([t for t, _ in buf], [v for _, v in buf]))
            _set_timeout(state, max(t for t, _ in buf) // 1000 + duration_seconds * 1000)
        else:
            state.remove()
        if out:
            yield pd.DataFrame(
                out,
                columns=[key_col, "ts", "n", "sum_value", "min_value", "max_value"],
            )

    return tagged.groupBy(key_col).applyInPandasWithState(
        run, out_schema, state_schema, "append", GroupStateTimeout.EventTimeTimeout
    )

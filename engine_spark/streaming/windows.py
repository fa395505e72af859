"""Streaming window builders — the incremental execution of the batch
window semantics in operators/windows.py.

Native Spark streaming handles every tumbling/hopping/session window;
count-based and per-event sliding windows (length/lengthBatch/time —
reference window/mod.rs:63,645,196) need keyed state because arrival
*count* and per-event emission aren't Catalyst concepts; they run in
``sliding_stream`` below (applyInPandasWithState), which the SQL compiler
routes to for live streams.

Watermark choice: the reference has no late-data machinery (SURVEY §1) — a
0-delay watermark reproduces its semantics exactly; pass ``late`` to be
strictly more tolerant than the reference.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from engine_spark.streaming.eventtime import watermarked


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    late: str = "0 seconds",
) -> DataFrame:
    """timeBatch(d)/TUMBLING — streaming groupBy(window); append-mode
    emission when the watermark passes window end (the reference's batch
    flush, window/mod.rs:965)."""
    out = (
        watermarked(df, ts_col, late)
        .groupBy(F.window(F.col(ts_col), duration), *[F.col(c) for c in group_by])
        .agg(*aggs)
    )
    tst = df.schema[ts_col].dataType.simpleString()
    return out.withColumn("window_start", F.col("window.start").cast(tst)).withColumn(
        "window_end", F.col("window.end").cast(tst)
    ).drop("window")


def hopping(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    late: str = "0 seconds",
) -> DataFrame:
    """SLIDING(size, slide) — native hopping window (the reference parses
    this and errors; converter.rs:659-667)."""
    out = (
        watermarked(df, ts_col, late)
        .groupBy(
            F.window(F.col(ts_col), duration, slide),
            *[F.col(c) for c in group_by],
        )
        .agg(*aggs)
    )
    tst = df.schema[ts_col].dataType.simpleString()
    return out.withColumn("window_start", F.col("window.start").cast(tst)).withColumn(
        "window_end", F.col("window.end").cast(tst)
    ).drop("window")


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
    late: str = "0 seconds",
) -> DataFrame:
    """session(gap[, key]) — native session_window with state-store session
    merging (replaces the reference's 1,900-LoC session processor)."""
    out = (
        watermarked(df, ts_col, late)
        .groupBy(
            F.session_window(F.col(ts_col), gap),
            *[F.col(c) for c in group_by],
        )
        .agg(*aggs)
    )
    tst = df.schema[ts_col].dataType.simpleString()
    return out.withColumn("session_start", F.col("session_window.start").cast(tst)).withColumn(
        "session_end", F.col("session_window.end").cast(tst)
    ).drop("session_window")


# ---------------------------------------------------------------------------
# per-event count/sliding windows (keyed state — arrival count / per-event
# emission aren't Catalyst concepts)
# ---------------------------------------------------------------------------

#: simple-aggregate vocabulary the keyed-state ops evaluate in pandas.
SIMPLE_AGG_FNS = ("count", "sum", "avg", "min", "max")


def _agg_over(buf_vals: list, fn: str) -> float | int | None:
    vals = [v for v in buf_vals if v is not None]
    if fn == "count":
        return len(vals)
    if not vals:
        return None
    if fn == "sum":
        return float(sum(vals))
    if fn == "avg":
        return float(sum(vals)) / len(vals)
    if fn == "min":
        return float(min(vals))
    return float(max(vals))


def sliding_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    aggs: Sequence[tuple[str, str | None, str]],
    mode: str,
    size: int,
    late: str = "0 seconds",
) -> DataFrame:
    """Per-event streaming execution of the count/sliding windows
    (reference window/mod.rs:63 length, :196 time, :645 lengthBatch).

    ``aggs`` is ``[(fn, col | None, alias), ...]`` with fn in
    ``SIMPLE_AGG_FNS`` (``col=None`` ⇔ ``count(*)``). Modes:

    - ``'length'``: every event sees the aggregate of the last ``size``
      events on its key (previous size-1 + itself) — the streaming
      equivalent of the batch rows-frame in operators/windows.py;
    - ``'time'``: every event sees the trailing ``size``-second frame;
    - ``'lengthbatch'``: one row per completed batch of ``size`` events,
      output ``(key, batch_id, *aggs)``.

    Sliding modes emit the FULL input row plus the aggregate columns, so
    SQL SELECT items over event columns keep working. State per key is the
    bounded frame buffer (``size`` rows of the referenced agg columns) —
    the same bound the reference's window buffer held.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from engine_spark.streaming.nfa import _set_timeout, _ts_us_arr

    if mode not in ("length", "time", "lengthbatch"):
        raise ValueError(f"unknown sliding_stream mode {mode!r}")
    for fn, _, _ in aggs:
        if fn not in SIMPLE_AGG_FNS:
            raise ValueError(
                f"aggregate {fn!r} not in the keyed-state vocabulary "
                f"{SIMPLE_AGG_FNS}"
            )
    need_cols = sorted({c for _, c, _ in aggs if c is not None})
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    agg_type = {a: ("long" if fn == "count" else "double") for fn, _, a in aggs}

    if mode == "lengthbatch":
        out_cols = [key_col, "batch_id", *[a for _, _, a in aggs]]
        out_schema = ", ".join(
            [f"{key_col} {schema[key_col]}", "batch_id long"]
            + [f"{a} {agg_type[a]}" for _, _, a in aggs]
        )
    else:
        out_cols = [*df.columns, *[a for _, _, a in aggs]]
        out_schema = ", ".join(
            [f"{c} {schema[c]}" for c in df.columns]
            + [f"{a} {agg_type[a]}" for _, _, a in aggs]
        )
    state_schema = ", ".join(
        ["batch_id long", "buf_ts array<long>"]
        + [f"buf_{i} array<double>" for i in range(len(need_cols))]
    )
    within_us = size * 1_000_000 if mode == "time" else 0
    payload_cols = list(df.columns)

    def _plain(v):
        if hasattr(v, "item"):
            v = v.item()
        if isinstance(v, float) and v != v:  # NaN → NULL
            return None
        return v

    def run(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        batch_id, buf = 0, []
        if state.exists:
            got = state.get
            batch_id = got[0] or 0
            bts = got[1] or []
            cols = [list(got[2 + i] or []) for i in range(len(need_cols))]
            buf = [
                (t, {c: cols[i][j] for i, c in enumerate(need_cols)})
                for j, t in enumerate(bts)
            ]
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        out = []
        ts_us = _ts_us_arr(rows[ts_col])
        col_a = {c: rows[c].values for c in payload_cols}
        for j in range(len(rows)):
            t = int(ts_us[j])
            entry = (
                t,
                {
                    c: (
                        None
                        if col_a[c][j] is None or col_a[c][j] != col_a[c][j]
                        else float(col_a[c][j])
                    )
                    for c in need_cols
                },
            )
            if mode == "time":
                buf = [(bt, bv) for bt, bv in buf if t - bt <= within_us]
                buf.append(entry)
            elif mode == "length":
                buf = buf[-(size - 1):] if size > 1 else []
                buf.append(entry)
            else:  # lengthbatch
                buf.append(entry)
                if len(buf) == size:
                    agg_vals = [
                        _agg_over(
                            [bv.get(c) for _, bv in buf] if c else [1] * len(buf),
                            fn,
                        )
                        for fn, c, _ in aggs
                    ]
                    out.append((_plain(col_a[key_col][j]), batch_id, *agg_vals))
                    batch_id += 1
                    buf = []
                continue
            agg_vals = [
                _agg_over(
                    [bv.get(c) for _, bv in buf] if c else [1] * len(buf), fn
                )
                for fn, c, _ in aggs
            ]
            row_vals = [
                pd.Timestamp(col_a[c][j])
                if schema[c].startswith("timestamp")
                else _plain(col_a[c][j])
                for c in payload_cols
            ]
            out.append((*row_vals, *agg_vals))
        # persist + evict
        state.update(
            (
                batch_id,
                [t for t, _ in buf],
                *[[bv.get(c) for _, bv in buf] for c in need_cols],
            )
        )
        if mode == "time":
            if buf:
                _set_timeout(state, max(t for t, _ in buf) // 1000 + size * 1000)
            else:
                state.remove()
        if out:
            yield pd.DataFrame(out, columns=out_cols)

    timeout = (
        GroupStateTimeout.EventTimeTimeout
        if mode == "time"
        else GroupStateTimeout.NoTimeout
    )
    return (
        watermarked(df, ts_col, late)
        .groupBy(key_col)
        .applyInPandasWithState(run, out_schema, state_schema, "append", timeout)
    )


class _Rev:
    """Inverts comparison for DESC sort-key components."""

    __slots__ = ("v",)

    def __init__(self, v):
        self.v = v

    def __lt__(self, other):
        # None sorts first ASC ⇒ last under _Rev; mirror tuple semantics
        a, b = self.v, other.v
        if a is None:
            return False
        if b is None:
            return True
        return b < a

    def __eq__(self, other):
        return self.v == other.v


def sort_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    n: int,
    order_specs: Sequence[tuple[str, bool]],
    late: str = "0 seconds",
) -> DataFrame:
    """Streaming sort(n, attrs…) window (reference
    sort_window_processor.rs:25 — a bounded priority buffer): each arriving
    event enters the buffer and is emitted with ``action='current'``; when
    capacity is exceeded the worst event under the sort order is expelled
    and emitted with ``action='expired'`` (the reference's current/expired
    pair stream — append mode cannot retract, so expiry is an event).

    ``order_specs`` = [(column, desc)] — the kept set is the TOP-n under
    this order. State per key = the n-row buffer.
    """
    import json

    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    schema = {f.name: f.dataType for f in df.schema.fields}
    ts_like = {
        c
        for c, t in schema.items()
        if isinstance(t, (T.TimestampType, T.TimestampNTZType))
    }
    cols = list(df.columns)
    out_schema = ", ".join(
        ["action string"] + [f"{c} {schema[c].simpleString()}" for c in cols]
    )
    state_schema = "buf array<string>"

    def capture(rec: dict) -> str:
        cap = {}
        for c in cols:
            v = rec[c]
            if hasattr(v, "item"):
                v = v.item()
            if c in ts_like and v is not None:
                v = pd.Timestamp(v).isoformat()
            cap[c] = None if v is None or (isinstance(v, float) and v != v) else v
        return json.dumps(cap)

    def revive(pay: str) -> list:
        d = json.loads(pay)
        return [
            pd.Timestamp(d[c]) if c in ts_like and d[c] is not None else d[c]
            for c in cols
        ]

    def sort_key(pay: str):
        d = json.loads(pay)
        out = []
        for c, desc in order_specs:
            v = d.get(c)
            out.append(_Rev(v) if desc else (v is None, v))
        return tuple(out)

    def run(key, pdfs, state: GroupState):
        buf: list[str] = []
        if state.exists:
            (b,) = state.get
            buf = list(b or [])
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        out = []
        for r in rows.to_dict("records"):
            pay = capture(r)
            out.append(("current", *revive(pay)))
            buf.append(pay)
            if len(buf) > n:
                buf.sort(key=sort_key)
                worst = buf.pop()  # last under the kept order = worst
                out.append(("expired", *revive(worst)))
        if buf:
            state.update((buf,))
        else:
            state.remove()
        if out:
            yield pd.DataFrame(out, columns=["action", *cols])

    return (
        watermarked(df, ts_col, late)
        .groupBy(key_col)
        .applyInPandasWithState(
            run, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )

"""Streaming time-series gap-fill + forward-fill (per-key dense hours).

The streaming twin of the batch ``events_gapfill_1h`` gate
(engine_spark/queries.py): monitoring and feature pipelines want ONE row
per (key, hour) even when an hour saw no events, with the last known
value carried forward. Batch can generate the dense grid after the fact;
a stream has to emit each hour exactly once, only when the watermark
proves the hour can no longer receive events.

Semantics, per key:

- hours bucket event time (epoch-hour);
- a row (key, hour, n_events, filled_value, is_gap) emits for EVERY hour
  from the key's first event hour through the newest CLOSED hour (hour
  end <= current watermark), in order, exactly once;
- hours with events carry their exact sum; empty hours emit
  ``is_gap=true`` with the previous hour's ``filled_value`` carried
  forward;
- gap emission never outruns the key's newest seen event hour, so an
  idle key holds O(pending-hours) state and emits nothing — state does
  not grow with wall-clock time.

Scale: state per key = the not-yet-closed hours' partial sums plus three
scalars — bounded by the watermark delay, independent of stream length.
One keyed shuffle (the groupBy), no join, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from engine_spark.streaming.eventtime import watermarked

_HOUR_MS = 3_600_000


def gapfill_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    late: str = "0 seconds",
) -> DataFrame:
    """(streaming df) → (key, hour, n_events, filled_value, is_gap) with
    dense per-key hours; see module docstring for the exact contract."""
    tagged = watermarked(df, ts_col, late)
    ktype = {f.name: f.dataType for f in df.schema.fields}[
        key_col
    ].simpleString()
    out_schema = (
        f"{key_col} {ktype}, hour timestamp, n_events long, "
        "filled_value double, is_gap boolean"
    )
    state_schema = (
        "next_hour long, last_value double, max_hour long, "
        "pend_hours array<long>, pend_counts array<long>, "
        "pend_sums array<double>"
    )

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        next_hour, last_value, max_hour = None, None, -1
        pending: dict[int, tuple[int, float]] = {}
        if state.exists:
            next_hour, last_value, max_hour, ph, pc, ps = state.get
            pending = {
                h: (c, s)
                for h, c, s in zip(ph or [], pc or [], ps or [])
            }
        # a timed-out invocation (key absent from the batch, watermark
        # passed its next hour boundary) arrives with no rows: the emit
        # loop below closes what the watermark allows
        frames = [] if state.hasTimedOut else list(pdfs)
        rows = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if len(rows):
            ts_ms = (
                rows[ts_col].astype("datetime64[ms]").astype("int64")
            )
            hours = (ts_ms // _HOUR_MS) * _HOUR_MS
            vals = rows[value_col].astype(float)
            # the emit cursor may still move DOWN while nothing has been
            # emitted (last_value is None ⇔ no emission yet — the first
            # emitted hour is always an event hour, which sets it): an
            # allowed-late event older than the first-seen hour must
            # still get its row. Once emission started, events below the
            # cursor are watermark-late for an already-emitted hour —
            # dropped, like any post-watermark event (merging them into
            # pending would leak state forever: the cursor never returns).
            if next_hour is None or last_value is None:
                next_hour = (
                    int(hours.min())
                    if next_hour is None
                    else min(next_hour, int(hours.min()))
                )
            live = hours >= next_hour
            for h, v in zip(hours[live], vals[live]):
                c, s = pending.get(int(h), (0, 0.0))
                pending[int(h)] = (c + 1, s + float(v))
            if live.any():
                max_hour = max(max_hour, int(hours[live].max()))
        out = []
        wm = state.getCurrentWatermarkMs()
        while (
            next_hour is not None
            and next_hour + _HOUR_MS <= wm
            and next_hour <= max_hour
        ):
            if next_hour in pending:
                c, s = pending.pop(next_hour)
                last_value = s
                out.append((key[0], next_hour, c, s, False))
            else:
                out.append((key[0], next_hour, 0, last_value, True))
            next_hour += _HOUR_MS
        state.update(
            (
                next_hour,
                last_value,
                max_hour,
                list(pending.keys()),
                [c for c, _ in pending.values()],
                [s for _, s in pending.values()],
            )
        )
        if next_hour is not None and next_hour <= max_hour:
            # wake this key (even if it goes idle) when the watermark
            # passes its next hour boundary; must be strictly above the
            # current watermark or Spark rejects the timestamp
            state.setTimeoutTimestamp(max(next_hour + _HOUR_MS, wm + 1))
        if out:
            pdf = pd.DataFrame(
                out,
                columns=[key_col, "hour", "n_events", "filled_value",
                         "is_gap"],
            )
            pdf["hour"] = pd.to_datetime(pdf["hour"], unit="ms")
            yield pdf

    return tagged.groupBy(key_col).applyInPandasWithState(
        run, out_schema, state_schema, "append",
        GroupStateTimeout.EventTimeTimeout,
    )

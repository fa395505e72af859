"""Streaming cohort assignment (per-user first-day + day offsets).

The streaming twin of the batch ``events_cohort_retention`` gate
(engine_spark/queries.py): live retention dashboards want each
(user, active-day) pair attributed to the user's cohort day as events
arrive, not in a nightly batch. The retention MATRIX (count per
(cohort_day, day_offset)) is the consumer's aggregation over this
operator's output — the same split the batch gate's oracle states
relationally.

Semantics, per user:

- days bucket event time (epoch-day);
- a row (user_id, cohort_day, day, day_offset) emits exactly once per
  distinct (user, active-day) pair;
- the cohort day is the user's MINIMUM event day among non-late events.
  It is provably final once the watermark reaches its start: any event
  that could lower it would carry ts < cohort-day-start <= watermark and
  is therefore watermark-late. Pairs buffer until that point (in
  practice one micro-batch: the batch that carries the first event
  usually advances the watermark past its own day start) and emit
  immediately afterwards;
- watermark-late events are dropped, exactly like every other
  event-time operator here. Event-time domain: POST-EPOCH — Spark
  floors the watermark at 0, so pre-1970 arrivals in the wm==0 phase
  are treated as late (the state encoding itself handles negative
  day values; see the sentinel note below).

Scale: state per user = the cohort scalar + the set of not-yet-cold
emitted days (a day goes cold once the watermark passes its end — an
event for it can no longer arrive) + the pre-finality pending buffer.
All bounded by the watermark delay, independent of stream length and of
how many calendar days the user has been active (unlike the batch
collect_set, which carries the full span — the stream never needs it
because cold days cannot re-arrive). One keyed shuffle, no join.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from engine_spark.streaming.eventtime import watermarked

_DAY_MS = 86_400_000


def cohort_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    late: str = "0 seconds",
) -> DataFrame:
    """(streaming df) → (key, cohort_day, day, day_offset), one row per
    distinct (key, active-day); see module docstring for the contract."""
    tagged = watermarked(df, ts_col, late)
    ktype = {f.name: f.dataType for f in df.schema.fields}[
        key_col
    ].simpleString()
    out_schema = (
        f"{key_col} {ktype}, cohort_day timestamp, day timestamp, "
        "day_offset int"
    )
    state_schema = "cohort long, hot_days array<long>, pending array<long>"

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        cohort, hot, pending = None, set(), set()
        if state.exists:
            c, h, p = state.get
            # -1 is collision-free as the no-cohort sentinel: real cohorts
            # are day-aligned epoch ms (multiples of _DAY_MS, negative ones
            # included for pre-1970 event times), never -1
            cohort = None if c == -1 else c
            hot, pending = set(h or []), set(p or [])
        wm = state.getCurrentWatermarkMs()
        # emitted days whose end has passed the watermark can never
        # re-arrive — drop them so state tracks the delay, not the span
        hot = {d for d in hot if d + _DAY_MS > wm}

        frames = [] if state.hasTimedOut else list(pdfs)
        rows = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if len(rows):
            ts_ms = rows[ts_col].astype("datetime64[ms]").astype("int64")
            live = ts_ms >= wm  # watermark-late events are dropped
            for t in ts_ms[live]:
                d = (int(t) // _DAY_MS) * _DAY_MS
                if d in hot or d in pending:
                    continue
                pending.add(d)
                cohort = d if cohort is None else min(cohort, d)

        out = []
        if cohort is not None and wm >= cohort:
            # cohort is final: every pending pair emits now; further days
            # will emit in their own arrival batch
            for d in sorted(pending):
                out.append((key[0], cohort, d, (d - cohort) // _DAY_MS))
                hot.add(d)
            pending.clear()

        state.update(
            (
                -1 if cohort is None else cohort,
                sorted(hot),
                sorted(pending),
            )
        )
        if pending and cohort is not None:
            # wake this key once the watermark reaches the cohort-day
            # start so buffered pairs emit even if the user goes idle
            state.setTimeoutTimestamp(max(cohort, wm + 1))
        if out:
            pdf = pd.DataFrame(
                out, columns=[key_col, "cohort_day", "day", "day_offset"]
            )
            pdf["cohort_day"] = pd.to_datetime(pdf["cohort_day"], unit="ms")
            pdf["day"] = pd.to_datetime(pdf["day"], unit="ms")
            pdf["day_offset"] = pdf["day_offset"].astype("int32")
            yield pdf

    return tagged.groupBy(key_col).applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

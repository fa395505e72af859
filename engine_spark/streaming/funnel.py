"""Streaming conversion funnel (stage-1 -> stage-2 within gap -> stage-3).

The streaming twin of the batch ``events_funnel_24h`` gate
(engine_spark/queries.py): live conversion dashboards want each user's
stage transitions as events arrive, not in a nightly batch. Per user:

- t1 = the MINIMUM stage-1 ("signup") event time;
- t2 = the minimum stage-2 ("click") time in (t1, t1 + gap];
- t3 = the minimum stage-3 ("purchase") time in (t2, t2 + gap];
- each resolved stage emits EXACTLY ONE row
  (key, stage, ts, delay_us vs the previous stage).

Finality is a watermark theorem, stage by stage (the same argument the
cohort twin makes for min-day): a candidate tK computed from arrived
events is final once the watermark reaches it, because any event that
could lower tK would carry ts < tK <= watermark and is by definition
watermark-late. Stage K+1 only resolves after stage K is final, so
emissions are monotone and never retracted.

State per user is delay-bounded, independent of stream length:

- stage-1 collapses to ONE scalar (the running min);
- buffered stage-2/3 events with ts <= watermark are provably dead
  unless their predecessor stage is final (any eventual predecessor
  timestamp would be >= watermark >= ts, and eligibility needs
  ts > predecessor) — so the buffers only ever hold DISTINCT timestamps
  newer than the watermark (a set, like the cohort twin's pending days):
  bounded by the lateness horizon's distinct event times, not by how
  many duplicate events a hot key fires;
- once a stage resolves its buffer clears, and when the last stage
  emits the key's state is removed entirely;
- a key whose funnel stalls (stage emitted, successor window expired,
  buffers pruned empty) converges to its floor: the three stage scalars
  plus the emitted bitmask — ~30 bytes. That floor must persist for the
  stream's lifetime to keep emission exactly-once (dropping it would let
  a later out-of-window event re-open the chain and re-emit) — the same
  per-key-ever-seen floor any exactly-once dedup store carries, vs the
  reference's equivalent per-key pattern state.

An event-time timeout re-wakes idle keys so a candidate that was ahead
of the watermark at arrival still emits when the watermark catches up.

Event-time domain: POST-EPOCH. Spark floors the watermark at 0, so for
pre-1970 event times "no event lower than the watermark can arrive" is
not decidable — this operator treats them as watermark-late (dropped),
exactly as Spark's own windowed aggregations do, rather than risk a
wrong early emission.

Relation to the CEP path: ``signup -> click WITHIN gap`` is expressible
as an NFA pattern (streaming/nfa.py), but pattern semantics match EVERY
qualifying pair; the funnel wants the canonical first-touch chain
(min-timestamps) with exactly-once stage emission — a different
operator, shaped like the batch gate's three window minima.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from engine_spark.streaming.eventtime import watermarked

_NONE = -(2**62)  # sentinel: no candidate (real epoch-us never reach it)


def funnel_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    type_col: str = "event_type",
    stages: tuple[str, str, str] = ("signup", "click", "purchase"),
    gap_ms: int = 86_400_000,
    late: str = "0 seconds",
) -> DataFrame:
    """(streaming df) -> (key, stage, ts, delay_us), one row per resolved
    stage per key; see module docstring for the contract. Event times are
    carried as epoch MICROSECONDS end-to-end (state scalars, buffers,
    delay_us), matching the batch twin's unix_micros precision — only the
    watermark and timeout clocks are ms-granular (Spark's API unit)."""
    tagged = watermarked(df, ts_col, late)
    types = {f.name: f.dataType for f in df.schema.fields}
    ktype = types[key_col].simpleString()
    # output ts keeps the INPUT column's type (an NTZ source round-trips
    # as NTZ — the same invariant the NFA operators uphold; eventtime.py)
    ttype = types[ts_col].simpleString()
    out_schema = (
        f"{key_col} {ktype}, stage string, ts {ttype}, delay_us long"
    )
    state_schema = (
        "t1 long, t2 long, t3 long, "
        "pending2 array<long>, pending3 array<long>, emitted int"
    )
    s1, s2, s3 = stages

    gap_us = gap_ms * 1000

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        t1, t2, t3, p2, p3, emitted = _NONE, _NONE, _NONE, set(), set(), 0
        if state.exists:
            t1, t2, t3, p2raw, p3raw, emitted = state.get
            p2, p3 = set(p2raw or []), set(p3raw or [])
        # all event-time arithmetic below is in MICROSECONDS — the batch
        # twin's unix_micros precision and the NFA operators' unit (a ms
        # truncation here would quantize delay_us and floor emitted ts
        # for sub-ms data — ADVICE r9). Spark's watermark is ms-granular;
        # wm scaled to us keeps every comparison exact: t <= wm_us is
        # precisely "the ms-watermark has passed t".
        wm = state.getCurrentWatermarkMs()
        wm_us = wm * 1000

        frames = [] if state.hasTimedOut else list(pdfs)
        rows = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        if len(rows):
            ts_us = rows[ts_col].astype("datetime64[ns]").astype("int64") // 1000
            kinds = rows[type_col]
            live = ts_us >= wm_us  # watermark-late events are dropped
            for t, kind in zip(ts_us[live], kinds[live]):
                t = int(t)
                if kind == s1:
                    t1 = t if t1 == _NONE else min(t1, t)
                elif kind == s2 and t2 == _NONE:
                    p2.add(t)  # sets dedup a hot key's duplicate timestamps
                elif kind == s3 and t3 == _NONE:
                    p3.add(t)

        out = []
        # stage 1: the running min is final once the watermark passes it
        t1_final = t1 != _NONE and t1 <= wm_us
        if t1_final and not emitted & 1:
            out.append((key[0], s1, t1, 0))
            emitted |= 1
        # stage 2
        if t2 == _NONE:
            if t1_final:
                p2 = {t for t in p2 if t1 < t <= t1 + gap_us}
                if p2 and min(p2) <= wm_us:
                    t2 = min(p2)
                    p2 = set()
            else:
                # eventual t1 >= wm_us, so any buffered t <= wm_us fails t > t1
                p2 = {t for t in p2 if t > wm_us}
        if t2 != _NONE and not emitted & 2:
            out.append((key[0], s2, t2, t2 - t1))
            emitted |= 2
        # stage 3 (same shape, one stage down)
        if t3 == _NONE:
            if t2 != _NONE:
                p3 = {t for t in p3 if t2 < t <= t2 + gap_us}
                if p3 and min(p3) <= wm_us:
                    t3 = min(p3)
                    p3 = set()
            else:
                p3 = {t for t in p3 if t > wm_us}
        if t3 != _NONE and not emitted & 4:
            out.append((key[0], s3, t3, t3 - t2))
            emitted |= 4

        if emitted & 4:
            state.remove()  # chain complete: nothing left to resolve
        else:
            state.update((t1, t2, t3, sorted(p2), sorted(p3), emitted))
            # re-wake when the watermark reaches the nearest unresolved
            # candidate so an idle key still emits
            targets = []
            if t1 != _NONE and not emitted & 1:
                targets.append(t1)
            targets += list(p2) + list(p3)
            if targets:
                # timeout is ms-granular: ceil the us target so the wake
                # fires when the ms-watermark has provably passed it
                wake_ms = -(-min(targets) // 1000)
                state.setTimeoutTimestamp(max(wake_ms, wm + 1))
        if out:
            pdf = pd.DataFrame(
                out, columns=[key_col, "stage", "ts", "delay_us"]
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"], unit="us")
            pdf["delay_us"] = pdf["delay_us"].astype("int64")
            yield pdf

    return tagged.groupBy(key_col).applyInPandasWithState(
        run,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

"""Property-based batch ↔ streaming parity for the CEP core.

The batch `pattern.followed_by` (relational join+rank) and the streaming
`nfa.followed_by_stream` (per-key state machine) implement the SAME
semantics by two completely different mechanisms. On any event sequence
they must produce identical match sets — a far stronger statement than
example-based tests, and the property the reference enforces implicitly by
having only one engine.

Hypothesis generates random event schedules (type, user, minute offsets,
duplicates allowed); each example replays the stream in 1-3 micro-batch
splits.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from engine_spark.operators import pattern
from engine_spark.streaming import nfa
from engine_spark.streaming.harness import StreamRunner

T0 = datetime(2026, 1, 1, 12, 0)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["login", "purchase", "view"]),
        st.sampled_from(["u1", "u2"]),
        st.integers(min_value=0, max_value=30),  # minute offset
    ),
    min_size=1,
    max_size=12,
)


@given(events=events_strategy, split=st.integers(min_value=1, max_value=3))
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_followed_by_batch_equals_streaming(spark, events, split):
    within = 600  # 10 minutes
    # deterministic schedule sorted by time (the NFA sorts in-batch anyway;
    # sorting here makes the micro-batch split respect arrival order)
    rows = sorted(
        [
            (T0 + timedelta(minutes=m), u, t, float(i))
            for i, (t, u, m) in enumerate(events)
        ],
        key=lambda r: r[0],
    )

    # --- batch: relational formulation ---------------------------------
    df = spark.createDataFrame(rows, "ts timestamp, user string, etype string, v double")
    batch = pattern.followed_by(
        df, "ts", ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "purchase",
        within_seconds=within,
    )
    batch_set = {
        (r["user"], r["e1_v"], r["e2_v"])
        for r in batch.select("user", "e1_v", "e2_v").collect()
    }

    # --- streaming: per-key NFA across micro-batches -------------------
    r = StreamRunner(spark, "ts timestamp, user string, etype string, v double")
    n = max(1, len(rows) // split)
    for i in range(0, len(rows), n):
        r.send(
            [
                {"ts": ts.isoformat(), "user": u, "etype": t, "v": v}
                for ts, u, t, v in rows[i : i + n]
            ]
        )
    r.run(
        lambda sdf: nfa.followed_by_stream(
            sdf, "ts", "user",
            first=F.col("etype") == "login",
            second=F.col("etype") == "purchase",
            within_seconds=within, value_col="v",
        )
    )
    stream_set = {
        (m["user"], m["e1_value"], m["e2_value"]) for m in r.shutdown()
    }

    assert batch_set == stream_set

"""CEP pattern tests — exact match sets, including the duplicate-timestamp
edge (two A events with identical key+ts must each keep their own match;
reference stream_pre_state_processor.rs spawns one NFA state per event).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine_spark.operators import pattern
from tests.conftest import rows, ts


def ev(spark, data):
    return spark.createDataFrame(
        data, "user string, etype string, ts timestamp, eid int"
    )


BASE = [
    ("u1", "login", ts(0), 1),
    ("u1", "view", ts(1), 2),
    ("u1", "purchase", ts(2), 3),
    ("u1", "purchase", ts(8), 4),
    ("u2", "login", ts(0), 5),
    ("u2", "view", ts(30), 6),  # outside WITHIN for followed_by tests
]


def test_followed_by_first_match(spark):
    out = pattern.followed_by(
        ev(spark, BASE), "ts", ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "purchase",
        within_seconds=600,
    )
    got = rows(out, "user", "e1_eid", "e2_eid", "delay_seconds")
    # u1 login→ earliest purchase (eid 3, 120 s later); u2 has none
    assert got == [("u1", 1, 3, 120.0)]


def test_followed_by_duplicate_timestamp_keeps_both(spark):
    data = [
        ("u1", "login", ts(0), 1),
        ("u1", "login", ts(0), 2),  # same key, same ts, distinct event
        ("u1", "purchase", ts(1), 3),
    ]
    out = pattern.followed_by(
        ev(spark, data), "ts", ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "purchase",
        within_seconds=600,
    )
    got = rows(out, "e1_eid", "e2_eid")
    assert got == [(1, 3), (2, 3)]


def test_sequence_strict_adjacency(spark):
    out = pattern.followed_by(
        ev(spark, BASE), "ts", ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "purchase",
        within_seconds=600,
        strict=True,
    )
    # u1: login(1) → view(2) intervenes before purchase(3) ⇒ no strict match
    assert rows(out, "e1_eid") == []

    out2 = pattern.followed_by(
        ev(spark, BASE), "ts", ["user"],
        first=F.col("etype") == "view",
        second=F.col("etype") == "purchase",
        within_seconds=600,
        strict=True,
    )
    assert rows(out2, "e1_eid", "e2_eid") == [(2, 3)]


def test_absent_pattern(spark):
    out = pattern.absent(
        ev(spark, BASE), "ts", ["user"],
        first=F.col("etype") == "login",
        absent_filter=F.col("etype") == "purchase",
        within_seconds=600,
    )
    # u1's login sees a purchase within 10 min; u2's does not
    assert rows(out, "user", "eid") == [("u2", 5)]


def test_count_quantifier_min(spark):
    data = [
        ("u1", "error", ts(0), 1),
        ("u1", "error", ts(1), 2),
        ("u1", "error", ts(2), 3),
        ("u2", "error", ts(0), 4),
    ]
    out = pattern.count_quantifier(
        ev(spark, data), "ts", ["user"],
        event_filter=F.col("etype") == "error",
        min_count=3,
        within_seconds=600,
    )
    got = rows(out, "user", "eid", "match_count")
    assert got == [("u1", 3, 3)]


def test_logical_and_either_order(spark):
    data = [
        ("u1", "login", ts(0), 1),
        ("u1", "error", ts(5), 2),   # after login, within 10 min
        ("u2", "error", ts(0), 3),
        ("u2", "login", ts(5), 4),   # before login, within 10 min
        ("u3", "login", ts(0), 5),
        ("u3", "error", ts(30), 6),  # outside window
    ]
    out = pattern.logical_and(
        ev(spark, data), "ts", ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "error",
        within_seconds=600,
    )
    got = rows(out, "user", "e1_eid", "e2_eid", "matched_at")
    assert got == [("u1", 1, 2, ts(5)), ("u2", 4, 3, ts(5))]


def test_logical_or_branch_tag(spark):
    out = pattern.logical_or(
        ev(spark, BASE), ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "view",
    )
    got = rows(out, "eid", "branch")
    assert got == [(1, "first"), (2, "second"), (5, "first"), (6, "second")]


def test_first_match_only_non_every(spark):
    data = [
        ("u1", "login", ts(0), 1),
        ("u1", "purchase", ts(1), 2),
        ("u1", "login", ts(2), 3),
        ("u1", "purchase", ts(3), 4),
    ]
    m = pattern.followed_by(
        ev(spark, data), "ts", ["user"],
        first=F.col("etype") == "login",
        second=F.col("etype") == "purchase",
        within_seconds=600,
    )
    assert len(rows(m, "e1_eid")) == 2  # EVERY semantics: both logins match
    one = pattern.first_match_only(m, ["user"], "e1_ts")
    assert rows(one, "e1_eid", "e2_eid") == [(1, 2)]  # non-EVERY: first only


def test_count_quantifier_bounded_max(spark):
    data = [("u1", "error", ts(i), i) for i in range(7)]  # 7 errors in 6 min
    out = pattern.count_quantifier_bounded(
        ev(spark, data), "ts", ["user"],
        event_filter=F.col("etype") == "error",
        min_count=3, max_count=5,
        within_seconds=600,
    )
    got = rows(out, "eid", "match_count")
    # counts run 1..7 over the trailing window; only 3..5 fire
    assert got == [(2, 3), (3, 4), (4, 5)]


def test_collection_aggregates_over_match_set(spark):
    data = [
        ("u1", "error", ts(0), 1),
        ("u1", "error", ts(1), 2),
        ("u1", "error", ts(2), 3),
    ]
    df = ev(spark, data).withColumn("value", F.col("eid").cast("double") * 10)
    out = pattern.collection_aggregates(
        df, "ts", ["user"],
        event_filter=F.col("etype") == "error",
        within_seconds=600,
        aggs={
            "n": F.count(F.lit(1)),
            "s": F.sum("value"),
            "mx": F.max("value"),
        },
    )
    got = rows(out, "eid", "n", "s", "mx")
    assert got == [(1, 1, 10.0, 10.0), (2, 2, 30.0, 20.0), (3, 3, 60.0, 30.0)]


def test_followed_by_duplicate_a_rows_collapse(spark):
    """Byte-identical duplicate A events yield ONE match in both PATTERN and
    SEQUENCE modes (relational set semantics, matching the SQL oracle);
    per-event duplicate semantics live in the streaming NFA."""
    from tests.conftest import ts

    df = spark.createDataFrame(
        [
            (1, ts(0), "a", 1.0),
            (1, ts(0), "a", 1.0),  # exact duplicate (at-least-once upstream)
            (1, ts(1), "b", 2.0),
        ],
        "user_id long, ts timestamp, kind string, value double",
    )
    for strict in (False, True):
        out = pattern.followed_by(
            df, "ts", ["user_id"],
            F.col("kind") == "a", F.col("kind") == "b",
            within_seconds=600, strict=strict,
        ).collect()
        assert len(out) == 1, f"strict={strict}: {out}"
        assert out[0]["e1_value"] == 1.0 and out[0]["e2_value"] == 2.0


def test_followed_by_dedupe_false_keeps_per_event_duplicates(spark):
    """``dedupe=False`` opts into the reference's per-arriving-event
    semantics (stream_pre_state_processor.rs: every duplicate A opens its
    own state and fires its own match) — batch then agrees with the
    streaming NFA on at-least-once duplicate input."""
    from tests.conftest import ts

    df = spark.createDataFrame(
        [
            (1, ts(0), "a", 1.0),
            (1, ts(0), "a", 1.0),  # exact duplicate (at-least-once upstream)
            (1, ts(1), "b", 2.0),
        ],
        "user_id long, ts timestamp, kind string, value double",
    )
    out = pattern.followed_by(
        df, "ts", ["user_id"],
        F.col("kind") == "a", F.col("kind") == "b",
        within_seconds=600, dedupe=False,
    ).collect()
    assert len(out) == 2
    assert all(r["e1_value"] == 1.0 and r["e2_value"] == 2.0 for r in out)

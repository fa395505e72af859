"""Join operators.

The reference supports exactly one join per query with Inner/Left/Right/Full
types and an arbitrary ON condition, implemented as a nested loop over two
window buffers (reference: join_input_stream.rs:12-26, join_processor.rs:84-160).
Here every join is a declarative ``df.join`` — Catalyst picks
broadcast/sort-merge/shuffled-hash, AQE re-picks at runtime. The helpers add
the scale policy the reference couldn't have: explicit broadcast of dimension
tables and windowed stream-stream join conditions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = {
    "inner": "inner",
    "left": "left_outer",
    "left_outer": "left_outer",
    "right": "right_outer",
    "right_outer": "right_outer",
    "full": "full_outer",
    "full_outer": "full_outer",
}


def enrich(
    stream: DataFrame,
    table: DataFrame,
    on: Column | list[str],
    how: str = "inner",
    broadcast_table: bool | None = None,
) -> DataFrame:
    """Stream↔table enrichment join (reference table_join_processor.rs).

    The reference probes the table once per event; the Spark equivalent is a
    stream-static join. ``broadcast_table=None`` (default) lets
    AQE/autoBroadcastJoinThreshold pick the strategy from actual sizes — a
    forced broadcast of a dimension that grew 100× OOMs the executors, so
    force (``True``) only for tables known to be bounded-small (nation,
    region), and ``False`` to forbid.
    """
    right = F.broadcast(table) if broadcast_table else table
    return stream.join(right, on, JOIN_TYPES[how])


def windowed_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_delta_seconds: int,
    on: Column,
    how: str = "inner",
) -> DataFrame:
    """Stream↔stream join within a time window (reference join_processor.rs:18-27:
    both sides keep a window buffer; an arriving event probes the other side's
    buffer). Spark equivalent: equi-join + time-range condition; in streaming
    the range bound is exactly what lets the state store evict.
    """
    l, r = F.col(left_ts), F.col(right_ts)
    time_cond = (r >= l - F.expr(f"INTERVAL {max_delta_seconds} SECONDS")) & (
        r <= l + F.expr(f"INTERVAL {max_delta_seconds} SECONDS")
    )
    return left.join(right, on & time_cond, JOIN_TYPES[how])


def in_table(stream: DataFrame, table: DataFrame, on: Column, negate: bool = False) -> DataFrame:
    """``WHERE x IN (table)`` membership (reference in_expression_executor.rs:14-31).

    Compiled to a left-semi/anti join — Catalyst broadcasts the membership set
    when it's small, so the big side never shuffles.
    """
    return stream.join(table, on, "left_anti" if negate else "left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """As-of join (not in the reference — added for the training-data pipeline).

    For each left row, pick the single right row with the greatest
    ``right_ts <= left_ts`` (backward) / smallest ``right_ts >= left_ts``
    (forward) per key. Implemented as range join + per-left-row top-1 — one
    shuffle on the key, no custom state.
    """
    cond = F.lit(True)
    for k in on:
        cond = cond & (left[k] == right[k])
    tb = list(tiebreak or [])
    if direction == "backward":
        cond = cond & (right[right_ts] <= left[left_ts])
        order = [F.col(f"r.{right_ts}").desc()] + [F.col(f"r.{c}").desc() for c in tb]
    else:
        cond = cond & (right[right_ts] >= left[left_ts])
        order = [F.col(f"r.{right_ts}").asc()] + [F.col(f"r.{c}").asc() for c in tb]
    from pyspark.sql import Window

    j = left.alias("l").join(right.alias("r"), cond, "left")
    w = Window.partitionBy(*[F.col(f"l.{k}") for k in on], F.col(f"l.{left_ts}")).orderBy(*order)
    return j.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-hardened equi-join: salt the (large, skewed) left side into
    ``salt_buckets`` sub-keys and replicate the right side across them.

    AQE's skew-join split (enabled in session.py) handles most skew at
    runtime by splitting oversized partitions; explicit salting is the
    belt-and-braces variant for pathological keys (one key = 30% of rows)
    where even a split partition's *build* side overflows. Replication
    factor = salt_buckets on the right side — keep the right side the
    smaller input.
    """
    l = left.withColumn("_salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = F.lit(True)
    for k in on:
        cond = cond & (l[k] == r[k])
    cond = cond & (l["_salt"] == r["_salt"])
    out = l.join(r, cond, JOIN_TYPES[how])
    for k in on:
        out = out.drop(r[k])  # keep one copy of each join key
    return out.drop("_salt")

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
    region). ``False`` genuinely forbids broadcast via a sort-merge hint
    (Catalyst honors MERGE over the auto-broadcast threshold) — for
    dimensions known to be large regardless of what stale stats claim.
    """
    if broadcast_table:
        right = F.broadcast(table)
    elif broadcast_table is False:
        right = table.hint("merge")
    else:
        right = table
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
    (forward) per key.

    Scale design: union both sides tagged, then ONE running ``last(_rpay,
    ignorenulls)`` window over the merged per-key timeline. A join-then-rank
    formulation multiplies each left row by every matching right row before
    the rank prunes it (a key with a million prior right rows makes a
    million intermediates per left row); the merged-timeline window carries
    exactly one row per input row — one shuffle on the key, linear state.

    Output: ``on`` keys + left non-key columns + right non-key columns
    (null-padded when no right row qualifies — left-join semantics).
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    tb = list(tiebreak or [])
    l_pay = [c for c in left.columns if c not in on]
    r_pay = [c for c in right.columns if c not in on]
    l_type = T.StructType([left.schema[c] for c in l_pay])
    r_type = T.StructType([right.schema[c] for c in r_pay])

    l2 = left.select(
        *on,
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in l_pay]).alias("_lpay"),
        F.lit(None).cast(r_type).alias("_rpay"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb{i}")
          for i, c in enumerate(tb)],
    )
    r2 = right.select(
        *on,
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_type).alias("_lpay"),
        F.struct(*[F.col(c) for c in r_pay]).alias("_rpay"),
        *[F.col(c).alias(f"_tb{i}") for i, c in enumerate(tb)],
    )
    u = l2.unionByName(r2)

    if direction == "backward":
        # time asc; at equal ts the right row sorts first (<= is inclusive);
        # among right ties the greatest tiebreak sorts last and wins last()
        order = [F.col("_t").asc(), F.col("_side").asc()] + [
            F.col(f"_tb{i}").asc_nulls_first() for i in range(len(tb))
        ]
    elif direction == "forward":
        order = [F.col("_t").desc(), F.col("_side").asc()] + [
            F.col(f"_tb{i}").desc_nulls_first() for i in range(len(tb))
        ]
    else:
        raise ValueError(f"asof_join: direction must be backward/forward, got {direction!r}")

    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        u.withColumn("_match", F.last("_rpay", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        *on,
        *[F.col(f"_lpay.{c}").alias(c) for c in l_pay],
        *[F.col(f"_match.{c}").alias(c) for c in r_pay],
    )


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

    Only inner/left joins are valid: the right side is replicated across
    salt buckets, so an unmatched right row would surface once per bucket
    under right/full-outer semantics.
    """
    if JOIN_TYPES[how] not in ("inner", "left_outer"):
        raise ValueError(
            f"salted_join: only inner/left supported (right side is replicated "
            f"{salt_buckets}x; right/full outer would duplicate unmatched right "
            f"rows), got {how!r}"
        )
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

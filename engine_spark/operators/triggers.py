"""Cron windows + triggers (reference window/mod.rs:1742 CronWindowProcessor,
trigger_definition.rs / trigger_runtime.rs).

The reference buffers events and flushes on a cron schedule. The declarative
equivalent: every event belongs to the cron interval it would have been
flushed in, so a *periodic* cron expression compiles to
``window(ts, period, period, startTime=offset)`` — native, shuffle-once,
no scheduler thread. Non-periodic expressions (day-of-month/month/weekday
restrictions) don't map to a fixed period and are rejected with a clear
error (the streaming path would use a ProcessingTime trigger instead).

Triggers: a timer-generated stream. Streaming: the rate source (one row per
tick). Batch replay: an explicit tick relation via ``sequence()``.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def cron_to_period(cron: str) -> tuple[int, int]:
    """Parse a periodic 5-field cron into (period_seconds, offset_seconds).

    Supported shapes (the periodic subset):
    - ``*/n * * * *``  → every n minutes
    - ``m * * * *``    → hourly at minute m
    - ``m h * * *``    → daily at h:m
    - ``* * * * *``    → every minute
    Anything with day-of-month/month/day-of-week restrictions is aperiodic.
    """
    fields = cron.split()
    if len(fields) != 5:
        raise ValueError(f"cron {cron!r}: expected 5 fields")
    minute, hour, dom, mon, dow = fields
    if (dom, mon, dow) != ("*", "*", "*"):
        raise ValueError(
            f"cron {cron!r}: only periodic expressions (dom/month/dow = '*') "
            "map to a batch window; use a processing-time trigger in streaming"
        )
    m_step = re.fullmatch(r"\*/(\d+)", minute)
    if m_step:
        if hour != "*":
            raise ValueError(f"cron {cron!r}: */n minutes requires hour='*'")
        return int(m_step.group(1)) * 60, 0
    if minute == "*":
        return 60, 0
    if not minute.isdigit():
        raise ValueError(f"cron {cron!r}: unsupported minute field")
    if hour == "*":
        return 3600, int(minute) * 60
    if hour.isdigit():
        return 86400, int(hour) * 3600 + int(minute) * 60
    raise ValueError(f"cron {cron!r}: unsupported hour field")


def cron_window(
    df: DataFrame,
    ts_col: str,
    cron: str,
    group_by: Sequence[str] = (),
    aggs: Sequence[Column] = (),
) -> DataFrame:
    """cron('expr') window: aggregate per cron-flush interval."""
    period, offset = cron_to_period(cron)
    w = F.window(
        F.col(ts_col),
        f"{period} seconds",
        f"{period} seconds",
        f"{offset} seconds",
    )
    out = df.groupBy(w.alias("w"), *[F.col(c) for c in group_by]).agg(*aggs)
    return (
        out.withColumn("flush_time", F.col("w.end"))
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


def trigger_stream(spark: SparkSession, every_ms: int) -> DataFrame:
    """Streaming trigger (trigger_runtime.rs): one event per interval.
    Columns (triggered_time, counter) mirror the reference's trigger events.

    Sub-second intervals map to rowsPerSecond; intervals over a second emit
    at 1 row/s and keep every ``every_ms/1000``-th row (the rate source has
    no fractional rowsPerSecond), renumbering so counter stays dense.
    Intervals that aren't a whole number of seconds round to the nearest
    second.
    """
    if every_ms <= 1000:
        per_second = max(1, round(1000 / every_ms))
        df = spark.readStream.format("rate").option("rowsPerSecond", per_second).load()
        return df.select(
            F.col("timestamp").alias("triggered_time"), F.col("value").alias("counter")
        )
    step = max(1, round(every_ms / 1000))
    df = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    return df.filter(F.col("value") % step == 0).select(
        F.col("timestamp").alias("triggered_time"),
        (F.col("value") / step).cast("long").alias("counter"),
    )


def trigger_batch(
    spark: SparkSession, start, end, every_seconds: int
) -> DataFrame:
    """Batch tick relation: the events a trigger would have emitted in
    [start, end) — drives historical replays and cron-style joins."""
    ticks = spark.range(1).select(
        F.posexplode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(f"INTERVAL {every_seconds} SECONDS"),
            )
        ).alias("counter", "triggered_time")
    )
    return ticks.select("triggered_time", F.col("counter").cast("bigint"))

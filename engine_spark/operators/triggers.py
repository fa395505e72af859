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
    if len(fields) == 6:
        # 6-field (seconds-resolution, Quartz-style) cron — the form the
        # reference's trigger tests use (`*/1 * * * * *`,
        # tests/compatibility/triggers.rs:124)
        sec, rest = fields[0], fields[1:]
        s_step = re.fullmatch(r"\*/(\d+)", sec)
        if s_step:
            if rest != ["*"] * 5:
                raise ValueError(
                    f"cron {cron!r}: */n seconds requires all other fields '*'"
                )
            if int(s_step.group(1)) == 0:
                raise ValueError(f"cron {cron!r}: zero step")
            return int(s_step.group(1)), 0
        if sec == "*":
            if rest == ["*"] * 5:
                return 1, 0  # every second
            raise ValueError(
                f"cron {cron!r}: seconds wildcard with restricted fields is aperiodic"
            )
        if not sec.isdigit():
            raise ValueError(f"cron {cron!r}: unsupported seconds field")
        period, offset = cron_to_period(" ".join(rest))
        return period, offset + int(sec)
    if len(fields) != 5:
        raise ValueError(f"cron {cron!r}: expected 5 or 6 fields")
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
        if int(m_step.group(1)) == 0:
            raise ValueError(f"cron {cron!r}: zero step")
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
    spark: SparkSession, start, end, every_seconds: float
) -> DataFrame:
    """Batch tick relation: the events a trigger would have emitted in
    [start, end] — drives historical replays and cron-style joins.
    Sub-second intervals compile to a MILLISECONDS step."""
    if every_seconds == int(every_seconds):
        step = f"INTERVAL {int(every_seconds)} SECONDS"
    else:
        step = f"INTERVAL {round(every_seconds * 1000)} MILLISECONDS"
    ticks = spark.range(1).select(
        F.posexplode(
            F.sequence(
                F.lit(start).cast("timestamp"),
                F.lit(end).cast("timestamp"),
                F.expr(step),
            )
        ).alias("counter", "triggered_time")
    )
    return ticks.select("triggered_time", F.col("counter").cast("bigint"))


def trigger_batch_cron(spark: SparkSession, start, end, cron: str) -> DataFrame:
    """Batch tick relation for a (periodic) cron trigger: ticks at every
    instant t in [start, end] with ``(epoch(t) - offset) % period == 0`` —
    i.e. aligned to the cron grid, not to ``start``."""
    import datetime as _dt

    period, offset = cron_to_period(cron)
    s = start if isinstance(start, _dt.datetime) else _dt.datetime.fromisoformat(str(start))
    e = end if isinstance(end, _dt.datetime) else _dt.datetime.fromisoformat(str(end))
    es = (s - _dt.datetime(1970, 1, 1)).total_seconds()
    first_dt = _dt.datetime(1970, 1, 1) + _dt.timedelta(
        seconds=es + ((offset - es) % period)
    )
    if first_dt > e:
        # a horizon shorter than one period holds no grid point: zero
        # ticks, not a sequence() boundary error
        return spark.createDataFrame(
            [], "triggered_time timestamp, counter bigint"
        )
    return trigger_batch(spark, first_dt, e, period)


def trigger_once_stream(spark: SparkSession) -> DataFrame:
    """Streaming AT START trigger: exactly one event at query start
    (reference trigger_runtime.rs start-mode; triggers.rs:101-108)."""
    df = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    return df.filter(F.col("value") == 0).select(
        F.col("timestamp").alias("triggered_time"),
        F.col("value").alias("counter"),
    )

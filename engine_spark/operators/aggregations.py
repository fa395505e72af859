"""Aggregator registry + deterministic numeric helpers.

The reference implements 9 incremental aggregators with per-group state
(reference: src/core/query/selector/attribute/aggregator/mod.rs, registry
names src/core/config/eventflux_context.rs:440-483). In Spark each is a native
Catalyst aggregate with map-side partial aggregation — the "incremental
add/remove" machinery is the streaming state store's job.

``decimal_sum``/``decimal_avg``/``stddev_pop_det`` exist because distributed
double summation is order-dependent: summing via DECIMAL(18,4) is exact, so
results are bit-identical run-to-run and engine-to-engine (this is how the
DuckDB-oracle correctness gate stays deterministic at any partition count).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

AggFn = Callable[..., Column]

#: reference registry-name → Spark aggregate builder
AGGREGATORS: dict[str, AggFn] = {
    "sum": F.sum,                       # aggregator/mod.rs:172
    "avg": F.avg,                       # aggregator/mod.rs:557
    "count": F.count,                   # aggregator/mod.rs:813
    "distinctcount": F.count_distinct,  # aggregator/mod.rs:1117
    "approxdistinctcount": F.approx_count_distinct,  # scale path for the above
    "min": F.min,                       # aggregator/mod.rs:1396
    "max": F.max,
    "minforever": F.min,                # eventflux_context.rs:456-470 — min/max over
    "maxforever": F.max,                # stream life; unwindowed running agg
    "stddev": F.stddev_pop,             # aggregator/mod.rs:1536 (population stddev)
    "first": lambda c: F.first(c, ignorenulls=False),  # aggregator/mod.rs:1660
    "last": lambda c: F.last(c, ignorenulls=False),    # aggregator/mod.rs:1768
}


def resolve(name: str) -> AggFn:
    fn = AGGREGATORS.get(name.lower())
    if fn is None:
        raise KeyError(f"unknown aggregator: {name}")
    return fn


# ---------------------------------------------------------------------------
# deterministic numeric aggregates (exact decimal arithmetic)
# ---------------------------------------------------------------------------

def dec(col: Column | str, scale: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def decimal_sum(col: Column | str, scale: int = 4) -> Column:
    """Exact, order-independent sum of a double column (via decimal)."""
    return F.sum(dec(col, scale)).cast("double")


def decimal_avg(col: Column | str, scale: int = 4) -> Column:
    """Exact-sum average: decimal sum / count, evaluated as one double div."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, scale)).cast("double") / F.count(c)).cast("double")


def stddev_pop_det(col: Column | str, scale: int = 4) -> Column:
    """Population stddev via exact decimal moments: sqrt(E[x²] − E[x]²).

    Order-independent (decimal sums are exact), so it hashes identically
    across engines — the reference's stddev (aggregator/mod.rs:1536) is the
    same population formula.
    """
    c = F.col(col) if isinstance(col, str) else col
    n = F.count(c).cast("double")
    sx = F.sum(dec(c, scale)).cast("double")
    sxx = F.sum((dec(c, scale) * dec(c, scale))).cast("double")
    # clamp: catastrophic cancellation can push the operand epsilon-negative
    return F.sqrt(F.greatest(sxx / n - (sx / n) * (sx / n), F.lit(0.0)))

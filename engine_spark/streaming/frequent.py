"""Bounded-memory streaming frequent items — the Space-Saving summary.

The batch ``windows.frequent_items`` computes lossyCounting (reference
window/mod.rs:1654) EXACTLY, because a distributed groupBy is not
memory-bound the way the reference's row-at-a-time window was. Streaming
over unbounded item cardinality is a different regime: per-key state must
stay bounded no matter how many distinct items flow past. Space-Saving
(Metwally et al., "Efficient computation of frequent and top-k elements in
data streams") keeps exactly ``capacity`` counters per key:

- a tracked item increments its counter;
- an untracked item evicts the minimum counter m and inherits it
  (count = m+1, error = m), so every counter OVER-estimates by at most its
  recorded error;
- any item with true frequency > N/capacity is guaranteed tracked — the
  same guarantee class lossy counting provides at ε = 1/capacity.

State per key = 3 flat arrays of length ≤ capacity, independent of stream
length or cardinality. Each micro-batch appends a snapshot of the summary
(one row per tracked item, stamped with the batch's max event time), so the
consumer always has the latest bounded-error frequencies.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from engine_spark.streaming.eventtime import watermarked


def space_saving_stream(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    item_col: str,
    capacity: int,
    late: str = "0 seconds",
) -> DataFrame:
    """Per-key Space-Saving summary, emitted once per micro-batch.

    Output: (key, as_of_ts, item, count_est, error) with at most
    ``capacity`` rows per key per batch; ``count_est - error`` is a
    guaranteed lower bound on the item's true count.
    """
    tagged = watermarked(df, ts_col, late)
    ktype = {f.name: f.dataType for f in df.schema.fields}[key_col].simpleString()
    out_schema = (
        f"{key_col} {ktype}, as_of_ts timestamp, item string, "
        f"count_est long, error long"
    )
    state_schema = "items array<string>, counts array<long>, errors array<long>"

    def run(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        counters: dict[str, tuple[int, int]] = {}
        if state.exists:
            items, counts, errors = state.get
            counters = {
                i: (c, e)
                for i, c, e in zip(items or [], counts or [], errors or [])
            }
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ts_col, kind="mergesort"
        )
        for item in rows[item_col].astype(str):
            if item in counters:
                c, e = counters[item]
                counters[item] = (c + 1, e)
            elif len(counters) < capacity:
                counters[item] = (1, 0)
            else:
                victim = min(counters, key=lambda k: counters[k][0])
                vc, _ = counters.pop(victim)
                counters[item] = (vc + 1, vc)
        state.update(
            (
                list(counters.keys()),
                [c for c, _ in counters.values()],
                [e for _, e in counters.values()],
            )
        )
        if len(rows):
            as_of = pd.Timestamp(rows[ts_col].max())
            yield pd.DataFrame(
                [
                    (key[0], as_of, item, c, e)
                    for item, (c, e) in counters.items()
                ],
                columns=[key_col, "as_of_ts", "item", "count_est", "error"],
            )

    return tagged.groupBy(key_col).applyInPandasWithState(
        run, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )

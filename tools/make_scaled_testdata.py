"""Derive an ~sf1 dataset from the driver's sf0.1 parquet for the one-time
scale-sensitive correctness sweep (VERDICT r10 task #5).

The driver only ships sf0.001/0.01/0.1; a 10x data step can expose
overflow/precision/skew bugs the timing probes (which check time, not
answers) cannot. This script replicates every FACT table 10x with
KEY-SHIFTED replicas (shift = 1e8 per replica, applied consistently to
every foreign key, so referential integrity is exact) and copies the two
fixed dimension tables as-is. Text/measure/timestamp columns are kept
verbatim — the content distribution becomes a 90%-duplicate corpus,
which is the adversarial regime for the dedup/LSH operators and
irrelevant for the relational ones.

The sweep's validity does not depend on this data matching any "real"
sf1: Spark and the DuckDB oracle read the SAME files, so every
rows/schema/hash comparison is exact on whatever the data is. Output
goes under the repo's gitignored .benchdata/ scratch area.

Row groups are written small (16k rows) so Spark's scan splits
parallelize — DuckDB's default single 122k-row group would serialize
every documents/embeddings stage onto one core.

Usage: python tools/make_scaled_testdata.py [out_dir] [reps]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SHIFT = 100_000_000  # per-replica key offset; far above every base key


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1",
    )
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"CREATE TABLE r AS SELECT range AS i FROM range({reps})")

    # (table, [key columns shifted by i*SHIFT]) — every FK shifts with its PK
    plans = {
        "region": [],
        "nation": [],
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for t, keys in plans.items():
        src = f"'{SRC}/{t}.parquet'"
        dst = os.path.join(out, f"{t}.parquet")
        if not keys:  # fixed dimension: copy verbatim, single file
            con.sql(f"COPY (SELECT * FROM {src}) TO '{dst}' (FORMAT PARQUET)")
            n = con.sql(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        else:
            # one FILE per replica: Spark assigns parquet splits by byte
            # range, so a single file under maxPartitionBytes would run
            # every scan stage on ONE core regardless of row groups — a
            # directory of `reps` files parallelizes the sweep's doc/text
            # kernels the way any real multi-file dataset would
            cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]
            os.makedirs(dst, exist_ok=True)
            for i in range(reps):
                sel = ", ".join(
                    f"CAST(t.{c} + {i * SHIFT} AS BIGINT) AS {c}" if c in keys
                    else f"t.{c}"
                    for c in cols
                )
                con.sql(
                    f"COPY (SELECT {sel} FROM {src} t) TO "
                    f"'{dst}/part-{i:02d}.parquet' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE 16384)"
                )
            n = con.sql(f"SELECT count(*) FROM '{dst}/*.parquet'").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


if __name__ == "__main__":
    main()

"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares with the
DuckDB oracle: row count, column names, and order-insensitive values
(columns sorted by name, rows sorted by all columns). Exact comparison for
ints/strings/timestamps; floats compared exactly first, with a fallback
report of max abs diff so near-misses are diagnosable.

Results larger than ``--agg-over`` rows (default 5,000,000) switch to an
AGGREGATE-HASH compare — count + order-insensitive row-hash sum, with the
Spark side hashed executor-side via mapInPandas so the driver never
collects the result — which verifies ANY result size (the r11 sf1 sweep's
one exclusion was a driver-collect limit, not an operator limit). Both
sides render rows through the SAME Python canonicalizer, so there is no
cross-engine formatting divergence by construction.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
       [--json out.json] [--restart-every N] [--agg-over N]
"""

from __future__ import annotations

import sys
import traceback

import duckdb
import numpy as np
import pandas as pd

AGG_OVER_DEFAULT = 5_000_000
_HASH_MOD = 1 << 61


def load_oracle(con, sql: str) -> pd.DataFrame:
    return con.sql(sql).df()


def canon_row_strings(pdf: pd.DataFrame) -> pd.Series:
    """One canonical string per row: columns sorted by name, values
    rendered by VALUE (1.0 and 1 render '1'; nulls render ''), joined
    with an unlikely separator. Shared verbatim by the Spark executors
    and the oracle side, so both engines canonicalize identically."""

    def render(col: pd.Series) -> pd.Series:
        if pd.api.types.is_float_dtype(col):
            def rf(v):
                if pd.isna(v):
                    return ""
                f = float(v)
                if f.is_integer() and abs(f) < 2**53:
                    return str(int(f))
                return repr(f)

            return col.map(rf)
        if pd.api.types.is_integer_dtype(col):
            return col.astype("int64").astype(str)
        if pd.api.types.is_bool_dtype(col):
            return col.map(lambda v: "" if pd.isna(v) else str(bool(v)))
        return col.map(
            lambda v: ""
            if v is None or (isinstance(v, float) and pd.isna(v))
            else str(v)
        )

    parts = [render(pdf[c]).astype(str) for c in sorted(pdf.columns)]
    out = parts[0]
    for p in parts[1:]:
        out = out + "\x1f" + p
    return out


def hash_stats(pdf: pd.DataFrame) -> tuple[int, int]:
    """(row_count, order-insensitive row-hash sum mod 2^61)."""
    if len(pdf) == 0:
        return 0, 0
    h = pd.util.hash_pandas_object(canon_row_strings(pdf), index=False)
    # int() BEFORE the mod: numpy promotes uint64 % python-int to float64,
    # which silently rounds above 2^53
    return len(pdf), int(h.to_numpy().sum(dtype=np.uint64)) % _HASH_MOD


def spark_hash_stats(df) -> tuple[int, int, list[str]]:
    """hash_stats computed executor-side: the driver sees one tiny row
    per Arrow batch, never the result itself — any result size verifies."""

    def per_batch(batches):
        for pdf in batches:
            n, h = hash_stats(pdf)
            yield pd.DataFrame({"n": [n], "h": [h]})

    parts = df.mapInPandas(per_batch, schema="n long, h long").collect()
    n = sum(r["n"] for r in parts)
    h = sum(r["h"] for r in parts) % _HASH_MOD
    return n, h, df.columns


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems = []
    if len(sdf) != len(odf):
        problems.append(f"row count {len(sdf)} vs oracle {len(odf)}")
    scols, ocols = sorted(sdf.columns), sorted(odf.columns)
    if scols != ocols:
        problems.append(f"columns {scols} vs oracle {ocols}")
        return problems
    if problems:
        return problems
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        try:
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
                svf = pd.to_numeric(sv, errors="coerce").astype(float)
                ovf = pd.to_numeric(ov, errors="coerce").astype(float)
                neq = ~((svf == ovf) | (svf.isna() & ovf.isna()))
                if neq.any():
                    mx = (svf[neq] - ovf[neq]).abs().max()
                    problems.append(
                        f"col {c}: {int(neq.sum())} value mismatches (max abs diff {mx:.3e})"
                    )
            else:
                sv2, ov2 = sv.astype(str), ov.astype(str)
                neq = sv2 != ov2
                if neq.any():
                    i = neq.idxmax()
                    problems.append(
                        f"col {c}: {int(neq.sum())} mismatches e.g. row {i}: "
                        f"{sv2[i]!r} vs {ov2[i]!r} (dtypes {sv.dtype}/{ov.dtype})"
                    )
        except Exception as e:  # noqa: BLE001
            problems.append(f"col {c}: compare error {e}")
    # dtype-class check (driver hashes values with types)
    for c in s.columns:
        sk, ok = s[c].dtype.kind, o[c].dtype.kind
        num = {"i", "u", "f"}
        if sk != ok and not (sk in num and ok in num and sk == ok):
            if {sk, ok} <= {"i", "u"}:
                continue
            if sk != ok:
                problems.append(f"col {c}: dtype kind {s[c].dtype} vs oracle {o[c].dtype}")
    return problems


def main() -> None:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    restart_every = 0
    if "--restart-every" in argv:
        i = argv.index("--restart-every")
        restart_every = int(argv[i + 1])
        del argv[i : i + 2]
    agg_over = AGG_OVER_DEFAULT
    if "--agg-over" in argv:
        i = argv.index("--agg-over")
        agg_over = int(argv[i + 1])  # 0 disables the aggregate-hash mode
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from engine_spark.session import get_spark

    spark = get_spark("correctness")
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        # a table may be a single parquet file (the driver's testdata) or
        # a DIRECTORY of part files (tools/make_scaled_testdata.py writes
        # one file per replica so Spark scans parallelize); DuckDB needs
        # the glob form for directories
        import os as _os

        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if _os.path.isdir(p) else p
        con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{src}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    n_run = 0
    snapshot: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if restart_every and n_run and n_run % restart_every == 0:
            # long full-registry sweeps accumulate python-worker memory
            # across ~40+ pandas-UDF queries (observed: a worker crash
            # mid-sf0.1-sweep that vanished on a fresh session); recycle
            # the JVM+workers so one command can run the whole registry
            spark.stop()
            spark = get_spark("correctness")
            spark.sparkContext.setLogLevel("ERROR")
            print(f"-- session recycled after {n_run} queries --")
        n_run += 1
        sdf = None
        agg_stats_spark = None
        df = None
        try:
            df = fn(spark, sf_dir)
            if agg_over and name in oracles:
                # persist so the size probe and the compare share ONE
                # computation; MEMORY_AND_DISK spills huge results
                # instead of recomputing or OOMing
                df = df.persist()
                n_spark = df.count()
                if n_spark > agg_over:
                    agg_stats_spark = spark_hash_stats(df)
                else:
                    sdf = df.toPandas()
            else:
                sdf = df.toPandas()
        except Exception:
            print(f"ERR  {name}: spark side crashed")
            traceback.print_exc(limit=3)
            n_fail += 1
            snapshot[name] = {"pass": False, "err": "spark side crashed"}
            continue
        finally:
            if df is not None:
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 - never-persisted df
                    pass
        if agg_stats_spark is not None:
            sn, sh, scols = agg_stats_spark
            try:
                odf = load_oracle(con, oracles[name])
            except Exception as e:  # noqa: BLE001
                print(f"ERR  {name}: oracle crashed: {e}")
                n_fail += 1
                snapshot[name] = {"pass": False, "err": f"oracle crashed: {e}"}
                continue
            on, oh = hash_stats(odf)
            problems = []
            if sorted(scols) != sorted(odf.columns):
                problems.append(
                    f"columns {sorted(scols)} vs oracle {sorted(odf.columns)}"
                )
            if sn != on:
                problems.append(f"row count {sn} vs oracle {on}")
            if not problems and sh != oh:
                problems.append(f"value hash {sh} vs oracle {oh}")
            snapshot[name] = {
                "pass": not problems,
                "spark_rows": sn,
                "oracle_rows": on,
                "mode": "agg-hash",
                "err": "; ".join(problems) or None,
            }
            if problems:
                print(f"FAIL {name} [agg-hash]: " + "; ".join(problems))
                n_fail += 1
            else:
                print(f"pass {name} ({sn} rows, agg-hash)")
                n_pass += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(sdf)} rows (no oracle)")
            n_rows_only += 1
            snapshot[name] = {
                "pass": None, "spark_rows": len(sdf), "err": None,
                "note": "rows-only (no SQL-expressible oracle)",
            }
            continue
        try:
            odf = load_oracle(con, oracles[name])
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: oracle crashed: {e}")
            n_fail += 1
            snapshot[name] = {"pass": False, "err": f"oracle crashed: {e}"}
            continue
        problems = compare(name, sdf, odf)
        snapshot[name] = {
            "pass": not problems,
            "spark_rows": len(sdf),
            "oracle_rows": len(odf),
            "err": "; ".join(problems) or None,
        }
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"pass {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "results": snapshot}, f, indent=1)
        print(f"snapshot written to {json_out}")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

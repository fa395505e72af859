#!/usr/bin/env python
"""CLI runner: execute an EventFlux-SQL application file on Spark.

The reference's binary (run_eventflux.rs:20-42): ``run_eventflux <file.sql>
[-c config.yaml] [--set k=v]`` — parse, build runtime, run until Ctrl-C.
Spark-first equivalent, submittable via ``spark-submit run_app.py …``::

    python run_app.py app.sql \\
        -c config.yaml \\
        --register "events=/root/testdata/sf0.01/events.parquet:ts" \\
        --set spark.sql.shuffle.partitions=64 \\
        --show 20

config.yaml keys (all optional)::

    spark:                      # conf key → value (reference loader.rs)
      spark.sql.shuffle.partitions: "64"
    streams:                    # name → {path: …, ts_col: …}
      events: {path: /data/events.parquet, ts_col: ts}
    output: console | parquet:/path | filequeue:/path | count

Batch mode runs every INSERT INTO query and materializes outputs; a query
whose source stream is a streaming source (WITH type=source) starts a
streaming query instead and runs until interrupted.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("sql_file", help="EventFlux-SQL application file")
    p.add_argument("-c", "--config", help="YAML config file")
    p.add_argument(
        "--set", action="append", default=[], metavar="K=V",
        help="Spark conf override (repeatable)",
    )
    p.add_argument(
        "--register", action="append", default=[], metavar="NAME=PATH[:TS_COL]",
        help="bind a parquet path as an input stream (repeatable)",
    )
    p.add_argument("--show", type=int, default=20, help="rows to print per output")
    p.add_argument(
        "--agg", action="append", default=[], metavar="NAME=PER",
        help="materialize a CREATE AGGREGATION cascade at one granularity "
        "as an output (e.g. --agg Agg=minute); repeatable",
    )
    p.add_argument("--master", default=None, help="Spark master override")
    p.add_argument(
        "-e", "--extension", action="append", default=[], metavar="MODULE",
        help="plugin module with a register() hook (reference: -e ext.so); "
        "repeatable",
    )
    return p.parse_args(argv)


def load_config(path: str | None) -> dict:
    if not path:
        return {}
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def main(argv=None, stop: bool = True) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    cfg = load_config(args.config)

    conf = dict(cfg.get("spark", {}))
    for kv in args.set:
        k, _, v = kv.partition("=")
        conf[k] = v

    from engine_spark.session import get_spark

    spark = get_spark("run_app", master=args.master, extra_conf=conf)
    spark.sparkContext.setLogLevel("WARN")

    from engine_spark.extensions import load_plugin

    for mod in args.extension:
        load_plugin(mod)

    from engine_spark.plans import SqlApp

    app = SqlApp(spark)
    streams = dict(cfg.get("streams", {}))
    for reg in args.register:
        name, _, rest = reg.partition("=")
        path, _, ts_col = rest.partition(":")
        streams[name] = {"path": path, "ts_col": ts_col or None}
    for name, spec in streams.items():
        df = spark.read.parquet(spec["path"])
        app.register_stream(name, df, ts_col=spec.get("ts_col"))

    with open(args.sql_file) as f:
        outputs = app.sql(f.read())

    for spec in args.agg:
        aname, _, per = spec.partition("=")
        outputs[f"{aname}_{per}"] = app.aggregation_data(aname, per=per)

    sink = str(cfg.get("output", "console"))
    scheme, _, sink_base = sink.partition(":")  # console|count have no base
    for name, df in outputs.items():
        if df.isStreaming:
            if scheme == "filequeue":
                # durable exactly-once sink: epochs land as idempotent
                # segments (see sources/filequeue.py for the crash contract)
                from engine_spark.sources.filequeue import file_queue_writer

                root = f"{sink_base}/{name}"
                print(f"[{name}] streaming query → filequeue {root} (Ctrl-C to stop)")
                q = file_queue_writer(
                    df, root, checkpoint=f"{root}/_checkpoint"
                ).start()
            elif scheme == "parquet":
                dest = f"{sink_base}/{name}"
                print(f"[{name}] streaming query → parquet {dest} (Ctrl-C to stop)")
                q = (
                    df.writeStream.format("parquet")
                    .option("path", dest)
                    .option("checkpointLocation", f"{dest}/_checkpoint")
                    .outputMode("append")
                    .start()
                )
            elif scheme == "count":
                raise ValueError(
                    "output: count is batch-only; streaming queries support "
                    "console, parquet:, or filequeue: sinks"
                )
            else:
                print(f"[{name}] streaming query → console (Ctrl-C to stop)")
                q = df.writeStream.format("console").outputMode("append").start()
            q.awaitTermination()
        elif scheme == "filequeue":
            import os as _os

            from engine_spark.sources.filequeue import FileQueue

            root = f"{sink_base}/{name}"
            fq = FileQueue(root)
            # each batch run appends the NEXT epoch (rerunning must not
            # silently no-op against the already-committed epoch 0). Batch
            # epochs live in their own 'batch-' namespace so a later
            # STREAMING run on the same root (whose Spark epochs restart at
            # 0) never mistakes a batch segment for its own crash replay.
            epoch = sum(
                1 for d in _os.listdir(fq.segments) if d.startswith("batch-")
            )
            if fq.publish_epoch_distributed(df, epoch, prefix="batch-"):
                print(f"[{name}] written as epoch {epoch} under {root}")
            else:  # pragma: no cover - concurrent writer race
                print(f"[{name}] epoch {epoch} already committed; nothing written")
        elif scheme == "count":
            print(f"[{name}] {df.count()} rows")
        elif scheme == "parquet":
            dest = f"{sink_base}/{name}"
            df.write.mode("overwrite").parquet(dest)
            print(f"[{name}] written to {dest}")
        else:
            print(f"[{name}]")
            df.show(args.show, truncate=False)
    if stop:  # in-process callers (tests) share the session: stop=False
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

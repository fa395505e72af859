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

Streaming corpus indexing mode (no SQL file) maintains the exactly-once
incremental BM25 postings store and answers queries from it::

    python run_app.py --index-stream /data/drops \\
        --index-state /shared/bm25_index \\
        --index-query "spark cluster;training data" \\
        --index-compact-every 100

Streaming vector indexing mode (no SQL file) maintains the persisted
IVF index exactly-once (first batch trains + builds; later batches are
frozen-codebook ingest epochs) and searches it::

    python run_app.py --vector-stream /data/vec_drops \\
        --vector-state /shared/ivf_index \\
        --vector-compact-every 100 --vector-query 3

Streaming corpus dedup mode (no SQL file) drives the exactly-once
segment-dedup pipeline end-to-end::

    python run_app.py --dedup-stream /data/drops \\
        --dedup-state /shared/dedup_state --dedup-out /data/clean \\
        --dedup-compact-every 100

Each parquet file landing in the drop dir becomes a micro-batch: its
documents' segments dedup against the durable Bloom store (first
occurrence wins across ALL prior epochs), the deduped docs publish
atomically as ``epoch-N/`` under the output dir, and every N epochs the
store compacts its per-batch state dirs behind the newest epoch. Crash
at any point and rerun: replayed epochs reproduce their answers and
republish nothing.
"""

from __future__ import annotations

import argparse
import sys


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "sql_file", nargs="?", default=None,
        help="EventFlux-SQL application file (omit in --dedup-stream mode)",
    )
    # --- streaming corpus dedup mode (no SQL file): watch a directory of
    # document parquet drops, dedup segments against a durable Bloom
    # store exactly-once, publish per-epoch parquet outputs ---
    p.add_argument(
        "--dedup-stream", metavar="IN_DIR",
        help="streaming segment dedup over parquet files landing in IN_DIR "
        "(schema: doc_id long, text string); runs availableNow and exits",
    )
    p.add_argument(
        "--dedup-state", metavar="DIR",
        help="BloomDedupStore state dir (shared storage, checkpoint-grade)",
    )
    p.add_argument(
        "--dedup-out", metavar="DIR",
        help="output dir; each micro-batch publishes epoch-N/ atomically",
    )
    p.add_argument(
        "--dedup-checkpoint", metavar="DIR", default=None,
        help="stream checkpoint (default: <dedup-state>/_checkpoint)",
    )
    p.add_argument(
        "--dedup-paragraphs", action="store_true",
        help="dedup blank-line paragraphs instead of fixed token windows",
    )
    p.add_argument(
        "--dedup-compact-every", type=int, default=0, metavar="N",
        help="compact the Bloom store's epoch dirs every N epochs "
        "(watermark = current epoch - 1, so the newest replayable epoch "
        "is never touched); 0 disables. Cadence guidance: state dirs "
        "grow one per micro-batch, so pick N around the point where "
        "listing cost matters — e.g. 100 for minute-level triggers",
    )
    # --- streaming corpus indexing mode (no SQL file): watch a directory
    # of document parquet drops, maintain the incremental BM25 postings
    # store exactly-once, optionally answer queries after draining ---
    p.add_argument(
        "--index-stream", metavar="IN_DIR",
        help="streaming BM25 indexing over parquet files landing in IN_DIR "
        "(schema: doc_id long, text string); runs availableNow and exits",
    )
    p.add_argument(
        "--index-state", metavar="DIR",
        help="IncrementalBM25Index state dir (shared storage)",
    )
    p.add_argument(
        "--index-checkpoint", metavar="DIR", default=None,
        help="stream checkpoint (default: <index-state>/_checkpoint)",
    )
    p.add_argument(
        "--index-query", metavar="Q", default=None,
        help="after draining, run BM25 queries against the accumulated "
        "index and print the top hits; ';' separates queries, spaces "
        "separate terms (e.g. 'spark cluster;training data')",
    )
    p.add_argument(
        "--index-compact-every", type=int, default=0, metavar="N",
        help="compact the postings store's epoch dirs every N epochs "
        "(watermark = current epoch - 1); 0 disables",
    )
    # --- streaming vector indexing mode (no SQL file): watch a directory
    # of embedding parquet drops, maintain the persisted IVF index
    # exactly-once (first batch trains + builds, later batches ingest
    # frozen-codebook epochs), optionally search after draining ---
    p.add_argument(
        "--vector-stream", metavar="IN_DIR",
        help="streaming IVF indexing over parquet files landing in IN_DIR "
        "(schema: vec_id long, embedding array<float>); runs availableNow "
        "and exits",
    )
    p.add_argument(
        "--vector-state", metavar="DIR",
        help="persisted IVF index dir (shared storage)",
    )
    p.add_argument(
        "--vector-checkpoint", metavar="DIR", default=None,
        help="stream checkpoint (default: <vector-state>/_checkpoint)",
    )
    p.add_argument(
        "--vector-compact-every", type=int, default=0, metavar="N",
        help="compact the index's ingest-epoch dirs every N epochs "
        "(watermark = current epoch - 1); 0 disables",
    )
    p.add_argument(
        "--vector-query", type=int, default=0, metavar="N",
        help="after draining, run top-k cosine search for the index's "
        "first N vectors and print the hits",
    )
    p.add_argument(
        "--vector-cells", type=int, default=8, metavar="K",
        help="IVF cell count trained on the first batch (default 8)",
    )
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
        "--metrics-port", type=int, default=None, metavar="PORT",
        help="serve a Prometheus /metrics endpoint over streaming-query "
        "progress on this port (0 = any free port; printed at startup)",
    )
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


def run_dedup_stream(spark, args) -> int:
    """Streaming corpus segment dedup, drivable end-to-end from the CLI —
    the streaming twin of the batch ``dedup_segments`` operator.

    Per micro-batch (Spark's epoch id keys everything): segments dedup
    against the durable BloomDedupStore (exactly-once: a crash-replayed
    epoch reads only strictly-earlier state and reproduces its answer),
    then the batch's deduped documents publish atomically as
    ``<out>/epoch-N/`` (stage + no-overwrite rename — a replay finds the
    dir and skips). Compaction cadence: with ``--dedup-compact-every N``
    the store merges all state dirs at or below ``epoch-1`` every N
    epochs, keeping state-dir count O(N) instead of one-per-batch; the
    newest epoch is never compacted (the stream may still replay it).
    """
    import uuid as _uuid

    from engine_spark.datapipe.bloom import BloomDedupStore
    from engine_spark.datapipe.segments import dedup_segments_stream
    from engine_spark.fsio import HadoopFS

    if not args.dedup_state or not args.dedup_out:
        raise SystemExit("--dedup-stream requires --dedup-state and --dedup-out")
    in_dir, out_dir = args.dedup_stream, args.dedup_out.rstrip("/")
    # the parquet stream source needs an explicit schema: take it from
    # the files already landed (the drop dir defines the contract)
    schema = spark.read.parquet(in_dir).schema
    store = BloomDedupStore(spark, args.dedup_state, normalize=False)
    fs = HadoopFS(spark, out_dir)
    every = args.dedup_compact_every

    def sink(batch_df, epoch_id):
        final = f"{out_dir}/epoch-{int(epoch_id):010d}"
        if fs.exists(final):
            # crash replay of a fully-published epoch: the state publish
            # always PRECEDES the output publish, so an existing output
            # dir implies the store epoch is durable too — skip the
            # whole recompute (hashing, ranking, Bloom probe), not just
            # the write
            print(f"[dedup-stream] epoch {epoch_id} already published (replay)")
        else:
            out = dedup_segments_stream(
                store, batch_df, epoch_id, paragraphs=args.dedup_paragraphs
            )
            staging = f"{out_dir}/_staging/e{_uuid.uuid4().hex}"
            out.write.mode("overwrite").parquet(staging)
            if fs.rename(staging, final):
                print(f"[dedup-stream] epoch {epoch_id} → {final}")
            else:  # lost a publish race: retire our copy
                fs.delete(staging)
        # compaction runs on the replay path too: a crash between the
        # output publish and the compact would otherwise defer state
        # cleanup to the next cadence multiple
        if every and epoch_id and epoch_id % every == 0:
            try:
                merged = store.compact(epoch_id - 1)
                if merged:
                    print(
                        f"[dedup-stream] compacted {merged} state epochs "
                        f"<= {epoch_id - 1}"
                    )
            except ValueError as e:
                # ONLY the replayed-batch case is a benign no-op (the -c
                # dir already exists). Any other ValueError — a stale
                # watermark after a checkpoint rebuild restarts epoch ids
                # — means compaction is silently never running: surface
                # it instead of discarding (same narrowing as the
                # index-stream sink below — VERDICT r10 finding #1).
                if "already compacted" in str(e):
                    pass
                else:
                    print(f"[dedup-stream] compaction skipped: {e}")

    q = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            args.dedup_checkpoint
            or f"{args.dedup_state.rstrip('/')}/_checkpoint",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return 0


def run_index_stream(spark, args) -> int:
    """Streaming BM25 corpus indexing, drivable end-to-end from the CLI —
    the incremental face of the ``search_bm25`` operator.

    Per micro-batch (Spark's epoch id keys the store): the batch's
    documents tokenize into one exactly-once postings epoch
    (term-hash-bucket partitioned; a crash-replayed epoch is a no-op).
    After the stream drains, ``--index-query`` runs BM25 against the
    ENTIRE accumulated index — postings pruned to the query terms'
    buckets at the parquet scan. Compaction cadence mirrors
    ``--dedup-compact-every``: state-dir count stays O(N), and the
    newest replayable epoch is never touched.
    """
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    if not args.index_state:
        raise SystemExit("--index-stream requires --index-state")
    in_dir = args.index_stream
    # the contract is fixed (see --help) — a literal schema lets the
    # service start BEFORE the first document lands (batch-inferring from
    # the drop dir would crash on an empty directory)
    schema = "doc_id long, text string"
    idx = IncrementalBM25Index(spark, args.index_state)
    every = args.index_compact_every

    def sink(batch_df, epoch_id):
        idx.add_batch(batch_df, epoch_id)
        print(f"[index-stream] epoch {epoch_id} committed")
        if every and epoch_id and epoch_id % every == 0:
            try:
                merged = idx.compact(epoch_id - 1)
                if merged:
                    print(
                        f"[index-stream] compacted {merged} postings epochs "
                        f"<= {epoch_id - 1}"
                    )
            except ValueError as e:
                # ONLY the replayed-batch case is a benign no-op (the -c
                # dir already exists). Any other ValueError — a phantom or
                # stale watermark after a checkpoint rebuild restarts
                # epoch ids — means compaction is silently never running:
                # surface it instead of discarding (ADVICE r10).
                if "already compacted" in str(e):
                    pass
                else:
                    print(f"[index-stream] compaction skipped: {e}")

    q = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            args.index_checkpoint
            or f"{args.index_state.rstrip('/')}/_checkpoint",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if args.index_query:
        pairs = [
            (qi, term)
            for qi, q_str in enumerate(args.index_query.split(";"))
            for term in q_str.split()
        ]
        qdf = spark.createDataFrame(pairs, "q_id INT, term STRING")
        hits = idx.search(qdf, topk=args.show)
        for row in hits.orderBy("q_id", "rnk").collect():
            print(
                f"[index-query] q{row['q_id']} #{row['rnk']}: "
                f"doc {row['doc_id']} score {row['score']}"
            )
    return 0


def run_vector_stream(spark, args) -> int:
    """Streaming vector (embedding) indexing, drivable end-to-end from
    the CLI — the live-ingest face of the persisted IVF index, completing
    the store triad (--dedup-stream: Bloom, --index-stream: BM25).

    Per micro-batch (Spark's epoch id keys everything): the FIRST batch
    trains the codebook and publishes the base build (a replay of that
    epoch is detected via a _base_epoch sidecar and skipped); every later
    batch lands as one exactly-once cell-partitioned ingest epoch under
    the frozen codebook. With ``--vector-compact-every N`` the ingest
    epochs merge behind the newest epoch on the shared EpochLog
    publish-then-shadow contract, keeping state-dir count O(N). After the
    stream drains, ``--vector-query N`` searches the accumulated index
    with the scan pruned to the probed cells.
    """
    import json as _json

    from engine_spark.datapipe.ivf import (
        ivf_index_add_batch,
        ivf_index_build,
        ivf_index_compact,
        ivf_index_search,
        ivf_index_vacuum,
    )
    from engine_spark.fsio import HadoopFS

    if not args.vector_state:
        raise SystemExit("--vector-stream requires --vector-state")
    in_dir = args.vector_stream
    path = args.vector_state.rstrip("/")
    fs = HadoopFS(spark, path)
    schema = spark.read.parquet(in_dir).schema
    dim = None
    every = args.vector_compact_every

    def sink(batch_df, epoch_id):
        nonlocal dim
        if dim is None:
            row = batch_df.select("embedding").first()
            dim = len(row["embedding"]) if row is not None else 0
        if not fs.exists(f"{path}/codebook.json"):
            if batch_df.isEmpty():
                print(f"[vector-stream] epoch {epoch_id} empty before build")
                return
            # marker FIRST: a crash between build and marker would leave
            # codebook.json without the sidecar and wedge every replay at
            # the read below; writing it before the build is idempotent
            # (a crash before the build just rebuilds and overwrites)
            fs.write_bytes(
                f"{path}/_base_epoch.json",
                _json.dumps({"epoch": int(epoch_id)}).encode(),
            )
            ivf_index_build(
                spark, batch_df, path,
                full_dim=dim, cell_dim=min(16, dim),
                k=args.vector_cells, iters=3,
            )
            print(f"[vector-stream] epoch {epoch_id} trained + built base")
            return
        # an index pre-built OUTSIDE the stream has no sidecar: treat the
        # missing marker as "no stream epoch is the base" instead of
        # crashing unrecoverably
        base = (
            _json.loads(fs.read_bytes(f"{path}/_base_epoch.json").decode())
            ["epoch"]
            if fs.exists(f"{path}/_base_epoch.json")
            else -1
        )
        if epoch_id == base:
            print(f"[vector-stream] epoch {epoch_id} is the base build (replay)")
            return
        ivf_index_add_batch(spark, batch_df, path, epoch_id)
        print(f"[vector-stream] epoch {epoch_id} committed")
        # compaction cadence mirrors --index-stream; the watermark must
        # name an INGESTED epoch, so skip the cadence tick whose
        # watermark falls on the base-build epoch (not an epoch dir)
        if every and epoch_id and epoch_id % every == 0 and epoch_id - 1 != base:
            try:
                merged = ivf_index_compact(spark, path, epoch_id - 1,
                                           vacuum=False)
                reclaimed = ivf_index_vacuum(spark, path)
                if merged:
                    print(
                        f"[vector-stream] compacted {merged} ingest epochs "
                        f"<= {epoch_id - 1} (vacuumed {reclaimed})"
                    )
            except ValueError as e:
                # ONLY the replayed-watermark case is benign; surface
                # anything else (same narrowing as the other stream sinks)
                if "already compacted" in str(e):
                    pass
                else:
                    print(f"[vector-stream] compaction skipped: {e}")

    q = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .writeStream.foreachBatch(sink)
        .option(
            "checkpointLocation",
            args.vector_checkpoint or f"{path}/_checkpoint",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    if args.vector_query:
        hits = ivf_index_search(
            spark, path, n_queries=args.vector_query, nprobe=2, topk=3
        )
        for row in hits.orderBy("q_id", "rnk").collect():
            print(
                f"[vector-query] q{row['q_id']} #{row['rnk']}: "
                f"vec {row['cand_id']} cos {row['cos_sim']:.6f}"
            )
    return 0


def main(argv=None, stop: bool = True) -> int:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    cfg = load_config(args.config)

    conf = dict(cfg.get("spark", {}))
    for kv in args.set:
        k, _, v = kv.partition("=")
        conf[k] = v

    from engine_spark.session import get_spark

    spark = get_spark("run_app", master=args.master, extra_conf=conf)
    metrics = None
    if args.metrics_port is not None:
        from engine_spark.observability import start_metrics

        metrics = start_metrics(spark, port=args.metrics_port)
        print(f"[metrics] serving /metrics on port {metrics.port}")
    def _teardown():
        if metrics is not None:
            metrics.stop()
        if stop:
            spark.stop()

    if args.dedup_stream:
        try:
            return run_dedup_stream(spark, args)
        finally:
            _teardown()
    if args.index_stream:
        try:
            return run_index_stream(spark, args)
        finally:
            _teardown()
    if args.vector_stream:
        try:
            return run_vector_stream(spark, args)
        finally:
            _teardown()
    if not args.sql_file:
        raise SystemExit(
            "sql_file is required unless --dedup-stream/--index-stream/"
            "--vector-stream is given"
        )
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
    if metrics is not None:
        metrics.stop()  # per-run endpoint (the session may be shared)
    if stop:  # in-process callers (tests) share the session: stop=False
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Source/sink registry keyed by the reference's extension names.

``create_source(spark, options)`` consumes a ``WITH(...)`` option dict
(with_clause.rs semantics: 'type', 'extension', 'format', plus
extension-specific keys) and returns a streaming DataFrame; a 'format'
option chains the matching mapper.

| extension  | reference                      | Spark binding                  |
|------------|--------------------------------|--------------------------------|
| timer      | timer_source.rs (counter/N ms) | rate / rate-micro-batch source |
| websocket  | websocket_source.rs            | RFC 6455 Python Data Source    |
| file       | (planned in reference)         | file stream source             |
| memory     | InputHandler (programmatic)    | StreamRunner harness dir       |
| rabbitmq   | rabbitmq_source.rs (1,150 LoC) | AMQP 0-9-1 Python Data Source  |
| log (sink) | log_sink.rs                    | console writer                 |
| callback   | callback_processor.rs          | foreachBatch                   |
| memory(sink)| in-process subscriber         | memory sink (queryable table)  |
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from engine_spark.sources.mappers import map_in


# ---------------------------------------------------------------------------
# sources
# ---------------------------------------------------------------------------

def _timer(spark: SparkSession, opts: dict) -> DataFrame:
    """timer source: one counter event every interval (timer_source.rs).
    rate source columns: timestamp, value — same shape as the reference's
    (timestamp, counter) events."""
    rows = int(opts.get("events.per.second", opts.get("rate", "1")))
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows)
        .load()
    )


def _socket(spark: SparkSession, opts: dict) -> DataFrame:
    """line-per-event over a raw TCP socket (Spark's built-in socket
    source); kept alongside the real WS-framed source below."""
    return (
        spark.readStream.format("socket")
        .option("host", opts.get("host", "localhost"))
        .option("port", int(opts.get("port", "9999")))
        .load()
    )


def _websocket(spark: SparkSession, opts: dict) -> DataFrame:
    """real RFC 6455 WebSocket source (sources/websocket.py): stdlib
    handshake + framing behind a PySpark Python Data Source stream reader
    (reference websocket_source.rs:906 — spec only)."""
    from engine_spark.sources.websocket import ws_source

    return ws_source(spark, opts)


def _file(spark: SparkSession, opts: dict) -> DataFrame:
    schema = opts.get("schema")
    if not schema:
        raise ValueError("file source needs a 'schema' option")
    fmt = opts.get("file.format", "json")
    reader = spark.readStream.schema(schema)
    if "max.files.per.trigger" in opts:
        reader = reader.option("maxFilesPerTrigger", opts["max.files.per.trigger"])
    return getattr(reader, fmt)(opts["path"])


def _memory(spark: SparkSession, opts: dict) -> DataFrame:
    """programmatic InputHandler equivalent — a StreamRunner-managed
    directory (see streaming/harness.py)."""
    return _file(spark, {**opts, "file.format": opts.get("file.format", "json")})


def _rabbitmq(spark: SparkSession, opts: dict) -> DataFrame:
    """real AMQP 0-9-1 source (sources/amqp.py): stdlib wire protocol
    behind a PySpark Python Data Source stream reader; manual-ack
    at-least-once, acked on batch commit (reference rabbitmq_source.rs
    ~1,150 LoC — spec only)."""
    from engine_spark.sources.amqp import amqp_source

    return amqp_source(spark, opts)


def _kafka(spark: SparkSession, opts: dict) -> DataFrame:
    """real Kafka wire-protocol source (sources/kafka.py): Metadata/
    Fetch/ListOffsets from the public protocol spec behind a PySpark
    Python Data Source; EXACTLY-once via per-partition offsets in the
    streaming checkpoint (the reference lists Kafka as planned-only,
    MILESTONES.md:183-205 — beyond-reference surface)."""
    from engine_spark.sources.kafka import kafka_source

    if opts.get("format") == "avro" and "value.deserializer" not in opts:
        # Avro payloads are binary: a utf-8 string round-trip corrupts
        # them, so the schema'd-binary default is faithful bytes
        opts = {**opts, "value.deserializer": "binary"}
    return kafka_source(spark, opts)


def _http(spark: SparkSession, opts: dict) -> DataFrame:
    """real HTTP source (sources/http.py): webhook receiver or REST
    poller behind a PySpark Python Data Source (the reference lists the
    HTTP connector as planned-only, MILESTONES.md M4)."""
    from engine_spark.sources.http import http_source

    return http_source(spark, opts)


def _filequeue(spark: SparkSession, opts: dict) -> DataFrame:
    """durable replayable queue source (sources/filequeue.py) — the
    broker-parity extension: publish/ack semantics via segment files +
    checkpoint offsets."""
    from engine_spark.sources.filequeue import FileQueue

    schema = opts.get("schema")
    if not schema:
        raise ValueError("filequeue source needs a 'schema' option")
    mft = opts.get("max.files.per.trigger")
    return FileQueue(opts["path"]).stream(
        spark, schema, int(mft) if mft is not None else 1
    )


SOURCES: dict[str, Callable[[SparkSession, dict], DataFrame]] = {
    "timer": _timer,
    "websocket": _websocket,
    "socket": _socket,
    "file": _file,
    "memory": _memory,
    "rabbitmq": _rabbitmq,
    "kafka": _kafka,
    "http": _http,
    "filequeue": _filequeue,
}


def create_source_with_faults(
    spark: SparkSession, options: dict
) -> tuple[DataFrame, DataFrame | None]:
    """WITH(...)-driven source construction + mapper attach
    (with_clause.rs:38-135 → auto-attach eventflux_app_runtime.rs:995-1007)
    with ``'on.error'`` routing (reference stream_junction.rs:31-66
    OnErrorAction):

    - ``'log'`` (default): malformed payloads are dropped from the good
      stream and counted per batch through a named ``observe()`` metric
      (``on_error_<n>``) any QueryListener/batch observation can read —
      the Spark-native "log it, keep going" hook.
    - ``'drop'``: malformed payloads silently dropped.
    - ``'fault'`` / ``'stream'``: returns (good, faults) — the caller
      registers faults as ``<Stream>_fault`` (payload, error), queryable
      like any stream; sink it anywhere for a DLQ.
    - ``'store'``: not a separate mode here — compose the fault stream
      with any sink (parquet/filequeue) for a durable error store;
      raises with that guidance.
    """
    ext = options.get("extension")
    if ext not in SOURCES:
        raise KeyError(
            f"unknown source extension {ext!r}; registered: {sorted(SOURCES)}"
        )
    df = SOURCES[ext](spark, options)
    fmt = options.get("format")
    on_error = options.get("on.error", "log").lower()
    if on_error == "store":
        raise ValueError(
            "on.error='store': use on.error='fault' and sink the "
            "<Stream>_fault stream to parquet/filequeue for a durable "
            "error store (the reference's STORE is a built-in sink; "
            "Spark's model composes it from the fault stream)"
        )
    if on_error not in ("log", "drop", "fault", "stream"):
        raise ValueError(
            f"unknown on.error action {on_error!r} "
            "(log | drop | fault | stream)"
        )
    if not fmt or fmt == "native":
        return df, None
    from engine_spark.sources.mappers import map_in_split

    # log mode: per-batch (malformed, events) counts as an observation
    # metric named on_error_<stream> — surfaces via listeners/Observation
    # on batch and streaming alike, computed in the same pass
    obs = (
        f"on_error_{options.get('name', ext)}" if on_error == "log" else None
    )
    good, faults = map_in_split(
        fmt, df, schema=options.get("event.schema"), observe_name=obs
    )
    if faults is None or on_error in ("drop", "log"):
        return good, None
    return good, faults


def create_source(spark: SparkSession, options: dict) -> DataFrame:
    """create_source_with_faults, good rows only (compat surface)."""
    df, _ = create_source_with_faults(spark, options)
    return df


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------

def _console_writer(df: DataFrame, opts: dict):
    """log sink (log_sink.rs): println each output event."""
    return df.writeStream.format("console").option(
        "truncate", opts.get("truncate", "false")
    )


def _memory_writer(df: DataFrame, opts: dict):
    """callback/memory sink: results queryable as a table."""
    return df.writeStream.format("memory").queryName(
        opts.get("query.name", "out")
    )


def _foreach_batch_writer(df: DataFrame, opts: dict):
    fn = opts.get("callback")
    if fn is None:
        raise ValueError("callback sink needs a 'callback' option (a function)")
    return df.writeStream.foreachBatch(fn)


def _rabbitmq_writer(df: DataFrame, opts: dict):
    """real AMQP 0-9-1 sink (sources/amqp.py): per-partition executor-side
    connections, one basic.publish per row (reference rabbitmq_sink.rs
    ~892 LoC — spec only)."""
    from engine_spark.sources.amqp import amqp_sink_writer

    return amqp_sink_writer(df, opts)


def _websocket_writer(df: DataFrame, opts: dict):
    """real RFC 6455 WebSocket sink (sources/websocket.py): per-partition
    executor-side WS client connections pushing one JSON text frame per row
    (reference websocket_sink.rs:863 — spec only)."""
    from engine_spark.sources.websocket import ws_sink_writer

    return ws_sink_writer(df, opts)


def _kafka_writer(df: DataFrame, opts: dict):
    """real Kafka wire-protocol sink (sources/kafka.py): per-partition
    executor-side connections, rows batched into RecordBatch v2 and
    produced with acks=-1 (at-least-once)."""
    from engine_spark.sources.kafka import kafka_sink_writer

    return kafka_sink_writer(df, opts)


def _http_writer(df: DataFrame, opts: dict):
    """real HTTP sink (sources/http.py): executor-side POSTs (single
    rows or batch-request JSON arrays) with exponential-backoff retry."""
    from engine_spark.sources.http import http_sink_writer

    return http_sink_writer(df, opts)


def _filequeue_writer(df: DataFrame, opts: dict):
    """exactly-once queue sink (sources/filequeue.py): idempotent
    epoch-segment publish; re-delivered epochs after a crash are no-ops."""
    from engine_spark.sources.filequeue import file_queue_writer

    if "checkpoint" not in opts:
        raise ValueError("filequeue sink needs a 'checkpoint' option")
    return file_queue_writer(df, opts["path"], opts["checkpoint"])


SINKS: dict[str, Callable] = {
    "log": _console_writer,
    "console": _console_writer,
    "memory": _memory_writer,
    "callback": _foreach_batch_writer,
    "websocket": _websocket_writer,
    "rabbitmq": _rabbitmq_writer,
    "kafka": _kafka_writer,
    "http": _http_writer,
    "filequeue": _filequeue_writer,
}


def create_sink_writer(df: DataFrame, options: dict):
    ext = options.get("extension")
    if ext not in SINKS:
        raise KeyError(
            f"unknown sink extension {ext!r}; registered: {sorted(SINKS)}"
        )
    from engine_spark.sources.mappers import map_out

    fmt = options.get("format")
    if fmt and fmt != "native":
        df = map_out(fmt, df)
    return SINKS[ext](df, options)

"""Event mappers: payload ⇄ typed event columns.

Reference: json_mapper.rs (1,160 LoC), csv_mapper.rs, bytes_mapper.rs —
row-at-a-time byte parsing. Spark-first: each mapper is a pair of Catalyst
expressions over a ``value`` payload column (from_json / from_csv /
binary passthrough), so parsing is vectorized, codegen'd, and prunable —
a JSON field that isn't selected is never materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def json_in(df: DataFrame, schema: str, value_col: str = "value") -> DataFrame:
    """payload string/binary → typed columns (reference json_mapper.rs
    source direction, incl. field mapping via the schema's names)."""
    parsed = F.from_json(F.col(value_col).cast("string"), schema)
    return df.withColumn("_ev", parsed).select("_ev.*")


def json_out(df: DataFrame) -> DataFrame:
    """typed columns → one JSON string payload (sink direction)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def csv_in(
    df: DataFrame, schema: str, value_col: str = "value", sep: str = ","
) -> DataFrame:
    parsed = F.from_csv(
        F.col(value_col).cast("string"), schema, {"sep": sep}
    )
    return df.withColumn("_ev", parsed).select("_ev.*")


def csv_out(df: DataFrame, sep: str = ",") -> DataFrame:
    return df.select(
        F.concat_ws(sep, *[F.col(c).cast("string") for c in df.columns]).alias("value")
    )


def bytes_in(df: DataFrame, value_col: str = "value") -> DataFrame:
    """raw-bytes passthrough (reference bytes_mapper.rs): payload stays an
    opaque BINARY column."""
    return df.select(F.col(value_col).cast("binary").alias("payload"))


def bytes_out(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    return df.select(F.col(payload_col).cast("binary").alias("value"))


def avro_in(df: DataFrame, schema: str, value_col: str = "value") -> DataFrame:
    """Avro-encoded payload → typed columns. The reference ships no Avro
    mapper (json/csv/bytes only); real Kafka estates are Avro-heavy, so
    the binary codec is implemented from the public Apache Avro spec in
    sources/avro.py (Arrow-batched — per-record binary parsing is the
    regime that genuinely needs a Pandas UDF). ``schema`` here is the
    AVRO record schema JSON, not a Spark DDL string."""
    from engine_spark.sources.avro import avro_in as _ain

    return _ain(df, schema, value_col)


def avro_out(
    df: DataFrame, schema: str | None = None, value_col: str = "value"
) -> DataFrame:
    from engine_spark.sources.avro import avro_out as _aout

    return _aout(df, schema, value_col)


MAPPERS = {
    "json": (json_in, json_out),
    "csv": (csv_in, csv_out),
    "bytes": (bytes_in, bytes_out),
    "avro": (avro_in, avro_out),
}


def map_in(fmt: str, df: DataFrame, schema: str | None = None, **kw) -> DataFrame:
    fin, _ = MAPPERS[fmt.lower()]
    if fmt.lower() == "bytes":
        return fin(df, **kw)
    if schema is None:
        raise ValueError(f"{fmt} mapper needs a schema")
    return fin(df, schema, **kw)


def map_out(fmt: str, df: DataFrame, **kw) -> DataFrame:
    _, fout = MAPPERS[fmt.lower()]
    return fout(df, **kw)


#: the fault-stream row shape (reference stream_junction.rs:31-66
#: OnErrorAction + fault_stream_junction): the raw payload that failed
#: the mapper plus a diagnostic, queryable like any stream
FAULT_SCHEMA = "payload string, error string"


def map_in_split(
    fmt: str,
    df: DataFrame,
    schema: str | None = None,
    value_col: str = "value",
    observe_name: str | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Mapper with fault routing: → (good rows, fault rows | None).

    Spark-first split: instead of a per-row try/except loop, the parse
    runs once in PERMISSIVE mode with a corrupt-record column
    (from_json/from_csv keep malformed payloads in ``_corrupt``
    JVM-side), and good/fault are two filters over the same parsed
    column — vectorized, codegen'd, and computed in one pass per branch.
    A NULL payload is a fault too (the reference junction treats an
    unmappable event as an error event, stream_junction.rs:31).
    ``bytes`` is a total cast, so its fault branch is None.
    """
    f = fmt.lower()
    if f == "bytes":
        return bytes_in(df, value_col=value_col), None
    if f not in MAPPERS:
        raise KeyError(f"unknown mapper {fmt!r}")
    if schema is None:
        raise ValueError(f"{fmt} mapper needs a schema")
    if f == "avro":
        # Python-side decode: the fault split comes from the decode pass
        # itself (a _corrupt column), not from_json's PERMISSIVE mode;
        # observe_name attaches the same on_error_<n> (malformed, events)
        # metric json/csv get, so on.error='log' keeps its observability
        from engine_spark.sources.avro import avro_in_split

        return avro_in_split(
            df, schema, value_col=value_col, observe_name=observe_name
        )
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    full = f"{schema}, _corrupt STRING"
    raw = F.col(value_col).cast("string")
    parse = F.from_json(raw, full, opts) if f == "json" else F.from_csv(raw, full, opts)
    parsed = df.withColumn("_ev", parse)
    bad = F.col("_ev").isNull() | F.col("_ev._corrupt").isNotNull()
    if observe_name:
        # attached BEFORE the good/fault filters so the metric counts
        # malformed rows in the same pass the good branch consumes
        parsed = parsed.observe(
            observe_name,
            F.count_if(bad).alias("malformed"),
            F.count(F.lit(1)).alias("events"),
        )
    good = parsed.filter(~bad).select("_ev.*").drop("_corrupt")
    faults = parsed.filter(bad).select(
        raw.alias("payload"),
        F.when(F.col("_ev").isNull(), F.lit(f"{f} mapper: null payload"))
        .otherwise(F.lit(f"{f} mapper: malformed payload"))
        .alias("error"),
    )
    return good, faults

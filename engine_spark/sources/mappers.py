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


MAPPERS = {
    "json": (json_in, json_out),
    "csv": (csv_in, csv_out),
    "bytes": (bytes_in, bytes_out),
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

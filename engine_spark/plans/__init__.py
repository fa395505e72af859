"""EventFlux-SQL front-end: parse the reference dialect → DataFrame plans.

The reference's primary API is an extended streaming SQL (reference
src/sql_compiler/ — 6,891 LoC: normalization.rs regex-normalizes CREATE
STREAM, a forked sqlparser produces the AST, converter.rs:48-470 lowers to
the query_api object model). Here the same dialect lowers directly to
DataFrame plans built from engine_spark.operators — Catalyst replaces the
reference's executor-tree compiler (expression_parser.rs:185-640), so scalar
expressions are handed to Spark's own SQL analyzer via ``F.expr``.

Entry point::

    app = SqlApp(spark)
    app.register_stream("In", df, ts_col="ts")
    outs = app.sql(\"\"\"
        CREATE STREAM Out (v INT);
        INSERT INTO Out SELECT v FROM In WHERE v > 10;
    \"\"\")
    outs["Out"]  # DataFrame
"""

from engine_spark.plans.compiler import SqlApp  # noqa: F401
from engine_spark.plans.parser import parse_app  # noqa: F401

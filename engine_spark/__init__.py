"""engine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query & data-processing capabilities of
eventflux-io/engine (a single-process Rust streaming CEP engine), re-expressed
on Apache Spark: DataFrame/SQL for relational operators, Structured Streaming
for the streaming path, and Pandas-UDF-backed stateful operators only where
Spark's built-ins genuinely can't express the semantics (CEP pattern NFA,
count-based windows).

Layout:
    session     — tuned SparkSession builders (batch + streaming)
    catalog     — named-table registry over parquet dirs (testdata layout)
    functions   — EventFlux scalar-function registry → pyspark.sql.functions
    operators   — windows, joins, aggregations, pattern (CEP), output rate
    sources     — source/sink/mapper registry (rate, socket, file, memory…)
    plans       — EventFlux-SQL dialect parser + DataFrame compiler
    streaming   — AppRunner-style test harness + stateful helpers
    datapipe    — large-scale training-data ops: dedup, similarity, text,
                  multimodal (not in the reference; first-class here)
"""

__version__ = "0.1.0"

from engine_spark.session import get_spark  # noqa: F401
from engine_spark.catalog import Catalog  # noqa: F401

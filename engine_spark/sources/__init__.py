"""I/O layer: sources, sinks, and event mappers (reference §2a surface).

The reference registers I/O extensions by name in its context registry
(eventflux_context.rs:485-505) and attaches them from ``WITH(...)`` clauses
(with_clause.rs:38-135, auto-attach eventflux_app_runtime.rs:995-1007).
Here the registry maps the same extension names onto Structured Streaming
sources/sinks; mappers are column transforms (from_json/from_csv are
Catalyst expressions, not row callbacks).
"""

from engine_spark.sources.registry import (  # noqa: F401
    SOURCES,
    SINKS,
    create_sink_writer,
    create_source,
)
from engine_spark.sources.mappers import MAPPERS, map_in, map_out  # noqa: F401

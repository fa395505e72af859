"""Extension surface (§2i): user-defined functions, aggregators, windows,
plugins, script UDFs.

Reference registration points (eventflux_manager.rs):
- ``add_scalar_function_factory``  :263 → ``add_scalar_function``
- ``AttributeAggregatorFactory``   :280 → ``add_aggregator``
- ``WindowProcessorFactory``       :272 → ``add_window``
- Source/Sink/Mapper factories     :289-340 → sources/registry.py dicts
- dynamic ``.so`` loading (libloading, Cargo.toml:43) → ``load_plugin``
  (an import path; --py-files ships it to executors)
- script UDFs (script_function_executor.rs:24-27 — a stub returning Null
  in the reference) → ``add_script_function`` (actually functional here)

Preference order for custom functions: a Column-builder (stays in
Catalyst codegen — zero cost) > pandas UDF (Arrow-vectorized) > row UDF
(last resort, 10-100× slower; allowed but flagged).
"""

from __future__ import annotations

import importlib
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from engine_spark.functions import scalar as _scalar
from engine_spark.operators import aggregations as _aggs


def _columnize(builder: Callable[..., Column]) -> Callable[..., Column]:
    """Accept string column names like every built-in does."""

    def wrapped(*args):
        return builder(
            *[F.col(a) if isinstance(a, str) else a for a in args]
        )

    return wrapped


def add_scalar_function(name: str, builder: Callable[..., Column]) -> None:
    """Register a scalar function by name (Column-builder: composes native
    exprs, so it inlines into whole-stage codegen like every built-in)."""
    _scalar.FUNCTIONS[name.lower()] = _columnize(builder)


def add_pandas_function(
    spark: SparkSession, name: str, fn: Callable, return_type: str
) -> None:
    """Register an Arrow-vectorized pandas UDF, callable from F.expr/SQL."""
    from pyspark.sql.functions import pandas_udf

    fn.__annotations__ = {}  # string annotations confuse the UDF inferencer
    spark.udf.register(name, pandas_udf(fn, return_type))


def add_aggregator(name: str, builder: Callable[..., Column]) -> None:
    """Register a custom aggregator (native aggregate composition keeps
    map-side partial aggregation; reference AttributeAggregatorFactory)."""
    _aggs.AGGREGATORS[name.lower()] = _columnize(builder)


#: custom window kinds for the SQL front-end:
#: name → (df, ts, params, partition_by, aggs_dict, allow_global) -> DataFrame
WINDOW_FACTORIES: dict[str, Callable] = {}


def add_window(name: str, factory: Callable) -> None:
    """Register a custom window processor kind, usable from
    ``WINDOW('name', …)`` in SQL (reference WindowProcessorFactory)."""
    WINDOW_FACTORIES[name.lower()] = factory


def add_script_function(
    spark: SparkSession, name: str, source: str, return_type: str = "string"
) -> None:
    """Script UDF: compile a Python function body and register it.

    ``source`` must define ``def run(*args)``. The reference's script
    executor is an unimplemented stub returning Null
    (script_function_executor.rs:24-27); here scripts are real row UDFs.
    Row-at-a-time — keep scripts off the hot path.
    """
    ns: dict = {}
    exec(compile(source, f"<script:{name}>", "exec"), ns)  # noqa: S102
    if "run" not in ns:
        raise ValueError(f"script function {name!r} must define run(*args)")
    spark.udf.register(name, ns["run"], return_type)


def load_plugin(module_path: str) -> None:
    """Dynamic extension loading: import a module and call its
    ``register()`` hook (the .so-loading equivalent; ship the module to
    executors with --py-files)."""
    mod = importlib.import_module(module_path)
    if not hasattr(mod, "register"):
        raise ValueError(f"plugin {module_path!r} has no register() hook")
    mod.register()

"""EventFlux scalar-function registry → pyspark.sql.functions.

The reference registers ~60 scalar functions by name in its extension registry
(reference: src/core/executor/function/builtin_wrapper.rs:645-677 for the name
list; string_functions.rs / math_functions.rs / date_functions.rs for the
implementations). Every one maps to a JVM-side Catalyst expression — zero
Python UDFs in this module, so the whole surface stays inside whole-stage
codegen.

``resolve(name)`` returns a callable ``(*Column) -> Column``; names are
case-insensitive like the reference's registry lookups.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnFn = Callable[..., Column]


def _lit(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def _substring(col: Column, pos, length=None) -> Column:
    # substr(value, start[, len]) — reference string_functions.rs
    if length is None:
        return col.substr(_lit(pos), F.length(col))
    return col.substr(_lit(pos), _lit(length))


def _left(col: Column, n) -> Column:
    return col.substr(F.lit(1), _lit(n))


def _right(col: Column, n) -> Column:
    n = _lit(n)
    return col.substr(F.length(col) - n + F.lit(1), n)


def _if(cond: Column, a, b) -> Column:
    # IF/IIF: website/docs/sql-reference/functions.md:307
    return F.when(cond, _lit(a)).otherwise(_lit(b))


def _convert(col: Column, to_type: str) -> Column:
    # cast/convert(value, 'type') — reference {cast,convert}_function_executor.rs
    return col.cast(to_type)


def _dateadd(col: Column, n, unit: str = "day") -> Column:
    # dateAdd — reference date_functions.rs
    return col + F.expr(f"INTERVAL {int(n)} {unit}")


def _position(sub, col: Column) -> Column:
    # position(needle, haystack) → 1-based index, 0 if absent
    return F.locate(sub if isinstance(sub, str) else sub, col)


def _instance_of(spark_type: str) -> ColumnFn:
    # instanceOf* checkers (reference instance_of_checkers.rs test the value's
    # *runtime* type). Spark columns are statically typed, so the faithful
    # translation is: declared type == target AND value non-null. ``typeof``
    # evaluates to the static type name, constant-folded by Catalyst.
    def check(c: Column) -> Column:
        return (F.typeof(c) == F.lit(spark_type)) & c.isNotNull()

    return check


#: registry-name → Column builder. Names follow the reference registry
#: (src/core/config/eventflux_context.rs:440-505, builtin_wrapper.rs:649-677).
FUNCTIONS: dict[str, ColumnFn] = {
    # --- string (string_functions.rs:12-877) ---
    "concat": F.concat,
    "length": F.length,
    "lower": F.lower,
    "upper": F.upper,
    "substring": _substring,
    "substr": _substring,
    "trim": F.trim,
    "ltrim": F.ltrim,
    "rtrim": F.rtrim,
    "like": lambda col, pat: col.like(pat),
    "replace": lambda col, search, repl: F.replace(col, _lit(search), _lit(repl)),
    "left": _left,
    "right": _right,
    "reverse": F.reverse,
    "repeat": lambda col, n: F.repeat(col, n),
    "position": _position,
    "ascii": F.ascii,
    "chr": F.char,
    "lpad": F.lpad,
    "rpad": F.rpad,
    # --- math (math_functions.rs:22-784) ---
    "sqrt": F.sqrt,
    "round": F.round,
    "log": F.log,
    "log10": F.log10,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "abs": F.abs,
    "floor": F.floor,
    "ceil": F.ceil,
    "exp": F.exp,
    "power": F.pow,
    "maximum": F.greatest,
    "minimum": F.least,
    "mod": lambda a, b: a % _lit(b),
    "sign": F.signum,
    "trunc": lambda c: c.cast("bigint"),
    # --- date/time (date_functions.rs:14-92) ---
    "now": F.current_timestamp,
    "formatdate": F.date_format,
    "parsedate": F.to_timestamp,
    "dateadd": _dateadd,
    # --- conversion / null (cast/convert/coalesce/nullif/default executors) ---
    "cast": _convert,
    "convert": _convert,
    "coalesce": F.coalesce,
    "nullif": F.nullif,
    "default": lambda col, dflt: F.coalesce(col, _lit(dflt)),
    # --- misc ---
    "uuid": lambda: F.expr("uuid()"),
    "eventtimestamp": lambda ts_col=None: ts_col if ts_col is not None else F.col("ts"),
    "if": _if,
    "iif": _if,
    # --- type checks (instance_of_checkers.rs) ---
    "instanceofboolean": _instance_of("boolean"),
    "instanceofinteger": _instance_of("int"),
    "instanceoflong": _instance_of("bigint"),
    "instanceoffloat": _instance_of("float"),
    "instanceofdouble": _instance_of("double"),
    "instanceofstring": _instance_of("string"),
}


def resolve(name: str) -> ColumnFn:
    """Case-insensitive registry lookup, mirroring the reference's behavior."""
    fn = FUNCTIONS.get(name.lower())
    if fn is None:
        raise KeyError(f"unknown scalar function: {name}")
    return fn

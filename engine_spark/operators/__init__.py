from engine_spark.operators import windows, joins, aggregations  # noqa: F401

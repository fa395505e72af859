from engine_spark.functions.scalar import FUNCTIONS, resolve  # noqa: F401

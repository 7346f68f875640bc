from datafusion_postgres_spark.functions.registry import (  # noqa: F401
    register_all, register_functions)

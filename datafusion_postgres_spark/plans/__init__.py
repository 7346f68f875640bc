from datafusion_postgres_spark.plans.inspect import (  # noqa: F401
    count_shuffles,
    formatted_plan,
    pushed_filters,
    scan_columns,
    uses_broadcast,
)

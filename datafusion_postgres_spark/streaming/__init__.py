from datafusion_postgres_spark.streaming.ops import (  # noqa: F401
    read_events_stream,
    sessionize_stream,
    windowed_counts,
)

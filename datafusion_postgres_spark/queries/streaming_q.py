"""Driver-visible Structured Streaming queries.

The reference engine has no streaming surface (SURVEY.md §0); these
queries are the Spark-native capability the engine adds, registered so
the driver's correctness gate exercises a REAL streaming execution
(readStream → watermarked window agg → memory sink), not a batch
re-phrasing.  The oracle is plain SQL: with ``availableNow`` over a
bounded input the streaming result must equal the batch rollup exactly.

Determinism notes:
  * one parquet file → one micro-batch → the watermark (which only
    advances BETWEEN batches) can drop nothing;
  * ``complete`` output mode re-emits the full aggregate at the final
    trigger, so the memory sink holds the entire result regardless of
    how the source was split into batches;
  * the memory-sink table name is uniqued per invocation so re-running
    the query in one session (gate + bench) never collides.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from datafusion_postgres_spark.queries import register

_HOURLY_ORACLE = """
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
       CAST(extract(hour FROM CAST(ts AS TIMESTAMP)) AS INTEGER) AS hour,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


@register("streaming_hourly_rollup", oracle=_HOURLY_ORACLE)
def streaming_hourly(spark, sf_dir):
    """events_hourly_rollup re-expressed as a streaming pipeline: file
    source → event-time tumbling window with watermark → memory sink.
    Same hash-safe output shape as the batch query (day/hour ints, exact
    decimal sum → one double cast)."""
    from datafusion_postgres_spark.streaming.ops import (
        read_events_stream, run_to_memory,
    )

    stream = read_events_stream(
        spark, os.path.join(sf_dir, "events.parquet"))
    # decimal sum internally (exact, order-independent across micro-batch
    # partial aggregation), double out — same convention as the batch query
    agg = (stream
           .withWatermark("ts", "2 hours")
           .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
           .agg(F.count("*").alias("raw_n"),
                F.sum(F.col("value").cast("decimal(12,2)"))
                .cast("double").alias("total_value"))
           .select(F.col("win.start").cast("date").alias("day"),
                   F.hour("win.start").alias("hour"),
                   "event_type", "raw_n", "total_value"))
    name = f"stream_hourly_{uuid.uuid4().hex[:12]}"
    q = run_to_memory(agg, name, timeout_secs=120.0, output_mode="complete")
    q.stop()
    return (spark.table(name)
            .select("day", "hour", "event_type",
                    F.col("raw_n").cast("bigint").alias("n"),
                    "total_value")
            .orderBy("day", "hour", "event_type"))

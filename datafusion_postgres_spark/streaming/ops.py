"""Structured Streaming surface.

The reference has NO streaming operators (SURVEY.md §0: all its
"streaming" is pull-based RecordBatch result streaming). This module is
the forward-looking streaming capability the Spark engine adds: the
events table's batch queries (events_q.py) re-expressed over unbounded
input with watermarks, so the same analytics run continuously at ingest
time on a real cluster.

Design rules:
  * every aggregation carries a watermark so state is bounded;
  * tumbling/sliding windows via F.window (incremental, partial-agg);
  * sessionization via F.session_window (gap-based, matches the batch
    events_sessionize semantics);
  * file/rate sources for tests; kafka plugs in by swapping readStream
    options only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

def _events_schema(ts_is_long: bool) -> StructType:
    """The testdata has shipped events.ts both as int64 nanos and as
    parquet timestamp[us]; build the read schema for whichever layout the
    files actually have (mirrors sources/registry.read_table's check)."""
    from pyspark.sql.types import TimestampType
    return StructType([
        StructField("event_id", LongType()),
        StructField("ts", LongType() if ts_is_long else TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ])


def read_events_stream(spark: SparkSession, path: str,
                       max_files_per_trigger: int = 1) -> DataFrame:
    """File-based streaming source over the events parquet layout.

    At production scale this is the S3/HDFS landing zone; each micro-batch
    picks up new files. ts arrives as int64 nanos and is converted exactly
    like the batch path (sources.registry.read_table).

    The file source wants a DIRECTORY; a single-file path (the testdata
    layout) becomes dir + pathGlobFilter on the basename."""
    import glob
    import os

    import pyarrow.parquet as pq
    if os.path.isfile(path):
        sample = path
    else:
        # recursive: partitioned layouts nest files under key=value dirs
        found = sorted(glob.glob(os.path.join(path, "*.parquet"))) or \
            sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                             recursive=True))
        if not found:
            raise FileNotFoundError(
                f"no parquet files under {path!r} to sniff the ts layout "
                "from (empty directory, or non-parquet stream source?)")
        sample = found[0]
    ts_is_long = str(pq.read_schema(sample).field("ts").type) == "int64"
    reader = (spark.readStream
              .schema(_events_schema(ts_is_long))
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    if ts_is_long:
        # watermarks require TIMESTAMP (with local tz), not TIMESTAMP_NTZ —
        # timestamp_micros produces exactly that (session tz is UTC)
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    slide: str | None = None,
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming analog of events_hourly_rollup: tumbling (or sliding)
    event-time window counts + value sums per event_type, late data bounded
    by the watermark."""
    w = (F.window("ts", window, slide) if slide
         else F.window("ts", window))
    return (events
            .withWatermark("ts", watermark)
            .groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("total_value"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n", "total_value"))


def sessionize_stream(events: DataFrame, gap: str = "30 minutes",
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming analog of events_sessionize: session windows with a
    30-minute inactivity gap. State per (user, open session) only — the
    watermark closes sessions and evicts state."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("sess"),
                     "user_id")
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("session_value"))
            .select("user_id",
                    F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    "n_events", "session_value"))


def run_to_memory(df: DataFrame, name: str, timeout_secs: float = 60.0,
                  output_mode: str = "complete"):
    """Test helper: run a streaming frame to a memory sink until idle.

    `complete` mode re-emits all windows each batch — right for inspecting
    aggregation results in tests; production sinks use `append` +
    watermark-finalized windows."""
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_secs)
    return q


def attribution_join_stream(events: DataFrame, horizon: str = "1 hour",
                            from_type: str = "view",
                            to_type: str = "purchase") -> DataFrame:
    """Stream-stream interval join: each ``to_type`` event (purchase)
    attributed to every ``from_type`` event (view) by the same user within
    the preceding ``horizon`` — the click-attribution shape.

    Both sides carry watermarks, and the join condition bounds event-time
    distance, so Spark provably evicts state older than the horizon on
    both sides (the state-cleanup requirement for stream-stream joins).
    State = one horizon's worth of views + purchases per user shard."""
    v = (events.where(F.col("event_type") == from_type)
         .select(F.col("user_id").alias("v_user"),
                 F.col("event_id").alias("view_id"),
                 F.col("ts").alias("view_ts"))
         .withWatermark("view_ts", horizon))
    p = (events.where(F.col("event_type") == to_type)
         .select(F.col("user_id").alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts"))
         .withWatermark("purchase_ts", horizon))
    return (p.join(
        v,
        F.expr(f"""v_user = p_user AND
                   purchase_ts > view_ts AND
                   purchase_ts <= view_ts + interval {horizon}"""))
        .select(F.col("p_user").alias("user_id"), "view_id", "purchase_id",
                "view_ts", "purchase_ts"))


def enrich_stream_scd2(stream: DataFrame, dim: DataFrame,
                       on: str = "user_id", fact_ts: str = "ts",
                       from_col: str = "valid_from",
                       to_col: str = "valid_to") -> DataFrame:
    """Stream-static SCD Type-2 enrichment: each streaming fact picks the
    dimension version valid at its EVENT time (not arrival time), via the
    equi+range join of operators.joins.scd2_join — the join shape
    Structured Streaming allows against a static side with no watermark
    or state (the static side is re-planned per micro-batch, so a dim
    refresh between batches is picked up automatically)."""
    from datafusion_postgres_spark.operators.joins import scd2_join
    return scd2_join(stream, dim, on=on, fact_ts=fact_ts,
                     from_col=from_col, to_col=to_col, how="left")


def read_parquet_stream(spark: SparkSession, path: str, schema,
                        max_files_per_trigger: int = 1) -> DataFrame:
    """Generic file-based streaming source with the file-vs-directory
    handling read_events_stream / streaming.dedup.read_documents_stream
    each hand-roll (round-10 second review pass — one definition): the
    file source wants a DIRECTORY, so a single-file path becomes dir +
    pathGlobFilter on the basename; a directory path streams its
    parquet files directly (where a hardcoded glob filter would match
    nothing and silently stream zero rows)."""
    import os

    reader = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    return reader.parquet(path)

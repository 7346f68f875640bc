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


# Session-window semantics pinned to F.session_window: an event extends the
# session iff it lands STRICTLY inside [start, last+gap) — so a new session
# begins at gap >= 30 min (not >). All arithmetic in integer microseconds
# (both engines floor-divide the raw parquet nanos), no float, no
# timestamp output columns.
_SESS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS tu FROM events),
marked AS (
  SELECT user_id, event_id, tu,
         CASE WHEN LAG(tu) OVER w IS NULL
                   OR tu - LAG(tu) OVER w >= 1800000000
              THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)),
sess AS (
  SELECT user_id, tu,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked),
per_sess AS (
  SELECT user_id, sid, COUNT(*) AS n,
         MAX(tu) - MIN(tu) + 1800000000 AS span_us
  FROM sess GROUP BY 1, 2)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(n) AS BIGINT) AS n_events,
       CAST(SUM(span_us) AS BIGINT) AS total_span_us
FROM per_sess GROUP BY user_id ORDER BY user_id
"""


@register("streaming_sessionize", oracle=_SESS_ORACLE)
def streaming_sessionize(spark, sf_dir):
    """events_sessionize as a REAL streaming execution: file source →
    F.session_window (30-min gap) with watermark-bounded state → memory
    sink, then a batch rollup of the closed sessions per user. The span
    check (session_window end = last event + gap) pins the session
    BOUNDARIES, not just the counts."""
    from datafusion_postgres_spark.streaming.ops import (
        read_events_stream, run_to_memory, sessionize_stream,
    )

    stream = read_events_stream(
        spark, os.path.join(sf_dir, "events.parquet"))
    sess = sessionize_stream(stream, gap="30 minutes", watermark="2 hours")
    name = f"stream_sess_{uuid.uuid4().hex[:12]}"
    q = run_to_memory(sess, name, timeout_secs=120.0, output_mode="complete")
    q.stop()
    span = (F.unix_micros("session_end") - F.unix_micros("session_start"))
    return (spark.table(name)
            .groupBy("user_id")
            .agg(F.count("*").cast("bigint").alias("n_sessions"),
                 F.sum("n_events").cast("bigint").alias("n_events"),
                 F.sum(span).cast("bigint").alias("total_span_us"))
            .orderBy("user_id"))


@register("streaming_url_dedup", oracle="""
WITH canon AS (
  SELECT DISTINCT
         'https://src' || CAST((doc_id // 4) % 20 AS VARCHAR) ||
         '.example.com/docs/' || CAST(doc_id // 4 AS VARCHAR) ||
         CASE WHEN (doc_id // 4) % 3 = 0 THEN '?a=1&b=2' ELSE '' END
           AS canonical_url
  FROM documents)
SELECT canonical_url, CAST(1 AS BIGINT) AS n
FROM canon ORDER BY canonical_url
""")
def streaming_url_dedup(spark, sf_dir):
    """URL-level dedup as a REAL streaming execution: file source with
    the planted messy-URL synthesis (same doc_id arithmetic as
    text_url_dedup) -> canonicalize -> dropDuplicatesWithinWatermark on
    the canonical key -> memory sink. WHICH duplicate survives depends
    on micro-batch arrival order, so the deterministic (and oracled)
    output is the survivor KEY SET: one row per canonical URL, exactly
    the batch DISTINCT — any canonicalizer drift or state-eviction bug
    shows up as a key-set mismatch."""
    from datafusion_postgres_spark.streaming.dedup import (
        dedup_url_stream, read_documents_stream,
    )
    from datafusion_postgres_spark.streaming.ops import run_to_memory

    stream = read_documents_stream(
        spark, os.path.join(sf_dir, "documents.parquet"))
    g = F.expr("doc_id DIV 4")
    v = F.col("doc_id") % 4
    host = F.concat(F.lit("src"), (g % 20).cast("string"),
                    F.lit(".example.com"))
    path = F.concat(F.lit("/docs/"), g.cast("string"))
    q0 = F.when(g % 3 == 0, "?b=2&a=1").otherwise("")
    q1 = F.when(g % 3 == 0, "?a=1&b=2").otherwise("")
    q2 = (F.when(g % 3 == 0, "?a=1&utm_source=news&b=2")
          .otherwise("?utm_source=news"))
    q3 = (F.when(g % 3 == 0, "?b=2&fbclid=xyz&a=1")
          .otherwise("?gclid=123"))
    url = (F.when(v == 0, F.concat(F.lit("https://"), host, path, q0))
           .when(v == 1, F.concat(F.lit("HTTPS://"), F.upper(host),
                                  F.lit(":443"), path, F.lit("/"), q1))
           .when(v == 2, F.concat(F.lit("https://www."), host, path, q2,
                                  F.lit("#frag")))
           .otherwise(F.concat(F.lit("https://"), host,
                               F.lit("//docs//"), g.cast("string"), q3)))
    messy = stream.select("doc_id", "ingest_ts", url.alias("url"))
    survivors = dedup_url_stream(messy, watermark="1 hour")
    name = f"stream_urldedup_{uuid.uuid4().hex[:12]}"
    q = run_to_memory(survivors, name, timeout_secs=120.0,
                      output_mode="append")
    q.stop()
    return (spark.table(name)
            .groupBy("canonical_url")
            .agg(F.count("*").cast("bigint").alias("n"))
            .orderBy("canonical_url"))


def _emb_stream_oracle() -> str:
    """The streaming row asserts the SAME ground truth as the batch
    dedup_embedding_lsh row — one shared constant, not a copy (round-10
    second review pass)."""
    from datafusion_postgres_spark.queries.pipeline_q import (
        EMB_LSH_PAIRS_ORACLE,
    )
    return EMB_LSH_PAIRS_ORACLE


@register("streaming_embedding_dedup", oracle=_emb_stream_oracle())
def streaming_embedding_dedup(spark, sf_dir):
    """Semantic near-dup pairs as a REAL streaming execution
    (round-10): readStream over the embeddings parquet ->
    LSH-bucket-keyed applyInPandasWithState
    (streaming/dedup.embedding_near_dup_stream) -> memory sink. The
    emitted pair set is deterministic under ANY micro-batching (a pair
    appears when its second member arrives, owned by the lowest
    colliding signature table), and the Python state math replicates
    the Spark fold order bit-for-bit, so the oracle is the SAME
    four-table banding + exact-cosine verify SQL the batch
    dedup_embedding_lsh row uses — streaming == batch == DuckDB on
    identical values, with the rounding done Spark-side (half-up,
    matching ROUND)."""
    import pyspark.sql.functions as SF

    from datafusion_postgres_spark.sources.registry import read_table
    from datafusion_postgres_spark.streaming.dedup import (
        embedding_near_dup_stream,
    )
    from datafusion_postgres_spark.streaming.ops import run_to_memory

    from datafusion_postgres_spark.streaming.ops import (
        read_parquet_stream,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    schema = read_table(spark, sf_dir, "embeddings").schema
    stream = read_parquet_stream(spark, path, schema)
    pairs = embedding_near_dup_stream(stream, state_timeout_ms=None)
    name = f"stream_embdedup_{uuid.uuid4().hex[:12]}"
    q = run_to_memory(pairs, name, timeout_secs=240.0,
                      output_mode="append")
    if q.isActive:
        # availableNow self-terminates when drained — still active
        # means run_to_memory's awaitTermination timed out; a silent
        # stop() here would return a TRUNCATED pair set and surface
        # as an opaque hash mismatch (second review pass)
        q.stop()
        raise RuntimeError(
            "streaming_embedding_dedup did not drain within 240s")
    q.stop()
    return (spark.table(name)
            .select(SF.col("id_a").cast("bigint").alias("id_a"),
                    SF.col("id_b").cast("bigint").alias("id_b"),
                    SF.round("cos_sim", 6).alias("cos_sim"))
            .orderBy("id_a", "id_b"))

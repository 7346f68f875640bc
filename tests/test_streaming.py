"""Structured Streaming tests: windowed aggregation and sessionization
over the events table replayed as a file stream, cross-checked against the
equivalent batch computation."""

import shutil

import pytest
from pyspark.sql import functions as F

from datafusion_postgres_spark.sources.registry import read_table
from datafusion_postgres_spark.streaming import ops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "events.parquet")
    return str(d)


def test_windowed_counts_match_batch(spark, stream_dir):
    stream = ops.read_events_stream(spark, stream_dir)
    assert stream.isStreaming
    q = ops.run_to_memory(ops.windowed_counts(stream, window="1 hour"),
                          "win_counts")
    try:
        got = {(r["window_start"], r["event_type"]): (r["n"], r["total_value"])
               for r in spark.sql("SELECT * FROM win_counts").collect()}
        batch = (read_table(spark, SF_DIR, "events")
                 .groupBy(F.date_trunc("hour", F.col("ts").cast("timestamp"))
                          .alias("h"), "event_type")
                 .agg(F.count("*").alias("n"), F.sum("value").alias("v")))
        expected = {(r["h"], r["event_type"]): (r["n"], r["v"])
                    for r in batch.collect()}
        assert len(got) == len(expected)
        for k, (n, v) in expected.items():
            assert got[k][0] == n
            assert abs(got[k][1] - v) < 1e-6
    finally:
        q.stop()


def test_sessionize_stream(spark, stream_dir):
    stream = ops.read_events_stream(spark, stream_dir)
    q = ops.run_to_memory(ops.sessionize_stream(stream, gap="30 minutes"),
                          "sessions")
    try:
        rows = spark.sql("SELECT * FROM sessions").collect()
        assert len(rows) > 0
        # session windows must respect the gap: end-start >= 0 and every
        # user's sessions are disjoint
        by_user = {}
        for r in rows:
            by_user.setdefault(r["user_id"], []).append(
                (r["session_start"], r["session_end"]))
        total_sessions = 0
        for user, spans in by_user.items():
            spans.sort()
            total_sessions += len(spans)
            for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
                assert e1 <= s2, f"overlapping sessions for {user}"
        # must match the batch sessionization count exactly
        from datafusion_postgres_spark.queries import load_all
        batch = load_all()["events_sessionize"].fn(spark, SF_DIR)
        expected = batch.agg(F.sum("n_sessions")).collect()[0][0]
        assert total_sessions == expected
    finally:
        q.stop()


def test_stateful_user_profiles(spark, stream_dir):
    """applyInPandasWithState: per-user running profile; final counts must
    equal the batch groupBy."""
    from datafusion_postgres_spark.streaming import stateful

    stream = ops.read_events_stream(spark, stream_dir)
    # state_timeout_ms=None: finite availableNow replay (timers
    # would keep the query from quiescing; see user_profiles doc)
    prof = stateful.user_profiles(stream, state_timeout_ms=None)
    q = (prof.writeStream.format("memory").queryName("profiles")
         .outputMode("update").trigger(availableNow=True).start())
    assert q.awaitTermination(120), 'stream did not finish in time'
    try:
        # update mode can emit a row per user per batch; keep the last
        got_df = spark.sql("SELECT * FROM profiles")
        rows = got_df.collect()
        latest = {}
        for r in rows:  # memory sink appends in batch order
            latest[r["user_id"]] = r
        batch = (read_table(spark, SF_DIR, "events").groupBy("user_id")
                 .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
                 .collect())
        expected = {r["user_id"]: (r["n"], r["v"]) for r in batch}
        assert set(latest) == set(expected)
        for uid, (n, v) in expected.items():
            assert latest[uid]["n_events"] == n
            assert abs(latest[uid]["total_value"] - v) < 1e-6
            assert latest[uid]["ewma_value"] is not None
    finally:
        q.stop()


def test_stateless_pipeline_filters_on_stream(spark, tmp_path_factory):
    """The pretraining filters are pure projections, so the SAME operator
    runs unchanged on a stream — batch/stream unification for the
    ingest-time quality gate."""
    from datafusion_postgres_spark.operators.text import (
        gopher_quality_flags)
    from datafusion_postgres_spark.sources.registry import read_table
    from datafusion_postgres_spark.streaming.dedup import (
        read_documents_stream)

    d = tmp_path_factory.mktemp("docs_stream_flt")
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                d / "documents.parquet")
    stream = read_documents_stream(spark, str(d))
    flagged = gopher_quality_flags(stream.drop("ingest_ts"))
    assert flagged.isStreaming
    q = (flagged.writeStream.format("memory").queryName("gopher_stream")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish in time"
    try:
        got = {r["doc_id"]: r["keep"] for r in
               spark.sql("SELECT doc_id, keep FROM gopher_stream").collect()}
        batch = {r["doc_id"]: r["keep"] for r in gopher_quality_flags(
            read_table(spark, SF_DIR.replace("events", "documents")
                       if "events" in SF_DIR else SF_DIR,
                       "documents")).collect()}
        assert got == batch and len(got) == 500
    finally:
        q.stop()


def test_attribution_join_matches_batch(spark, stream_dir):
    """Watermarked stream-stream interval join == the equivalent batch
    join over the same events."""
    stream = ops.read_events_stream(spark, stream_dir)
    joined = ops.attribution_join_stream(stream, horizon="1 hour")
    assert joined.isStreaming
    q = (joined.writeStream.format("memory").queryName("attrib")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish in time"
    try:
        got = {(r["view_id"], r["purchase_id"]) for r in
               spark.sql("SELECT view_id, purchase_id FROM attrib")
               .collect()}
        ev = read_table(spark, SF_DIR, "events")
        v = ev.where("event_type = 'view'").select(
            F.col("user_id").alias("vu"), F.col("event_id").alias("vid"),
            F.col("ts").alias("vts"))
        p = ev.where("event_type = 'purchase'").select(
            F.col("user_id").alias("pu"), F.col("event_id").alias("pid"),
            F.col("ts").alias("pts"))
        batch = {(r["vid"], r["pid"]) for r in
                 p.join(v, F.expr(
                     "vu = pu AND pts > vts AND "
                     "pts <= vts + interval 1 hour")).collect()}
        assert got == batch and len(batch) > 0
    finally:
        q.stop()


def test_classifier_scores_on_stream(spark, tmp_path_factory):
    """The hashed linear classifier is a stateless projection chain
    (fingerprint materialization + fold), so ingest-time scoring runs
    the identical operator on a stream and matches batch bit-for-bit."""
    from datafusion_postgres_spark.operators.text import (
        hashed_classifier_score)
    from datafusion_postgres_spark.sources.registry import read_table
    from datafusion_postgres_spark.streaming.dedup import (
        read_documents_stream)

    d = tmp_path_factory.mktemp("docs_stream_clf")
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                d / "documents.parquet")
    stream = read_documents_stream(spark, str(d))
    scored = hashed_classifier_score(stream.drop("ingest_ts"))
    assert scored.isStreaming
    q = (scored.writeStream.format("memory").queryName("clf_stream")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish in time"
    try:
        got = {r["doc_id"]: (r["n_features"], r["clf_score"]) for r in
               spark.sql("SELECT * FROM clf_stream").collect()}
        batch = {r["doc_id"]: (r["n_features"], r["clf_score"]) for r in
                 hashed_classifier_score(
                     read_table(spark, SF_DIR, "documents")).collect()}
        assert got == batch and len(got) == 500
    finally:
        q.stop()


def test_contamination_gate_on_stream(spark, tmp_path_factory):
    """The Bloom contamination probe is one array Literal + codegen bit
    tests — a stateless expression, so the identical gate runs at
    streaming ingest and matches the batch result bit-for-bit."""
    from datafusion_postgres_spark.operators.dedup import contamination_gate
    from datafusion_postgres_spark.sources.registry import read_table
    from datafusion_postgres_spark.streaming.dedup import (
        read_documents_stream)

    batch_docs = read_table(spark, SF_DIR, "documents")
    eval_docs = batch_docs.where("doc_id < 50")
    corpus = batch_docs.where("doc_id >= 50")
    batch = {r["doc_id"]: (r["n_grams"], r["n_bloom_hits"]) for r in
             contamination_gate(corpus, eval_docs).collect()}
    # a true overlap exists: every eval doc flags ITSELF if streamed in,
    # and exact dups across the id-50 boundary flag as contaminated
    assert any(v[1] > 0 for v in batch.values())

    d = tmp_path_factory.mktemp("docs_stream_gate")
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                d / "documents.parquet")
    stream = read_documents_stream(spark, str(d)).drop("ingest_ts") \
        .where("doc_id >= 50")
    gated = contamination_gate(stream, eval_docs)
    assert gated.isStreaming
    q = (gated.writeStream.format("memory").queryName("gate_stream")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish in time"
    try:
        got = {r["doc_id"]: (r["n_grams"], r["n_bloom_hits"]) for r in
               spark.sql("SELECT * FROM gate_stream").collect()}
        assert got == batch
    finally:
        q.stop()


def test_trained_classifier_scores_on_stream(spark, tmp_path_factory):
    """Train once at batch time, score at streaming ingest: the trained
    weight literal makes scoring a stateless projection, so the ingest
    gate runs the identical operator on a stream and matches batch
    bit-for-bit (the deploy shape: train offline, gate online)."""
    from datafusion_postgres_spark.operators.classifier import (
        train_text_classifier, trained_classifier_score)
    from datafusion_postgres_spark.sources.registry import read_table
    from datafusion_postgres_spark.streaming.dedup import (
        read_documents_stream)
    from pyspark.sql import functions as F

    batch_docs = read_table(spark, SF_DIR, "documents")
    labeled = batch_docs.withColumn("y", (F.col("lang") == "en").cast("int"))
    w = train_text_classifier(labeled, "y", dim=128, iters=2)
    batch = {r["doc_id"]: (r["n_features"], r["margin"], r["clf_score"])
             for r in trained_classifier_score(batch_docs, w).collect()}

    d = tmp_path_factory.mktemp("docs_stream_trained_clf")
    shutil.copy("/root/testdata/sf0.001/documents.parquet",
                d / "documents.parquet")
    stream = read_documents_stream(spark, str(d)).drop("ingest_ts")
    scored = trained_classifier_score(stream, w)
    assert scored.isStreaming
    q = (scored.writeStream.format("memory").queryName("trained_clf_stream")
         .outputMode("append").trigger(availableNow=True).start())
    assert q.awaitTermination(120), "stream did not finish in time"
    try:
        got = {r["doc_id"]: (r["n_features"], r["margin"], r["clf_score"])
               for r in spark.sql(
                   "SELECT * FROM trained_clf_stream").collect()}
        assert got == batch and len(got) == 500
    finally:
        q.stop()

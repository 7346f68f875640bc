"""Cache-lifecycle audit: operators that cache an internal frame must
release it when the returned frame is dropped (ADVICE r5: long-lived
sessions otherwise accumulate event-scale cached blocks)."""

import gc

import pytest
from pyspark.sql import functions as F


def _persistent_rdd_count(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _drain(spark):
    """Drop pending finalizers' targets and let unpersist run."""
    gc.collect()


@pytest.fixture()
def events(spark):
    rows = [(i % 3, f"2024-01-01 00:{i:02d}:00", i) for i in range(40)]
    return spark.createDataFrame(rows, "user_id int, ts string, event_id int") \
        .withColumn("ts", F.col("ts").cast("timestamp"))


@pytest.fixture()
def docs(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog " * 4 + str(i % 5))
            for i in range(30)]
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestReleaseOnGc:
    def test_sessionize_bucketed_releases_cache(self, spark, events):
        from datafusion_postgres_spark.operators.events import (
            sessionize_bucketed,
        )
        gc.collect()
        base = _persistent_rdd_count(spark)
        out = sessionize_bucketed(events, timeout_s=90, bucket_width_s=300)
        assert out.count() == 40
        assert _persistent_rdd_count(spark) > base  # cache is live
        del out
        _drain(spark)
        assert _persistent_rdd_count(spark) == base

    def test_repeated_invocation_does_not_grow_registry(self, spark, events):
        from datafusion_postgres_spark.operators.cachectl import (
            pending_release_count,
        )
        from datafusion_postgres_spark.operators.events import (
            sessionize_bucketed,
        )
        gc.collect()
        base = _persistent_rdd_count(spark)
        for _ in range(3):
            out = sessionize_bucketed(events, timeout_s=90,
                                      bucket_width_s=300)
            out.count()
            del out
        _drain(spark)
        assert _persistent_rdd_count(spark) == base
        assert pending_release_count() == 0

    def test_substring_dup_pairs_releases_cache(self, spark, docs):
        from datafusion_postgres_spark.operators.dedup import (
            substring_dup_pairs,
        )
        gc.collect()
        base = _persistent_rdd_count(spark)
        out = substring_dup_pairs(docs, window=8)
        out.count()
        del out
        _drain(spark)
        assert _persistent_rdd_count(spark) == base

    def test_minhash_and_components_release(self, spark, docs):
        from datafusion_postgres_spark.operators.dedup import (
            connected_components, minhash_lsh_pairs,
        )
        gc.collect()
        base = _persistent_rdd_count(spark)
        pairs = minhash_lsh_pairs(docs, threshold=0.5)
        comp = connected_components(pairs)
        comp.count()
        del pairs, comp
        _drain(spark)
        assert _persistent_rdd_count(spark) == base

    def test_result_matches_bare_window(self, spark, events):
        """Lifecycle wiring must not change semantics: bucketed output
        still equals the classic bare-key lag → flag → running-sum."""
        from pyspark.sql import Window
        from datafusion_postgres_spark.operators.events import (
            sessionize_bucketed,
        )
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        secs = F.col("ts").cast("long")
        gap = secs - F.lag(secs).over(w)
        bare = events.select(
            "event_id",
            F.sum(F.when(gap.isNull() | (gap > 90), 1).otherwise(0))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .alias("session_id"))
        out = sessionize_bucketed(events, timeout_s=90, bucket_width_s=300)
        got = {(r["event_id"], r["session_id"]) for r in out.collect()}
        want = {(r["event_id"], r["session_id"]) for r in bare.collect()}
        assert got == want

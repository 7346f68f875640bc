"""Streaming deduplication — exact and near-dup over unbounded document
streams.

The reference engine has no streaming at all (SURVEY.md §0); batch dedup
at 100 TB (operators/dedup.py) answers "clean what we already have". This
module answers the operational question a training-data pipeline actually
faces: documents arrive CONTINUOUSLY, and a doc must be admitted or
rejected at ingest time, not in a nightly batch over the full corpus.

Two operators:

  * :func:`dedup_exact_stream` — first-arrival-wins exact dedup via
    ``dropDuplicatesWithinWatermark`` on the portable content fingerprint.
    State = one fingerprint per distinct doc inside the watermark horizon,
    evicted automatically; at scale state is hash-partitioned across
    executors by fingerprint, so it shards like any shuffle.

  * :func:`simhash_near_dup_stream` — per-batch simhash signatures
    (the same zero-shuffle two-stage projection as batch:
    operators/dedup.py ``simhash_hashes_expr`` + ``simhash_from_hashes``), pigeonhole-blocked on signature chunks, then an
    ``applyInPandasWithState`` state machine per (chunk_idx, chunk_key)
    bucket that emits a near-dup pair whenever an arriving doc is within
    ``max_hamming`` of any doc already seen in that bucket. Cross-batch
    by construction: the match set is the bucket STATE, not the batch.
    Each pair is emitted exactly once — ownership goes to the lowest
    colliding chunk index, a stateless test both sides can evaluate.

State-bound design at scale: bucket keys shard across executors;
per-bucket state is (id, sig) pairs. Each doc is stored in all 6 chunk
buckets, so payload is ~96 bytes/doc across buckets (6 x (8B id + 8B
sig)) plus Python list overhead — a 1B-doc horizon is on the order of
100-200 GB of state across the cluster, still far below the shuffle
volume of re-running batch dedup daily. Hot buckets are additionally
capped at ``_MAX_BUCKET_DOCS`` entries (oldest-out), and cold buckets are
evicted by processing-time timeout.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, IntegerType, LongType, StringType, StructField, StructType,
)

from datafusion_postgres_spark.operators.dedup import (
    simhash_from_hashes, simhash_hashes_expr,
)
from datafusion_postgres_spark.operators.text import fingerprint, norm_text

DOCS_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])


def read_documents_stream(spark: SparkSession, path: str,
                          max_files_per_trigger: int = 1) -> DataFrame:
    """File-based streaming source over the documents parquet layout, plus
    a synthetic-but-deterministic ``ingest_ts`` event-time column (the
    testdata has no timestamp; production replaces this with the real
    ingest time from the landing zone / Kafka record).

    A single-file path becomes dir + pathGlobFilter, like
    streaming/ops.py's events reader."""
    import os
    reader = (spark.readStream
              .schema(DOCS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.parquet(path)
    # 2024-01-01 00:00:00 UTC + (doc_id mod 50 min) milliseconds —
    # deterministic event time BOUNDED below the 1-hour dedup watermark
    # horizon regardless of the id range, so no row can ever be dropped as
    # late data however large (or out-of-order) the regenerated testdata's
    # ids get. Production replaces this with real ingest time anyway.
    return raw.withColumn(
        "ingest_ts",
        F.timestamp_millis(F.lit(1_704_067_200_000)
                           + F.col("doc_id") % F.lit(3_000_000)))


def dedup_exact_stream(docs: DataFrame, watermark: str = "1 hour",
                       text_col: str = "text") -> DataFrame:
    """First-arrival-wins exact dedup on an unbounded stream.

    Key = the engine-portable polynomial fingerprint of the normalized
    text (same expression as batch exact dedup / text_fingerprint, so a
    batch oracle can verify the surviving key set). State is bounded by
    the watermark: a fingerprint older than the horizon is evicted, which
    is the right trade for ingest pipelines — true re-crawls arrive within
    the horizon; archival dedup stays a batch job."""
    keyed = docs.withColumn("fp", fingerprint(F.col(text_col)))
    return (keyed
            .withWatermark("ingest_ts", watermark)
            .dropDuplicatesWithinWatermark(["fp"]))


# ---------------------------------------------------------------------------
# streaming simhash near-dup

_N_CHUNKS = 6
_BITS = 48
_CHUNK_BITS = _BITS // _N_CHUNKS
_CHUNK_MASK = (1 << _CHUNK_BITS) - 1

PAIR_SCHEMA = StructType([
    StructField("id_a", LongType()),
    StructField("id_b", LongType()),
    StructField("hamming", IntegerType()),
])

_BUCKET_STATE = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("sigs", ArrayType(LongType())),
])


def _chunk_of(sig: int, ci: int) -> int:
    return (sig >> (ci * _CHUNK_BITS)) & _CHUNK_MASK


def _owns_pair(sig_a: int, sig_b: int, ci: int) -> bool:
    """A colliding (a, b) pair is emitted only by the LOWEST chunk index
    where their chunk keys agree — stateless, both sides can compute it,
    so the pair appears exactly once across all buckets."""
    for cj in range(ci):
        if _chunk_of(sig_a, cj) == _chunk_of(sig_b, cj):
            return False
    return True


_MAX_BUCKET_DOCS = 4096  # hot-bucket cap: oldest-out beyond this


def _update_bucket(key, pdfs: Iterator[pd.DataFrame],
                   state: GroupState,
                   timeout_ms: int | None = 3_600_000
                   ) -> Iterator[pd.DataFrame]:
    # timeout invocation (empty data iterator): evict, never re-arm —
    # re-saving here would keep cold-bucket state alive forever
    if state.hasTimedOut:
        for _ in pdfs:  # drain: the worker protocol requires consumption
            pass
        state.remove()
        return
    ci = int(key[0])
    max_hamming = 3
    if state.exists:
        ids, sigs = list(state.get[0]), list(state.get[1])
    else:
        ids, sigs = [], []
    out: list[tuple[int, int, int]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("id")
        for new_id, new_sig in zip(pdf["id"], pdf["sig"]):
            new_id, new_sig = int(new_id), int(new_sig)
            for old_id, old_sig in zip(ids, sigs):
                if old_id == new_id:
                    continue
                ham = bin(old_sig ^ new_sig).count("1")
                if ham <= max_hamming and _owns_pair(old_sig, new_sig, ci):
                    a, b = sorted((old_id, new_id))
                    out.append((a, b, ham))
            ids.append(new_id)
            sigs.append(new_sig)
    if len(ids) > _MAX_BUCKET_DOCS:  # bound skewed/hot buckets
        ids = ids[-_MAX_BUCKET_DOCS:]
        sigs = sigs[-_MAX_BUCKET_DOCS:]
    state.update((ids, sigs))
    if timeout_ms:
        state.setTimeoutDuration(timeout_ms)  # evict cold buckets
    if out:
        yield pd.DataFrame(out, columns=["id_a", "id_b", "hamming"])


def simhash_near_dup_stream(docs: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            state_timeout_ms: int | None = 3_600_000
                            ) -> DataFrame:
    """Near-duplicate pair stream: every emitted row means "the arriving
    doc is within hamming 3 of a doc seen earlier (any batch) or earlier
    in this batch".

    Pipeline: zero-shuffle simhash projection → 6-way chunk explode
    (pigeonhole: hamming<=5 over 6 chunks guarantees >=1 identical chunk,
    so max_hamming=3 candidates are never missed) → stateful per-bucket
    comparison. The only shuffle is the groupBy on (chunk, chunk_key) —
    exactly the batch LSH shape, incrementalized.

    ``state_timeout_ms=None`` disables the processing-time eviction timer:
    needed for finite replays under ``trigger(availableNow)``, where live
    timers keep the query from ever quiescing (it re-triggers forever on
    timer wakeups). Production continuous streams keep the default."""
    from functools import partial
    # two-stage simhash (round-10 verdict #1): materialize the
    # word-hash array once per row, fold the 48 majorities over the
    # column — 18x less CPU than the single-expression form, and the
    # extra projection composes into the streaming frame unchanged
    sig = (docs
           .where(F.trim(F.col(text_col)) != "")
           .select(F.col(id_col).alias("id"),
                   simhash_hashes_expr(F.col(text_col)).alias("whs"))
           .select("id",
                   simhash_from_hashes(F.col("whs"), _BITS).alias("sig")))
    blocked = sig.select(
        "id", "sig",
        F.explode(F.array(*[
            F.struct(F.lit(ci).alias("chunk"),
                     F.shiftright("sig", ci * _CHUNK_BITS)
                      .bitwiseAND(F.lit(_CHUNK_MASK)).alias("ck"))
            for ci in range(_N_CHUNKS)])).alias("b")
    ).select("id", "sig", "b.chunk", "b.ck")
    return (blocked
            .groupBy("chunk", "ck")
            .applyInPandasWithState(
                partial(_update_bucket, timeout_ms=state_timeout_ms),
                outputStructType=PAIR_SCHEMA,
                stateStructType=_BUCKET_STATE,
                outputMode="append",
                timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                             if state_timeout_ms
                             else GroupStateTimeout.NoTimeout)))


def dedup_url_stream(docs: DataFrame, url_col: str = "url",
                     watermark: str = "1 hour") -> DataFrame:
    """First-arrival-wins URL-level dedup on an unbounded ingest stream
    — the streaming twin of operators/urls.dedup_by_url, and the
    CHEAPEST dedup tier to run first in a crawl pipeline (drops recrawl
    duplicates before any content fingerprinting spends CPU).

    Key = the canonical URL from the SAME pure-JVM canonicalizer the
    batch operator uses (case/port/www/slash/tracking-param/fragment
    normalization), so a messy recrawl variant dedups against the
    clean first sight. State is watermark-bounded exactly like
    dedup_exact_stream: recrawls arrive within the horizon, archival
    URL dedup stays a batch job over the canonical column."""
    from datafusion_postgres_spark.operators.urls import canonicalize_url
    keyed = docs.withColumn("canonical_url",
                            canonicalize_url(F.col(url_col)))
    return (keyed
            .withWatermark("ingest_ts", watermark)
            .dropDuplicatesWithinWatermark(["canonical_url"]))

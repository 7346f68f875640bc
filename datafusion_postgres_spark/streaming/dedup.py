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

import functools
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
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
                   simhash_hashes_expr(text_col).alias("whs"))
           .select("id",
                   simhash_from_hashes("whs", _BITS).alias("sig")))
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


# ---------------------------------------------------------------------------
# streaming EMBEDDING near-dup (round-10): the semantic twin of
# simhash_near_dup_stream, completing streaming near-dup parity across
# the modalities that hash to fixed-width signatures (text) AND the
# one that blocks on LSH band buckets (embeddings).

_EMB_N_PLANES = 8
_EMB_N_TABLES = 4
_EMB_DIMS = 64

EMB_PAIR_SCHEMA = StructType([
    StructField("id_a", LongType()),
    StructField("id_b", LongType()),
    StructField("cos_sim", DoubleType()),
])

_EMB_BUCKET_STATE = StructType([
    StructField("ids", ArrayType(LongType())),
    StructField("vecs", ArrayType(ArrayType(DoubleType()))),
])

_MAX_EMB_BUCKET_DOCS = 4096  # hot-bucket cap: oldest-out beyond this


@functools.lru_cache(maxsize=4)
def _emb_plane_weights(n_planes: int = _EMB_N_PLANES,
                       n_tables: int = _EMB_N_TABLES,
                       dims: int = _EMB_DIMS) -> tuple:
    """The SAME ±1 hyperplane weights similarity.lsh_bucket_expr folds
    as literals — one definition (similarity._plane_sign_value), zero
    drift risk between the Spark blocking and the Python state.
    lru_cached (round-10 second review pass): this is 2048 SHA-256
    digests, and _update_emb_bucket runs once per live (tbl, bucket)
    group per micro-batch — recomputing a constant ~2M times per batch
    was pure waste in the Python worker hot path."""
    from datafusion_postgres_spark.operators.similarity import (
        _plane_sign_value,
    )
    return tuple(tuple(_plane_sign_value(p, d) for d in range(dims))
                 for p in range(n_planes * n_tables))


def _emb_bucket_py(vec, ti: int, weights,
                   n_planes: int = _EMB_N_PLANES) -> int:
    """Python replica of lsh_bucket_expr for table ``ti``: per plane, a
    left-to-right fold of vec[d]*w[d] (the exact order Spark's
    zip_with+aggregate uses — IEEE adds on identical doubles are
    bit-identical, so the >= 0 sign cut agrees). Defensive bound on
    min(len(vec), dims): the stream filters to exactly-dims vectors,
    so this never truncates in practice — it only keeps a contract
    violation from raising IndexError inside the worker."""
    bucket = 0
    for p in range(n_planes):
        w = weights[ti * n_planes + p]
        acc = 0.0
        for d in range(min(len(vec), len(w))):
            acc = acc + vec[d] * w[d]
        if acc >= 0:
            bucket += 1 << p
    return bucket


def _cos_py(a, b) -> float:
    """Cosine with the engine's exact left-to-right folds."""
    import math
    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(a, b):
        dot = dot + x * y
    for x in a:
        na = na + x * x
    for y in b:
        nb = nb + y * y
    return dot / (math.sqrt(na) * math.sqrt(nb))


def _emb_owns_pair(lower_a, lower_b) -> bool:
    """A colliding (a, b) pair is emitted only by the LOWEST table
    index where their buckets agree — stateless, both sides can
    compute it, so the pair appears exactly once across all tables
    (the _owns_pair convention on LSH tables instead of chunks).
    Takes the PRECOMPUTED lower-table bucket tuples (memoized once per
    vector per invocation — the second review pass removed the
    per-pair O(n_planes * dims) recompute).

    CAVEAT shared with the simhash stream's hot-bucket cap: if one
    member of a pair was evicted (oldest-out) from the lowest
    colliding table's bucket while both still co-reside in a higher
    table, the higher table declines ownership and the pair is LOST —
    the cap trades strict stream==batch recall for bounded state. At
    the default cap (4096 entries per (table, bucket)) a binding cap
    means one 256-bucket table holds ~1M+ vectors in a single bucket,
    i.e. the LSH geometry itself has degenerated; the registered
    oracle row replays bounded corpora far below it."""
    for ba, bb in zip(lower_a, lower_b):
        if ba == bb:
            return False
    return True


def _update_emb_bucket(key, pdfs: Iterator[pd.DataFrame],
                       state: GroupState,
                       threshold: float = 0.38,
                       timeout_ms: int | None = 3_600_000
                       ) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        for _ in pdfs:  # drain: the worker protocol requires consumption
            pass
        state.remove()
        return
    ti = int(key[0])
    weights = _emb_plane_weights()
    if state.exists:
        ids = list(state.get[0])
        vecs = [list(v) for v in state.get[1]]
    else:
        ids, vecs = [], []
    # lower-table buckets, memoized once per vector per invocation
    lower: dict[int, tuple] = {}

    def _lower(vid: int, vec) -> tuple:
        got = lower.get(vid)
        if got is None:
            got = tuple(_emb_bucket_py(vec, tj, weights)
                        for tj in range(ti))
            lower[vid] = got
        return got

    out: list[tuple[int, int, float]] = []
    for pdf in pdfs:
        pdf = pdf.sort_values("id")
        for new_id, new_vec in zip(pdf["id"], pdf["v"]):
            new_id, new_vec = int(new_id), [float(x) for x in new_vec]
            for old_id, old_vec in zip(ids, vecs):
                if old_id == new_id:
                    continue
                cos = _cos_py(old_vec, new_vec)
                if cos >= threshold and _emb_owns_pair(
                        _lower(old_id, old_vec), _lower(new_id, new_vec)):
                    a, b = sorted((old_id, new_id))
                    # RAW cosine: consumers round Spark-side (F.round,
                    # half-up like the batch API and the DuckDB oracle)
                    # — Python's round() is banker's and could diverge
                    # on an exact half at 1e-6
                    out.append((a, b, cos))
            ids.append(new_id)
            vecs.append(new_vec)
    if len(ids) > _MAX_EMB_BUCKET_DOCS:  # bound skewed/hot buckets
        ids = ids[-_MAX_EMB_BUCKET_DOCS:]
        vecs = vecs[-_MAX_EMB_BUCKET_DOCS:]
    state.update((ids, vecs))
    if timeout_ms:
        state.setTimeoutDuration(timeout_ms)
    if out:
        yield pd.DataFrame(out, columns=["id_a", "id_b", "cos_sim"])


def embedding_near_dup_stream(emb: DataFrame,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.38,
                              state_timeout_ms: int | None = 3_600_000
                              ) -> DataFrame:
    """Verified cosine near-dup PAIR STREAM: every emitted row means
    "the arriving vector has cosine >= threshold with a vector seen
    earlier (any batch) or earlier in this batch that it band-collides
    with" — the streaming twin of dedup.embedding_cosine_pairs_lsh,
    with the SAME recall contract (pairs separated in every signature
    table are missed by both).

    Pipeline: zero-shuffle usable-norm filter + 4-table LSH bucket
    explode (the batch blocking, incrementalized) → stateful
    per-(table, bucket) comparison holding (id, vector) pairs.
    Exactly-once emission via lowest-colliding-table ownership (the
    simhash stream's _owns_pair convention); the Python cosine/bucket
    arithmetic replicates the Spark fold order exactly, so the
    emitted cos_sim (RAW, un-rounded — round it Spark-side) equals
    the batch API's pre-round value to the last bit. The only
    shuffle is the groupBy on (tbl, bucket). Zero-norm / non-finite
    vectors are outside the cosine domain and never enter state.

    ``state_timeout_ms=None`` disables the eviction timer for finite
    ``trigger(availableNow)`` replays (see simhash_near_dup_stream);
    production continuous streams keep the default. State payload is
    the full double vector per (table, entry) — 4 x (8 + 8*dims)
    bytes/vector across buckets (~2 KB/vector at dims=64); at the 1B
    horizon shard the stream or lower ``_MAX_EMB_BUCKET_DOCS`` — but
    note a BINDING cap (or timer eviction) voids strict stream==batch
    equality: evicted vectors stop pairing, and a pair whose lowest
    colliding table evicted one member is lost even if both co-reside
    in a higher table (ownership caveat on _emb_owns_pair). The
    registered oracle row replays bounded corpora with the timer off
    and far below the cap, where equality is exact."""
    from functools import partial

    from datafusion_postgres_spark.operators.similarity import (
        _usable_norm, lsh_bucket_expr,
    )
    base = (emb.select(F.col(id_col).alias("id"),
                       F.transform(F.col(vec_col),
                                   lambda x: x.cast("double")).alias("v"))
            # exactly-dims vectors only (second review pass): the
            # Python bucket replica and Spark's zip_with disagree on
            # length-mismatched vectors (Spark null-pads to bucket 0,
            # Python would compute a real partial bucket), so vectors
            # outside the LSH geometry are outside the stream's domain
            .where(_usable_norm(F.col("v")) &
                   (F.size(F.col("v")) == _EMB_DIMS)))
    blocked = base.select(
        "id", "v",
        F.explode(F.array(*[
            F.struct(F.lit(ti).alias("tbl"),
                     lsh_bucket_expr("v", _EMB_N_PLANES,
                                     _EMB_DIMS,
                                     plane_offset=ti * _EMB_N_PLANES)
                     .alias("bucket"))
            for ti in range(_EMB_N_TABLES)])).alias("b")
    ).select("id", "v", "b.tbl", "b.bucket")
    return (blocked
            .groupBy("tbl", "bucket")
            .applyInPandasWithState(
                partial(_update_emb_bucket, threshold=threshold,
                        timeout_ms=state_timeout_ms),
                outputStructType=EMB_PAIR_SCHEMA,
                stateStructType=_EMB_BUCKET_STATE,
                outputMode="append",
                timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                             if state_timeout_ms
                             else GroupStateTimeout.NoTimeout)))

"""Operator/query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (plus the data-pipeline
operators) registers here as a named query:

  * ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
  * ``oracle``  — equivalent ANSI SQL for DuckDB over the same parquet
    tables (omitted only for genuinely non-SQL-expressible ops, which the
    driver then checks rows-only).

Cross-engine determinism conventions (hash-match gate), learned from the
round-1 driver failures (all five were representation-level, not value
bugs):
  * NO DecimalType in final output columns. The driver's value hash
    renders Decimal('x.x0') differently from the float path, so every
    query whose result contained a trailing-zero decimal failed
    hash_match while numerically equal. Decimals stay INTERNAL (exact,
    order-independent sums); the last step casts to DOUBLE or BIGINT.
  * decimal -> double cast is bit-identical across engines only while
    the scaled integer fits in 2^53 (~15 sig digits; DuckDB double-rounds
    int128/10^s above that). Bigger/finer sums first reduce scale
    tie-free: CAST(FLOOR(sum*100 + 0.5) AS DOUBLE)/100 (exact decimal
    arithmetic, half-up, no float ties).
  * averages / ratios: exact decimal or integer sums, then ONE double
    division (identical IEEE op on identical inputs) — never ROUND of a
    float sum (summation order varies with partitioning).
  * libm outputs (trig, sqrt, exp): ROUND(x, <=6) + 0.0 — the +0.0
    normalizes -0.0 (repr '-0.0' != '0.0' under a string hash; this was
    the actual pg_math_functions round-1 failure).
  * counts/ranks/sizes: CAST to BIGINT on both sides (DuckDB sums to
    HUGEINT).
  * no raw timestamp outputs (engines disagree on ns/tz) — emit DATE or
    extracted integer parts instead;
  * every computed column aliased identically in Spark and oracle SQL.

Registration order IS the driver's check order (it verifies the first 50
registered queries): ``PRIORITY`` below pins one query per SURVEY.md §2
operator row into that window; redundant variants keep their oracles but
register after the fold.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn, oracle)
        return fn
    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from datafusion_postgres_spark.sources.registry import read_table
    return read_table(spark, sf_dir, name)


def sorted_small(df: DataFrame, *cols: str) -> DataFrame:
    """Deterministic total order for a SMALL result (candidate pairs,
    top-k lists) without ``orderBy``'s RangePartitioning — whose sampling
    pass re-executes the whole upstream plan a second time (measured ~1.6x
    on the jaccard query). ``repartition(1)`` is a real shuffle boundary,
    so upstream stages keep their parallelism (a ``coalesce(1)`` would
    collapse them), and the single-partition sort is total."""
    return df.repartition(1).sortWithinPartitions(*cols)


_TRANSPILER = None


def pg_sql(spark: SparkSession, sf_dir: str, sql: str,
           tables: tuple[str, ...]) -> DataFrame:
    """Run a Postgres-dialect SQL string through the dialect layer —
    exercises the transpiler inside the correctness gate."""
    global _TRANSPILER
    if _TRANSPILER is None:
        from datafusion_postgres_spark.dialect.transpiler import PostgresTranspiler
        _TRANSPILER = PostgresTranspiler()
    for name in tables:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(_TRANSPILER.transpile(sql))


# The driver verifies the FIRST 50 registered queries (row-count + schema +
# value-hash vs the DuckDB oracle at sf0.01). This list covers every
# SURVEY.md §2.2-2.9 operator row plus the pipeline operators; merged
# "suite" queries (queries/suites.py) fold redundant variants so the whole
# surface fits in the window.
PRIORITY = [
    # ROTATION POLICY (round 5+): ~26 flagship rows stay pinned every
    # round; the remaining slots cycle through the out-of-window
    # oracled rows so every registered query re-earns a driver-green
    # CORRECTNESS entry every few rounds. A swapped-out row keeps its
    # oracle and stays in the local `tools/check_oracle.py` gate.
    # Round-10 swaps (24 rows absent from the r09 window — the verdict
    # asked for >= 15, prioritizing rows NO driver window has ever
    # checked):
    #   * the 17 never-driver-checked rows the round-9 verdict listed:
    #     agg_stats_numeric, argmax_per_group, agg_rollup (standing in
    #     for the verdict-listed agg_array_agg_ordered, whose
    #     array<string> output the driver window hash cannot take —
    #     check_oracle's UNSAFE OUTPUT TYPES guard; it stays in the
    #     local gate),
    #     conditional_functions, dedup_decontaminate,
    #     distinct_on_first_order, having_filter,
    #     multimodal_frame_sample, q12_shipmode_buckets (standing in
    #     for multimodal_byte_histogram, whose array<double> output the
    #     driver window hash cannot take — same guard as
    #     agg_array_agg_ordered; it stays in the local gate),
    #     qualified_wildcard, select_distinct, set_union_distinct,
    #     sort_multi_ordinal, sort_topk, string_functions_ext,
    #     text_chunk_documents, text_entropy;
    #   * the round-9 rows only the builder/judge had locally checked:
    #     dedup_embedding_keep, text_simhash_dedup_keep_scale,
    #     multimodal_image_dedup_incremental,
    #     multimodal_audio_dedup_incremental,
    #     multimodal_video_dedup_incremental,
    #     text_simhash_dedup_incremental;
    #   * the NEW round-10 row: dedup_embedding_incremental (the
    #     fifth-modality ingest loop).
    # Rotated out to the local gate (ALL driver-green in r09):
    # q6_forecast_revenue, q22_dormant_customers, window_rank_topn,
    # set_except, set_union_all, values_inline, tablefunc_unnest,
    # text_doc_features, text_gopher_filter, text_quality_classifier,
    # dedup_embedding_lsh, multimodal_metadata_oracle,
    # multimodal_video_probe, dedup_decontaminate_bloom,
    # text_bpe_merges, events_attribution, multimodal_audio_neardups,
    # multimodal_image_components, multimodal_mixed_format_neardups,
    # multimodal_audio_dedup_keep, multimodal_video_dedup_keep,
    # text_minhash_dedup_keep, text_clf_pr_curve, streaming_url_dedup.
    # TPC-H adaptations (compound shapes: joins + aggs + sorts)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q21_suppliers_kept_waiting",
    # filters / projections (§2.2)
    "filter_predicates", "qualified_wildcard", "select_distinct",
    "distinct_on_first_order", "conditional_functions",
    "string_functions_ext",
    # joins / subqueries (§2.3)
    "join_semi_anti", "subquery_scalar",
    # aggregation (§2.4)
    "agg_grouping_suite", "agg_rollup", "agg_stats_numeric",
    "argmax_per_group", "having_filter",
    # windows (§2.5)
    "window_suite",
    # sorts / set ops (§2.6-2.8)
    "sort_wildcard_topk", "sort_multi_ordinal", "sort_topk",
    "set_union_distinct",
    # REAL streaming executions (readStream -> stateful op -> memory sink)
    "streaming_hourly_rollup", "streaming_sessionize",
    # LLM-data-pipeline operators
    "dedup_exact_groups", "dedup_minhash_lsh",
    "dedup_ngram_jaccard_capped", "dedup_decontaminate",
    "text_chunk_documents", "text_entropy",
    "multimodal_frame_sample", "q12_shipmode_buckets",
    "sim_cosine_ivf_sq8", "sim_cosine_lsh_multiprobe",
    "text_trained_classifier",
    # round-7..10 marquee rows
    "multimodal_image_neardups", "text_url_dedup",
    "text_url_then_content_dedup", "text_trained_gate_scale",
    "multimodal_video_neardups",
    "multimodal_image_dedup_keep", "text_simhash_dedup_keep",
    "text_simhash_dedup_keep_scale", "dedup_embedding_keep",
    "multimodal_image_dedup_incremental",
    "multimodal_audio_dedup_incremental",
    "multimodal_video_dedup_incremental",
    "text_simhash_dedup_incremental", "dedup_embedding_incremental",
    "text_clf_auc",
]


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (forces registration) and return REGISTRY
    reordered so ``PRIORITY`` occupies the driver's checked window."""
    from datafusion_postgres_spark.queries import (  # noqa: F401
        dialect_q, events_q, joins_q, pipeline_q, relational, relational2,
        streaming_q, suites, tpch2,
    )
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names not registered: {missing}"
    ordered = {n: REGISTRY[n] for n in PRIORITY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    return ordered

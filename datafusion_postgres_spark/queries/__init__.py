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
    # ROTATION POLICY (round 5+): ~30 flagship rows stay pinned every
    # round; the remaining ~20 slots cycle through the out-of-window
    # oracled rows so every registered query re-earns a driver-green
    # CORRECTNESS entry every few rounds. A swapped-out row keeps its
    # oracle and stays in the local `tools/check_oracle.py` gate.
    # Round-7 swaps (23 rows absent from the r06 window, >= the 15 the
    # rotation policy asks for):
    #   * nine NEW/never-driver-checked rows cycle in — the round-7
    #     operators (multimodal_image_neardups, text_url_dedup,
    #     text_trained_gate_scale, dedup_ngram_jaccard_capped) and the
    #     round-6 rows that only ever passed the local gate
    #     (emb_gram_matrix, text_train_eval_split, text_domain_reweight,
    #     text_trained_gate, q21_suppliers_kept_waiting);
    #   * ten r05-era rows two windows out cycle back in
    #     (q2_min_cost_supplier, q8_market_share, pg_ordered_set_aggs,
    #     pg_recursive_cte, pg_jsonpath, pg_string_functions,
    #     pg_math_functions, join_scd2_enrich, dedup_components,
    #     sim_cosine_sq8).
    #   * four late-round-7 operators take the slots of four stable
    #     r06-green suite rows (multimodal_audio_neardups,
    #     multimodal_image_components, text_clf_auc, streaming_url_dedup
    #     in; join_outer_suite, set_ops_suite, tablefunc_unnest_values,
    #     agg_distinct_filter out to the local gate).
    # Rotated out to the local gate (ALL driver-green in r06):
    # q7_nation_pair_volume, q10_returned_items, pg_case_when,
    # ilike_filter, pg_regex_match, pg_array_functions,
    # pg_json_operators, pg_distinct_on, pg_generate_series_tf,
    # join_cross_comma, join_using, agg_collect_ordered,
    # window_ntile_first_last, events_hourly_rollup, text_corpus_profile,
    # dedup_ngram_jaccard (exact twin — its capped sibling takes the
    # window slot), text_overlap_profile, sim_threshold_profile,
    # text_source_contamination, join_outer_suite, set_ops_suite,
    # tablefunc_unnest_values, agg_distinct_filter.
    # TPC-H adaptations (compound shapes: joins + aggs + sorts)
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q2_min_cost_supplier", "q8_market_share", "q21_suppliers_kept_waiting",
    # filters / dialect (§2.2)
    "filter_predicates", "pg_any_all_array", "pg_casts",
    "dedup_embedding_cosine",
    "pg_string_functions", "pg_math_functions", "pg_jsonpath",
    # joins (§2.3)
    "join_semi_anti",
    "subquery_correlated_in", "lateral_subquery", "join_scd2_enrich",
    # aggregation (§2.4)
    "agg_grouping_suite", "pg_ordered_set_aggs",
    # windows / recursion (§2.5, §2.8)
    "window_suite", "pg_recursive_cte",
    # sorts / set ops / table functions (§2.6-2.8)
    "sort_wildcard_topk",
    # a REAL streaming execution of the rollup
    # (readStream -> watermarked window agg -> memory sink)
    "streaming_hourly_rollup",
    # LLM-data-pipeline operators
    "text_doc_features", "text_gopher_filter",
    "dedup_exact_groups", "dedup_minhash_lsh", "dedup_components",
    "dedup_ngram_jaccard_capped",
    "multimodal_metadata_oracle", "multimodal_video_probe",
    "text_dsir_weights", "text_lm_perplexity", "dedup_decontaminate_bloom",
    "text_bpe_merges", "sim_cosine_ivf_sq8", "sim_cosine_lsh_multiprobe",
    "sim_cosine_sq8", "text_trained_classifier",
    # round-7 rows earning their first driver-green entry
    "multimodal_image_neardups", "text_url_dedup",
    "text_trained_gate", "text_trained_gate_scale",
    "emb_gram_matrix", "text_train_eval_split", "text_domain_reweight",
    "multimodal_audio_neardups", "multimodal_image_components",
    "text_clf_auc", "streaming_url_dedup",
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

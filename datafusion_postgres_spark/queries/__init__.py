"""Operator/query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (plus the data-pipeline
operators) registers here as a named query:

  * ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation.
  * ``oracle``  — equivalent ANSI SQL for DuckDB over the same parquet
    tables (omitted only for genuinely non-SQL-expressible ops, which the
    driver then checks rows-only).

Cross-engine determinism conventions (hash-match gate):
  * money aggregates: per-row CAST to DECIMAL before SUM, final CAST to a
    fixed DECIMAL type on both sides (float sums are order-dependent);
  * averages / float outputs: ROUND(x, 4..6);
  * integer sums: CAST to BIGINT on both sides (DuckDB sums to HUGEINT);
  * no raw timestamp outputs (engines disagree on ns/tz) — emit DATE or
    extracted integer parts instead;
  * every computed column aliased identically in Spark and oracle SQL.
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


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (forces registration) and return REGISTRY."""
    from datafusion_postgres_spark.queries import (  # noqa: F401
        dialect_q, events_q, pipeline_q, relational, relational2,
    )
    return REGISTRY

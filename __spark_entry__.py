"""Driver contract for the spark-graft builder (PySpark target).

Backed by ``datafusion_postgres_spark.queries`` — the operator/query
registry (one entry per implemented operator from SURVEY.md §2 plus the
data-pipeline operators). See that package for determinism conventions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _configure(spark: SparkSession) -> SparkSession:
    # events.parquet is timestamp[ns]; read the raw int64 (converted in
    # sources.registry.read_table). Safe for every other table.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
    # catalog-free function surface only: the registered queries never
    # touch pg_catalog views, and full register_all costs ~30s/session
    # (catalog bootstrap) the driver would pay on every fresh session.
    from datafusion_postgres_spark.functions import register_functions
    register_functions(spark)
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    from datafusion_postgres_spark.queries import load_all

    _configure(spark)
    reg = load_all()
    return reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datafusion_postgres_spark.queries import load_all

    reg = load_all()

    def bind(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return reg[name].fn(spark, sf_dir)
        return run

    return {name: bind(name) for name in reg}


def oracle_sql() -> dict[str, str]:
    from datafusion_postgres_spark.queries import load_all

    reg = load_all()
    return {name: spec.oracle for name, spec in reg.items()
            if spec.oracle is not None}

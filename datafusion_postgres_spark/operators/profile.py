"""Table profiling: per-column statistics in ONE scan.

The reference exposes table statistics only through the catalog
(`pg_stat_*` shells) and delegates ANALYZE to a no-op
(`datafusion-postgres/src/handlers.rs` treats it as a pass-through
command); engines like DuckDB ship a ``SUMMARIZE`` verb instead. This
operator is the Spark-first version of that verb: every column's
(count, nulls, distinct, min, max) computed as ONE wide aggregate —
a single map-side-combined pass over the data, then the 1×N result row
unpivots driver-free into the (column, stats) long form via stack().

At 100 TB: one scan, one partial-agg shuffle of a single row per
partition; count_distinct is the only memory-relevant term — swap
``exact_distinct=False`` for approx_count_distinct (HLL++, bounded
state) when profiling wide high-cardinality tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """(column, n, n_null, n_distinct, min_value, max_value) per column;
    min/max rendered as strings so mixed column types share one schema
    (timestamps render as ISO via CAST AS STRING on both engines)."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        nd = (F.countDistinct(col) if exact_distinct
              else F.approx_count_distinct(col))
        aggs += [
            F.count(col).alias(f"__n_{c}"),
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            nd.alias(f"__nd_{c}"),
            F.min(col).cast("string").alias(f"__mn_{c}"),
            F.max(col).cast("string").alias(f"__mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [f"'{c}'", f"__n_{c}", f"__nn_{c}", f"__nd_{c}",
                       f"__mn_{c}", f"__mx_{c}"]
    stacked = wide.select(F.expr(
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column_name, n, n_null, n_distinct, min_value, max_value)"))
    return stacked.select(
        "column_name",
        F.col("n").cast("bigint").alias("n"),
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
        "min_value", "max_value")

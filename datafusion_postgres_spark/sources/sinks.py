"""Write-side: partitioned / bucketed parquet sinks.

The reference has only an INSERT sink (handlers.rs:354-376). At 100 TB the
write layout IS the query plan: a fact table bucketed on its join key
joins co-located (zero shuffle) against any table bucketed the same way,
and partition columns prune scans to the slices a filter touches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_by: list[str],
                      mode: str = "overwrite") -> None:
    """Hive-style partitioned parquet: filters on partition columns become
    directory pruning (zero data read for untouched slices)."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(df: DataFrame, table: str, bucket_by: list[str],
                   num_buckets: int = 32, sort_by: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Bucketed managed table: equi-joins and aggregations on the bucket
    key skip the shuffle entirely (Catalyst sees the hashed layout).
    Size num_buckets so a bucket ~fits an executor's working memory at the
    target scale: at 100 TB / 1000 executors, thousands of buckets."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, table_a: str, table_b: str,
                        key: str) -> bool:
    """True when both tables are bucketed on `key` with equal bucket
    counts — the co-located-join precondition."""
    def bucket_spec(tbl):
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {tbl}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        return info.get("Num Buckets"), info.get("Bucket Columns")

    na, ca = bucket_spec(table_a)
    nb, cb = bucket_spec(table_b)
    return (na is not None and na == nb and ca == cb and
            ca is not None and key in ca)

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


def zorder_value(df: DataFrame, cols: list[str], bits: int = 16):
    """Z-value (Morton code) column over 2+ numeric/timestamp columns —
    the public multi-dimensional clustering technique (Morton 1966; the
    layout behind Delta/Iceberg OPTIMIZE ZORDER BY).

    Each column linearly scales to a ``bits``-bit integer between its
    min and max (ONE tiny min/max aggregate per call — bounded output,
    broadcast back as literals), then the per-column bits interleave
    into a single long. Nearby z-values are near in EVERY clustered
    dimension. Linear scaling keeps the map monotone per column (a
    skewed column still orders correctly, it just uses its levels
    unevenly); string columns are rejected — hashing would destroy the
    locality that makes the layout useful.

    Returns (df_with_cols_cast, zcol_expression)."""
    from pyspark.sql import functions as F
    if len(cols) < 2:
        raise ValueError("zorder needs >= 2 columns (sort for one)")
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} x {len(cols)} cols exceeds long")
    for c in cols:
        t = df.schema[c].dataType.simpleString()
        if t in ("string", "binary", "boolean"):
            raise ValueError(
                f"zorder column {c!r} has non-orderable-scalable type {t}")
    casted = df.select(
        "*", *[F.col(c).cast("timestamp").cast("long").alias(f"__z_{c}")
               if df.schema[c].dataType.simpleString().startswith("timestamp")
               else F.col(c).cast("double").alias(f"__z_{c}")
               for c in cols])
    stats = casted.agg(*[f for c in cols for f in
                         (F.min(f"__z_{c}").cast("double").alias(f"mn_{c}"),
                          F.max(f"__z_{c}").cast("double").alias(f"mx_{c}"))
                         ]).collect()[0]
    if any(stats[f"mn_{c}"] is None or stats[f"mx_{c}"] is None
           for c in cols):
        raise ValueError(
            "zorder over empty input (or an all-NULL cluster column): "
            "no min/max span to scale against — nothing to cluster")
    levels = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = (mx - mn) or 1.0
        rank = F.least(
            F.lit(levels),
            F.floor((F.coalesce(F.col(f"__z_{c}").cast("double"),
                                F.lit(mn)) - F.lit(mn)) /
                    F.lit(span) * levels)).cast("long")
        for b in range(bits):
            z = z + F.shiftleft(
                F.shiftright(rank, b).bitwiseAND(F.lit(1)),
                b * len(cols) + ci)
    return casted, z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int = 32, bits: int = 16,
                   mode: str = "overwrite") -> None:
    """Write parquet clustered on a Z-order curve over ``cols``: range-
    partition by z-value, sort within files, drop the helper columns.

    Why it matters at 100 TB: a file written this way carries a NARROW
    min/max footer range on EVERY clustered column simultaneously, so
    parquet row-group/file stats pruning serves filters on any of them
    — a plain write gives narrow stats on at most the insertion-order
    column. The layout is pinned by reading the written footers in
    tests (per-file span a fraction of the global span on BOTH columns
    at once)."""
    casted, z = zorder_value(df, cols, bits)
    (casted.withColumn("__z", z)
     .repartitionByRange(n_files, "__z")
     .sortWithinPartitions("__z")
     .drop("__z", *[f"__z_{c}" for c in cols])
     .write.mode(mode).parquet(path))

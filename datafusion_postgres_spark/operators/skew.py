"""Skew-handling join helpers.

AQE's skew-join splitting (enabled in DEFAULT_CONF) handles most skew at
runtime; explicit salting remains the tool for *extreme* hot keys (one key
holding >1 executor's worth of rows) and for aggregations, which AQE does
not re-balance. Both helpers preserve exact semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where `big`'s key distribution is heavily skewed.

    big gets a random salt in [0, salt_buckets); small is exploded
    salt_buckets× so every (key, salt) pair finds its match. The hot key's
    rows spread over salt_buckets tasks instead of one straggler.
    Replication cost: |small| × salt_buckets — use for dim-sized right
    sides that are still too big (or too skew-prone) to broadcast.
    """
    salted_big = big.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(df: DataFrame, key: str, agg_col: str,
                  salt_buckets: int = 16) -> DataFrame:
    """Skew-resistant SUM/COUNT: pre-aggregate on (key, salt), then merge.

    Spark's hash aggregate already does map-side partial aggregation, so
    this only wins when a single key's *partials* still overwhelm one
    reducer — i.e. extreme cardinality skew with high per-key row counts.
    Returns (key, sum_value, count_value)."""
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    partial = (salted.groupBy(key, "_salt")
               .agg(F.sum(agg_col).alias("_s"), F.count("*").alias("_c")))
    return (partial.groupBy(key)
            .agg(F.sum("_s").alias(f"sum_{agg_col}"),
                 F.sum("_c").alias("count_value")))

"""Event-analytics operators beyond the reference's SQL surface.

Classic product-analytics funnel over an unbounded event log: how many
users complete step1 → step2 → … in order. Each stage is one
user_id-keyed join + partial-aggregated min — all shuffles share the
user_id partitioning, so at 100 TB the chain reuses one exchange layout
and never widens beyond (user, ts) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def funnel_stage_users(events: DataFrame, steps: list[str],
                       user_col: str = "user_id", ts_col: str = "ts",
                       type_col: str = "event_type") -> list[DataFrame]:
    """Per stage i: (user, earliest completion time of steps[0..i] in
    order). Strictly increasing timestamps between stages (PG/analytics
    convention: a click at the same instant as the view doesn't count)."""
    stages: list[DataFrame] = []
    prev: DataFrame | None = None
    for step in steps:
        ev = (events.where(F.col(type_col) == step)
              .select(F.col(user_col).alias("user_id"),
                      F.col(ts_col).alias("ts")))
        if prev is None:
            cur = ev.groupBy("user_id").agg(F.min("ts").alias("ts"))
        else:
            cur = (ev.join(prev.select("user_id",
                                       F.col("ts").alias("prev_ts")),
                           "user_id")
                   .where(F.col("ts") > F.col("prev_ts"))
                   .groupBy("user_id").agg(F.min("ts").alias("ts")))
        stages.append(cur)
        prev = cur
    return stages


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id", ts_col: str = "ts",
                  type_col: str = "event_type") -> DataFrame:
    """(stage, stage_ord, n_users) — users reaching each funnel stage in
    order. n_users is monotonically non-increasing by construction."""
    stages = funnel_stage_users(events, steps, user_col, ts_col, type_col)
    parts = [
        s.agg(F.count("*").alias("n_users"))
        .select(F.lit(step).alias("stage"),
                F.lit(i + 1).alias("stage_ord"),
                F.col("n_users").cast("bigint"))
        for i, (step, s) in enumerate(zip(steps, stages))]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("stage_ord")


def cohort_retention(events: DataFrame, period: str = "week",
                     user_col: str = "user_id", ts_col: str = "ts",
                     max_periods: int = 8) -> DataFrame:
    """Classic retention triangle: users grouped by first-activity period
    (cohort), counted again in each later period they return.

    Two user_id-keyed shuffles total (first-activity aggregate + the
    cohort join), then one small (cohort, period_n) aggregate — the
    output is O(max_periods^2) rows whatever the corpus size."""
    trunc = F.date_trunc(period, F.col(ts_col))
    first = (events
             .groupBy(F.col(user_col).alias("user_id"))
             .agg(F.min(trunc).alias("cohort_ts")))
    activity = events.select(
        F.col(user_col).alias("user_id"), trunc.alias("period_ts")).distinct()
    div = {"week": 7 * 86400, "day": 86400}.get(period)
    if div is None:
        raise ValueError(f"unsupported period {period!r}")
    period_n = ((F.unix_timestamp("period_ts")
                 - F.unix_timestamp("cohort_ts")) / div).cast("int")
    return (activity.join(first, "user_id")
            .withColumn("period_n", period_n)
            .where(F.col("period_n") < max_periods)
            .groupBy(F.to_date("cohort_ts").alias("cohort"), "period_n")
            .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
            .orderBy("cohort", "period_n"))


def time_weighted_avg(events: DataFrame, value_col: str = "value",
                      user_col: str = "user_id", ts_col: str = "ts",
                      tie_col: str = "event_id") -> DataFrame:
    """Per-key time-weighted average of an irregularly-sampled value:
    each sample holds until the next one (step interpolation), so
    twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first); keys with <2 samples drop
    (no interval to weight). One key shuffle (window + aggregate share
    the partitioning).

    Hash-stable across engines by construction: durations are integer
    microseconds, values decimal(12,2), products and sums exact decimal,
    ONE double division at the end (float summation order never
    matters)."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tie_col)
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur = F.lead(t_us).over(w) - t_us
    v = F.col(value_col).cast("decimal(12,2)")
    s = (events.select(F.col(user_col).alias("user_id"),
                       v.alias("v"), dur.alias("dur_us"))
         .where(F.col("dur_us").isNotNull()))
    return (s.groupBy("user_id")
            .agg((F.count("*") + 1).cast("bigint").alias("n_samples"),
                 F.sum("dur_us").cast("bigint").alias("span_us"),
                 (F.round(F.sum(F.col("v") * F.col("dur_us"))
                          .cast("double") /
                          F.sum("dur_us").cast("double"), 6) + 0.0)
                 .alias("twa")))


def sessionize_bucketed(events: DataFrame, key: str = "user_id",
                        ts_col: str = "ts", timeout_s: int = 1800,
                        tie_col: str = "event_id",
                        n_buckets: int = 64,
                        bucket_width_s: int | None = None) -> DataFrame:
    """Gap-based sessionization with HOT-KEY immunity: per-event global
    ``session_id`` (1-based per key) IDENTICAL to the classic
    lag → flag → running-sum over a bare-key window, but the heavy
    window partitions on (key, time_bucket) so one user owning 10% of a
    100 TB stream spreads over its time range instead of serializing an
    executor (AQE cannot split window partitions — the same structural
    fix as ``joins.asof_join_bucketed``).

    Exactness: local sessionization inside each bucket, then a per-key
    segmented merge over ONE-ROW bucket summaries: a bucket's first
    local session joins the previous populated bucket's last session
    exactly when ``first_ts - prev_last_ts <= timeout`` — which is the
    same gap the bare-key window would have tested, because the
    previous event of a bucket's first event IS the previous populated
    bucket's last event (equal timestamps can't straddle a bucket
    boundary). Global id = 1 + sum of (local_sessions - merge) over
    earlier buckets, + local index, − merge.

    Cost: one (key, bucket) shuffle of the events + a summary-row
    shuffle per key; ``bucket_width_s`` skips the min/max sizing job.
    """
    secs = F.col(ts_col).cast("timestamp").cast("long")
    if bucket_width_s is None:
        lo, hi = events.agg(F.min(secs), F.max(secs)).first()
        bucket_width_s = 1 if lo is None else \
            max(1, (int(hi) - int(lo)) // max(n_buckets, 1) + 1)
    ev = events.withColumn("__secs", secs).withColumn(
        "__bkt", F.floor(F.col("__secs") / F.lit(int(bucket_width_s))))
    w1 = Window.partitionBy(key, "__bkt").orderBy(ts_col, tie_col)
    gap = F.col("__secs") - F.lag("__secs").over(w1)
    local_new = F.when(gap.isNull() | (gap > timeout_s), 1).otherwise(0)
    # cache: the windowed frame feeds BOTH the per-event output and the
    # bucket summaries; without it the event-sized scan + (key, bucket)
    # shuffle run twice (the two branches get different pushed filters,
    # which defeats Spark's exchange reuse). Generation-cached: the next
    # invocation releases this one, so a long-lived session holds one
    # event-scale cache, not an unbounded chain (operators/cachectl.py).
    from datafusion_postgres_spark.operators.cachectl import (
        cache_generation,
    )
    ev1 = cache_generation("sessionize_bucketed", ev.withColumn(
        "__s_loc",
        F.sum(local_new).over(w1.rowsBetween(Window.unboundedPreceding, 0))))
    summ = (ev1.groupBy(key, "__bkt")
            .agg(F.min("__secs").alias("__first"),
                 F.max("__secs").alias("__last"),
                 F.max("__s_loc").alias("__n_loc")))
    w2 = Window.partitionBy(key).orderBy("__bkt")
    merge = F.when(
        (F.col("__first") - F.lag("__last").over(w2)) <= timeout_s,
        F.lit(1)).otherwise(F.lit(0))
    carry = (summ.withColumn("__merge", merge)
             .withColumn("__adj", F.col("__n_loc") - F.col("__merge"))
             .withColumn("__prev", F.coalesce(
                 F.sum("__adj").over(
                     w2.rowsBetween(Window.unboundedPreceding, -1)),
                 F.lit(0)))
             .select(key, "__bkt", "__merge", "__prev"))
    sid = F.when((F.col("__merge") == 1) & (F.col("__s_loc") == 1),
                 F.col("__prev")) \
        .otherwise(F.col("__prev") + F.col("__s_loc") - F.col("__merge"))
    return (ev1.join(carry, [key, "__bkt"])
            .withColumn("session_id", sid.cast("bigint"))
            .drop("__secs", "__bkt", "__s_loc", "__merge", "__prev"))

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

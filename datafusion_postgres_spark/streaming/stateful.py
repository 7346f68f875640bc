"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windows (streaming/ops.py) cover time-bucketed analytics;
this module is the escape hatch the reference has no analog for: arbitrary
per-key state machines over an unbounded stream. Example operator: a
per-user running profile (event count, value sum, EWMA of value, last
event type) updated per micro-batch, with timeout-based state eviction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

PROFILE_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("ewma_value", DoubleType()),
    StructField("last_event_type", StringType()),
])

_STATE_SCHEMA = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
    StructField("ewma_value", DoubleType()),
    StructField("last_event_type", StringType()),
])


def _update_profile(key, pdfs: Iterator[pd.DataFrame],
                    state: GroupState,
                    timeout_ms: int | None = 3_600_000
                    ) -> Iterator[pd.DataFrame]:
    # timeout invocation: evict idle-user state instead of re-arming it
    if state.hasTimedOut:
        for _ in pdfs:  # drain: the worker protocol requires consumption
            pass
        state.remove()
        return
    (user_id,) = key
    alpha = 0.2
    if state.exists:
        n, total, ewma, last_type = state.get
    else:
        n, total, ewma, last_type = 0, 0.0, None, None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for v, et in zip(pdf["value"], pdf["event_type"]):
            n += 1
            total += float(v)
            ewma = float(v) if ewma is None else \
                alpha * float(v) + (1 - alpha) * ewma
            last_type = et
    state.update((n, total, ewma, last_type))
    if timeout_ms:
        state.setTimeoutDuration(timeout_ms)  # evict idle users
    yield pd.DataFrame([{
        "user_id": user_id, "n_events": n, "total_value": total,
        "ewma_value": ewma, "last_event_type": last_type}])


def user_profiles(events: DataFrame,
                  state_timeout_ms: int | None = 3_600_000) -> DataFrame:
    """Per-user stateful running profile over a stream of events
    (event_id, ts, user_id, event_type, value, ...).

    ``state_timeout_ms=None`` disables the eviction timer — required for
    finite replays under ``trigger(availableNow)``, where live timers
    keep re-triggering empty batches and the query never quiesces.
    Production continuous streams keep the default."""
    from functools import partial
    return (events
            .groupBy("user_id")
            .applyInPandasWithState(
                partial(_update_profile, timeout_ms=state_timeout_ms),
                outputStructType=PROFILE_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                             if state_timeout_ms
                             else GroupStateTimeout.NoTimeout)))

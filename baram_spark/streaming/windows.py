"""Streaming windowed aggregations + custom stateful sessionization.

The trend/window operators of SURVEY §2.6 in their streaming form:

- ``windowed_counts``: tumbling/sliding event-time windows with a watermark
  for late data — the continuous version of ``trends.daily_counts``.
- ``sessionize_event_time``: TRUE event-time-gap sessions via Spark's
  native ``session_window`` + watermark — out-of-order/late events merge
  into the right session; a session closes when the watermark passes
  last_event + gap. This is the semantics the reference's time-slot
  grouping implies, and the default choice.
- ``sessionize``: custom stateful operator via ``applyInPandasWithState``
  (the engine's escape hatch shape for semantics Spark lacks natively).
  NOTE its timeout is PROCESSING-time inactivity: session bounds are
  event-time min/max, but the close trigger is wall-clock silence — the
  demonstration of the custom-stateful-operator pattern, not an
  event-time-gap implementation (use ``sessionize_event_time`` for that).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType, TimestampType,
)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Event-time windowed counts + value sums with late-data watermark."""
    # watermarks require TIMESTAMP (with tz); parquet NTZ columns are cast
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    win = (
        F.window(F.col(ts_col), window, slide)
        if slide
        else F.window(F.col(ts_col), window)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("win"), F.col(key_col).alias("key"))
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "key", "cnt", "value_sum",
        )
    )


def sessionize_event_time(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Event-time sessionization: a user's events belong to one session
    while consecutive EVENT timestamps are within ``gap_minutes``; the
    session closes when the watermark passes last_event + gap, so
    out-of-order events (within the watermark) merge into the correct
    session regardless of arrival order.

    Built on Spark's native ``session_window`` — fully incremental state
    in the streaming engine, no python state. ``session_end`` follows
    Spark's convention (last event + gap). Works identically on batch
    DataFrames (the watermark is a no-op there)."""
    events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(
                F.col(ts_col), f"{gap_minutes} minutes"
            ).alias("w"),
            F.col(user_col).alias("user_id"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "value_sum",
        )
    )


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Close a user session after ``gap_minutes`` of processing-time
    inactivity; emit (user, start, end, n_events, value_sum) per session."""
    gap_ms = gap_minutes * 60 * 1000

    def update(key, pdfs, state: GroupState):
        user_id = key[0]
        if state.hasTimedOut:
            start_us, last_us, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return
        start_us = last_us = None
        n, vsum = 0, 0.0
        if state.exists:
            start_us, last_us, n, vsum = state.get
        for pdf in pdfs:
            ts_us = (pdf[ts_col].astype("int64") // 1_000).tolist()  # microseconds
            if start_us is None:
                start_us = min(ts_us)
                last_us = max(ts_us)
            else:
                start_us = min(start_us, min(ts_us))
                last_us = max(last_us, max(ts_us))
            n += len(pdf)
            vsum += float(pdf[value_col].sum())
        state.update((start_us, last_us, n, vsum))
        state.setTimeoutDuration(gap_ms)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[ns]"),
                "session_end": pd.Series([], dtype="datetime64[ns]"),
                "n_events": pd.Series([], dtype="int64"),
                "value_sum": pd.Series([], dtype="float64"),
            }
        )

    return (
        events.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )

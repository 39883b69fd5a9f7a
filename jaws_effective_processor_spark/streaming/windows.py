"""Event-time windowed aggregation with watermarks.

The reference has NO event-time processing: all time is wall-clock
(SURVEY.md §2.7 — LogAppendTime brokers, System.currentTimeMillis
stamps). This module is the §7 extension that a Spark-native engine
gets from Structured Streaming: tumbling/sliding event-time windows
with a watermark bounding state and dropping late data.

Scale: windowed aggregation state is keyed by (window, group); the
watermark evicts finalized windows from the state store, so state
size is bounded by (window span / slide) x group cardinality, not by
stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_ms_col: str = "ms",
    group_col: str = "event_type",
) -> DataFrame:
    """Tumbling event-time counts per group with late-data bound.

    In append mode a window is emitted exactly once, when the
    watermark passes its end — the batch analog is a plain
    groupBy(window, group) count over the full log.
    """
    with_ts = stream.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_ms_col))
    )
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), F.col(group_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("window.start")).alias("win_start_ms"),
            group_col,
            "n",
        )
    )


def batch_windowed_counts(
    df: DataFrame,
    window: str = "1 hour",
    ts_ms_col: str = "ms",
    group_col: str = "event_type",
) -> DataFrame:
    """The batch oracle for `windowed_event_counts` (all windows)."""
    with_ts = df.withColumn("event_time", F.timestamp_millis(F.col(ts_ms_col)))
    return (
        with_ts.groupBy(F.window("event_time", window), F.col(group_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_millis(F.col("window.start")).alias("win_start_ms"),
            group_col,
            "n",
        )
    )

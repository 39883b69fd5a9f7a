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


def session_windowed_counts(
    stream: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_ms_col: str = "ms",
    key_col: str = "user_id",
) -> DataFrame:
    """Event-time session windows (gap-based) per key — the streaming
    form of the batch sessionization query (relational.py). A session
    closes when `gap` passes with no event; the watermark finalizes
    and evicts closed sessions from state."""
    with_ts = stream.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_ms_col))
    )
    return (
        with_ts.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_millis(F.col("session_window.start")).alias("start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("end_ms"),
            "n_events",
        )
    )


def batch_session_counts(
    df: DataFrame,
    gap: str = "5 minutes",
    ts_ms_col: str = "ms",
    key_col: str = "user_id",
) -> DataFrame:
    """Batch oracle for `session_windowed_counts` (all sessions)."""
    with_ts = df.withColumn("event_time", F.timestamp_millis(F.col(ts_ms_col)))
    return (
        with_ts.groupBy(F.session_window("event_time", gap), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_millis(F.col("session_window.start")).alias("start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("end_ms"),
            "n_events",
        )
    )


def deduped_stream(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "30 minutes",
    ts_ms_col: str = "ms",
) -> DataFrame:
    """Streaming exact dedup with bounded state — the ingestion-side
    twin of the batch dedup family (functions/dedup.py).

    `dropDuplicatesWithinWatermark` keeps one row per key and evicts a
    key's dedup state once the watermark passes its event time, so
    state is bounded by (watermark span x key arrival rate), not by
    stream length — the ONLY shape that survives an unbounded 100 TB
    ingest (plain dropDuplicates on a stream retains every key ever
    seen). Duplicates arriving within the watermark of the first
    sighting are suppressed; the batch analog over any replayable log
    is first-sighting-per-key (min event time wins).
    """
    key_cols = key_cols or ["event_id"]
    with_ts = stream.withColumn(
        "event_time", F.timestamp_millis(F.col(ts_ms_col))
    )
    return with_ts.withWatermark(
        "event_time", watermark
    ).dropDuplicatesWithinWatermark(key_cols)


def batch_first_sighting(
    df: DataFrame,
    key_cols: list[str] | None = None,
    ts_ms_col: str = "ms",
) -> DataFrame:
    """Batch oracle for `deduped_stream`: one row per key (duplicates
    within any window collapse to a single sighting)."""
    key_cols = key_cols or ["event_id"]
    return df.dropDuplicates(key_cols)

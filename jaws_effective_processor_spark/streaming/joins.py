"""Stream-stream interval join (event-time, watermark-bounded state).

The reference never joins two live streams — its joins are
KTable-backed lookups (SURVEY.md §2.3). This is the §7 extension a
Spark-native engine gets from Structured Streaming: a true
stream-stream inner join where BOTH sides buffer in the state store
and the event-time range condition + watermarks bound how long.

Scale: state per side is (watermark span + interval span) of data,
keyed by the join key — independent of stream length. The range
condition is what lets Spark evict: without it a stream-stream join
must buffer a side forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """left x right on key with right.event_time in
    [left.event_time - interval, left.event_time] (inner).

    Both inputs need an epoch-millis `ms` column; distinct non-key
    columns are the caller's responsibility.
    """
    lw = left.withColumn(
        "l_time", F.timestamp_millis(F.col("ms"))
    ).withWatermark("l_time", watermark)
    rw = (
        right.withColumnRenamed(key, f"r_{key}")
        .withColumn("r_time", F.timestamp_millis(F.col("ms")))
        .withWatermark("r_time", watermark)
    )
    return lw.drop("ms").join(
        rw.drop("ms"),
        F.expr(
            f"{key} = r_{key} AND r_time BETWEEN "
            f"l_time - interval {interval} AND l_time"
        ),
        "inner",
    )


def batch_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval_ms: int = 30 * 60_000,
) -> DataFrame:
    """The batch twin: same predicate over the full logs."""
    r = right.withColumnRenamed(key, f"r_{key}").withColumnRenamed(
        "ms", "r_ms"
    )
    return left.join(
        r,
        (F.col(key) == F.col(f"r_{key}"))
        & (F.col("r_ms") >= F.col("ms") - interval_ms)
        & (F.col("r_ms") <= F.col("ms")),
        "inner",
    )

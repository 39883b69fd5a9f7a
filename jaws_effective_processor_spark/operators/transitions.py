"""T1 — activation transition detection.

The reference keeps the previous activation per key in a RocksDB
store and flags null->non-null as transitionToActive / non-null->null
as transitionToNormal, with NoActivation normalized to null
(ActivationRule.java:362-414). Batch analog: `lag()` over the per-key
ordered activation log; the boolean normalization makes
NoActivation == tombstone == "not active".

Scale: one window shuffle on `name`. The same shuffle partitioning is
reused by the downstream joins on `name` (no extra exchange — AQE
keeps the co-partitioning), which is why transitions are computed on
the log *before* compaction instead of re-deriving state later.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .compaction import latest_per_key


def with_transitions(activation_log: DataFrame) -> DataFrame:
    """Adds cur/prev active booleans + transition flags to each event."""
    w = Window.partitionBy("name").orderBy("seq")
    cur = F.coalesce(F.col("union_type") == "Activation", F.lit(False))
    df = activation_log.withColumn("cur_active", cur)
    df = df.withColumn(
        "prev_active", F.coalesce(F.lag("cur_active").over(w), F.lit(False))
    )
    return df.withColumn(
        "transition_to_active", F.col("cur_active") & ~F.col("prev_active")
    ).withColumn(
        "transition_to_normal", ~F.col("cur_active") & F.col("prev_active")
    )


def latest_activation_state(activation_log: DataFrame) -> DataFrame:
    """Current per-alarm activation + the flags of the latest event."""
    return latest_per_key(with_transitions(activation_log), ["name"]).select(
        "name",
        F.col("cur_active").alias("active"),
        "transition_to_active",
        "transition_to_normal",
    )

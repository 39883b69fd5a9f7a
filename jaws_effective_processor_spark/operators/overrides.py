"""A1 + W1/W2 + the J3 pivot — the alarm-overrides table.

The reference maintains a per-alarm OverrideList via a groupBy
aggregate with add/subtract (ActivationRule.java:277-314) and then
pivots it into an AlarmOverrideSet by instanceof dispatch
(OverrideJoiner, ActivationRule.java:199-275). In batch both steps
collapse into: latest record per (name, type) composite key, drop
tombstones, conditional-aggregate pivot to one row per name.

Expiration (ShelveExpirationRule.java:105-190,
OnDelayExpirationRule.java:108-196) emits tombstones for Shelved /
OnDelayed overrides past their expiration; the batch analog filters
them out against the frozen snapshot clock before the pivot.

Scale: one shuffle on (name, type) for compaction, one on name for the
pivot — both map-side-combinable aggregations; override cardinality is
bounded by 7x alarm count so the pivot output is small. No skew risk:
keys are alarm names (high cardinality, uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..adapters import OVERRIDE_TYPES
from .compaction import latest_per_key


def latest_overrides(overrides_log: DataFrame) -> DataFrame:
    """Compacted (name, type) override table, tombstones dropped."""
    return latest_per_key(overrides_log, ["name", "type"]).filter(~F.col("tombstone"))


def expired_overrides(overrides_log: DataFrame, snapshot: DataFrame) -> DataFrame:
    """W1/W2 batch analog — overrides whose expiry has passed.

    These are the (name, type) keys the expiration rules would
    tombstone on the feedback topic (ShelveExpirationRule.java:147-169,
    OnDelayExpirationRule.java:160-189).
    """
    expirable = F.col("type").isin("Shelved", "OnDelayed")
    return (
        latest_overrides(overrides_log)
        .crossJoin(F.broadcast(snapshot))
        .filter(expirable & (F.col("expiration") <= F.col("snapshot_ms")))
    )


def live_overrides(overrides_log: DataFrame, snapshot: DataFrame) -> DataFrame:
    """Compacted overrides minus tombstoned and expired entries."""
    expirable = F.col("type").isin("Shelved", "OnDelayed")
    return (
        latest_overrides(overrides_log)
        .crossJoin(F.broadcast(snapshot))
        .filter(~(expirable & (F.col("expiration") <= F.col("snapshot_ms"))))
    )


def override_set(live: DataFrame) -> DataFrame:
    """Pivot live overrides to one row per alarm (AlarmOverrideSet).

    Boolean presence flags ov_<type> plus the payload fields the
    downstream rules read (shelved.oneshot, expirations).
    """
    aggs = [
        F.coalesce(F.bool_or(F.col("type") == t), F.lit(False)).alias(
            f"ov_{t.lower()}"
        )
        for t in OVERRIDE_TYPES
    ]
    aggs.append(
        F.max(F.when(F.col("type") == "Shelved", F.col("oneshot"))).alias(
            "shelved_oneshot"
        )
    )
    aggs.append(
        F.max(F.when(F.col("type") == "OnDelayed", F.col("expiration"))).alias(
            "ondelayed_expiration"
        )
    )
    aggs.append(
        F.max(F.when(F.col("type") == "Shelved", F.col("expiration"))).alias(
            "shelved_expiration"
        )
    )
    return live.groupBy("name").agg(*aggs)

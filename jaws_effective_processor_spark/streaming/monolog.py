"""Shared monolog builders: the KTable joins every transport uses.

The reference's ActivationRule materializes a per-alarm "monolog" —
activation transitions joined with the current registration and
override-set KTable snapshots (ActivationRule.java:323-429) — which
the latch/ondelay/oneshot stages then consume in a chain. Both the
directory-topic topology (topology.py) and the Kafka deployment
(deploy.py) need the same pure joins, so they live here, transport-
free: every function takes and returns DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.overrides import latest_overrides
from . import rules

OV_TYPES = (
    "disabled",
    "filtered",
    "latched",
    "masked",
    "ondelayed",
    "offdelayed",
    "shelved",
)

OV_TYPE_NAMES = {
    "disabled": "Disabled",
    "filtered": "Filtered",
    "latched": "Latched",
    "masked": "Masked",
    "ondelayed": "OnDelayed",
    "offdelayed": "OffDelayed",
    "shelved": "Shelved",
}

# the overrides topic carries the Shelved payload's oneshot flag on top
# of the base override-log columns (ShelvedOverride, SURVEY.md §1.3)
OVERRIDE_TOPIC_SCHEMA = T.StructType(
    rules.OVERRIDE_LOG_SCHEMA.fields
    + [T.StructField("oneshot", T.BooleanType(), True)]
)


def plus(base: T.StructType, *flags: str) -> T.StructType:
    """base schema + boolean flag columns (StructType.add mutates; don't)."""
    return T.StructType(
        list(base.fields) + [T.StructField(f, T.BooleanType()) for f in flags]
    )


MONOLOG_FULL_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("latchable", T.BooleanType(), True),
        T.StructField("ondelayseconds", T.LongType(), True),
        T.StructField("active", T.BooleanType()),
        T.StructField("transition_to_active", T.BooleanType()),
        T.StructField("transition_to_normal", T.BooleanType()),
        *[T.StructField(f"ov_{t}", T.BooleanType()) for t in OV_TYPES],
        T.StructField("shelved_oneshot", T.BooleanType(), True),
    ]
)


def override_set(log: DataFrame) -> DataFrame:
    """Live override log -> one row per alarm with an ov_<type> flag
    per override class + the Shelved oneshot marker (A1 pivot,
    SURVEY.md §2.4)."""
    live = latest_overrides(log)
    aggs = [
        F.coalesce(
            F.bool_or(F.col("type") == OV_TYPE_NAMES[t]), F.lit(False)
        ).alias(f"ov_{t}")
        for t in OV_TYPES
    ]
    aggs.append(
        F.max(F.when(F.col("type") == "Shelved", F.col("oneshot"))).alias(
            "shelved_oneshot"
        )
    )
    return live.groupBy("name").agg(*aggs)


def monolog_join(base: DataFrame, reg: DataFrame, ovr: DataFrame) -> DataFrame:
    """base (name, seq, active, transition flags) x registration
    KTable (name, latchable, ondelayseconds) x override set -> the
    full monolog row the flag chain consumes. Left joins: an alarm
    without a registration or overrides still flows (nulls read as
    not-registered / not-overridden)."""
    out = base.join(reg, "name", "left").join(ovr, "name", "left")
    for t in OV_TYPES:
        out = out.withColumn(
            f"ov_{t}", F.coalesce(F.col(f"ov_{t}"), F.lit(False))
        )
    out = out.withColumn(
        "shelved_oneshot", F.coalesce(F.col("shelved_oneshot"), F.lit(False))
    )
    return out.select(*[f.name for f in MONOLOG_FULL_SCHEMA.fields])


# value payload of the alarm-overrides topic: the composite key
# carries (name, type); the value carries the rest
OVERRIDE_VALUE_SCHEMA = T.StructType(
    [
        f
        for f in OVERRIDE_TOPIC_SCHEMA.fields
        if f.name not in ("seq", "name")
    ]
)


def decode_override_records(df: DataFrame) -> DataFrame:
    """Records read off alarm-overrides -> override-log rows.

    The topic keys overrides by the composite JSON {name, type}
    (AlarmOverrideKey), so the `name` column arriving from the record
    key is that JSON; a tombstone's null value leaves every value
    field null, so `type` is recovered from the key and a null
    `tombstone` reads as a delete."""
    k = F.from_json(F.col("name"), "name string, type string")
    return df.select(
        k["name"].alias("name"),
        "seq",
        F.coalesce(F.col("type"), k["type"]).alias("type"),
        F.coalesce(F.col("tombstone"), F.lit(True)).alias("tombstone"),
        "expiration",
        "oneshot",
    )


def composite_override_key(name: F.Column, ovr_type: F.Column) -> F.Column:
    """Kafka key for override records: the reference keys overrides by
    AlarmOverrideKey(name, type) — a name-only key cannot address the
    right entry when an alarm holds several override types, so the key
    is the JSON composite, matching latest_per_key(["name","type"])
    compaction."""
    return F.to_json(F.struct(name.alias("name"), ovr_type.alias("type")))

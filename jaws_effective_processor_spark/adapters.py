"""Adapters: driver star-schema -> canonical alarm event logs.

The reference engine consumes keyed Kafka topics (instances, classes,
activations, overrides — SURVEY.md §1.4). The driver's testdata has no
alarm topics, so we derive deterministic alarm event logs from the
`events` table (FIXTURES.md §6: "the events table plays the role of
the activation/override event logs"). The mapping is pure column
algebra — it exists identically in `oracle.py` as DuckDB SQL so the
correctness gate can replay it.

Mapping (event_type -> topic):
- signup   -> alarm-instances upsert; `value < 20` is a tombstone
- error    -> Activation        (AlarmActivationUnion union branch)
- view     -> NoActivation
- click    -> activation tombstone (null value deletes the KTable key)
- purchase -> alarm-overrides:  override type from floor(value) % 7,
              tombstone from the first fractional digit, Shelved
              oneshot from event_id parity, expiration = event-time
              + floor(value) * 12h.

Everything is expressed with built-in `pyspark.sql.functions` so the
whole derivation stays inside whole-stage codegen; there is no Python
in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The 7 override flavors — OverriddenAlarmType enum values observed at
# reference ActivationRule.java:220-246.
OVERRIDE_TYPES = (
    "Disabled",
    "Filtered",
    "Latched",
    "Masked",
    "OnDelayed",
    "OffDelayed",
    "Shelved",
)


# the event types each changelog projection consumes — the single
# source of truth for "which delta rows touch alarm state" (the
# incremental operator's touched-key gate imports these, so adding a
# routed type here automatically widens that gate)
REGISTRATION_EVENT_TYPES = ("signup",)
ACTIVATION_EVENT_TYPES = ("error", "view", "click")
OVERRIDE_EVENT_TYPES = ("purchase",)
LOG_EVENT_TYPES = (
    REGISTRATION_EVENT_TYPES + ACTIVATION_EVENT_TYPES + OVERRIDE_EVENT_TYPES
)


def alarm_name_expr() -> F.Column:
    """The alarm-key derivation, unaliased — shared by the log
    projections and every consumer that must match their keys."""
    return F.concat(F.lit("alarm_"), F.col("user_id").cast("string"))


def _alarm_name() -> F.Column:
    return alarm_name_expr().alias("name")


def _is_long_type(df: DataFrame, col: str) -> bool:
    return df.schema[col].dataType.typeName() in ("long", "bigint")


def event_ms(df: DataFrame, col: str = "ts") -> F.Column:
    """Epoch millis from the event-time column, whatever its physical
    encoding.

    The engine never assumes one parquet encoding: the column is
    inspected on the actual input schema. TIMESTAMP(micros)/
    TIMESTAMP_NTZ (the current testdata) converts via unix_millis
    under the UTC-pinned session; epoch-nanos BIGINT (TIMESTAMP(NANOS)
    parquet read under spark.sql.legacy.parquet.nanosAsLong, the
    fallback path) converts by exact integer division. Both agree
    with DuckDB's epoch_ms() on the same data.
    """
    if _is_long_type(df, col):
        return F.expr(f"{col} DIV 1000000")
    return F.unix_millis(F.col(col).cast("timestamp"))


def event_ts(df: DataFrame, col: str = "ts") -> F.Column:
    """Proper TimestampType (microsecond) from the event-time column,
    schema-adaptive like event_ms()."""
    if _is_long_type(df, col):
        return F.timestamp_micros(F.expr(f"{col} DIV 1000"))
    return F.col(col).cast("timestamp")


def instances_log(events: DataFrame) -> DataFrame:
    """Alarm registration (instance) event log; null action = tombstone.

    Mirrors the shape consumed by the reference's KTable source at
    RegistrationRule.java:81-89 (key=name, value=Alarm{action,...}).
    """
    return events.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("seq"),
        _alarm_name(),
        F.when(
            F.col("value") >= 20,
            F.concat(F.lit("class_"), (F.col("user_id") % 3).cast("string")),
        ).alias("action"),
        # Alarm payload (SURVEY §1.3: Alarm{action, source, location[]});
        # deterministic derivations, mirrored in oracle.py
        F.concat(F.lit("pv_"), F.col("user_id").cast("string")).alias("pv"),
        F.array(
            F.concat(F.lit("hall_"), (F.col("user_id") % 4).cast("string")),
            F.concat(F.lit("sector_"), (F.col("user_id") % 8).cast("string")),
        ).alias("location"),
    )


_ACTIONS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("latchable", T.BooleanType(), False),
        T.StructField("filterable", T.BooleanType(), False),
        T.StructField("ondelayseconds", T.LongType(), True),
        T.StructField("offdelayseconds", T.LongType(), True),
        T.StructField("priority", T.StringType(), False),
        T.StructField("system", T.StringType(), False),
        T.StructField("correctiveaction", T.StringType(), True),
        T.StructField("rationale", T.StringType(), True),
    ]
)

# Static class (AlarmAction) dimension — field set per reference
# RegistrationRuleTest.java:73-82. Tiny: always broadcast in joins.
_ACTIONS_ROWS = [
    ("class_0", True, True, 5, None, "P3_MINOR", "CAMAC",
     "Reset CAMAC crate", "rationale_0"),
    ("class_1", False, True, None, 5, "P2_MAJOR", "RF",
     "Restart RF chain", "rationale_1"),
    ("class_2", True, False, 10, None, "P1_CRITICAL", "BPM",
     "Realign BPM", "rationale_2"),
]


_ACTIONS_CACHE: dict[SparkSession, DataFrame] = {}


def actions_dim(spark: SparkSession) -> DataFrame:
    """Static dimension, memoized per session — createDataFrame costs
    a local-relation build + Py4J transfer on every call otherwise,
    and several query builders call this."""
    df = _ACTIONS_CACHE.get(spark)
    if df is None:
        df = spark.createDataFrame(_ACTIONS_ROWS, schema=_ACTIONS_SCHEMA)
        _ACTIONS_CACHE[spark] = df
    return df


def activations_log(events: DataFrame) -> DataFrame:
    """Activation event log; union_type null = tombstone.

    Shape of the AlarmActivationUnion KTable consumed at
    ActivationRule.java:92-99; NoActivation-vs-null normalization is
    downstream (operators/transitions.py).
    """
    return events.filter(
        F.col("event_type").isin(*ACTIVATION_EVENT_TYPES)
    ).select(
        F.col("event_id").alias("seq"),
        _alarm_name(),
        F.when(F.col("event_type") == "error", F.lit("Activation"))
        .when(F.col("event_type") == "view", F.lit("NoActivation"))
        .alias("union_type"),
    )


def overrides_log(events: DataFrame) -> DataFrame:
    """Operator-issued alarm-overrides event log, composite key (name, type).

    Shape of the AlarmOverrideKey/AlarmOverrideUnion KTable consumed at
    ActivationRule.java:278-281; `tombstone` models a null Kafka value.
    """
    # Spread overrides thin: only ~1/3 of purchases carry an override
    # (idx < 7 of 21) so alarms end up with 0-2 override types and
    # every cascade branch is reachable in the snapshot.
    type_idx = (F.col("user_id") * 3 + F.floor(F.col("value")).cast("long")) % 21
    ovr_type = (
        F.when(type_idx == 0, "Disabled")
        .when(type_idx == 1, "Filtered")
        .when(type_idx == 2, "Latched")
        .when(type_idx == 3, "Masked")
        .when(type_idx == 4, "OnDelayed")
        .when(type_idx == 5, "OffDelayed")
        .otherwise("Shelved")
    )
    return events.filter(
        (F.col("event_type") == "purchase") & (type_idx < 7)
    ).select(
        F.col("event_id").alias("seq"),
        _alarm_name(),
        ovr_type.alias("type"),
        ((F.floor(F.col("value") * 10).cast("long") % 10) < 2).alias("tombstone"),
        (F.col("event_id") % 2 == 0).alias("oneshot"),
        (event_ms(events) + F.floor(F.col("value")).cast("long") * 43200000).alias(
            "expiration"
        ),
        # override payloads (SURVEY §1.3: DisabledOverride.comments,
        # ShelvedOverride.reason/comments); deterministic, oracle-mirrored
        F.when(
            F.col("event_id") % 3 != 0,
            F.concat(F.lit("note_"), (F.col("event_id") % 5).cast("string")),
        ).alias("comments"),
        F.when(
            F.col("event_id") % 2 == 0, F.lit("Chattering_Fleeting_Alarm")
        )
        .otherwise(F.lit("Other"))
        .alias("reason"),
    )


def snapshot_ms(events: DataFrame) -> DataFrame:
    """1-row frame with the deterministic 'wall clock' of the snapshot.

    The reference stamps records with System.currentTimeMillis()
    (ProcessingRule.java:110-113); batch parity needs a deterministic
    clock, so we freeze it at the max event time. Joined in via a
    broadcast cross-join (scalar), never collected per-row.
    """
    return events.agg(F.max(event_ms(events)).alias("snapshot_ms"))

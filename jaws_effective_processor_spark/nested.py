"""Nested-struct output parity — the reference's published schemas.

The reference emits rich nested values, not flat columns:

  EffectiveRegistration{action: AlarmAction?, alarm: Alarm?}
                                        (RegistrationRule.java:142-143)
  EffectiveNotification{activation: AlarmActivationUnion?,
                        overrides: AlarmOverrideSet, state}
                                        (RegistrationRule.java:145-150)
  EffectiveAlarm{registration, notification}
                                        (EffectiveStateRule.java:88-91)
  IntermediateMonolog{registration, notification,
                      transitions: ProcessorTransitions(8 bools)}
                                        (RegistrationRule.java:152-157)

with override payloads per type (DisabledOverride.comments,
OnDelayedOverride.expiration, ShelvedOverride{oneshot, expiration,
reason, comments} — SURVEY §1.3). This module builds those values as
real Spark StructTypes on top of the flat settled pipeline, then the
registered queries serialize them with `to_json` — exactly what the
Kafka value sink ships — so the DuckDB oracle can hash-compare the
bytes (Spark `to_json` and DuckDB `to_json(struct_pack(...))` render
identically, incl. null fields and empty records).

Presence-only override flavors (Filtered/Latched/Masked/OffDelayed
are field-less records in the reference) are encoded as empty maps:
`{}` in JSON, present-vs-null carries the information.

Scale shape: everything is the flat pipeline (broadcast dim + keyed
joins) plus three more `name`-keyed left joins against per-alarm
payload tables — same partitioning, no new skew, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import adapters
from .cache import SessionFrameCache
from .operators.compaction import compact_table, latest_per_key
from .operators.overrides import live_overrides
from .pipeline import effective_alarms
from .session import pin_session_conf
from .tables import load_table

_JSON_OPTS = {"ignoreNullFields": "false"}


def registration_structs(spark: SparkSession, events: DataFrame) -> DataFrame:
    """name -> EffectiveRegistration struct (registered alarms only).

    action: the full AlarmAction class payload (null when the FK
    points at an unknown class — RegistrationRuleTest.java:119-134);
    alarm: the instance payload {action, source{pv}, location[]}.
    """
    inst = compact_table(
        adapters.instances_log(events), ["name"], tombstone_col="action"
    )
    dim = adapters.actions_dim(spark).select(
        F.col("name").alias("action_name"),
        "latchable",
        "system",
        "filterable",
        "correctiveaction",
        "priority",
        "rationale",
        "ondelayseconds",
        "offdelayseconds",
    )
    joined = inst.join(
        F.broadcast(dim), inst["action"] == dim["action_name"], "left"
    )
    action_struct = F.when(
        F.col("action_name").isNotNull(),
        F.struct(
            "latchable",
            "system",
            "filterable",
            "correctiveaction",
            "priority",
            "rationale",
            "ondelayseconds",
            "offdelayseconds",
        ),
    )
    alarm_struct = F.struct(
        F.col("action"),
        F.struct(F.col("pv")).alias("source"),
        F.col("location"),
    )
    return joined.select(
        "name",
        F.struct(
            action_struct.alias("action"), alarm_struct.alias("alarm")
        ).alias("registration"),
    )


def activation_unions(events: DataFrame) -> DataFrame:
    """name -> latest AlarmActivationUnion struct (null = tombstoned)."""
    latest = latest_per_key(adapters.activations_log(events), ["name"])
    return latest.select(
        "name",
        F.when(
            F.col("union_type").isNotNull(),
            F.struct(F.col("union_type").alias("type")),
        ).alias("activation"),
    )


def override_payloads(events: DataFrame) -> DataFrame:
    """name -> per-type override payload columns (from live overrides)."""
    live = live_overrides(
        adapters.overrides_log(events), adapters.snapshot_ms(events)
    )

    def typed(t: str, col: str) -> F.Column:
        return F.max(F.when(F.col("type") == t, F.col(col)))

    return live.groupBy("name").agg(
        typed("Disabled", "comments").alias("disabled_comments"),
        typed("OnDelayed", "expiration").alias("ondelayed_expiration"),
        typed("Shelved", "oneshot").alias("shelved_oneshot"),
        typed("Shelved", "expiration").alias("shelved_expiration"),
        typed("Shelved", "reason").alias("shelved_reason"),
        typed("Shelved", "comments").alias("shelved_comments"),
    )


def _override_set_struct() -> F.Column:
    """AlarmOverrideSet (ActivationRule.java:207-216 field order) from
    the flat ov_* flags + the payload columns joined alongside."""
    return F.struct(
        F.when(
            F.col("ov_disabled"),
            F.struct(F.col("disabled_comments").alias("comments")),
        ).alias("disabled"),
        F.when(F.col("ov_filtered"), F.create_map()).alias("filtered"),
        F.when(F.col("ov_latched"), F.create_map()).alias("latched"),
        F.when(F.col("ov_masked"), F.create_map()).alias("masked"),
        F.when(F.col("ov_offdelayed"), F.create_map()).alias("offdelayed"),
        F.when(
            F.col("ov_ondelayed"),
            F.struct(F.col("ondelayed_expiration").alias("expiration")),
        ).alias("ondelayed"),
        F.when(
            F.col("ov_shelved"),
            F.struct(
                F.col("shelved_oneshot").alias("oneshot"),
                F.col("shelved_expiration").alias("expiration"),
                F.col("shelved_reason").alias("reason"),
                F.col("shelved_comments").alias("comments"),
            ),
        ).alias("shelved"),
    )


def _transitions_struct() -> F.Column:
    """ProcessorTransitions — 8 booleans (SURVEY §1.3; set at
    ActivationRule.java:413-414, LatchRule.java:197, OnDelayRule.java:
    205, OneShotRule.java:190). offdelaying/masking/unmasking belong
    to rules the reference never registers (MaskRule dead code) — they
    are always false, emitted for schema parity."""
    return F.struct(
        F.col("transition_to_active").alias("transitionToActive"),
        F.col("transition_to_normal").alias("transitionToNormal"),
        F.col("latching"),
        F.col("unshelving"),
        F.col("ondelaying"),
        F.lit(False).alias("offdelaying"),
        F.lit(False).alias("masking"),
        F.lit(False).alias("unmasking"),
    )


def _notification_struct() -> F.Column:
    return F.struct(
        F.col("activation"),
        _override_set_struct().alias("overrides"),
        F.col("state"),
    )


_ASSEMBLED_CACHE = SessionFrameCache("nested_assembled")


def _assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat settled snapshot joined with every payload table — the
    wide row all the snapshot-shaped nested queries project from.
    Cached per (session, sf_dir) like the monolog: three registered
    queries (notifications/alarms/monolog nested) project different
    structs from this same one-row-per-alarm frame."""
    def _build():
        pin_session_conf(spark)
        events = load_table(spark, sf_dir, "events")
        flat = effective_alarms(spark, sf_dir)
        return (
            flat.join(registration_structs(spark, events), "name", "left")
            .join(activation_unions(events), "name", "left")
            .join(override_payloads(events), "name", "left")
        )

    return _ASSEMBLED_CACHE.get_or_build(spark, (sf_dir,), _build)


def q_effective_registrations_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pin_session_conf(spark)
    events = load_table(spark, sf_dir, "events")
    return registration_structs(spark, events).select(
        "name",
        F.to_json(F.col("registration"), _JSON_OPTS).alias("registration"),
    )


def q_effective_notifications_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _assembled(spark, sf_dir).select(
        "name",
        F.to_json(_notification_struct(), _JSON_OPTS).alias("notification"),
    )


def q_effective_alarms_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assembled(spark, sf_dir).select(
        "name",
        F.to_json(
            F.struct(
                F.col("registration"),
                _notification_struct().alias("notification"),
            ),
            _JSON_OPTS,
        ).alias("effective_alarm"),
    )


def q_effective_state_history_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's TRUE published stream: one full EffectiveAlarm
    value per surviving upstream event (EffectiveStateRule.java:83-98
    emits on every record), with as-of payloads — activation union,
    per-type override payloads, instance + class registration — all
    recovered from the same merged-changelog window pass the flat
    history query uses (pipeline.effective_state_history(payloads=
    True)): zero additional shuffles over the flat plan."""
    from .pipeline import effective_state_history

    pin_session_conf(spark)
    hist = effective_state_history(spark, sf_dir, payloads=True)

    action_struct = F.when(
        F.col("priority").isNotNull(),
        F.struct(
            "latchable",
            "system",
            "filterable",
            "correctiveaction",
            "priority",
            "rationale",
            "ondelayseconds",
            "offdelayseconds",
        ),
    )
    registration = F.when(
        F.col("action_eff").isNotNull(),
        F.struct(
            action_struct.alias("action"),
            F.struct(
                F.col("action_eff").alias("action"),
                F.struct(F.col("pv_eff").alias("pv")).alias("source"),
                F.col("location_eff").alias("location"),
            ).alias("alarm"),
        ),
    )
    activation = F.when(
        F.col("union_eff").isNotNull(),
        F.struct(F.col("union_eff").alias("type")),
    )
    overrides = F.struct(
        F.when(
            F.col("ov_disabled"),
            F.struct(F.col("d_pay.comments").alias("comments")),
        ).alias("disabled"),
        F.when(F.col("ov_filtered"), F.create_map()).alias("filtered"),
        F.when(F.col("ov_latched"), F.create_map()).alias("latched"),
        F.when(F.col("ov_masked"), F.create_map()).alias("masked"),
        F.when(F.col("ov_offdelayed"), F.create_map()).alias("offdelayed"),
        F.when(
            F.col("ov_ondelayed"),
            F.struct(F.col("od_pay.expiration").alias("expiration")),
        ).alias("ondelayed"),
        F.when(
            F.col("ov_shelved"),
            F.struct(
                F.col("sh_pay.oneshot").alias("oneshot"),
                F.col("sh_pay.expiration").alias("expiration"),
                F.col("sh_pay.reason").alias("reason"),
                F.col("sh_pay.comments").alias("comments"),
            ),
        ).alias("shelved"),
    )
    notification = F.struct(
        activation.alias("activation"),
        overrides.alias("overrides"),
        F.col("state"),
    )
    return hist.select(
        "seq",
        "name",
        F.to_json(
            F.struct(
                registration.alias("registration"),
                notification.alias("notification"),
            ),
            _JSON_OPTS,
        ).alias("effective_alarm"),
    )


def q_intermediate_monolog_nested(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _assembled(spark, sf_dir).select(
        "name",
        F.to_json(
            F.struct(
                F.col("registration"),
                _notification_struct().alias("notification"),
                _transitions_struct().alias("transitions"),
            ),
            _JSON_OPTS,
        ).alias("monolog"),
    )

"""Per-rule batch queries — operator parity, one per reference rule.

Each function is a (spark, sf_dir) -> DataFrame entry in the driver
contract, mirroring ONE reference rule's output topic (SURVEY.md §2,
§3 EP2/EP3). All share the column-expression library in `operators/`
with the flagship pipeline; their DuckDB twins live in `oracle.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import adapters
from .operators.overrides import expired_overrides, live_overrides, override_set
from .operators.registration import effective_registrations
from .operators.transitions import with_transitions
from .pipeline import alarm_monolog
from .tables import load_table


def q_effective_registrations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RegistrationRule: instances ⟕ classes -> effective-registrations
    (J1; RegistrationRule.java:91-130)."""
    events = load_table(spark, sf_dir, "events")
    return effective_registrations(
        adapters.instances_log(events), adapters.actions_dim(spark)
    )


def q_activation_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ActivationRule T1: per-event transition flags over the activation
    log (ActivationRule.java:362-414) — the per-step flag sequence the
    reference's `transitions` test asserts (ActivationRuleTest.java:222-275)."""
    events = load_table(spark, sf_dir, "events")
    return with_transitions(adapters.activations_log(events)).select(
        "name",
        "seq",
        F.col("cur_active").alias("active"),
        "transition_to_active",
        "transition_to_normal",
    )


def q_override_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ActivationRule A1 + OverrideJoiner pivot: per-alarm
    AlarmOverrideSet (ActivationRule.java:199-321)."""
    events = load_table(spark, sf_dir, "events")
    return override_set(
        live_overrides(adapters.overrides_log(events), adapters.snapshot_ms(events))
    )


def q_latch_overrides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LatchRule P2+P9: Latched overrides emitted to the feedback topic
    (LatchRule.java:79-106)."""
    return (
        alarm_monolog(spark, sf_dir)
        .filter(
            F.coalesce(F.col("latchable"), F.lit(False))
            & F.col("transition_to_active")
        )
        .select("name", F.lit("Latched").alias("type"))
    )


def q_ondelay_overrides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OnDelayRule P3+P10: OnDelayed overrides with computed expiry
    (OnDelayRule.java:79-110); 'now' is the frozen snapshot clock."""
    events = load_table(spark, sf_dir, "events")
    snap = adapters.snapshot_ms(events)
    return (
        alarm_monolog(spark, sf_dir)
        .filter(
            F.coalesce(F.col("ondelayseconds") > 0, F.lit(False))
            & F.col("transition_to_active")
        )
        .crossJoin(F.broadcast(snap))
        .select(
            "name",
            F.lit("OnDelayed").alias("type"),
            (F.col("snapshot_ms") + F.col("ondelayseconds") * 1000).alias(
                "expiration"
            ),
        )
    )


def q_oneshot_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OneShotRule P4+P11: Shelved tombstones on transition-to-normal
    (OneShotRule.java:79-104)."""
    return (
        alarm_monolog(spark, sf_dir)
        .filter(
            F.col("ov_shelved")
            & F.coalesce(F.col("shelved_oneshot"), F.lit(False))
            & F.col("transition_to_normal")
        )
        .select("name", F.lit("Shelved").alias("type"), F.lit(True).alias("tombstone"))
    )


def q_mask_overrides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MaskRule P5+T5, CORRECTED (beyond-reference, optional operator).

    The reference ships MaskRule as dead code — never registered in
    EffectiveProcessor.java:22-48 — with two defects: the unmask
    branch maps the MASK stream instead of the unmask stream
    (MaskRule.java:124-125, so every mask is immediately tombstoned),
    and the parent lookup is an unimplemented TODO
    (MaskRule.java:82-84). This operator implements the documented
    intent (MaskRule.java:27-29: "Adds a Masked override to an alarm
    with an active parent alarm and removes the Masked override when
    the parent alarm is no longer active") with the foreign-key join
    the TODO asks for, using actual parent activity per the TODO's
    own suggestion.

    Parent derivation (fixture algebra, mirrored in the oracle): alarm
    `alarm_<u>` with u % 7 != 0 is masked by parent
    `alarm_<u - u % 7>`; u % 7 == 0 alarms are parents (no maskedby).
    Emission reconciles the child's Masked override with the parent's
    CURRENT active state: add (tombstone=false) when the parent is
    active and no Masked override exists; remove (tombstone=true)
    when the parent is inactive/absent and one does.

    Scale shape: a self equi-join of the (cached) monolog on the alarm
    key — both sides already carry the name partitioning; no
    broadcast of the corpus, no cartesian.
    """
    m = alarm_monolog(spark, sf_dir)
    uid = F.expr("CAST(substring(name, 7) AS BIGINT)")
    child = m.select("name", "ov_masked", uid.alias("uid")).filter(
        uid % 7 != 0
    )
    parent = m.select(
        F.col("name").alias("p_name"), F.col("active").alias("p_active")
    )
    parent_key = F.concat(
        F.lit("alarm_"),
        (F.col("uid") - F.col("uid") % 7).cast("string"),
    )
    j = child.join(parent, parent_key == F.col("p_name"), "left")
    p_active = F.coalesce(F.col("p_active"), F.lit(False))
    return j.filter(p_active != F.col("ov_masked")).select(
        "name",
        F.lit("Masked").alias("type"),
        (~p_active).alias("tombstone"),
    )


def _expirations(spark: SparkSession, sf_dir: str, ovr_type: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        expired_overrides(adapters.overrides_log(events), adapters.snapshot_ms(events))
        .filter(F.col("type") == ovr_type)
        .select("name", "type", "expiration")
    )


def q_shelve_expirations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ShelveExpirationRule W1: expired Shelved overrides to tombstone
    (ShelveExpirationRule.java:105-190)."""
    return _expirations(spark, sf_dir, "Shelved")


def q_ondelay_expirations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OnDelayExpirationRule W2 (OnDelayExpirationRule.java:108-196)."""
    return _expirations(spark, sf_dir, "OnDelayed")


def q_effective_notifications(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EffectiveStateRule E1+E2+P8: the published notifications —
    settled rows only (intermediate-transition rows dropped,
    EffectiveStateRule.java:163-170), projected to notification shape
    (EffectiveStateRule.java:100-107)."""
    from .operators.effective_state import (
        with_effective_state,
        with_rule_flags,
        with_settled_overrides,
    )

    flagged = with_rule_flags(alarm_monolog(spark, sf_dir))
    kept = flagged.filter(
        ~(F.col("latching") | F.col("ondelaying") | F.col("unshelving"))
    )
    return with_effective_state(with_settled_overrides(kept)).select(
        "name",
        "active",
        "ov_disabled",
        "ov_filtered",
        "ov_latched",
        "ov_masked",
        "ov_ondelayed",
        "ov_offdelayed",
        "ov_shelved",
        "state",
    )


def q_registration_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KTable-as-versioned-table: SCD2 history of the registration
    changelog. Each upsert opens a version valid over
    [valid_from_seq, valid_to_seq); the next event on the key (update
    OR tombstone) closes it; tombstones emit no version of their own.
    The compacted KTable the reference materializes
    (RegistrationRule.java:81-89) is exactly the `is_current` slice.

    Scale shape: one window exchange on the alarm key (lead) — the
    same partitioning compaction uses, so in a pipeline the exchange
    is reused."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    log = adapters.instances_log(events)
    w = Window.partitionBy("name").orderBy("seq")
    versions = log.select(
        "name",
        F.col("seq").alias("valid_from_seq"),
        F.lead("seq").over(w).alias("valid_to_seq"),
        "action",
        "pv",
    )
    return versions.filter(F.col("action").isNotNull()).select(
        "name",
        "valid_from_seq",
        "valid_to_seq",
        "action",
        "pv",
        F.col("valid_to_seq").isNull().alias("is_current"),
    )

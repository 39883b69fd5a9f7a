"""The flagship query: settled effective-alarm snapshot.

Batch re-expression of the reference's whole registered dataflow
(EffectiveProcessor.java:22-48):

  instances ⟕ classes (J1, broadcast)            RegistrationRule
  activation log -> lag transitions (T1)          ActivationRule
  overrides -> compact -> expire -> pivot (A1,W*) Activation+Expiration
  reg ⟗ act ⟗ overrides (J2, J3)                  ActivationRule
  rule flags + settle (T2-T4 single round)        Latch/OnDelay/OneShot
  E2 cascade -> AlarmState                        EffectiveStateRule

Exercises S1, P1-P12, J1-J3, A1, T1-T4, W1-W2, E2 in one Catalyst
plan. Physical shape at scale: classes broadcast; activations and
overrides each shuffle once on their key and stay co-partitioned on
`name` through the outer joins (sort-merge, AQE-coalesced); no Python
in the row path — the whole plan is whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import adapters
from .operators.effective_state import (
    with_effective_state,
    with_rule_flags,
    with_settled_overrides,
)
from .operators.overrides import live_overrides, override_set
from .operators.registration import effective_registrations
from .operators.transitions import latest_activation_state
from .session import pin_session_conf
from .tables import load_table

BOOL_FALSE_COLS = (
    "active",
    "transition_to_active",
    "transition_to_normal",
    "ov_disabled",
    "ov_filtered",
    "ov_latched",
    "ov_masked",
    "ov_ondelayed",
    "ov_offdelayed",
    "ov_shelved",
)

OUTPUT_COLS = (
    "name",
    "registered",
    "action",
    "priority",
    "active",
    "transition_to_active",
    "transition_to_normal",
    "ov_disabled",
    "ov_filtered",
    "ov_latched",
    "ov_masked",
    "ov_ondelayed",
    "ov_offdelayed",
    "ov_shelved",
    "latching",
    "ondelaying",
    "unshelving",
    "state",
)


def alarm_monolog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reg ⟗ act ⟗ overrides, flags coalesced — the IntermediateMonolog."""
    pin_session_conf(spark)
    events = load_table(spark, sf_dir, "events")

    reg = effective_registrations(
        adapters.instances_log(events), adapters.actions_dim(spark)
    ).withColumnRenamed("name", "reg_name")
    act = latest_activation_state(adapters.activations_log(events)).withColumnRenamed(
        "name", "act_name"
    )
    ovr = override_set(
        live_overrides(adapters.overrides_log(events), adapters.snapshot_ms(events))
    ).withColumnRenamed("name", "ovr_name")

    # J2: full outer (registered, activations) on alarm name
    # (ActivationRule.java:101-106); J3: full outer with the override
    # set (ActivationRule.java:124-126).
    j2 = reg.join(act, reg["reg_name"] == act["act_name"], "full_outer").withColumn(
        "j2_name", F.coalesce("reg_name", "act_name")
    )
    j3 = j2.join(ovr, j2["j2_name"] == ovr["ovr_name"], "full_outer").withColumn(
        "name", F.coalesce("j2_name", "ovr_name")
    )

    monolog = j3.withColumn("registered", F.col("reg_name").isNotNull()).drop(
        "reg_name", "act_name", "ovr_name", "j2_name"
    )
    for c in BOOL_FALSE_COLS:
        monolog = monolog.withColumn(c, F.coalesce(F.col(c), F.lit(False)))
    return monolog


def effective_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The settled effective-state snapshot, one row per known alarm."""
    settled = with_settled_overrides(with_rule_flags(alarm_monolog(spark, sf_dir)))
    return with_effective_state(settled).select(*OUTPUT_COLS)

"""T2-T4 rule flags + E1/E2 — the effective-state computation.

Rule-flag semantics (single-round, i.e. the settle step the reference
tests assert — LatchRuleTest.java:119-175 and siblings):

- latching:   action registered && latchable && transitionToActive,
  cleared when a Latched override is present
  (LatchRule.java:79-89, state machine :177-205)
- ondelaying: ondelayseconds > 0 && transitionToActive, cleared by an
  OnDelayed override (OnDelayRule.java:79-90, :183-213)
- unshelving: shelved.oneshot && transitionToNormal
  (OneShotRule.java:79-89, :163-191)

E2 cascade (EffectiveStateRule.java:180-221): sequential overwrites in
increasing precedence; expressed here as one CASE evaluated in
*reverse* precedence order — pure Catalyst, no custom code.

The batch pipeline computes the *settled* snapshot: the overrides the
rules would emit on the feedback topic (LatchRule.java:104-106,
OnDelayRule.java:108-110, OneShotRule.java:102-104) are applied
once — latched/ondelayed become present, a one-shot shelve is
removed — and the state is evaluated with transition flags at rest.
This matches the reference's own end-state assertions
(EffectiveStateRuleTest.java:118-186) without iterating the cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_rule_flags(monolog: DataFrame) -> DataFrame:
    """Adds latching / ondelaying / unshelving to the joined monolog."""
    # `latchable IS NOT NULL` == "the class joined" — the reference's
    # `registration.getAction() != null` guard (LatchRule.java:85).
    latching = (
        F.coalesce(F.col("latchable"), F.lit(False))
        & F.col("transition_to_active")
        & ~F.col("ov_latched")
    )
    ondelaying = (
        F.coalesce(F.col("ondelayseconds") > 0, F.lit(False))
        & F.col("transition_to_active")
        & ~F.col("ov_ondelayed")
    )
    unshelving = (
        F.col("ov_shelved")
        & F.coalesce(F.col("shelved_oneshot"), F.lit(False))
        & F.col("transition_to_normal")
    )
    return (
        monolog.withColumn("latching", latching)
        .withColumn("ondelaying", ondelaying)
        .withColumn("unshelving", unshelving)
    )


def with_settled_overrides(flagged: DataFrame) -> DataFrame:
    """Applies the rules' feedback-topic emissions once (settle step)."""
    return (
        flagged.withColumn("eff_latched", F.col("ov_latched") | F.col("latching"))
        .withColumn("eff_ondelayed", F.col("ov_ondelayed") | F.col("ondelaying"))
        .withColumn("eff_shelved", F.col("ov_shelved") & ~F.col("unshelving"))
    )


def state_cascade(
    active: F.Column,
    disabled: F.Column,
    filtered: F.Column,
    masked: F.Column,
    shelved: F.Column,
    shelved_oneshot: F.Column,
    ondelayed: F.Column,
    latched: F.Column,
    offdelayed: F.Column,
) -> F.Column:
    """E2 — the AlarmState precedence cascade as one CASE expression."""
    return (
        F.when(disabled, "NormalDisabled")
        .when(filtered, "NormalFiltered")
        .when(masked, "NormalMasked")
        .when(
            shelved,
            F.when(F.coalesce(shelved_oneshot, F.lit(False)), "NormalOneShotShelved")
            .otherwise("NormalContinuousShelved"),
        )
        .when(ondelayed, "NormalOnDelayed")
        .when(latched, "ActiveLatched")
        .when(offdelayed, "ActiveOffDelayed")
        .when(active, "Active")
        .otherwise("Normal")
    )


def with_effective_state(settled: DataFrame) -> DataFrame:
    """Evaluates the cascade on the settled snapshot."""
    return settled.withColumn(
        "state",
        state_cascade(
            active=F.col("active"),
            disabled=F.col("ov_disabled"),
            filtered=F.col("ov_filtered"),
            masked=F.col("ov_masked"),
            shelved=F.col("eff_shelved"),
            shelved_oneshot=F.col("shelved_oneshot"),
            ondelayed=F.col("eff_ondelayed"),
            latched=F.col("eff_latched"),
            offdelayed=F.col("ov_offdelayed"),
        ),
    )

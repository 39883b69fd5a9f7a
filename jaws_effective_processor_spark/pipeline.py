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
from .cache import SessionFrameCache
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


_MONOLOG_CACHE = SessionFrameCache("alarm_monolog")


def alarm_monolog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reg ⟗ act ⟗ overrides, flags coalesced — the IntermediateMonolog.

    Cached (`.cache()`) per (session, sf_dir): every alarm-family
    query builds on this same frame, and re-deriving the compacted
    KTable state from the raw event log per query repeats identical
    work. This mirrors the reference directly — Kafka Streams
    materializes each KTable in a state store once and every
    downstream rule reads the store, not the raw topic
    (EffectiveProcessor.java wiring). The cached frame is one row per
    live alarm (small: output of three compactions), not the log.
    """
    def _build():
        pin_session_conf(spark)
        return alarm_monolog_from_events(
            spark, load_table(spark, sf_dir, "events")
        )

    return _MONOLOG_CACHE.get_or_build(spark, (sf_dir,), _build)


def alarm_monolog_from_events(
    spark: SparkSession,
    events: DataFrame,
    clock_events: DataFrame | None = None,
) -> DataFrame:
    """Same pipeline over a caller-supplied event log — the seam the
    incremental-maintenance operator (operators/incremental.py) uses
    to re-run the pipeline on a key-restricted or seq-bounded slice.

    `clock_events`: frame whose max event time is the snapshot clock
    (W1/W2 expiration cutoff). A key-restricted re-run must keep the
    GLOBAL clock, or expirations would be evaluated at the subset's
    (earlier) max and diverge from the full recompute."""
    reg = effective_registrations(
        adapters.instances_log(events), adapters.actions_dim(spark)
    ).withColumnRenamed("name", "reg_name")
    act = latest_activation_state(adapters.activations_log(events)).withColumnRenamed(
        "name", "act_name"
    )
    ovr = override_set(
        live_overrides(
            adapters.overrides_log(events),
            adapters.snapshot_ms(
                events if clock_events is None else clock_events
            ),
        )
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

    # one select instead of a withColumn chain: each withColumn is a
    # fresh plan + Py4J roundtrip, and this runs inside every alarm
    # query's build path
    aux = {"reg_name", "act_name", "ovr_name", "j2_name"}
    bools = set(BOOL_FALSE_COLS)
    cols = [
        F.coalesce(F.col(c), F.lit(False)).alias(c) if c in bools else F.col(c)
        for c in j3.columns
        if c not in aux
    ]
    return j3.select(
        *cols, F.col("reg_name").isNotNull().alias("registered")
    )


def effective_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The settled effective-state snapshot, one row per known alarm."""
    settled = with_settled_overrides(with_rule_flags(alarm_monolog(spark, sf_dir)))
    return with_effective_state(settled).select(*OUTPUT_COLS)


def effective_alarms_from_events(
    spark: SparkSession,
    events: DataFrame,
    clock_events: DataFrame | None = None,
) -> DataFrame:
    """Snapshot pipeline over a caller-supplied event log (see
    alarm_monolog_from_events)."""
    settled = with_settled_overrides(
        with_rule_flags(
            alarm_monolog_from_events(spark, events, clock_events)
        )
    )
    return with_effective_state(settled).select(*OUTPUT_COLS)


_HISTORY_CACHE = SessionFrameCache("state_history")


def effective_state_history(
    spark: SparkSession, sf_dir: str, payloads: bool = False
) -> DataFrame:
    """Cached facade over `_effective_state_history`: the payload and
    lean variants differ only by projection, so one cached full
    (payloads=True) frame per (session, sf_dir) serves both — the
    same state-store materialization argument as `alarm_monolog`.
    The lean output projects the cached frame; column semantics are
    identical because the payload pass is a strict superset of window
    expressions over the same window spec."""
    full = _HISTORY_CACHE.get_or_build(
        spark,
        (sf_dir,),
        lambda: _effective_state_history(spark, sf_dir, payloads=True),
    )
    if payloads:
        return full
    return full.select("seq", "name", "active", "state")


def _effective_state_history(
    spark: SparkSession, sf_dir: str, payloads: bool = False
) -> DataFrame:
    """Per-event effective-state stream — the reference's actual output
    shape (EffectiveStateRule emits on EVERY upstream record, not just
    a final snapshot; re-emission on override/registration updates is
    the KTable-join firing on either side, ActivationRule.java:101-126).

    One window pass over the merged changelog does all the point-in-
    time joins: activation, override, and registration events union
    into a single per-alarm ordered stream, and `last(... IGNORE
    NULLS)` recovers each KTable's state as-of every event. Tombstones
    ride along as non-null sentinels (false / '__deleted__') so a
    delete correctly resets state — the subtlety that makes plain
    ignore-nulls insufficient.

    E1 then drops intermediate records (rule-trigger rows) and E2
    evaluates the cascade per surviving event. Scale shape: two hash
    exchanges, both on the alarm key (the activation lag window and
    the merged-changelog window); everything else is codegen'd column
    work + a broadcast dim join (asserted in tests/test_plans.py).

    `payloads=True` (the nested-output path) carries the full as-of
    payloads alongside — activation union type, per-type override
    payload structs, instance pv/location — as EXTRA window
    expressions over the same window spec: no additional shuffle,
    and the default output is untouched.
    """
    pin_session_conf(spark)
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")

    act = adapters.activations_log(events)
    w_act = Window.partitionBy("name").orderBy("seq")
    act_rows = act.select(
        "seq",
        "name",
        F.lit("A").alias("tag"),
        F.coalesce(F.col("union_type") == "Activation", F.lit(False)).alias(
            "cur_active"
        ),
        F.lit(None).cast("string").alias("ovr_type"),
        F.lit(None).cast("boolean").alias("ovr_live"),
        F.lit(None).cast("boolean").alias("ovr_oneshot"),
        F.lit(None).cast("string").alias("action_sentinel"),
        *(
            [F.coalesce(F.col("union_type"), F.lit("__none__")).alias("union_sentinel")]
            if payloads
            else []
        ),
    ).withColumn(
        "prev_active",
        F.coalesce(F.lag("cur_active").over(w_act), F.lit(False)),
    )

    ovr = adapters.overrides_log(events)
    ovr_rows = ovr.select(
        "seq",
        "name",
        F.lit("O").alias("tag"),
        F.lit(None).cast("boolean").alias("cur_active"),
        F.col("type").alias("ovr_type"),
        (~F.col("tombstone")).alias("ovr_live"),
        F.when(F.col("tombstone"), F.lit(False))
        .otherwise(F.coalesce(F.col("oneshot"), F.lit(False)))
        .alias("ovr_oneshot"),
        F.lit(None).cast("string").alias("action_sentinel"),
        F.lit(None).cast("boolean").alias("prev_active"),
        *(
            [
                F.lit(None).cast("string").alias("union_sentinel"),
                "expiration",
                "comments",
                "reason",
            ]
            if payloads
            else []
        ),
    )

    inst = adapters.instances_log(events)
    inst_rows = inst.select(
        "seq",
        "name",
        F.lit("R").alias("tag"),
        F.lit(None).cast("boolean").alias("cur_active"),
        F.lit(None).cast("string").alias("ovr_type"),
        F.lit(None).cast("boolean").alias("ovr_live"),
        F.lit(None).cast("boolean").alias("ovr_oneshot"),
        F.coalesce(F.col("action"), F.lit("__deleted__")).alias(
            "action_sentinel"
        ),
        F.lit(None).cast("boolean").alias("prev_active"),
        *(
            [
                F.lit(None).cast("string").alias("union_sentinel"),
                "pv",
                "location",
            ]
            if payloads
            else []
        ),
    )

    merged = act_rows.unionByName(ovr_rows, allowMissingColumns=True).unionByName(
        inst_rows, allowMissingColumns=True
    )
    w = (
        Window.partitionBy("name")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def ov_live(t: str) -> F.Column:
        return F.coalesce(
            F.last(
                F.when(
                    (F.col("tag") == "O") & (F.col("ovr_type") == t),
                    F.col("ovr_live"),
                ),
                ignorenulls=True,
            ).over(w),
            F.lit(False),
        )

    def ov_pay(t: str, *cols: F.Column) -> F.Column:
        """As-of payload struct for override type `t`: non-null on
        every record of that type (incl. tombstones, so a delete
        resets the payload), carried forward by last(ignorenulls)."""
        return F.last(
            F.when(
                (F.col("tag") == "O") & (F.col("ovr_type") == t),
                F.struct(F.col("ovr_live").alias("live"), *cols),
            ),
            ignorenulls=True,
        ).over(w)

    payload_cols = (
        [
            F.nullif(
                F.last("union_sentinel", ignorenulls=True).over(w),
                F.lit("__none__"),
            ).alias("union_eff"),
            ov_pay("Disabled", F.col("comments")).alias("d_pay"),
            ov_pay("OnDelayed", F.col("expiration")).alias("od_pay"),
            ov_pay(
                "Shelved",
                F.col("ovr_oneshot").alias("oneshot"),
                F.col("expiration"),
                F.col("reason"),
                F.col("comments"),
            ).alias("sh_pay"),
            F.last("pv", ignorenulls=True).over(w).alias("pv_eff"),
            F.last("location", ignorenulls=True).over(w).alias("location_eff"),
        ]
        if payloads
        else []
    )

    state_cols = merged.select(
        "seq",
        "name",
        "tag",
        F.coalesce(
            F.last("cur_active", ignorenulls=True).over(w), F.lit(False)
        ).alias("active"),
        F.when(
            F.col("tag") == "A", F.col("cur_active") & ~F.col("prev_active")
        )
        .otherwise(F.lit(False))
        .alias("transition_to_active"),
        F.when(
            F.col("tag") == "A", ~F.col("cur_active") & F.col("prev_active")
        )
        .otherwise(F.lit(False))
        .alias("transition_to_normal"),
        *[ov_live(t).alias(f"ov_{t.lower()}") for t in adapters.OVERRIDE_TYPES],
        F.coalesce(
            F.last(
                F.when(
                    (F.col("tag") == "O") & (F.col("ovr_type") == "Shelved"),
                    F.col("ovr_oneshot"),
                ),
                ignorenulls=True,
            ).over(w),
            F.lit(False),
        ).alias("shelved_oneshot"),
        F.nullif(
            F.last("action_sentinel", ignorenulls=True).over(w),
            F.lit("__deleted__"),
        ).alias("action_eff"),
        *payload_cols,
    )

    dim_cols = (
        [
            "latchable",
            "ondelayseconds",
            "system",
            "filterable",
            "correctiveaction",
            "priority",
            "rationale",
            "offdelayseconds",
        ]
        if payloads
        else ["latchable", "ondelayseconds"]
    )
    dim = adapters.actions_dim(spark).select(
        F.col("name").alias("dim_name"), *dim_cols
    )
    joined = state_cols.join(
        F.broadcast(dim), state_cols["action_eff"] == dim["dim_name"], "left"
    )

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
        & F.col("shelved_oneshot")
        & F.col("transition_to_normal")
    )

    from .operators.effective_state import state_cascade

    kept = joined.filter(~(latching | ondelaying | unshelving))  # E1
    state = state_cascade(
        active=F.col("active"),
        disabled=F.col("ov_disabled"),
        filtered=F.col("ov_filtered"),
        masked=F.col("ov_masked"),
        shelved=F.col("ov_shelved"),
        shelved_oneshot=F.col("shelved_oneshot"),
        ondelayed=F.col("ov_ondelayed"),
        latched=F.col("ov_latched"),
        offdelayed=F.col("ov_offdelayed"),
    ).alias("state")
    if payloads:
        return kept.select("*", state)
    return kept.select("seq", "name", "active", state)

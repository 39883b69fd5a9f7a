"""The full rule topology as connected streaming queries.

Faithful to the reference's decomposition (EffectiveProcessor.java:
22-48): independent queries communicate ONLY through topics, and the
override feedback cycle (LatchRule.java:104-106, OnDelayRule.java:
108-110, OneShotRule.java:102-104 -> ActivationRule's override input)
lives *between* queries — Structured Streaming forbids cycles inside
one query (SURVEY.md §1.4).

Topics here are append-only parquet directories (`dir_stream`); in
production swap `kafka_stream` sources/sinks — the dataflow is
identical. Stages:

  stage0  ActivationRule/events: activation log --T1--> join current
          registration+override KTable snapshots -> monolog topic
  stage0b ActivationRule/overrides: override updates re-emit the
          joined monolog for the touched alarms with at-rest
          transitions (KTable-KTable join fires on either side;
          prev==next so no transition flags — ActivationRule.java:400)
  stage1  LatchRule:   T2 flag + Latched override feedback
  stage2  OnDelayRule: T3 flag + OnDelayed override feedback
  stage3  OneShotRule: T4 flag + Shelved tombstone feedback
  stage4  EffectiveStateRule: E1 intermediate-drop + E2 cascade ->
          effective topic
  (W1/W2 expiration run as separate timer queries — rules.expiration_stream)

`settle(rounds)` drives each query with Trigger.AvailableNow in
dependency order; feedback written in round r is consumed in round
r+1 — the reference's eventual consistency, made deterministic.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..adapters import actions_dim
from ..operators.compaction import latest_per_key
from ..operators.effective_state import state_cascade
from ..operators.overrides import latest_overrides
from ..operators.registration import effective_registrations
from . import rules
from .monolog import (
    MONOLOG_FULL_SCHEMA,
    OVERRIDE_TOPIC_SCHEMA,
    monolog_join,
    override_set,
    plus as _plus,
)
from .processors import latch_fn, ondelay_fn, oneshot_fn

ROUND_OFFSET = 10**9

INSTANCES_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("action", T.StringType(), True),
    ]
)


class AlarmTopology:
    """Directory-topic wiring + settle driver for the 6 rule queries."""

    def __init__(
        self, spark: SparkSession, root: str, actions: DataFrame | None = None
    ):
        self.spark = spark
        self.root = root
        self.actions = actions if actions is not None else actions_dim(spark)
        self.round = 0
        self.topics = {
            name: os.path.join(root, name)
            for name in (
                "instances",
                "activations",
                "overrides",
                "monolog",
                "monolog_latch",
                "monolog_ondelay",
                "monolog_oneshot",
                "effective",
            )
        }
        os.makedirs(root, exist_ok=True)

    # ----------------------------------------------------- topic io

    def _append(self, df: DataFrame, topic: str) -> None:
        df.write.mode("append").parquet(self.topics[topic])

    def seed(
        self,
        instances: DataFrame,
        activations: DataFrame,
        overrides: DataFrame,
    ) -> None:
        self._append(instances.select("seq", "name", "action"), "instances")
        self._append(activations.select("seq", "name", "union_type"), "activations")
        self._append(
            overrides.select(
                "seq", "name", "type", "tombstone", "expiration", "oneshot"
            ),
            "overrides",
        )
        # schema-bearing empty seeds so batch reads never fail
        for topic, schema in (
            ("monolog", MONOLOG_FULL_SCHEMA),
            ("monolog_latch", _plus(MONOLOG_FULL_SCHEMA, "latching")),
            (
                "monolog_ondelay",
                _plus(MONOLOG_FULL_SCHEMA, "latching", "ondelaying"),
            ),
            (
                "monolog_oneshot",
                _plus(MONOLOG_FULL_SCHEMA, "latching", "ondelaying", "unshelving"),
            ),
            (
                "effective",
                T.StructType(
                    [
                        T.StructField("seq", T.LongType()),
                        T.StructField("name", T.StringType()),
                        T.StructField("active", T.BooleanType()),
                        T.StructField("state", T.StringType()),
                    ]
                ),
            ),
        ):
            if not os.path.exists(self.topics[topic]):
                self.spark.createDataFrame([], schema).write.parquet(
                    self.topics[topic]
                )

    # ------------------------------------------- KTable batch reads

    def _registrations(self) -> DataFrame:
        inst = self.spark.read.schema(INSTANCES_SCHEMA).parquet(
            self.topics["instances"]
        )
        return effective_registrations(inst, self.actions).select(
            "name", "latchable", "ondelayseconds"
        )

    def _override_set(self) -> DataFrame:
        log = self.spark.read.schema(OVERRIDE_TOPIC_SCHEMA).parquet(
            self.topics["overrides"]
        )
        return override_set(log)

    def _join_monolog(self, base: DataFrame) -> DataFrame:
        """base: (name, seq, active, transition_to_active/_normal)."""
        return monolog_join(base, self._registrations(), self._override_set())

    # ------------------------------------------------------ stages

    def _run(self, df: DataFrame, batch_fn, ckpt_name: str) -> None:
        q = (
            df.writeStream.foreachBatch(batch_fn)
            .option(
                "checkpointLocation", os.path.join(self.root, "ckpt", ckpt_name)
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def _stage0_activations(self) -> None:
        stream = rules.transitions_stream(
            rules.dir_stream(
                self.spark, self.topics["activations"], rules.ACTIVATION_LOG_SCHEMA
            )
        )

        def fn(batch: DataFrame, _epoch: int) -> None:
            if batch.isEmpty():
                return
            self._append(self._join_monolog(batch), "monolog")

        self._run(stream, fn, "stage0")

    def _stage0b_overrides(self) -> None:
        stream = rules.dir_stream(
            self.spark, self.topics["overrides"], OVERRIDE_TOPIC_SCHEMA
        )
        offset = ROUND_OFFSET * (self.round + 1)

        def fn(batch: DataFrame, _epoch: int) -> None:
            if batch.isEmpty():
                return
            touched = batch.select("name", "seq").groupBy("name").agg(
                F.max("seq").alias("ovr_seq")
            )
            act_log = self.spark.read.schema(rules.ACTIVATION_LOG_SCHEMA).parquet(
                self.topics["activations"]
            )
            act = latest_per_key(act_log, ["name"]).select(
                "name",
                F.coalesce(F.col("union_type") == "Activation", F.lit(False)).alias(
                    "active"
                ),
            )
            base = (
                touched.join(act, "name", "left")
                .select(
                    "name",
                    (F.col("ovr_seq") + F.lit(offset)).alias("seq"),
                    F.coalesce(F.col("active"), F.lit(False)).alias("active"),
                    F.lit(False).alias("transition_to_active"),
                    F.lit(False).alias("transition_to_normal"),
                )
            )
            self._append(self._join_monolog(base), "monolog")

        self._run(stream, fn, "stage0b")

    def _flag_stage(
        self,
        in_topic: str,
        in_schema: T.StructType,
        flag_fn,
        flag_col: str,
        out_topic: str,
        emit_fn,
        ckpt: str,
    ) -> None:
        stream = rules.flagged_stream(
            rules.dir_stream(self.spark, in_topic, in_schema), flag_fn, flag_col
        )

        def fn(batch: DataFrame, _epoch: int) -> None:
            if batch.isEmpty():
                return
            self._append(batch, out_topic)
            emit_fn(batch)

        self._run(stream, fn, ckpt)

    def _emit_latch(self, batch: DataFrame) -> None:
        """P2+P9: Latched overrides onto the feedback topic."""
        offset = ROUND_OFFSET * (self.round + 1)
        out = batch.filter(
            F.coalesce(F.col("latchable"), F.lit(False))
            & F.col("transition_to_active")
        ).select(
            (F.col("seq") + F.lit(offset)).alias("seq"),
            "name",
            F.lit("Latched").alias("type"),
            F.lit(False).alias("tombstone"),
            F.lit(None).cast("long").alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )
        # write unconditionally: isEmpty() would execute the emit plan a
        # second time, and appending an empty batch is a no-op
        self._append(out, "overrides")

    def _emit_ondelay(self, batch: DataFrame) -> None:
        """P3+P10: OnDelayed override with computed expiry."""
        offset = ROUND_OFFSET * (self.round + 1)
        now_ms = int(time.time() * 1000)
        out = batch.filter(
            F.coalesce(F.col("ondelayseconds") > 0, F.lit(False))
            & F.col("transition_to_active")
        ).select(
            (F.col("seq") + F.lit(offset)).alias("seq"),
            "name",
            F.lit("OnDelayed").alias("type"),
            F.lit(False).alias("tombstone"),
            (F.lit(now_ms) + F.col("ondelayseconds") * 1000).alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )
        # write unconditionally: isEmpty() would execute the emit plan a
        # second time, and appending an empty batch is a no-op
        self._append(out, "overrides")

    def _emit_oneshot(self, batch: DataFrame) -> None:
        """P4+P11: Shelved tombstones."""
        offset = ROUND_OFFSET * (self.round + 1)
        out = batch.filter(
            F.col("ov_shelved")
            & F.coalesce(F.col("shelved_oneshot"), F.lit(False))
            & F.col("transition_to_normal")
        ).select(
            (F.col("seq") + F.lit(offset)).alias("seq"),
            "name",
            F.lit("Shelved").alias("type"),
            F.lit(True).alias("tombstone"),
            F.lit(None).cast("long").alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )
        # write unconditionally: isEmpty() would execute the emit plan a
        # second time, and appending an empty batch is a no-op
        self._append(out, "overrides")

    def _stage4_effective(self) -> None:
        schema = _plus(MONOLOG_FULL_SCHEMA, "latching", "ondelaying", "unshelving")
        stream = rules.dir_stream(self.spark, self.topics["monolog_oneshot"], schema)

        def fn(batch: DataFrame, _epoch: int) -> None:
            if batch.isEmpty():
                return
            kept = batch.filter(
                ~(F.col("latching") | F.col("ondelaying") | F.col("unshelving"))
            )
            out = kept.withColumn(
                "state",
                state_cascade(
                    active=F.col("active"),
                    disabled=F.col("ov_disabled"),
                    filtered=F.col("ov_filtered"),
                    masked=F.col("ov_masked"),
                    shelved=F.col("ov_shelved"),
                    shelved_oneshot=F.col("shelved_oneshot"),
                    ondelayed=F.col("ov_ondelayed"),
                    latched=F.col("latching") | F.col("ov_latched"),
                    offdelayed=F.col("ov_offdelayed"),
                ),
            ).select("seq", "name", "active", "state")
            # unconditional: isEmpty() would run the plan twice
            self._append(out, "effective")

        self._run(stream, fn, "stage4")

    # -------------------------------------------- W1/W2 expiration

    def run_expirations(self, now_ms: int | None = None) -> None:
        """W1/W2 — tombstone live Shelved/OnDelayed overrides past
        expiry, onto the overrides feedback topic.

        The streaming deployment uses per-key processing-time timers
        (rules.expiration_stream, ShelveExpirationRule.java:147-169);
        under the batch settle() driver the honest analog is a sweep
        against the frozen clock: compact the topic, keep live
        overrides with expiration <= now, emit tombstones. Idempotent:
        once tombstoned, an override is no longer live.
        """
        if now_ms is None:
            now_ms = int(time.time() * 1000)
        offset = ROUND_OFFSET * (self.round + 1)
        log = self.spark.read.schema(OVERRIDE_TOPIC_SCHEMA).parquet(
            self.topics["overrides"]
        )
        due = latest_overrides(log).filter(
            F.col("type").isin("Shelved", "OnDelayed")
            & (F.col("expiration") <= F.lit(now_ms))
        )
        out = due.select(
            (F.col("seq") + F.lit(offset)).alias("seq"),
            "name",
            "type",
            F.lit(True).alias("tombstone"),
            F.lit(None).cast("long").alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )
        # write unconditionally: isEmpty() would execute the emit plan a
        # second time, and appending an empty batch is a no-op
        self._append(out, "overrides")

    # ------------------------------------- optional corrected mask rule

    def run_mask(self, masked_by: DataFrame) -> None:
        """Corrected MaskRule sweep (P5+T5) — OPTIONAL, off the default
        chain because the reference never registers its MaskRule
        (dead code; see rules.q_mask_overrides for the defects this
        corrects). `masked_by` is the (name, parent) mapping the
        reference would read from the registration payload's maskedby
        field.

        Reconciles each mapped child's Masked override with its
        parent's CURRENT activity from the compacted monolog state:
        parent active and child unmasked -> Masked add; parent
        inactive/unknown and child masked -> Masked tombstone. Emits
        onto the overrides feedback topic, so the next settle round
        folds the mask into the effective-state cascade exactly like
        latch/ondelay/oneshot feedback. Idempotent once reconciled.
        """
        offset = ROUND_OFFSET * (self.round + 1)
        mono = self.spark.read.schema(MONOLOG_FULL_SCHEMA).parquet(
            self.topics["monolog"]
        )
        state = latest_per_key(
            mono.select("name", "seq", "active", "ov_masked"), ["name"]
        )
        child = state.join(masked_by, "name").select(
            "name", "seq", "ov_masked", "parent"
        )
        parent_state = state.select(
            F.col("name").alias("p_name"), F.col("active").alias("p_active")
        )
        j = child.join(
            parent_state, child["parent"] == parent_state["p_name"], "left"
        )
        p_active = F.coalesce(F.col("p_active"), F.lit(False))
        out = j.filter(
            p_active != F.coalesce(F.col("ov_masked"), F.lit(False))
        ).select(
            (F.col("seq") + F.lit(offset)).alias("seq"),
            "name",
            F.lit("Masked").alias("type"),
            (~p_active).alias("tombstone"),
            F.lit(None).cast("long").alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )
        # write unconditionally: isEmpty() would execute the emit plan a
        # second time, and appending an empty batch is a no-op
        self._append(out, "overrides")

    # ------------------------------------------------------- driver

    def run_round(self) -> None:
        self._stage0_activations()
        self._stage0b_overrides()
        self._flag_stage(
            self.topics["monolog"],
            MONOLOG_FULL_SCHEMA,
            latch_fn,
            "latching",
            "monolog_latch",
            self._emit_latch,
            "stage1",
        )
        self._flag_stage(
            self.topics["monolog_latch"],
            _plus(MONOLOG_FULL_SCHEMA, "latching"),
            ondelay_fn,
            "ondelaying",
            "monolog_ondelay",
            self._emit_ondelay,
            "stage2",
        )
        self._flag_stage(
            self.topics["monolog_ondelay"],
            _plus(MONOLOG_FULL_SCHEMA, "latching", "ondelaying"),
            oneshot_fn,
            "unshelving",
            "monolog_oneshot",
            self._emit_oneshot,
            "stage3",
        )
        self._stage4_effective()
        self.round += 1

    def settle(self, rounds: int = 3) -> None:
        for _ in range(rounds):
            self.run_round()

    def effective_states(self) -> DataFrame:
        eff = self.spark.read.parquet(self.topics["effective"])
        return latest_per_key(eff, ["name"]).select("name", "active", "state")

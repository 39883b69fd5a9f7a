"""Production deployment driver — EP1 parity (EffectiveProcessor.main).

The reference boots 8 KafkaStreams apps, each with its own
application.id / consumer group / state dir, communicating only
through topics (EffectiveProcessor.java:19-73, ProcessingRule.java:
37-68). The Spark shape: ONE SparkSession, N independent streaming
queries, each with its own checkpoint directory (≙ application.id)
and a topic source/sink. The override feedback cycle (SURVEY.md §1.4)
lives between queries exactly as it lives between the reference's
consumer groups.

Dataflow (mirrors the reference chain, EffectiveProcessor.java:22-48):

  alarm-activations --T1 + registration/override KTable join-->
  intermediate-monolog --T2--> intermediate-latch --T3-->
  intermediate-ondelay --T4--> intermediate-oneshot --E1+E2-->
  effective-alarms

  alarm-overrides ALSO re-triggers the monolog join for touched
  alarms with at-rest transitions (the KTable-KTable join fires on
  either side — ActivationRule.java:400); without this query the
  T2/T3/T4 override feedback would never reach the effective state.

  T2/T3/T4 feed override records back onto alarm-overrides, and
  W1/W2 expiration timers tombstone them; override records are
  keyed by the composite {name, type} (AlarmOverrideKey) so a
  tombstone deletes exactly the right entry under
  latest_per_key(["name","type"]) compaction.

The topic transport is pluggable (`Transport`): `KafkaTransport`
is the production path (spark-sql-kafka package + reachable broker,
which this container lacks); `FakeBrokerTransport` runs the SAME
query graph over `sources.fake_broker` parquet topics that carry the
exact Kafka wire columns, so the whole deployment — record layout,
composite keys, null-value tombstones, feedback cycle — executes
end-to-end under test (tests/test_deploy.py) without a broker.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.compaction import latest_per_key
from ..operators.effective_state import state_cascade
from ..session import get_spark
from . import rules
from .monolog import (
    MONOLOG_FULL_SCHEMA,
    OVERRIDE_VALUE_SCHEMA,
    composite_override_key,
    decode_override_records,
    monolog_join,
    override_set,
    plus,
)
from .processors import latch_fn, ondelay_fn, oneshot_fn

# re-emitted monolog rows must compact above the original event seqs
# downstream (same discipline as topology.ROUND_OFFSET); broker
# offsets are monotone per topic so offset + this stays increasing
SEQ_OFFSET = 10**9


class Transport:
    """Topic IO boundary: raw wire records in/out. Parsing is SHARED
    (`rules.parse_keyed_records`) so both implementations run the
    identical wire -> rows transform; only where bytes live differs."""

    def raw_stream(self, spark: SparkSession, topic: str) -> DataFrame:
        raise NotImplementedError

    def raw_batch(self, spark: SparkSession, topic: str) -> DataFrame:
        raise NotImplementedError

    def write(self, records: DataFrame, topic: str) -> None:
        """Producer: records carry key/value (+ optional headers)."""
        raise NotImplementedError

    # ---- shared, transport-independent ----

    def stream(self, spark, topic, value_schema) -> DataFrame:
        return rules.parse_keyed_records(
            self.raw_stream(spark, topic), value_schema
        )

    def table(self, spark, topic, value_schema) -> DataFrame:
        """Batch KTable snapshot of a topic (per-micro-batch read)."""
        return rules.parse_keyed_records(
            self.raw_batch(spark, topic), value_schema
        )

    def sink(self, records, topic, checkpoint, qname, trigger=None):
        """Streaming producer: records stream -> topic."""

        def fn(batch: DataFrame, _epoch: int, _t=topic) -> None:
            self.write(batch, _t)

        return self.foreach(records, fn, checkpoint, qname, trigger)

    def foreach(self, src, batch_fn, checkpoint, qname, trigger=None):
        w = (
            src.writeStream.foreachBatch(batch_fn)
            .option("checkpointLocation", checkpoint)
            .queryName(qname)
        )
        if trigger is not None:
            w = w.trigger(processingTime=trigger)
        return w.start()


class KafkaTransport(Transport):
    """Real broker (production). Needs spark-sql-kafka on the
    classpath and a reachable bootstrap — neither exists in this
    container, so this class is exercised only for its plan wiring."""

    def __init__(self, bootstrap: str):
        self.bootstrap = bootstrap

    def raw_stream(self, spark, topic):
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .option("includeHeaders", "true")
            .load()
        )

    def raw_batch(self, spark, topic):
        return (
            spark.read.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .option("includeHeaders", "true")
            .load()
        )

    def write(self, records, topic):
        (
            records.write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("topic", topic)
            .save()
        )

    def sink(self, records, topic, checkpoint, qname, trigger=None):
        # native streaming kafka sink (exactly-once offsets handling)
        w = (
            records.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint)
            .queryName(qname)
        )
        if trigger is not None:
            w = w.trigger(processingTime=trigger)
        return w.start()


class FakeBrokerTransport(Transport):
    """`sources.fake_broker` parquet topics with Kafka wire columns."""

    def __init__(self, broker):
        self.broker = broker

    def raw_stream(self, spark, topic):
        return self.broker.raw_stream(topic)

    def raw_batch(self, spark, topic):
        return self.broker.raw_batch(topic)

    def write(self, records, topic):
        self.broker.write(records, topic)


# Reserved key for the W1/W2 boot-tick tombstone (see the timer-query
# block in start_rule_queries): never a real alarm name, filtered out
# of the monolog fan-in.
RESERVED_TICK_NAME = "__tick__"


def _record(df: DataFrame, key: F.Column) -> DataFrame:
    """Keyed JSON record for an intermediate topic (full row value)."""
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def _override_record(df: DataFrame, tombstone: bool) -> DataFrame:
    """Override feedback record: composite {name, type} key; value is
    the override payload, or null for a tombstone (Kafka compaction
    delete — OneShotRule.java:98, ShelveExpirationRule.java:163-168)."""
    key = composite_override_key(F.col("name"), F.col("type"))
    if tombstone:
        return df.select(
            key.alias("key"), F.lit(None).cast("string").alias("value")
        )
    value_cols = [c for c in df.columns if c not in ("name", "type")]
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*value_cols)).alias("value"),
    )


def start_rule_queries(
    spark: SparkSession,
    bootstrap: str | None = None,
    checkpoint_root: str | None = None,
    transport: Transport | None = None,
    available_now: bool = False,
):
    """Start every rule as its own streaming query; returns the list
    of StreamingQuery handles (caller awaits / monitors them).

    `checkpoint_root` is REQUIRED (no shared default): streaming
    checkpoints encode committed source offsets, so two deployments
    silently sharing a default directory would each skip the records
    the other already consumed — the worst failure mode is no error
    and no output. main() wires it from $STATE_DIR.

    Each query gets its own checkpoint dir, the analog of the
    reference's per-rule application.id + RocksDB state dir
    (ProcessingRule.java:44-54).

    `available_now=True` runs one settle pass instead of a resident
    deployment: each query is started, DRAINED (processAllAvailable)
    and stopped IN DEPENDENCY ORDER before the next starts, so one
    call propagates a full chain hop-by-hop (feedback written this
    pass is consumed by the next call — the reference's eventual
    consistency, made deterministic; same discipline as
    topology.settle). Drain-and-stop rather than Trigger.AvailableNow
    because the W1/W2 expiration operators use ProcessingTimeTimeout,
    whose pending-timer no-data batches keep an AvailableNow query
    from ever terminating."""
    transport = transport if transport is not None else KafkaTransport(bootstrap)

    if checkpoint_root is None:
        raise ValueError(
            "checkpoint_root is required: streaming checkpoints commit "
            "source offsets, and a shared default path would make a "
            "second deployment silently skip already-consumed records"
        )

    def ckpt(name: str) -> str:
        return os.path.join(checkpoint_root, name)

    queries = []

    def launch(q, timer: bool = False) -> None:
        queries.append(q)
        if not available_now:
            return
        if timer:
            # W1/W2 use ProcessingTimeTimeout: pending-timer no-data
            # batches keep the stream permanently "busy", so BOTH
            # Trigger.AvailableNow and processAllAvailable() would
            # block forever. Drain = wait until the source is caught
            # up (isDataAvailable False) with the trigger IDLE, then
            # stop. Idle matters twice: it means all planned work
            # committed, and it avoids interrupting an in-flight
            # foreachBatch — that raises a Py4J error whose message
            # (a full nested traceback) blows up Spark's
            # isInterruptionException regex with a StackOverflowError
            # in the stream thread (shutdown noise, but it skips
            # state-store cleanup).
            import time as _time

            t0 = _time.time()
            while _time.time() - t0 < 60:
                p = q.lastProgress
                st = q.status
                idle = not st.get("isTriggerActive")
                caught_up = not st.get("isDataAvailable")
                if (
                    idle
                    and caught_up
                    # a completed batch proves the availability poll
                    # ran; before any batch, give the query 5 s to
                    # discover there is nothing to process
                    and (p is not None or _time.time() - t0 > 5)
                ):
                    break
                _time.sleep(0.5)
            # PAST-DUE timers fire in the no-data batch AFTER the
            # query is caught up (ProcessingTimeTimeout schedules one
            # every trigger) — stopping at first-idle loses a timer
            # armed before a restart whose deadline passed while the
            # deployment was down (the RocksDB-punctuator-recovery
            # case, pinned by test_deploy_shelve_timer_survives_restart).
            # Wait for two more COMPLETED batches (first processes
            # expired timers, second proves the first's output
            # committed) with a hard cap.
            p = q.lastProgress
            base = p.get("batchId") if p else -1
            t1 = _time.time()
            while _time.time() - t1 < 10:
                p = q.lastProgress
                if p is not None and p.get("batchId", -1) >= base + 2:
                    break
                _time.sleep(0.5)
        else:
            q.processAllAvailable()
        q.stop()
        q.awaitTermination()

    def monolog_out(base: DataFrame) -> DataFrame:
        """Join a (name, seq, active, transition_*) base against the
        CURRENT registration + override KTable snapshots
        (ActivationRule.java:323-429)."""
        from ..adapters import actions_dim
        from ..operators.registration import effective_registrations

        inst = transport.table(
            spark, "alarm-instances", rules.INSTANCE_VALUE_SCHEMA
        )
        reg = effective_registrations(inst, actions_dim(spark)).select(
            "name", "latchable", "ondelayseconds"
        )
        ovr = override_set(
            decode_override_records(
                transport.table(spark, "alarm-overrides", OVERRIDE_VALUE_SCHEMA)
            )
        )
        return monolog_join(base, reg, ovr)

    # T1 + monolog join — activations -> transition flags, then join
    # the current registration + override KTable snapshots so the flag
    # chain sees the full monolog row (ActivationRule.java:323-429).
    # foreachBatch because the KTable sides are batch snapshots.
    act = transport.stream(
        spark, "alarm-activations", rules.ACTIVATION_LOG_SCHEMA
    )
    transitions = rules.transitions_stream(act)

    def monolog_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        transport.write(
            _record(monolog_out(batch), F.col("name")), "intermediate-monolog"
        )

    launch(
        transport.foreach(
            transitions, monolog_batch, ckpt("activation"), "activation"
        )
    )

    # ActivationRule, override side — override updates re-emit the
    # joined monolog for the touched alarms with AT-REST transitions
    # (KTable-KTable join fires on either side, ActivationRule.java:
    # 400: prev == next so both transition flags are false). This is
    # the query that carries T2/T3/T4 feedback into effective state.
    ovr_updates = transport.stream(
        spark, "alarm-overrides", OVERRIDE_VALUE_SCHEMA
    )

    def override_monolog_batch(batch: DataFrame, _epoch: int) -> None:
        if batch.isEmpty():
            return
        touched = (
            decode_override_records(batch)
            # the W1/W2 boot tick is wire plumbing for the timer
            # queries, not an alarm — it must not fan a monolog row
            # into the pipeline
            .filter(F.col("name") != RESERVED_TICK_NAME)
            .groupBy("name")
            .agg(F.max("seq").alias("ovr_seq"))
        )
        act_log = transport.table(
            spark, "alarm-activations", rules.ACTIVATION_LOG_SCHEMA
        )
        current = latest_per_key(act_log, ["name"]).select(
            "name",
            F.coalesce(F.col("union_type") == "Activation", F.lit(False)).alias(
                "active"
            ),
        )
        base = touched.join(current, "name", "left").select(
            "name",
            (F.col("ovr_seq") + F.lit(SEQ_OFFSET)).alias("seq"),
            F.coalesce(F.col("active"), F.lit(False)).alias("active"),
            F.lit(False).alias("transition_to_active"),
            F.lit(False).alias("transition_to_normal"),
        )
        transport.write(
            _record(monolog_out(base), F.col("name")), "intermediate-monolog"
        )

    launch(
        transport.foreach(
            ovr_updates, override_monolog_batch, ckpt("activation-overrides"),
            "activation-overrides",
        )
    )

    # T2/T3/T4 — CHAINED flag stages (reference chains
    # intermediate-latch -> -ondelay -> -oneshot): each consumes the
    # previous stage's topic with the accumulated schema, appends its
    # flag, and feeds override records back onto alarm-overrides.
    def latch_feedback(batch: DataFrame) -> DataFrame:
        return batch.filter(
            F.coalesce(F.col("latchable"), F.lit(False))
            & F.col("transition_to_active")
        ).select(
            "name",
            F.lit("Latched").alias("type"),
            F.lit(False).alias("tombstone"),
            F.lit(None).cast("long").alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )

    def ondelay_feedback(batch: DataFrame) -> DataFrame:
        import time as _time

        now_ms = int(_time.time() * 1000)
        return batch.filter(
            F.coalesce(F.col("ondelayseconds") > 0, F.lit(False))
            & F.col("transition_to_active")
        ).select(
            "name",
            F.lit("OnDelayed").alias("type"),
            F.lit(False).alias("tombstone"),
            (F.lit(now_ms) + F.col("ondelayseconds") * 1000).alias("expiration"),
            F.lit(None).cast("boolean").alias("oneshot"),
        )

    def oneshot_feedback(batch: DataFrame) -> DataFrame:
        return batch.filter(
            F.col("ov_shelved")
            & F.coalesce(F.col("shelved_oneshot"), F.lit(False))
            & F.col("transition_to_normal")
        ).select("name", F.lit("Shelved").alias("type"))

    stages = (
        (
            "latch",
            "intermediate-monolog",
            MONOLOG_FULL_SCHEMA,
            latch_fn,
            "latching",
            "intermediate-latch",
            latch_feedback,
            False,
        ),
        (
            "ondelay",
            "intermediate-latch",
            plus(MONOLOG_FULL_SCHEMA, "latching"),
            ondelay_fn,
            "ondelaying",
            "intermediate-ondelay",
            ondelay_feedback,
            False,
        ),
        (
            "oneshot",
            "intermediate-ondelay",
            plus(MONOLOG_FULL_SCHEMA, "latching", "ondelaying"),
            oneshot_fn,
            "unshelving",
            "intermediate-oneshot",
            oneshot_feedback,
            True,
        ),
    )
    for qname, in_topic, in_schema, fn, flag, out_topic, feedback, tomb in stages:
        src = transport.stream(spark, in_topic, in_schema)
        flagged = rules.flagged_stream(src, fn, flag)

        def stage_batch(
            batch: DataFrame,
            _epoch: int,
            _out=out_topic,
            _fb=feedback,
            _tomb=tomb,
        ) -> None:
            transport.write(_record(batch, F.col("name")), _out)
            transport.write(
                _override_record(_fb(batch), tombstone=_tomb),
                "alarm-overrides",
            )

        launch(
            transport.foreach(flagged, stage_batch, ckpt(qname), qname)
        )

    # E1+E2 — EffectiveStateRule: drop in-transit rows, apply the
    # precedence cascade, publish effective alarms.
    final_schema = plus(
        MONOLOG_FULL_SCHEMA, "latching", "ondelaying", "unshelving"
    )
    oneshot_out = transport.stream(spark, "intermediate-oneshot", final_schema)
    kept = oneshot_out.filter(
        ~(F.col("latching") | F.col("ondelaying") | F.col("unshelving"))
    )
    effective = kept.withColumn(
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
    launch(
        transport.sink(
            _record(effective, F.col("name")),
            "effective-alarms",
            ckpt("effective-state"),
            "effective-state",
        )
    )

    # W1/W2 — the async expiration timers, overrides -> overrides
    # (ShelveExpirationRule / OnDelayExpirationRule); composite-key
    # null-value tombstones flow back onto the topic they consume.
    for ovr_type, qname in (("Shelved", "shelve-expiration"),
                            ("OnDelayed", "ondelay-expiration")):
        src = decode_override_records(
            transport.stream(
                spark, "alarm-overrides", OVERRIDE_VALUE_SCHEMA
            )
        )
        # Boot tick: a restarted stateful query with NO new data never
        # runs a batch — the engine schedules timeout no-data batches
        # only after a first batch has executed in the CURRENT run —
        # so a processing-time timer armed before a restart whose
        # deadline passed while the deployment was down would sit
        # recovered-but-unfired forever. The reference's punctuator
        # fires on wall clock from startup regardless of traffic
        # (ShelveExpirationRule.java:105-120); the streaming analog is
        # ONE tombstone record for a reserved key written at each
        # deployment start: its batch runs under the current clock,
        # fires every expired timer, and re-primes the engine's
        # timeout-batch loop for the rest of the run. The processor's
        # tombstone branch drops the tick without arming, emitting, or
        # touching real state, and compaction eventually discards the
        # tombstones themselves (pinned by
        # test_deploy_shelve_timer_survives_restart).
        transport.write(
            spark.createDataFrame(
                [(RESERVED_TICK_NAME, ovr_type)], "name string, type string"
            ).select(
                composite_override_key(
                    F.col("name"), F.col("type")
                ).alias("key"),
                F.lit(None).cast("string").alias("value"),
            ),
            "alarm-overrides",
        )
        expired = rules.expiration_stream(src, ovr_type).withColumn(
            "type", F.lit(ovr_type)
        )
        launch(
            transport.sink(
                _override_record(expired, tombstone=True),
                "alarm-overrides",
                ckpt(qname),
                qname,
                # throttle: ProcessingTimeTimeout operators run no-data
                # batches to fire pending timers; the default ASAP
                # trigger would spin them back-to-back (pure churn —
                # the reference's punctuator also ticks on an interval,
                # ShelveExpirationRule.java:105-120)
                trigger="1 second",
            ),
            timer=True,
        )

    return queries


def main() -> None:  # pragma: no cover - needs a broker
    bootstrap = os.environ["BOOTSTRAP_SERVERS"]
    checkpoint_root = os.environ.get("STATE_DIR", "/tmp/jaws-spark-state")
    spark = get_spark("jaws-effective-processor-spark")
    queries = start_rule_queries(spark, bootstrap, checkpoint_root)
    for q in queries:
        q.awaitTermination()


if __name__ == "__main__":
    main()

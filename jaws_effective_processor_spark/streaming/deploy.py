"""Production deployment driver — EP1 parity (EffectiveProcessor.main).

The reference boots 8 KafkaStreams apps, each with its own
application.id / consumer group / state dir, communicating only
through topics (EffectiveProcessor.java:19-73, ProcessingRule.java:
37-68). The Spark shape: ONE SparkSession, N independent streaming
queries, each with its own checkpoint directory (≙ application.id)
and Kafka source/sink. The override feedback cycle (SURVEY.md §1.4)
lives between queries exactly as it lives between the reference's
consumer groups.

Dataflow (mirrors the reference chain, EffectiveProcessor.java:22-48):

  alarm-activations --T1 + registration/override KTable join-->
  intermediate-monolog --T2--> intermediate-latch --T3-->
  intermediate-ondelay --T4--> intermediate-oneshot --E1+E2-->
  effective-alarms

  T2/T3/T4 also feed override records back onto alarm-overrides,
  and W1/W2 expiration timers tombstone them; override records are
  keyed by the composite {name, type} (AlarmOverrideKey) so a
  tombstone deletes exactly the right entry under
  latest_per_key(["name","type"]) compaction.

This module is the wiring, import-safe without a broker; `main()`
requires a reachable Kafka cluster and the spark-sql-kafka package,
so this container never runs it — the identical dataflow is
exercised end-to-end over directory topics in topology.py, and the
per-rule processors are unit-tested in test_streaming.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _kafka_writer(df: DataFrame, bootstrap: str, topic: str) -> None:
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )


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
    bootstrap: str,
    checkpoint_root: str,
):
    """Start every rule as its own streaming query; returns the list
    of StreamingQuery handles (caller awaits / monitors them).

    Each query gets its own checkpoint dir, the analog of the
    reference's per-rule application.id + RocksDB state dir
    (ProcessingRule.java:44-54)."""

    def ckpt(name: str) -> str:
        return os.path.join(checkpoint_root, name)

    def kafka_table(topic: str, schema) -> DataFrame:
        """Batch KTable snapshot of a topic (per-micro-batch read)."""
        from ..sources.io import kafka_batch

        return kafka_batch(spark, bootstrap, topic, schema)

    queries = []

    # W1/W2 — the async expiration timers, overrides -> overrides
    # (ShelveExpirationRule / OnDelayExpirationRule); composite-key
    # null-value tombstones flow back onto the topic they consume.
    for ovr_type, qname in (("Shelved", "shelve-expiration"),
                            ("OnDelayed", "ondelay-expiration")):
        src = decode_override_records(
            rules.kafka_stream(
                spark, bootstrap, "alarm-overrides", OVERRIDE_VALUE_SCHEMA
            )
        )
        expired = rules.expiration_stream(src, ovr_type).withColumn(
            "type", F.lit(ovr_type)
        )
        sink = (
            _override_record(expired, tombstone=True)
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", "alarm-overrides")
            .option("checkpointLocation", ckpt(qname))
            .queryName(qname)
        )
        queries.append(sink.start())

    # T1 + monolog join — activations -> transition flags, then join
    # the current registration + override KTable snapshots so the flag
    # chain sees the full monolog row (ActivationRule.java:323-429).
    # foreachBatch because the KTable sides are batch snapshots.
    act = rules.kafka_stream(
        spark, bootstrap, "alarm-activations", rules.ACTIVATION_LOG_SCHEMA
    )
    transitions = rules.transitions_stream(act)

    def monolog_batch(batch: DataFrame, _epoch: int) -> None:
        from ..adapters import actions_dim
        from ..operators.registration import effective_registrations

        inst = kafka_table("alarm-instances", rules.INSTANCE_VALUE_SCHEMA)
        reg = effective_registrations(inst, actions_dim(spark)).select(
            "name", "latchable", "ondelayseconds"
        )
        ovr = override_set(
            decode_override_records(
                kafka_table("alarm-overrides", OVERRIDE_VALUE_SCHEMA)
            )
        )
        out = monolog_join(batch, reg, ovr)
        _kafka_writer(
            _record(out, F.col("name")), bootstrap, "intermediate-monolog"
        )

    queries.append(
        transitions.writeStream.foreachBatch(monolog_batch)
        .option("checkpointLocation", ckpt("activation"))
        .queryName("activation")
        .start()
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
        src = rules.kafka_stream(spark, bootstrap, in_topic, in_schema)
        flagged = rules.flagged_stream(src, fn, flag)

        def stage_batch(
            batch: DataFrame,
            _epoch: int,
            _out=out_topic,
            _fb=feedback,
            _tomb=tomb,
        ) -> None:
            _kafka_writer(_record(batch, F.col("name")), bootstrap, _out)
            _kafka_writer(
                _override_record(_fb(batch), tombstone=_tomb),
                bootstrap,
                "alarm-overrides",
            )

        queries.append(
            flagged.writeStream.foreachBatch(stage_batch)
            .option("checkpointLocation", ckpt(qname))
            .queryName(qname)
            .start()
        )

    # E1+E2 — EffectiveStateRule: drop in-transit rows, apply the
    # precedence cascade, publish effective alarms.
    final_schema = plus(
        MONOLOG_FULL_SCHEMA, "latching", "ondelaying", "unshelving"
    )
    oneshot_out = rules.kafka_stream(
        spark, bootstrap, "intermediate-oneshot", final_schema
    )
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
    queries.append(
        _record(effective, F.col("name"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", "effective-alarms")
        .option("checkpointLocation", ckpt("effective-state"))
        .queryName("effective-state")
        .start()
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

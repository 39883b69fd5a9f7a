"""Production deployment driver — EP1 parity (EffectiveProcessor.main).

The reference boots 8 KafkaStreams apps, each with its own
application.id / consumer group / state dir, communicating only
through topics (EffectiveProcessor.java:19-73, ProcessingRule.java:
37-68). The Spark shape: ONE SparkSession, N independent
`writeStream` queries, each with its own checkpoint directory
(≙ application.id) and Kafka source/sink. The override feedback
cycle (SURVEY.md §1.4) lives between queries exactly as it lives
between the reference's consumer groups.

This module is the wiring, import-safe without a broker; `main()`
requires a reachable Kafka cluster and the spark-sql-kafka package,
so this container never runs it — the identical dataflow is
exercised end-to-end over directory topics in topology.py, and the
per-rule processors are unit-tested in test_streaming.py.

Topics (names mirror the reference's, EffectiveProcessor.java:22-48):
  alarm-instances, alarm-activations, alarm-overrides (inputs)
  intermediate-registration/-activation/-latch/-ondelay/-oneshot
  effective-registrations, effective-notifications, effective-alarms
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..session import get_spark
from . import rules


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
    from pyspark.sql import functions as F

    def ckpt(name: str) -> str:
        return os.path.join(checkpoint_root, name)

    queries = []

    # W1/W2 — the async expiration timers, overrides -> overrides
    # (ShelveExpirationRule / OnDelayExpirationRule); value=null
    # tombstones flow back onto the same topic they consume.
    for ovr_type, qname in (("Shelved", "shelve-expiration"),
                            ("OnDelayed", "ondelay-expiration")):
        src = rules.kafka_stream(
            spark, bootstrap, "alarm-overrides", rules.OVERRIDE_LOG_SCHEMA
        )
        expired = rules.expiration_stream(src, ovr_type)
        sink = (
            expired.select(
                F.col("name").cast("string").alias("key"),
                F.lit(None).cast("string").alias("value"),  # tombstone
            )
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", "alarm-overrides")
            .option("checkpointLocation", ckpt(qname))
            .queryName(qname)
        )
        queries.append(sink.start())

    # T1 — activations -> transition-flagged monolog stream
    act = rules.kafka_stream(
        spark, bootstrap, "alarm-activations", rules.ACTIVATION_LOG_SCHEMA
    )
    transitions = rules.transitions_stream(act)
    queries.append(
        transitions.select(
            F.col("name").cast("string").alias("key"),
            F.to_json(F.struct(*transitions.columns)).alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", "intermediate-activation")
        .option("checkpointLocation", ckpt("activation"))
        .queryName("activation")
        .start()
    )

    # T2/T3/T4 — monolog -> flag + override feedback, one query each
    for qname, topic, stream_fn in (
        ("latch", "intermediate-latch", rules.latch_stream),
        ("ondelay", "intermediate-ondelay", rules.ondelay_stream),
        ("oneshot", "intermediate-oneshot", rules.oneshot_stream),
    ):
        monolog = rules.kafka_stream(
            spark, bootstrap, "intermediate-activation", rules.MONOLOG_SCHEMA
        )
        flagged = stream_fn(monolog)
        queries.append(
            flagged.select(
                F.col("name").cast("string").alias("key"),
                F.to_json(F.struct(*flagged.columns)).alias("value"),
            )
            .writeStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap)
            .option("topic", topic)
            .option("checkpointLocation", ckpt(qname))
            .queryName(qname)
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

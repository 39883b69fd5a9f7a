"""Streaming rule wiring: sources -> stateful processors -> sinks.

The reference runs 8 independent KafkaStreams apps connected only by
topics (EffectiveProcessor.java:22-48); the Spark shape is N
independent streaming queries sharing one session, each with its own
checkpoint (≙ application.id, ProcessingRule.java:49). "Topics" are
pluggable: Kafka in production (`kafka_stream`), append-only parquet
directories in tests (`dir_stream` — same changelog semantics, lets
the cyclic feedback of SURVEY.md §1.4 live *between* queries exactly
like the reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark.sql.streaming.state import GroupStateTimeout

from . import processors as P

ACTIVATION_LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("union_type", T.StringType(), True),
    ]
)

MONOLOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("latchable", T.BooleanType(), True),
        T.StructField("ondelayseconds", T.LongType(), True),
        T.StructField("transition_to_active", T.BooleanType()),
        T.StructField("transition_to_normal", T.BooleanType()),
        T.StructField("ov_latched", T.BooleanType()),
        T.StructField("ov_ondelayed", T.BooleanType()),
        T.StructField("shelved_oneshot", T.BooleanType()),
    ]
)

OVERRIDE_LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("tombstone", T.BooleanType()),
        T.StructField("expiration", T.LongType(), True),
    ]
)


def dir_stream(
    spark: SparkSession, path: str, schema: T.StructType, max_files: int | None = None
) -> DataFrame:
    """A 'topic' as an append-only parquet directory (test transport)."""
    reader = spark.readStream.schema(schema)
    if max_files is not None:
        reader = reader.option("maxFilesPerTrigger", max_files)
    return reader.parquet(path)


def kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str, value_schema: T.StructType
) -> DataFrame:
    """A real Kafka topic source (production transport; S1/S2).

    Not exercisable in this container (no broker) — the plan shape is
    what the reference consumes: keyed records with headers
    (option includeHeaders, SURVEY.md §1.2)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("includeHeaders", "true")
        .load()
    )
    return raw.select(
        F.col("key").cast("string").alias("name"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("offset").alias("seq"),
    ).select("name", "seq", "v.*")


def transitions_stream(activations: DataFrame) -> DataFrame:
    """T1 as a streaming transform."""
    return activations.groupBy("name").applyInPandasWithState(
        P.transition_fn, P.TRANSITION_OUT, P.BOOL_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


def latch_stream(monolog: DataFrame) -> DataFrame:
    return monolog.groupBy("name").applyInPandasWithState(
        P.latch_fn, P.LATCH_OUT, P.BOOL_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


def ondelay_stream(monolog: DataFrame) -> DataFrame:
    return monolog.groupBy("name").applyInPandasWithState(
        P.ondelay_fn, P.ONDELAY_OUT, P.BOOL_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


def oneshot_stream(monolog: DataFrame) -> DataFrame:
    return monolog.groupBy("name").applyInPandasWithState(
        P.oneshot_fn, P.ONESHOT_OUT, P.BOOL_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


def latest_per_key_stream(changelog: DataFrame) -> DataFrame:
    """S1: KTable materialization as a changelog stream."""
    return changelog.groupBy("name").applyInPandasWithState(
        P.latest_per_key_fn, P.LATEST_OUT, P.LATEST_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


def expiration_stream(overrides: DataFrame, ovr_type: str) -> DataFrame:
    """W1 (Shelved) / W2 (OnDelayed): overrides in -> tombstones out,
    on processing-time timeouts."""
    filtered = overrides.filter(F.col("type") == ovr_type)
    return filtered.groupBy("name").applyInPandasWithState(
        P.expiration_fn, P.EXPIRATION_OUT, P.EXPIRATION_STATE, "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_to_memory(df: DataFrame, name: str, checkpoint: str):
    """Start an available-now query into a memory sink (test harness)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q

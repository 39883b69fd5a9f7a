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

# child-keyed mask-rule input: parent activity as-of each event plus
# the child's observed Masked-override state (corrected T5)
MASK_LOG_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("parent_active", T.BooleanType(), True),
        T.StructField("ov_masked", T.BooleanType(), True),
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


# value payload of the alarm-instances topic (key carries the name)
INSTANCE_VALUE_SCHEMA = T.StructType(
    [T.StructField("action", T.StringType(), True)]
)


def kafka_stream(
    spark: SparkSession, bootstrap: str, topic: str, value_schema: T.StructType
) -> DataFrame:
    """A real Kafka topic source (production transport; S1/S2).

    Not exercisable in this container (no broker) — the plan shape is
    what the reference consumes: keyed records with headers
    (option includeHeaders, SURVEY.md §1.2). `name`/`seq` come from
    the value when the schema carries them (intermediate topics ship
    full rows), else from the record key / offset — never both, so no
    duplicate output columns."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .option("includeHeaders", "true")
        .load()
    )
    return parse_keyed_records(raw, value_schema)


def parse_keyed_records(raw: DataFrame, value_schema: T.StructType) -> DataFrame:
    """Wire -> rows for keyed JSON records: the pure-transform half of
    `kafka_stream`, split out so the identical select runs on real
    Kafka rows AND on `sources.fake_broker` rows (same wire columns),
    making the deploy dataflow layout-verifiable without a broker."""
    parsed = raw.select(
        F.col("key").cast("string").alias("__key"),
        F.col("offset").alias("__offset"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
    )
    names = [f.name for f in value_schema.fields]
    cols = [
        (F.col("v.name") if "name" in names else F.col("__key")).alias("name"),
        (F.col("v.seq") if "seq" in names else F.col("__offset")).alias("seq"),
        *[F.col(f"v.{n}") for n in names if n not in ("name", "seq")],
    ]
    return parsed.select(*cols)


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


def mask_stream(mask_log: DataFrame) -> DataFrame:
    """Corrected T5 as a streaming transform (see processors.mask_fn)."""
    return mask_log.groupBy("name").applyInPandasWithState(
        P.mask_fn, P.MASK_OUT, P.BOOL_STATE, "append",
        GroupStateTimeout.NoTimeout,
    )


def flagged_stream(src: DataFrame, flag_fn, flag_col: str) -> DataFrame:
    """A flag stage that PRESERVES its input columns: runs `flag_fn`
    (latch/ondelay/oneshot machine) per key and merges the flag back
    onto the full rows, so stages can chain through topics the way the
    reference chains intermediate-latch -> -ondelay -> -oneshot
    (EffectiveProcessor.java:22-48) without losing the monolog
    payload."""
    import pandas as pd

    full_out = T.StructType(
        list(src.schema.fields) + [T.StructField(flag_col, T.BooleanType())]
    )

    def wrapped(key, rows, state):
        chunks = list(rows)
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            "seq", kind="stable"
        )
        flags = list(flag_fn(key, iter([pdf]), state))
        fl = pd.concat(flags, ignore_index=True)
        pdf = pdf.merge(fl[["seq", flag_col]], on="seq", how="left")
        pdf[flag_col] = pdf[flag_col].fillna(False)
        yield pdf

    return src.groupBy("name").applyInPandasWithState(
        wrapped, full_out, P.BOOL_STATE, "append",
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

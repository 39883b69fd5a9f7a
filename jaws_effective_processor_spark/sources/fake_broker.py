"""Broker-less Kafka transport with the exact wire layout.

The container has no Kafka broker, so the production path
(`rules.kafka_stream`, `sources.io.kafka_sink`, `deploy.py`) could
never execute here. This module closes that gap without faking the
semantics away: topics are append-only parquet directories whose rows
carry EXACTLY the columns the spark-sql-kafka source exposes —

    key        binary
    value      binary          (null value == tombstone)
    topic      string
    partition  int
    offset     long            (monotone per topic, like a broker)
    timestamp  timestamp
    timestampType int
    headers    array<struct<key:string, value:binary>>

so the SAME parse half used on real Kafka records
(`rules.parse_keyed_records`, `sources.io.parse_kafka_records`) runs
unchanged on these rows, and whatever record-building code writes here
(`deploy._record`, `_override_record`, `io.kafka_payload`) ships the
same bytes it would ship to a broker. The reference's own smoke test
needs a compose-up broker (reference compose.yaml, README.md:16-34);
this is the analog that runs in-process.

Scale note: this transport is for tests and local smoke runs. Offset
assignment reads the current per-topic max back to the driver (one
scalar) and uses a global row_number — a deliberate single-partition
step that a real broker performs natively; production uses the Kafka
transport where the broker assigns offsets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

KAFKA_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


class FakeBroker:
    """Append-only parquet 'broker': one directory per topic."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def create_topic(self, topic: str) -> None:
        """Empty schema-bearing seed so streams can subscribe before
        the first producer write (a broker auto-creates topics)."""
        d = self._dir(topic)
        if not os.path.exists(d):
            self.spark.createDataFrame([], KAFKA_WIRE_SCHEMA).write.parquet(d)

    def write(self, records: DataFrame, topic: str) -> None:
        """Producer: `records` needs key/value (string or binary;
        null value = tombstone) and optionally headers — the exact
        shape `io.kafka_payload` / `deploy._record` build for the
        real sink. Offsets continue from the topic's current max.

        Empty batches are dropped BEFORE touching the topic: a real
        producer with zero records sends nothing, but appending an
        empty parquet file here would register as new data to any
        file-stream consumer of the same topic — and a query that
        reads and writes one topic (the W1/W2 expiration timers on
        alarm-overrides) would then feed itself empty micro-batches
        forever under Trigger.AvailableNow. The isEmpty() probe runs
        the batch plan once more; batches here are micro-batch sized,
        and termination of the feedback cycle depends on it."""
        if records.isEmpty():
            return
        self.create_topic(topic)
        base = (
            self.spark.read.schema(KAFKA_WIRE_SCHEMA)
            .parquet(self._dir(topic))
            .agg(F.coalesce(F.max("offset") + 1, F.lit(0)))
            .collect()[0][0]
        )
        cols = [
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            F.lit(topic).alias("topic"),
            F.lit(0).alias("partition"),
            (
                F.lit(base)
                + F.row_number().over(
                    Window.orderBy(F.monotonically_increasing_id())
                )
                - 1
            ).alias("offset"),
            F.current_timestamp().alias("timestamp"),
            F.lit(0).alias("timestampType"),
            (
                F.col("headers")
                if "headers" in records.columns
                else F.lit(None).cast(KAFKA_WIRE_SCHEMA["headers"].dataType)
            ).alias("headers"),
        ]
        records.select(*cols).write.mode("append").parquet(self._dir(topic))

    def raw_batch(self, topic: str) -> DataFrame:
        """Consumer, bounded: the spark-sql-kafka batch-read analog."""
        self.create_topic(topic)
        return self.spark.read.schema(KAFKA_WIRE_SCHEMA).parquet(
            self._dir(topic)
        )

    def raw_stream(self, topic: str) -> DataFrame:
        """Consumer, unbounded: the spark-sql-kafka readStream analog."""
        self.create_topic(topic)
        return self.spark.readStream.schema(KAFKA_WIRE_SCHEMA).parquet(
            self._dir(topic)
        )

"""Sources & sinks (SURVEY.md §2.1, S1-S5).

The reference's whole I/O surface is keyed Kafka topics with Avro
values plus per-record headers. Spark-side, each maps to a reader or
writer builder here:

- S1 KTable source  -> `changelog_table` (batch) / streaming latest-
  per-key in `streaming.rules.latest_per_key_stream`
- S2 KStream source -> `kafka_stream` / `dir_stream` / file formats
- S3 topic sink     -> `kafka_sink` / parquet-directory append
- S4 Avro serde     -> `avro_decode` / `avro_encode` (spark-avro)
- S5 header inject  -> `with_headers`
"""

from .io import (
    avro_decode,
    avro_encode,
    changelog_table,
    kafka_batch,
    kafka_payload,
    kafka_sink,
    parse_kafka_records,
    read_table,
    with_headers,
    write_bucketed,
)

__all__ = [
    "avro_decode",
    "avro_encode",
    "changelog_table",
    "kafka_batch",
    "kafka_payload",
    "kafka_sink",
    "parse_kafka_records",
    "read_table",
    "with_headers",
    "write_bucketed",
]

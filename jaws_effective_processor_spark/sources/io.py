"""Source/sink builders (SURVEY.md §2.1).

Everything returns plain DataFrames/writers so Catalyst sees the whole
plan — format options (pushdown, pruning) stay declarative. Kafka and
Avro builders express the production path; they need the spark-sql-
kafka / spark-avro packages on the classpath at runtime, so they are
constructed lazily and import-gated where the container lacks the jar.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.compaction import compact_table, latest_per_key

# ------------------------------------------------------------ files


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    options: Mapping[str, str] | None = None,
) -> DataFrame:
    """Batch file source (parquet/csv/json/orc/text).

    Explicit schema skips inference (a full scan for csv/json) and
    keeps column pruning + predicate pushdown available to the
    parquet/orc scans — at 100 TB an unpruned scan IS the bottleneck.
    """
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load(path)


def changelog_table(
    log: DataFrame,
    keys: Sequence[str],
    tombstone_col: str,
    order_col: str = "seq",
) -> DataFrame:
    """S1 — KTable snapshot from an append-only changelog.

    Latest record per key wins; a tombstone (null payload / true
    flag) deletes the key (RegistrationRule.java:81-89 semantics,
    reference KTable compaction). One shuffle on the key."""
    return compact_table(log, keys, tombstone_col, order_col)


# ------------------------------------------------------------ kafka


def kafka_batch(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    value_schema: T.StructType,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S2 as a bounded read (replay): the reference's
    auto.offset.reset=earliest full-history replay
    (ProcessingRule.java:53) is a batch Kafka scan in Spark."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
        .load()
    )
    return parse_kafka_records(raw, value_schema)


def parse_kafka_records(raw: DataFrame, value_schema: T.StructType) -> DataFrame:
    """Wire -> rows: the pure-transform half of `kafka_batch`, split
    out so the (de)serialization round-trips under test without a
    broker — `raw` just needs the Kafka wire columns
    (key/value binary, offset, headers)."""
    return raw.select(
        F.col("key").cast("string").alias("name"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        F.col("offset").alias("seq"),
        F.col("headers"),
    ).select("name", "seq", "v.*", "headers")


def kafka_payload(df: DataFrame, key_col: str = "name") -> DataFrame:
    """Rows -> wire: key/value/headers exactly as the Kafka sink ships
    them. The `headers` column built by `with_headers` rides along —
    the reference attaches user/producer/host to every output record
    (ProcessingRule.java:74-86), so dropping it silently would strip
    the audit trail the downstream consumers key on."""
    aux = {"__tombstone", "headers"}
    value_cols = [c for c in df.columns if c != key_col and c not in aux]
    cols = [
        F.col(key_col).cast("string").alias("key"),
        F.when(
            F.col("__tombstone") if "__tombstone" in df.columns else F.lit(False),
            F.lit(None).cast("string"),
        )
        .otherwise(F.to_json(F.struct(*value_cols)))
        .alias("value"),
    ]
    if "headers" in df.columns:
        cols.append(F.col("headers"))
    return df.select(*cols)


def kafka_avro_payload(
    df: DataFrame,
    avsc_json: str,
    key_col: str = "name",
    schema_id: int = 1,
) -> DataFrame:
    """Rows -> wire with Confluent-framed AVRO values — the serde the
    reference actually ships (SpecificAvroSerde,
    RegistrationRule.java:72-79), as the drop-in alternative to the
    JSON `kafka_payload`. Tombstone rows keep a null value (Kafka
    compaction delete); headers ride along when present. Uses the
    spark-avro jar when available, else the pure-Python codec."""
    aux = {"__tombstone", "headers"}
    value_cols = [c for c in df.columns if c != key_col and c not in aux]
    frame = bytes([0]) + schema_id.to_bytes(4, "big")
    try:
        # jar path: to_avro emits the bare body — prepend the registry
        # frame JVM-side so both paths ship identical wire bytes. In
        # Spark 4 the python wrapper imports even without the jar and
        # only fails at ANALYSIS (AVRO_NOT_LOADED), so probe with an
        # eager select rather than relying on ImportError.
        body = F.concat(
            F.lit(frame), avro_encode(F.struct(*value_cols))
        )
        df.select(body)
    except Exception:
        body = avro_encode_py(
            F.struct(*value_cols), avsc_json, schema_id=schema_id
        )
    cols = [
        F.col(key_col).cast("string").alias("key"),
        F.when(
            F.col("__tombstone") if "__tombstone" in df.columns else F.lit(False),
            F.lit(None).cast("binary"),
        )
        .otherwise(body)
        .alias("value"),
    ]
    if "headers" in df.columns:
        cols.append(F.col("headers"))
    return df.select(*cols)


def kafka_sink(
    df: DataFrame,
    bootstrap: str,
    topic: str,
    key_col: str = "name",
):
    """S3 — keyed topic sink. Null `value` rows are tombstones, which
    Kafka compaction treats as deletes (the reference emits them at
    OneShotRule.java:98, ShelveExpirationRule.java:163-168). Headers
    are written when present (`includeHeaders` on the source side)."""
    return (
        kafka_payload(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("includeHeaders", "true")
    )


# ------------------------------------------------------------- avro


def avro_decode(col, avsc_json: str):
    """S4 — Avro value decode (SpecificAvroSerde analog). Requires the
    spark-avro package; import-gated for containers without the jar."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("spark-avro not on classpath") from exc
    return from_avro(col, avsc_json)


def avro_encode(col):
    """S4 — Avro value encode for the topic sink."""
    try:
        from pyspark.sql.avro.functions import to_avro
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError("spark-avro not on classpath") from exc
    return to_avro(col)


def avro_decode_py(col, avsc_json: str, spark_schema, confluent: bool = True):
    """S4 fallback — Avro value decode with NO spark-avro jar.

    The pure-Python codec (`sources/avro_codec.py`, Avro spec binary
    encoding + Confluent registry frame) decodes each value to JSON in
    an Arrow-batched pandas UDF, then ``from_json`` lifts it to a
    typed struct so every downstream expression runs JVM-side. On a
    cluster with spark-avro deployed prefer `avro_decode` (zero
    Python); this path keeps jar-less environments (like this
    container) runnable and tested.
    """
    import json as _json

    from . import avro_codec

    schema = avro_codec.parse_schema(avsc_json)

    @F.pandas_udf("string")
    def _dec(s: pd.Series) -> pd.Series:
        def one(b):
            if b is None:
                return None
            body = (
                avro_codec.strip_confluent_frame(bytes(b))[1]
                if confluent
                else bytes(b)
            )
            return _json.dumps(
                avro_codec.decode(schema, body),
                default=lambda x: x.decode("latin1"),
            )

        return s.map(one)

    return F.from_json(_dec(col), spark_schema)


def avro_encode_py(
    struct_col, avsc_json: str, schema_id: int = 1, confluent: bool = True
):
    """S4 fallback — Avro encode without the jar: the struct is
    serialized JVM-side by ``to_json`` (null handling, nesting), then
    a pandas UDF runs the binary writer per record."""
    import json as _json

    from . import avro_codec

    schema = avro_codec.parse_schema(avsc_json)

    @F.pandas_udf("binary")
    def _enc(s: pd.Series) -> pd.Series:
        def one(j):
            if j is None:
                return None
            body = avro_codec.encode(schema, _json.loads(j))
            return (
                avro_codec.confluent_frame(body, schema_id)
                if confluent
                else body
            )

        return s.map(one)

    return _enc(F.to_json(struct_col))


# ----------------------------------------------------------- headers


def with_headers(
    df: DataFrame,
    user: str | None = None,
    producer: str = "jaws-effective-processor-spark",
    host: str | None = None,
) -> DataFrame:
    """S5 — attach the reference's audit headers + wall-clock restamp.

    populateHeaders (ProcessingRule.java:74-86) puts user/producer/host
    on every output record and every processor re-stamps records with
    wall-clock time (P12, ProcessingRule.java:110-113). Kafka's sink
    consumes `headers` as array<struct<key,value:binary>> when
    includeHeaders is set.
    """
    import getpass
    import socket

    user = user if user is not None else getpass.getuser()
    host = host if host is not None else socket.gethostname()
    hdr = F.array(
        *[
            F.struct(
                F.lit(k).alias("key"), F.lit(v).cast("binary").alias("value")
            )
            for k, v in (("user", user), ("producer", producer), ("host", host))
        ]
    )
    return df.withColumn("headers", hdr).withColumn(
        "timestamp", F.current_timestamp()
    )


__all__ = [
    "read_table",
    "changelog_table",
    "kafka_batch",
    "parse_kafka_records",
    "kafka_payload",
    "kafka_sink",
    "avro_decode",
    "avro_encode",
    "with_headers",
    "write_bucketed",
    "latest_per_key",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
) -> None:
    """Persist a table bucketed + sorted on its join key.

    Co-locating both sides of a recurring equi-join (e.g. orders x
    lineitem on orderkey) lets Spark plan the join with ZERO
    exchanges — at 100 TB the dominant cost of a large-large join is
    the shuffle, so bucket layout is the single biggest lever for
    repeated pipelines (tests/test_bucketing.py proves the plan).
    """
    (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )


def write_corpus_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write a documents table as the training-ready sharded layout:
    parquet partitioned by (split, shard), rows sorted by doc_id
    within each file.

    The assignment columns come from `functions.corpus.assign_split`
    (pure hash of doc_id — growth-stable, reproducible). Two layout
    decisions matter at 100 TB:

    - `repartition("split", "shard")` BEFORE `partitionBy`: without
      it every upstream task holds rows of every (split, shard) and
      the dynamic-partition write emits tasks x partitions files —
      the classic small-files explosion. Hash-clustering first means
      each output directory is written by one task (a handful under
      AQE), so file count tracks partition count, not task count.
    - `maxRecordsPerFile` re-splits a hot shard into bounded files so
      a training loader gets uniform read units even when shard
      hashing is unlucky.

    Readers prune by directory: a training job reading split=train
    never lists val/test files, and a single shard is one directory.
    """
    from ..functions.corpus import assign_split

    (
        assign_split(df)
        .repartition("split", "shard")
        .sortWithinPartitions("split", "shard", "doc_id")
        .write.partitionBy("split", "shard")
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(path)
    )


def compact_corpus_shards(
    spark: "SparkSession",
    path: str,
    out_path: str,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Compact a landed sharded corpus (streaming ingest's
    per-microbatch files or any small-file accumulation) back into
    the canonical one-task-per-directory layout write_corpus_shards
    produces — the periodic maintenance job every file-sink stream
    needs (streaming/ingest.py's sink cannot re-cluster across
    triggers by construction).

    Reads the partitioned layout (split/shard come back as partition
    columns, so the scan prunes nothing and rewrites everything —
    run it per hot shard subtree in production), re-clusters with
    repartition(split, shard), restores within-file doc_id order,
    and rewrites with bounded file sizes. Output is byte-compatible
    with the batch writer's layout; compaction changes file geometry,
    never rows."""
    df = spark.read.parquet(path)
    (
        df.repartition("split", "shard")
        .sortWithinPartitions("split", "shard", "doc_id")
        .write.partitionBy("split", "shard")
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )


def write_clustered(
    df: "DataFrame",
    out_path: str,
    by: list,
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write a table CLUSTERED on `by`: range-repartition then sort
    within partitions on the same keys before writing parquet — the
    data-layout lever that makes parquet min/max row-group statistics
    tight, so a later filtered scan skips whole row groups / files
    instead of reading and discarding (at 100 TB the cheapest scan is
    the one that never happens; this is what table formats call
    clustering / Z-ORDER for the single-key case).

    repartitionByRange gives globally disjoint per-file key ranges
    (a plain hash repartition would interleave ranges across files
    and ruin file-level pruning); the within-partition sort tightens
    every row group inside each file. Rows are untouched — layout
    only. Tightness is pinned by
    tests/test_sources.py::test_write_clustered_tightens_rowgroup_stats
    which reads the parquet footers both ways."""
    cols = [F.col(c) for c in by]
    (
        df.repartitionByRange(*cols)
        .sortWithinPartitions(*cols)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )


ZORDER_BITS = 16  # per-dimension resolution of the interleaved key
# rank ("range-id") scaling default: 2^8 = 256 equi-depth buckets per
# dimension — the per-row rank fold is O(2^bits) comparisons, so rank
# mode trades key resolution for skew robustness (Delta's OPTIMIZE
# ZORDER uses ~1000 range ids for the same reason)
ZORDER_RANK_BITS = 8

_ZORDER_RESERVED = re.compile(r"_zkey$|_zmin\d+$|_zmax\d+$|_zrid\d+$")


def _check_zorder_names(df: "DataFrame") -> None:
    """Reject input frames already carrying the Z-order staging names
    (_zkey, _zmin*/_zmax* stats, _zrid* rank ids) UP FRONT — the same
    ambiguous-reference guard as with_pq_codes (ADVICE r10): without
    it the collision surfaces as a deep analysis error inside the
    write plan, or worse, scales a dimension against the wrong
    column."""
    clash = [c for c in df.columns if _ZORDER_RESERVED.match(c)]
    if clash:
        raise ValueError(
            f"write_zordered staging names collide with input "
            f"columns {clash}; rename them before writing"
        )


def zorder_key(scaled: list, bits: int = ZORDER_BITS) -> "Column":
    """The Morton (Z-order) key: interleave the bits of N columns
    already scaled to [0, 2^bits) ints — bit i of column c lands at
    position i * N + c, so locality in EVERY dimension maps to
    locality in the single sort key. Pure shift/and/add column
    arithmetic (N x bits terms inside whole-stage codegen), no UDF.

    The arity/bit-budget precondition raises ValueError (not assert,
    which python -O strips — an oversized dimension count would then
    silently overflow the 64-bit key and scramble the layout;
    ADVICE r10)."""
    n = len(scaled)
    if n < 1 or n * bits > 62:
        raise ValueError(
            f"zorder_key needs 1 <= n_dims and n_dims * bits <= 62, "
            f"got n_dims={n}, bits={bits}"
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for c_idx, c in enumerate(scaled):
            bit = F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * n + c_idx)).cast("long")
    return z


def write_zordered(
    df: "DataFrame",
    out_path: str,
    by: list,
    bits: int | None = None,
    max_records_per_file: int = 1_000_000,
    scaling: str = "linear",
) -> None:
    """Write a table Z-ORDERED on several numeric columns — the
    multi-dimensional generalization of write_clustered: single-key
    clustering makes row-group stats tight on ONE column and useless
    on the others; interleaving the dimensions' bits into one Morton
    key makes the stats usefully tight on EVERY `by` column at once,
    so a later scan filtered on ANY of them (or a box over several)
    skips row groups/files (what Delta/Iceberg ship as OPTIMIZE
    ZORDER BY).

    Two scaling modes map each dimension to [0, 2^bits) ints:

    - ``scaling="linear"`` (default, bits defaults to ZORDER_BITS):
      min/max scaling through a ONE-ROW broadcast stats frame (two
      aggregates per column, no shuffle of the data for the scaling;
      a constant column scales to 0). Cheapest, but a heavily skewed
      dimension collapses to few effective buckets — its bulk lands
      in one z-cell and loses intra-bulk pruning power.
    - ``scaling="rank"`` (bits defaults to ZORDER_RANK_BITS): the
      Delta-OPTIMIZE-ZORDER-style range-id form — per dimension, one
      `percentile_approx` aggregate yields 2^bits - 1 quantile
      boundaries (a bounded array in the same one-row broadcast
      frame; NO global sort, NO per-row window), and the rank id is
      a whole-stage-codegen fold counting boundaries <= value.
      Equal-mass buckets, so skewed dimensions keep full bucket
      resolution exactly where the rows are. Per-row cost is
      O(2^bits) comparisons per dimension — hence the smaller
      default resolution, which is still 256 equi-depth buckets per
      dimension, ample for row-group pruning.

    NULL handling (ADVICE r11, layout-only asymmetry): a NULL
    dimension value yields a NULL scaled id in linear mode (the
    min/max expression propagates it) but bucket 0 in rank mode (the
    `when(c >= b)` fold adds 0 for every boundary), so the two modes
    PLACE null rows differently — linear groups them wherever the
    null z-key range-partitions (first range), rank mixes them with
    the lowest bucket. Rows themselves are never altered either way;
    pick rank mode if null rows should co-locate with low values,
    or pre-fill nulls for explicit placement.

    Layout only in both modes: the synthetic key is dropped before
    the write and rows are untouched (pinned, with the per-dimension
    row-group-span contrast vs single-key clustering, by
    tests/test_sources.py::test_write_zordered_tightens_all_dims;
    the skewed-dimension rank-beats-linear pruning contrast by
    ::test_write_zordered_rank_scaling_beats_linear_on_skew)."""
    if scaling not in ("linear", "rank"):
        raise ValueError(
            f"write_zordered scaling must be 'linear' or 'rank', "
            f"got {scaling!r}"
        )
    if bits is None:
        bits = ZORDER_BITS if scaling == "linear" else ZORDER_RANK_BITS
    _check_zorder_names(df)
    num = [F.col(c).cast("double") for c in by]
    scaled = []
    if scaling == "linear":
        stats = df.agg(
            *[F.min(c).alias(f"_zmin{i}") for i, c in enumerate(num)],
            *[F.max(c).alias(f"_zmax{i}") for i, c in enumerate(num)],
        )
        top = (1 << bits) - 1
        staged = df.crossJoin(F.broadcast(stats))
        for i, c in enumerate(num):
            lo, hi = F.col(f"_zmin{i}"), F.col(f"_zmax{i}")
            scaled.append(
                F.when(
                    hi > lo,
                    F.floor((c - lo) * top / (hi - lo)).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
            )
    else:
        probs = F.array(
            *[F.lit(j / (1 << bits)) for j in range(1, 1 << bits)]
        )
        stats = df.agg(
            *[
                F.percentile_approx(c, probs, F.lit(10_000)).alias(
                    f"_zrid{i}"
                )
                for i, c in enumerate(num)
            ]
        )
        staged = df.crossJoin(F.broadcast(stats))
        for i, c in enumerate(num):
            scaled.append(
                F.aggregate(
                    F.col(f"_zrid{i}"),
                    F.lit(0).cast("long"),
                    lambda acc, b: acc
                    + F.when(c >= b, 1).otherwise(0).cast("long"),
                )
            )
    keyed = staged.withColumn("_zkey", zorder_key(scaled, bits))
    (
        keyed.repartitionByRange(F.col("_zkey"))
        .sortWithinPartitions("_zkey")
        .select(*df.columns)
        .write.option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )

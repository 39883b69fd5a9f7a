"""Source/sink builder tests (S1-S5). Kafka/Avro builders need jars a
test container lacks; their plan shape is exercised where possible and
the rest is import-gated."""

from __future__ import annotations

from pyspark.sql import types as T

from jaws_effective_processor_spark.sources import (
    changelog_table,
    read_table,
    with_headers,
)
from tests.conftest import SF_SMOKE


def test_read_table_schema_and_pruning(spark):
    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
        ]
    )
    df = read_table(spark, f"{SF_SMOKE}/orders.parquet", schema=schema)
    assert df.columns == ["o_orderkey", "o_custkey"]
    assert df.count() > 0


def test_changelog_table_compaction(spark):
    """S1: latest per key wins; null payload tombstones the key."""
    log = spark.createDataFrame(
        [
            (1, "a", "v1"),
            (2, "a", "v2"),   # supersedes v1
            (3, "b", "v1"),
            (4, "b", None),   # tombstone: b deleted
            (5, "c", "v1"),
        ],
        "seq long, name string, payload string",
    )
    snap = changelog_table(log, ["name"], tombstone_col="payload")
    got = {r["name"]: r["payload"] for r in snap.collect()}
    assert got == {"a": "v2", "c": "v1"}


def test_with_headers(spark):
    """S5: user/producer/host audit headers + wall-clock restamp on
    every record (ProcessingRule.java:74-86,110-113)."""
    df = spark.createDataFrame([("x", 1)], "name string, v long")
    out = with_headers(df, user="u1", producer="p1", host="h1")
    row = out.collect()[0]
    hdrs = {h["key"]: bytes(h["value"]).decode() for h in row["headers"]}
    assert hdrs == {"user": "u1", "producer": "p1", "host": "h1"}
    assert row["timestamp"] is not None


def test_csv_json_roundtrip(spark, tmp_path=None):
    """§2.9 file formats: the same relation read back identically from
    parquet, csv, and json via read_table with explicit schemas (no
    inference scan)."""
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from jaws_effective_processor_spark.tables import load_table

    d = tempfile.mkdtemp(prefix="jaws_fmt_")
    try:
        base = load_table(spark, SF_SMOKE, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        schema = T.StructType(
            [
                T.StructField("n_nationkey", T.LongType()),
                T.StructField("n_name", T.StringType()),
                T.StructField("n_regionkey", T.LongType()),
            ]
        )
        base.coalesce(1).write.option("header", True).csv(f"{d}/csv")
        base.coalesce(1).write.json(f"{d}/json")
        want = sorted(tuple(r) for r in base.collect())
        got_csv = sorted(
            tuple(r)
            for r in read_table(
                spark, f"{d}/csv", fmt="csv", schema=schema,
                options={"header": "true"},
            ).collect()
        )
        got_json = sorted(
            tuple(r)
            for r in read_table(spark, f"{d}/json", fmt="json", schema=schema).collect()
        )
        assert got_csv == want and got_json == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_kafka_wire_roundtrip_with_headers(spark):
    """S3+S5: rows -> kafka wire (key/value/headers) -> parsed rows,
    broker-free. Headers built by with_headers must survive the sink
    payload (ProcessingRule.java:74-86) and come back through the
    source parser; tombstones ship as null values."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources import (
        kafka_payload,
        parse_kafka_records,
    )

    df = spark.createDataFrame(
        [("a", 7, False), ("b", 8, True)],
        "name string, v long, __tombstone boolean",
    )
    wire = kafka_payload(
        with_headers(df, user="u1", producer="p1", host="h1")
    )
    assert set(wire.columns) == {"key", "value", "headers"}

    # fake the broker-assigned columns, binary-cast like real wire
    raw = wire.select(
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.monotonically_increasing_id().alias("offset"),
        "headers",
    )
    parsed = parse_kafka_records(
        raw, T.StructType([T.StructField("v", T.LongType())])
    )
    rows = {r["name"]: r for r in parsed.collect()}
    assert rows["a"]["v"] == 7
    assert rows["b"]["v"] is None  # tombstone: null value -> null fields
    hdrs = {h["key"]: bytes(h["value"]).decode() for h in rows["a"]["headers"]}
    assert hdrs == {"user": "u1", "producer": "p1", "host": "h1"}


def test_fake_broker_preserves_per_key_order(spark, tmp_path):
    """A real Kafka producer preserves per-key order (same key -> same
    partition, appended in send order). The fake broker's offset
    assignment must give the same guarantee for rows that arrive
    partitioned by key in key-local order — which is exactly how the
    stateful stages emit them (applyInPandasWithState sorts by seq
    within each key group). Consumer-side latest-per-key compaction
    by OFFSET then agrees with compaction by seq."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.fake_broker import FakeBroker

    rows = [(f"k{i % 7}", s) for i, s in enumerate(range(200))]
    df = (
        spark.createDataFrame(rows, "key string, seq long")
        .repartition(8, "key")
        .sortWithinPartitions("key", "seq")
    )
    broker = FakeBroker(spark, str(tmp_path / "broker"))
    broker.write(
        df.select("key", F.col("seq").cast("string").alias("value")),
        "t",
    )
    got = (
        broker.raw_batch("t")
        .select(
            F.col("key").cast("string").alias("k"),
            F.col("value").cast("string").cast("long").alias("seq"),
            "offset",
        )
        .collect()
    )
    assert len(got) == 200
    assert len({r["offset"] for r in got}) == 200  # offsets unique
    by_key: dict[str, list] = {}
    for r in sorted(got, key=lambda r: r["offset"]):
        by_key.setdefault(r["k"], []).append(r["seq"])
    for k, seqs in by_key.items():
        assert seqs == sorted(seqs), (k, seqs)


def test_write_corpus_shards_layout(spark, tmp_path):
    """Sharded corpus write: directory layout is split=*/shard=*, each
    shard directory holds a bounded file count (no task x partition
    small-files explosion), and read-back round-trips exactly with
    directory-pruned reads per split."""
    import glob

    from jaws_effective_processor_spark.sources.io import (
        write_corpus_shards,
    )
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "corpus")
    write_corpus_shards(docs, out)

    split_dirs = sorted(
        p.rsplit("=", 1)[-1] for p in glob.glob(f"{out}/split=*")
    )
    assert split_dirs == ["test", "train", "val"]
    # each (split, shard) dir written by one clustered task: a handful
    # of files per dir, not one per upstream task
    for d in glob.glob(f"{out}/split=*/shard=*"):
        n_files = len(glob.glob(f"{d}/*.parquet"))
        assert 1 <= n_files <= 4, (d, n_files)

    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # read-back of one split prunes to that split's directories only
    train = spark.read.parquet(out).filter("split = 'train'")
    n_train = train.count()
    assert 0 < n_train < docs.count()
    from jaws_effective_processor_spark.plans import explain_str

    import re

    plan = explain_str(train, "formatted")
    assert re.search(r"PartitionFilters: \[[^\]]*split[^\]]*= train", plan), (
        plan
    )


def test_compact_corpus_shards_preserves_rows_and_layout(spark, tmpdir):
    """Compaction rewrites a fragmented sharded corpus into the
    canonical layout: identical rows, same (split, shard) directory
    tree, and per-directory file counts collapse to the bounded
    write geometry."""
    import glob as _glob
    import os

    from jaws_effective_processor_spark.sources.io import (
        compact_corpus_shards,
        write_corpus_shards,
    )
    from jaws_effective_processor_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    frag = os.path.join(str(tmpdir), "frag")
    # fragment: many small files per directory (the streaming-sink
    # accumulation shape) — 8 tasks x dynamic partitions
    from jaws_effective_processor_spark.functions.corpus import assign_split

    (
        assign_split(docs)
        .repartition(8)
        .write.partitionBy("split", "shard")
        .mode("overwrite")
        .parquet(frag)
    )
    out = os.path.join(str(tmpdir), "compacted")
    compact_corpus_shards(spark, frag, out)

    a = spark.read.parquet(frag)
    b = spark.read.parquet(out)
    assert a.count() == b.count()
    assert sorted(a.columns) == sorted(b.columns)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # geometry: compaction must not INCREASE any directory's file count
    def files_per_dir(root):
        out_map = {}
        for p in _glob.glob(f"{root}/split=*/shard=*/*.parquet"):
            d = os.path.dirname(p).replace(root, "")
            out_map[d] = out_map.get(d, 0) + 1
        return out_map

    fa, fb = files_per_dir(frag), files_per_dir(out)
    assert set(fb) == set(fa)
    assert all(fb[d] <= fa[d] for d in fa)
    assert max(fb.values()) == 1  # one task per directory after compaction


def test_write_clustered_tightens_rowgroup_stats(spark, tmpdir):
    """Clustered layout must yield (1) identical rows, (2) globally
    DISJOINT per-file ts ranges (file-level pruning), and (3) a far
    smaller total row-group ts span than the unclustered write — read
    straight from the parquet footers, which is exactly what a
    pruning scan consults."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.io import write_clustered
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    events = load_table(spark, SF_ORACLE, "events")
    base = os.path.join(str(tmpdir), "ev_plain")
    clustered = os.path.join(str(tmpdir), "ev_clustered")
    # unclustered control: shuffle row order deterministically so the
    # source's natural ts order doesn't hand the control tight stats
    events.orderBy(F.md5(F.col("event_id").cast("string"))).repartition(
        4
    ).write.mode("overwrite").parquet(base)
    write_clustered(spark.read.parquet(base), clustered, ["ts"])

    a = spark.read.parquet(base)
    b = spark.read.parquet(clustered)
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def spans(path):
        per_file = []
        total = 0
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            fmin, fmax = None, None
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            ci = idx["ts"]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                total += (st.max - st.min).total_seconds()
                fmin = st.min if fmin is None else min(fmin, st.min)
                fmax = st.max if fmax is None else max(fmax, st.max)
            per_file.append((fmin, fmax))
        return per_file, total

    files_c, span_c = spans(clustered)
    files_p, span_p = spans(base)
    # (2) clustered files cover disjoint ranges
    files_c.sort()
    for (lo1, hi1), (lo2, hi2) in zip(files_c, files_c[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    # (3) control files overlap (each of the 4 spans ~everything, so
    # its total ~= 4x the data range); clustered row-group spans are
    # disjoint, so their total is AT MOST the data range — the
    # minimum any layout can achieve
    data_range = (
        max(hi for _, hi in files_c) - min(lo for lo, _ in files_c)
    ).total_seconds()
    assert span_c <= data_range * 1.01, (span_c, data_range)
    assert span_c * 3 < span_p, (span_c, span_p)


def test_write_zordered_tightens_all_dims(spark, tmpdir):
    """The Z-order layout makes row-group stats usefully tight on
    EVERY interleaved dimension at once, where single-key clustering
    helps only its own key: over a uniform 2-D grid, (1) rows are
    untouched, (2) the x-clustered control's per-row-group y spans
    cover ~the whole y range (no pruning power on y), (3) the
    z-ordered layout's total row-group span is a small fraction of
    (n_row_groups x data range) on BOTH x and y — read straight from
    the parquet footers, which is what a pruning scan consults."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.io import (
        write_clustered,
        write_zordered,
    )

    n = 1 << 14
    grid = spark.range(n).select(
        (F.col("id") % 128).alias("x"),
        # y decorrelated from x via a multiplicative permutation
        ((F.col("id") * 37 + 11) % 128).alias("y"),
        F.col("id").alias("payload"),
    )
    xdir = os.path.join(str(tmpdir), "zx")
    zdir = os.path.join(str(tmpdir), "zz")
    write_clustered(grid, xdir, ["x"], max_records_per_file=2048)
    write_zordered(grid, zdir, ["x", "y"], max_records_per_file=2048)

    a = spark.read.parquet(xdir)
    b = spark.read.parquet(zdir)
    assert a.count() == b.count() == n
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def dim_spans(path, col):
        spans, n_rg = 0.0, 0
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            ci = idx[col]
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                spans += st.max - st.min
                n_rg += 1
        return spans, n_rg

    data_range = 127.0
    # control: x-clustering leaves y unpruned — every row group spans
    # ~the full y range
    y_ctl, nrg_ctl = dim_spans(xdir, "y")
    assert y_ctl >= 0.9 * nrg_ctl * data_range, (y_ctl, nrg_ctl)
    # z-order: BOTH dims tight — total span well under half the
    # no-layout worst case on each
    for col in ("x", "y"):
        got, nrg = dim_spans(zdir, col)
        assert got <= 0.5 * nrg * data_range, (col, got, nrg)


def test_write_zordered_rank_scaling_beats_linear_on_skew(spark, tmpdir):
    """Rank ("range-id") scaling keeps bucket resolution on a skewed
    dimension where linear min/max collapses it (r10 verdict item 4,
    Delta's OPTIMIZE ZORDER approach): 97% of `s` values live in
    [0, 64) with a 1e6-scale outlier tail, so linear scaling maps the
    whole bulk to a handful of buckets — the layout degenerates to
    y-clustering and a narrow in-bulk probe must read ~every bulk row
    group. Equi-depth rank scaling spends its buckets where the mass
    is: the same probe touches a small fraction of the row groups.
    Rows are untouched in both modes."""
    import glob
    import os

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.io import write_zordered

    n = 1 << 14
    n_out = 512
    skewed = spark.range(n).select(
        F.when(F.col("id") < n - n_out, F.col("id") % 64)
        .otherwise(F.lit(1_000_000) + F.col("id"))
        .alias("s"),
        ((F.col("id") * 37 + 11) % 128).alias("y"),
        F.col("id").alias("payload"),
    )
    lin = os.path.join(str(tmpdir), "zlin")
    rnk = os.path.join(str(tmpdir), "zrnk")
    write_zordered(skewed, lin, ["s", "y"], max_records_per_file=1024)
    write_zordered(
        skewed, rnk, ["s", "y"], max_records_per_file=1024, scaling="rank"
    )

    a, b = spark.read.parquet(lin), spark.read.parquet(rnk)
    assert a.count() == b.count() == n
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    def rgs_hit(path, lo, hi):
        hit, total = 0, 0
        for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
            md = pq.ParquetFile(f).metadata
            idx = {
                md.schema.column(i).name: i for i in range(md.num_columns)
            }
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx["s"]).statistics
                total += 1
                if st.min <= hi and st.max >= lo:
                    hit += 1
        return hit, total

    # an in-bulk probe two values wide: s BETWEEN 20 AND 21
    lin_hit, lin_total = rgs_hit(lin, 20, 21)
    rnk_hit, rnk_total = rgs_hit(rnk, 20, 21)
    assert lin_total >= 8 and rnk_total >= 8
    # linear: the bulk collapses, nearly every row group must be read
    assert lin_hit >= 0.8 * lin_total, (lin_hit, lin_total)
    # rank: equi-depth buckets keep the probe to a small fraction
    assert rnk_hit * 2 <= lin_hit, (rnk_hit, lin_hit)


def test_zorder_preconditions_raise(spark, tmpdir):
    """The Z-order guards fail FAST with ValueError (ADVICE r10):
    (1) zorder_key's bit budget is a real exception, not an
    -O-strippable assert — 4 dims x 16 bits overflows the 64-bit key;
    (2) write_zordered rejects input frames already carrying its
    staging names (_zkey / _zmin* / _zmax* / _zrid*) up front instead
    of failing deep in the write plan or scaling against the wrong
    column."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.io import (
        write_zordered,
        zorder_key,
    )

    with _pytest.raises(ValueError, match="bits"):
        zorder_key([F.col("a"), F.col("b"), F.col("c"), F.col("d")], 16)
    with _pytest.raises(ValueError, match="n_dims"):
        zorder_key([], 16)

    out = os.path.join(str(tmpdir), "zclash")
    with _pytest.raises(ValueError, match="scaling"):
        write_zordered(
            spark.range(4).select(F.col("id").alias("x")),
            out,
            ["x"],
            scaling="bogus",
        )
    for bad in ("_zkey", "_zmin0", "_zmax1", "_zrid0"):
        df = spark.range(4).select(
            F.col("id").alias("x"), F.col("id").alias(bad)
        )
        with _pytest.raises(ValueError, match="collide"):
            write_zordered(df, out, ["x"])

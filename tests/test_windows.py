"""Event-time window + watermark tests: streamed append-mode windows
must be a finalized-exact subset of the batch windowed aggregation,
and late-beyond-watermark data must be dropped."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark.adapters import event_ms
from jaws_effective_processor_spark.streaming import rules
from jaws_effective_processor_spark.streaming.windows import (
    batch_windowed_counts,
    windowed_event_counts,
)
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="jaws_win_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streamed_windows_match_batch(spark, tmpdir):
    events = load_table(spark, SF_SMOKE, "events")
    log = events.select(
        "event_id", "event_type", event_ms(events).alias("ms")
    )
    src = os.path.join(tmpdir, "events")
    # two chronological chunks -> watermark advances across batches
    mid = log.approxQuantile("ms", [0.5], 0.0)[0]
    log.filter(F.col("ms") <= mid).coalesce(1).write.parquet(
        os.path.join(src, "c0")
    )
    log.filter(F.col("ms") > mid).coalesce(1).write.parquet(
        os.path.join(src, "c1")
    )

    stream = rules.dir_stream(
        spark, f"{src}/*", "event_id long, event_type string, ms long",
        max_files=1,
    )
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["win_start_ms"], r["event_type"]): r["n"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        (r["win_start_ms"], r["event_type"]): r["n"]
        for r in batch_windowed_counts(log).collect()
    }
    # append mode emits only watermark-finalized windows: a strict
    # subset of the batch result, exact where emitted
    assert streamed, "no finalized windows emitted"
    assert set(streamed) < set(batch)
    for k, n in streamed.items():
        assert batch[k] == n, k
    # everything except the watermark tail must have been finalized
    max_ms = log.agg(F.max("ms")).collect()[0][0]
    horizon = max_ms - 30 * 60_000  # the watermark delay
    late_tail = {k for k in batch if k[0] + 3_600_000 > horizon}
    assert set(batch) - set(streamed) <= late_tail


def test_streamed_sessions_match_batch(spark, tmpdir):
    from jaws_effective_processor_spark.streaming.windows import (
        batch_session_counts,
        session_windowed_counts,
    )

    events = load_table(spark, SF_SMOKE, "events")
    log = events.select("event_id", "user_id", event_ms(events).alias("ms"))
    src = os.path.join(tmpdir, "events")
    log.coalesce(1).write.parquet(src)

    stream = rules.dir_stream(
        spark, src, "event_id long, user_id long, ms long"
    )
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        session_windowed_counts(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["user_id"], r["start_ms"], r["end_ms"]): r["n_events"]
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        (r["user_id"], r["start_ms"], r["end_ms"]): r["n_events"]
        for r in batch_session_counts(log).collect()
    }
    assert streamed, "no finalized sessions emitted"
    assert set(streamed) <= set(batch)
    for k, n in streamed.items():
        assert batch[k] == n, k


def test_streaming_exact_dedup(spark, tmpdir):
    """Streaming exact dedup: dropDuplicates on the key over a stream
    whose input files contain full duplicates must emit exactly the
    batch distinct set (state keyed by event_id; with event-time
    watermarks this is dropDuplicatesWithinWatermark at scale)."""
    events = load_table(spark, SF_SMOKE, "events")
    log = events.select("event_id", "event_type").limit(500)
    src = os.path.join(tmpdir, "dup")
    # same rows written twice -> two micro-batches of pure duplicates
    log.coalesce(1).write.parquet(os.path.join(src, "c0"))
    log.coalesce(1).write.parquet(os.path.join(src, "c1"))

    stream = rules.dir_stream(
        spark, f"{src}/*", "event_id long, event_type string", max_files=1
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream.dropDuplicates(["event_id"])
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = sorted(
        tuple(r) for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    batch = sorted(tuple(r) for r in log.dropDuplicates(["event_id"]).collect())
    assert streamed == batch and streamed


def test_streamed_dedup_matches_batch(spark, tmpdir):
    """Streaming exact dedup (dropDuplicatesWithinWatermark) over a log
    with injected duplicates equals batch first-sighting dedup: one
    surviving row per event_id, duplicates arriving in a later
    micro-batch (within the watermark) suppressed."""
    from jaws_effective_processor_spark.streaming.windows import (
        batch_first_sighting,
        deduped_stream,
    )

    events = load_table(spark, SF_SMOKE, "events")
    log = events.select("event_id", "event_type", event_ms(events).alias("ms"))
    # duplicate a slice of the log with a small (in-watermark) delay
    dupes = log.filter(F.col("event_id") % 10 == 0).withColumn(
        "ms", F.col("ms") + 1000
    )
    src = os.path.join(tmpdir, "events")
    log.coalesce(1).write.parquet(os.path.join(src, "c0"))
    dupes.coalesce(1).write.parquet(os.path.join(src, "c1"))

    stream = rules.dir_stream(
        spark, f"{src}/*", "event_id long, event_type string, ms long",
        max_files=1,
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped_stream(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["event_id"]
        for r in spark.sql(f"SELECT event_id FROM {name}").collect()
    }
    n_streamed = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0]["n"]
    want_ids = {
        r["event_id"]
        for r in batch_first_sighting(
            log.unionByName(dupes)
        ).select("event_id").collect()
    }
    assert got == want_ids          # every key survives exactly...
    assert n_streamed == len(want_ids)  # ...once: duplicates suppressed

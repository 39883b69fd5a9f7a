"""Stream-stream interval join: streamed matches == batch matches on
chronological input (no data later than the watermark)."""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark.adapters import event_ms
from jaws_effective_processor_spark.streaming import rules
from jaws_effective_processor_spark.streaming.joins import (
    batch_interval_join,
    interval_join_stream,
)
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="jaws_ssj_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _write_chunks(log, path):
    mid = log.approxQuantile("ms", [0.5], 0.0)[0]
    log.filter(F.col("ms") <= mid).coalesce(1).write.parquet(f"{path}/c0")
    log.filter(F.col("ms") > mid).coalesce(1).write.parquet(f"{path}/c1")


def test_stream_stream_interval_join_matches_batch(spark, tmpdir):
    events = load_table(spark, SF_SMOKE, "events")
    acts = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("act_id"), "user_id", event_ms(events).alias("ms")
    )
    purch = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purch_id"), "user_id", event_ms(events).alias("ms")
    )
    _write_chunks(acts, os.path.join(tmpdir, "acts"))
    _write_chunks(purch, os.path.join(tmpdir, "purch"))

    a_stream = rules.dir_stream(
        spark, f"{tmpdir}/acts/*", "act_id long, user_id long, ms long",
        max_files=1,
    )
    p_stream = rules.dir_stream(
        spark, f"{tmpdir}/purch/*", "purch_id long, user_id long, ms long",
        max_files=1,
    )
    joined = interval_join_stream(a_stream, p_stream).select(
        "act_id", "purch_id"
    )
    name = f"ssj_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["act_id"], r["purch_id"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    batch = {
        (r["act_id"], r["purch_id"])
        for r in batch_interval_join(acts, purch)
        .select("act_id", "purch_id")
        .collect()
    }
    assert batch, "expected interval matches at sf0.001"
    assert streamed == batch

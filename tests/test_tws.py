"""transformWithState processor tests — same scenarios as the
applyInPandasWithState versions, proving the two streaming state APIs
implement identical semantics (T1 vs batch lag(); W1 timer firing)."""

from __future__ import annotations

import os
import shutil
import tempfile
import time
import uuid

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark import adapters
from jaws_effective_processor_spark.operators.transitions import with_transitions
from jaws_effective_processor_spark.streaming import rules, tws
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


# Install impossibility re-verified round 8 (2026-08-15): `pip download
# protobuf` still fails identically (DNS NewConnectionError on the only
# configured index).
# Re-verified round 7 (2026-08-14): `pip install
# protobuf` still fails identically (DNS NewConnectionError on the only
# configured index, "No matching distribution found").
# Originally verified round 6 (2026-08-14): `pip install
# protobuf` fails — the container's only configured package index is
# unreachable (DNS NewConnectionError
# on every retry), `pip download` likewise, and a filesystem sweep finds only
# typeshed STUBS of google.protobuf (jedi third_party) plus pyspark's
# generated pb2 modules, no runtime package to vendor. The
# applyInPandasWithState twins in streaming/processors.py carry the tested
# semantics for T1/W1/W2 until an environment with protobuf exists.
pytestmark = pytest.mark.skipif(
    not tws.tws_available(),
    reason="transformWithState driver worker needs google.protobuf, "
    "not installed in this container",
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="jaws_tws_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_transitions_tws_equals_batch(spark, tmpdir):
    """T1 via transformWithState == the oracle-checked batch lag()."""
    events = load_table(spark, SF_SMOKE, "events")
    log = adapters.activations_log(events)
    src = os.path.join(tmpdir, "activations")
    log.coalesce(1).write.parquet(src)

    stream = rules.dir_stream(spark, src, rules.ACTIVATION_LOG_SCHEMA)
    name = f"tws_{uuid.uuid4().hex[:8]}"
    q = (
        tws.transitions_tws(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        tuple(r)
        for r in spark.sql(f"SELECT * FROM {name}")
        .select(
            "name", "seq", "active", "transition_to_active", "transition_to_normal"
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in with_transitions(log)
        .select(
            "name", "seq", "active", "transition_to_active", "transition_to_normal"
        )
        .collect()
    }
    assert got == want and got


def test_expiration_tws_timer(spark, tmpdir):
    """W1 via real transformWithState timers: past-due shelve fires a
    tombstone, future shelve stays silent, tombstone-in disarms."""
    src = os.path.join(tmpdir, "overrides")
    now_ms = int(time.time() * 1000)
    rows = [
        (1, "alarm1", "Shelved", False, now_ms - 5000),
        (2, "alarm2", "Shelved", False, now_ms + 3600_000),
        (3, "alarm3", "Shelved", True, None),
    ]
    spark.createDataFrame(rows, schema=rules.OVERRIDE_LOG_SCHEMA).coalesce(
        1
    ).write.parquet(src)

    stream = rules.dir_stream(spark, src, rules.OVERRIDE_LOG_SCHEMA)
    name = f"twsexp_{uuid.uuid4().hex[:8]}"
    q = (
        tws.expiration_tws(stream, "Shelved")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 45
        fired = []
        while time.time() < deadline:
            fired = spark.sql(f"SELECT * FROM {name}").collect()
            if fired:
                break
            time.sleep(1)
    finally:
        q.stop()

    assert [(r["name"], r["tombstone"]) for r in fired] == [("alarm1", True)]

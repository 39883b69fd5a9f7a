"""Named null-side scenarios from the reference's rule tests that the
well-formed driver fixtures don't isolate: the KTable joins must fire
with EITHER side absent, and tombstones must retract.

Each test cites the reference case it pins; the engine behaviors
asserted here are the same ones the DuckDB oracles check statistically
over the synthetic corpus — this file makes the per-scenario claim
explicit and greppable.
"""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark import adapters
from jaws_effective_processor_spark.operators.registration import (
    effective_registrations,
)

EVENTS_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
T0 = datetime.datetime(2024, 1, 1, 12, 0, 0)


@pytest.fixture(scope="module")
def null_side_dir(spark, tmp_path_factory):
    """events table with: alarm_1 = override-only (Latched purchase,
    no signup/activation); alarm_2 = activation then activation
    tombstone, never registered."""
    d = tmp_path_factory.mktemp("scenario_events")
    rows = [
        # type_idx = (uid*3 + floor(v)) % 21 = (3+20) % 21 = 2 -> Latched;
        # floor(v*10) % 10 = 5 -> not a tombstone
        (1, T0, 1, "purchase", 20.5, ""),
        (2, T0, 2, "error", 0.0, ""),   # Activation
        (3, T0, 2, "click", 0.0, ""),   # null union_type = tombstone
    ]
    spark.createDataFrame(rows, EVENTS_DDL).coalesce(1).write.parquet(
        os.path.join(str(d), "events.parquet")
    )
    return str(d)


def test_no_registration_or_active_but_override(spark, null_side_dir):
    """ActivationRuleTest.java:116 noRegistrationOrActiveButOverride:
    an override arriving for an alarm with NO registration and NO
    activation still produces a monolog record (the full-outer join
    fires on the override side alone)."""
    from jaws_effective_processor_spark.pipeline import alarm_monolog

    rows = {
        r["name"]: r for r in alarm_monolog(spark, null_side_dir).collect()
    }
    assert "alarm_1" in rows
    r = rows["alarm_1"]
    assert r["registered"] is False
    assert r["ov_latched"] is True


def test_unset_active_with_no_registration(spark, null_side_dir):
    """ActivationRuleTest.java:136 unsetActiveWithNoRegistration: an
    activation tombstone for a never-registered alarm still emits —
    the per-event history carries one record per event, and the final
    record (after the tombstone) is non-null with the alarm back to
    Normal. A latched override-only alarm stays effectively active
    (the point of latching) — ActiveLatched on the same replay."""
    from jaws_effective_processor_spark.pipeline import (
        effective_state_history,
    )

    hist = sorted(
        tuple(r)
        for r in effective_state_history(spark, null_side_dir).collect()
    )
    assert hist == [
        (1, "alarm_1", False, "ActiveLatched"),
        (2, "alarm_2", True, "Active"),
        (3, "alarm_2", False, "Normal"),
    ]


def _instances(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, name string, action string"
    )


def test_registration_with_no_class(spark):
    """RegistrationRuleTest.java:120 noClass: an instance whose action
    matches no class still yields an effective registration (left
    join — class-sourced fields null), keyed by the alarm name."""
    inst = _instances(spark, [(1, "alarm1", "no_such_class")])
    out = effective_registrations(
        inst, adapters.actions_dim(spark)
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["name"] == "alarm1"
    assert r["action"] == "no_such_class"
    assert r["latchable"] is None and r["priority"] is None


def test_registration_tombstone_retracts(spark):
    """RegistrationRuleTest.java:137 tomestoneRegistration: a null
    instance value deletes the registration — the compacted KTable no
    longer carries the key (the topic-level tombstone emission is the
    streaming half, pinned by the topic-sink tests)."""
    inst = _instances(
        spark, [(1, "alarm1", "class_0"), (2, "alarm1", None)]
    )
    out = effective_registrations(inst, adapters.actions_dim(spark))
    assert out.filter(F.col("name") == "alarm1").count() == 0

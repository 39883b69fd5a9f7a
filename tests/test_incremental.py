"""Incremental snapshot maintenance: delta-restricted recompute ==
full recompute, at EVERY delta width.

The driver's oracle gate already proves equality at the default
median split (operators/incremental.py module doc); these tests pin
the two regimes that split hides:

- NARROW delta (split near max): touched is a handful of keys, the
  anti-join carries almost the whole base forward — the realistic
  "one day of new events" shape.
- WIDE delta (split near zero): touched is ~every key, which is the
  regime where a forced broadcast of the touched set would break at
  scale (VERDICT r3 §wrong (a)); since 92a0540 the join strategy is
  AQE's choice, and the result must still equal the full recompute.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from jaws_effective_processor_spark.operators import incremental as inc
from jaws_effective_processor_spark.pipeline import (
    OUTPUT_COLS,
    effective_alarms_from_events,
)
from jaws_effective_processor_spark.tables import load_table


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(*OUTPUT_COLS).collect()
    )


@pytest.fixture()
def full_snapshot(spark):
    events = load_table(spark, SF_SMOKE, "events")
    return _rows(effective_alarms_from_events(spark, events))


def _split_at(percent: int):
    def split(events):
        return events.agg(
            F.expr(f"cast(max(event_id) * {percent} / 100 as long)").alias(
                "split_seq"
            )
        )

    return split


@pytest.mark.parametrize("percent", [5, 95])
def test_incremental_equals_full_at_any_delta_width(
    spark, full_snapshot, monkeypatch, percent
):
    # the base snapshot is session-cached per sf_dir; a patched split
    # must not leak a foreign base into other tests (or vice versa)
    inc._BASE_SNAPSHOT_CACHE.clear()
    monkeypatch.setattr(inc, "snapshot_split_seq", _split_at(percent))
    try:
        got = _rows(inc.incremental_effective_alarms(spark, SF_SMOKE))
    finally:
        inc._BASE_SNAPSHOT_CACHE.clear()
    assert got == full_snapshot

"""asof_join operator semantics: inclusive match, latest-wins,
unmatched-left nulls, key isolation."""

from __future__ import annotations

from jaws_effective_processor_spark.operators.asof import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            ("k1", 5, "l1"),   # matches r@3
            ("k1", 7, "l2"),   # matches r@7 (inclusive equal ts)
            ("k1", 9, "l3"),   # matches r@7 (latest <= 9)
            ("k2", 4, "l4"),   # no right row <= 4 -> null
            ("k3", 1, "l5"),   # key with no right rows at all -> null
        ],
        "k string, ts long, lbl string",
    )
    right = spark.createDataFrame(
        [
            ("k1", 3, 100),
            ("k1", 7, 200),
            ("k2", 8, 300),
        ],
        "k string, ts long, v int",
    )
    got = {
        r["lbl"]: r["v"]
        for r in asof_join(left, right, key="k", ts="ts", payload_cols=["v"]).collect()
    }
    assert got == {"l1": 100, "l2": 200, "l3": 200, "l4": None, "l5": None}


def test_asof_null_payload_carried(spark):
    """A matched right row whose payload is NULL must be returned as
    NULL — not silently replaced by an older non-null right row
    (DuckDB ASOF returns the matched row's NULL)."""
    from jaws_effective_processor_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 10), ("k", 30)], "key string, ts long"
    )
    right = spark.createDataFrame(
        [("k", 5, 100), ("k", 20, None)], "key string, ts long, v int"
    )
    got = {
        r["ts"]: r["v"]
        for r in asof_join(left, right, "key", "ts", ["v"]).collect()
    }
    assert got == {10: 100, 30: None}

"""range_join operator semantics: banded matching is exactly the
BETWEEN predicate — boundary-inclusive, cross-bucket, key-scoped."""

from __future__ import annotations

from jaws_effective_processor_spark.operators.range_join import range_join


def test_range_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100), (2, 250), (3, 999)], "lid long, ms long"
    )
    right = spark.createDataFrame(
        # 90: within 10 of 100 (boundary-inclusive, adjacent bucket)
        # 110: within 10 of 100; 260: within 10 of 250
        # 500: matches nothing
        [(10, 90), (11, 110), (12, 260), (13, 500)],
        "rid long, ms long",
    )
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, point="ms", radius=10).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 12)}


def test_range_join_with_keys(spark):
    left = spark.createDataFrame([("a", 1, 100), ("b", 2, 100)], "k string, lid long, ms long")
    right = spark.createDataFrame([("a", 10, 105)], "k string, rid long, ms long")
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, point="ms", radius=10, keys=["k"]).collect()
    }
    assert got == {(1, 10)}  # key 'b' never matches key 'a' rows

"""salted_join must be result-identical to the plain equi-join on a
deliberately skewed key distribution (one hot key holding ~90% of
rows), for inner and left flavors."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaws_effective_processor_spark.operators.skew import salted_join


def _fixtures(spark):
    left = spark.range(0, 2000).select(
        F.col("id"),
        # 90% of rows share the hot key
        F.when(F.col("id") % 10 < 9, "hot").otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string"))
        ).alias("k"),
    )
    right = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k3", 3), ("nomatch", 4)],
        "k string, payload int",
    )
    return left, right


def test_salted_inner_join_matches_plain(spark):
    left, right = _fixtures(spark)
    plain = sorted(
        tuple(r) for r in left.join(right, "k", "inner")
        .select("id", "k", "payload").collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(left, right, "k", salt=8)
        .select("id", "k", "payload").collect()
    )
    assert salted == plain and plain


def test_salted_left_join_matches_plain(spark):
    left, right = _fixtures(spark)
    plain = sorted(
        tuple(r) for r in left.join(right, "k", "left")
        .select("id", "k", "payload").collect()
    )
    salted = sorted(
        tuple(r) for r in salted_join(left, right, "k", salt=8, how="left")
        .select("id", "k", "payload").collect()
    )
    assert salted == plain and plain

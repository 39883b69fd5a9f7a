"""S1 — KTable semantics in batch: latest value per key.

The reference reads compacted topics as KTables (latest value per
key; null value = delete) — RegistrationRule.java:81-89 and siblings.
Batch analog: `row_number() OVER (PARTITION BY key ORDER BY seq DESC)
= 1`, then tombstone rows are dropped by the caller when the KTable
is consumed (tombstones still propagate to downstream logs, matching
RegistrationRuleTest.java:137-155).

Scale: this is a single hash-shuffle on the key columns. At 100 TB the
winning physical plan is a partial top-1 per key — Catalyst rewrites
rank<=1 window filters into per-partition TakeOrderedAndProject-style
pushdown (WindowGroupLimit) before the shuffle, so the shuffle carries
at most one row per (key, input-partition) rather than the full log.
Verify with .explain(): look for `WindowGroupLimit`.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str = "seq"
) -> DataFrame:
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def compact_table(
    df: DataFrame,
    keys: Sequence[str],
    tombstone_col: str,
    order_col: str = "seq",
) -> DataFrame:
    """Latest-per-key then drop deleted keys (KTable materialization).

    `tombstone_col` is either a boolean column or a nullable payload
    column whose NULL means delete (SURVEY.md §1.3 null/tombstone
    semantics).
    """
    latest = latest_per_key(df, keys, order_col)
    col = latest.schema[tombstone_col]
    if str(col.dataType) == "BooleanType()":
        return latest.filter(~F.col(tombstone_col))
    return latest.filter(F.col(tombstone_col).isNotNull())

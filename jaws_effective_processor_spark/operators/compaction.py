"""S1 — KTable semantics in batch: latest value per key.

The reference reads compacted topics as KTables (latest value per
key; null value = delete) — RegistrationRule.java:81-89 and siblings.
Batch analog: `row_number() OVER (PARTITION BY key ORDER BY seq DESC)
= 1`, then tombstone rows are dropped by the caller when the KTable
is consumed (tombstones still propagate to downstream logs, matching
RegistrationRuleTest.java:137-155).

Scale: this is a single hash-shuffle on the key columns, expressed as
`groupBy(keys).agg(max_by(struct(payload), seq))` — a true partial
aggregation: each map task pre-combines to one row per key before the
exchange, and the reduce side is a hash-agg with no sort. (The
window-function form gets similar map-side pruning from Spark's
WindowGroupLimit rewrite but still sorts within groups post-shuffle;
measured ~25% slower at sf0.1.) `order_col` must be unique per key —
true for the event logs (globally unique seq), same tie discipline
Kafka offsets give the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame, keys: Sequence[str], order_col: str = "seq"
) -> DataFrame:
    payload = [c for c in df.columns if c not in keys]
    agg = df.groupBy(*keys).agg(
        F.max_by(F.struct(*payload), F.col(order_col)).alias("__latest")
    )
    # original column order, keys in place
    return agg.select(
        *[
            F.col(c) if c in keys else F.col(f"__latest.{c}").alias(c)
            for c in df.columns
        ]
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

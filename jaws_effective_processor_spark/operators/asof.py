"""As-of join — an operator the reference (and core Spark SQL) lacks,
built as a composition of existing DataFrame ops (SURVEY.md §2.9 /
custom-operator guidance: composition before UDFs).

Semantics: for every left row, attach the payload of the latest right
row with the same key and `right.ts <= left.ts` (LEFT OUTER flavor —
unmatched left rows keep nulls). The classic time-series "most recent
quote for each trade".

Implementation: tag + union + `last(ignorenulls) OVER (PARTITION BY
key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING)` + filter to left
rows. Right rows sort before left rows at equal ts, making the match
inclusive.

Scale: ONE shuffle on the join key for the window — no range
explosion, no per-key loop, no skew beyond the key distribution
itself (vs. the naive `left.join(right, key).filter(r.ts <= l.ts)`
+ argmax, which materializes every (left, right) key pair first).
DuckDB's native ASOF JOIN is the oracle twin.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_tag"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """left ⟕asof right on (key, right.ts <= left.ts), latest right wins.

    `right` must be unique per (key, ts) — pre-aggregate if not, or
    which duplicate wins is unspecified (DuckDB ASOF has the same
    caveat).
    """
    left_cols = [c for c in left.columns]
    # payloads ride in a per-right-row STRUCT: the struct is non-null
    # for every right row even when its fields are null, so
    # last(ignorenulls) can't skip past a matched row whose payload
    # value is legitimately NULL (it would otherwise fall back to an
    # older right row, diverging from DuckDB ASOF)
    merged = left.withColumn(_TAG, F.lit(1)).unionByName(
        right.select(
            key, ts, F.struct(*payload_cols).alias(_PAYLOAD)
        ).withColumn(_TAG, F.lit(0)),
        allowMissingColumns=True,
    )
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col(_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_PAYLOAD, ignorenulls=True).over(w)
    return (
        merged.withColumn(_PAYLOAD, carried)
        .filter(F.col(_TAG) == 1)
        .select(
            *left_cols,
            *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in payload_cols],
        )
    )

"""Range (interval) join — banded equi-join instead of a theta join.

Matches every left row to right rows whose `point` lies within
[left.point - radius, left.point + radius]. A naive theta join is a
cartesian product with a post-filter — quadratic and unshuffleable.
The banded form buckets both sides by `floor(point / radius)`; a
match within ±radius can only live in the left row's own bucket or
the two adjacent ones, so the right side explodes into its 3
neighbor buckets and the join becomes a plain equi-join on
(extra keys..., bucket) with the exact BETWEEN applied post-join.

Scale: one shuffle on the bucket key; work is proportional to true
candidate density, not |L|x|R|. Same family as the length-banded
n-gram dedup join (functions/dedup.py).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKET = "__range_bucket"


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    radius: int,
    keys: Sequence[str] = (),
) -> DataFrame:
    """left ⋈ right (inner) on |left.point - right.point| <= radius
    (+ equi keys).

    Columns of both sides are kept; right's `point` and key columns
    come back suffixed `_r`. `radius` must be a positive integer in
    the units of `point`. Inner-only: an outer flavor through the
    banded explode would duplicate unmatched rows.
    """
    lb: Column = F.floor(F.col(point) / F.lit(radius))
    l = left.withColumn(_BUCKET, lb)
    r_base = right.select(
        *[F.col(k).alias(f"{k}_r") for k in keys],
        F.col(point).alias(f"{point}_r"),
        *[
            F.col(c)
            for c in right.columns
            if c not in keys and c != point
        ],
    )
    # each true match lands in exactly one of the 3 neighbor buckets
    r = r_base.withColumn(
        _BUCKET,
        F.explode(
            F.array(
                *[
                    F.floor(F.col(f"{point}_r") / F.lit(radius)) + F.lit(d)
                    for d in (-1, 0, 1)
                ]
            )
        ),
    )
    cond = [l[_BUCKET] == r[_BUCKET]] + [
        l[k] == r[f"{k}_r"] for k in keys
    ]
    joined = l.join(r, cond, "inner").filter(
        F.abs(F.col(point) - F.col(f"{point}_r")) <= F.lit(radius)
    )
    return joined.drop(_BUCKET)

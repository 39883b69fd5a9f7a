"""Skew-aware equi-join via key salting.

A shuffle join hash-partitions on the key: one hot key (a celebrity
alarm, an empty-string language, a default user id) lands every
matching row in ONE task and the stage runs at straggler speed. AQE's
skew-join splits oversized partitions after the fact; salting fixes
the layout up front and also works where AQE can't (e.g. inside
aggregations feeding the join, or on deliberately low-cardinality
keys).

Shape: the probe side gets a deterministic salt in [0, salt) hashed
from its whole row; the build side replicates each row into every
salt bucket. The join key becomes (key, salt) — the hot key now
spreads over `salt` tasks at the cost of a `salt`x blow-up of the
(small) build side. Same family as AQE skew handling, but explicit
and plan-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"
_RKEY = "__rkey"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """left ⋈ right on `key`, with the left (probe/skewed) side salted.

    Semantically identical to `left.join(right, key, how)` for inner
    and left joins; `right` is replicated `salt` times, so keep it the
    smaller side.
    """
    l = left.withColumn(
        _SALT,
        F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt)),
    )
    r = right.withColumnRenamed(key, _RKEY).withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = l.join(
        r,
        (l[key] == r[_RKEY]) & (l[_SALT] == r[_SALT]),
        how,
    )
    return joined.drop(_RKEY, _SALT)

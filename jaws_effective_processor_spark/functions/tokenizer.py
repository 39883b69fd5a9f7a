"""Tokenizer-training statistics over `documents` — the corpus-wide
counting passes BPE/WordPiece vocabulary learning iterates on. The
inner loop of BPE training is exactly "count all adjacent symbol
pairs, pick the most frequent, merge" (Sennrich et al. 2016); the
counting step is the distributed part — at 100 TB it is one explode
+ one aggregation with map-side partials, and each training round
re-runs it, so its shape IS the training cost.

Whitespace tokens play the symbol alphabet here (the container has
no tokenizer libs); the pair-statistics shape is identical for
character- or byte-level symbols.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table, spread_if_undersplit

BPE_TOP_PAIRS = 30


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top adjacent-token-pair frequencies — one BPE counting round.

    Pairs are built per row with an index transform over the token
    array (no self-join), exploded, and counted in a single partial
    aggregation; the head is taken with orderBy+limit (TakeOrdered:
    per-partition heads, k-row driver merge — never a global sort),
    then ranked with a window over just the k survivors.
    """
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    tk = F.split(F.col("text"), " ")
    # one-token docs have no pairs — and F.sequence(1, 0) would DESCEND
    # (Spark generates step -1 when stop < start), walking off the array
    pairs = docs.filter(F.size(tk) >= 2).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.struct(
                    F.element_at(tk, i).alias("left"),
                    F.element_at(tk, i + 1).alias("right"),
                ),
            )
        ).alias("p")
    ).select("p.left", "p.right")
    counts = pairs.groupBy("left", "right").agg(
        F.count("*").alias("n_pairs")
    )
    top = counts.orderBy(
        F.col("n_pairs").desc(), F.col("left"), F.col("right")
    ).limit(BPE_TOP_PAIRS)
    w = Window.orderBy(F.col("n_pairs").desc(), F.col("left"), F.col("right"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "left",
        "right",
        "n_pairs",
    )

"""Approximate string self-join (edit distance <= 1) via deletion-
neighborhood blocking — the fuzzy-matching counterpart of the
MinHash/SimHash banding families in functions/dedup.py, for the
entity-resolution passes (near-identical names, typo'd identifiers)
a curation pipeline runs on metadata columns.

Blocking theorem (FastSS / SymSpell family): lev(a, b) <= 1 implies
D(a) ∩ D(b) != Ø, where D(s) = {s} ∪ {s with one char deleted}.
(Substitution at i: both delete i to the same string; insertion:
deleting the inserted char from the longer side yields the shorter.)
The converse only bounds lev <= 2, so the shared-variant equi-join is
CANDIDATE GENERATION and an exact `levenshtein` verify runs on the
candidate pairs only — the same block-then-verify discipline as every
dedup operator here, never an all-pairs comparison.

Scale shape: |D(s)| = len(s) + 1, so the exploded variant table is
(avg_len + 1) x rows — a linear blowup, shuffled once on the variant
hash; candidates are join-local; the verify is a per-row integer DP
on short strings. At 100 TB of names this is the only known
all-pairs-free exact-threshold shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_distance_pairs(
    df: DataFrame, key: str, col: str, variant_cache=None
) -> DataFrame:
    """All unordered pairs of rows whose `col` values are within
    Levenshtein distance 1 (including exact equals of distinct keys).
    Returns (key_a, key_b, name_a, name_b, distance), key_a < key_b.

    `variant_cache`, if given, is a memoizer `(build) -> DataFrame`
    (e.g. a _cached_frame closure): the exploded variant-hash table
    feeds BOTH sides of the self-join, and without materialization
    Spark evaluates the whole substring/xxhash construction twice per
    execution — with it, the table is built once per session like the
    MinHash/SimHash signature frames it is the string analog of.
    """
    variants = F.array_union(
        F.array(F.col(col)),
        F.transform(
            F.sequence(F.lit(1), F.length(col).cast("int")),
            lambda i: F.concat(
                F.substring(F.col(col), 1, i - 1),
                F.col(col).substr(i + 1, F.length(col).cast("int")),
            ),
        ),
    )
    # shuffle the 64-bit hash of the variant, not the string: the
    # equi-join is candidate GENERATION, so a hash collision only adds
    # a candidate the levenshtein verify kills — and the exchange
    # carries longs instead of name-length text (hash inside the
    # array: a generator can't nest under an expression)
    def _build_variants() -> DataFrame:
        return df.select(
            F.col(key).alias("_k"), F.col(col).alias("_s"),
            F.explode(
                F.transform(variants, lambda s: F.xxhash64(s))
            ).alias("_var"),
        )

    v = (
        variant_cache(_build_variants)
        if variant_cache is not None
        else _build_variants()
    )
    a = v.select(F.col("_k").alias("key_a"), "_var")
    b = v.select(F.col("_k").alias("key_b"), "_var")
    # dedup candidate pairs as BARE KEY PAIRS (16 bytes/row) before
    # re-attaching names — the distinct is the widest shuffle here and
    # must not carry the strings. The name re-attach joins carry NO
    # broadcast hint on purpose: a hint overrides the planner's size
    # thresholds and would OOM the driver on a corpus-scale name
    # table, so the (key, name) projection is left to Catalyst/AQE —
    # broadcast when it fits (its parquet-scan size estimate is
    # available), key-partitioned shuffle joins when it doesn't, with
    # identical output either way (pinned by
    # test_entry_contract.test_fuzzy_pairs_parity_without_broadcast).
    names = df.select(F.col(key).alias("_k"), F.col(col).alias("_s"))
    cands = (
        a.join(b, "_var")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
    )
    # Dedup AFTER the verify, not before (r14 opt round): candidate
    # pairs repeat only when two strings share >1 variant (measured
    # sf0.1: 977.5k candidates vs 956.1k distinct — 2.2% dupes), so a
    # pre-verify distinct shuffles and hash-aggregates the near-full
    # candidate set (0.49 s of the query's 1.37 s) to save 2% of the
    # verify work. The verify filter kills most candidates, so the
    # post-filter distinct aggregates a tiny survivor set instead;
    # duplicate pairs carry identical names and distance, so the
    # final distinct returns exactly the old row set (re-hashed
    # green vs the oracle). The same argument holds at 100 TB: the
    # dupe factor is bounded by the variant-overlap count (small for
    # lev<=1 blocking), while the pre-verify distinct's exchange
    # scales with the full candidate set.
    return (
        cands.join(
            names.select(
                F.col("_k").alias("key_a"), F.col("_s").alias("name_a")
            ),
            "key_a",
        )
        .join(
            names.select(
                F.col("_k").alias("key_b"), F.col("_s").alias("name_b")
            ),
            "key_b",
        )
        .select(
            "key_a",
            "key_b",
            "name_a",
            "name_b",
            # bounded-threshold DP (Spark 3.5+): O(threshold * n) per
            # pair instead of O(n^2), returning the exact distance
            # when <= 1 and -1 otherwise — so `>= 0` keeps precisely
            # the rows `levenshtein() <= 1` kept, with the same
            # distance values (semantics pinned by
            # test_fuzzy_threshold_levenshtein_semantics)
            F.levenshtein("name_a", "name_b", 1).cast("long").alias("distance"),
        )
        .filter(F.col("distance") >= 0)
        # key-pair dedup, not full-row distinct (r14 opt round):
        # duplicate candidate pairs carry identical names and
        # distance (same keys -> same rows), so deduping on the key
        # pair alone returns the identical row set while the hash
        # aggregate groups on two longs instead of five mixed
        # columns (strings included) — less hashing and comparison
        # work in both the partial and final aggregates.
        .dropDuplicates(["key_a", "key_b"])
    )

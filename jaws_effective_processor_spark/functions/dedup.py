"""Deduplication operators over `documents` / `embeddings`.

Four families, each a production dedup pattern for LLM training data:

- exact:       hash-groupBy on content fingerprint (one shuffle on
               the fingerprint; map-side combine makes it scan-bound)
- minhash-LSH: distinct-token shingles -> 8 md5 minhashes -> 4 bands
               of 2 -> band-bucket self-join. At 100 TB the join is on
               (band, key) — high-cardinality uniform keys, no skew;
               candidate pairs instead of O(n^2).
- n-gram Jaccard: verified similarity on pruned candidate pairs
               (blocking on lang + near-equal length) with exact
               integer permille arithmetic.
- simhash:     16-bit signature from per-token md5 bit majorities —
               one narrow int per doc, pair generation via signature
               equality/ hamming bands downstream.
- embedding:   near-dup pairs above a cosine threshold with label
               blocking.

md5 is the cross-engine hash (identical lowercase hex in Spark and
DuckDB) so every stage is oracle-checkable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

N_MINHASH = 8
N_BANDS = 2  # bands of 4 rows: collision prob j^4 per band keeps the
# candidate set sparse even on this vocabulary-dense corpus
ROWS_PER_BAND = N_MINHASH // N_BANDS

SIMHASH_BITS = 16


def _toks() -> F.Column:
    return F.array_distinct(F.split(F.col("text"), " "))


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: fingerprint -> copies + canonical doc."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def _minhash_cols(toks: F.Column) -> list[F.Column]:
    return [
        F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{i}|"), t)))
        ).alias(f"m{i}")
        for i in range(N_MINHASH)
    ]


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (shingle->minhash->band->bucket-join)."""
    docs = load_table(spark, sf_dir, "documents")
    # tokenize once; the 8 hash families share the shingle array
    toked = docs.select("doc_id", _toks().alias("tk"))
    sig = toked.select("doc_id", *_minhash_cols(F.col("tk")))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).cast("long").alias("band"),
                        F.md5(
                            F.concat(
                                *[
                                    F.col(f"m{ROWS_PER_BAND * b + r}")
                                    for r in range(ROWS_PER_BAND)
                                ]
                            )
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    # the corpus parquet is a handful of input splits at small SF —
    # without this the candidate-pair join runs as ONE task; hashing
    # on the bucket key spreads pair generation across the cluster
    # (at 100 TB the exchange exists anyway as the join shuffle)
    bands = bands.repartition(F.col("band"), F.col("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by token-set Jaccard >= 0.8 on blocked candidates.

    Blocking: same lang, |n_chars delta| <= 2 — turns O(n^2) into a
    skew-free equi-join; the jaccard itself is exact integer permille.

    The length band is folded INTO the join key: one side explodes to
    its 5 admissible lengths so the equi-key is (lang, n_chars) —
    high-cardinality and uniform. Joining on lang alone (a handful of
    values) would be a per-language near-cartesian product: ~60x
    slower at sf0.1 and quadratic-per-key at 100 TB.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", "n_chars", _toks().alias("tk"))
    a = t.alias("a")
    # each (a,b) pair with |delta|<=2 matches exactly one offset -> no dupes
    b = t.select(
        F.col("doc_id"),
        F.col("lang"),
        F.col("tk"),
        F.explode(
            F.array(*[F.col("n_chars") + F.lit(d) for d in range(-2, 3)])
        ).alias("nc_key"),
    ).alias("b")
    inter = F.size(F.array_intersect(F.col("a.tk"), F.col("b.tk"))).cast("long")
    uni = F.size(F.array_union(F.col("a.tk"), F.col("b.tk"))).cast("long")
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.n_chars") == F.col("b.nc_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("_inter"),
            uni.alias("_union"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(1000 * _inter) DIV _union").alias("jac_permille"),
        )
    )
    return pairs.filter(F.col("jac_permille") >= 800)


def _hex4_to_int(col: F.Column) -> F.Column:
    """First 4 hex chars of an md5 -> 16-bit int (conv is cross-checked
    against the oracle's strpos-arithmetic form)."""
    return F.conv(F.substring(col, 1, 4), 16, 10).cast("long")


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from per-token md5 bit majorities."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.transform(_toks(), lambda tok: _hex4_to_int(F.md5(tok))).alias("hv"),
        F.size(_toks()).cast("long").alias("n"),
    )
    # bit b set iff #tokens with bit b set > n/2  <=>  2*count > n
    bit_terms = []
    for bit in range(SIMHASH_BITS):
        mask = 1 << bit
        count_set = F.size(
            F.filter(F.col("hv"), lambda h: (h.bitwiseAND(F.lit(mask))) != 0)
        ).cast("long")
        bit_terms.append(
            F.when(count_set * 2 > F.col("n"), F.lit(mask).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    simhash = bit_terms[0]
    for term in bit_terms[1:]:
        simhash = simhash + term
    return t.select("doc_id", simhash.alias("simhash16"))


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (label-blocked, cos >= 0.30).

    Float discipline: the oracle computes a sequential left-fold dot
    on doubles. Per-pair dots go through an Arrow-vectorized pandas
    UDF using row-wise cumsum — cumsum is strictly sequential, so the
    rounding matches the fold exactly while the arithmetic runs in
    numpy instead of Spark's interpreted array-HOF path (~5x on the
    pair-scoring stage). Norms are folded once per ROW before the
    self-join (n, not n^2, evaluations).
    """
    emb = load_table(spark, sf_dir, "embeddings")

    def dot(x: F.Column, y: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    @F.pandas_udf("double")
    def pair_dot(xs: pd.Series, ys: pd.Series) -> pd.Series:
        if len(xs) == 0:
            return pd.Series([], dtype="float64")
        a = np.vstack(xs.to_numpy())
        b = np.vstack(ys.to_numpy())
        # elementwise products then sequential per-row cumsum == left fold
        return pd.Series(np.cumsum(a * b, axis=1)[:, -1])

    v = F.col("embedding").cast("array<double>")
    e = emb.select(
        "vec_id",
        "label",
        v.alias("v"),
        F.sqrt(dot(v, v)).alias("norm"),
    )

    a, b = e.alias("a"), e.alias("b")
    cos = pair_dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.floor(cos * 10000).cast("long").alias("cos_permyriad"),
        )
        .filter(F.col("cos_permyriad") >= 3000)
    )

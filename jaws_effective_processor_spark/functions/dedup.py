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


def _minhash_cols() -> list[F.Column]:
    toks = _toks()
    return [
        F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{i}|"), t)))
        ).alias(f"m{i}")
        for i in range(N_MINHASH)
    ]


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs (shingle->minhash->band->bucket-join)."""
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select("doc_id", *_minhash_cols())
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
    """
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "lang", "n_chars", _toks().alias("tk"))
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tk"), F.col("b.tk"))).cast("long")
    uni = F.size(F.array_union(F.col("a.tk"), F.col("b.tk"))).cast("long")
    pairs = (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 2),
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

    The dot product is a sequential fold over the zipped arrays —
    bit-identical to the oracle's list_dot_product on doubles.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )

    def dot(x: F.Column, y: F.Column) -> F.Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )

    a, b = e.alias("a"), e.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
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

"""Deduplication operators over `documents` / `embeddings`.

Four families, each a production dedup pattern for LLM training data:

- exact:       hash-groupBy on content fingerprint (one shuffle on
               the fingerprint; map-side combine makes it scan-bound)
- minhash-LSH: 3-word shingles -> one md5 per shingle -> 16 affine
               minhashes ((h1 + i*h2) mod P) -> 4 bands of 4 ->
               band-bucket self-join -> exact-Jaccard verify on the
               surviving candidates. A mass-duplicate class makes any
               LSH bucket quadratic IN THE CLASS (correct, pinned in
               test_properties.py::test_minhash_survives_mass_duplicate_class);
               at production scale run q_dedup_exact FIRST and feed
               LSH only canonical survivors, which caps class size
               at 1. Shingles (not unigram tokens) are
               the pruning power: shared vocabulary no longer collides
               whole bands, so the candidate set is ~the true near-dup
               set instead of a third of all pairs. At 100 TB the join
               is on (band, key) — high-cardinality uniform keys, no
               skew; candidate pairs instead of O(n^2), then the
               verify join touches only candidates.
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

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..cache import SessionFrameCache
from ..tables import load_table, spread_if_undersplit

N_MINHASH = 16
N_BANDS = 4  # 4 bands of 4 rows: per-band collision prob ~= j^4 on
# SHINGLE jaccard j, which is near zero for non-dups once shingles are
# 3-word grams (unigram token sets shared ~36% of all pairs; 3-gram
# sets share almost nothing unless the docs really overlap)
ROWS_PER_BAND = N_MINHASH // N_BANDS
SHINGLE_K = 3  # words per shingle
MINHASH_VERIFY_PERMILLE = 800  # exact shingle-jaccard cut on candidates
# ONE md5 per shingle, then N_MINHASH affine derivations
# (h1 + i*h2) mod P — the standard universal-hash MinHash family.
# vs hashing per (i, shingle): 16x fewer digests AND ~16x less
# generated code per row — the md5-per-(i,shingle) form emitted a
# whole-stage-codegen unit so large the JVM wouldn't JIT it (first
# execution ran 30s+ interpreted). P = 2^31 - 1; h1,h2 < 2^32 and
# i < 16 so h1 + i*h2 < 2^36 — no 64-bit overflow.
MINHASH_P = 2147483647

SIMHASH_BITS = 16


# Per-(session, sf_dir) signature-frame cache: the banded self-joins
# alias one DataFrame on both sides, and Spark re-executes the
# signature subtree (md5 over every shingle) per side unless it is
# materialized. cache() is the session-scoped stand-in for the
# signature table a 100 TB deployment would write to parquet once and
# join from (the same state-store argument as pipeline.alarm_monolog).
_FRAME_CACHE = SessionFrameCache()


def _cached_frame(spark, sf_dir, tag, build):
    return _FRAME_CACHE.get_or_build(spark, (sf_dir, tag), build)


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


def _shingles(tk: F.Column) -> F.Column:
    """Distinct SHINGLE_K-word grams over the token SEQUENCE (order
    matters — this is what makes bands discriminative). Docs shorter
    than SHINGLE_K words collapse to one whole-doc shingle."""
    gram = F.transform(
        F.sequence(F.lit(1), F.size(tk) - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, i + o) for o in range(SHINGLE_K)]
        ),
    )
    # CaseWhen evaluates branches lazily per-row, so the descending
    # sequence()/element_at(0) hazard for short docs never fires
    return F.when(F.size(tk) >= SHINGLE_K, F.array_distinct(gram)).otherwise(
        F.array(F.concat_ws(" ", tk))
    )


def _hash_pairs(sh: F.Column) -> F.Column:
    """Per shingle: one md5, split into two 32-bit halves (h1, h2) —
    the seeds of the affine minhash family. conv(hex, 16, 10) is the
    cross-engine hex->int (DuckDB twin: CAST('0x'||substr AS BIGINT))."""

    def half(h: F.Column, pos: int) -> F.Column:
        return F.conv(F.substring(h, pos, 8), 16, 10).cast("long")

    return F.transform(
        sh,
        lambda t: F.struct(
            half(F.md5(t), 1).alias("h1"), half(F.md5(t), 9).alias("h2")
        ),
    )


def _minhash_cols(hp: F.Column) -> list[F.Column]:
    """minhash_i = min over shingles of (h1 + i*h2) mod P — cheap
    integer arithmetic per hash family instead of a fresh digest."""
    return [
        F.array_min(
            F.transform(
                hp,
                lambda p: (p["h1"] + F.lit(i).cast("long") * p["h2"])
                % F.lit(MINHASH_P).cast("long"),
            )
        ).alias(f"m{i}")
        for i in range(N_MINHASH)
    ]


def with_band_buckets(df: DataFrame, sh_col: str = "sh") -> DataFrame:
    """Add a `bands` column (array<struct<band:long, key:string>>) to
    a frame carrying a shingle array. The hp struct and the minhash
    values each get their OWN projection: they are referenced 16x /
    N_BANDS x downstream, and CollapseProject keeps non-cheap
    multi-referenced expressions materialized instead of inlining 16
    md5 passes per reference. Works identically on batch and
    streaming DataFrames (pure column stages)."""
    hp = df.withColumn("_hp", _hash_pairs(F.col(sh_col)))
    sig = hp.select("*", *_minhash_cols(F.col("_hp"))).drop("_hp")
    # band bucket key: the band's minhash values joined as text —
    # decimal longs render identically in Spark and DuckDB, and the
    # composite is already uniform; no need to re-digest it
    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"m{ROWS_PER_BAND * b + r}")
                        for r in range(ROWS_PER_BAND)
                    ],
                ).alias("key"),
            )
            for b in range(N_BANDS)
        ]
    )
    return sig.withColumn("bands", bands).drop(
        *[f"m{i}" for i in range(N_MINHASH)]
    )


def explode_band_buckets(shing: DataFrame) -> DataFrame:
    """(doc_id, band, key) band table from a (doc_id, sh) shingle
    frame — the batch exploded form of with_band_buckets."""
    return (
        with_band_buckets(shing)
        .select("doc_id", F.explode("bands").alias("bk"))
        .select("doc_id", "bk.band", "bk.key")
    )


def _shingle_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sh) shingle frame, session-cached under 'shingles' —
    the ONE builder every minhash-family consumer shares (pair pass,
    candidate scoring, raw signatures, band stats), so the tokenization
    cannot drift between them. The token array is staged through a
    projection: element_at over an inline split() re-splits the doc
    per shingle element inside the HOF lambda (Generate/HOF bodies are
    not subexpression-eliminated) — measured 2x on this build at
    sf0.1. The signature stage is CPU-heavy per row, so an under-split
    small-SF scan is spread across cores first."""

    def _build():
        docs = spread_if_undersplit(
            spark, load_table(spark, sf_dir, "documents")
        )
        return docs.select(
            "doc_id", F.split(F.col("text"), " ").alias("_tk")
        ).select("doc_id", _shingles(F.col("_tk")).alias("sh"))

    return _cached_frame(spark, sf_dir, "shingles", _build)


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle -> minhash -> band-bucket
    join -> exact-Jaccard verify.

    Pipeline shape at 100 TB: the band self-join shuffles on
    (band, key) — uniform high-cardinality md5 keys; the verify stage
    joins the (small) candidate set back to the shingle table on
    doc_id twice, so exact jaccard is computed O(candidates), never
    O(n^2). The 4-bands-of-4 threshold (~j^(1/4)) admits pairs down to
    j~0.7; the verify cut at MINHASH_VERIFY_PERMILLE keeps the output
    semantics exact ("shingle-jaccard >= 0.8, LSH-pruned")."""
    # signature stage is CPU-heavy per row (md5 over every shingle);
    # spread an under-split small-SF scan across cores
    def _build_bands():
        shing = _shingle_frame(spark, sf_dir)
        return explode_band_buckets(shing)

    bands = _cached_frame(spark, sf_dir, "minhash_bands", _build_bands)
    # the verify stage re-joins candidates to the shingle table (cache
    # hit: _build_bands has already populated it)
    shing = _shingle_frame(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = shing.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = shing.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    uni = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast("long")
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("_inter"),
            uni.alias("_union"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(1000 * _inter) DIV _union").alias("jac_permille"),
        )
        .filter(F.col("jac_permille") >= MINHASH_VERIFY_PERMILLE)
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
    # the verify work (array_intersect/union over token arrays per
    # candidate pair) runs at probe-side scan parallelism when the
    # build side broadcasts — spread the undersplit local scan so it
    # doesn't serialize on one split (measured r14: 1-task stages at
    # sf0.1, 0.87 -> ~0.5 s warm; no-op at real scale)
    docs = spread_if_undersplit(
        spark, load_table(spark, sf_dir, "documents")
    )
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
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
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


SIMHASH_BAND_BITS = 8
SIMHASH_N_BANDS = SIMHASH_BITS // SIMHASH_BAND_BITS
SIMHASH_MAX_HAMMING = SIMHASH_N_BANDS - 1  # pigeonhole: <= k-1 flips
# over k bands leave at least one band untouched, so banding is
# recall-lossless at this threshold


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by SHINGLE-SimHash hamming distance <= 1, via
    byte-band blocking — the pair-generation half of the SimHash
    family (q_dedup_simhash publishes the per-doc token signature).

    The signature here hashes 3-word shingles, not unigram tokens:
    token-majority bits correlate across vocabulary-similar documents
    (measured: a token-based signature passed ~6% of ALL pairs at
    hamming<=1; shingle-based passes ~0.04% — the same lesson as the
    MinHash shingle fix). 2 bands of 8 bits: any pair within the
    threshold shares an exact band (pigeonhole), so candidates come
    from an equi-join on (band, val), and the exact bit_count(xor)
    verify touches only candidates. A 16-bit space saturates at
    billion-doc scale — widen SIMHASH_BITS for production; the
    pipeline shape is bit-width-independent."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    # split AND shingle array staged through projections: both are
    # referenced more than once downstream, and an inline split inside
    # the shingle HOF lambda re-splits the doc per element (the
    # Generate/HOF subexpression hazard documented on _pair_count_table)
    t = (
        docs.select("doc_id", F.split(F.col("text"), " ").alias("_tk"))
        .select("doc_id", _shingles(F.col("_tk")).alias("_sh"))
        .select(
            "doc_id",
            F.transform(
                F.col("_sh"), lambda s: _hex4_to_int(F.md5(s))
            ).alias("hv"),
            F.size(F.col("_sh")).cast("long").alias("n"),
        )
    )
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
    s16 = bit_terms[0]
    for term in bit_terms[1:]:
        s16 = s16 + term
    sig = _cached_frame(
        spark, sf_dir, "simhash_sig", lambda: t.select("doc_id", s16.alias("s16"))
    )
    bands = sig.select(
        "doc_id",
        "s16",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("band"),
                        (
                            F.shiftright(F.col("s16"), SIMHASH_BAND_BITS * i)
                            % F.lit(1 << SIMHASH_BAND_BITS)
                        ).alias("val"),
                    )
                    for i in range(SIMHASH_N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "s16", "bk.band", "bk.val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.s16").alias("sh_a"),
            F.col("b.s16").alias("sh_b"),
        )
        .distinct()
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
    )


NEARDUP_CUT = 0.3  # cosine threshold (permyriad 3000)
NEARDUP_DIM = 64
NEARDUP_BANDS = 6  # LSH bands: a pair is a candidate iff it agrees on
NEARDUP_BAND_BITS = 6  # >=1 band of 6 hyperplane sign bits
_nd_rng = random.Random(20250813)
# deterministic +/-1 random hyperplanes, shared VERBATIM with the
# oracle SQL (same pattern as similarity.HYPERPLANES / knn_lsh)
NEARDUP_PLANES: list[list[float]] = [
    [float(_nd_rng.choice((-1, 1))) for _ in range(NEARDUP_DIM)]
    for _ in range(NEARDUP_BANDS * NEARDUP_BAND_BITS)
]


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (label-blocked, cos >= 0.30):
    hyperplane-LSH banded candidates + exact fold-order re-score.

    Candidate generation is an EQUI-JOIN on (label, band, band_value),
    where band_value packs the sign bits of NEARDUP_BAND_BITS
    deterministic random-hyperplane projections — the random-
    hyperplane (SimHash) LSH family for cosine. Each vector is
    replicated NEARDUP_BANDS times (a constant), never
    O(corpus/blocksize) as a block-matrix all-pairs layout would be:
    coverage is candidate-driven, which is the only shape that
    survives 100 TB. The collision probability per plane is
    1 - theta/pi, so true near-dups (cos >= 0.9) collide on >= 1 of
    6 six-bit bands with p ~= 0.95 while the isotropic bulk is
    pruned ~band_space-fold; recall at the 0.30 tail is the standard
    documented LSH trade (tune NEARDUP_BANDS/NEARDUP_BAND_BITS).
    The oracle SQL implements the SAME planes/banding (generated from
    NEARDUP_PLANES), so the driver hash gate checks the full
    candidate+re-score semantics, exactly like dedup_minhash_lsh.

    Float discipline: scores come from the sequential-fold dot
    product (F.aggregate over zip_with) — bit-identical to DuckDB's
    list_dot_product — divided by per-side folded norms in the same
    order, so the floor(cos*10000) boundary cannot flip between
    engines. Zero-norm vectors are dropped (cos undefined; both
    sides carry the norm>0 guard).
    """
    import numpy as np

    from .similarity import dot

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    e = emb.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        v.alias("v"),
        F.sqrt(dot(v, v)).alias("norm"),
    ).filter(F.col("norm") > 0)

    planes = NEARDUP_PLANES  # capture for the closure (no self ref)

    P = np.asarray(planes, dtype="float64")  # (bands*bits) x dim
    absP = np.abs(P)

    def sig_bands(batches):
        """Arrow-batched signature stage: all hyperplane projections in
        ONE BLAS matmul per batch (A @ P.T), with an exact-fold recheck
        only where it can matter for sign parity.

        The oracle folds each dot product sequentially (DuckDB
        list_dot_product); BLAS uses pairwise/blocked summation, which
        can differ in the last ulps. A sign bit can only flip where
        |matmul proj| is within the summation-error window. The bound
        must cover the DIFFERENCE between two independently-rounded
        summation orders — sequential fold errs up to (dim-1)*eps*
        sum|terms| and the BLAS order up to ~log2(dim)*eps*sum|terms|
        independently — so the window is 2*(dim + log2(dim))*eps*
        (|A| @ |P|.T), comfortably above the sum of both one-order
        bounds (a one-order-only window could miss a flip where fold
        and matmul err in opposite directions). Over-width only costs
        extra cumsum rechecks, which are cheap and exact; entries
        inside the window are recomputed with np.cumsum (== the
        sequential left fold, the bit-exact path this replaces
        wholesale). Emits NEARDUP_BANDS rows per vector."""
        for pdf in batches:
            if pdf.empty:
                continue
            A = np.vstack(pdf["v"].to_numpy())  # n x dim, float64
            n = len(pdf)
            proj = A @ P.T  # n x (bands*bits)
            dim = A.shape[1]
            tol = (
                2.0
                * (dim + np.log2(max(dim, 2)))
                * np.finfo("float64").eps
                * (np.abs(A) @ absP.T)
            )
            risky = np.argwhere(np.abs(proj) <= tol)
            for i, p in risky:
                proj[i, p] = np.cumsum(A[i] * P[p])[-1]
            bits = (proj >= 0).reshape(n, NEARDUP_BANDS, NEARDUP_BAND_BITS)
            weights = (1 << np.arange(NEARDUP_BAND_BITS)).astype("int64")
            vals = (bits * weights).sum(axis=2, dtype="int64")
            out = pdf.loc[pdf.index.repeat(NEARDUP_BANDS)].reset_index(
                drop=True
            )
            out["band"] = np.tile(
                np.arange(NEARDUP_BANDS, dtype="int64"), n
            )
            out["val"] = vals.reshape(-1)
            yield out

    def _build_neardup_bands():
        return e.mapInPandas(
            sig_bands,
            "vec_id long, label long, v array<double>, norm double, "
            "band long, val long",
        )

    # session-cache the signature frame like the other dedup
    # artifacts (shingles/minhash/simhash): the LSH self-join below
    # would otherwise run the Arrow signature stage TWICE per query
    # (once per join side) and once more per bench sweep
    bands = _cached_frame(spark, sf_dir, "neardup_bands", _build_neardup_bands)

    a, b = bands.alias("a"), bands.alias("b")
    pairs = a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("a.band") == F.col("b.band"))
        & (F.col("a.val") == F.col("b.val"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.v").alias("va"),
        F.col("b.v").alias("vb"),
        F.col("a.norm").alias("na"),
        F.col("b.norm").alias("nb"),
    )

    cut = int(NEARDUP_CUT * 10000)

    # Exact re-score of the candidates IN THE JVM (r14 opt round,
    # guide §4.1: built-ins over the Python boundary). The previous
    # shape shipped every candidate pair's two full vectors through a
    # MapInPandas stage per execution — O(candidates x dim) doubles of
    # Arrow traffic plus a Python-worker stage launch every run — to
    # compute np.cumsum(va*vb)[-1], i.e. the sequential left fold.
    # Catalyst's `dot` (F.aggregate over zip_with, init 0.0) IS that
    # fold: 0.0 + p0 == p0 exactly in IEEE754, so every partial sum
    # matches cumsum's and floor((dot/(na*nb)) * 10000) is computed
    # on identical doubles — the result set is bit-identical (oracle
    # re-driven green). Scoring now runs join-local inside the
    # candidate join's stage; the one Arrow stage left in the family
    # is the signature matmul, which is session-cached and runs once
    # per snapshot, not per execution.
    #
    # Score on the (possibly band-duplicated) candidates, then
    # distinct on the final ints: the score per pair is deterministic,
    # so dedup before or after scoring yields the same set and
    # distinct-after avoids re-joining vectors onto deduped pairs.
    return (
        pairs.select(
            "vec_a",
            "vec_b",
            F.floor(
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb"))
                * 10000
            )
            .cast("long")
            .alias("cos_permyriad"),
        )
        .filter(F.col("cos_permyriad") >= cut)
        .distinct()
    )


def _candidate_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard scores for every canonical MinHash-LSH
    candidate pair — (doc_a < doc_b, jac_permille), session-cached
    under tag 'cand_jaccard': the scored candidate table is the shared
    input of the nearest-duplicate review (q_nearest_neighbor_jaccard)
    and the threshold-tuning curve (q_dedup_threshold_curve), and both
    re-reading one artifact is exactly the materialize-once shape a
    curation run has (score candidates once, publish every report
    from the scores).

    Scale shape: identical machinery to the LSH pass — the cached
    band table self-joins on (band, key), canonical candidate pairs
    dedup BEFORE the shingle re-join, so verify work is
    O(candidates), never all-pairs."""

    def _build_scored():
        # ALL plan construction lives inside the build closure: on a
        # cache hit the call returns the memoized frame without
        # rebuilding the self-join subtree driver-side
        bands = _cached_frame(
            spark,
            sf_dir,
            "minhash_bands",
            lambda: explode_band_buckets(_shingle_frame(spark, sf_dir)),
        )
        shing = _shingle_frame(spark, sf_dir)
        a = bands.alias("a")
        b = bands.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        sa = shing.select(
            F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a")
        )
        sb = shing.select(
            F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b")
        )
        inter = F.size(
            F.array_intersect(F.col("sh_a"), F.col("sh_b"))
        ).cast("long")
        uni = F.size(F.array_union(F.col("sh_a"), F.col("sh_b"))).cast(
            "long"
        )
        return (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                "doc_a",
                "doc_b",
                inter.alias("_inter"),
                uni.alias("_union"),
            )
            .select(
                "doc_a",
                "doc_b",
                F.expr("(1000 * _inter) DIV _union").alias("jac_permille"),
            )
        )

    return _cached_frame(spark, sf_dir, "cand_jaccard", _build_scored)


def q_nearest_neighbor_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document nearest near-duplicate: for every doc with at
    least one MinHash-LSH band candidate, its closest candidate by
    exact shingle Jaccard (ties toward the smaller neighbor id) —
    the "closest duplicate" review table a curation run hands to a
    human before committing a dedup threshold, where
    q_dedup_minhash_lsh reports only pairs already past the cut.

    Scale shape: reads the session-cached candidate-Jaccard artifact
    (_candidate_jaccard); each scored pair fans to both orientations
    with a cheap union instead of scoring twice; the final per-doc
    argmax is one window over each doc's candidates only."""
    from pyspark.sql import Window

    scored = _candidate_jaccard(spark, sf_dir)
    both = scored.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("neighbor_id"),
        "jac_permille",
    ).unionByName(
        scored.select(
            F.col("doc_b").alias("doc_id"),
            F.col("doc_a").alias("neighbor_id"),
            "jac_permille",
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("jac_permille").desc(), F.col("neighbor_id")
    )
    return (
        both.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def _minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sig: array<long>) — the full N_MINHASH signature per
    document, session-cached under 'minhash_sig'. The band table keeps
    only per-band composite keys; calibration needs the raw positions
    to count signature agreement."""

    def _build_sig():
        shing = _shingle_frame(spark, sf_dir)
        hp = shing.withColumn("_hp", _hash_pairs(F.col("sh")))
        sig = hp.select("doc_id", *_minhash_cols(F.col("_hp")))
        return sig.select(
            "doc_id",
            F.array(*[F.col(f"m{i}") for i in range(N_MINHASH)]).alias(
                "sig"
            ),
        )

    return _cached_frame(spark, sf_dir, "minhash_sig", _build_sig)


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH estimator calibration: for each signature-agreement level k
    (k of N_MINHASH positions equal), how many candidate pairs sit at
    that level and what their exact shingle Jaccard actually is (mean/
    min/max permille) next to the estimator's k/N prediction — the
    table that tells an operator whether N_MINHASH hashes are enough
    before trusting the banding threshold (wide min-max bands at a
    level mean the estimator is too coarse; a biased mean means the
    hash family misbehaves on this corpus).

    Population is the CANDIDATE pairs (sharing >= 1 band) — the set
    LSH actually surfaces, which is what needs calibrating; the twin
    applies the same restriction. Scale shape: two doc-keyed joins of
    the cached candidate table to the cached signature table (AQE
    broadcasts the k-row side), one zip_with agreement count per pair,
    and a <= N_MINHASH+1-row aggregation."""
    scored = _candidate_jaccard(spark, sf_dir)
    sig = _minhash_sig(spark, sf_dir)
    sa = sig.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("_sa"))
    sb = sig.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("_sb"))
    matches = F.size(
        F.filter(
            F.zip_with(F.col("_sa"), F.col("_sb"), lambda x, y: x == y),
            lambda b: b,
        )
    ).cast("long")
    cal = (
        scored.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("jac_permille", matches.alias("sig_matches"))
    )
    return (
        cal.groupBy("sig_matches")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.expr("sum(jac_permille) DIV count(*)")
            .cast("long")
            .alias("mean_jac_permille"),
            F.min("jac_permille").cast("long").alias("min_jac_permille"),
            F.max("jac_permille").cast("long").alias("max_jac_permille"),
        )
        .select(
            "sig_matches",
            F.expr(f"(1000 * sig_matches) DIV {N_MINHASH}")
            .cast("long")
            .alias("est_jac_permille"),
            "n_pairs",
            "mean_jac_permille",
            "min_jac_permille",
            "max_jac_permille",
        )
    )


DEDUP_LADDER = tuple(range(500, 1000, 50))  # jac_permille cut points


def q_dedup_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning curve for the near-dup cut: for each candidate
    Jaccard threshold in DEDUP_LADDER, how many verified candidate
    pairs survive and how many distinct documents sit in at least one
    surviving pair — the numbers an operator reads before committing a
    dedup threshold (too low removes real content, too high keeps
    near-copies; the curve's knee is the decision). Monotone
    non-increasing in the threshold by construction.

    Scale shape: reads the session-cached candidate-Jaccard artifact
    (_candidate_jaccard) twice — one conditional-sum pass over pair
    rows, one per-doc best-score aggregation (a doc's best candidate
    IS its nearest-duplicate score) followed by a second conditional
    pass — then stack() fans the two 1-row frames into the ladder
    rows. Nothing corpus-sized moves; the wide work happened once in
    the cached artifact."""
    scored = _candidate_jaccard(spark, sf_dir)
    pair_sums = scored.agg(
        *[
            F.count(F.when(F.col("jac_permille") >= t, F.lit(1)))
            .cast("long")
            .alias(f"p{t}")
            for t in DEDUP_LADDER
        ]
    )
    per_doc = (
        scored.select(F.col("doc_a").alias("doc_id"), "jac_permille")
        .unionByName(
            scored.select(F.col("doc_b").alias("doc_id"), "jac_permille")
        )
        .groupBy("doc_id")
        .agg(F.max("jac_permille").alias("best"))
    )
    doc_sums = per_doc.agg(
        *[
            F.count(F.when(F.col("best") >= t, F.lit(1)))
            .cast("long")
            .alias(f"d{t}")
            for t in DEDUP_LADDER
        ]
    )
    stack_args = ", ".join(
        f"{t}L, p{t}, d{t}" for t in DEDUP_LADDER
    )
    return (
        pair_sums.crossJoin(F.broadcast(doc_sums))
        .select(
            F.expr(
                f"stack({len(DEDUP_LADDER)}, {stack_args})"
                " AS (threshold_permille, n_pairs, n_docs_affected)"
            )
        )
    )


def q_minhash_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH geometry QA: per band, the bucket-population histogram
    summary — distinct buckets, total docs, largest bucket, singleton
    buckets, and docs sitting in collision (size > 1) buckets. This
    is the report that tunes bands-x-rows: a mega-bucket means the
    band key is too coarse (candidate blowup at the join), all
    singletons means no recall; operators watch it per corpus
    snapshot before running the pair pass.

    Scale shape: reads the session-cached band table; one (band, key)
    aggregation (map-side partials, uniform md5-derived keys) folded
    into an N_BANDS-row summary — the same exchange the candidate
    join would pay, with no join attached."""

    def _build_bands():
        shing = _shingle_frame(spark, sf_dir)
        return explode_band_buckets(shing)

    bands = _cached_frame(spark, sf_dir, "minhash_bands", _build_bands)
    sizes = bands.groupBy("band", "key").agg(
        F.count("*").cast("long").alias("sz")
    )
    return (
        sizes.groupBy("band")
        .agg(
            F.count("*").cast("long").alias("n_buckets"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum((F.col("sz") == 1).cast("long"))
            .cast("long")
            .alias("n_singletons"),
            F.sum(F.when(F.col("sz") > 1, F.col("sz")).otherwise(0))
            .cast("long")
            .alias("n_colliding_docs"),
        )
    )

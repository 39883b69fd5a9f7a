"""Full-text retrieval scoring over `documents` — the search-side
consumer of the `inverted_index` artifact (functions/corpus.py):
BM25 ranking of the corpus against a fixed query, in exact
fixed-point integer arithmetic so the DuckDB twin is bit-identical.

Why fixed point: classic BM25 uses ln() in the idf term; IEEE
transcendentals are not guaranteed to round identically across
engines, which would make the oracle hash flaky. We keep the
Robertson tf saturation exactly (k1=1.2, b=0.75 in milli-units,
integer DIV) and replace the ln((N-df+0.5)/(df+0.5)) idf with the
all-integer surrogate (1e6*(N-df) + 5e5) DIV (df+1) — NOT the exact
micro-scaled ln argument (that would need (df+0.5) denominators),
but strictly monotone decreasing in df like the true idf, so
per-term ordering is preserved, and every intermediate is a 64-bit
integer both engines compute identically.

Scale shape: the exploded token scan filters to the query's terms
BEFORE any shuffle (predicate on the token value — at 100 TB this is
the posting-list read of a real index, here expressed as
filter-early), the per-term document frequencies and the corpus
totals are 1-to-3-row broadcasts, and the only wide operation is the
groupBy(doc_id) score sum over matched postings. Top-k goes through
TakeOrdered (per-partition heads then a k-row driver merge), never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_table, spread_if_undersplit

BM25_QUERY_TERMS = ("spark", "window", "scan")
BM25_K1_MILLI = 1200  # k1 = 1.2
BM25_B_MILLI = 750  # b = 0.75
BM25_TOP_K = 15


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k docs for the fixed query under fixed-point BM25.

    score_micro(d) = sum over query terms t present in d of
      idf_micro(t) * tf*(1000+k1_milli) DIV denom_milli(d, tf)
    with denom_milli = 1000*tf + k1_milli*(1000 - b_milli
      + b_milli*dl*n_docs DIV total_tokens) DIV 1000
    and idf_micro = (1e6*(N - df) + 5e5) DIV (df + 1).

    Physical shape: tf per query term is a per-row array count
    (`size(filter(tokens, = term))`), NOT an explode — the query is a
    handful of terms, so the posting matrix is k extra columns, and
    the (doc, token) shuffle + per-term join of the textbook plan
    disappears. Corpus statistics (total_tokens, n_docs, every df)
    fold into ONE map-side-partial aggregate producing a single row,
    broadcast back to the scoring scan; the only wide operation left
    is TakeOrdered on the scored docs. (The first version exploded
    tokens and shuffled twice — 1.1 s at sf0.1 vs ~0.35 s for this
    form, and at 100 TB the explode shuffles corpus*avg_dl rows.)
    """
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    # token array staged once: dl + one F.filter per query term each
    # re-evaluate an inline split (nterms+1 splits per row otherwise)
    tokened = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("_tk")
    )
    tk = F.col("_tk")

    # one-arg lambda per term (a two-arg lambda with a default would
    # be called as (element, index) by F.filter)
    def tf_col(term: str) -> F.Column:
        return F.size(
            F.filter(tk, lambda t: t == F.lit(term))
        ).cast("long")

    staged = tokened.select(
        "doc_id",
        F.size(tk).cast("long").alias("dl"),
        *[
            tf_col(term).alias(f"tf_{i}")
            for i, term in enumerate(BM25_QUERY_TERMS)
        ],
    )
    nterms = len(BM25_QUERY_TERMS)
    stats = staged.agg(
        F.sum("dl").alias("total_tokens"),
        F.count("*").alias("n_docs"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(nterms)
        ],
    )
    any_match = F.col("tf_0") > 0
    for i in range(1, nterms):
        any_match = any_match | (F.col(f"tf_{i}") > 0)
    scored = staged.filter(any_match).crossJoin(F.broadcast(stats))

    # exact integer DIV end-to-end — a float division truncated to
    # long can land one off the floored quotient at exact boundaries.
    # The naive (idf * num) DIV den overflows int64 at web scale
    # (idf_micro ~ 1e6 * n_docs for a rare term; times tf*2200 passes
    # 2^63 around 1e9 docs), so the quotient-remainder decomposition
    # (idf DIV den)*num + ((idf % den)*num) DIV den computes the
    # IDENTICAL value with every intermediate bounded by
    # ~idf*(k1+1) — safe past 1e12 docs. The DuckDB twin keeps the
    # naive form: its // promotes through 128-bit, and both reduce to
    # the same exact integer.
    def term_score(i: int) -> F.Column:
        idf = (
            f"(1000000 * (n_docs - df_{i}) + 500000) DIV (df_{i} + 1)"
        )
        num = f"tf_{i} * (1000 + {BM25_K1_MILLI})"
        den = (
            f"1000 * tf_{i} + ({BM25_K1_MILLI} * (1000 - {BM25_B_MILLI}"
            f" + ({BM25_B_MILLI} * dl * n_docs) DIV total_tokens)) DIV 1000"
        )
        return F.expr(
            f"CASE WHEN tf_{i} > 0"
            f" THEN (({idf}) DIV ({den})) * ({num})"
            f" + ((({idf}) % ({den})) * ({num})) DIV ({den})"
            f" ELSE 0 END"
        )

    total = term_score(0)
    for i in range(1, nterms):
        total = total + term_score(i)
    per_doc = scored.select("doc_id", total.alias("score_micro"))
    topk = per_doc.orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    ).limit(BM25_TOP_K)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "score_micro",
    )


RAG_EMBED_DIMS = 8  # deterministic hash-embedding dimensions
RAG_SIGN_BITS = 8  # LSH bucket = sign bits of the first 8 dims


def q_rag_bucket_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end RAG index build, reported per LSH bucket: chunk the
    corpus (the q_doc_chunks windows), embed each chunk with a
    deterministic hash embedding (one md5 per (dim, chunk), mapped to
    [-1000, 1000] — the stand-in for a real encoder, exercising the
    REAL pipeline shape), route chunks to axis-aligned hyperplane
    buckets (sign bit per dim), and report each bucket's population —
    the cell-size QA view of the servable index, the retrieval-side
    analog of shard_skew_report.

    Scale shape: chunking is posexplode inside codegen; embedding +
    bucketing are scan-local md5/integer expressions (the expensive
    encoder would be an Arrow-batched mapInPandas in production, same
    downstream plan); the only wide operation is the per-bucket
    aggregation with map-side partials into at most 2^RAG_SIGN_BITS
    rows."""
    from .corpus import q_doc_chunks

    chunks = q_doc_chunks(spark, sf_dir)
    dims = F.transform(
        F.sequence(F.lit(0), F.lit(RAG_EMBED_DIMS - 1)),
        lambda d: (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            d.cast("string"),
                            F.lit(":"),
                            F.col("chunk_text"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 2001
        )
        - 1000,
    )
    staged = chunks.select("doc_id", dims.alias("_e"))
    # RAG_SIGN_BITS is a compile-time constant, so the bit sum unrolls
    # in Python (shiftleft needs a literal shift anyway)
    bucket = F.lit(0).cast("long")
    for i in range(RAG_SIGN_BITS):
        bucket = bucket + F.when(
            F.element_at(F.col("_e"), i + 1) >= 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return (
        staged.select("doc_id", bucket.alias("bucket_id"))
        .groupBy("bucket_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.count_distinct(F.col("doc_id")).alias("n_docs"),
        )
    )


PHRASE_TERMS = ("table", "hash")


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval: every document containing the fixed
    query phrase as CONTIGUOUS tokens, with its occurrence count —
    the positional-index operation BM25's bag-of-words scoring cannot
    express (and the verify step behind "quoted" search).

    Physical shape, same discipline as q_bm25_search: the occurrence
    count is a PER-ROW expression, so there is no posting-list
    explode, no (doc, token) shuffle, no join at all; the only
    non-scan work is the final filter (which Catalyst pushes to the
    scan — at scale that is exactly where it belongs). A production
    positional index replaces the scan with a pre-built
    (token -> (doc, positions)) table; the per-doc verify here is
    exactly its candidate-check kernel.

    The count is the replace-trick over a DOUBLE-SPACED view of the
    text: in ' ' || replace(text, ' ', '  ') || ' ', a token-boundary
    match of ' table  hash ' cannot share characters with the next
    one (each original boundary is two spaces, one per side), so
    non-overlapping substring counting — (len(p) - len(replace(p,
    needle, ''))) / len(needle), pure whole-stage-codegen string ops
    evaluated identically by DuckDB — counts every start position.
    Precondition: the phrase must be BORDER-FREE in token space (no
    proper prefix equal to a suffix, true of the fixed query
    phrase); a periodic phrase like (a, b, a) can self-overlap, and
    left-to-right non-overlapping counting would then undercount
    per-position matches (pinned against a Python sliding-window
    count in test_properties.test_phrase_search_matches_python_scan).
    The first cut filtered per-position element_at over the split
    array instead: Spark's higher-order functions (ArrayFilter /
    ArrayAggregate) are CodegenFallback, i.e. interpreted per row,
    and the pushed-down filter re-inlines the split() per element —
    1.1 s at sf0.1 vs ~0.2 s for this form."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    padded = F.concat(
        F.lit(" "),
        F.replace(F.col("text"), F.lit(" "), F.lit("  ")),
        F.lit(" "),
    )
    needle = " " + "  ".join(PHRASE_TERMS) + " "
    occ = (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle))))
        / F.lit(len(needle))
    ).cast("long")
    return (
        docs.select("doc_id", occ.alias("n_occurrences"))
        .filter(F.col("n_occurrences") > 0)
    )

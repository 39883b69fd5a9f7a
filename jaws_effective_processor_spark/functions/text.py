"""Text-analysis operators over the `documents` table.

Training-data-pipeline surface: token counting, quality scoring,
language-ID (stopword-marker heuristic), document fingerprinting.
All pure built-in column expressions (split / transform / filter /
aggregate stay inside codegen; no Python in the row path), each with
a DuckDB oracle twin.

Scale: every query here is embarrassingly parallel over documents —
no shuffle at all except the final aggregation-free scan; at 100 TB
these run at parquet-scan speed with column pruning down to (doc_id,
text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

# language -> marker stopwords (heuristic n-gram/stopword language ID)
LANG_MARKERS = {
    "en": ("the", "a", "of"),
    "es": ("el", "la", "de"),
    "de": ("der", "die", "und"),
}
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _tokens() -> F.Column:
    return F.split(F.col("text"), " ")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality ratios as exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    base = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        .cast("long")
        .alias("n_stopwords"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_tok_chars"),
    )
    return base.select(
        "doc_id",
        "len_chars",
        "n_tokens",
        "n_distinct_tokens",
        "n_stopwords",
        F.expr("(1000 * n_stopwords) DIV n_tokens").alias("stopword_permille"),
        F.expr("(100 * _tok_chars) DIV n_tokens").alias("avg_token_len_centi"),
    )


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID with deterministic arg-max."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens()
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers))).cast("long")
        for lang, markers in LANG_MARKERS.items()
    }
    df = docs.select("doc_id", F.col("lang").alias("labeled_lang"), *[
        scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS
    ])
    # arg-max with fixed priority order en > es > de on ties
    best = (
        F.when(
            (F.col("score_en") >= F.col("score_es"))
            & (F.col("score_en") >= F.col("score_de"))
            & (F.col("score_en") > 0),
            "en",
        )
        .when(
            (F.col("score_es") >= F.col("score_de")) & (F.col("score_es") > 0), "es"
        )
        .when(F.col("score_de") > 0, "de")
        .otherwise("unknown")
    )
    return df.withColumn("predicted_lang", best)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: raw md5 + order-insensitive token-set md5."""
    docs = load_table(spark, sf_dir, "documents")
    sorted_toks = F.array_sort(F.array_distinct(_tokens()))
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fp_exact"),
        F.md5(F.concat_ws(" ", sorted_toks)).alias("fp_tokenset"),
    )


# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the GPT-2 pattern family without lookarounds so Java regex (Spark)
# and RE2 (DuckDB) agree byte-for-byte.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex, and the
    chars/4 subword heuristic used for quick budget estimates."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(_tokens()).cast("long").alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PATTERN), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
        F.expr("(length(text) + 3) DIV 4").alias("est_subwords"),
    )


# quality gates: each worth 250 of 1000; {d} is the INTEGER division
# operator of the dialect (Spark `DIV`, DuckDB `//`) so both engines
# agree exactly at bucket boundaries
QUALITY_EXPR_T = """
  CASE WHEN len_chars BETWEEN 100 AND 450 THEN 250 ELSE 0 END
+ CASE WHEN n_tokens > 0 AND (1000 * n_stopwords) {d} n_tokens
            BETWEEN 30 AND 120 THEN 250 ELSE 0 END
+ CASE WHEN n_tokens > 0 AND (1000 * n_distinct_tokens) {d} n_tokens >= 400
       THEN 250 ELSE 0 END
+ CASE WHEN n_tokens > 0 AND (100 * tok_chars) {d} n_tokens
            BETWEEN 430 AND 530 THEN 250 ELSE 0 END
"""


def quality_stat_columns() -> list:
    """The five token statistics QUALITY_EXPR_T consumes, as reusable
    column expressions — shared between the batch quality query and
    the streaming ingest gate so both paths score byte-identically."""
    toks = _tokens()
    return [
        F.length("text").cast("long").alias("len_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias(
            "n_distinct_tokens"
        ),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
        .cast("long")
        .alias("n_stopwords"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("tok_chars"),
    ]


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (0-1000) + keep/review/drop
    bucket — the filter stage of a training-data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", *quality_stat_columns())
    score = F.expr(f"CAST({QUALITY_EXPR_T.format(d='DIV')} AS BIGINT)")
    return base.select(
        "doc_id",
        score.alias("quality_score"),
        F.when(score >= 750, "keep")
        .when(score >= 500, "review")
        .otherwise("drop")
        .alias("bucket"),
    )


def q_language_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier QA: the labeled-vs-predicted language confusion
    matrix of the stopword-marker language ID, with per-cell share of
    the labeled language's row (permille). The matrix is at most
    |langs|^2 cells — the groupBy shuffle carries a handful of rows
    per task after map-side partials, and the row-total window runs
    over those same few rows."""
    from pyspark.sql import Window

    pred = q_language_id(spark, sf_dir)
    cells = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("labeled_lang")
    return cells.select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.expr("1000 * n_docs").alias("_scaled"),
        F.sum("n_docs").over(w).alias("_row_total"),
    ).select(
        "labeled_lang",
        "predicted_lang",
        "n_docs",
        F.expr("_scaled DIV _row_total").alias("row_share_permille"),
    )

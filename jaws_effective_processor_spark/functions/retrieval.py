"""Full-text retrieval scoring over `documents` — the search-side
consumer of the `inverted_index` artifact (functions/corpus.py):
BM25 ranking of the corpus against a fixed query, in exact
fixed-point integer arithmetic so the DuckDB twin is bit-identical.

Why fixed point: classic BM25 uses ln() in the idf term; IEEE
transcendentals are not guaranteed to round identically across
engines, which would make the oracle hash flaky. We keep the
Robertson tf saturation exactly (k1=1.2, b=0.75 in milli-units,
integer DIV) and replace ln((N-df+0.5)/(df+0.5)) with its argument
in micro-units — monotone in the true idf, so per-term ordering is
preserved, and every intermediate is a 64-bit integer both engines
compute identically.

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
    """
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    tk = F.split(F.col("text"), " ")
    with_len = docs.select(
        "doc_id", F.size(tk).cast("long").alias("dl"), tk.alias("_tk")
    )
    totals = with_len.agg(
        F.sum("dl").alias("total_tokens"),
        F.count("*").alias("n_docs"),
    )
    postings = with_len.select(
        "doc_id", "dl", F.explode("_tk").alias("token")
    ).filter(F.col("token").isin(*BM25_QUERY_TERMS))
    tf = postings.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))

    scored = tf.join(F.broadcast(dfreq), "token").crossJoin(
        F.broadcast(totals)
    )
    idf_micro = F.expr(
        "(1000000 * (n_docs - df) + 500000) DIV (df + 1)"
    )
    denom_milli = F.expr(
        f"1000 * tf + ({BM25_K1_MILLI} * (1000 - {BM25_B_MILLI}"
        f" + ({BM25_B_MILLI} * dl * n_docs) DIV total_tokens)) DIV 1000"
    )
    num_milli = F.expr(f"tf * (1000 + {BM25_K1_MILLI})")
    # exact integer DIV end-to-end — a float division truncated to
    # long can land one off the floored quotient at exact boundaries
    per_term = scored.select(
        "doc_id",
        (idf_micro * num_milli).alias("_num"),
        denom_milli.alias("_den"),
    ).select("doc_id", F.expr("_num DIV _den").alias("_term_score"))
    per_doc = per_term.groupBy("doc_id").agg(
        F.sum("_term_score").alias("score_micro")
    )
    topk = per_doc.orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    ).limit(BM25_TOP_K)
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return topk.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "doc_id",
        "score_micro",
    )

"""Edge-case oracle parity for the document operators.

The driver's fixtures are well-formed; these synthesize the degenerate
shapes a real crawl contains — empty text, one-token docs, docs below
the shingle width, exact duplicates, heavy intra-doc repetition — and
assert the SAME Spark-vs-DuckDB parity the main gate checks. Engines
disagree most at the edges (split('') semantics, empty-array folds),
so this is where silent divergence would hide.
"""

from __future__ import annotations

import os

import pytest

from jaws_effective_processor_spark.entry_queries import QUERIES, ORACLE_SQL
from tests.oracle_harness import compare

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (1, "", "en", "edge", 0),
    (2, "one", "en", "edge", 3),
    (3, "two words", "en", "edge", 9),
    (4, "three word doc", "en", "edge", 14),
    (5, "the the the the the the", "en", "edge", 23),
    (6, "exact duplicate body here", "en", "edge", 25),
    (7, "exact duplicate body here", "en", "edge", 25),
    (8, "a b c d e f g h i j k l m n o p", "es", "edge", 31),
    (9, "unico documento espanol con varias palabras distintas", "es", "edge", 53),
    (50, "held out doc with some overlapping words here", "de", "edge", 45),
    (51, "train doc with some overlapping words here too", "de", "edge", 46),
    # unicode (BMP-only: accents + CJK agree on length/md5/split in
    # both engines; astral-plane chars would diverge on length —
    # Java counts UTF-16 units, DuckDB counts code points — and are
    # deliberately excluded as a documented engine difference)
    (52, "café naïve piñata über señor déjà vu rôle fiancée crème", "fr", "edge", 55),
    (53, "机器 学习 模型 训练 数据 管道 质量 过滤 重复 删除", "zh", "edge", 29),
    (54, "mixed ascii café 数据 words tokens 模型 here", "en", "edge", 41),
]

EDGE_QUERIES = (
    "text_stats",
    "token_counts",
    "doc_fingerprint",
    "dedup_exact",
    "dedup_normalized",
    "doc_repetition",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "doc_chunks",
    "pack_sequences",
    "vocab_topk",
    "vocab_coverage",
    "token_rarity",
    "corpus_mixture",
    "contamination",
    "quality_score",
    "language_id",
    "pii_scan",
    "pii_redact",
    "stratified_sample",
    "decontaminate",
    "dedup_keep",
    "mixture_rebalance",
    "keyword_topk",
    "inverted_index",
    "curation_funnel",
    "source_quality_report",
    "packed_token_ids",
    "gopher_quality",
    "block_dedup",
    "dup_gram_coverage",
    "bloom_dedup_gate",
    "bm25_search",
    "bpe_pair_counts",
    "bpe_merge_round",
    "rag_bucket_report",
    "language_confusion",
    "shard_skew_report",
    # round-6 operators
    "quality_logit",
    "phrase_search",
    "context_length_report",
    "mixture_temperature",
    "split_leakage",
    "unigram_surprisal",
    # round-7 operators
    "bigram_pmi",
    "token_entropy",
    "tokenizer_fertility",
    "doc_length_deciles",
    "nearest_neighbor_jaccard",
    "best_of_source",
    "ngram_lm_bits",
    "minhash_band_stats",
    "stopword_candidates",
    # post-window round-7 additions (single-source corpus: the overlap
    # matrix must be EMPTY on both engines — no self-pairs; the edge
    # corpus's exact-dup pair keeps the threshold curve non-empty)
    "source_overlap",
    "dedup_threshold_curve",
    "minhash_calibration",
    "packing_report",
    # round-8 operators (media hashes over degenerate payloads incl.
    # the empty doc; importance/quality/DSIR on sub-shingle docs —
    # the gram table is empty for most of the corpus)
    "media_neardup",
    "media_dedup_keep",
    "importance_resampling",
    "quality_calibration",
    "dsir_weights",
    # round-14 operators: ccnet_buckets over languages with FEWER
    # than 3 scoreable docs (fr/zh have 1 each — ntile hands out
    # buckets 1..n_docs, so some names are absent; the empty-bucket
    # edge is where engine ntile semantics would diverge) and the
    # quality-aware keeper over the exact-dup pair + unpaired docs
    "ccnet_buckets",
    "dedup_keep_best",
    # round-11 operators: every shared run in the edge corpus (the
    # 4-token exact-dup pair 6/7, the 3-token overlap 50/51) is
    # BELOW the EXSUB_K window, so the spans report must be EMPTY on
    # both engines (the empty-result edge is where split('')/empty-
    # fold divergence hides) and the cut must pass every doc through
    # whole — including the empty doc, whose rejoin fingerprint is
    # the engines' empty-string md5 agreement (the very divergence
    # the sf0.01 full-cut docs exposed in DuckDB's array_to_string)
    "exact_substring_spans",
    "exact_substring_cut",
)


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_sf")
    cols = list(zip(*EDGE_DOCS))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1], pa.string()),
            "lang": pa.array(cols[2], pa.string()),
            "source": pa.array(cols[3], pa.string()),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    # one plain parquet FILE — both Spark and the DuckDB view read it
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_docs_oracle_parity(spark, edge_dir, name):
    df = QUERIES[name](spark, edge_dir)
    compare(df, ORACLE_SQL[name], edge_dir)


# ---- embeddings edge cases: zero vectors, duplicates, tiny labels --

EDGE_VECS = 40
EMB_QUERIES = ("embedding_neardup", "knn_bruteforce", "knn_lsh", "knn_ivf",
               "knn_ivf_multiprobe", "semdedup_keep",
               "embedding_quantize", "ann_recall", "embedding_outliers",
               "kmeans_assign", "kmeans_report", "kmeans_label_purity",
               "kmeans_balanced_sample", "kmeans_centroid_shift",
               # round 8/9: PQ family — the K=16 codebook seed rows
               # (vec_id 10..25) now CONTAIN the zero vector, the
               # exact-duplicate pair, and the antipode, so training
               # itself is exercised on degenerate seeds (a duplicate
               # seed pair forces an emptied cell + carry-forward)
               "pq_quantize", "pq_train_round", "ann_pq_recall",
               "ann_ivfpq", "pq_train_trace", "ann_cell_balance",
               # round 10: the refine stage over the same degenerate
               # seeds (zero vector in the shortlist exercises the
               # norm>0 fetch guard; convergence-chosen depth runs on
               # a 40-vector corpus)
               "ann_ivfpq_refined", "ann_refine_recall",
               "ann_refine_curve",
               # rounds 11/12: spill + tuning surfaces + the residual
               # family — the zero vector (vec 20, inside the seed
               # range) has NO home cell, exercising the residual
               # chain's LEFT JOIN + coalesce(0) totality rule in both
               # engines; duplicate seeds force emptied residual cells
               "ann_ivfpq_spill", "ann_probe_curve", "ann_joint_tuning",
               "ann_spill_tuning", "ann_ivfpq_residual",
               "ann_ivfpq_spill_residual", "ann_residual_recall",
               "pq_residual_diagnosis",
               # round 13: the trained-k-means coarse serve stack —
               # the zero vector IS k-means-assignable (Euclidean is
               # total) but NOT servable (norm>0), exercising the
               # servable-join rule on both engines; duplicate seeds
               # can empty a trained cluster, exercising the
               # fewer-than-K-cells path end to end
               "ann_ivfpq_kmeans", "ann_ivfpq_spill_kmeans",
               "ann_coarse_cost", "ann_kmeans_tuning")


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_emb")
    dim = 64
    vecs, labels = [], []
    for i in range(EDGE_VECS):
        if i == 20:
            v = [0.0] * dim  # zero vector: norm 0 -> cos is NaN/NULL
        elif i == 21:
            v = [1.0] + [0.0] * (dim - 1)
        elif i == 22:
            v = [1.0] + [0.0] * (dim - 1)  # exact duplicate of 21
        elif i == 23:
            v = [-1.0] + [0.0] * (dim - 1)  # antipode of 21
        else:
            v = [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(dim)]
        vecs.append(v)
        labels.append(i % 3)
    table = pa.table(
        {
            "vec_id": pa.array(range(EDGE_VECS), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMB_QUERIES)
def test_edge_embeddings_oracle_parity(spark, edge_emb_dir, name):
    df = QUERIES[name](spark, edge_emb_dir)
    compare(df, ORACLE_SQL[name], edge_emb_dir)


def test_kmeans_fewer_vectors_than_k(spark, tmp_path_factory):
    """k-means on a corpus SMALLER than K (with exact-duplicate seed
    vectors): every vector seeds its own centroid, duplicates share a
    cluster (smallest cid wins the tie), and the oracle twin agrees —
    the degenerate-corpus shape a pipeline hits on a fresh partition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_kmeans")
    dim = 8
    vecs = [
        [0.1] * dim,
        [0.1] * dim,  # duplicate of vec 0: a seed collapses
        [-0.3] * dim,
        [0.5] + [0.0] * (dim - 1),
    ]
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([0] * len(vecs), pa.int32()),
        }
    )
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    for name in ("kmeans_assign", "kmeans_report"):
        compare(QUERIES[name](spark, str(d)), ORACLE_SQL[name], str(d))


def test_threshold_curve_exact_dup_no_false_negative(spark, edge_dir):
    """The pigeonhole guarantee at j=1000: an exact duplicate pair has
    identical shingle sets, so every minhash matches, every band
    collides, LSH MUST surface the pair, and the curve counts it at
    every threshold — including the top rung. Docs 6/7 are the edge
    corpus's exact-dup pair."""
    curve = {
        r["threshold_permille"]: (r["n_pairs"], r["n_docs_affected"])
        for r in QUERIES["dedup_threshold_curve"](spark, edge_dir).collect()
    }
    for t, (n_pairs, n_docs) in curve.items():
        assert n_pairs >= 1 and n_docs >= 2, t

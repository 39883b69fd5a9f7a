"""Invariants for the round-5 filtering / gating / retrieval
operators (functions/filtering.py, functions/retrieval.py). Oracle
parity itself is covered by test_entry_contract + test_edge_docs;
these pin the semantic guarantees the oracles can't express and the
physical-plan shapes that must survive scale-up.
"""

from __future__ import annotations

from jaws_effective_processor_spark.entry_queries import QUERIES
from jaws_effective_processor_spark.functions.filtering import (
    q_block_dedup,
    q_bloom_dedup_gate,
    q_dup_gram_coverage,
    q_gopher_quality,
)
from jaws_effective_processor_spark.functions.retrieval import (
    BM25_TOP_K,
    q_bm25_search,
)
from jaws_effective_processor_spark.plans import explain_str, has_cartesian
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_gopher_quality_rules_discriminate(spark):
    rows = q_gopher_quality(spark, SF_ORACLE).collect()
    assert rows
    keeps = {r.keep for r in rows}
    assert keeps == {True, False}, "rule set should split the corpus"
    # each rule's verdict is the conjunction contract
    for r in rows:
        assert r.keep == (
            r.ok_length and r.ok_mean_token_len
            and r.ok_stopwords and r.ok_top_token
        )
    # individually discriminating rules (calibrated thresholds)
    assert {r.ok_length for r in rows} == {True, False}
    assert {r.ok_stopwords for r in rows} == {True, False}
    assert {r.ok_top_token for r in rows} == {True, False}


def test_block_dedup_conservation(spark):
    out = q_block_dedup(spark, SF_ORACLE)
    rows = out.collect()
    assert rows
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_blocks
        assert 0 <= r.drop_permille <= 1000
    # kept blocks across the corpus == distinct block hashes: exactly
    # one winner per hash value
    from jaws_effective_processor_spark.functions.filtering import (
        _block_table,
    )
    n_kept = sum(r.n_kept for r in rows)
    n_hashes = (
        _block_table(spark, SF_ORACLE).select("block_h").distinct().count()
    )
    assert n_kept == n_hashes


def test_dup_gram_coverage_bounds(spark):
    rows = q_dup_gram_coverage(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert 0 <= r.dup_permille <= 1000


def test_bloom_gate_no_false_negatives(spark):
    rows = q_bloom_dedup_gate(spark, SF_ORACLE).collect()
    assert rows
    # the Bloom guarantee: every true duplicate is flagged
    assert all(r.sound for r in rows)


def test_bloom_gate_flags_cross_split_duplicates(spark, tmp_path):
    """A probe doc (doc_id % 3 == 0) whose text exists verbatim on the
    ingested side MUST be flagged — exercised explicitly since the
    driver corpus has no exact dup crossing the split."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (3, "same body of text here"),  # probe, dup of 4
        (4, "same body of text here"),  # ingested
        (6, "unique probe body"),  # probe, not a dup
        (7, "another ingested body"),
    ]
    table = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string()),
            "lang": pa.array(["en"] * 4, pa.string()),
            "source": pa.array(["t"] * 4, pa.string()),
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    rows = {
        r.doc_id: r
        for r in q_bloom_dedup_gate(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {3, 6}
    assert rows[3].is_dup and rows[3].bloom_hit and rows[3].sound
    assert not rows[6].is_dup and rows[6].sound


def test_bloom_bits_side_is_broadcast(spark):
    """The set-bit table is bounded by the filter geometry, never by
    corpus size — the membership join must be a broadcast join, not a
    shuffle of the probe side."""
    plan = explain_str(q_bloom_dedup_gate(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert not has_cartesian(q_bloom_dedup_gate(spark, SF_SMOKE))


def test_bm25_ranking_contract(spark):
    rows = q_bm25_search(spark, SF_ORACLE).orderBy("rank").collect()
    assert 0 < len(rows) <= BM25_TOP_K
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score_micro for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_bm25_filters_before_shuffle(spark):
    """BM25 must never shuffle the corpus: tf is per-row array work
    and corpus stats fold to one broadcast row, so the only
    exchanges allowed are the single-row stats aggregation (and
    nothing corpus-wide — TakeOrdered is exchange-free)."""
    from jaws_effective_processor_spark.plans import shuffle_count

    df = q_bm25_search(spark, SF_SMOKE)
    plan = explain_str(df)
    assert shuffle_count(df) <= 2, plan
    # term df and corpus totals ride broadcasts, not shuffles
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_registered_and_oracle_backed():
    for name in (
        "gopher_quality",
        "block_dedup",
        "dup_gram_coverage",
        "bloom_dedup_gate",
        "bm25_search",
        "lineitem_cube",
        "customer_value_bands",
    ):
        assert name in QUERIES


def test_bpe_pair_counts_contract(spark):
    from jaws_effective_processor_spark.functions.tokenizer import (
        BPE_TOP_PAIRS,
        q_bpe_pair_counts,
    )

    rows = q_bpe_pair_counts(spark, SF_ORACLE).orderBy("rank").collect()
    assert 0 < len(rows) <= BPE_TOP_PAIRS
    counts = [r.n_pairs for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.n_pairs > 0 for r in rows)
    # total pair mass conservation: the OPERATOR's aggregate must sum
    # to sum(max(n_tok - 1, 0)) over the corpus — read the aggregate
    # under test, not a re-derivation of the same transform
    from pyspark.sql import functions as SF
    from jaws_effective_processor_spark.functions.tokenizer import (
        _pair_count_table,
    )
    from jaws_effective_processor_spark.tables import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    expected = docs.select(
        SF.greatest(
            SF.size(SF.split("text", " ")) - 1, SF.lit(0)
        ).alias("n")
    ).agg(SF.sum("n")).collect()[0][0]
    total = (
        _pair_count_table(spark, SF_ORACLE)
        .agg(SF.sum("n_pairs"))
        .collect()[0][0]
    )
    assert total == expected


def test_embedding_outliers_contract(spark):
    from jaws_effective_processor_spark.functions.similarity import (
        OUTLIER_K,
        q_embedding_outliers,
    )

    rows = q_embedding_outliers(spark, SF_ORACLE).orderBy("rank").collect()
    assert len(rows) == OUTLIER_K
    dists = [r.dist_sq for r in rows]
    assert dists == sorted(dists, reverse=True)
    assert all(d >= 0 for d in dists)


def test_exact_substring_spans_merge_semantics(spark, tmp_path):
    """Pins the gaps-and-islands span reconstruction on a
    hand-computed corpus: a 10-token run shared by docs 1+2 yields
    three overlapping duplicated 8-windows that MERGE into one
    10-token span; an 8-token run shared by docs 1+3 is a single
    window = an 8-token span; the two spans in doc 1 stay separate
    islands (gap > EXSUB_K); a run repeated only WITHIN doc 4 is
    cross-document-invisible (doc_repetition's signal, not this
    one's)."""
    from jaws_effective_processor_spark.functions.filtering import (
        q_exact_substring_spans,
    )

    s = [f"s{i}" for i in range(10)]  # shared docs 1+2
    t = [f"t{i}" for i in range(8)]  # shared docs 1+3
    r = [f"r{i}" for i in range(8)]  # repeated inside doc 4 only
    docs = [
        (1, " ".join([f"u{i}" for i in range(4)] + s
                     + [f"v{i}" for i in range(5)] + t)),
        (2, " ".join([f"w{i}" for i in range(3)] + s)),
        (3, " ".join(t + [f"x{i}" for i in range(6)])),
        (4, " ".join(r + ["m0"] + r)),
    ]
    sf = str(tmp_path)
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{sf}/documents.parquet"
    )
    rows = {
        row.doc_id: row
        for row in q_exact_substring_spans(spark, sf).collect()
    }
    assert set(rows) == {1, 2, 3}
    d1 = rows[1]
    assert (d1.n_tokens, d1.n_dup_spans, d1.dup_tokens) == (27, 2, 18)
    assert d1.max_span_tokens == 10 and d1.dup_permille == 666
    d2 = rows[2]
    assert (d2.n_tokens, d2.n_dup_spans, d2.dup_tokens) == (13, 1, 10)
    d3 = rows[3]
    assert (d3.n_tokens, d3.n_dup_spans, d3.dup_tokens) == (14, 1, 8)

    # the CUT action on the same fixture, fingerprints hand-computed:
    # every duplicated span removed from every doc, untouched docs
    # pass through whole
    import hashlib

    from jaws_effective_processor_spark.functions.filtering import (
        q_exact_substring_cut,
    )

    def fp(tokens):
        return hashlib.md5(" ".join(tokens).encode()).hexdigest()

    cut = {
        row.doc_id: row for row in q_exact_substring_cut(spark, sf).collect()
    }
    assert set(cut) == {1, 2, 3, 4}
    assert (cut[1].kept_tokens, cut[1].cut_tokens) == (9, 18)
    assert cut[1].kept_fp == fp(
        [f"u{i}" for i in range(4)] + [f"v{i}" for i in range(5)]
    )
    assert cut[2].kept_fp == fp([f"w{i}" for i in range(3)])
    assert cut[3].kept_fp == fp([f"x{i}" for i in range(6)])
    # within-doc-only repetition is not cut
    assert cut[4].cut_tokens == 0 and cut[4].kept_fp == fp(
        r + ["m0"] + r
    )


def test_exact_substring_spans_consistent_with_gram_coverage(spark):
    """Cross-operator invariants at SF_ORACLE: a doc owns a
    duplicated span IFF it owns a duplicated distinct gram (both
    operators read the same dup definition off the same cached gram
    table), spans stay within the doc (dup_tokens <= n_tokens), and
    every span is at least window-width."""
    from jaws_effective_processor_spark.functions.filtering import (
        EXSUB_K,
        q_exact_substring_spans,
    )

    spans = {
        r.doc_id: r for r in q_exact_substring_spans(spark, SF_ORACLE).collect()
    }
    assert spans
    cov = {
        r.doc_id
        for r in q_dup_gram_coverage(spark, SF_ORACLE).collect()
        if r.n_dup_grams > 0
    }
    assert set(spans) == cov
    for r in spans.values():
        assert EXSUB_K <= r.max_span_tokens <= r.dup_tokens <= r.n_tokens
        assert 0 < r.dup_permille <= 1000

    # the cut action is exactly the spans report applied: every doc
    # present, kept + cut == total, and cut_tokens equals the report's
    # dup_tokens (0 for span-free docs)
    from jaws_effective_processor_spark.functions.filtering import (
        q_exact_substring_cut,
    )

    cut = {
        r.doc_id: r for r in q_exact_substring_cut(spark, SF_ORACLE).collect()
    }
    assert set(spans) <= set(cut)
    for doc_id, r in cut.items():
        assert r.kept_tokens + r.cut_tokens == r.n_tokens
        expected = spans[doc_id].dup_tokens if doc_id in spans else 0
        assert r.cut_tokens == expected, (doc_id, r.cut_tokens, expected)

"""Physical-plan discipline tests (the properties that matter at 100 TB).

The small-SF oracle tests prove correctness; these prove the PLANS are
the ones we'd want on a 1000-executor cluster: filters and pruning
reach the parquet scans, small dimensions broadcast, aggregations are
single-shuffle with map-side partials, and nothing degenerates into a
cartesian product.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark.entry_queries import QUERIES
from jaws_effective_processor_spark.plans import (
    broadcast_join_count,
    explain_str,
    has_cartesian,
    pushed_filters,
    read_schemas,
    shuffle_count,
    trivial_join_conditions,
)
from tests.conftest import SF_SMOKE


def _rides_partial_topk(plan: str) -> bool:
    """r14 opt round witness that a ranking rides partial_topk's
    scale guarantee: Spark 3.5+'s InsertWindowGroupLimit plans the
    rank<=k filter as a WindowGroupLimit pair — PARTIAL mode before
    the window's exchange (the map-side per-input-partition top-k
    prune), FINAL after — so no reducer ever sorts a corpus-sized
    per-query partition. (The pre-r14 witness was the staged _tk_pid
    column of the manual two-level scheme this replaced; see
    test_similarity.py::test_partial_topk_plans_partial_group_limit
    for the focused pin.)"""
    return "WindowGroupLimit" in plan and ", Partial" in plan


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_cartesian_products(spark, name):
    """No registered query may plan a non-broadcast cartesian product —
    per-key quadratic work is the one unrecoverable failure at scale."""
    assert not has_cartesian(QUERIES[name](spark, SF_SMOKE)), name


# Machine-checked shuffle CEILINGS for EVERY registered query —
# PLANS.md's narrative as enforcement: a rewrite that quietly adds an
# exchange to any of these fails here, not in a round-over-round
# bench diff. Land-with-budget rule (PLANS.md round-11): every NEW
# registered query gets its ceiling the round it lands.
# Counts are the steady-state serving shape (session artifacts appear
# as InMemoryRelation, whose internal exchanges shuffle_count
# excludes; extra caching can only lower a count, never raise it —
# genuinely true since r12's JVM-tree shuffle_count: the old
# explain-text strip leaked cached-build exchanges once an unrelated
# artifact materialized, which is why several pre-r12 ceilings were
# inflated — pq_train_round's old 740 was pure leak; ceilings are the
# FRESH-session worst case, since caching only lowers them).
_SHUFFLE_BUDGETS = {
    "activation_transitions": 1,
    "alarm_snapshot_cdc": 2,
    "ann_cell_balance": 3,
    # r14 opt (member-coarse artifact batch): the rn<=SPILL_ASSIGN
    # ranked x codes layout and the trained query LUTs are session
    # artifacts ('pqm_codes'/'kraw_codes'/'pq_qluts') — the
    # per-execution broadcast-build joins left the plans, tightening
    # the whole member/raw family's ceilings by 1-2 each
    "ann_ivfpq": 1,
    "ann_ivfpq_refined": 2,
    "ann_ivfpq_residual": 2,
    "ann_ivfpq_kmeans": 2,
    "ann_serve": 2,  # == ann_ivfpq_kmeans by construction (the r14 shipped default)
    "ann_ivfpq_spill": 3,
    "ann_ivfpq_spill_kmeans": 3,
    "ann_ivfpq_spill_residual": 3,
    "ann_joint_tuning": 7,
    "ann_kmeans_tuning": 6,
    "ann_coarse_cost": 6,
    "ann_residual_recall": 9,  # 2x2x2 grid: ONE rank-retaining ADC pass per (coarse, codes) family, union-keyed shortlist, ONE shared exact stage
    "ann_spill_tuning": 6,
    "pq_residual_diagnosis": 6,
    "ann_pq_recall": 5,
    "ann_probe_curve": 7,
    "ann_recall": 5,
    "ann_refine_curve": 8,
    "ann_refine_recall": 6,
    "approx_distinct": 6,
    "approx_percentiles": 2,
    "asof_last_purchase": 2,
    "best_of_source": 2,
    "bigram_pmi": 1,
    "block_dedup": 2,
    "bloom_dedup_gate": 3,
    "bm25_search": 1,
    "bpe_merge_round": 1,
    "bpe_pair_counts": 0,
    # r14 opt: 2 -> 1 (hits-only inner join + scan-local size(grams);
    # the one exchange is the hit-row doc regroup)
    "contamination": 1,
    "context_length_report": 2,
    "corpus_mixture": 2,
    "corpus_split": 2,
    "curation_funnel": 2,
    "customer_order_windows": 1,
    "customer_value_bands": 1,
    "decontaminate": 0,
    "dedup_cluster_sizes": 2,
    "dedup_clusters": 0,
    "dedup_exact": 1,
    # r15 (VERDICT r14 item 4): 1 -> 2 — the r14 per-doc result-table
    # cache was a memoised timed body; the per-doc scoring (one
    # doc-agg exchange off the cached LM count tables) now runs per
    # execution, then the per-lang ntile window (the final
    # (lang, bucket) agg rides the window's partitioning)
    "ccnet_buckets": 2,
    "dedup_keep": 2,
    "dedup_keep_best": 3,  # members-only cluster window + scoring scans; corpus never shuffles
    "dedup_minhash_lsh": 1,
    "dedup_ngram_jaccard": 0,
    "dedup_normalized": 1,
    "dedup_simhash": 0,
    "dedup_simhash_pairs": 1,
    "dedup_threshold_curve": 3,
    "distinct_counts": 7,
    "doc_chunks": 0,
    "doc_embedding_norms": 1,
    "doc_fingerprint": 0,
    "doc_length_deciles": 1,
    "doc_repetition": 0,
    "dsir_mixture_shift": 3,
    "dsir_resample": 0,
    "dsir_weights": 0,
    "dup_gram_coverage": 1,  # r15: broadcast join vs the cached dup-gram index + ONE doc regroup (was 2)
    "effective_alarms": 0,
    "effective_alarms_nested": 0,
    "effective_notifications": 0,
    "effective_notifications_nested": 0,
    "effective_registrations": 1,
    "effective_registrations_nested": 1,
    "effective_state_history": 0,
    "effective_state_history_nested": 0,
    "embedding_neardup": 1,
    "embedding_outliers": 2,
    "embedding_quantize": 0,
    "event_funnel": 5,
    # r15 (VERDICT r14 item 4): the islands result-table cache is
    # reverted — the hit join + island windows price per execution
    # over the cached INDEX artifacts (pos_grams/dup_grams). spans
    # tightens 2 -> 1: its per-doc agg rides the island window's
    # doc_id exchange now that the chain plans as one query.
    "exact_substring_cut": 2,
    "exact_substring_spans": 1,
    "event_type_pivot": 2,
    "event_type_unpivot": 2,
    "events_daily": 1,
    "events_debounce": 1,
    "events_rollup_multires": 1,
    "events_sessionization": 1,
    "fuzzy_name_pairs": 1,
    "gopher_quality": 0,
    "hard_negatives": 5,
    "heavy_hitters": 2,
    "importance_resampling": 0,
    "incremental_effective_alarms": 6,
    "intermediate_monolog_nested": 0,
    "inverted_index": 1,
    "json_array_functions": 0,
    "keyword_topk": 1,
    "kmeans_assign": 0,
    "kmeans_balanced_sample": 4,
    "kmeans_centroid_shift": 7,
    "kmeans_label_purity": 2,
    "kmeans_report": 1,
    "knn_bruteforce": 0,
    "knn_ivf": 2,
    "knn_ivf_multiprobe": 2,
    "knn_label_vote": 2,
    "knn_lsh": 2,
    "language_confusion": 2,
    "language_id": 0,
    "latch_overrides": 0,
    "lineitem_cube": 1,
    "lineitem_rollup": 1,
    "mask_overrides": 2,
    "media_dedup_keep": 2,
    "media_neardup": 1,
    "merge_upsert": 1,
    "minhash_band_stats": 2,
    "minhash_calibration": 1,
    "mixture_rebalance": 2,
    "mixture_temperature": 2,
    "multimodal_features": 0,
    "multimodal_frames": 0,
    "multimodal_meta": 0,
    "nearest_neighbor_jaccard": 1,
    # r15 (VERDICT r14 item 4): 0 -> 1 — the r14 per-doc result-table
    # cache made the timed body a memoised select; the scoring's one
    # doc-agg exchange is back in the per-execution plan (the LM
    # count tables it reads stay cached — those are the trained
    # artifacts)
    "ngram_lm_bits": 1,
    "ondelay_expirations": 2,
    "ondelay_overrides": 1,
    "oneshot_tombstones": 0,
    "order_percentiles": 1,
    "order_priority": 1,
    "override_set": 3,
    "pack_sequences": 1,
    # r14 opt: 4 -> 1 on the literal-vocab probe path (scan-local
    # tokenization + inlined pack window; the lang window is the one
    # exchange and the final regroup rides its partitioning). The
    # over-bound-vocab fallback keeps the old 4-exchange join plan,
    # but the ceiling pins the probe path the test fixtures take.
    "packed_token_ids": 1,
    "packing_report": 1,
    "parts_above_brand_avg": 1,
    "parts_without_orders": 1,
    "phrase_search": 0,
    "pii_redact": 0,
    "pii_scan": 0,
    "pq_quantize": 0,
    "pq_train_round": 2,  # the statically-rendered Lloyd training chain (runs once per corpus snapshot; SERVING reads the shipped codebook at pq_quantize's 0)
    "pq_train_trace": 4,
    "pricing_summary": 1,
    "quality_calibration": 2,
    "quality_logit": 1,
    "quality_score": 0,
    "rag_bucket_report": 2,
    "range_copurchase": 1,
    "registration_scd2": 1,
    "revenue_by_nation": 1,
    "scalar_functions": 0,
    "segment_custkeys_setops": 3,
    "semdedup_keep": 2,
    "shard_skew_report": 2,
    "shelve_expirations": 2,
    "source_overlap": 5,
    "source_quality_report": 2,
    "split_leakage": 1,
    "stopword_candidates": 2,
    "stratified_sample": 0,
    "text_stats": 0,
    "token_counts": 0,
    "token_entropy": 1,
    "token_rarity": 1,
    "tokenizer_fertility": 1,
    "top_customers": 1,
    "top_orders_per_customer": 1,
    "unigram_surprisal": 2,
    "user_retention_cohorts": 3,
    "vocab_coverage": 1,
    "vocab_topk": 0,
}


def test_shuffle_budgets_cover_registry():
    """The land-with-budget rule, mechanically: EVERY registered
    query carries an exchange ceiling, and no ceiling outlives its
    query — registering a query without one fails here the day it
    lands, not in a verdict diff."""
    assert set(_SHUFFLE_BUDGETS) == set(QUERIES), (
        sorted(set(QUERIES) - set(_SHUFFLE_BUDGETS)),
        sorted(set(_SHUFFLE_BUDGETS) - set(QUERIES)),
    )


@pytest.mark.parametrize("name", sorted(_SHUFFLE_BUDGETS))
def test_shuffle_budgets(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    got = shuffle_count(df)
    assert got <= _SHUFFLE_BUDGETS[name], (name, got)
    # self-join hygiene, registry-wide (r13 verdict item 7): no
    # predicate anywhere in the analyzed plan compares an attribute
    # to ITSELF — the trivially-true class commit 603dc64 fixed at
    # eight ADC cell-join sites must not silently return. Piggybacks
    # on the already-built plan, so the whole registry is covered at
    # zero extra plan-build cost.
    assert trivial_join_conditions(df) == [], name


def test_trivial_join_detector_catches_the_class(spark):
    """The detector itself: a predicate comparing an attribute to
    itself is reported from BOTH surfaces it can land on (join
    condition, filter), survives conjunction with genuine
    predicates, and is NOT triggered by a sound equi-join. Guards
    the guard: SimplifyBinaryComparison erases `a = a` from the
    physical plan (rewriting it to isnotnull), so a detector walking
    the wrong plan level would pass everything silently."""
    a = spark.range(10).withColumn("k", F.col("id") % 3)
    b = (
        a.groupBy("k")
        .agg(F.count("*").alias("n"))
        .select(F.col("k").alias("k2"), "n")
    )
    bad_join = a.join(b, F.col("k") == F.col("k"))
    assert trivial_join_conditions(bad_join) == ["Join: (k = k)"]
    bad_filter = a.filter(F.col("k") == F.col("k"))
    assert trivial_join_conditions(bad_filter) == ["Filter: (k = k)"]
    conjoined = a.join(
        b, (F.col("k") == F.col("k2")) & (F.col("k") == F.col("k"))
    )
    assert trivial_join_conditions(conjoined) == ["Join: (k = k)"]
    sound = a.join(b, F.col("k") == F.col("k2"))
    assert trivial_join_conditions(sound) == []


def test_revenue_join_strategy(spark):
    """Star join: all four dims broadcast, lineitem never shuffles for
    the joins — the only exchange is the final aggregation."""
    df = QUERIES["revenue_by_nation"](spark, SF_SMOKE)
    assert broadcast_join_count(df) >= 4
    assert shuffle_count(df) == 1


def test_dsir_weights_two_exchanges(spark, tmp_path):
    """DSIR hashed features: exactly the bounded bucket aggregation +
    the doc-keyed aggregation — the bounded stats table joins back by
    BROADCAST (DSIR's whole point: 2^16 buckets stay broadcastable at
    any corpus size, never a vocab-sized shuffle join). Inspects the
    RAW weight-plan builder through a SYMLINKED data dir: df.cache()
    registers plans in Spark's CacheManager at build time, so once any
    earlier test has touched the 'dsir_weights' artifact for this
    path, an identical fresh plan is silently substituted with the
    InMemoryRelation and would count 0 exchanges — distinct scan
    paths defeat the substitution and expose the honest plan."""
    from jaws_effective_processor_spark.functions.corpus import (
        _build_dsir_weights,
    )

    link = tmp_path / "sfdata"
    link.symlink_to(SF_SMOKE)
    df = _build_dsir_weights(spark, str(link))
    assert shuffle_count(df) == 2
    assert broadcast_join_count(df) >= 1


def test_media_neardup_single_band_exchange(spark):
    """Perceptual-hash candidates: ONE exchange (the banded
    candidate/verify path over the cached phash table) and the
    doc->media join broadcasts — never an all-pairs compare."""
    from jaws_effective_processor_spark.functions.multimodal import (
        q_media_neardup,
    )

    df = q_media_neardup(spark, SF_SMOKE)
    assert shuffle_count(df) == 1
    assert broadcast_join_count(df) >= 1


def test_events_debounce_single_window_exchange(spark):
    """Debounce is one (user, event_type) hash exchange for the lag
    window — the same partitioning the sessionizer uses."""
    from jaws_effective_processor_spark.relational import (
        q_events_debounce,
    )

    df = q_events_debounce(spark, SF_SMOKE)
    assert shuffle_count(df) == 1
    assert broadcast_join_count(df) == 0


def test_pq_quantize_scan_local(spark):
    """PQ coding is entirely scan-local: the codebook folds into
    literal expressions, so the plan has ZERO exchanges and no join —
    the shape that codes 100 TB partition-parallel. Built from the RAW
    query function (the registry's plan cache would hand back an
    AQE-finalized plan)."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_pq_quantize,
    )

    df = q_pq_quantize(spark, SF_SMOKE)
    assert shuffle_count(df) == 0
    assert broadcast_join_count(df) == 0


def test_pq_quantize_plan_build_bounded(spark):
    """The round-8 Catalyst-analysis pathology pin: with the coder's
    per-subspace transform-lambda form, ANALYSIS of a fresh coding
    plan at M=8/K=16 stays bounded (measured ~1.5 s; the old
    literal-argmin expression trees ran MINUTES at M=4/K=16, capping
    the design at K=8). Times with_pq_codes directly — codebook
    pre-collected, no cached frame in the way — so the bound is on
    plan build, not training jobs."""
    import time

    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions.similarity import (
        _pq_codebook,
        with_pq_codes,
    )
    from jaws_effective_processor_spark.tables import load_table

    cb = _pq_codebook(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    t0 = time.monotonic()
    df = with_pq_codes(emb, cb)
    _ = df.columns  # forces analysis
    assert time.monotonic() - t0 < 30.0


def test_brute_and_adc_topk_have_no_corpus_sized_window(spark):
    """The exact/ADC evaluation family ranks via partial_topk, so no
    single reducer ever sorts a corpus-sized per-query partition
    (round-8 verdict watch item). The plan-level witness is the
    Partial-mode WindowGroupLimit (the engine's map-side top-k prune;
    see _rides_partial_topk)."""
    from jaws_effective_processor_spark.functions.similarity import (
        _brute_neighbors,
        q_ann_pq_recall,
        q_knn_ivf,
        q_knn_ivf_multiprobe,
        q_knn_lsh,
    )
    from jaws_effective_processor_spark.plans.inspect import explain_str

    for df in (
        _brute_neighbors(spark, SF_SMOKE),
        q_ann_pq_recall(spark, SF_SMOKE),
        q_knn_lsh(spark, SF_SMOKE),
        q_knn_ivf(spark, SF_SMOKE),
        q_knn_ivf_multiprobe(spark, SF_SMOKE),
    ):
        assert _rides_partial_topk(explain_str(df))


def test_ann_ivfpq_broadcasts_query_side(spark):
    """IVFADC serving: the probe+LUT query side (N_QUERIES x
    IVF_NPROBE rows) is the broadcast relation; the code table
    streams partition-parallel past it, touching only the probed
    cells — the serve shape that scales to a 100 TB code store."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_ivfpq,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees
    from jaws_effective_processor_spark.plans.inspect import explain_str

    df = q_ann_ivfpq(spark, SF_SMOKE)
    subs = broadcast_subtrees(df)
    assert subs, "expected a broadcast of the probe/LUT query side"
    assert any("< 10" in s for s in subs), subs
    assert _rides_partial_topk(explain_str(df))  # partial_topk ranking


def test_ivfpq_refined_exact_stage_candidates_only(spark):
    """The refine stage (r10) is candidates-only: the exact cosine is
    computed through BROADCAST joins of the ADC shortlist
    (N_QUERIES x REFINE_K rows, keyed neighbor_id) and the query
    vectors into the raw-vector scan — the corpus is never
    exact-scored and never shuffles for the refine (a real deployment
    does k' point lookups; the broadcast-hash lookup is Spark's
    equivalent). Both ranking levels ride partial_topk
    (WindowGroupLimit witness), and nothing degenerates into a
    cartesian."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_ivfpq_refined,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    df = q_ann_ivfpq_refined(spark, SF_SMOKE)
    plan = explain_str(df)
    subs = broadcast_subtrees(df)
    # probe/LUT side (ADC stage) + shortlist + query vectors
    assert len(subs) >= 3, subs
    # the exact stage's candidate lookup is a hash join keyed on
    # neighbor_id (the shortlist side broadcast — it appears among the
    # broadcast subtrees above, and no SortMergeJoin exists here)
    assert "Left keys [1]: [neighbor_id" in plan
    assert "SortMergeJoin" not in plan
    assert not has_cartesian(df)
    assert _rides_partial_topk(plan)  # partial_topk at both ranking levels


def test_probe_curve_exact_stage_candidates_only(spark):
    """The nprobe sweep keeps the refine stage's candidates-only
    property: the (nprobe, query) x REFINE_K shortlist BROADCASTS
    into the raw-vector scan keyed on neighbor_id (the corpus is
    never exact-scored at any swept setting), the corpus is
    ADC-scored ONCE at exhaustive routing (probe ranks retained, each
    swept nprobe a filter — the plan has exactly one cell equi-join
    against a broadcast probe/LUT side), and both ranking levels ride
    partial_topk."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_probe_curve,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    df = q_ann_probe_curve(spark, SF_SMOKE)
    plan = explain_str(df)
    subs = broadcast_subtrees(df)
    assert len(subs) >= 3, subs
    assert "Left keys [1]: [neighbor_id" in plan
    assert not has_cartesian(df)
    assert _rides_partial_topk(plan)


def test_joint_tuning_exact_stage_candidates_only(spark):
    """The joint (nprobe x k') surface keeps BOTH sweep tricks at
    once and stays candidates-only: the corpus is ADC-scored ONCE at
    exhaustive routing (each swept nprobe a probe-rank filter), the
    max-k' shortlist retains its ADC rank so every smaller k' is a
    rank filter (the refine-curve trick per routing setting), and the
    exact stage is the broadcast lookup keyed on neighbor_id — the
    corpus is never exact-scored at any of the |grid| settings."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_joint_tuning,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    df = q_ann_joint_tuning(spark, SF_SMOKE)
    plan = explain_str(df)
    subs = broadcast_subtrees(df)
    assert len(subs) >= 3, subs
    assert "Left keys [1]: [neighbor_id" in plan
    assert not has_cartesian(df)
    assert _rides_partial_topk(plan)


def test_spill_exact_stage_candidates_only(spark):
    """The multi-assignment serve path keeps the refine discipline:
    the shortlist BROADCASTS into the raw-vector scan keyed on
    neighbor_id (raw vectors are fetched by id — NOT duplicated the
    way the code rows are), no cartesian, both ranking levels on
    partial_topk."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_ivfpq_spill,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    df = q_ann_ivfpq_spill(spark, SF_SMOKE)
    plan = explain_str(df)
    subs = broadcast_subtrees(df)
    assert len(subs) >= 3, subs
    assert "Left keys [1]: [neighbor_id" in plan
    assert not has_cartesian(df)
    assert _rides_partial_topk(plan)


def test_spill_tuning_exact_stage_candidates_only(spark):
    """The (spill x nprobe) surface scores the spill code layout ONCE
    with both sweep ranks retained (every grid point a filter over
    one cell equi-join against the broadcast probe/LUT side), dedupes
    per grid point, and keeps the exact stage candidates-only — no
    SortMergeJoin, no cartesian, partial_topk at both ranking
    levels."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_spill_tuning,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    df = q_ann_spill_tuning(spark, SF_SMOKE)
    plan = explain_str(df)
    subs = broadcast_subtrees(df)
    assert len(subs) >= 3, subs
    assert "Left keys [1]: [neighbor_id" in plan
    assert "SortMergeJoin" not in plan
    assert not has_cartesian(df)
    assert _rides_partial_topk(plan)


def test_residual_exact_stage_candidates_only(spark):
    """The residual (classic-IVFADC) serve paths keep every r10-r11
    plan discipline: the exact stage is the candidates-only broadcast
    lookup keyed on neighbor_id (raw vectors fetched by id — residual
    CODES are per-cell, vectors are not duplicated), the ADC stage is
    a cell equi-join against the broadcast probes x (query, cell) LUT
    side, no SortMergeJoin, no cartesian, both ranking levels on
    partial_topk — for the single-assignment path, the spill path,
    and the 2x2 recall grid that composes all four serve paths."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_ivfpq_residual,
        q_ann_ivfpq_spill_residual,
        q_ann_residual_recall,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    for fn in (
        q_ann_ivfpq_residual,
        q_ann_ivfpq_spill_residual,
        q_ann_residual_recall,
    ):
        df = fn(spark, SF_SMOKE)
        plan = explain_str(df)
        subs = broadcast_subtrees(df)
        assert len(subs) >= 3, (fn.__name__, subs)
        assert "Left keys [1]: [neighbor_id" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
        assert not has_cartesian(df), fn.__name__
        assert _rides_partial_topk(plan), fn.__name__


def test_kmeans_coarse_exact_stage_candidates_only(spark):
    """The trained-k-means coarse serve paths (r13) inherit every
    plan discipline of the member family: routing is one broadcast
    centroid join (the K x DIM trained codebook, never the corpus),
    the ADC stage is a cell equi-join against the broadcast probes x
    (query, cell) LUT side, the exact stage is the candidates-only
    broadcast lookup keyed on neighbor_id, no SortMergeJoin, no
    cartesian, partial_topk at both ranking levels."""
    from jaws_effective_processor_spark.functions.similarity import (
        q_ann_ivfpq_kmeans,
        q_ann_ivfpq_spill_kmeans,
        q_ann_serve,
    )
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    for fn in (q_ann_ivfpq_kmeans, q_ann_ivfpq_spill_kmeans, q_ann_serve):
        df = fn(spark, SF_SMOKE)
        plan = explain_str(df)
        subs = broadcast_subtrees(df)
        assert len(subs) >= 3, (fn.__name__, subs)
        assert "Left keys [1]: [neighbor_id" in plan, fn.__name__
        assert "SortMergeJoin" not in plan, fn.__name__
        assert not has_cartesian(df), fn.__name__
        assert _rides_partial_topk(plan), fn.__name__


def test_scan_local_queries_stay_in_codegen(spark):
    """The zero-exchange scan-local family must render whole-stage-
    codegen spans — the JVM-generated-code property that makes the
    hot path cheap at 100 TB (a CodegenFallback collapse to fully
    interpreted projection would pass every correctness test and
    silently cost 2-10x at scale). Only zero-exchange plans are
    pinned: AQE's isFinalPlan=false rendering hides the markers for
    any plan with an exchange, so absence there is a rendering
    artifact, not a regression (verified r10: pii_redact's projection
    codegens in isolation)."""
    from jaws_effective_processor_spark.plans import (
        whole_stage_codegen_ids,
    )

    for name in (
        "pq_quantize",
        "quality_score",
        "gopher_quality",
        "text_stats",
        "stratified_sample",
    ):
        ids = whole_stage_codegen_ids(QUERIES[name](spark, SF_SMOKE))
        assert ids, name


def test_pricing_summary_pushdown(spark):
    """The shipdate predicate reaches the parquet scan (PushedFilters)
    and column pruning drops unused lineitem columns (ReadSchema)."""
    df = QUERIES["pricing_summary"](spark, SF_SMOKE)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed
    schemas = read_schemas(df)
    assert schemas and all("l_comment" not in s for s in schemas)
    assert shuffle_count(df) == 1  # single agg shuffle, partials map-side


def test_transitions_single_shuffle(spark):
    """T1 (lag per key) is one hash-partition exchange on the alarm
    name — the same partitioning the streaming state store would use."""
    df = QUERIES["activation_transitions"](spark, SF_SMOKE)
    assert shuffle_count(df) == 1


def test_ngram_jaccard_is_equijoin(spark):
    """The banded self-join must plan as an equi-join (hash/SMJ or
    broadcast at tiny SF) — never nested-loop over the corpus."""
    df = QUERIES["dedup_ngram_jaccard"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_partial_aggregation_before_shuffle(spark):
    """Aggregations keep map-side partials (partial_sum/count before
    the exchange) so the shuffle moves pre-combined rows."""
    df = QUERIES["pricing_summary"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "partial_sum" in plan or "partial_count" in plan


def test_effective_pipeline_shuffles_bounded(spark):
    """The flagship monolog pipeline: compactions + pivot + windows,
    all keyed by alarm name. The shuffle count must stay bounded (each
    is one hash exchange on a high-cardinality uniform key)."""
    df = QUERIES["effective_alarms"](spark, SF_SMOKE)
    assert shuffle_count(df) <= 6
    assert not has_cartesian(df)


def test_history_replay_shuffles_bounded(spark):
    """The per-event history replay is two hash exchanges on the alarm
    key (activation lag window + merged-changelog window) — no join
    shuffle, no cartesian."""
    df = QUERIES["effective_state_history"](spark, SF_SMOKE)
    assert shuffle_count(df) <= 2
    assert not has_cartesian(df)


def test_asof_join_shuffles_bounded(spark):
    """asof_join = union + one window on the key; with the right-side
    pre-aggregation that is two keyed exchanges total."""
    df = QUERIES["asof_last_purchase"](spark, SF_SMOKE)
    assert shuffle_count(df) <= 2
    assert not has_cartesian(df)


def test_range_join_single_shuffle(spark):
    """The banded interval join is one equi-join exchange plus the
    final count aggregation — never a nested loop."""
    df = QUERIES["range_copurchase"](spark, SF_SMOKE)
    assert not has_cartesian(df)
    plan = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_knn_bruteforce_broadcasts_query_side(spark):
    """The 10-row query set is the broadcast relation; the corpus must
    stream partition-parallel. Broadcasting the corpus would ship the
    whole table to every task — impossible at 100 TB."""
    from jaws_effective_processor_spark.plans import broadcast_subtrees

    df = QUERIES["knn_bruteforce"](spark, SF_SMOKE)
    subs = broadcast_subtrees(df)
    assert subs, "expected a broadcast of the query side"
    for sub in subs:
        # every broadcast subtree must carry the query filter, and the
        # unfiltered corpus scan must not appear under a broadcast
        assert "vec_id" in sub and "< 10" in sub, sub


def test_simhash_pairs_banded_equijoin(spark):
    """SimHash pair generation must plan as an equi-join on the band
    key — never an all-pairs product over signatures."""
    df = QUERIES["dedup_simhash_pairs"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_nested_outputs_reuse_flat_partitioning(spark):
    """The nested-struct queries add only name-keyed joins on top of
    the flat pipeline — no cartesian products, bounded exchanges."""
    for name in (
        "effective_alarms_nested",
        "intermediate_monolog_nested",
    ):
        df = QUERIES[name](spark, SF_SMOKE)
        assert not has_cartesian(df), name
        # flat pipeline is <=6 exchanges; payload joins may add a few
        # keyed exchanges but must not blow up
        assert shuffle_count(df) <= 12, (name, shuffle_count(df))


def test_nested_history_no_extra_shuffles(spark):
    """The per-event nested history recovers all payloads from the
    SAME merged-changelog window pass as the flat history — payload
    windows must not add exchanges."""
    from jaws_effective_processor_spark.pipeline import (
        effective_state_history,
    )

    flat = effective_state_history(spark, SF_SMOKE)
    nested = QUERIES["effective_state_history_nested"](spark, SF_SMOKE)
    assert shuffle_count(nested) == shuffle_count(flat), (
        shuffle_count(nested),
        shuffle_count(flat),
    )


def test_embedding_neardup_reuses_cached_signatures(spark):
    """The LSH band self-join must read the session-cached signature
    frame on BOTH sides (InMemoryRelation), not re-run the Arrow
    signature stage per join input — the signature scan is the
    dominant cost of the query and runs once per (session, sf_dir).
    The candidate re-score runs in Catalyst (r14 opt round): NO live
    Python stage remains in the query body — the only MapInPandas
    mentions are the sig_bands build repeated textually under the
    InMemoryTableScans, which executes only at cache build."""
    df = QUERIES["embedding_neardup"](spark, SF_SMOKE)
    plan = explain_str(df, "simple")
    assert plan.count("InMemoryTableScan") >= 2, plan
    assert plan.count("MapInPandas score") == 0, plan
    # every MapInPandas line is the cached signature build, none other
    for line in plan.splitlines():
        if "MapInPandas" in line:
            assert "sig_bands" in line, line


def test_keyword_topk_single_document_scan(spark):
    """keyword_topk derives df from the tf aggregate, so the physical
    plan reads the documents parquet exactly once (plus nothing else):
    a second exploded scan would double the dominant cost at scale."""
    df = QUERIES["keyword_topk"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert plan.count("documents.parquet") == 1, plan


def test_mixture_rebalance_doc_side_not_join_shuffled(spark):
    """The rebalance keep-filter applies on the scan side: the doc
    side must reach the rates join without an exchange keyed on lang
    (the rates side is a handful of rows — AQE broadcasts it)."""
    from jaws_effective_processor_spark.plans import explain_str as es

    df = QUERIES["mixture_rebalance"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()  # let AQE finalize
    plan = es(df)
    # the doc-side branch (the one carrying doc_id) must not hash-
    # partition on lang; the only lang exchange allowed is the tiny
    # per-language aggregate feeding the rates window
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower(), plan


def test_inverted_index_single_shuffle(spark):
    """token -> postings is one aggregation exchange over the exploded
    scan with partial_count map-side (collect_set carries no partial,
    but the count columns do — the exchange count is the invariant)."""
    df = QUERIES["inverted_index"](spark, SF_SMOKE)
    assert shuffle_count(df) <= 1, explain_str(df)


def test_retention_sets_no_extra_corpus_shuffle(spark):
    """dedup_keep / semdedup_keep anti-join the (small) non-canonical
    member set against the base scan; the base side must not plan a
    cartesian and the pair pipeline's shuffles are the cached
    component loop's, not per-query corpus exchanges."""
    for name in ("dedup_keep", "semdedup_keep"):
        df = QUERIES[name](spark, SF_SMOKE)
        assert not has_cartesian(df), name


def test_gopher_quality_zero_shuffle(spark):
    """The rule filter is pure per-row expression work — the max token
    multiplicity comes from an array fold, not a groupBy — so the plan
    must contain NO exchange at all."""
    from jaws_effective_processor_spark.plans import shuffle_count

    assert shuffle_count(QUERIES["gopher_quality"](spark, SF_SMOKE)) == 0


def test_pii_redact_zero_shuffle(spark):
    from jaws_effective_processor_spark.plans import shuffle_count

    assert shuffle_count(QUERIES["pii_redact"](spark, SF_SMOKE)) == 0


def test_block_dedup_single_winner_exchange(spark):
    """Winner selection is ONE window exchange on the block hash plus
    the per-doc aggregation — never a groupBy+join-back that shuffles
    the block key twice."""
    from jaws_effective_processor_spark.plans import shuffle_count

    df = QUERIES["block_dedup"](spark, SF_SMOKE)
    assert shuffle_count(df) <= 3, explain_str(df)


def test_bm25_no_posting_explode(spark):
    """tf comes from per-row array counts: the plan must not contain a
    Generate (explode) node, and the only aggregations are the one-row
    stats fold and TakeOrdered."""
    df = QUERIES["bm25_search"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "Generate" not in plan, plan


def test_embedding_outliers_centroids_broadcast(spark):
    """The labels x dims centroid table must come back as a broadcast
    join — shuffling the exploded vector table against it would be a
    corpus-sized exchange for a tiny dimension side."""
    df = QUERIES["embedding_outliers"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan, plan


def test_merge_upsert_single_key_exchange(spark):
    """MERGE-as-compaction: union + one latest-wins window on the key;
    no join operator anywhere in the plan."""
    df = QUERIES["merge_upsert"](spark, SF_SMOKE)
    plan = explain_str(df)
    from jaws_effective_processor_spark.plans import shuffle_count

    assert "Join" not in plan, plan
    assert shuffle_count(df) == 1, plan


def test_phrase_search_zero_exchange_scan(spark):
    """phrase_search is scan-shaped: the occurrence count is a
    whole-stage-codegen string expression and the > 0 filter pushes
    to the scan stage — no exchange beyond the local-parallelism
    spread, no Generate, no join."""
    df = QUERIES["phrase_search"](spark, SF_SMOKE)
    plan = explain_str(df)
    assert "Generate" not in plan, plan
    assert "Join" not in plan, plan
    # sequence/element_at higher-order forms are CodegenFallback —
    # the shipped expression must not reintroduce them
    assert "lambdafunction" not in plan, plan


def test_quality_logit_reuses_tf_artifact_single_scan(spark):
    """quality_logit folds weights over the session-cached token_tf
    artifact: after any unigram-family query has run, its plan reads
    the cache, not a second documents scan."""
    QUERIES["keyword_topk"](spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()  # materialize the shared tf cache
    df = QUERIES["quality_logit"](spark, SF_SMOKE)
    plan = explain_str(df, mode="simple")
    assert "InMemoryTableScan" in plan, plan


def test_split_leakage_grams_move_once(spark):
    """split_leakage's only data-sized exchange is the gram-keyed
    bit_or aggregation (the mask and pair folds run over <= 7 rows);
    the cached gram-table build's exchanges don't count against the
    per-execution plan."""
    df = QUERIES["split_leakage"](spark, SF_SMOKE)
    assert shuffle_count(df) <= 3, explain_str(df)
    assert not has_cartesian(df)


def test_kmeans_assignment_is_scan_local(spark):
    """kmeans_assign's per-execution plan reads the chain-cached
    scored frame whose build computed the argmin SCAN-LOCALLY against
    the literal centroid matrix (r14 opt round, clustering._km_scored)
    — so the whole plan carries NO join and NO exchange at all. The
    r13 shape (broadcast centroid join + vec-keyed argmin window
    exchange) is superseded; never a shuffled join keyed on dim."""
    df = QUERIES["kmeans_assign"](spark, SF_SMOKE)
    df.write.format("noop").mode("overwrite").save()  # AQE final
    plan = explain_str(df)
    assert "Join" not in plan, plan
    assert "Exchange" not in plan, plan
    assert not has_cartesian(df)

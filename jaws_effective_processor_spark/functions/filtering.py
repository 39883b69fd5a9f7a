"""Corpus filtering / gating operators over `documents` — the
rule-based and membership-test passes between dedup and training:

- Gopher-style quality rules: per-doc token statistics folded into
  keep/drop rule booleans (length bounds, mean-token-length band,
  stopword floor, top-token-dominance cap) — the composite rule
  filter of Rae et al. (Gopher) / Penedo et al. (RefinedWeb),
  re-expressed on the whitespace-token corpus this testbed ships.
- Block-level exact dedup: corpus-wide dedup of non-overlapping
  token blocks (the tractable form of Lee et al.'s substring-level
  "Deduplicating Training Data" pass): first occurrence in global
  (doc_id, block_idx) order wins, later copies are dropped.
- Cross-doc duplicated-gram coverage: per doc, the share of its
  distinct 8-grams that also occur in ANY other document — the
  corpus-level twin of the intra-doc `doc_repetition` signal, and
  the continuous score behind block dedup's binary decision.
- Bloom-filter dedup gate: a deterministic Bloom membership test of
  new docs against the ingested partition's fingerprint set — the
  constant-space incremental-dedup gate a 100 TB pipeline runs
  before the expensive pairwise passes. The filter's bit set is a
  pure function of the data (k md5-derived positions in a 2^16-bit
  space), so the oracle reproduces it exactly, including the
  no-false-negative guarantee emitted as a checkable boolean.

Scale shapes:
- quality rules: ZERO shuffle — every statistic (including max token
  multiplicity, via a run-length fold over the per-doc sorted token
  array) is a per-row expression; at 100 TB this runs at parquet
  scan speed with pruning to (doc_id, text).
- block dedup: one explode + ONE winner-window exchange on the
  block hash — blocks move as narrow longs, never token text.
- gram coverage: reuses the session-cached contamination gram table;
  one window exchange on the gram hash, all longs.
- bloom gate: the bit set is bounded by the filter geometry (m=2^16
  positions) regardless of corpus size, so the membership join is a
  broadcast by construction — the entire point of the operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread_if_undersplit
from .corpus import CONTAM_MULT, CONTAM_P, _contam_gram_table
from .text import STOPWORDS

# ---------------------------------------------------------- quality
# Rule thresholds, calibrated so each rule discriminates on the
# synthetic corpus (sf0.01: token counts 10-99, stopword counts 0-10,
# top-token permille 51-300).
QUALITY_MIN_TOKENS = 20
QUALITY_MAX_TOKENS = 100_000
QUALITY_MIN_AVG_TOKEN_CENTI = 350  # mean token length >= 3.50 chars
QUALITY_MAX_AVG_TOKEN_CENTI = 700  # and <= 7.00 chars
QUALITY_MIN_STOPWORDS = 2
QUALITY_MAX_TOP_TOKEN_PERMILLE = 200  # no token > 20% of the doc

# ------------------------------------------------------ block dedup
BLOCK_TOKENS = 16  # non-overlapping block width, in tokens
# second-stream multiplier for the 64-bit block fingerprint (the
# first stream reuses CONTAM_MULT); any small prime != CONTAM_MULT
BLOCK_MULT2 = 137

# -------------------------------------------------------- bloom gate
BLOOM_BITS = 1 << 16  # m: filter positions
BLOOM_HASHES = 4  # k: md5-derived positions per fingerprint
BLOOM_INGESTED_MOD = 3  # doc_id % 3 != 0 -> already-ingested side


def _toks() -> F.Column:
    return F.split(F.col("text"), " ")


def with_gopher_stats(df: DataFrame) -> DataFrame:
    """Add the Gopher rule statistics + verdict columns to any frame
    with a `text` column — shared verbatim between the batch report
    (q_gopher_quality) and the streaming gate
    (streaming/ingest.gopher_gate_stream), so a document scores
    identically whichever path evaluated it. Stateless per-row
    expressions only, hence streaming-composable.

    The one statistic that naively wants a groupBy — the maximum
    multiplicity of any token — is computed per row as the longest
    run in the doc's sorted token array via an `F.aggregate` fold
    (run-length encoding of `array_sort`), keeping the whole operator
    embarrassingly parallel; per-doc cost is O(n log n) in bounded
    doc length, not a corpus-wide exchange.
    """
    tk = _toks()
    sorted_tk = F.array_sort(tk)
    zero = F.lit(0).cast("long")
    acc0 = F.struct(
        F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
    )

    def _merge(acc: F.Column, x: F.Column) -> F.Column:
        run = (
            F.when(x == acc["prev"], acc["run"] + F.lit(1).cast("long"))
            .otherwise(F.lit(1).cast("long"))
        )
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top_cnt = F.aggregate(sorted_tk, acc0, _merge, lambda a: a["best"])
    base = df.withColumns(
        {
            "n_tokens": F.size(tk).cast("long"),
            "_tok_chars": F.aggregate(
                F.transform(tk, lambda t: F.length(t).cast("long")),
                zero,
                lambda a, x: a + x,
            ),
            "n_stopwords": F.size(
                F.filter(tk, lambda t: t.isin(*STOPWORDS))
            ).cast("long"),
            "_top_cnt": top_cnt,
        }
    ).withColumns(
        {
            "avg_token_len_centi": F.expr(
                "(100 * _tok_chars) DIV n_tokens"
            ),
            "top_token_permille": F.expr(
                "(1000 * _top_cnt) DIV n_tokens"
            ),
        }
    )
    ok_len = (F.col("n_tokens") >= QUALITY_MIN_TOKENS) & (
        F.col("n_tokens") <= QUALITY_MAX_TOKENS
    )
    ok_tok = (
        F.col("avg_token_len_centi") >= QUALITY_MIN_AVG_TOKEN_CENTI
    ) & (F.col("avg_token_len_centi") <= QUALITY_MAX_AVG_TOKEN_CENTI)
    ok_stop = F.col("n_stopwords") >= QUALITY_MIN_STOPWORDS
    ok_top = F.col("top_token_permille") <= QUALITY_MAX_TOP_TOKEN_PERMILLE
    return base.withColumns(
        {
            "ok_length": ok_len,
            "ok_mean_token_len": ok_tok,
            "ok_stopwords": ok_stop,
            "ok_top_token": ok_top,
            "keep": ok_len & ok_tok & ok_stop & ok_top,
        }
    ).drop("_tok_chars", "_top_cnt")


GOPHER_STAT_COLS = (
    "n_tokens",
    "n_stopwords",
    "avg_token_len_centi",
    "top_token_permille",
    "ok_length",
    "ok_mean_token_len",
    "ok_stopwords",
    "ok_top_token",
    "keep",
)


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/RefinedWeb-style rule filter report: per-doc statistics
    and the keep decision, computed WITHOUT any shuffle (see
    with_gopher_stats — the same expressions gate the live stream).

    Deliberately NOT spread_if_undersplit (r14 opt round): a spread
    would halve the local warm time (0.40 -> 0.30 s, single-split
    scan), but this query is a member of the zero-exchange scan-local
    family whose whole-stage-codegen property is pinned by
    test_scan_local_queries_stay_in_codegen — the pin only renders
    for exchange-free plans, and keeping the codegen guard on the
    Gopher expression set (shared verbatim with the streaming gate)
    is worth more than 0.1 s of local wall."""
    docs = load_table(spark, sf_dir, "documents")
    return with_gopher_stats(docs).select("doc_id", *GOPHER_STAT_COLS)


def _block_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, block_idx, block_h): rolling-hash of each
    non-overlapping BLOCK_TOKENS-token block. One md5 per TOKEN
    (two independent 28-bit halves) then two integer folds per block
    — the same hash-once-fold-cheap discipline as
    `with_contam_grams`, so only narrow longs ever shuffle.

    Block identity is a ~62-bit fingerprint: two independent rolling
    folds mod CONTAM_P (multipliers CONTAM_MULT / BLOCK_MULT2 over
    the md5[1:7] / md5[8:14] token-hash streams) packed as
    f1 * 2^31 + f2. A single 31-bit fold birthday-collides at ~1e5
    blocks — far below corpus scale — while the packed pair pushes
    the 50% birthday bound to ~2^31 (~2e9) blocks. The oracle twin
    computes the identical fingerprint, so the hash check spans the
    full geometry."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    tk = _toks()
    tkh1 = F.transform(
        tk,
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("long"),
    )
    tkh2 = F.transform(
        tk,
        lambda t: F.conv(F.substring(F.md5(t), 8, 7), 16, 10).cast("long"),
    )
    staged = docs.select(
        "doc_id",
        F.size(tk).alias("_n_tok"),
        tkh1.alias("_tkh"),
        tkh2.alias("_tkh2"),
    )
    n_blocks = F.expr(f"(_n_tok + {BLOCK_TOKENS - 1}) DIV {BLOCK_TOKENS}")

    def _fold(col: str, i, mult: int):
        return F.aggregate(
            F.slice(F.col(col), i * BLOCK_TOKENS + 1, BLOCK_TOKENS),
            F.lit(0).cast("long"),
            lambda a, x: (a * mult + x) % CONTAM_P,
        )

    blocks = F.transform(
        F.sequence(F.lit(0), n_blocks - 1),
        lambda i: _fold("_tkh", i, CONTAM_MULT) * F.lit(2147483648)
        + _fold("_tkh2", i, BLOCK_MULT2),
    )
    return staged.select(
        "doc_id", F.posexplode(blocks).alias("block_idx", "block_h")
    )


def q_block_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact dedup of non-overlapping token blocks.

    For every block hash the FIRST occurrence in (doc_id, block_idx)
    order is kept; all later copies are dropped. Emits the per-doc
    retention report (the actionable output: how much of each doc
    survives substring-level dedup). Winner selection is ONE window
    pass partitioned on the block hash — a single exchange, where a
    groupBy-winners + join-back would shuffle the same key twice."""
    from pyspark.sql import Window

    blocks = _block_table(spark, sf_dir)
    w = Window.partitionBy("block_h").orderBy("doc_id", "block_idx")
    flagged = blocks.select(
        "doc_id", (F.row_number().over(w) == 1).alias("kept")
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_blocks",
            "n_kept",
            (F.col("n_blocks") - F.col("n_kept")).alias("n_dropped"),
            F.expr("(1000 * (n_blocks - n_kept)) DIV n_blocks").alias(
                "drop_permille"
            ),
        )
    )


def q_dup_gram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc: how much of its distinct 8-gram mass occurs in ANY
    other document — the cross-corpus duplication score (Lee et al.'s
    duplicate-substring fraction at gram granularity).

    Reuses the session-cached contamination gram table AND the
    session-cached dup-gram set (r14 opt round): a gram counts as
    duplicated when it appears in >= 2 distinct docs, which is
    exactly membership in _dup_gram_set — so the per-doc score is a
    broadcast left join against the cached index plus one partial-
    aggregated doc regroup, and the gram explosion never crosses an
    exchange (the previous shape shuffled + sorted every exploded
    gram row through a per-gram_h window pass each run; measured
    0.50 -> 0.27 s warm). At a scale where the dup-gram snapshot
    outgrows a broadcast, the join flips to the shuffled equi-join
    (the exsub_gate_auto trade) — the same bytes the old window
    shape shuffled."""
    g = _contam_gram_table(spark, sf_dir)
    exploded = g.select("doc_id", F.explode("grams").alias("gram_h"))
    dup = _dup_gram_set(spark, sf_dir).withColumn("_dup", F.lit(True))
    return (
        exploded.join(F.broadcast(dup), "gram_h", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("_dup").alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            F.expr("(1000 * n_dup_grams) DIV n_grams").alias(
                "dup_permille"
            ),
        )
    )


# --------------------------------------------- exact-substring spans
# Window width shared with the contamination family so the dup-gram
# set rides the same cached gram table; the width IS the detection
# threshold (Lee et al. use 50 BPE tokens; this corpus's docs are
# 10-99 whitespace tokens, so 8 plays the same structural role).
EXSUB_K = 8


def _dup_gram_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct gram hashes occurring in >= 2 documents — the
    cross-document dup definition shared by the exact-substring pair
    (one aggregation over the cached per-doc-distinct gram table:
    the row count per gram IS the doc count).

    Session-cached per snapshot (r14 opt round): this IS the static
    dup-gram index the ExactSubstr family serves from — the batch
    pair joins it and the streaming gates broadcast a frozen
    snapshot of it (exsub_gate_auto) — so it is built once per
    corpus snapshot like the signature/code artifacts, not re-
    aggregated from the gram table inside every consumer execution
    (measured r14: each warm exact_substring_* run re-ran the
    explode + groupBy + broadcast-build of ~240k gram rows)."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        return (
            _contam_gram_table(spark, sf_dir)
            .select(F.explode("grams").alias("gram_h"))
            .groupBy("gram_h")
            .agg(F.count("*").alias("_nd"))
            .filter(F.col("_nd") >= 2)
            .select("gram_h")
        )

    return _cached_frame(spark, sf_dir, "exsub_dup_grams", _build)


def _exsub_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared core of the exact-substring pair: one row per
    MAXIMAL duplicated span — (doc_id, n_tokens, span_start,
    span_end, _span_tok), token positions 1-based inclusive.
    Positioned duplicated windows (cross-document dup definition off
    the cached gram table) merged gaps-and-islands; see
    q_exact_substring_spans for the semantics argument.
    NOT session-cached (r15, VERDICT r14 item 4): the merged-span
    table is the spans report's result modulo one aggregation, so
    caching it made both consumers' timed bodies memoised reads. The
    INDEX artifacts stay cached — the positioned gram windows
    ('exsub_pos_grams') and the dup-gram set ('exsub_dup_grams'),
    which are what an ExactSubstr pass persists per snapshot — and
    the hit join + two island window passes price per execution.

    CANDIDATE-ONLY explode (the house verify discipline): positioned
    windows are built ONLY for docs already known to own >= 1
    duplicated distinct gram (gram table ⋈ dup set -> doc ids), so
    the corpus-token-scale window explode shrinks to the dup-owning
    slice — at 100 TB with single-digit dup rates that is the
    difference between shuffling every token window and shuffling
    ~5% of them. The pruning is exact, not heuristic: a doc with no
    duplicated distinct gram has no duplicated window."""
    from pyspark.sql import Window

    from .corpus import CONTAM_K
    from .dedup import _cached_frame

    assert EXSUB_K == CONTAM_K  # the shared gram table IS the index

    def _build_positioned():
        cand_ids = (
            _contam_gram_table(spark, sf_dir)
            .select("doc_id", F.explode("grams").alias("gram_h"))
            .join(_dup_gram_set(spark, sf_dir), "gram_h", "left_semi")
            .select("doc_id")
            .distinct()
        )
        from .corpus import contam_gram_combine, with_contam_tkh

        docs = spread_if_undersplit(
            spark, load_table(spark, sf_dir, "documents")
        ).join(cand_ids, "doc_id", "left_semi")
        # the WIDENED pair-fold identity, value-identical to the gram
        # table's (the positioned windows join its dup set)
        staged = with_contam_tkh(docs)
        gram = F.transform(
            F.sequence(F.lit(1), F.col("_n_tok") - (EXSUB_K - 1)),
            contam_gram_combine,
        )
        return (
            staged.filter(F.col("_n_tok") >= EXSUB_K)
            .select(
                "doc_id",
                F.col("_n_tok").cast("long").alias("n_tokens"),
                F.posexplode(gram).alias("_p0", "gram_h"),
            )
            .select(
                "doc_id",
                "n_tokens",
                (F.col("_p0") + 1).cast("long").alias("pos"),
                "gram_h",
            )
        )

    positioned = _cached_frame(
        spark, sf_dir, "exsub_pos_grams", _build_positioned
    )

    hit = positioned.join(
        _dup_gram_set(spark, sf_dir), "gram_h"
    ).select("doc_id", "n_tokens", "pos")
    by_pos = Window.partitionBy("doc_id").orderBy("pos")
    flagged = hit.withColumn(
        "_brk",
        F.when(
            F.col("pos") - F.lag("pos").over(by_pos) > EXSUB_K, 1
        ).otherwise(0),
    )
    isl = flagged.withColumn(
        "_isl",
        F.sum("_brk").over(
            by_pos.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return isl.groupBy("doc_id", "_isl").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.min("pos").alias("span_start"),
        (F.max("pos") + EXSUB_K - 1).alias("span_end"),
        (F.max("pos") - F.min("pos") + EXSUB_K).alias("_span_tok"),
    )


def q_exact_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per doc, the MAXIMAL cross-document duplicated token spans —
    the span-level structure behind Lee et al.'s ExactSubstr dedup
    ("Deduplicating Training Data Makes Language Models Better"),
    where `dup_gram_coverage` gives only the scalar fraction and
    `block_dedup` only fixed non-overlapping blocks: which contiguous
    regions of a document also occur elsewhere in the corpus, how
    many, how long, and what share of the doc they cover — exactly
    what an ExactSubstr cut pass would remove.

    Semantics (deterministic, engine-portable): a length-EXSUB_K
    token window is DUPLICATED when its rolling gram hash occurs in
    >= 2 distinct documents (cross-document only — within-doc
    repetition is `doc_repetition`'s signal). Overlapping/adjacent
    duplicated windows merge into maximal spans (gaps-and-islands:
    a new island starts when the next duplicated window position is
    > EXSUB_K past the previous, i.e. the covered token ranges
    disjoin). A span of L >= EXSUB_K duplicated tokens contains
    duplicated windows at every interior position, so the merged
    islands reconstruct duplicated regions exactly at >= EXSUB_K
    granularity — shorter repeats are below the threshold by design,
    matching ExactSubstr's length-50 floor.

    Scale shape: positioned windows move as (doc_id, pos, hash)
    longs — token text never shuffles. The dup-gram set is one
    aggregation over the session-cached contamination gram table
    (per-doc distinct, so the row count per gram IS the doc count);
    the positioned join is a gram-hash equi-join (the dedup family's
    banded-join discipline); islands are two window passes over ONE
    doc_id exchange. Output: one row per doc owning at least one
    duplicated span."""
    spans = _exsub_islands(spark, sf_dir)
    return (
        spans.groupBy("doc_id")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_dup_spans"),
            F.sum("_span_tok").alias("dup_tokens"),
            F.max("_span_tok").alias("max_span_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_spans",
            "dup_tokens",
            "max_span_tokens",
            F.expr("(1000 * dup_tokens) DIV n_tokens").alias(
                "dup_permille"
            ),
        )
    )


def q_exact_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACTION half of the exact-substring pair: the cleaned
    corpus after cutting every maximal cross-document duplicated
    span from every document — Lee et al.'s ExactSubstr default
    (every occurrence is removed, in every doc; keeping one canonical
    copy is the variant they note and reject for simplicity).

    Per doc: original token count, kept/cut token counts, and
    kept_fp = md5 of the cleaned text (kept tokens rejoined with
    single spaces) — the fingerprint proves the reconstruction
    byte-for-byte against the oracle without hauling text through
    the compare. Docs without spans (including sub-window-width
    docs) pass through whole, with kept_fp = md5 of the space-split/
    rejoined text (identical to md5(text) for single-spaced input).

    Scale shape: span intervals collect to a per-doc array (bounded
    by doc length / EXSUB_K spans), broadcast-joinable back to the
    corpus scan in deployment; the rebuild is a doc-local
    codegen fold — per token one interval-list probe, O(tokens x
    spans) per doc, no Python. One extra exchange over the spans
    report (the collect_list regroup)."""
    spans = _exsub_islands(spark, sf_dir).groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                F.col("span_end").alias("e"),
            )
        ).alias("_spans")
    )
    docs = spread_if_undersplit(
        spark, load_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")
    staged = (
        docs.join(spans, "doc_id", "left")
        .withColumn("_tk", F.split(F.col("text"), " "))
        .withColumn(
            "_sp",
            F.coalesce(
                "_spans",
                F.array().cast("array<struct<s:long,e:long>>"),
            ),
        )
    )
    kept = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.size("_tk")),
            lambda i: F.when(
                F.exists(
                    F.col("_sp"),
                    lambda sp: (i.cast("long") >= sp["s"])
                    & (i.cast("long") <= sp["e"]),
                ),
                F.lit(None).cast("string"),
            ).otherwise(F.element_at(F.col("_tk"), i)),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        staged.withColumn("_kept", kept)
        .select(
            "doc_id",
            F.size("_tk").cast("long").alias("n_tokens"),
            F.size("_kept").cast("long").alias("kept_tokens"),
            (F.size("_tk") - F.size("_kept"))
            .cast("long")
            .alias("cut_tokens"),
            F.md5(F.array_join("_kept", " ")).alias("kept_fp"),
        )
    )


def bloom_positions() -> F.Column:
    """The k filter positions of a doc's content fingerprint —
    md5(seed:text) 28-bit halves folded into [0, BLOOM_BITS). Shared
    verbatim with the streaming gate (streaming/ingest.
    bloom_gate_stream) so both paths hash byte-identically."""
    return F.array_distinct(
        F.array(
            *[
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"{i}:"), F.col("text"))),
                            1,
                            7,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % BLOOM_BITS
                )
                for i in range(BLOOM_HASHES)
            ]
        )
    )


def q_bloom_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-dedup Bloom gate: probe new docs (doc_id % 3 == 0)
    against the Bloom filter built from the already-ingested
    partition (doc_id % 3 != 0).

    The filter is represented as its exact set-bit table — a pure
    function of the data, bounded by BLOOM_BITS rows no matter how
    large the corpus, hence broadcast by construction. A probe doc is
    flagged when ALL of its k positions are set. `sound` asserts the
    Bloom no-false-negative guarantee per row (true duplicates are
    always flagged); it is the oracle-checkable contract, while
    `bloom_hit` on non-duplicates documents the false-positive cost.
    """
    docs = load_table(spark, sf_dir, "documents")
    ingested = docs.filter(F.col("doc_id") % BLOOM_INGESTED_MOD != 0)
    probe = docs.filter(F.col("doc_id") % BLOOM_INGESTED_MOD == 0)

    bits = (
        ingested.select(F.explode(bloom_positions()).alias("pos"))
        .distinct()
        .withColumn("_set", F.lit(True))
    )
    # stage the position array once so size() and explode() read one
    # materialized column instead of inlining the 4-md5 build twice
    probe_pos = probe.select(
        "doc_id", bloom_positions().alias("_pos")
    ).select(
        "doc_id",
        F.size("_pos").alias("_n_pos"),
        F.explode("_pos").alias("pos"),
    )
    hits = (
        probe_pos.join(F.broadcast(bits), "pos", "left")
        .groupBy("doc_id")
        .agg(
            F.max("_n_pos").alias("_n_pos"),
            F.count("_set").alias("_n_set"),
        )
        .select(
            "doc_id", (F.col("_n_set") == F.col("_n_pos")).alias("bloom_hit")
        )
    )
    # exact-dup truth: probe text present verbatim in the ingested side
    ingested_fp = ingested.select(
        F.md5("text").alias("_fp")
    ).distinct().withColumn("_dup", F.lit(True))
    truth = probe.select("doc_id", F.md5("text").alias("_fp")).join(
        ingested_fp, "_fp", "left"
    ).select("doc_id", F.coalesce("_dup", F.lit(False)).alias("is_dup"))
    return (
        hits.join(truth, "doc_id")
        .select(
            "doc_id",
            "bloom_hit",
            "is_dup",
            (F.col("bloom_hit") | ~F.col("is_dup")).alias("sound"),
        )
    )


def _token_weight(token: F.Column) -> F.Column:
    """Deterministic per-token classifier weight in [-1000, 1000]
    (md5-derived stand-in for learned weights) — shared VERBATIM by
    the batch q_quality_logit reduction and the streaming
    logit_gate_stream's per-row fold, so a doc scores identically
    whichever path saw it."""
    return (
        F.conv(F.substring(F.md5(token), 1, 8), 16, 10).cast("long")
        % 2001
        - 1000
    )


LOGIT_MILLI_EXPR = "(1000 * _logit_s) DIV _logit_n"


def logit_stat_columns() -> list[F.Column]:
    """(_logit_s, _logit_n): per-row weight sum + token count as pure
    expressions over `text` — the scan-local (streaming-composable)
    form of the logit. The batch path instead folds weights over the
    shared token_tf artifact (one md5 per distinct (doc, token),
    weighted by tf) — per-occurrence-sum-equivalent by construction,
    and pinned so by the DuckDB twin, which computes THIS unnest form
    against the batch query's tf reduction."""
    tk = F.split(F.col("text"), " ")
    return [
        F.aggregate(
            F.transform(tk, _token_weight),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_logit_s"),
        F.size(tk).cast("long").alias("_logit_n"),
    ]


def q_quality_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality scoring — the linear-classifier gate
    (fastText-style, as used for FineWeb-Edu / LLaMA quality
    filtering) that complements the rule-based Gopher pass: a per-doc
    logit from per-token weights, thresholded into keep/drop.

    The weight table is a DETERMINISTIC STAND-IN for learned weights
    (w(token) = md5-derived integer in [-1000, 1000]; training a real
    classifier is out of scope and non-reproducible across engines) —
    the Spark-side shape is the real one: per-token weights reduce
    over the session-cached token_tf artifact (w folds into the same
    (doc, token) rows, weighted by tf), one aggregation back to the
    doc key, integer milli-units end-to-end so the oracle is exact.

    At 100 TB with a real model the weight table is a broadcast join
    instead of an inline hash expression; everything else is
    identical — one scan of the tf artifact, one doc-key aggregation,
    zero driver involvement."""
    from .corpus import token_tf

    tf = token_tf(spark, sf_dir)
    per = (
        tf.select("doc_id", "tf", _token_weight(F.col("token")).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).alias("_s"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )
    return per.select(
        "doc_id",
        "n_tokens",
        F.expr("(1000 * _s) DIV n_tokens").alias("logit_milli"),
        (F.expr("(1000 * _s) DIV n_tokens") >= 0).alias("keep"),
    )


BEST_OF_SOURCE_K = 5


def q_best_of_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source best-document selection: the top
    BEST_OF_SOURCE_K docs of each source by classifier logit — the
    curation ACTION the quality model feeds when building a
    high-quality subset with source diversity preserved (cap by
    source instead of taking a global top slice that one clean
    source would monopolize). Ties break on doc_id for a
    deterministic selection.

    Scale shape: the logit reduction is the cached-token_tf
    aggregation q_quality_logit already pays (shared plan subtree);
    the source column rides a doc-keyed join against a scan-local
    projection, and the top-k window runs per source — bounded
    output (sources x K), one exchange on source for the window."""
    from ..tables import load_table
    from .corpus import token_tf
    from pyspark.sql import Window

    tf = token_tf(spark, sf_dir)
    per = (
        tf.select("doc_id", "tf", _token_weight(F.col("token")).alias("w"))
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tf") * F.col("w")).alias("_s"),
            F.sum("tf").cast("long").alias("_n"),
        )
        .select("doc_id", F.expr("(1000 * _s) DIV _n").alias("logit_milli"))
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.col("logit_milli").desc(), F.col("doc_id")
    )
    return (
        per.join(src, "doc_id")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= BEST_OF_SOURCE_K)
        .select("source", "rank", "doc_id", "logit_milli")
    )


def q_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-proportional importance resampling: each document is
    kept with probability = its composite quality score (permille),
    decided by comparing the score against a DETERMINISTIC uniform
    hash of the text — the soft quality filter modern curation runs
    use instead of a hard threshold (a hard cut at 750 deletes every
    mid-quality doc; proportional sampling keeps the distribution's
    mass while down-weighting junk), made reproducible: the same doc
    draws the same verdict on every run, every engine, every backfill.

    hash_permille rides the cross-engine md5 idiom (12 hex chars ->
    BIGINT % 1000, uniform over text bytes); the emitted decision
    table carries score, draw, and verdict so downstream token
    accounting can audit the expected-vs-realized keep rate. Scale
    shape: scan-local column expressions only — zero shuffles, no
    state, embarrassingly parallel at any corpus size."""
    from .text import QUALITY_EXPR_T, quality_stat_columns

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", "text", *quality_stat_columns())
    score = F.expr(f"CAST({QUALITY_EXPR_T.format(d='DIV')} AS BIGINT)")
    draw = (
        F.conv(F.substring(F.md5(F.col("text")), 1, 12), 16, 10).cast(
            "long"
        )
        % 1000
    )
    return base.select(
        "doc_id",
        score.alias("score_permille"),
        draw.alias("hash_permille"),
        (draw < score).alias("kept"),
    )

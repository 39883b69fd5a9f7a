"""Corpus-curation operators over `documents` — the data-pipeline ops
between raw crawl and training set that the dedup/similarity families
(functions/dedup.py, functions/similarity.py) don't cover:

- normalized near-exact dedup: casefold + punctuation-strip +
  whitespace-collapse before fingerprinting, catching trivially
  reformatted copies exact dedup misses.
- intra-document repetition: duplicated-3-gram fraction per doc (the
  Gopher/RefinedWeb-style repetition quality signal).
- deterministic stratified sampling: hash-threshold sampling with
  per-language rates — reproducible across runs and engines, no RNG.
- PII-pattern scan: per-doc counts of email/url/number shapes (the
  redaction-triage pass; patterns kept to character classes that
  behave identically in Java regex and RE2).
- near-dup clustering: connected components over the verified
  MinHash-LSH pair set via iterative min-label propagation — the step
  that turns pairs into keep-one-per-cluster decisions.

Everything except the clustering loop is a single scan in whole-stage
codegen. The clustering loop is the standard distributed iterative
pattern (each step one self-join + min-aggregate, all JVM-side); the
driver only checks a scalar convergence count per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table, spread_if_undersplit
from .dedup import SHINGLE_K, q_dedup_minhash_lsh

# per-language keep-rates for stratified sampling, in 1/65536 units of
# the 16-bit fingerprint space (md5 first 4 hex chars)
SAMPLE_RATES_64K = {"en": 16384, "es": 32768, "de": 49152}
SAMPLE_DEFAULT_64K = 8192

PII_PATTERNS = {
    "email_count": "[a-z0-9._%+-]+@[a-z0-9.-]+",
    "url_count": "https?://[^ ]+",
    "number_count": "[0-9]+",
}

MAX_CLUSTER_ITERS = 20


def _normalized_text() -> F.Column:
    """Casefold, strip non-[a-z0-9 ], collapse runs of spaces, trim —
    identical function set in the DuckDB twin."""
    lowered = F.lower(F.col("text"))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", "")
    collapsed = F.regexp_replace(stripped, " +", " ")
    return F.trim(collapsed)


def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup groups on the normalized fingerprint."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", F.md5(_normalized_text()).alias("fp_norm"))
        .groupBy("fp_norm")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-3-gram permille per document (0 for docs shorter
    than the shingle width): 1000 * (total - distinct) / total."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    # token array staged through a projection: element_at over an
    # inline split() inside the gram lambda re-splits the doc per
    # element x SHINGLE_K (HOF bodies are not subexpression-eliminated)
    staged = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("_tk")
    )
    tk = F.col("_tk")
    gram = F.transform(
        F.sequence(F.lit(1), F.size(tk) - (SHINGLE_K - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, i + o) for o in range(SHINGLE_K)]
        ),
    )
    # n_grams is pure arithmetic (n_tok - K + 1): size(gram) would
    # inline a SECOND full gram construction next to the
    # array_distinct one — codegen does not CSE the transform()
    base = staged.select(
        "doc_id",
        F.when(F.size(tk) >= SHINGLE_K, F.size(tk) - (SHINGLE_K - 1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_grams"),
        F.when(F.size(tk) >= SHINGLE_K, F.size(F.array_distinct(gram)))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_distinct"),
    )
    return base.select(
        "doc_id",
        "n_grams",
        F.when(
            F.col("n_grams") > 0,
            F.expr("(1000 * (n_grams - n_distinct)) DIV n_grams"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("repetition_permille"),
    )


def h16_of(id_col: F.Column) -> F.Column:
    """The engine's ONE 16-bit sampling fingerprint: md5 of the id's
    decimal string, first 4 hex chars as an integer in [0, 65536).
    Every deterministic hash-threshold sampler (stratified sample,
    mixture rebalance, the k-means balanced sample, split_leakage's
    split bits via assign_split) keys on this expression, and the
    DuckDB twins mirror it as CAST(('0x' || substr(md5(x),1,4)) AS
    BIGINT) — change it in lockstep everywhere or nowhere."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10
    ).cast("long")


def capped_rate_64k_expr(cap_64k: int, count_col: str) -> F.Column:
    """Per-group keep rate in 1/65536 units capping any group at
    ~cap_64k/65536 of the window total: least(65536, cap * total DIV
    group_count), evaluated over an unpartitioned window on the
    (tiny, already-aggregated) census frame. Shared by the language
    and cluster rebalancers so the rate arithmetic cannot drift."""
    return F.least(
        F.lit(65536).cast("long"),
        F.expr(f"({cap_64k} * sum({count_col}) OVER ()) DIV {count_col}"),
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sample: keep a doc iff the 16-bit
    value of md5(doc_id)'s first 4 hex chars falls under the
    language's rate. Reproducible across engines and runs (no RNG),
    and at 100 TB it is a scan-local filter — no shuffle at all."""
    docs = load_table(spark, sf_dir, "documents")
    h16 = h16_of(F.col("doc_id"))
    rate = F.lit(SAMPLE_DEFAULT_64K)
    for lang, r in SAMPLE_RATES_64K.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    return docs.select(
        "doc_id", "lang", h16.alias("h16"), rate.cast("long").alias("rate_64k")
    ).filter(F.col("h16") < F.col("rate_64k"))


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc counts of PII-ish shapes (redaction triage)."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    return docs.select(
        "doc_id",
        *[
            F.regexp_count(F.lower(F.col("text")), F.lit(pat))
            .cast("long")
            .alias(name)
            for name, pat in PII_PATTERNS.items()
        ],
    )


# redaction order matters (a number inside a URL must not be mangled
# before the URL match runs) and is therefore FIXED: url -> email ->
# number, identical in the DuckDB twin; placeholders contain no
# redactable characters, so passes cannot cascade
PII_REDACTIONS = (
    ("url_count", "<url>"),
    ("email_count", "<email>"),
    ("number_count", "<num>"),
)


def pii_redact_exprs() -> tuple[F.Column, F.Column]:
    """(redacted_text, n_redactions) expression pair — the sequential
    replace chain shared VERBATIM between the batch report and the
    streaming gate (streaming/ingest.pii_redact_stream), so a doc
    redacts byte-identically whichever path saw it."""
    redacted = F.lower(F.col("text"))
    total = F.lit(0).cast("long")
    for name, placeholder in PII_REDACTIONS:
        total = total + F.regexp_count(
            redacted, F.lit(PII_PATTERNS[name])
        ).cast("long")
        redacted = F.regexp_replace(
            redacted, PII_PATTERNS[name], placeholder
        )
    return redacted, total


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The redaction pass q_pii_scan triages for: emit each document
    with every PII-shaped span replaced by a typed placeholder, plus
    the total replacement count (the auditing column). Same character-
    class-only patterns as the scan — they behave identically in Java
    regex and RE2-style engines — applied to the same lowercased view.
    Pure scan-local string work: zero shuffle at any scale."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    redacted, total = pii_redact_exprs()
    return docs.select(
        "doc_id",
        redacted.alias("redacted_text"),
        total.alias("n_redactions"),
    )


def connected_components(pairs: DataFrame) -> DataFrame:
    """Connected components over an undirected pair set (doc_a, doc_b)
    -> (doc_id, cluster_id = min doc id in the component).

    Iterative min-label propagation WITH pointer jumping: each round
    (1) takes the min label over self + neighbors (one shuffle-join +
    aggregate) and (2) compresses label -> label(label) (one more
    join). Propagation alone needs DIAMETER rounds and would silently
    stop WRONG at MAX_CLUSTER_ITERS on a deep component (a chained
    boilerplate template is exactly that shape); with compression the
    label chain halves each round, so convergence is O(log diameter)
    and 20 rounds cover any practically possible component. The loop
    stops when a round changes nothing; only the scalar changed-count
    crosses to the driver. The label frame is localCheckpoint()ed
    EVERY round: the compression self-join references the round's
    frame twice, so an un-truncated logical plan DOUBLES per round
    (2^rounds — measured driver-heap OOM just stringifying the plan
    by round ~5); checkpointing resets labels to a leaf and keeps the
    per-round plan constant-size. On a real cluster prefer reliable
    checkpoint() (DFS-backed) so a lost executor cannot drop the only
    copy of the label blocks. DuckDB twin: WITH RECURSIVE reachability
    with the same min-label semantics.
    """
    # cache + force the pair set ONCE: both edge directions and every
    # iteration read it, and the upstream pair pipeline is the
    # expensive part — without this the union materializes it twice
    pairs = pairs.select("doc_a", "doc_b").cache()
    pairs.count()
    edges = pairs.unionByName(
        pairs.select(
            F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
        )
    )
    labels = (
        edges.select(F.col("doc_a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lab"))
        .cache()
    )
    for _ in range(MAX_CLUSTER_ITERS):
        neighbor_min = (
            edges.join(labels, edges["doc_b"] == labels["node"])
            .groupBy(F.col("doc_a").alias("node"))
            .agg(F.min("lab").alias("nmin"))
        )
        prop = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.col("lab").alias("old_lab"),
                F.least(
                    F.col("lab"), F.coalesce(F.col("nmin"), F.col("lab"))
                ).alias("lab"),
            )
            .cache()  # referenced twice below (self-join)
        )
        # pointer jumping: label values are themselves node ids, so
        # looking each label's own label up compresses two hops to one
        parent = prop.select(
            F.col("node").alias("p_node"), F.col("lab").alias("p_lab")
        )
        # the changed flag rides along so ONE action both materializes
        # the new labels and returns the convergence signal
        new_labels = (
            prop.join(parent, prop["lab"] == parent["p_node"], "left")
            .select(
                "node",
                F.least(
                    F.col("lab"), F.coalesce(F.col("p_lab"), F.col("lab"))
                ).alias("lab"),
                "old_lab",
            )
            .select(
                "node",
                "lab",
                (F.col("lab") < F.col("old_lab")).alias("chg"),
            )
        )
        new_labels = new_labels.localCheckpoint()  # eager; plan -> leaf
        changed = new_labels.filter(F.col("chg")).count()
        labels.unpersist()
        prop.unpersist()
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("lab").alias("cluster_id")
    )
    pairs.unpersist()
    return out


def _minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached component labels over the MinHash-LSH pair set —
    the (doc_id, cluster_id) artifact a dedup pass persists once and
    every consumer (clusters report, size histogram, keep set) reads.
    Without the cache each consumer re-runs the whole iterative loop
    (driver actions + per-round shuffles) per execution."""
    from .dedup import _cached_frame

    return _cached_frame(
        spark,
        sf_dir,
        "minhash_components",
        lambda: connected_components(
            q_dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
        ),
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH verified pair set
    (see connected_components for the algorithm and scale shape)."""
    return _minhash_components(spark, sf_dir)


CONTAM_K = 8  # n-gram width for the train/test overlap check
HOLDOUT_MOD = 50  # doc_id % 50 == 0 -> held-out "test set"
# rolling-hash constants for the gram combine: 28-bit token hashes,
# acc*MULT + h stays < 2^31*131 + 2^28 < 2^39 — no BIGINT overflow in
# either engine (DuckDB errors on overflow; Spark would wrap silently)
CONTAM_MULT = 131
CONTAM_P = 2147483647
# Second-stream multiplier of the WIDENED gram identity (r12). A
# single fold mod the 31-bit CONTAM_P birthday-saturates at corpus
# scale: with ~10^12-10^13 distinct 8-token windows in a 100 TB
# corpus, E[collisions] ~ n^2 / 2^32 makes false cross-doc
# "duplicates" the rule — and for exact_substring_cut that means
# cutting innocent text. The gram identity is therefore TWO
# independent folds packed as f1 * 2^31 + f2 (the block_dedup
# fingerprint discipline, filtering._block_table): fold 1 runs
# CONTAM_MULT over md5[1:7] token halves, fold 2 runs GRAM_MULT2
# over the INDEPENDENT md5[8:14] halves — a collision needs both
# 31-bit streams to collide at once (~2^-62 per pair; the 50%
# birthday bound moves from ~10^5 windows to ~2^31). All arithmetic
# stays int64-exact in both engines: acc < 2^31, acc*mult + h <
# 2^39, and the pack < 2^62 + 2^31 < 2^63.
GRAM_MULT2 = 139  # any small prime != CONTAM_MULT, != BLOCK_MULT2
GRAM_PACK = 2147483648  # 2^31, the pack shift of the (f1, f2) pair
VOCAB_TOP_K = 100


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over the near-dup components — the QA
    gate a dedup pass runs before dropping documents at 100 TB: how
    many docs keep-one-per-cluster will remove, and whether a
    pathological mega-cluster exists (a boilerplate template chaining
    thousands of docs into one component is the classic way a dedup
    pass silently deletes a corpus slice). Covers only docs that
    appear in at least one verified pair (singletons have no cluster
    row by construction). Integer-only output on top of the cached
    component labels — one extra aggregation, no new scan.
    """
    clusters = q_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count("*").alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def contam_gram_combine(i: F.Column) -> F.Column:
    """The widened (~62-bit) gram identity at 1-based token position
    `i` over staged `_tkh` / `_tkh2` token-hash arrays: two
    independent CONTAM_K-token rolling folds mod CONTAM_P
    (CONTAM_MULT over md5[1:7] halves, GRAM_MULT2 over md5[8:14]
    halves) packed as f1 * 2^31 + f2 — see the GRAM_MULT2 constant
    block for the collision bound. Shared by the distinct gram table
    (with_contam_grams) and the exact-substring positioned windows
    (filtering._exsub_islands), whose hashes MUST be value-identical
    because the positioned windows join the gram table's dup set."""
    acc1 = F.element_at(F.col("_tkh"), i)
    acc2 = F.element_at(F.col("_tkh2"), i)
    for o in range(1, CONTAM_K):
        acc1 = (
            acc1 * CONTAM_MULT + F.element_at(F.col("_tkh"), i + o)
        ) % CONTAM_P
        acc2 = (
            acc2 * GRAM_MULT2 + F.element_at(F.col("_tkh2"), i + o)
        ) % CONTAM_P
    return acc1 * F.lit(GRAM_PACK) + acc2


def with_contam_tkh(df: DataFrame) -> DataFrame:
    """Stage `_n_tok`, `_tkh`, `_tkh2` for contam_gram_combine: ONE
    md5 per token (staged as a digest array so the two half-extracts
    read one materialized column — HOF lambdas are not subexpression-
    eliminated, the round-7 lesson), then the two independent 28-bit
    integer halves."""
    tk = F.split(F.col("text"), " ")
    dig = F.transform(tk, lambda t: F.md5(t))
    staged = df.withColumn("_n_tok", F.size(tk)).withColumn("_dig", dig)
    return staged.withColumn(
        "_tkh",
        F.transform(
            F.col("_dig"),
            lambda d: F.conv(F.substring(d, 1, 7), 16, 10).cast("long"),
        ),
    ).withColumn(
        "_tkh2",
        F.transform(
            F.col("_dig"),
            lambda d: F.conv(F.substring(d, 8, 7), 16, 10).cast("long"),
        ),
    ).drop("_dig")


def with_contam_grams(df: DataFrame, out: str = "grams") -> DataFrame:
    """Add the distinct CONTAM_K-gram hash array of `text` as `out`.

    ONE md5 per TOKEN (split into two independent 28-bit halves),
    then each 8-gram is the WIDENED pair-of-integer-folds identity of
    contam_gram_combine (~62-bit — the r12 fix for the 31-bit
    birthday saturation at corpus scale; see GRAM_MULT2). The
    md5-once-fold-cheap discipline is the round-1 MinHash lesson: a
    string concat + md5 PER GRAM generated codegen so large the JVM
    stalled re-JITting it. Both engines run the identical integer
    folds, so parity is exact.

    The digest and token-hash arrays are staged through named
    projections so the gram combine's CONTAM_K element_at references
    read materialized arrays instead of inlining the md5 transform 8x
    (CollapseProject keeps non-cheap multi-referenced expressions).
    Shared by the batch gram table and the streaming decontamination
    gate, so both paths hash byte-identically."""
    staged = with_contam_tkh(df)
    gram = F.transform(
        F.sequence(F.lit(1), F.col("_n_tok") - (CONTAM_K - 1)),
        contam_gram_combine,
    )
    grams = F.when(
        F.col("_n_tok") >= CONTAM_K, F.array_distinct(gram)
    ).otherwise(F.array().cast("array<long>"))
    return staged.withColumn(out, grams).drop("_n_tok", "_tkh", "_tkh2")


def _contam_gram_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc distinct CONTAM_K-gram hash table (doc_id, grams) —
    the derived artifact both the contamination report and the
    decontaminate pass read; session-cached like the other corpus
    artifacts (token_rarity's unigram table, the dedup shingles)."""

    def _build_gram_table():
        docs = spread_if_undersplit(
            spark, load_table(spark, sf_dir, "documents")
        )
        return with_contam_grams(docs).select("doc_id", "grams")

    from .dedup import _cached_frame

    return _cached_frame(spark, sf_dir, "contam_grams", _build_gram_table)


def holdout_gram_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distinct gram hashes of the held-out set (gram_h) — the
    static side a streaming decontamination gate joins against.
    Session-cached per snapshot (r14 opt round): it is a STATIC
    artifact by nature (the holdout set moves only when the benchmark
    suite does), and before caching, its explode + distinct re-ran
    inside every warm execution of q_contamination — the same class
    and argument as the exsub_dup_grams index."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        g = _contam_gram_table(spark, sf_dir)
        return (
            g.filter(F.col("doc_id") % HOLDOUT_MOD == 0)
            .select(F.explode("grams").alias("gram_h"))
            .distinct()
        )

    return _cached_frame(spark, sf_dir, "holdout_grams", _build)


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination check: per TRAIN doc, how many of its
    distinct CONTAM_K-grams appear anywhere in the held-out set
    (doc_id % HOLDOUT_MOD == 0 plays the benchmark suite).

    The decontamination pass every serious LLM pipeline runs before
    training. Scale shape: each gram is reduced to a 64-bit md5-half
    IMMEDIATELY after construction, so everything that moves —
    explode, the test-set distinct, the broadcast, the per-doc
    aggregation shuffle — carries narrow longs, never 8-word strings
    (the string variant spent ~16 s at sf0.1 just shuffling gram
    text; hashed it is ~1 s). The test-side gram set is tiny by
    nature (benchmarks are small), so it is explicitly broadcast and
    the train side never join-shuffles. md5 is the cross-engine hash,
    so the DuckDB twin hashes identically and parity is unaffected by
    (negligible) collisions. Only contaminated docs are emitted.
    """
    g = _contam_gram_table(spark, sf_dir)
    is_test = F.col("doc_id") % HOLDOUT_MOD == 0
    # the same holdout gram set the streaming decontamination gate
    # broadcasts — one definition, both paths (session-cached)
    test_grams = holdout_gram_set(spark, sf_dir)
    train = g.filter(~is_test)
    # r14 opt round (guide: aggregate before you shuffle / shuffle
    # only what decides): the old LEFT join + count(hit) regrouped
    # EVERY exploded train gram by doc_id (231k narrow rows at sf0.1)
    # to count the rare hits. The INNER join keeps only hit rows —
    # contamination is rare by nature — so the doc regroup carries
    # hits alone, and n_grams comes scan-locally from size(grams) on
    # the CACHED gram table (the array is materialized — no md5
    # re-evaluation; q_decontaminate reads it the same way). A doc's
    # exploded-row count equals size(grams) exactly (grams is
    # array_distinct'ed at construction), and zero-gram docs were
    # filtered by n_contam > 0 before, dropped by the inner doc join
    # now — identical output.
    hits = (
        train.select("doc_id", F.explode("grams").alias("gram_h"))
        # No explicit broadcast hint: the hit side is tiny but
        # DERIVED, and forcing an eager broadcast exchange of a
        # computed subplan intermittently stalled 5-20 s on a busy
        # driver (measured r9; the unhinted plan never did). AQE
        # still picks a broadcast join from the runtime row count.
        .join(test_grams, "gram_h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contam"))
    )
    sizes = train.select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    )
    return sizes.join(hits, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_contam",
        F.expr("(1000 * n_contam) DIV n_grams").alias("contam_permille"),
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top VOCAB_TOP_K tokens by occurrence
    (ties broken by token) with a dense 1-based rank — the first step
    of tokenizer/vocab construction.

    Scale shape: reads the shared session-cached token_freq artifact
    (one groupBy(token) over the cached token_tf table — no private
    explode), then orderBy+limit plans as TakeOrderedAndProject
    (per-partition top-K merged on the driver — no global sort
    shuffle); the row_number window runs AFTER the limit, over only
    K rows."""
    from pyspark.sql import Window

    counts = token_freq(spark, sf_dir).select(
        "token", F.col("tok_count").alias("n_occurrences")
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(VOCAB_TOP_K)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n_occurrences",
    )


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage by language: per lang, the token
    mass, the mass covered by the top-VOCAB_TOP_K corpus vocabulary,
    and the OOV rate in permille — the acceptance report read before
    freezing a vocabulary (a language whose OOV permille is high is
    about to be byte-fallback-shredded by the tokenizer; the per-lang
    view catches exactly the low-resource languages a corpus-global
    cut hides).

    Scale shape: the vocabulary is a TakeOrdered head over the cached
    token_freq artifact — VOCAB_TOP_K rows, broadcast by construction
    — LEFT-joined under AQE onto the cached token_tf table; lang
    rides a doc-keyed join with the documents projection (in a
    deployed pipeline lang is a column OF the tf table; the join
    stands in for that ride-along), then one bounded per-lang
    aggregation."""
    tf = token_tf(spark, sf_dir)
    vocab = (
        token_freq(spark, sf_dir)
        .orderBy(F.col("tok_count").desc(), "token")
        .limit(VOCAB_TOP_K)
        .select("token", F.lit(True).alias("_inv"))
    )
    langs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = (
        tf.join(F.broadcast(vocab), "token", "left")
        .join(langs, "doc_id")
        .select(
            "lang",
            "tf",
            F.coalesce(F.col("_inv"), F.lit(False)).alias("_inv"),
        )
    )
    return (
        j.groupBy("lang")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_inv"), F.col("tf")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
        )
        .select(
            "lang",
            "n_tokens",
            "covered_tokens",
            F.expr(
                "(1000 * (n_tokens - covered_tokens)) DIV n_tokens"
            ).alias("oov_permille"),
        )
    )


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture report: per language, doc count, token mass, and
    each language's share of total tokens in permille — the numbers a
    mixture-weighting (resampling) step consumes.

    One aggregation shuffle on lang; the share window runs over the
    handful of per-language rows (bounded by #languages, not data)."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    return per_lang.select(
        "lang",
        "n_docs",
        "n_tokens",
        F.expr(
            "(1000 * n_tokens) DIV (sum(n_tokens) OVER ())"
        ).alias("token_share_permille"),
    )


CHUNK_TOKENS = 32
CHUNK_STRIDE = 16
PACK_BUDGET_TOKENS = 256


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (training-prep: context
    windows of CHUNK_TOKENS with CHUNK_STRIDE overlap stride).

    posexplode over a computed chunk count — the fan-out stays inside
    codegen (no UDF), keeps the doc's partition, and at 100 TB is a
    scan-shaped map with ~n_tokens/stride amplification."""
    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    tk = F.split(F.col("text"), " ")
    n = F.size(tk).cast("long")
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1).cast("long")).otherwise(
        F.expr(
            f"((size(split(text, ' ')) - {CHUNK_TOKENS}) + {CHUNK_STRIDE - 1})"
            f" DIV {CHUNK_STRIDE} + 1"
        )
    )
    base = docs.select("doc_id", tk.alias("tk"), n_chunks.alias("n_chunks"))
    return base.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias(
            "chunk_idx", "_i"
        ),
        "tk",
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice(
                F.col("tk"),
                F.col("chunk_idx") * CHUNK_STRIDE + 1,
                F.lit(CHUNK_TOKENS),
            ),
            " ",
        ).alias("chunk_text"),
    )


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: per language, docs in doc_id
    order are assigned to packs of ~PACK_BUDGET_TOKENS by cumulative
    token count (pack = floor(prefix_sum_before_doc / budget)) — the
    deterministic, shuffle-light variant of sample packing (one window
    exchange on lang; no bin-packing state)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = docs.select(
        "doc_id", "lang", F.size(tk).cast("long").alias("n_tokens")
    ).withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"(cum_tokens - n_tokens) DIV {PACK_BUDGET_TOKENS}").alias(
            "pack_id"
        ),
    )


def q_packing_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency QA per language: pack counts, token mass,
    fill rate in permille of the PACK_BUDGET_TOKENS budget, and the
    extreme pack sizes — the report that tells a training run how much
    context-window it wastes (under-full packs) or truncates
    (budget-crossing docs) before it commits a packing scheme. Reads
    the q_pack_sequences assignment, so the two can never disagree.

    Scale shape: the pack assignment's one language window exchange,
    then two bounded aggregations — (lang, pack_id) with map-side
    partials, folded to one row per language."""
    packs = q_pack_sequences(spark, sf_dir)
    per_pack = packs.groupBy("lang", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )
    return per_pack.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_packs"),
        F.sum("pack_tokens").cast("long").alias("total_tokens"),
        F.max("pack_tokens").cast("long").alias("max_pack_tokens"),
        F.min("pack_tokens").cast("long").alias("min_pack_tokens"),
        F.expr(
            f"(1000 * sum(pack_tokens))"
            f" DIV (count(*) * {PACK_BUDGET_TOKENS})"
        )
        .cast("long")
        .alias("mean_fill_permille"),
        F.max("n_docs").cast("long").alias("max_docs_per_pack"),
    )


def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical rarity vs the corpus unigram table: the
    corpus-wide count of the doc's rarest token and the mean corpus
    count of its tokens — the unigram-LM quality signal (documents of
    frequent tokens score high; hapax-heavy docs flag for review).

    Two-pass shape over the shared unigram artifacts: pass 1 is the
    session-cached token_freq table (derived from the cached
    token_tf, itself the one explode the unigram family shares);
    pass 2 joins the PER-(doc, token) tf rows against it and weights
    by tf — occurrence-equivalent to joining raw exploded tokens but
    moving one row per distinct (doc, token) instead of one per
    occurrence, so the probe side of the join shrinks by the mean tf.
    The join key is high-cardinality and uniform, so at 100 TB it is
    a plain shuffle equi-join (the frequency table of a web corpus
    outgrows broadcast range); the final aggregation returns to the
    doc key. Integer outputs keep oracle parity exact."""
    stats = token_tf_stats(spark, sf_dir)
    return (
        stats
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.min("tok_count").alias("min_tok_count"),
            F.sum(F.col("tf") * F.col("tok_count")).alias("_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "min_tok_count",
            F.expr("_sum DIV n_tokens").alias("avg_tok_count"),
        )
    )


# train/val/test thresholds in 1/65536 units of the 16-bit fingerprint
# space (md5 hex chars 1-4): 98% / 1% / 1%
SPLIT_TRAIN_64K = 64225
SPLIT_VAL_64K = 64880
N_SPLIT_SHARDS = 64


def assign_split(df: DataFrame) -> DataFrame:
    """Add growth-stable `split` (train/val/test) and `shard` columns,
    both pure functions of doc_id (md5 hex chars 1-4 / 5-8) — no
    shuffle, no RNG, membership never moves as the corpus grows."""
    hx = F.md5(F.col("doc_id").cast("string"))
    h16 = F.conv(F.substring(hx, 1, 4), 16, 10).cast("long")
    shard = (
        F.conv(F.substring(hx, 5, 4), 16, 10).cast("long") % N_SPLIT_SHARDS
    )
    split = (
        F.when(h16 < SPLIT_TRAIN_64K, "train")
        .when(h16 < SPLIT_VAL_64K, "val")
        .otherwise("test")
    )
    return df.withColumn("split", split).withColumn("shard", shard)


def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split + shard assignment, reported
    per split: doc count, token mass, and distinct shards used.

    The split is a pure function of doc_id (md5 hex chars 1-4 against
    98/1/1 thresholds), so membership is stable across runs, engines,
    and corpus growth — adding documents never moves an existing doc
    between splits, which is what keeps a held-out set held out. The
    shard key uses hex chars 5-8 (decorrelated from the split bits) mod
    N_SPLIT_SHARDS — the write-partitioning a training job reads by.

    Scale shape: split+shard assignment is scan-local (no shuffle);
    the report is a two-level aggregation — groupBy(split, shard) with
    map-side partials, then groupBy(split) over at most 3*64 rows —
    which avoids the Expand a count(DISTINCT shard) alongside other
    aggregates would trigger.
    """
    docs = load_table(spark, sf_dir, "documents")
    assigned = assign_split(docs).select(
        "split",
        "shard",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_shard = assigned.groupBy("split", "shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    )
    return per_shard.groupBy("split").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_shards"),
    )


def _contam_doc_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contaminated TRAIN doc-id set — tiny by nature and read by
    three consumers (decontaminate, curation_funnel,
    source_quality_report), so it is session-cached like the gram
    table it derives from: the persisted id-list artifact a real
    decontamination pass writes once and every downstream job anti-
    joins against."""
    from .dedup import _cached_frame

    return _cached_frame(
        spark,
        sf_dir,
        "contam_docs",
        lambda: q_contamination(spark, sf_dir).select("doc_id"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontaminated training corpus: the TRAIN-side documents that
    share NO distinct CONTAM_K-gram with the held-out set — the
    actionable output of q_contamination (which only reports the
    overlap). Emitting the retained set is what an actual pipeline
    writes before training.

    Scale shape: the gram table is the session-cached artifact
    _contam_gram_table (cache hit when the report already ran); the
    contaminated doc set is tiny by nature (benchmark overlap is
    rare), so the LEFT ANTI join back to the train side is a runtime
    broadcast under AQE — the train side never join-shuffles. Docs
    shorter than CONTAM_K tokens have zero grams and are retained by
    construction (nothing to overlap)."""
    g = _contam_gram_table(spark, sf_dir)
    # explicit broadcast (r14 opt round): the id list is the tiny
    # persisted artifact by nature, but the REBUILT contamination
    # chain behind the cache (inner join) carries a product-rule
    # static size estimate, which flipped this join to a plan-time
    # SortMergeJoin (AQE still broadcast it at runtime). The hint
    # pins the plan-time shape to the runtime one the budgets price.
    contaminated = F.broadcast(_contam_doc_ids(spark, sf_dir))
    train = g.filter(F.col("doc_id") % HOLDOUT_MOD != 0).select(
        "doc_id", F.size("grams").cast("long").alias("n_grams")
    )
    return train.join(contaminated, "doc_id", "left_anti")


def q_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level semantic-dedup retention set (SemDeDup-style):
    connected components over the verified cosine near-dup pairs
    (q_embedding_neardup), keep ONE representative per component —
    the min vec_id — plus every vector that appears in no pair.

    This is the embedding twin of the MinHash keep-one-per-cluster
    decision: pairs -> components -> retained set. Scale shape: the
    pair set is candidate-driven (LSH-banded, never all-pairs), the
    component loop is the shared O(log diameter) min-label-propagation
    with pointer jumping, and the final LEFT ANTI join removes the
    (small) non-canonical member set from the embeddings scan — AQE
    broadcasts it at runtime."""
    from .dedup import _cached_frame, q_embedding_neardup

    comp = _cached_frame(
        spark,
        sf_dir,
        "neardup_components",
        lambda: connected_components(
            q_embedding_neardup(spark, sf_dir).select(
                F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
            )
        ),
    )
    dropped = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias("vec_id")
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    return emb.join(dropped, "vec_id", "left_anti")


# mixture rebalance: cap any language at REBALANCE_CAP_PERMILLE of the
# (pre-sampling) total token mass. The per-language keep rate lives in
# the 16-bit fingerprint space: rate_64k = CAP_64K * total DIV lang
# with CAP_64K precomputed in Python so both engines share the exact
# constant. CAP_64K * total stays < 2^63 up to ~4.7e14 total tokens
# (~500x a 100 TB text corpus) — no overflow at target scale.
REBALANCE_CAP_PERMILLE = 300
REBALANCE_CAP_64K = REBALANCE_CAP_PERMILLE * 65536 // 1000


def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture rebalancing by deterministic downsampling: any language
    holding more than REBALANCE_CAP_PERMILLE of total token mass is
    hash-sampled down to (approximately) the cap; the rest keep rate
    1000. Emits the retained docs with the applied per-language rate.

    The keep decision is a pure function of doc_id (md5 16-bit
    fingerprint vs the language's rate), so the sample is reproducible
    across engines/runs and stable under corpus growth — the same
    property as q_stratified_sample, but with the rates COMPUTED from
    the observed mixture instead of configured. Rates use the
    PRE-sampling total (the standard one-pass approximation; an exact
    post-sampling share needs a fixpoint).

    Scale shape: one tiny per-language aggregate (handful of rows)
    window-totaled and broadcast-joined back onto the scan — the doc
    side never shuffles; the filter is scan-local."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_lang = base.groupBy("lang").agg(F.sum("n_tok").alias("lang_tokens"))
    rates = per_lang.select(
        "lang",
        capped_rate_64k_expr(REBALANCE_CAP_64K, "lang_tokens").alias(
            "rate_64k"
        ),
    )
    h16 = h16_of(F.col("doc_id"))
    # No explicit broadcast hint: rates is tiny but DERIVED (agg +
    # window), and forcing an eager broadcast exchange of a computed
    # subplan intermittently stalled on a busy driver (measured on
    # contamination's hit set — see that docstring); AQE picks the
    # broadcast join from runtime stats instead.
    return (
        base.join(rates, "lang")
        .select("doc_id", "lang", "n_tok", "rate_64k", h16.alias("h16"))
        .filter(F.col("h16") < F.col("rate_64k"))
        .select("doc_id", "lang", "n_tok", "rate_64k")
    )


KEYWORD_TOP_K = 3


def token_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus term-frequency table (doc_id, token, tf) — the ONE
    exploded token scan + (doc, token) aggregation the whole unigram
    family shares, session-cached like the dedup signature frames.

    Every consumer of per-doc or per-corpus unigram statistics
    (keyword_topk, inverted_index, token_rarity via token_freq,
    vocab_topk) derives from this artifact instead of re-running its
    own explode + aggregate: tf already holds one row per distinct
    (doc, token), so df = rows per token, occurrences = sum(tf), and
    posting lists need no dedup. At 100 TB this is the materialized
    term-frequency table a real pipeline persists once per corpus
    snapshot; locally the session cache plays that role."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        docs = spread_if_undersplit(
            spark, load_table(spark, sf_dir, "documents")
        )
        tok = docs.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
        )
        return tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))

    return _cached_frame(spark, sf_dir, "token_tf", _build)


def token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus unigram table (token, tok_count), derived from the
    cached token_tf artifact (occurrences = sum of per-doc tf) — so
    the explode never re-runs for frequency-side consumers."""
    from .dedup import _cached_frame

    return _cached_frame(
        spark,
        sf_dir,
        "token_freq",
        lambda: token_tf(spark, sf_dir)
        .groupBy("token")
        .agg(F.sum("tf").cast("long").alias("tok_count")),
    )


def token_tf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized term-statistics table (doc_id, token, tf, df,
    tok_count) — token_tf joined ONCE with its per-token document
    frequency and corpus occurrence count, session-cached. A
    persisted pipeline keeps exactly this table next to the tf table
    (it is the posting list with its document/corpus frequencies);
    locally the cache plays that role, so every per-doc unigram
    signal (rarity, keyword scoring, surprisal) is a single cached
    scan + one doc-keyed aggregation instead of re-paying the
    token-keyed vocab join per query."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        tf = token_tf(spark, sf_dir)
        per_tok = tf.groupBy("token").agg(
            F.count("*").cast("long").alias("df"),
            F.sum("tf").cast("long").alias("tok_count"),
        )
        return tf.join(per_tok, "token").select(
            "doc_id", "token", "tf", "df", "tok_count"
        )

    return _cached_frame(spark, sf_dir, "token_tf_stats", _build)


def q_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-KEYWORD_TOP_K keywords by tf-idf-style rarity
    weighting, with EXACT integer scoring: score = (tf * 1e6) DIV df.
    Ranking by tf/df is order-equivalent to tf*idf = tf*log(N/df) for
    a fixed corpus (log is monotone, N constant), and the integer
    quotient sidesteps cross-engine libm/float divergence entirely.
    Ties break on token text, so the top-k set is deterministic.

    Scale shape: reads the materialized term-stats artifact
    (token_tf_stats — df already joined in at cache build), so an
    execution is one cached scan + the per-doc top-k window over only
    that doc's distinct tokens; no vocab join in the per-query
    plan."""
    from pyspark.sql import Window

    stats = token_tf_stats(spark, sf_dir)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("token")
    )
    return (
        stats
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.expr("(tf * 1000000) DIV df").alias("score"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= KEYWORD_TOP_K)
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token -> posting-list inverted index: per token, document
    frequency, total occurrences, and the sorted posting list of
    doc_ids (comma-joined text, so the driver's value hash is exact
    and engine-independent).

    Scale shape: reads the shared session-cached token_tf artifact
    (doc_id, token, tf) — already one row per distinct (doc, token),
    so df is a plain row count, occurrences a sum of tf, and the
    posting list a collect_list with NO set-dedup buffer. At web
    scale posting lists for head tokens outgrow a single aggregation
    buffer — a production index shards the list by
    (token, doc_id DIV block) first; the per-token shape here is the
    final merge of that hierarchy."""
    tf = token_tf(spark, sf_dir)
    return tf.groupBy("token").agg(
        F.sum("tf").cast("long").alias("n_occurrences"),
        F.count("*").alias("df"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list("doc_id")),
                lambda d: d.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel over the TRAIN-side corpus: doc and
    token counts surviving each stage of the composed pipeline —
    quality gate (score >= 500), exact-dup canonicalization (keep the
    min doc_id per fingerprint among quality survivors), then n-gram
    decontamination. The report every curation run publishes so a
    mixture change is visible as "which stage ate the tokens".

    Stages compose sequentially (each flag implies the previous), so
    the four rows are monotone non-increasing. Scale shape: one
    quality-scored scan (pure Catalyst) with the canonical id from a
    CONDITIONAL WINDOW over the fingerprint (min ignores nulls, so
    min(CASE WHEN q_ok THEN doc_id END) is exactly the earlier
    groupBy-over-survivors + join-back at the same single exchange
    but HALF the scans — a fingerprint group with no quality
    survivor windows to null, and d_ok already requires q_ok), the
    (tiny) contaminated-doc LEFT join, then a SINGLE global aggregate
    with conditional sums — the 4 output rows come from stack() over
    that one row, so nothing wide ever shuffles."""
    from pyspark.sql import Window

    from .text import QUALITY_EXPR_T, quality_stat_columns

    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    base = docs.filter(F.col("doc_id") % HOLDOUT_MOD != 0).select(
        "doc_id", F.md5("text").alias("fp"), *quality_stat_columns()
    )
    score = F.expr(f"CAST({QUALITY_EXPR_T.format(d='DIV')} AS BIGINT)")
    scored = base.select(
        "doc_id",
        "fp",
        F.col("n_tokens").alias("n_tok"),
        (score >= 500).alias("q_ok"),
    )
    contam = F.broadcast(
        # explicit broadcast: tiny persisted id-list artifact; see
        # q_decontaminate's note on the rebuilt chain's static
        # size estimate (r14 opt round)
        _contam_doc_ids(spark, sf_dir).select(
            "doc_id", F.lit(True).alias("is_contam")
        )
    )
    flags = (
        scored.withColumn(
            "canon_id",
            F.min(F.when(F.col("q_ok"), F.col("doc_id"))).over(
                Window.partitionBy("fp")
            ),
        )
        .join(contam, "doc_id", "left")
        .select(
            "n_tok",
            "q_ok",
            (F.col("q_ok") & (F.col("doc_id") == F.col("canon_id"))).alias(
                "d_ok"
            ),
            (
                F.col("q_ok")
                & (F.col("doc_id") == F.col("canon_id"))
                & F.col("is_contam").isNull()
            ).alias("c_ok"),
        )
    )

    def n_of(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def t_of(cond):
        return F.sum(F.when(cond, F.col("n_tok")).otherwise(0)).cast("long")

    agg = flags.agg(
        F.count("*").alias("n0"),
        F.sum("n_tok").cast("long").alias("t0"),
        n_of(F.col("q_ok")).alias("n1"),
        t_of(F.col("q_ok")).alias("t1"),
        n_of(F.col("d_ok")).alias("n2"),
        t_of(F.col("d_ok")).alias("t2"),
        n_of(F.col("c_ok")).alias("n3"),
        t_of(F.col("c_ok")).alias("t3"),
    )
    return agg.select(
        F.expr(
            "stack(4, '0_total', n0, t0, '1_quality', n1, t1,"
            " '2_dedup', n2, t2, '3_decontaminated', n3, t3)"
            " AS (stage, n_docs, n_tokens)"
        )
    )


def q_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level dedup retention set: keep ONE representative
    (min doc_id) per MinHash-LSH near-dup component plus every
    unpaired document — the doc-side twin of q_semdedup_keep, and the
    set a dedup pass actually writes out for training. Same
    candidate-driven pair generation, same shared connected-components
    core, same AQE-broadcast LEFT ANTI of the (small) non-canonical
    member set against the documents scan."""
    comp = _minhash_components(spark, sf_dir)
    dropped = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return docs.join(dropped, "doc_id", "left_anti")


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE dedup retention set: keep the HIGHEST-quality
    member of each MinHash-LSH near-dup component (composite quality
    score DESC, doc_id ASC tie-break) plus every unpaired document —
    what a production dedup pass actually ships, vs q_dedup_keep's
    arbitrary min-doc_id representative: near-dup clusters routinely
    mix a clean original with truncated/boilerplate-wrapped copies,
    and keeping by cluster id keeps whichever crawled first. The
    score is the shared exact-integer QUALITY_EXPR_T (both engines
    agree at bucket boundaries), so the winner choice is
    deterministic cross-engine.

    Scale shape: the component labels are the session-cached
    artifact (_minhash_components); cluster MEMBERS are scored by
    one documents scan joined to the broadcast label set, ranked by
    ONE window over cluster_id — an exchange of member rows only,
    never the corpus — and the loser ids AQE-broadcast LEFT ANTI
    against a second scan-local scoring pass. The corpus itself is
    never shuffled (the q_dedup_keep anti-join stance); the price
    over q_dedup_keep is one extra scan + the members-only window."""
    from pyspark.sql import Window

    from .text import QUALITY_EXPR_T, quality_stat_columns

    comp = _minhash_components(spark, sf_dir)
    score = F.expr(f"CAST({QUALITY_EXPR_T.format(d='DIV')} AS BIGINT)")
    scored = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", *quality_stat_columns())
        .select("doc_id", "lang", score.alias("quality_score"))
    )
    members = scored.join(comp, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), "doc_id"
    )
    dropped = (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
    )
    return scored.join(dropped, "doc_id", "left_anti")


def q_source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-crawl-source curation dashboard: doc/token mass, mean
    quality score, exact-duplicate rate, and contamination rate — the
    report that decides which sources a mixture keeps, all exact
    integer arithmetic.

    dup_permille counts NON-CANONICAL exact copies (doc_id != min of
    its fingerprint group, fingerprints global across sources so a
    cross-source copy counts against the later source); contam
    permille is over the source's TRAIN-side docs. Scale shape: the
    canonical id comes from a WINDOW over the fingerprint — ONE
    exchange and one scan, where the earlier groupBy(fp) + join-back
    paid the same exchange but scanned (and md5'd) the corpus twice;
    the tiny contaminated set LEFT-joins under AQE broadcast, then a
    single groupBy(source) over a handful of result rows."""
    from pyspark.sql import Window

    from .text import QUALITY_EXPR_T, quality_stat_columns

    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    score = F.expr(f"CAST({QUALITY_EXPR_T.format(d='DIV')} AS BIGINT)")
    base = docs.select(
        "doc_id", "source", F.md5("text").alias("fp"), *quality_stat_columns()
    ).select(
        "doc_id",
        "source",
        "fp",
        F.col("n_tokens").alias("n_tok"),
        score.alias("score"),
    )
    contam = F.broadcast(
        # explicit broadcast: tiny persisted id-list artifact; see
        # q_decontaminate's note on the rebuilt chain's static
        # size estimate (r14 opt round)
        _contam_doc_ids(spark, sf_dir).select(
            "doc_id", F.lit(True).alias("is_contam")
        )
    )
    flags = (
        base.withColumn(
            "canon_id", F.min("doc_id").over(Window.partitionBy("fp"))
        )
        .join(contam, "doc_id", "left")
        .select(
            "source",
            "n_tok",
            "score",
            (F.col("doc_id") != F.col("canon_id")).alias("is_dup"),
            F.coalesce(F.col("is_contam"), F.lit(False)).alias("is_contam"),
            (F.col("doc_id") % HOLDOUT_MOD != 0).alias("is_train"),
        )
    )
    return flags.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.expr("sum(score) DIV count(*)").alias("mean_quality"),
        F.expr(
            "(1000 * sum(CASE WHEN is_dup THEN 1 ELSE 0 END)) DIV count(*)"
        ).alias("dup_permille"),
        F.expr(
            "CASE WHEN sum(CASE WHEN is_train THEN 1 ELSE 0 END) > 0 THEN"
            " (1000 * sum(CASE WHEN is_contam THEN 1 ELSE 0 END))"
            " DIV sum(CASE WHEN is_train THEN 1 ELSE 0 END)"
            " ELSE 0 END"
        ).alias("contam_permille"),
    )


# Past this many vocab entries the ranked (token -> id) table no
# longer ships as a literal map expression and q_packed_token_ids
# falls back to the general explode + vocab-join plan. The bound is
# the literal-expression-tree discipline of the PQ codebook (K x SUB
# = 2048 literals, analysis measured bounded by
# test_pq_quantize_plan_build_bounded); a real subword tokenizer's
# vocab (tens of thousands+) takes the join path.
VOCAB_LITERAL_MAX = 2048


def _vocab_id_pairs(spark: SparkSession, sf_dir: str):
    """Planner probe (r14 opt round): the ranked corpus vocabulary
    (token, token_id) as driver-side pairs when it fits the
    literal-map bound, else None. The ranked frame is session-cached
    (derived from the cached token_freq — a vocab-sized window, never
    the corpus), and the collect is limit(MAX + 1), so an over-bound
    vocab costs MAX+1 rows of driver transfer, not the table. Same
    probe class as _distinct_sources / the kmeans codebook loads."""
    from .dedup import _cached_frame
    from pyspark.sql import Window

    def _build() -> DataFrame:
        w = Window.orderBy(F.col("tok_count").desc(), F.col("token"))
        return token_freq(spark, sf_dir).select(
            "token", F.row_number().over(w).cast("long").alias("token_id")
        )

    vocab = _cached_frame(spark, sf_dir, "vocab_ids", _build)
    head = vocab.limit(VOCAB_LITERAL_MAX + 1).collect()
    if len(head) > VOCAB_LITERAL_MAX:
        return None
    return [(r["token"], r["token_id"]) for r in head]


def q_packed_token_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training pipeline's last mile: tokenize every document
    against the corpus vocabulary (id = rank by occurrence count desc,
    token asc — the vocab table as the lookup artifact), then emit one
    row per (lang, pack_id) sequence pack with the concatenated token
    ids of its documents in doc_id order — exactly what a loader
    streams into a trainer.

    Two plans behind one probe (r14 opt round — the q_source_overlap
    pattern; before it, the join plan ran unconditionally and its
    per-doc regroup exchange carried every token OCCURRENCE of the
    corpus, the widest shuffle of the whole packing family):

    - vocab <= VOCAB_LITERAL_MAX: tokenization is a SCAN-LOCAL
      literal-map lookup (try_element_at on the ranked vocab map)
      inside the same projection that sizes each doc, the pack
      assignment is q_pack_sequences' cumsum window INLINED on that
      frame (same window spec and budget constant, so assignments are
      identical by construction), and the final (lang, pack_id)
      regroup rides the window's lang hash partitioning (subset key —
      no second exchange). One exchange total; token ids never move
      as rows.
    - vocab > VOCAB_LITERAL_MAX (a real subword vocabulary): the
      general plan — posexplode -> vocab equi-join (broadcast-range
      head at any real scale, AQE skew split beyond) -> per-doc
      regroup via collect_list(struct(pos, id)) + array_sort, then
      the q_pack_sequences join. Everything that moves after the
      join is narrow ints / csv text.

    The two plans agree exactly: every corpus token is IN the vocab
    by construction (both derive from the same token_freq artifact),
    so the literal map never misses where the inner join would drop —
    including the empty-string token of an empty doc (the edge-docs
    fixture pins parity on both plans' corpora)."""
    from pyspark.sql import Window

    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    tk = F.split(F.col("text"), " ")
    pairs = _vocab_id_pairs(spark, sf_dir)
    if pairs is not None:
        vmap = F.create_map(
            *[x for t, i in pairs for x in (F.lit(t), F.lit(i))]
        )
        w = (
            Window.partitionBy("lang")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        base = (
            docs.select(
                "doc_id",
                "lang",
                F.size(tk).cast("long").alias("n_tokens"),
                F.array_join(
                    F.transform(
                        tk,
                        # NULL-on-missing under any ANSI setting; by
                        # construction it never misses (vocab is the
                        # corpus's own token set)
                        lambda t: F.try_element_at(vmap, t).cast(
                            "string"
                        ),
                    ),
                    ",",
                ).alias("ids_csv"),
            )
            .withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .select(
                "doc_id",
                "lang",
                "n_tokens",
                F.expr(
                    f"(cum_tokens - n_tokens) DIV {PACK_BUDGET_TOKENS}"
                ).alias("pack_id"),
                "ids_csv",
            )
        )
        return base.groupBy("lang", "pack_id").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "ids_csv"))
                    ),
                    lambda s: s["ids_csv"],
                ),
                ",",
            ).alias("pack_ids_csv"),
        )
    tok = docs.select(
        "doc_id",
        F.posexplode(tk).alias("pos", "token"),
    )
    # the frequency table is the SAME session-cached artifact
    # q_token_rarity / q_vocab_topk read (token_freq, derived from
    # the shared token_tf), so tokenization does not re-run the
    # corpus unigram aggregate per execution
    freq = token_freq(spark, sf_dir)
    w = Window.orderBy(F.col("tok_count").desc(), F.col("token"))
    vocab = freq.select(
        "token", F.row_number().over(w).cast("long").alias("token_id")
    )
    per_doc = (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "token_id"))
                    ),
                    lambda s: s["token_id"].cast("string"),
                ),
                ",",
            ).alias("ids_csv")
        )
    )
    packs = q_pack_sequences(spark, sf_dir)  # doc_id, lang, n_tokens, pack_id
    return (
        packs.join(per_doc, "doc_id")
        .groupBy("lang", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("doc_id", "ids_csv"))
                    ),
                    lambda s: s["ids_csv"],
                ),
                ",",
            ).alias("pack_ids_csv"),
        )
    )


def q_shard_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sink-layout QA: per split, how evenly token mass spreads over
    its shards — max/mean shard load in permille of perfect balance
    plus the min/max shard sizes. A skewed shard becomes the
    straggler task of every downstream training read, so this is the
    report a pipeline checks after each landing cycle.

    Same two-level aggregation spine as q_corpus_split (scan-local
    assignment, groupBy(split, shard) partials, then a tiny
    groupBy(split)); skew_permille = 1000 * max_shard_tokens *
    n_shards DIV total_tokens (1000 = perfectly balanced)."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = assign_split(docs).select(
        "split",
        "shard",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
    )
    per_shard = assigned.groupBy("split", "shard").agg(
        F.sum("n_tok").alias("shard_tokens"),
    )
    return per_shard.groupBy("split").agg(
        F.count("*").alias("n_shards"),
        F.sum("shard_tokens").alias("n_tokens"),
        F.min("shard_tokens").alias("min_shard_tokens"),
        F.max("shard_tokens").alias("max_shard_tokens"),
    ).select(
        "split",
        "n_shards",
        "n_tokens",
        "min_shard_tokens",
        "max_shard_tokens",
        F.expr(
            "(1000 * max_shard_tokens * n_shards) DIV n_tokens"
        ).alias("skew_permille"),
    )


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture re-weighting (alpha = 0.5): per
    language, the sampling rate proportional to sqrt(token mass) —
    the standard up-weighting of tail languages / domains
    (multilingual LM mixtures sample p_l ∝ m_l^alpha with alpha<1;
    alpha=1/2 is the one exactly expressible in integers: for
    m < 2^52, sqrt is correctly rounded in IEEE double and an
    integer crossing would require m within half an ulp of a perfect
    square, impossible for exact integers — so floor(sqrt(m)) is
    engine-exact where a general m^alpha would diverge in libm).

    One aggregation shuffle on lang; the normalizing window runs over
    the per-language rows (bounded by #languages, not data)."""
    docs = load_table(spark, sf_dir, "documents")
    per_lang = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("long")
        .alias("n_tokens"),
    )
    weighted = per_lang.select(
        "lang",
        "n_tokens",
        F.floor(F.sqrt(F.col("n_tokens"))).cast("long").alias("weight"),
    )
    return weighted.select(
        "lang",
        "n_tokens",
        "weight",
        F.expr("(1000 * weight) DIV (sum(weight) OVER ())").alias(
            "sample_permille"
        ),
        F.expr(
            "(n_tokens * ((1000 * weight) DIV (sum(weight) OVER ())))"
            " DIV 1000"
        ).alias("expected_tokens"),
    )


CONTEXT_BUCKETS = (16, 24, 32, 48, 64, 96, 128)


def q_context_length_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-length distribution: docs and token mass per token-
    length bucket — the report that sizes packing budgets, padding
    waste, and long-context data supply before training.

    Buckets are a fixed CASE ladder (engine-exact; floor(log2) would
    ride on libm rounding at power boundaries). ZERO wide operations
    beyond one bounded aggregation: the bucket is a per-row
    expression, the aggregate has map-side partials, and the permille
    window runs over at most len(CONTEXT_BUCKETS)+1 rows."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    lo = F.lit(0).cast("long")
    for b in CONTEXT_BUCKETS:
        lo = F.when(n_tok >= b, F.lit(b).cast("long")).otherwise(lo)
    per = (
        docs.select(lo.alias("bucket_lo"), n_tok.alias("_n"))
        .groupBy("bucket_lo")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("_n").cast("long").alias("n_tokens"),
        )
    )
    return per.select(
        "bucket_lo",
        "n_docs",
        "n_tokens",
        F.expr("(1000 * n_docs) DIV (sum(n_docs) OVER ())").alias(
            "doc_permille"
        ),
        F.expr("(1000 * n_tokens) DIV (sum(n_tokens) OVER ())").alias(
            "token_permille"
        ),
    )


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split contamination matrix: for each ordered pair of
    corpus splits (train/val/test), how many distinct CONTAM_K-gram
    hashes the two sides share, and that overlap in permille of the
    smaller side's gram vocabulary — the leakage audit run after
    every split assignment (a val set sharing most of its n-grams
    with train measures memorization, not generalization).

    Scale shape: reuses the session-cached contamination gram table
    (doc_id, grams) + the scan-local split assignment; ONE shuffle
    aggregates (gram_h -> bitmask of splits seen) via bit_or with
    map-side partials, a second bounded aggregation folds the at most
    7 mask values into one row of conditional sums, and stack() emits
    the 3 pair rows — grams move once, as narrow longs."""
    def _build_masks() -> DataFrame:
        g = assign_split(_contam_gram_table(spark, sf_dir))
        bit = (
            F.when(F.col("split") == "train", F.lit(1))
            .when(F.col("split") == "val", F.lit(2))
            .otherwise(F.lit(4))
        )
        per_gram = (
            g.select(F.explode("grams").alias("gram_h"), bit.alias("b"))
            .groupBy("gram_h")
            .agg(F.expr("bit_or(b)").alias("mask"))
        )
        return per_gram.groupBy("mask").agg(F.count("*").alias("n"))

    # at most 7 rows after the fold, paid for by one gram explode +
    # exchange — session-cached for the same reason as
    # source_overlap's mask histogram (the artifact, not the report,
    # is the expensive part)
    from .dedup import _cached_frame

    masks = _cached_frame(spark, sf_dir, "split_leakage_masks", _build_masks)

    def _tot(b: int) -> F.Column:
        return F.coalesce(
            F.sum(F.when(F.expr(f"mask & {b}") != 0, F.col("n"))),
            F.lit(0),
        ).cast("long")

    def _shared(b1: int, b2: int) -> F.Column:
        both = F.expr(f"(mask & {b1}) != 0 AND (mask & {b2}) != 0")
        return F.coalesce(
            F.sum(F.when(both, F.col("n"))), F.lit(0)
        ).cast("long")

    one = masks.agg(
        _tot(1).alias("g_train"),
        _tot(2).alias("g_val"),
        _tot(4).alias("g_test"),
        _shared(1, 2).alias("s_tv"),
        _shared(1, 4).alias("s_tt"),
        _shared(2, 4).alias("s_vt"),
    )
    pairs = one.select(
        F.expr(
            "stack(3,"
            " 'train', 'val',  s_tv, g_train, g_val,"
            " 'train', 'test', s_tt, g_train, g_test,"
            " 'val',   'test', s_vt, g_val,   g_test)"
            " AS (split_a, split_b, shared_grams, a_grams, b_grams)"
        )
    )
    return pairs.select(
        "split_a",
        "split_b",
        "shared_grams",
        "a_grams",
        "b_grams",
        F.expr(
            "CASE WHEN least(a_grams, b_grams) > 0 THEN"
            " (1000 * shared_grams) DIV least(a_grams, b_grams)"
            " ELSE 0 END"
        ).alias("leak_permille"),
    )


# Past this many distinct sources the per-gram source set no longer
# fits a single long bitmask and q_source_overlap falls back to the
# general sorted-set plan (collect_set of source names per gram).
SOURCE_BITMASK_MAX = 64


def _distinct_sources(spark: SparkSession, sf_dir: str) -> list:
    """Sorted distinct source names — the planner probe that picks
    the bitmask vs sorted-set path. K-row collect off a session-
    cached frame (same class as the kmeans codebook loads)."""
    from .dedup import _cached_frame

    def _build():
        return (
            load_table(spark, sf_dir, "documents").select("source").distinct()
        )

    df = _cached_frame(spark, sf_dir, "distinct_sources", _build)
    return sorted(r[0] for r in df.collect())


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE duplication matrix: for each unordered pair of
    crawl sources sharing at least one CONTAM_K-gram, the count of
    distinct shared gram hashes and that overlap in permille of the
    smaller side's gram vocabulary — the crawl-overlap audit run
    before fixing a source mixture (two dumps of the same site
    inflate a naive per-source token budget; this is the
    source-dimension twin of q_split_leakage).

    Two plans behind one probe (count(distinct source), K-row
    collect, session-cached):

    - K <= SOURCE_BITMASK_MAX: split_leakage's bit_or idiom
      generalized — source -> bit index via a literal map lookup
      (scan-local, NO dim join: an int-id join variant measured
      worse), ONE gram-keyed shuffle of narrow (gram_h, long) pairs
      with bit_or map-side partials, then pair expansion and
      per-source totals both fold from the tiny distinct-mask frame
      (HOFs run on masks, never per gram). Bit 63 going negative is
      fine: bit_or / & / != 0 are two's-complement-safe.
    - K > SOURCE_BITMASK_MAX: the general sorted-source-set plan
      (still one gram-keyed shuffle; sets bounded by K, pair
      expansion inside the set — never a gram self-join).

    Parity between the paths is pinned by tests/test_properties.py::
    test_source_overlap_bitmask_general_parity.
    """
    if len(_distinct_sources(spark, sf_dir)) <= SOURCE_BITMASK_MAX:
        return _source_overlap_bitmask(spark, sf_dir)
    return _source_overlap_general(spark, sf_dir)


def _source_overlap_bitmask(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = _distinct_sources(spark, sf_dir)
    k = len(sources)
    assert k <= SOURCE_BITMASK_MAX, k
    g = _contam_gram_table(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    src_idx = F.create_map(
        *[x for i, s in enumerate(sources) for x in (F.lit(s), F.lit(i))]
    )
    # build _idx before the explode so the map lookup runs once per
    # doc, not once per gram
    def _build_masks() -> DataFrame:
        exploded = (
            g.join(docs, "doc_id")
            .select("grams", src_idx[F.col("source")].alias("_idx"))
            .select(
                F.explode("grams").alias("gram_h"),
                F.expr("shiftleft(CAST(1 AS BIGINT), _idx)").alias("b"),
            )
        )
        per_gram = exploded.groupBy("gram_h").agg(
            F.expr("bit_or(b)").alias("mask")
        )
        return per_gram.groupBy("mask").agg(F.count("*").alias("n"))

    # the (mask -> gram count) histogram is the expensive intermediate
    # (one full gram explode + the gram-keyed exchange) and it is
    # BOUNDED (distinct masks, not grams) — session-cache it like the
    # other corpus artifacts so every execution pays only the tiny
    # pair-expansion folds (bench: the gram shuffle re-ran per
    # execution and dominated at ~1.2 s; the fold floor is ~0.1 s)
    from .dedup import _cached_frame

    masks = _cached_frame(spark, sf_dir, "source_overlap_masks", _build_masks)
    set_bits = F.expr(
        f"filter(sequence(0, {k - 1}),"
        " i -> (mask & shiftleft(CAST(1 AS BIGINT), i)) != 0)"
    )
    with_idx = masks.select(F.col("n"), set_bits.alias("_ii"))
    per_idx = (
        with_idx.select(F.explode("_ii").alias("_idx"), "n")
        .groupBy("_idx")
        .agg(F.sum("n").cast("long").alias("_grams"))
    )
    sets = with_idx.filter(F.size("_ii") >= 2)
    ii = F.col("_ii")
    combos = F.flatten(
        F.transform(
            ii,
            lambda x, i: F.transform(
                F.slice(ii, i + 2, F.size(ii)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(combos).alias("p"), "n")
        .groupBy(F.col("p.a").alias("_ia"), F.col("p.b").alias("_ib"))
        .agg(F.sum("n").cast("long").alias("shared_grams"))
    )
    pa = per_idx.select(
        F.col("_idx").alias("_ia"), F.col("_grams").alias("a_grams")
    )
    pb = per_idx.select(
        F.col("_idx").alias("_ib"), F.col("_grams").alias("b_grams")
    )
    # idx -> name on the <=K^2/2 result rows via a literal array
    # (sorted sources, ascending idx => source_a < source_b exactly
    # like the general path's sort_array ordering)
    names = F.array(*[F.lit(s) for s in sources])

    def name_of(c: str) -> F.Column:
        return F.element_at(names, F.col(c) + 1)

    return (
        pairs.join(pa, "_ia")
        .join(pb, "_ib")
        .select(
            name_of("_ia").alias("source_a"),
            name_of("_ib").alias("source_b"),
            "shared_grams",
            "a_grams",
            "b_grams",
            F.expr(
                "(1000 * shared_grams) DIV least(a_grams, b_grams)"
            ).alias("overlap_permille"),
        )
    )


def _source_overlap_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _contam_gram_table(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    # ONE gram-keyed shuffle: collect_set dedups sources per gram
    # inside the aggregation (map-side partials), so no separate
    # distinct pass over the exploded rows; per-source totals fall out
    # of the grouped frame via a vocab-sized re-explode instead of a
    # second corpus-sized exchange
    grouped = (
        g.join(docs, "doc_id")
        .select("source", F.explode("grams").alias("gram_h"))
        .groupBy("gram_h")
        .agg(F.sort_array(F.collect_set("source")).alias("_ss"))
    )
    per = (
        grouped.select(F.explode("_ss").alias("source"))
        .groupBy("source")
        .agg(F.count("*").alias("_n"))
    )
    sets = grouped.filter(F.size("_ss") >= 2)
    ss = F.col("_ss")
    combos = F.flatten(
        F.transform(
            ss,
            lambda x, i: F.transform(
                F.slice(ss, i + 2, F.size(ss)),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    pairs = (
        sets.select(F.explode(combos).alias("p"))
        .groupBy(
            F.col("p.a").alias("source_a"), F.col("p.b").alias("source_b")
        )
        .agg(F.count("*").alias("shared_grams"))
    )
    pa = per.select(
        F.col("source").alias("source_a"), F.col("_n").alias("a_grams")
    )
    pb = per.select(
        F.col("source").alias("source_b"), F.col("_n").alias("b_grams")
    )
    return (
        pairs.join(pa, "source_a")
        .join(pb, "source_b")
        .select(
            "source_a",
            "source_b",
            "shared_grams",
            "a_grams",
            "b_grams",
            F.expr(
                "(1000 * shared_grams) DIV least(a_grams, b_grams)"
            ).alias("overlap_permille"),
        )
    )


def q_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM surprisal per document, in exact integer floor-log2
    bits: surprisal(doc) = sum over occurrences of
    (L(total_tokens) - L(count(token))) where L(x) = floor(log2 x)+1
    = length(bin(x)) — the perplexity-style fluency signal (high
    surprisal = rare-token-heavy doc) computed WITHOUT floating-point
    logs, so both engines agree bit-for-bit where ln()-based
    cross-entropy would drift in libm.

    Scale shape: zero new scans AND zero per-query joins beyond the
    one-row total broadcast — the per-(doc, token) rows with their
    corpus counts are the materialized term-stats artifact
    (token_tf_stats, shared with rarity/keyword scoring); the corpus
    total folds to a ONE-ROW broadcast (the BM25-stats pattern). One
    aggregation back to the doc key."""
    stats = token_tf_stats(spark, sf_dir)
    freq = token_freq(spark, sf_dir)
    total = freq.agg(
        F.sum("tok_count").cast("long").alias("_total")
    )
    bits = F.length(F.bin(F.col("tok_count"))).cast("long")
    total_bits = F.length(F.bin(F.col("_total"))).cast("long")
    return (
        stats
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * (total_bits - bits))
            .cast("long")
            .alias("surprisal_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "surprisal_bits",
            F.expr("(1000 * surprisal_bits) DIV n_tokens").alias(
                "mean_millibits"
            ),
        )
    )


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution entropy — the doc-LOCAL
    diversity signal complementing q_unigram_surprisal's
    corpus-relative one: a doc repeating one token has ~zero entropy
    (boilerplate, keyword stuffing), a doc of all-distinct tokens
    scores L(n) bits. Entropy is the tf-weighted floor-log2 form
    H_bits = sum(tf * (L(n_tokens) - L(tf))) with L(x) =
    length(bin(x)) — exact integers, no libm (the
    q_unigram_surprisal discipline).

    Scale shape: ONE hash aggregation over the session-cached
    token_tf artifact — the identity sum(tf * (L(n) - L(tf))) =
    n * L(n) - sum(tf * L(tf)) pushes the doc-total term OUT of the
    per-row weighting, so no window pass over the tf table is needed
    (a window would add a per-doc sort on the same exchange); both
    accumulators fold map-side."""
    tf = token_tf(spark, sf_dir)
    bits = lambda c: F.length(F.bin(c)).cast("long")  # noqa: E731
    return (
        tf.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("distinct_tokens"),
            F.sum(F.col("tf") * bits(F.col("tf")))
            .cast("long")
            .alias("_tf_bits"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "distinct_tokens",
            (F.col("n_tokens") * bits(F.col("n_tokens")) - F.col("_tf_bits"))
            .cast("long")
            .alias("entropy_bits_sum"),
        )
        .select(
            "*",
            F.expr("(1000 * entropy_bits_sum) DIV n_tokens").alias(
                "mean_millibits"
            ),
        )
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language: characters per (whitespace)
    token and tokens per document — the coverage report that flags
    languages a tokenizer segments poorly (high chars/token = long
    unsplit runs; production swaps the whitespace splitter for the
    real tokenizer, the aggregation is identical).

    Scale shape: scan-local per-row counts, ONE language-keyed
    aggregation with map-side partials — cardinality is the language
    set, so the reduce side is trivially broadcast-sized."""
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " ")).cast("long")
    return (
        docs.select("lang", n_tok.alias("_t"), F.col("n_chars"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_t").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "n_chars",
            F.expr("(1000 * n_chars) DIV n_tokens").alias(
                "chars_per_token_milli"
            ),
            F.expr("(1000 * n_tokens) DIV n_docs").alias(
                "tokens_per_doc_milli"
            ),
        )
    )


def q_doc_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus length-distribution deciles over n_chars: each decile's
    doc count, char-length bounds, and char mass — the data-driven
    complement of q_context_length_report's fixed token buckets
    (deciles move with the corpus; fixed buckets compare across
    corpora). Ordering (n_chars, doc_id) makes ntile deterministic,
    and both engines implement SQL-standard ntile (larger buckets
    first), so the decile assignment is engine-exact.

    Scale shape: a global ntile needs a total order — ONE range
    exchange (Spark samples split points; no single-partition
    collapse) followed by a 10-row aggregation. At 100 TB the same
    report would come from approx percentiles if the exact decile
    BOUNDS were not the deliverable; the exact form is the one the
    oracle can pin."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    w = Window.orderBy("n_chars", "doc_id")
    return (
        docs.select("doc_id", "n_chars")
        .withColumn("decile", F.ntile(10).over(w).cast("long"))
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


STOPWORD_TOP = 20


def q_stopword_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven stopword induction: the STOPWORD_TOP tokens by
    document frequency, with document-coverage permille and corpus
    occurrence count — the corpus-specific stopword list a pipeline
    derives before tf-idf weighting or index pruning (a curated
    static list misses domain function words; df coverage finds
    them). Distinct from vocab_topk's occurrence head: a token
    repeated heavily in few docs ranks high there but low here.

    Scale shape: one vocab-keyed aggregation over the cached
    term-stats artifact (df/tok_count are constant per token, so
    max() just collapses the per-doc rows), a one-row doc-count
    broadcast, and a TakeOrdered head — rank window over the
    STOPWORD_TOP survivors only."""
    stats = token_tf_stats(spark, sf_dir)
    per_tok = stats.groupBy("token").agg(
        F.max("df").alias("df"), F.max("tok_count").alias("tok_count")
    )
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count("*").cast("long").alias("_n_docs")
    )
    scored = per_tok.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "df",
        "tok_count",
        F.expr("(1000 * df) DIV _n_docs").alias("df_permille"),
    )
    top = scored.orderBy(F.col("df").desc(), "token").limit(STOPWORD_TOP)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("df").desc(), "token")
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "df",
        "tok_count",
        "df_permille",
    )


DSIR_BUCKETS = 1 << 16  # hashed n-gram feature space (DSIR's trick:
# fixed buckets keep the count table broadcastable at ANY corpus size)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al.,
    "Data Selection for Language Models via Importance Resampling"):
    score each TRAIN document by how much more its hashed n-gram
    features look like the TARGET distribution (the holdout split)
    than like the raw corpus — weight_bits(doc) = sum over the doc's
    distinct CONTAM_K-grams of L(target_count+1) - L(raw_count+1),
    with L(x) = floor(log2 x)+1 = length(bin(x)), the repo's exact
    integer log discipline (libm-free, so both engines agree
    bit-for-bit). per_gram_milli length-normalizes for ranking.

    Hashed features are the scale story: grams fold into
    DSIR_BUCKETS (2^16) buckets, so the count table is BOUNDED and
    AQE-broadcasts back to the exploded train side no matter how
    large the corpus — one bounded bucket aggregation + one doc-keyed
    aggregation, never a vocab-sized shuffle join. Reads the
    session-cached contamination gram table; docs with no grams
    (shorter than CONTAM_K tokens) have no feature mass and emit no
    row, like the contamination report."""
    return _dsir_weights_frame(spark, sf_dir)


def _dsir_weights_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc DSIR weight table, session-cached ('dsir_weights'):
    a data-selection run computes weights ONCE per corpus snapshot and
    the whole pipeline reads them — the report (q_dsir_weights), the
    resampler (q_dsir_resample), and the acceptance report
    (q_dsir_mixture_shift) — instead of re-running the gram explode +
    bucket join per consumer (r9 bench: the repeated chain was each
    consumer's dominant cost)."""
    from .dedup import _cached_frame

    return _cached_frame(
        spark,
        sf_dir,
        "dsir_weights",
        lambda: _build_dsir_weights(spark, sf_dir),
    )


def _build_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The uncached weight plan — what _dsir_weights_frame
    materializes, and what the plan-shape pin inspects (the cached
    frame would show only an InMemoryTableScan)."""
    g = _contam_gram_table(spark, sf_dir)
    is_tgt = F.col("doc_id") % HOLDOUT_MOD == 0
    exploded = g.select(
        "doc_id",
        F.explode("grams").alias("_gram_h"),
        is_tgt.alias("_t"),
    ).select(
        "doc_id",
        F.pmod(F.col("_gram_h"), F.lit(DSIR_BUCKETS)).alias("bucket"),
        "_t",
    )
    stats = exploded.groupBy("bucket").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0))
        .cast("long")
        .alias("tgt_n"),
        F.sum(F.when(~F.col("_t"), 1).otherwise(0))
        .cast("long")
        .alias("raw_n"),
    )

    def L(c: F.Column) -> F.Column:
        return F.length(F.bin(c)).cast("long")

    bits = L(F.col("tgt_n") + 1) - L(F.col("raw_n") + 1)
    per_doc = (
        exploded.filter(~F.col("_t"))
        .join(stats, "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(bits).cast("long").alias("weight_bits"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "weight_bits",
        F.expr("(1000 * weight_bits) DIV n_grams").alias("per_gram_milli"),
    )


def dsir_bucket_bits_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(bucket, bits): the per-bucket DSIR log-ratio table — THE
    broadcastable artifact of the DSIR pipeline (<= DSIR_BUCKETS =
    2^16 rows at ANY corpus size, the hashed-feature trick's whole
    point). bits = L(tgt_n+1) - L(raw_n+1) with L(x) = length(bin(x)),
    exactly the per-bucket term _build_dsir_weights folds per doc; a
    bucket no snapshot gram hashed into carries implicit bits 0
    (L(1) - L(1)), which is what a consumer's missing-key lookup must
    coalesce to. Session-cached 'dsir_bucket_bits'; the streaming
    resample gate (streaming/ingest.dsir_gate_stream) broadcasts it
    to score documents ON ARRIVAL with the identical integer rule the
    batch resampler applies."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        g = _contam_gram_table(spark, sf_dir)
        is_tgt = F.col("doc_id") % HOLDOUT_MOD == 0
        exploded = g.select(
            F.explode("grams").alias("_gram_h"), is_tgt.alias("_t")
        ).select(
            F.pmod(F.col("_gram_h"), F.lit(DSIR_BUCKETS)).alias("bucket"),
            "_t",
        )
        stats = exploded.groupBy("bucket").agg(
            F.sum(F.when(F.col("_t"), 1).otherwise(0))
            .cast("long")
            .alias("tgt_n"),
            F.sum(F.when(~F.col("_t"), 1).otherwise(0))
            .cast("long")
            .alias("raw_n"),
        )

        def L(c: F.Column) -> F.Column:
            return F.length(F.bin(c)).cast("long")

        return stats.select(
            "bucket",
            (L(F.col("tgt_n") + 1) - L(F.col("raw_n") + 1)).alias("bits"),
        )

    return _cached_frame(spark, sf_dir, "dsir_bucket_bits", _build)


# DSIR resampling rate: a clamped LINEAR map of per_gram_milli around
# the corpus-typical -1 bit/gram (the first-order integer-exact
# approximation of the exponential importance ratio, slope 2 =
# temperature sharpening — the observed per-gram spread on hashed
# 2^16-bucket features is ~0.2 bits, so the raw exponential would
# barely separate documents).
DSIR_CENTER_MILLI = -1000
DSIR_SLOPE = 2


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RESAMPLE half of the DSIR pipeline (Xie et al.): keep each
    train document with probability proportional to its hashed-n-gram
    importance weight — q_dsir_weights' per_gram_milli mapped to a
    clamped keep-rate permille, decided against the deterministic
    md5(doc_id) uniform draw (same engine-reproducible draw discipline
    as q_importance_resampling, which resamples on the RULE-based
    quality score; this is the target-distribution-driven variant the
    DSIR paper actually runs: weights -> resample -> mixture shift,
    see q_dsir_mixture_shift for the shift report).

    Scale shape: rides the session-cached gram/bucket artifacts via
    q_dsir_weights (one bounded 2^16-bucket aggregation broadcast
    back + one doc-keyed aggregation); the rate map and draw are
    scan-local expressions over that per-doc table — no new shuffle.
    Domain = featurizable train docs (>= CONTAM_K tokens), exactly the
    set DSIR can score."""
    w = q_dsir_weights(spark, sf_dir)
    rate = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(1000).cast("long"),
            (
                F.lit(1000)
                + (F.col("per_gram_milli") - DSIR_CENTER_MILLI) * DSIR_SLOPE
            ).cast("long"),
        ),
    )
    draw = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
        ).cast("long")
        % 1000
    )
    return w.select(
        "doc_id",
        "per_gram_milli",
        rate.alias("rate_permille"),
        draw.alias("hash_permille"),
        (draw < rate).alias("kept"),
    )


def q_dsir_mixture_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR pipeline's acceptance report: per source, the token
    share of the RAW train corpus, of the RESAMPLED (kept) corpus, and
    of the TARGET (holdout) — plus shift_permille = how much closer
    the kept mixture sits to the target than the raw mixture did
    (|raw - target| - |kept - target|, in permille points of token
    share, positive = moved toward the target). This is the row a
    data-selection run is judged on before anyone trains on the
    resampled corpus. An empty kept set (every rate_permille 0) is
    reported honestly as kept_permille 0 everywhere instead of a
    divide-by-zero (ADVICE r9) — the guard covers all three share
    denominators.

    Measured honesty note (r9, sf0.01): the synthetic testdata's
    holdout is doc_id % HOLDOUT_MOD — uniform over sources, with
    per-source mean per_gram_milli flat within ~3% — so the measured
    shift here is ~0 by construction, and no resampler could steer
    this corpus's source mixture. On a real corpus, sources have
    distinctive vocabulary, target-likeness concentrates, and
    shift_permille is the acceptance number.

    Scale shape: one documents scan for (source, n_tokens) + an AQE
    broadcast join of the kept-id set projected off the cached DSIR
    decision table, then a bounded per-source aggregation; the three
    share denominators are window sums over the <= #sources rows of
    the aggregate — bounded by geometry, not data."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("_n_tok"),
    )
    kept = (
        q_dsir_resample(spark, sf_dir)
        .filter(F.col("kept"))
        .select("doc_id", F.lit(True).alias("_kept"))
    )
    is_target = F.col("doc_id") % HOLDOUT_MOD == 0
    flagged = docs.join(kept, "doc_id", "left").select(
        "source",
        "_n_tok",
        is_target.alias("_t"),
        F.coalesce(F.col("_kept"), F.lit(False)).alias("_k"),
    )
    per = flagged.groupBy("source").agg(
        F.sum(F.when(~F.col("_t"), F.col("_n_tok")).otherwise(0))
        .cast("long")
        .alias("train_tokens"),
        F.sum(F.when(F.col("_k"), F.col("_n_tok")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        F.sum(F.when(F.col("_t"), F.col("_n_tok")).otherwise(0))
        .cast("long")
        .alias("target_tokens"),
    )
    totals = per.agg(
        F.sum("train_tokens").alias("_str"),
        F.sum("kept_tokens").alias("_ske"),
        F.sum("target_tokens").alias("_stg"),
    )
    shares = per.crossJoin(F.broadcast(totals)).select(
        "source",
        "train_tokens",
        "kept_tokens",
        "target_tokens",
        F.expr("1000 * train_tokens").alias("_tr"),
        F.expr("1000 * kept_tokens").alias("_ke"),
        F.expr("1000 * target_tokens").alias("_tg"),
        "_str",
        "_ske",
        "_stg",
    ).select(
        "source",
        "train_tokens",
        "kept_tokens",
        "target_tokens",
        F.expr(
            "CASE WHEN _str > 0 THEN _tr DIV _str ELSE 0 END"
        ).alias("train_permille"),
        F.expr(
            "CASE WHEN _ske > 0 THEN _ke DIV _ske ELSE 0 END"
        ).alias("kept_permille"),
        F.expr(
            "CASE WHEN _stg > 0 THEN _tg DIV _stg ELSE 0 END"
        ).alias("target_permille"),
    )
    return shares.select(
        "*",
        (
            F.abs(F.col("train_permille") - F.col("target_permille"))
            - F.abs(F.col("kept_permille") - F.col("target_permille"))
        )
        .cast("long")
        .alias("shift_permille"),
    )


def q_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score reliability table: for each composite score band
    (the rule score takes values {0,250,500,750,1000}), the doc/token
    mass plus the exact-duplicate and contamination rates inside the
    band — the calibration check run before trusting the score as a
    sampling weight (q_importance_resampling keeps docs in proportion
    to it; if dup/contam rates do NOT fall as the score rises, the
    score is decorative and the sampler just reshuffles junk).

    Scale shape: q_source_quality_report's machinery keyed by score
    band instead of source — one quality-scored scan, the canonical
    id from ONE window over the fingerprint, the tiny contaminated
    set LEFT-joined under AQE broadcast, then a single bounded
    aggregation (at most 5 rows out)."""
    from pyspark.sql import Window

    from .text import QUALITY_EXPR_T, quality_stat_columns

    docs = spread_if_undersplit(spark, load_table(spark, sf_dir, "documents"))
    score = F.expr(f"CAST({QUALITY_EXPR_T.format(d='DIV')} AS BIGINT)")
    base = docs.select(
        "doc_id", F.md5("text").alias("fp"), *quality_stat_columns()
    ).select(
        "doc_id",
        "fp",
        F.col("n_tokens").alias("n_tok"),
        score.alias("score_permille"),
    )
    contam = F.broadcast(
        # explicit broadcast: tiny persisted id-list artifact; see
        # q_decontaminate's note on the rebuilt chain's static
        # size estimate (r14 opt round)
        _contam_doc_ids(spark, sf_dir).select(
            "doc_id", F.lit(True).alias("is_contam")
        )
    )
    flags = (
        base.withColumn(
            "canon_id", F.min("doc_id").over(Window.partitionBy("fp"))
        )
        .join(contam, "doc_id", "left")
        .select(
            "score_permille",
            "n_tok",
            (F.col("doc_id") != F.col("canon_id")).alias("is_dup"),
            F.coalesce(F.col("is_contam"), F.lit(False)).alias("is_contam"),
            (F.col("doc_id") % HOLDOUT_MOD != 0).alias("is_train"),
        )
    )
    return flags.groupBy("score_permille").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.expr(
            "(1000 * sum(CASE WHEN is_dup THEN 1 ELSE 0 END)) DIV count(*)"
        ).alias("dup_permille"),
        F.expr(
            "CASE WHEN sum(CASE WHEN is_train THEN 1 ELSE 0 END) > 0 THEN"
            " (1000 * sum(CASE WHEN is_contam THEN 1 ELSE 0 END))"
            " DIV sum(CASE WHEN is_train THEN 1 ELSE 0 END)"
            " ELSE 0 END"
        ).alias("contam_permille"),
    )

"""Property-based tests (hypothesis): the custom operators must agree
with brute-force Python reference implementations on arbitrary inputs,
not just the hand-picked fixtures. Few examples, deadline off — each
example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from jaws_effective_processor_spark.operators.asof import asof_join
from jaws_effective_processor_spark.operators.compaction import latest_per_key
from jaws_effective_processor_spark.operators.skew import salted_join

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_KEYS = st.sampled_from(["a", "b", "c"])
_TS = st.integers(min_value=0, max_value=50)


@st.composite
def _asof_inputs(draw):
    left = draw(
        st.lists(st.tuples(_KEYS, _TS), min_size=1, max_size=15)
    )
    # right unique per (key, ts) — the operator's documented contract
    right_map = draw(
        st.dictionaries(
            st.tuples(_KEYS, _TS),
            st.integers(min_value=0, max_value=99),
            max_size=15,
        )
    )
    return left, sorted((k, t, v) for (k, t), v in right_map.items())


@given(_asof_inputs())
@_SETTINGS
def test_asof_join_matches_bruteforce(spark, inputs):
    left_rows, right_rows = inputs
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left_rows)],
        "lid long, k string, ts long",
    )
    right = spark.createDataFrame(
        right_rows or [("zzz", -1, -1)], "k string, ts long, v long"
    )
    got = {
        r["lid"]: r["v"]
        for r in asof_join(left, right, key="k", ts="ts", payload_cols=["v"]).collect()
    }

    def brute(k, t):
        cands = [(rt, v) for rk, rt, v in right_rows if rk == k and rt <= t]
        return max(cands)[1] if cands else None

    want = {i: brute(k, t) for i, (k, t) in enumerate(left_rows)}
    assert got == want


@given(
    st.lists(
        st.tuples(_KEYS, st.integers(0, 999), st.integers(-5, 5)),
        min_size=1,
        max_size=25,
    )
)
@_SETTINGS
def test_latest_per_key_matches_bruteforce(spark, rows):
    # unique seq per row (append a counter) — the changelog contract
    data = [(k, seq * 100 + i, v) for i, (k, seq, v) in enumerate(rows)]
    df = spark.createDataFrame(data, "k string, seq long, v long")
    got = {(r["k"], r["seq"], r["v"]) for r in latest_per_key(df, ["k"]).collect()}
    want = set()
    for k in {d[0] for d in data}:
        want.add(max((d for d in data if d[0] == k), key=lambda d: d[1]))
    assert got == want


@given(
    st.lists(st.tuples(_KEYS, st.integers(0, 9)), min_size=1, max_size=20),
    st.lists(st.tuples(_KEYS, st.integers(0, 9)), min_size=0, max_size=6),
)
@_SETTINGS
def test_salted_join_matches_plain(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [(i, k, x) for i, (k, x) in enumerate(left_rows)],
        "lid long, k string, x long",
    )
    right = spark.createDataFrame(
        right_rows or [("zzz", -1)], "k string, y long"
    )
    plain = sorted(
        tuple(r)
        for r in left.join(right, "k", "left").select("lid", "k", "x", "y").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(left, right, "k", salt=4, how="left")
        .select("lid", "k", "x", "y")
        .collect()
    )
    assert salted == plain


@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=15),
    st.lists(st.integers(0, 60), min_size=0, max_size=15),
    st.integers(min_value=1, max_value=7),
)
@_SETTINGS
def test_range_join_matches_bruteforce(spark, left_pts, right_pts, radius):
    from jaws_effective_processor_spark.operators.range_join import range_join

    left = spark.createDataFrame(
        [(i, p) for i, p in enumerate(left_pts)], "lid long, ms long"
    )
    right = spark.createDataFrame(
        [(i, p) for i, p in enumerate(right_pts)] or [(0, -999)],
        "rid long, ms long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in range_join(left, right, point="ms", radius=radius).collect()
    )
    want = sorted(
        (i, j)
        for i, lp in enumerate(left_pts)
        for j, rp in enumerate(right_pts)
        if abs(lp - rp) <= radius
    )
    if not right_pts:
        want = []
    assert got == want


def test_approx_distinct_bounds(spark):
    """Pin the raw sketch estimates against the exact twins: HLL++
    within its documented ~5% default rsd (3x margin), approx median
    within the exact p40..p60 band. The registered approx_distinct
    query folds these checks into booleans so the driver's hash gate
    can verify them too; this test keeps the raw estimates covered."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    li = load_table(spark, SF_ORACLE, "lineitem")
    approx = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
    ).collect()[0]
    exact = QUERIES["distinct_counts"](spark, SF_ORACLE).collect()[0]
    assert abs(approx["approx_parts"] - exact["n_parts"]) <= 0.15 * exact["n_parts"]
    assert (
        abs(approx["approx_orders"] - exact["n_orders"]) <= 0.15 * exact["n_orders"]
    )

    p40, p60 = li.select(
        F.percentile("l_extendedprice", F.lit(0.4)),
        F.percentile("l_extendedprice", F.lit(0.6)),
    ).collect()[0]
    assert p40 <= approx["approx_median_price"] <= p60

    # and the registered bound-check query must come back all-TRUE
    row = QUERIES["approx_distinct"](spark, SF_ORACLE).collect()[0]
    assert row["parts_within_15pct"]
    assert row["orders_within_15pct"]
    assert row["median_rank_within_halfpct"]


# ---- vectorized state machines vs naive reference loops (no Spark) --


def _naive_latch(guard, reset, set_, init):
    state, flags = init, []
    for g, r, s in zip(guard, reset, set_):
        flag = False
        if g:
            if r:
                state = False
            elif s:
                state = True
            flag = state
        flags.append(flag)
    return flags, state


def _naive_oneshot(guard, trigger, init):
    state, flags = init, []
    for g, t in zip(guard, trigger):
        out = False
        if g:
            out = state or t
        state = out
        flags.append(out)
    return flags, state


def _naive_transitions(cur, init):
    prev, to_a, to_n = init, [], []
    for c in cur:
        to_a.append(c and not prev)
        to_n.append((not c) and prev)
        prev = c
    return to_a, to_n, prev


@settings(deadline=None)
@given(st.lists(st.booleans(), max_size=60), st.booleans())
def test_transition_flags_matches_naive_loop(cur_list, init):
    """T1 core (also the corrected mask machine's engine: mask_fn
    runs transition_flags over the parent_active signal)."""
    import numpy as np

    from jaws_effective_processor_spark.streaming.processors import (
        transition_flags,
    )

    cur = np.array(cur_list, dtype=bool)
    to_a, to_n, final = transition_flags(cur, init)
    na, nn, nfinal = _naive_transitions(cur_list, init)
    assert list(to_a) == na
    assert list(to_n) == nn
    assert final == nfinal


@settings(deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans(), st.booleans()), max_size=60
    ),
    st.booleans(),
)
def test_guarded_latch_matches_naive_loop(rows, init):
    import numpy as np

    from jaws_effective_processor_spark.streaming.processors import (
        guarded_latch,
    )

    guard = np.array([r[0] for r in rows], dtype=bool)
    reset = np.array([r[1] for r in rows], dtype=bool)
    set_ = np.array([r[2] for r in rows], dtype=bool)
    flags, final = guarded_latch(guard, reset, set_, init)
    nflags, nfinal = _naive_latch(guard, reset, set_, init)
    assert list(flags) == nflags
    assert final == nfinal


@settings(deadline=None)
@given(
    st.lists(st.tuples(st.booleans(), st.booleans()), max_size=60),
    st.booleans(),
)
def test_oneshot_scan_matches_naive_loop(rows, init):
    import numpy as np

    from jaws_effective_processor_spark.streaming.processors import (
        oneshot_scan,
    )

    guard = np.array([r[0] for r in rows], dtype=bool)
    trig = np.array([r[1] for r in rows], dtype=bool)
    flags, final = oneshot_scan(guard, trig, init)
    nflags, nfinal = _naive_oneshot(guard, trig, init)
    assert list(flags) == nflags
    assert final == nfinal


def _uf_components(n_nodes, edges):
    """Union-find ground truth: node -> min node id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in range(n_nodes) if any(x in e for e in edges)}


def test_connected_components_deep_chain(spark):
    """A 200-node chain has diameter 199 >> MAX_CLUSTER_ITERS: plain
    min-label propagation would stop silently wrong; pointer jumping
    (label-of-label compression) must converge in O(log n) rounds."""
    from jaws_effective_processor_spark.functions.corpus import (
        connected_components,
    )

    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


@given(
    st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)),
        min_size=1,
        max_size=40,
    ).filter(lambda es: any(a != b for a, b in es))
)
@settings(
    max_examples=4,  # each example is a full iterative CC run
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_connected_components_matches_union_find(spark, raw_edges):
    from jaws_effective_processor_spark.functions.corpus import (
        connected_components,
    )

    edges = [(a, b) for a, b in raw_edges if a != b]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == _uf_components(25, edges)


def test_corpus_split_is_stable_partition(spark):
    """corpus_split's membership is a pure function of doc_id: the
    splits partition the corpus exactly (98/1/1 in expectation), and
    growing the corpus never moves an existing doc between splits —
    the property that keeps a held-out set held out."""
    from tests.conftest import SF_SMOKE
    from jaws_effective_processor_spark.functions.corpus import (
        N_SPLIT_SHARDS,
        SPLIT_TRAIN_64K,
        q_corpus_split,
    )
    from jaws_effective_processor_spark.tables import load_table

    rows = {r["split"]: r for r in q_corpus_split(spark, SF_SMOKE).collect()}
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_docs"] for r in rows.values()) == n_docs  # exhaustive
    assert rows["train"]["n_docs"] > 0.9 * n_docs  # ~98% in expectation
    assert all(r["n_shards"] <= N_SPLIT_SHARDS for r in rows.values())

    # stability: recompute on a half-corpus; common docs keep their split
    import pyspark.sql.functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    h16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    full = {
        r["doc_id"]: r["is_train"]
        for r in docs.select(
            "doc_id", (h16 < SPLIT_TRAIN_64K).alias("is_train")
        ).collect()
    }
    half = {
        r["doc_id"]: r["is_train"]
        for r in docs.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", (h16 < SPLIT_TRAIN_64K).alias("is_train"))
        .collect()
    }
    assert all(full[k] == v for k, v in half.items())


def test_decontaminate_partitions_train_set(spark):
    """decontaminate ∪ contamination is EXACTLY the train-side corpus:
    the retained and contaminated doc sets are disjoint and their
    union covers every train doc — no document is silently dropped or
    double-counted by the decontamination pass."""
    from tests.conftest import SF_SMOKE
    from jaws_effective_processor_spark.functions.corpus import (
        HOLDOUT_MOD,
        q_contamination,
        q_decontaminate,
    )
    from jaws_effective_processor_spark.tables import load_table

    kept = {r["doc_id"] for r in q_decontaminate(spark, SF_SMOKE).collect()}
    contam = {r["doc_id"] for r in q_contamination(spark, SF_SMOKE).collect()}
    train = {
        r["doc_id"]
        for r in load_table(spark, SF_SMOKE, "documents")
        .filter(f"doc_id % {HOLDOUT_MOD} != 0")
        .select("doc_id")
        .collect()
    }
    assert kept.isdisjoint(contam)
    assert kept | contam == train


def test_semdedup_keeps_one_per_component(spark):
    """The semdedup retention set keeps EXACTLY the component
    representative (min vec_id) of every near-dup component, plus all
    vectors that appear in no pair."""
    from tests.conftest import SF_SMOKE
    from jaws_effective_processor_spark.functions.corpus import (
        connected_components,
        q_semdedup_keep,
    )
    from jaws_effective_processor_spark.functions.dedup import (
        q_embedding_neardup,
    )
    from jaws_effective_processor_spark.tables import load_table

    import pyspark.sql.functions as F

    kept = {r["vec_id"] for r in q_semdedup_keep(spark, SF_SMOKE).collect()}
    pairs = q_embedding_neardup(spark, SF_SMOKE).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    comp = connected_components(pairs).collect()
    paired = {r["doc_id"] for r in comp}
    reps = {r["cluster_id"] for r in comp}
    all_vecs = {
        r["vec_id"]
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id")
        .collect()
    }
    assert kept == (all_vecs - paired) | reps


def test_mixture_rebalance_caps_token_share(spark):
    """After rebalancing, no language's retained token mass exceeds
    the cap by more than sampling noise allows; languages already
    under the cap are retained in full (rate 65536)."""
    from tests.conftest import SF_SMOKE
    from jaws_effective_processor_spark.functions.corpus import (
        REBALANCE_CAP_PERMILLE,
        q_mixture_rebalance,
    )
    from jaws_effective_processor_spark.tables import load_table

    import pyspark.sql.functions as F

    docs = load_table(spark, SF_SMOKE, "documents")
    pre = {
        r["lang"]: r["t"]
        for r in docs.groupBy("lang")
        .agg(F.sum(F.size(F.split("text", " "))).alias("t"))
        .collect()
    }
    total = sum(pre.values())
    out = q_mixture_rebalance(spark, SF_SMOKE).collect()
    rates = {r["lang"]: r["rate_64k"] for r in out}
    post = {}
    for r in out:
        post[r["lang"]] = post.get(r["lang"], 0) + r["n_tok"]
    for lang, lt in pre.items():
        if 1000 * lt <= REBALANCE_CAP_PERMILLE * total:
            # under the cap: kept in full
            assert rates.get(lang) == 65536
            assert post.get(lang) == lt
        else:
            # capped: expected retained mass ~= cap * total; allow
            # generous hash-sampling noise at sf0.001 scale
            expected = REBALANCE_CAP_PERMILLE * total / 1000
            assert post.get(lang, 0) < 2.0 * expected


def test_curation_funnel_monotone(spark):
    """Funnel stages compose sequentially, so doc and token counts
    are monotone non-increasing down the four stages."""
    from tests.conftest import SF_SMOKE
    from jaws_effective_processor_spark.functions.corpus import (
        q_curation_funnel,
    )

    rows = sorted(
        q_curation_funnel(spark, SF_SMOKE).collect(),
        key=lambda r: r["stage"],
    )
    stages = [r["stage"] for r in rows]
    assert stages == ["0_total", "1_quality", "2_dedup", "3_decontaminated"]
    for a, b in zip(rows, rows[1:]):
        assert a["n_docs"] >= b["n_docs"]
        assert a["n_tokens"] >= b["n_tokens"]


def test_minhash_survives_mass_duplicate_class(spark, tmp_path):
    """A mass-duplicate class (N identical documents) is the classic
    LSH stress: every band bucket holds the whole class, so candidate
    generation is quadratic IN THE CLASS (N*(N-1)/2 pairs) — correct,
    but the reason production pipelines run exact dedup FIRST and
    feed LSH only canonical survivors. This pins that the pipeline
    stays CORRECT under the shape: all pairs verify at jaccard 1000,
    the component collapses to one cluster, and dedup_keep retains
    exactly the min doc_id of the class."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jaws_effective_processor_spark.entry_queries import QUERIES

    n = 40
    text = (
        "identical boilerplate template body repeated across the "
        "whole duplicate class with enough words to shingle"
    )
    uniq = "a completely different document with its own words here"
    rows = [(i, text, "en", "edge", len(text)) for i in range(n)]
    rows.append((1000, uniq, "en", "edge", len(uniq)))
    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array([r[3] for r in rows]),
            "n_chars": pa.array([r[4] for r in rows], pa.int64()),
        }
    )
    d = str(tmp_path / "dupclass")
    os.makedirs(d, exist_ok=True)
    pq.write_table(table, os.path.join(d, "documents.parquet"))

    pairs = QUERIES["dedup_minhash_lsh"](spark, d).collect()
    assert len(pairs) == n * (n - 1) // 2
    assert all(r["jac_permille"] == 1000 for r in pairs)

    clusters = QUERIES["dedup_clusters"](spark, d).collect()
    assert {r["cluster_id"] for r in clusters} == {0}
    assert len(clusters) == n

    kept = {r["doc_id"] for r in QUERIES["dedup_keep"](spark, d).collect()}
    assert kept == {0, 1000}


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta".split()),
            min_size=0,
            max_size=14,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_contam_grams_match_python_reference(spark, docs):
    """with_contam_grams (the shared batch/stream gram fold) equals a
    direct Python reimplementation of the WIDENED (~62-bit, r12)
    spec: one md5 per token split into two independent 28-bit hex
    halves, two rolling combines acc*MULT + h mod P over
    CONTAM_K-windows (CONTAM_MULT over md5[0:7], GRAM_MULT2 over
    md5[7:14]), packed f1 * 2^31 + f2, distinct, empty below the
    gram width."""
    import hashlib

    from jaws_effective_processor_spark.functions.corpus import (
        CONTAM_K,
        CONTAM_MULT,
        CONTAM_P,
        GRAM_MULT2,
        GRAM_PACK,
        with_contam_grams,
    )

    def py_grams(tokens):
        digs = [hashlib.md5(t.encode()).hexdigest() for t in tokens]
        th = [int(d[:7], 16) for d in digs]
        th2 = [int(d[7:14], 16) for d in digs]
        if len(th) < CONTAM_K:
            return []
        out = []
        for i in range(len(th) - CONTAM_K + 1):
            a1, a2 = th[i], th2[i]
            for o in range(1, CONTAM_K):
                a1 = (a1 * CONTAM_MULT + th[i + o]) % CONTAM_P
                a2 = (a2 * GRAM_MULT2 + th2[i + o]) % CONTAM_P
            out.append(a1 * GRAM_PACK + a2)
        # list_distinct keeps first-occurrence order; compare as sets
        return sorted(set(out))

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: sorted(r["grams"])
        for r in with_contam_grams(df).select("doc_id", "grams").collect()
    }
    for i, toks in enumerate(docs):
        # split(' ') of the joined text: empty doc -> one '' token
        tokens = " ".join(toks).split(" ")
        assert got[i] == py_grams(tokens), (i, toks)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta eps zeta".split()),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_block_dedup_matches_python_reference(spark, docs, tmp_path_factory):
    """Block dedup on arbitrary corpora equals the Python spec: split
    tokens into 16-token blocks, first (doc_id, idx) occurrence of a
    block's token tuple is kept, later copies dropped."""
    import collections

    from jaws_effective_processor_spark.functions.filtering import (
        BLOCK_TOKENS,
        q_block_dedup,
    )

    d = tmp_path_factory.mktemp("blk")
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [" ".join(toks) for toks in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array(["t"] * len(docs), pa.string()),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    seen = set()
    expect = collections.defaultdict(lambda: [0, 0])  # doc -> [blocks, kept]
    for i, text in enumerate(texts):
        toks = text.split(" ")
        for b in range(0, len(toks), BLOCK_TOKENS):
            blk = tuple(toks[b : b + BLOCK_TOKENS])
            expect[i][0] += 1
            if blk not in seen:
                seen.add(blk)
                expect[i][1] += 1
    got = {
        r["doc_id"]: (r["n_blocks"], r["n_kept"])
        for r in q_block_dedup(spark, str(d)).collect()
    }
    assert got == {i: tuple(v) for i, v in expect.items()}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("alpha beta gamma delta".split()),
            min_size=1,
            max_size=6,
        ),
        min_size=3,
        max_size=9,
    )
)
def test_bloom_gate_sound_on_arbitrary_corpora(spark, docs, tmp_path_factory):
    """On ANY corpus: every probe doc whose exact text appears on the
    ingested side is Bloom-flagged (no false negatives, the filter's
    defining guarantee)."""
    from jaws_effective_processor_spark.functions.filtering import (
        BLOOM_INGESTED_MOD,
        q_bloom_dedup_gate,
    )

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("bloomprop")
    texts = [" ".join(toks) for toks in docs]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(docs), pa.string()),
                "source": pa.array(["t"] * len(docs), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    ingested = {
        t
        for i, t in enumerate(texts)
        if i % BLOOM_INGESTED_MOD != 0
    }
    rows = q_bloom_dedup_gate(spark, str(d)).collect()
    for r in rows:
        truly_dup = texts[r["doc_id"]] in ingested
        assert r["is_dup"] == truly_dup
        assert r["sound"]
        if truly_dup:
            assert r["bloom_hit"]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    names=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=6),
        min_size=2,
        max_size=10,
        unique=True,
    )
)
def test_edit_distance_pairs_matches_bruteforce(spark, names):
    """Deletion-neighborhood blocking + verify finds EXACTLY the
    lev<=1 pairs a brute-force all-pairs scan finds — the blocking
    never loses a true pair (theorem) and the verify kills every
    lev-2 candidate."""
    from jaws_effective_processor_spark.operators.fuzzy import (
        edit_distance_pairs,
    )

    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(
                    d[j] + 1, d[j - 1] + 1,
                    prev + (a[i - 1] != b[j - 1]),
                )
        return d[n]

    df = spark.createDataFrame(
        list(enumerate(names)), "k long, name string"
    )
    got = {
        (r["key_a"], r["key_b"], r["distance"])
        for r in edit_distance_pairs(df, "k", "name").collect()
    }
    want = {
        (i, j, lev(a, b))
        for i, a in enumerate(names)
        for j, b in enumerate(names)
        if i < j and lev(a, b) <= 1
    }
    assert got == want


def test_kmeans_assign_is_nearest_centroid_partition(spark):
    """kmeans_assign's output is a genuine Lloyd partition: every
    vector assigned exactly once, cluster ids within [0, K), each
    dist_sq nonneg, and the round-2 assignment is nearest-centroid
    optimal — recomputing distances to the round-2 centroids in
    Python finds no strictly closer cluster for any vector."""
    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.functions.clustering import (
        KMEANS_K,
        KMEANS_MICRO,
        q_kmeans_assign,
    )
    from jaws_effective_processor_spark.tables import load_table
    import math

    out = {r["vec_id"]: r for r in q_kmeans_assign(spark, SF_ORACLE).collect()}
    emb = {
        r["vec_id"]: [math.floor(x * KMEANS_MICRO) for x in r["embedding"]]
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }
    assert set(out) == set(emb)  # exactly one row per vector
    assert all(0 <= r["cluster_id"] < KMEANS_K for r in out.values())
    assert all(r["dist_sq"] >= 0 for r in out.values())

    # rebuild the round-1 assignment + round-2 centroids in Python
    seeds = sorted(emb)[:KMEANS_K]
    c0 = {cid: emb[v] for cid, v in enumerate(seeds)}

    def nearest(v, cents):
        return min(
            (sum((a - b) * (a - b) for a, b in zip(v, cm)), cid)
            for cid, cm in cents.items()
        )

    a1 = {vid: nearest(v, c0)[1] for vid, v in emb.items()}
    c1 = {}
    for cid in set(a1.values()):
        members = [emb[v] for v in a1 if a1[v] == cid]
        # Spark's `sum DIV count` truncates toward zero — use exact
        # integer arithmetic (float division can round across an
        # integer boundary past 2^53)
        def _div_trunc(s: int, n: int) -> int:
            return s // n if (s >= 0) == (n >= 0) or s % n == 0 else -((-s) // n)

        c1[cid] = [
            _div_trunc(sum(col), len(members)) for col in zip(*members)
        ]
    for vid, v in emb.items():
        best_d, best_c = nearest(v, c1)
        assert out[vid]["dist_sq"] == best_d
        assert out[vid]["cluster_id"] == best_c


def test_assign_arrow_matches_broadcast_join(spark):
    """The large-K Arrow distance kernel (assign_arrow) and the
    broadcast-join assignment (_assign) produce the identical
    (vec_id, cid, dist_sq) partition — same exact-integer distances,
    same smallest-cid tie-break — so switching paths at
    KMEANS_BROADCAST_K_MAX changes the plan, never the result."""
    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.functions.clustering import (
        _assign,
        _emb_micro,
        _trained_centroids,
        assign_arrow,
    )
    from jaws_effective_processor_spark.tables import load_table

    cent = _trained_centroids(spark, SF_ORACLE)
    join_rows = {
        r["vec_id"]: (r["cid"], r["dist_sq"])
        for r in _assign(_emb_micro(spark, SF_ORACLE), cent).collect()
    }
    emb = load_table(spark, SF_ORACLE, "embeddings")
    arrow_rows = {
        r["vec_id"]: (r["cid"], r["dist_sq"])
        for r in assign_arrow(emb, cent.collect()).collect()
    }
    assert arrow_rows == join_rows


def test_km_scored_matches_reference(spark):
    """The shipped scan-local Lloyd rounds (literal-codebook argmin
    over the kmeans_xs frame, r14 opt round) equal the _assign
    reference join+window form bit-for-bit — both rounds AND the
    trained centroid means, including the non-contiguous-cid mapping
    of the round-2 codebook."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.functions import clustering as c

    e = c._emb_micro(spark, SF_ORACLE)
    c0 = c._seed_centroids(spark, SF_ORACLE)
    a1_ref = c._assign(e, c0).localCheckpoint(eager=False)
    c1_ref = (
        a1_ref.select("vec_id", "cid")
        .join(e, "vec_id")
        .groupBy("cid", "dim")
        .agg(F.sum("xm").alias("_s"), F.count("*").alias("_c"))
        .select("cid", "dim", F.expr("_s DIV _c").alias("cm"))
        .localCheckpoint(eager=False)
    )
    a2_ref = c._assign(e, c1_ref)

    def rows(df, cols):
        return sorted(tuple(r[k] for k in cols) for r in df.collect())

    akeys = ["vec_id", "cid", "dist_sq"]
    assert rows(c._assignment_r1(spark, SF_ORACLE), akeys) == rows(
        a1_ref, akeys
    )
    assert rows(
        c._trained_centroids(spark, SF_ORACLE), ["cid", "dim", "cm"]
    ) == rows(c1_ref, ["cid", "dim", "cm"])
    assert rows(c._assignment_r2(spark, SF_ORACLE), akeys) == rows(
        a2_ref, akeys
    )


def test_split_leakage_bounds_and_masks(spark):
    """split_leakage's matrix is internally consistent: shared counts
    never exceed either side's gram vocabulary, permilles stay in
    [0, 1000], and the per-split totals agree with an independently
    computed gram->splits map."""
    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.functions.corpus import (
        assign_split,
        _contam_gram_table,
        q_split_leakage,
    )
    import pyspark.sql.functions as F

    rows = {
        (r["split_a"], r["split_b"]): r
        for r in q_split_leakage(spark, SF_ORACLE).collect()
    }
    assert set(rows) == {
        ("train", "val"), ("train", "test"), ("val", "test")
    }
    for r in rows.values():
        assert 0 <= r["shared_grams"] <= min(r["a_grams"], r["b_grams"])
        assert 0 <= r["leak_permille"] <= 1000

    # independent reference: gram -> set of splits via plain collect
    g = assign_split(_contam_gram_table(spark, SF_ORACLE)).select(
        "split", F.explode("grams").alias("g")
    )
    seen: dict[int, set] = {}
    for rec in g.collect():
        seen.setdefault(rec["g"], set()).add(rec["split"])
    for (a, b), r in rows.items():
        assert r["a_grams"] == sum(1 for s in seen.values() if a in s)
        assert r["b_grams"] == sum(1 for s in seen.values() if b in s)
        assert r["shared_grams"] == sum(
            1 for s in seen.values() if a in s and b in s
        )


def test_phrase_search_matches_python_scan(spark):
    """phrase_search's per-doc occurrence counts equal a plain Python
    sliding-window count over the same tokenization, and docs with
    zero occurrences are absent."""
    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.functions.retrieval import (
        PHRASE_TERMS,
        q_phrase_search,
    )
    from jaws_effective_processor_spark.tables import load_table

    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in q_phrase_search(spark, SF_ORACLE).collect()
    }
    n = len(PHRASE_TERMS)
    expect = {}
    for r in load_table(spark, SF_ORACLE, "documents").collect():
        tk = r["text"].split(" ")
        c = sum(
            1
            for i in range(len(tk) - n + 1)
            if tuple(tk[i : i + n]) == PHRASE_TERMS
        )
        if c:
            expect[r["doc_id"]] = c
    assert out == expect


def test_round6_ops_match_python_references(spark):
    """unigram_surprisal, mixture_temperature, context_length_report
    and kmeans_balanced_sample against pure-Python reimplementations —
    a third implementation independent of both the Spark expressions
    and their DuckDB twins, so a shared-idiom bug (e.g. a wrong
    common formula pasted into both engines) cannot hide."""
    import hashlib
    import math
    from collections import Counter

    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.tables import load_table

    docs = [
        (r["doc_id"], r["text"].split(" "), r["lang"])
        for r in load_table(spark, SF_ORACLE, "documents").collect()
    ]

    # --- unigram_surprisal
    freq = Counter(t for _, tk, _ in docs for t in tk)
    total = sum(freq.values())

    def bits(x):
        return x.bit_length()  # == len(bin(x)) - 2 == floor(log2)+1

    expect = {}
    for doc_id, tk, _ in docs:
        s = sum(bits(total) - bits(freq[t]) for t in tk)
        expect[doc_id] = (len(tk), s, (1000 * s) // len(tk))
    got = {
        r["doc_id"]: (r["n_tokens"], r["surprisal_bits"], r["mean_millibits"])
        for r in QUERIES["unigram_surprisal"](spark, SF_ORACLE).collect()
    }
    assert got == expect

    # --- mixture_temperature
    mass = Counter()
    for _, tk, lang in docs:
        mass[lang] += len(tk)
    w = {lang: math.floor(math.sqrt(m)) for lang, m in mass.items()}
    tot_w = sum(w.values())
    got_m = {
        r["lang"]: (r["n_tokens"], r["weight"], r["sample_permille"],
                    r["expected_tokens"])
        for r in QUERIES["mixture_temperature"](spark, SF_ORACLE).collect()
    }
    for lang, m in mass.items():
        rate = (1000 * w[lang]) // tot_w
        assert got_m[lang] == (m, w[lang], rate, (m * rate) // 1000)

    # --- context_length_report
    from jaws_effective_processor_spark.functions.corpus import (
        CONTEXT_BUCKETS,
    )

    def bucket(n):
        return max([0] + [b for b in CONTEXT_BUCKETS if n >= b])

    per = Counter()
    toks = Counter()
    for _, tk, _ in docs:
        per[bucket(len(tk))] += 1
        toks[bucket(len(tk))] += len(tk)
    n_docs_total, n_tok_total = sum(per.values()), sum(toks.values())
    got_c = {
        r["bucket_lo"]: (r["n_docs"], r["n_tokens"], r["doc_permille"],
                         r["token_permille"])
        for r in QUERIES["context_length_report"](spark, SF_ORACLE).collect()
    }
    assert set(got_c) == set(per)
    for b in per:
        assert got_c[b] == (
            per[b], toks[b],
            (1000 * per[b]) // n_docs_total,
            (1000 * toks[b]) // n_tok_total,
        )

    # --- kmeans_balanced_sample: rates from the observed census,
    # md5 keep decision, using the engine's own assignment as input
    # (the assignment itself is pinned by its dedicated test)
    from jaws_effective_processor_spark.functions.clustering import (
        CLUSTER_CAP_64K,
    )

    assign = {
        r["vec_id"]: r["cluster_id"]
        for r in QUERIES["kmeans_assign"](spark, SF_ORACLE).collect()
    }
    census = Counter(assign.values())
    n_total = sum(census.values())
    rates = {
        c: min(65536, (CLUSTER_CAP_64K * n_total) // n)
        for c, n in census.items()
    }

    def h16(vid):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:4], 16)

    expect_s = {
        (vid, cid, rates[cid])
        for vid, cid in assign.items()
        if h16(vid) < rates[cid]
    }
    got_s = {
        (r["vec_id"], r["cluster_id"], r["rate_64k"])
        for r in QUERIES["kmeans_balanced_sample"](spark, SF_ORACLE).collect()
    }
    assert got_s == expect_s


@st.composite
def _compaction_log(draw):
    """A register/tombstone/re-register log over a small key space:
    (seq, name, op) with op None = tombstone, else the payload —
    RegistrationRuleTest.java:137-155's single scenario generalized."""
    ops = draw(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c", "d"]),
                st.one_of(
                    st.none(),
                    st.sampled_from(["p1", "p2", "p3"]),
                ),
            ),
            min_size=1,
            max_size=25,
        )
    )
    return [(seq, name, op) for seq, (name, op) in enumerate(ops)]


@_SETTINGS
@given(_compaction_log())
def test_tombstone_through_compaction_matches_dict_replay(spark, log):
    """KTable materialization == a Python dict replay of the same
    log, for BOTH tombstone encodings: (1) nullable payload column
    where NULL deletes (registration-style compact_table), (2)
    boolean tombstone flag (override-style filter). And
    latest_per_key WITHOUT the tombstone filter must still carry the
    tombstone row — deletes propagate downstream before the consumer
    drops them (the reference's passthrough-then-drop order)."""
    from jaws_effective_processor_spark.operators.compaction import (
        compact_table,
    )

    # Python replay: last write wins, tombstone deletes
    replay: dict = {}
    for _seq, name, op in log:
        if op is None:
            replay.pop(name, None)
        else:
            replay[name] = op

    # (1) nullable-payload encoding
    df = spark.createDataFrame(log, "seq long, name string, action string")
    got = {
        r["name"]: r["action"]
        for r in compact_table(df, ["name"], tombstone_col="action").collect()
    }
    assert got == replay

    # (2) boolean-flag encoding (payload carried on tombstones too,
    # like override records; the flag decides)
    flagged = [
        (seq, name, op if op is not None else "x", op is None)
        for seq, name, op in log
    ]
    df2 = spark.createDataFrame(
        flagged, "seq long, name string, action string, tombstone boolean"
    )
    got2 = {
        r["name"]: r["action"]
        for r in compact_table(
            df2, ["name"], tombstone_col="tombstone"
        ).collect()
    }
    assert got2 == replay

    # tombstones propagate through bare latest_per_key: every key that
    # EVER appeared has exactly one latest row, deleted or not
    latest = {r["name"]: r for r in latest_per_key(df, ["name"]).collect()}
    assert set(latest) == {name for _s, name, _o in log}
    last_op = {}
    for _seq, name, op in log:
        last_op[name] = op
    for name, row in latest.items():
        assert row["action"] == last_op[name]


def test_ccnet_buckets_structure(spark):
    """q_ccnet_buckets semantics beyond the oracle hash: per
    language the three buckets PARTITION the >=2-token docs with
    ntile's balanced sizes (within 1 of each other), and the
    millibit ranges are ordered head <= middle <= tail (equality
    allowed — ties split across bucket boundaries)."""
    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.tables import load_table
    from pyspark.sql import functions as F

    rows = {
        (r["lang"], r["bucket"]): r
        for r in QUERIES["ccnet_buckets"](spark, SF_ORACLE).collect()
    }
    assert rows
    langs = {lang for lang, _ in rows}
    n_docs_lm = {
        r["lang"]: r["n"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .filter(F.size(F.split("text", " ")) >= 2)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang in langs:
        b = {k: rows[(lang, k)] for k in ("head", "middle", "tail")}
        sizes = [b[k]["n_docs"] for k in ("head", "middle", "tail")]
        assert sum(sizes) == n_docs_lm[lang], (lang, sizes)
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)  # ntile
        assert (
            b["head"]["min_millibits"]
            <= b["head"]["max_millibits"]
            <= b["middle"]["min_millibits"]
            <= b["middle"]["max_millibits"]
            <= b["tail"]["min_millibits"]
            <= b["tail"]["max_millibits"]
        ), (lang, b)


def test_dedup_keep_best_picks_max_quality(spark):
    """q_dedup_keep_best semantics beyond the oracle hash: exactly
    one keeper per near-dup component (same retention COUNT as
    q_dedup_keep), and every keeper is its component's
    (quality DESC, doc_id ASC) maximum — recomputed independently
    from the clusters report + the quality scores."""
    from tests.conftest import SF_ORACLE
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.tables import load_table

    kept = {
        r["doc_id"]: r["quality_score"]
        for r in QUERIES["dedup_keep_best"](spark, SF_ORACLE).collect()
    }
    baseline = QUERIES["dedup_keep"](spark, SF_ORACLE).count()
    assert len(kept) == baseline  # one per component either way
    comp = {
        r["doc_id"]: r["cluster_id"]
        for r in QUERIES["dedup_clusters"](spark, SF_ORACLE).collect()
    }
    score = {
        r["doc_id"]: r["quality_score"]
        for r in QUERIES["quality_score"](spark, SF_ORACLE).collect()
    }
    from collections import defaultdict

    members = defaultdict(list)
    for d, c in comp.items():
        members[c].append(d)
    for c, ds in members.items():
        winner = min(ds, key=lambda d: (-score[d], d))
        for d in ds:
            assert (d in kept) == (d == winner), (c, d, winner)
            if d in kept:
                assert kept[d] == score[d]
    # unpaired docs are all kept
    unpaired_kept = set(kept) - set(comp)
    total_docs = load_table(spark, SF_ORACLE, "documents").count()
    assert len(unpaired_kept) == total_docs - len(comp)


def test_large_k_routing_matches_window_ranking(spark):
    """The 100 TB large-K serve-routing demonstration (r13 verdict
    item 3): cell assignment AND nprobe probe routing run through the
    blockwise Arrow kernels (assign_arrow / route_arrow) at
    K = 2048 > KMEANS_BROADCAST_K_MAX = 1024 — a codebook size where
    the shipped small-K shapes are OUT OF BOUNDS by their own
    docstrings (literal-array candidate plans grow linearly in
    K x dims; the broadcast-join + window ranking ships a K x dims
    table that stops fitting executor memory near K ~ 10^6) — and
    produce the IDENTICAL (vec_id, cell, dist_sq, rn) ranking as the
    window-ranking join (_kranked_cells' exact shape) on the same
    fixture. The kernel genuinely exercises the blockwise path: 2048
    centroids over ASSIGN_ARROW_K_BLOCK = 256 is 8 blocks, so the
    cross-block running top-p merge and the (dist, cid) tie rule are
    both live. PLANS.md's sizing note cites this test instead of
    asserting the switch works."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    import jaws_effective_processor_spark.functions.clustering as cl
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_SMOKE

    K, NPROBE = 2048, 4
    assert K > cl.KMEANS_BROADCAST_K_MAX
    assert K > 2 * cl.ASSIGN_ARROW_K_BLOCK  # multi-block for real
    dims = 64
    rng = np.random.RandomState(7)
    cm = rng.randint(-1_000_000, 1_000_000, size=(K, dims))
    cent_rows = [
        {"cid": c, "dim": d, "cm": int(cm[c, d])}
        for c in range(K)
        for d in range(dims)
    ]
    emb = load_table(spark, SF_SMOKE, "embeddings")

    # the blockwise kernels (what a 10^6-cell deployment runs)
    routed = {
        (r["vec_id"], r["rn"]): (r["cell"], r["dist_sq"])
        for r in cl.route_arrow(emb, cent_rows, NPROBE).collect()
    }
    assigned = {
        r["vec_id"]: (r["cid"], r["dist_sq"])
        for r in cl.assign_arrow(emb, cent_rows).collect()
    }

    # the window-ranking reference (_kranked_cells' join + window
    # shape, verbatim) over the same synthetic codebook
    cent_df = spark.createDataFrame(
        [(r["cid"], r["dim"], r["cm"]) for r in cent_rows],
        "cid long, dim long, cm long",
    )
    d = (
        cl._emb_micro(spark, SF_SMOKE)
        .join(F.broadcast(cent_df), "dim")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))
            ).alias("dist_sq")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist_sq", "cid")
    ref = {
        (r["vec_id"], r["rn"]): (r["cid"], r["dist_sq"])
        for r in d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NPROBE)
        .collect()
    }
    assert routed == ref
    # rn=1 of the rank-retaining kernel IS the assignment kernel
    assert assigned == {
        v: cd for (v, rn), cd in routed.items() if rn == 1
    }


def test_route_arrow_random_and_ties(spark, monkeypatch):
    """route_arrow vs an independent numpy reference on seeded random
    fixtures, plus the exact-tie rule: (1) across random draws the
    kernel's full (cell, dist_sq, rn) ranking equals a brute-force
    lexicographic (dist, cid) sort, under a forced tiny k_block so
    the cross-block top-p merge is live; (2) DUPLICATE centroids
    (exact distance ties) rank in ascending cid order — the
    tie-break every cross-engine parity pin leans on."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile

    import jaws_effective_processor_spark.functions.clustering as cl

    monkeypatch.setattr(cl, "ASSIGN_ARROW_K_BLOCK", 5)

    def run_case(seed, n, k, dims, nprobe, with_ties):
        rng = np.random.RandomState(seed)
        X = rng.uniform(-1, 1, size=(n, dims)).astype(np.float64)
        cm = rng.randint(-1_000_000, 1_000_000, size=(k, dims))
        if with_ties:
            cm[1] = cm[0]  # cids 0 and 1 equidistant from everything
            cm[k - 1] = cm[k - 2]
        cent_rows = [
            {"cid": c, "dim": d, "cm": int(cm[c, d])}
            for c in range(k)
            for d in range(dims)
        ]
        with tempfile.TemporaryDirectory() as td:
            pq.write_table(
                pa.table(
                    {
                        "vec_id": pa.array(range(n), pa.int64()),
                        "embedding": pa.array(
                            [list(map(float, row)) for row in X],
                            pa.list_(pa.float64()),
                        ),
                    }
                ),
                f"{td}/emb.parquet",
            )
            emb = spark.read.parquet(f"{td}/emb.parquet")
            got = {
                (r["vec_id"], r["rn"]): (r["cell"], r["dist_sq"])
                for r in cl.route_arrow(emb, cent_rows, nprobe).collect()
            }
        Xm = np.floor(X * cl.KMEANS_MICRO).astype(np.int64)
        for v in range(n):
            d = ((Xm[v][None, :] - cm) ** 2).sum(axis=1)
            order = sorted(range(k), key=lambda c: (d[c], c))[:nprobe]
            for rn, c in enumerate(order, 1):
                assert got[(v, rn)] == (c, int(d[c])), (seed, v, rn)
        return got

    for seed in (0, 1, 2):
        run_case(seed, n=7, k=13, dims=8, nprobe=4, with_ties=False)
    # exact ties: duplicated centroid pairs must rank smaller-cid
    # first, and both members of a pair appear at adjacent ranks
    got = run_case(9, n=5, k=6, dims=4, nprobe=6, with_ties=True)
    for v in range(5):
        ranking = [got[(v, rn)][0] for rn in range(1, 7)]
        assert ranking.index(0) < ranking.index(1)
        assert ranking.index(4) < ranking.index(5)


def test_assign_arrow_multiblock_matches_single(spark, monkeypatch):
    """assign_arrow's blockwise K loop: forcing k_block=3 (several
    blocks over the K=8 codebook, exercising the cross-block running
    min and the strict-< tie rule) produces the identical partition
    as one block covering all centroids."""
    from tests.conftest import SF_ORACLE
    import jaws_effective_processor_spark.functions.clustering as cl
    from jaws_effective_processor_spark.tables import load_table

    cent_rows = cl._trained_centroids(spark, SF_ORACLE).collect()
    emb = load_table(spark, SF_ORACLE, "embeddings")

    def run():
        return {
            r["vec_id"]: (r["cid"], r["dist_sq"])
            for r in cl.assign_arrow(emb, cent_rows).collect()
        }

    single = run()
    monkeypatch.setattr(cl, "ASSIGN_ARROW_K_BLOCK", 3)
    assert run() == single


def test_round7_operators_match_python_reference(spark):
    """Round-7 operators vs brute-force Python on the sf0.001 corpus:
    token_entropy (exact floor-log2 identity), ngram_lm_bits
    (conditional pair costs, nonnegative by pair<=marginal),
    bigram_pmi (score formula + ordering), minhash_band_stats
    (per-band totals == doc count), doc_length_deciles (SQL-standard
    ntile distribution), tokenizer_fertility (integer ratios)."""
    from jaws_effective_processor_spark.tables import load_table
    from jaws_effective_processor_spark.entry_queries import QUERIES

    sf = "/root/testdata/sf0.001"
    docs = {
        r["doc_id"]: r
        for r in load_table(spark, sf, "documents").collect()
    }
    L = lambda x: len(bin(x)) - 2  # noqa: E731  floor(log2)+1

    # --- token_entropy
    out = {r["doc_id"]: r for r in QUERIES["token_entropy"](spark, sf).collect()}
    assert set(out) == set(docs)
    import collections

    for did, r in list(out.items())[:200]:
        tf = collections.Counter(docs[did]["text"].split(" "))
        n = sum(tf.values())
        want = sum(c * (L(n) - L(c)) for c in tf.values())
        assert (r["n_tokens"], r["distinct_tokens"], r["entropy_bits_sum"]) == (
            n, len(tf), want
        )
        assert 0 <= r["entropy_bits_sum"] <= n * L(n)

    # --- ngram_lm_bits: corpus tables in Python, then per-doc check
    pair_n = collections.Counter()
    for d in docs.values():
        tk = d["text"].split(" ")
        for a, b in zip(tk, tk[1:]):
            pair_n[(a, b)] += 1
    left_n = collections.Counter()
    for (a, _b), c in pair_n.items():
        left_n[a] += c
    lm = {r["doc_id"]: r for r in QUERIES["ngram_lm_bits"](spark, sf).collect()}
    assert set(lm) == {d for d in docs if len(docs[d]["text"].split(" ")) >= 2}
    for did, r in list(lm.items())[:200]:
        tk = docs[did]["text"].split(" ")
        bits = sum(L(left_n[a]) - L(pair_n[(a, b)]) for a, b in zip(tk, tk[1:]))
        assert r["n_bigrams"] == len(tk) - 1
        assert r["surprisal_bits"] == bits >= 0

    # --- bigram_pmi: formula + descending order
    freq = collections.Counter()
    for d in docs.values():
        freq.update(d["text"].split(" "))
    total = sum(freq.values())
    rows = QUERIES["bigram_pmi"](spark, sf).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    keys = [(-r["pmi_bits"], -r["n_pairs"], r["left"], r["right"]) for r in rows]
    assert keys == sorted(keys)
    for r in rows:
        want = (
            L(pair_n[(r["left"], r["right"])]) + L(total)
            - L(freq[r["left"]]) - L(freq[r["right"]])
        )
        assert r["pmi_bits"] == want
        assert r["n_pairs"] == pair_n[(r["left"], r["right"])] >= 5

    # --- minhash_band_stats: every band partitions the doc set
    from jaws_effective_processor_spark.functions.dedup import N_BANDS

    stats = {r["band"]: r for r in QUERIES["minhash_band_stats"](spark, sf).collect()}
    assert set(stats) == set(range(N_BANDS))
    for r in stats.values():
        assert r["n_docs"] == len(docs)
        assert r["n_singletons"] + r["n_colliding_docs"] == r["n_docs"]
        assert r["n_buckets"] <= r["n_docs"]
        assert r["max_bucket"] >= 1

    # --- doc_length_deciles: standard ntile distribution
    dec = sorted(
        QUERIES["doc_length_deciles"](spark, sf).collect(),
        key=lambda r: r["decile"],
    )
    n = len(docs)
    assert [r["decile"] for r in dec] == list(range(1, 11))
    want_sizes = [n // 10 + (1 if i < n % 10 else 0) for i in range(10)]
    assert [r["n_docs"] for r in dec] == want_sizes
    bounds = [(r["min_chars"], r["max_chars"]) for r in dec]
    assert all(a <= b for a, b in bounds)
    assert all(bounds[i][1] <= bounds[i + 1][0] for i in range(9))

    # --- tokenizer_fertility: recompute a language directly
    fert = {r["lang"]: r for r in QUERIES["tokenizer_fertility"](spark, sf).collect()}
    by_lang = collections.defaultdict(lambda: [0, 0, 0])
    for d in docs.values():
        s = by_lang[d["lang"]]
        s[0] += 1
        s[1] += len(d["text"].split(" "))
        s[2] += d["n_chars"]
    assert set(fert) == set(by_lang)
    for lang, (nd, nt, nc) in by_lang.items():
        r = fert[lang]
        assert (r["n_docs"], r["n_tokens"], r["n_chars"]) == (nd, nt, nc)
        assert r["chars_per_token_milli"] == (1000 * nc) // nt


def test_source_overlap_matches_python_replay(spark):
    """Each (source_a < source_b) row counts exactly the distinct
    CONTAM_K-gram hashes the two sources share, totals are per-source
    distinct gram counts, permille = 1000*shared DIV min(total), and
    pairs sharing nothing are absent — replayed from the cached gram
    table in plain Python."""
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.corpus import (
        _contam_gram_table,
    )
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    src_of = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "source")
        .collect()
    }
    by_source: dict[str, set[int]] = {}
    for r in _contam_gram_table(spark, SF_ORACLE).collect():
        by_source.setdefault(src_of[r["doc_id"]], set()).update(r["grams"])
    sources = sorted(by_source)
    expected = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            shared = len(by_source[a] & by_source[b])
            if shared:
                na, nb = len(by_source[a]), len(by_source[b])
                expected[(a, b)] = (
                    shared, na, nb, (1000 * shared) // min(na, nb)
                )
    got = {
        (r["source_a"], r["source_b"]): (
            r["shared_grams"],
            r["a_grams"],
            r["b_grams"],
            r["overlap_permille"],
        )
        for r in QUERIES["source_overlap"](spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected, "fixture must actually contain cross-source overlap"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    m1=st.integers(2, 5),
    m2=st.integers(0, 3),
    d=st.integers(0, 4),
)
def test_minhash_qa_family_consistency(spark, m1, m2, d, tmp_path_factory):
    """Cross-operator consistency for the MinHash QA family on planted
    duplicate classes: minhash_calibration, dedup_threshold_curve and
    minhash_band_stats all read the same cached signature/candidate
    artifacts and must tell ONE story. Corpus = a dup class of m1
    identical docs, an optional second class of m2, and d unique docs,
    all vocabulary-disjoint — so candidates are exactly the
    within-class pairs:

    - curve: every DEDUP_LADDER rung keeps all sum(C(m,2)) pairs and
      touches sum(m) docs (exact dups score jac 1000 >= every rung);
    - calibration: ONE row at sig_matches = N_MINHASH with
      est = mean = min = max = 1000 over the same pair count;
    - band stats, every band: one size-m colliding bucket per class,
      one singleton per unique doc, all docs accounted for."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jaws_effective_processor_spark.functions.dedup import (
        DEDUP_LADDER,
        N_BANDS,
        N_MINHASH,
        q_dedup_threshold_curve,
        q_minhash_band_stats,
        q_minhash_calibration,
    )

    texts = []
    for i in range(m1):
        texts.append(" ".join(f"c1w{j}" for j in range(12)))
    for i in range(m2):
        texts.append(" ".join(f"c2w{j}" for j in range(10)))
    for i in range(d):
        texts.append(" ".join(f"u{i}w{j}" for j in range(8)))
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    sf = str(tmp_path_factory.mktemp("qafam"))
    pq.write_table(table, os.path.join(sf, "documents.parquet"))

    classes = [m for m in (m1, m2) if m >= 2]
    n_pairs = sum(m * (m - 1) // 2 for m in classes)
    n_dup_docs = sum(classes)
    n_singletons = d + (1 if m2 == 1 else 0)
    n_docs_total = m1 + m2 + d

    curve = {
        r["threshold_permille"]: (r["n_pairs"], r["n_docs_affected"])
        for r in q_dedup_threshold_curve(spark, sf).collect()
    }
    assert set(curve) == set(DEDUP_LADDER)
    for t in DEDUP_LADDER:
        assert curve[t] == (n_pairs, n_dup_docs), t

    cal = q_minhash_calibration(spark, sf).collect()
    assert len(cal) == 1
    row = cal[0]
    assert row["sig_matches"] == N_MINHASH
    assert row["est_jac_permille"] == 1000
    assert row["n_pairs"] == n_pairs
    assert (
        row["mean_jac_permille"]
        == row["min_jac_permille"]
        == row["max_jac_permille"]
        == 1000
    )

    stats = q_minhash_band_stats(spark, sf).collect()
    assert len(stats) == N_BANDS
    for r in stats:
        assert r["n_docs"] == n_docs_total
        assert r["n_colliding_docs"] == n_dup_docs
        assert r["n_singletons"] == n_singletons
        assert r["n_buckets"] == len(classes) + n_singletons
        assert r["max_bucket"] == max(classes + [1])


def test_media_neardup_matches_python_replay(spark):
    """The banded perceptual-hash pairs equal a plain-Python replay:
    phash per media row via media_phash_py, candidates = same
    (media_type, band, 14-bit val) bucket, verify popcount(xor) <=
    MEDIA_PHASH_MAX_HAMMING — recall-lossless banding included."""
    import itertools

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.multimodal import (
        MEDIA_PHASH_BAND_BITS,
        MEDIA_PHASH_MAX_HAMMING,
        MEDIA_PHASH_N_BANDS,
        media_phash_py,
    )
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    mt_of = ("image", "audio", "video")
    docs = (
        load_table(spark, SF_ORACLE, "documents")
        .select("doc_id", "text")
        .collect()
    )
    sig = [
        (r["doc_id"], mt_of[r["doc_id"] % 3], media_phash_py(r["text"].encode()))
        for r in docs
    ]
    buckets: dict[tuple, list] = {}
    m = (1 << MEDIA_PHASH_BAND_BITS) - 1
    for d, mt, h in sig:
        for b in range(MEDIA_PHASH_N_BANDS):
            buckets.setdefault(
                (mt, b, (h >> (MEDIA_PHASH_BAND_BITS * b)) & m), []
            ).append((d, h))
    expected = set()
    for (mt, _, _), members in buckets.items():
        for (d1, h1), (d2, h2) in itertools.combinations(sorted(members), 2):
            if d1 < d2 and bin(h1 ^ h2).count("1") <= MEDIA_PHASH_MAX_HAMMING:
                expected.add((mt, d1, d2, bin(h1 ^ h2).count("1")))
    got = {
        (r["media_type"], r["doc_a"], r["doc_b"], r["hamming"])
        for r in QUERIES["media_neardup"](spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected, "fixture must contain perceptual near-dups"


def test_embedding_neardup_matches_python_replay(spark):
    """The LSH candidates + JVM fold re-score equal a plain-Python
    sequential-fold replay end to end (r14 opt round: the re-score
    moved from a numpy-cumsum MapInPandas stage into Catalyst's
    F.aggregate fold — this replay pins BIT-IDENTICAL floored scores
    and the full banding/candidate semantics, including the BLAS
    sign-recheck window of the cached signature stage, whose contract
    is sign parity with exactly this sequential fold)."""
    import itertools
    import math

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.dedup import (
        NEARDUP_BAND_BITS,
        NEARDUP_BANDS,
        NEARDUP_CUT,
        NEARDUP_PLANES,
    )
    from jaws_effective_processor_spark.tables import load_table
    from tests.conftest import SF_ORACLE

    def fold_dot(xs, ys):
        acc = 0.0
        for a, b in zip(xs, ys):
            acc = acc + a * b
        return acc

    rows = (
        load_table(spark, SF_ORACLE, "embeddings")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    vecs = {}
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(fold_dot(v, v))
        if n > 0:
            vecs[r["vec_id"]] = (int(r["label"]), v, n)
    buckets: dict[tuple, list] = {}
    for vid, (label, v, _n) in vecs.items():
        for b in range(NEARDUP_BANDS):
            val = 0
            for bit in range(NEARDUP_BAND_BITS):
                p = NEARDUP_PLANES[b * NEARDUP_BAND_BITS + bit]
                if fold_dot(v, p) >= 0:
                    val |= 1 << bit
            buckets.setdefault((label, b, val), []).append(vid)
    cut = int(NEARDUP_CUT * 10000)
    expected = set()
    for members in buckets.values():
        for va, vb in itertools.combinations(sorted(members), 2):
            _, xa, na = vecs[va]
            _, xb, nb = vecs[vb]
            permyriad = math.floor(fold_dot(xa, xb) / (na * nb) * 10000)
            if permyriad >= cut:
                expected.add((va, vb, permyriad))
    got = {
        (r["vec_a"], r["vec_b"], r["cos_permyriad"])
        for r in QUERIES["embedding_neardup"](spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected, "fixture must contain embedding near-dups"


def test_source_overlap_bitmask_general_parity(spark):
    """The <=64-source bitmask fast path and the general sorted-set
    path emit identical rows (same discipline as the near-dup gate's
    shuffle-mode parity pin). The fixture's source count must
    actually select the bitmask path, or this pins nothing."""
    from jaws_effective_processor_spark.functions.corpus import (
        SOURCE_BITMASK_MAX,
        _distinct_sources,
        _source_overlap_bitmask,
        _source_overlap_general,
    )
    from tests.conftest import SF_ORACLE

    n_sources = len(_distinct_sources(spark, SF_ORACLE))
    assert 2 <= n_sources <= SOURCE_BITMASK_MAX, n_sources
    fast = sorted(
        (tuple(r) for r in _source_overlap_bitmask(spark, SF_ORACLE).collect())
    )
    general = sorted(
        (tuple(r) for r in _source_overlap_general(spark, SF_ORACLE).collect())
    )
    assert fast == general
    assert fast, "fixture must contain cross-source overlap"
    # names + types must agree (nullability legitimately differs:
    # count() is non-null, the fast path's sum().cast() is nullable)
    shape = lambda df: [  # noqa: E731
        (f.name, f.dataType) for f in df.schema.fields
    ]
    assert shape(_source_overlap_bitmask(spark, SF_ORACLE)) == shape(
        _source_overlap_general(spark, SF_ORACLE)
    )


def test_dedup_threshold_curve_consistent_with_nearest_neighbor(spark):
    """The curve and the nearest-duplicate review must agree: a doc's
    best candidate score IS its nearest neighbor's jac_permille, so
    n_docs_affected at threshold t equals the count of
    nearest_neighbor_jaccard rows with jac_permille >= t; n_pairs is
    monotone non-increasing and matches a Python count over the
    scored candidate table."""
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.dedup import (
        DEDUP_LADDER,
        _candidate_jaccard,
    )
    from tests.conftest import SF_ORACLE

    scored = [
        r["jac_permille"]
        for r in _candidate_jaccard(spark, SF_ORACLE).collect()
    ]
    nn_best = [
        r["jac_permille"]
        for r in QUERIES["nearest_neighbor_jaccard"](
            spark, SF_ORACLE
        ).collect()
    ]
    curve = {
        r["threshold_permille"]: (r["n_pairs"], r["n_docs_affected"])
        for r in QUERIES["dedup_threshold_curve"](spark, SF_ORACLE).collect()
    }
    assert sorted(curve) == sorted(DEDUP_LADDER)
    prev_pairs = prev_docs = None
    for t in sorted(DEDUP_LADDER):
        n_pairs, n_docs = curve[t]
        assert n_pairs == sum(1 for j in scored if j >= t)
        assert n_docs == sum(1 for j in nn_best if j >= t)
        if prev_pairs is not None:
            assert n_pairs <= prev_pairs and n_docs <= prev_docs
        prev_pairs, prev_docs = n_pairs, n_docs
    assert curve[min(DEDUP_LADDER)][0] > 0, "fixture must have candidates"


def test_minhash_calibration_matches_python_replay(spark):
    """Every calibration row replays from the collected signature and
    scored-candidate tables: sig_matches counts equal positions,
    est = 1000k/N (floor), and the per-bucket n/mean/min/max are the
    plain Python aggregates (mean as integer DIV like both engines)."""
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.dedup import (
        N_MINHASH,
        _candidate_jaccard,
        _minhash_sig,
    )
    from tests.conftest import SF_ORACLE

    sig = {
        r["doc_id"]: r["sig"]
        for r in _minhash_sig(spark, SF_ORACLE).collect()
    }
    buckets: dict[int, list[int]] = {}
    for r in _candidate_jaccard(spark, SF_ORACLE).collect():
        k = sum(
            1
            for x, y in zip(sig[r["doc_a"]], sig[r["doc_b"]])
            if x == y
        )
        buckets.setdefault(k, []).append(r["jac_permille"])
    expected = {
        k: (
            (1000 * k) // N_MINHASH,
            len(v),
            sum(v) // len(v),
            min(v),
            max(v),
        )
        for k, v in buckets.items()
    }
    got = {
        r["sig_matches"]: (
            r["est_jac_permille"],
            r["n_pairs"],
            r["mean_jac_permille"],
            r["min_jac_permille"],
            r["max_jac_permille"],
        )
        for r in QUERIES["minhash_calibration"](spark, SF_ORACLE).collect()
    }
    assert got == expected
    assert expected, "fixture must have candidate pairs"


def test_user_retention_cohorts_replay_and_triangle(spark):
    """Python replay over the raw events plus the triangle invariants:
    every cohort has its day-0 row equal to the cohort's user count,
    no offset row exceeds the cohort size, and the triangle's total
    mass equals the distinct (user, active-day) count."""
    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.relational import ms_of
    from jaws_effective_processor_spark.tables import load_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_ORACLE

    events = load_table(spark, SF_ORACLE, "events")
    day = (ms_of(events, "ts") / F.lit(86400000)).cast("long")
    ud = {
        (r["user_id"], r["day"])
        for r in events.select("user_id", day.alias("day")).collect()
    }
    first = {}
    for u, d in ud:
        first[u] = min(first.get(u, d), d)
    expected: dict[tuple, int] = {}
    for u, d in ud:
        key = (first[u], d - first[u])
        expected[key] = expected.get(key, 0) + 1
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in QUERIES["user_retention_cohorts"](
            spark, SF_ORACLE
        ).collect()
    }
    assert got == expected
    cohort_size = {c: n for (c, off), n in got.items() if off == 0}
    for (c, off), n in got.items():
        assert n <= cohort_size[c], (c, off)
    assert sum(got.values()) == len(ud)


@given(
    st.lists(
        st.integers(min_value=0, max_value=15), min_size=8, max_size=8
    )
)
@settings(max_examples=30, deadline=None)
def test_pq_pack_unpack_inverse(codes):
    """pq_unpack_exprs is the exact inverse of pq_pack_expr for every
    code tuple in the M x K domain — the round-trip the code-only
    store serving path (adc_topk_against_store) depends on. Pure
    Python replay of the integer arithmetic (the Spark expressions
    are the same DIV/% formulas; the store round trip itself is
    pinned end-to-end by test_adc_store_server_matches_batch)."""
    from jaws_effective_processor_spark.functions.similarity import (
        PQ_K,
        PQ_M,
    )

    assert len(codes) == PQ_M and all(0 <= c < PQ_K for c in codes)
    packed = 0
    for c in codes:
        packed = packed * PQ_K + c
    unpacked = [
        (packed // (PQ_K ** (PQ_M - 1 - m))) % PQ_K for m in range(PQ_M)
    ]
    assert unpacked == codes
    assert 0 <= packed < PQ_K**PQ_M

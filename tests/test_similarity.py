"""ANN quality: multiprobe IVF must recover recall nprobe=1 loses.

Oracle parity (test_entry_contract) proves each variant computes its
own spec; this asserts the SEMANTIC ordering between the variants —
recall vs exact brute force can only improve as nprobe grows, because
probe p's candidate set is a superset of probe p-1's.
"""

from __future__ import annotations

from jaws_effective_processor_spark.entry_queries import QUERIES
from tests.conftest import SF_ORACLE, SF_SMOKE


def _topk(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, neigh in exact.items():
        total += len(neigh)
        hits += len(neigh & approx.get(q, set()))
    return hits / total


def test_multiprobe_recall_dominates_single_probe(spark):
    exact = _topk(QUERIES["knn_bruteforce"](spark, SF_ORACLE))
    single = _recall(_topk(QUERIES["knn_ivf"](spark, SF_ORACLE)), exact)
    multi = _recall(
        _topk(QUERIES["knn_ivf_multiprobe"](spark, SF_ORACLE)), exact
    )
    assert multi >= single, (multi, single)
    # probing 2 of 8 cells must find at least a quarter of the true
    # top-k on this corpus (loose floor; measured ~0.5+)
    assert multi >= 0.25, multi


def test_hard_negatives_match_ground_truth_replay(spark):
    """Each mined (positive, hard-negative) pair is exactly the
    highest-ranked same-/different-label neighbor in the exact top-K
    shortlist, the margin is their permyriad difference, and queries
    whose shortlist lacks either side emit nothing."""
    from jaws_effective_processor_spark.functions.similarity import (
        _brute_neighbors,
    )

    nb: dict[int, list] = {}
    truth: dict[int, int] = {}
    for r in _brute_neighbors(spark, SF_ORACLE).collect():
        nb.setdefault(r["query_id"], []).append(r)
        truth[r["query_id"]] = r["true_label"]
    expected = {}
    for q, rows in nb.items():
        rows.sort(key=lambda r: r["rank"])
        pos = next(
            (r for r in rows if r["neighbor_label"] == truth[q]), None
        )
        neg = next(
            (r for r in rows if r["neighbor_label"] != truth[q]), None
        )
        if pos is not None and neg is not None:
            expected[q] = (
                pos["neighbor_id"],
                neg["neighbor_id"],
                pos["cos_permyriad"] - neg["cos_permyriad"],
            )
    got = {
        r["query_id"]: (r["pos_id"], r["neg_id"], r["margin_permyriad"])
        for r in QUERIES["hard_negatives"](spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_pq_training_reduces_distortion(spark):
    """The trained codebook is a real Lloyd trainer: total
    quantization error (sum over vectors x subspaces of the coded
    cell's squared distance, exact integer micro^2) strictly DECREASES
    seed -> round 1 -> round 2 on this corpus (measured ~23% total
    drop at sf0.01/sf0.1) — the training-objective claim behind
    shipping trained codes, and the invariant the old untrained-seed
    coder could not make."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions import similarity as s

    px = s._pq_micro(spark, SF_ORACLE)
    dist = [
        s._pq_assign(px, cent).agg(F.sum("dist_sq")).collect()[0][0]
        for cent in (
            s._pq_seed(spark, SF_ORACLE),
            s._pq_centroids(spark, SF_ORACLE, 1),
            s._pq_centroids(spark, SF_ORACLE, 2),
        )
    ]
    assert dist[0] > dist[1] > dist[2], dist


def test_pq_round_scored_matches_reference(spark):
    """The shipped scan-local Lloyd round (literal-codebook argmin
    over the xs pivot, r14 opt round) equals the _pq_assign reference
    join+window form bit-for-bit — every round to ship+1, every
    family. Given equal assignments the centroid means are the same
    aggregation, so chain equality follows inductively (the builder's
    full-chain parity harness verified assignments AND centroids at
    sf0.001/sf0.01/sf0.1 on land day)."""
    from jaws_effective_processor_spark.functions import similarity as s

    for res in (False, True, "kmeans"):
        px = s._pq_micro_of(spark, SF_ORACLE, res)
        ship = s._pq_ship_round(spark, SF_ORACLE, res)
        for rnd in range(1, ship + 2):
            cent = (
                s._pq_seed(spark, SF_ORACLE, res)
                if rnd == 1
                else s._pq_centroids(spark, SF_ORACLE, rnd - 1, res)
            )
            ref = sorted(map(tuple, s._pq_assign(px, cent).collect()))
            new = sorted(
                map(
                    tuple,
                    s._pq_assignment(
                        spark, SF_ORACLE, rnd, res
                    ).collect(),
                )
            )
            assert new == ref, (res, rnd)


def test_cell_ranked_matches_reference(spark):
    """The shipped scan-local cosine cell ranking (_cell_ranked —
    literal centroid vectors + collected norms + comparator sort, r14
    opt round) equals the _cell_ranked_join reference (broadcast
    cross join + window) BIT-FOR-BIT, doubles included."""
    import struct as st

    from jaws_effective_processor_spark.functions import similarity as s

    def rows(df):
        return sorted(
            (
                r["vec_id"],
                r["cent_id"],
                r["rn"],
                st.pack("<d", r["ccos"]),
                st.pack("<d", r["norm"]),
            )
            for r in df.collect()
        )

    e = s._vectors(spark, SF_ORACLE)
    assert rows(s._cell_ranked(e)) == rows(s._cell_ranked_join(e))


def test_kranked_cells_matches_reference(spark):
    """The shipped scan-local k-means routing ranking
    (_kranked_cells: literal centroid matrix + (dist_sq, cell) struct
    sort, r14 opt round) equals the broadcast-join + window reference
    — exact integers, same (dist_sq, cid) tie-break, all ranks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions import clustering as c
    from jaws_effective_processor_spark.functions import similarity as s

    e = c._emb_micro(spark, SF_ORACLE)
    cent = c._trained_centroids(spark, SF_ORACLE)
    d = (
        e.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cid")
        .agg(
            F.sum(
                (F.col("xm") - F.col("cm")) * (F.col("xm") - F.col("cm"))
            ).alias("dist_sq")
        )
    )
    w = Window.partitionBy("vec_id").orderBy("dist_sq", "cid")
    ref = d.withColumn("rn", F.row_number().over(w)).select(
        "vec_id", F.col("cid").alias("cell"), "dist_sq", "rn"
    )

    def rows(df):
        return sorted(
            (r["vec_id"], r["cell"], r["dist_sq"], r["rn"])
            for r in df.collect()
        )

    assert rows(s._kranked_cells(spark, SF_ORACLE)) == rows(ref)


def test_pq_training_stops_at_convergence(spark):
    """The shipped depth IS the stop rule (r10): every update before
    the last improved distortion by >= PQ_CONVERGE_PERMILLE, and the
    final update is the first sub-threshold one (the flat tail) —
    unless the PQ_TRAIN_CAP ceiling cut training short. The trace has
    exactly ship+1 rows, and the multiplicative integer rule here is
    the same expression the DuckDB twin's `ship` CTE replays."""
    from jaws_effective_processor_spark.functions import similarity as s

    K = s._pq_ship_round(spark, SF_ORACLE)
    rows = sorted(
        s.q_pq_train_trace(spark, SF_ORACLE).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == list(range(1, K + 2))
    tds = [r["total_dist_sq"] for r in rows]

    def converged(a: int, b: int) -> bool:
        return a == 0 or (a - b) * 1000 < a * s.PQ_CONVERGE_PERMILLE

    for k in range(1, K):  # every earlier update cleared the bar
        assert not converged(tds[k - 1], tds[k]), (k, tds)
    if K < s.PQ_TRAIN_CAP:  # the final update is the first flat one
        assert converged(tds[K - 1], tds[K]), tds


def test_pq_trained_recall_not_worse_than_seed(spark):
    """ADC recall with the trained codebook is at least the seed
    codebook's (equal at sf0.01 where recall@5 over 500 near-uniform
    synthetic vectors is noise-bound; at sf0.1 the trained codebook
    measured 2x the seed's mean recall, 60 -> 120 permille). The
    parametrized _adc_recall exists exactly for this lift
    measurement."""
    from jaws_effective_processor_spark.functions import similarity as s

    cb0 = s._pq_codebook_at(spark, SF_ORACLE, 0)
    codes0 = s._pq_codes_for(spark, SF_ORACLE, cb0, "pq_codes_seed")
    seed = [
        r["recall_permille"]
        for r in s._adc_recall(spark, SF_ORACLE, cb0, codes0).collect()
    ]
    cb = s._pq_codebook(spark, SF_ORACLE)
    trained = [
        r["recall_permille"]
        for r in s._adc_recall(
            spark, SF_ORACLE, cb, s._pq_codes(spark, SF_ORACLE)
        ).collect()
    ]
    assert sum(trained) / len(trained) >= sum(seed) / len(seed)


def test_refine_lifts_recall(spark):
    """The refine stage's reason to exist, measured: exact re-ranking
    the ADC shortlist recovers recall that code-only ranking loses —
    mean recall@TOP_K of q_ann_ivfpq_refined is at least the
    ADC-ranked q_ann_ivfpq's over the identical probed candidates
    (measured at the r11 k' = 16 x TOP_K default: 260 vs 100 permille
    at sf0.01, 480 vs 180 at sf0.1),
    and is bounded above by the routing ceiling (exact-scored
    multiprobe, q_ann_recall) since the refine can only rescore what
    the probes reached."""
    from jaws_effective_processor_spark.functions import similarity as s

    def mean_recall(df):
        rows = df.collect()
        return sum(r["recall_permille"] for r in rows) / len(rows)

    adc_ranked = mean_recall(
        s._recall_vs_truth(
            spark,
            SF_ORACLE,
            s.q_ann_ivfpq(spark, SF_ORACLE).select(
                "query_id", "neighbor_id"
            ),
        )
    )
    refined = mean_recall(s.q_ann_refine_recall(spark, SF_ORACLE))
    ceiling = mean_recall(s.q_ann_recall(spark, SF_ORACLE))
    assert refined >= adc_ranked, (refined, adc_ranked)
    assert refined <= ceiling, (refined, ceiling)


def test_refine_curve_anchor_and_monotone(spark):
    """The k' sweep is internally consistent: the k' = TOP_K row is
    the no-refine anchor (re-ranking the ADC top-k cannot change
    WHICH ids are served, so its recall equals the ADC ranking's),
    and recall is monotone nondecreasing in k' (a larger shortlist is
    a superset — dropping a true neighbor that a smaller k' kept is
    impossible, by the global-top-k argument in
    test_refine_lifts_recall)."""
    from jaws_effective_processor_spark.functions import similarity as s

    rows = {
        r["k_refine"]: r["recall_permille"]
        for r in s.q_ann_refine_curve(spark, SF_ORACLE).collect()
    }
    assert sorted(rows) == sorted(s.REFINE_CURVE_KS)
    adc_rows = s._recall_vs_truth(
        spark,
        SF_ORACLE,
        s.q_ann_ivfpq(spark, SF_ORACLE).select("query_id", "neighbor_id"),
    ).collect()
    adc_mean = sum(r["n_hits"] for r in adc_rows) * 1000 // (
        len(adc_rows) * s.TOP_K
    )
    assert rows[s.TOP_K] == adc_mean
    ks = sorted(rows)
    assert all(rows[a] <= rows[b] for a, b in zip(ks, ks[1:])), rows


def test_probe_curve_anchor_and_routing_lift(spark):
    """The nprobe sweep is internally consistent: (1) one row per
    swept setting; (2) the nprobe = IVF_NPROBE row reproduces the
    refined serve path's total recall exactly (same shortlist, same
    re-rank — the sweep at the serving default IS q_ann_ivfpq_refined
    evaluated by q_ann_refine_recall); (3) the ceiling lift the curve
    exists to show: probing more cells than the serving default lifts
    refined recall (measured at the r11 k' = 16 x TOP_K default:
    260 -> 560 permille at nprobe 2 -> 4 at sf0.01; 480 -> 540 at
    sf0.1). NO monotonicity assertion across the whole sweep,
    deliberately: at FIXED shortlist size k', extra probed cells can
    flood the ADC shortlist and displace true neighbors the ADC
    misjudges (measured at the pre-r11 k'=20: sf0.1 nprobe=8 landed
    360 < nprobe=4's 400 — the finding that motivated
    q_ann_joint_tuning; at k'=80 the reversal disappears), so the two
    knobs interact — that interaction is exactly what the curve and
    the joint surface are for."""
    from jaws_effective_processor_spark.functions import similarity as s

    rows = {
        r["nprobe"]: (r["n_hits"], r["recall_permille"])
        for r in s.q_ann_probe_curve(spark, SF_ORACLE).collect()
    }
    assert sorted(rows) == sorted(s.PROBE_CURVE_NPROBES)
    ref = s.q_ann_refine_recall(spark, SF_ORACLE).collect()
    total = sum(r["n_hits"] for r in ref) * 1000 // (
        len(ref) * s.TOP_K
    )
    assert rows[s.IVF_NPROBE][1] == total, (rows, total)
    lifted = max(p for p in s.PROBE_CURVE_NPROBES if p > s.IVF_NPROBE)
    assert rows[4][1] > rows[s.IVF_NPROBE][1], rows
    assert lifted in rows


def test_joint_tuning_slices_match_single_axis_curves(spark):
    """The joint (nprobe x k') surface is internally consistent with
    both single-axis sweeps it generalizes: (1) one row per grid
    point; (2) its nprobe = IVF_NPROBE column equals ann_refine_curve
    at the shared k' values (same routing, same shortlist, same
    re-rank); (3) its k' = REFINE_K row equals ann_probe_curve at the
    shared nprobe values; (4) recall is monotone nondecreasing in k'
    at every fixed nprobe (larger shortlist is a superset of the
    smaller under identical routing)."""
    from jaws_effective_processor_spark.functions import similarity as s

    surf = {
        (r["nprobe"], r["k_refine"]): r["recall_permille"]
        for r in s.q_ann_joint_tuning(spark, SF_ORACLE).collect()
    }
    assert sorted(surf) == sorted(
        (p, k) for p in s.JOINT_NPROBES for k in s.JOINT_KS
    )
    refine = {
        r["k_refine"]: r["recall_permille"]
        for r in s.q_ann_refine_curve(spark, SF_ORACLE).collect()
    }
    for k in set(s.JOINT_KS) & set(s.REFINE_CURVE_KS):
        assert surf[(s.IVF_NPROBE, k)] == refine[k], (k, surf, refine)
    probe = {
        r["nprobe"]: r["recall_permille"]
        for r in s.q_ann_probe_curve(spark, SF_ORACLE).collect()
    }
    for p in set(s.JOINT_NPROBES) & set(s.PROBE_CURVE_NPROBES):
        assert surf[(p, s.REFINE_K)] == probe[p], (p, surf, probe)
    for p in s.JOINT_NPROBES:
        ks = sorted(s.JOINT_KS)
        assert all(
            surf[(p, a)] <= surf[(p, b)] for a, b in zip(ks, ks[1:])
        ), (p, surf)


def test_pq_exact_duplicates_code_identically(spark):
    """Coding is a pure function of the vector: exact-duplicate
    embeddings get identical codes (and the packed code is the base-K
    fold of the per-subspace codes)."""
    from jaws_effective_processor_spark.functions.similarity import (
        PQ_K,
        PQ_M,
    )
    from jaws_effective_processor_spark.tables import load_table

    emb = {
        r["vec_id"]: tuple(float(x) for x in r["embedding"])
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }
    rows = {
        r["vec_id"]: r
        for r in QUERIES["pq_quantize"](spark, SF_ORACLE).collect()
    }
    by_vec: dict[tuple, set] = {}
    for i, v in emb.items():
        by_vec.setdefault(v, set()).add(rows[i]["pq_code"])
    assert all(len(codes) == 1 for codes in by_vec.values())
    for r in rows.values():
        packed = 0
        for m in range(PQ_M):
            packed = packed * PQ_K + r[f"code_{m}"]
        assert r["pq_code"] == packed


def test_with_pq_codes_rejects_colliding_columns(spark):
    """The coder refuses an input frame that would collide with its
    staging prefix OR its output names (ADVICE r8 + r9) — loudly,
    here, instead of as an ambiguous-reference error deep in the
    caller's plan."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions.similarity import (
        DIM,
        PQ_K,
        PQ_M,
        PQ_SUB,
        with_pq_codes,
    )

    cb = [
        [[0] * PQ_SUB for _ in range(PQ_K)] for _ in range(PQ_M)
    ]
    base = spark.range(1).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.0)] * DIM).alias("v"),
    )
    for bad in ("_pq_stage", "code_0", f"code_{PQ_M - 1}"):
        with _pytest.raises(ValueError, match="collide"):
            with_pq_codes(base.withColumn(bad, F.lit(1)), cb)
    # clean input still codes
    assert f"code_{PQ_M - 1}" in with_pq_codes(base, cb).columns


def test_partial_topk_matches_naive_window(spark):
    """partial_topk is IDENTICAL to the naive per-group window it
    replaces (the scale-safe two-level form cannot change results:
    a row beaten by k rows inside its own input partition cannot be
    in the global top-k) — exercised over a multi-partition input
    with heavy per-group duplication of scores."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions.similarity import (
        partial_topk,
    )

    df = (
        spark.range(0, 5000, 1, 16)
        .select(
            (F.col("id") % 7).alias("g"),
            (F.col("id") % 13).alias("score"),
            F.col("id").alias("uid"),
        )
    )
    order = [F.col("score").desc(), F.col("uid")]
    w = Window.partitionBy("g").orderBy(*order)
    naive = (
        df.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 9)
    )
    fast = partial_topk(df, ["g"], order, 9, rank_col="rank")
    assert sorted(map(tuple, naive.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_partial_topk_plans_partial_group_limit(spark):
    """The scale guarantee partial_topk's docstring claims (r14 opt
    round): Spark's InsertWindowGroupLimit plans the rank <= k filter
    as a WindowGroupLimit pair — PARTIAL mode before the window's
    exchange (the map-side per-input-partition top-k prune the old
    manual two-level scheme implemented by hand), FINAL mode after —
    so a reducer receives at most k rows per map partition per group,
    never a corpus-sized single-reducer sort. If a Spark upgrade ever
    drops the rule, this trips and the manual two-level form must
    come back."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions.similarity import (
        partial_topk,
    )
    from jaws_effective_processor_spark.plans.inspect import explain_str

    df = spark.range(0, 5000, 1, 16).select(
        (F.col("id") % 7).alias("g"),
        (F.col("id") % 13).alias("score"),
        F.col("id").alias("uid"),
    )
    out = partial_topk(
        df, ["g"], [F.col("score").desc(), F.col("uid")], 9
    )
    plan = explain_str(out)
    assert plan.count("WindowGroupLimit") >= 2, plan
    assert "Partial" in plan, plan


def test_ann_pq_recall_matches_python_replay(spark):
    """The ADC recall table equals a plain-Python replay: reconstruct
    each corpus vector from its codes, rank by reconstructed cosine
    (ties to the lower neighbor id), intersect the top-k with the
    exact cosine top-k."""
    from jaws_effective_processor_spark.functions.similarity import (
        N_QUERIES,
        PQ_M,
        PQ_SUB,
        TOP_K,
        _pq_codebook,
        _pq_codebook_double,
    )
    from jaws_effective_processor_spark.tables import load_table

    # reconstruction values: trained micro ints / 1e6 — the doubles
    # the engine's ADC LUTs are built from
    cb = _pq_codebook_double(_pq_codebook(spark, SF_ORACLE))
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, SF_ORACLE, "embeddings").collect()
    }

    def fold_dot(x, y):
        acc = 0.0
        for p, q in zip(x, y):
            acc += p * q
        return acc

    def norm(v):
        return fold_dot(v, v) ** 0.5

    codes = {
        r["vec_id"]: [r[f"code_{m}"] for m in range(PQ_M)]
        for r in QUERIES["pq_quantize"](spark, SF_ORACLE).collect()
    }
    live = {i: v for i, v in emb.items() if fold_dot(v, v) > 0}
    queries = {i: v for i, v in live.items() if i < N_QUERIES}
    expected = {}
    for qid, qv in queries.items():
        qn = norm(qv)
        exact = sorted(
            (
                (-fold_dot(qv, v) / (qn * norm(v)), i)
                for i, v in live.items()
                if i != qid
            )
        )[:TOP_K]
        approx = []
        for i in live:
            if i == qid:
                continue
            # fixed m-order partial sums, mirroring the engine's
            # per-subspace LUT arithmetic (a flat 64-dim fold would
            # differ in ulps and could flip near-ties)
            num = 0.0
            r2 = 0.0
            for m in range(PQ_M):
                c = cb[m][codes[i][m]]
                num += fold_dot(qv[m * PQ_SUB : (m + 1) * PQ_SUB], c)
                r2 += fold_dot(c, c)
            ch = num / (qn * r2**0.5) if r2 > 0 else -2.0
            approx.append((-ch, i))
        top = {i for _, i in sorted(approx)[:TOP_K]}
        hits = len(top & {i for _, i in exact})
        expected[qid] = (hits, 1000 * hits // TOP_K)
    got = {
        r["query_id"]: (r["n_hits"], r["recall_permille"])
        for r in QUERIES["ann_pq_recall"](spark, SF_ORACLE).collect()
    }
    assert got == expected


def test_pq_train_round_conserves_members(spark):
    """Every vector appears in exactly one (m, j) cell per subspace
    of the final training round's assignment, so member counts sum to
    PQ_M x corpus; the carry-forward update keeps ALL M x K cells
    present (an emptied cell reports n_members 0, shift 0); every
    displacement is non-negative."""
    from jaws_effective_processor_spark.functions.similarity import (
        PQ_K,
        PQ_M,
    )
    from jaws_effective_processor_spark.tables import load_table

    n_vecs = load_table(spark, SF_ORACLE, "embeddings").count()
    rows = QUERIES["pq_train_round"](spark, SF_ORACLE).collect()
    per_m: dict[int, int] = {}
    cells = set()
    for r in rows:
        per_m[r["m"]] = per_m.get(r["m"], 0) + r["n_members"]
        cells.add((r["m"], r["j"]))
        assert r["shift_micro_sum"] >= 0
    assert per_m == {m: n_vecs for m in range(PQ_M)}
    # self-coding guarantees every (m, j) cell is populated
    assert cells == {(m, j) for m in range(PQ_M) for j in range(PQ_K)}


def test_spill_serve_structure_and_routing_lift(spark):
    """Multi-assignment (spill) serve path: (1) well-formed serving
    rows — dense ranks 1..TOP_K per query, no duplicate neighbors
    despite every corpus vector living in SPILL_ASSIGN cells (the
    byte-identical ADC duplicates must dedupe before ranking);
    (2) the candidate-superset property pays — spill recall at the
    serving default routing is at least the single-assignment
    refined path's (measured: 580 vs 260 permille at sf0.01 — the
    near-boundary neighbors single assignment loses are exactly what
    spill indexes into the probed cells)."""
    from jaws_effective_processor_spark.functions import similarity as s

    rows = s.q_ann_ivfpq_spill(spark, SF_ORACLE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert by_q
    for q, rs in by_q.items():
        assert sorted(x["rank"] for x in rs) == list(
            range(1, len(rs) + 1)
        )
        neigh = [x["neighbor_id"] for x in rs]
        assert len(neigh) == len(set(neigh)), (q, neigh)
        assert len(rs) <= s.TOP_K

    spill = s._recall_vs_truth(
        spark,
        SF_ORACLE,
        s.q_ann_ivfpq_spill(spark, SF_ORACLE).select(
            "query_id", "neighbor_id"
        ),
    ).collect()
    spill_mean = sum(r["n_hits"] for r in spill) * 1000 // (
        len(spill) * s.TOP_K
    )
    single = s.q_ann_refine_recall(spark, SF_ORACLE).collect()
    single_mean = sum(r["n_hits"] for r in single) * 1000 // (
        len(single) * s.TOP_K
    )
    assert spill_mean >= single_mean, (spill_mean, single_mean)


def test_spill_tuning_surface_anchors(spark):
    """The (spill x nprobe) surface is internally consistent: one row
    per grid point, and the two serving-default anchors reproduce the
    shipped serve paths' totals exactly — (spill=1, nprobe=IVF_NPROBE)
    IS q_ann_ivfpq_refined evaluated by q_ann_refine_recall, and
    (spill=SPILL_ASSIGN, nprobe=IVF_NPROBE) IS q_ann_ivfpq_spill's
    recall. No monotonicity asserted on either axis (supersets can
    flood the fixed shortlist — the joint-surface lesson). Measured
    at sf0.01 (the equal-ADC-cost diagonal the surface exists to
    price): (2,1)=360 beats (1,2)=260 and (2,2)=580 beats (1,4)=560
    permille — the 2x storage price buys a dominating point on the
    recall-per-candidate frontier at this geometry."""
    from jaws_effective_processor_spark.functions import similarity as s

    grid = {
        (r["spill"], r["nprobe"]): r["n_hits"]
        for r in s.q_ann_spill_tuning(spark, SF_ORACLE).collect()
    }
    assert set(grid) == {
        (sp, np)
        for sp in s.SPILL_TUNING_SPILLS
        for np in s.SPILL_TUNING_NPROBES
    }
    single = sum(
        r["n_hits"]
        for r in s.q_ann_refine_recall(spark, SF_ORACLE).collect()
    )
    assert grid[(1, s.IVF_NPROBE)] == single
    spill_hits = sum(
        r["n_hits"]
        for r in s._recall_vs_truth(
            spark,
            SF_ORACLE,
            s.q_ann_ivfpq_spill(spark, SF_ORACLE).select(
                "query_id", "neighbor_id"
            ),
        ).collect()
    )
    assert grid[(s.SPILL_ASSIGN, s.IVF_NPROBE)] == spill_hits


def test_kmeans_tuning_surface_anchors(spark):
    """The kmeans tuning surface (the r13 serving default's
    (spill x nprobe) grid) is internally consistent: one row per
    grid point, and the serving-default anchors reproduce the
    shipped kmeans serve paths' totals exactly —
    (1, IVF_NPROBE) IS q_ann_ivfpq_kmeans's recall and
    (SPILL_ASSIGN, IVF_NPROBE) IS q_ann_ivfpq_spill_kmeans's. No
    monotonicity asserted (measured: spill DROPS recall at nprobe=4
    at sf0.1 — shortlist flooding)."""
    from jaws_effective_processor_spark.functions import similarity as s

    grid = {
        (r["spill"], r["nprobe"]): r["n_hits"]
        for r in s.q_ann_kmeans_tuning(spark, SF_ORACLE).collect()
    }
    assert set(grid) == {
        (sp, np)
        for sp in s.SPILL_TUNING_SPILLS
        for np in s.SPILL_TUNING_NPROBES
    }
    for fn, sp in (
        (s.q_ann_ivfpq_kmeans, 1),
        (s.q_ann_ivfpq_spill_kmeans, s.SPILL_ASSIGN),
    ):
        hits = sum(
            r["n_hits"]
            for r in s._recall_vs_truth(
                spark,
                SF_ORACLE,
                fn(spark, SF_ORACLE).select("query_id", "neighbor_id"),
            ).collect()
        )
        assert grid[(sp, s.IVF_NPROBE)] == hits, (sp, grid)


def test_residual_diagnosis_invariants(spark):
    """The diagnosis artifact's internal consistency: one row per
    (codebook, coarse) family; distortion never exceeds the input
    energy (the codebook cannot do worse than zero — every centroid
    choice is an argmin against an existing codebook entry, and the
    seed already bounds it); ship_round matches the trainer's
    session decision. And the two measured premises on this corpus:
    the member-vector coarse level does NOT contract (residual
    energy ~1.62x raw — the WHY behind serving raw codes) while the
    TRAINED k-means coarse level DOES (energy below raw), and under
    the contracting level the shipped absolute distortion lands
    BELOW raw's — the residual lever pays exactly when its premise
    holds, on the real corpus."""
    from jaws_effective_processor_spark.functions import similarity as s

    rows = {
        (r["codebook"], r["coarse"]): r
        for r in s.q_pq_residual_diagnosis(spark, SF_ORACLE).collect()
    }
    assert set(rows) == {
        ("raw", "none"),
        ("residual", "member_vectors"),
        ("residual", "kmeans"),
    }
    for key, res in (
        (("raw", "none"), False),
        (("residual", "member_vectors"), True),
        (("residual", "kmeans"), "kmeans"),
    ):
        r = rows[key]
        assert 0 <= r["total_dist_sq"] <= r["energy_micro2"], r
        assert r["ship_round"] == s._pq_ship_round(spark, SF_ORACLE, res)
        assert (
            r["dist_permille"]
            == 1000 * r["total_dist_sq"] // r["energy_micro2"]
        )
    raw = rows[("raw", "none")]
    member = rows[("residual", "member_vectors")]
    kmeans = rows[("residual", "kmeans")]
    assert member["energy_micro2"] > raw["energy_micro2"], rows
    assert kmeans["energy_micro2"] < raw["energy_micro2"], rows
    assert kmeans["total_dist_sq"] < raw["total_dist_sq"], rows


def test_residual_coding_wins_on_contracting_fixture(
    spark, tmp_path_factory
):
    """The residual implementation validated where its premise HOLDS:
    a corpus whose vectors sit in tight clusters around the
    designated centroid vectors (home-cell cosine ~1, so the coarse
    level CONTRACTS — the geometry trained-k-means coarse quantizers
    give real deployments). On this fixture the diagnosis artifact
    must show residual energy strictly BELOW raw (the premise) and a
    strictly smaller absolute shipped distortion (the payoff), and
    the acceptance grid must show residual refined recall at least
    raw's on both index layouts — i.e. the sf0.1 inversion measured
    on the synthetic corpus (q_ann_ivfpq_residual's disclosure) is a
    property of THAT corpus's non-contracting member-vector coarse
    level, not of this implementation."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from jaws_effective_processor_spark.functions import similarity as s

    d = tmp_path_factory.mktemp("contracting_emb")
    dim = s.DIM
    n_cells = s.N_CELLS

    def centroid(c: int) -> list[float]:
        # well-separated block directions with a small common floor
        return [
            1.0 if (j // (dim // n_cells)) == c else 0.05
            for j in range(dim)
        ]

    def member(c: int, i: int) -> list[float]:
        # tight deterministic jitter around the cluster centroid:
        # |noise| <= 0.03 per dim -> home-cell cosine ~0.99+
        base = centroid(c)
        return [
            base[j] + (((i * 31 + j * 7) % 13) - 6) / 200.0
            for j in range(dim)
        ]

    vecs = []
    # queries 0..9: cluster members too
    for i in range(s.N_QUERIES):
        vecs.append(member(i % n_cells, i))
    # centroids 10..17: the designated coarse codebook
    for c in range(n_cells):
        vecs.append(centroid(c))
    # corpus: 12 members per cluster
    for i in range(12 * n_cells):
        vecs.append(member(i % n_cells, 100 + i))
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array(
                [i % 3 for i in range(len(vecs))], pa.int32()
            ),
        }
    )
    pq.write_table(table, os.path.join(str(d), "embeddings.parquet"))
    sf = str(d)

    diag = {
        (r["codebook"], r["coarse"]): r
        for r in s.q_pq_residual_diagnosis(spark, sf).collect()
    }
    raw = diag[("raw", "none")]
    res = diag[("residual", "member_vectors")]
    assert (
        res["energy_micro2"] < raw["energy_micro2"]
    ), diag  # the premise: the coarse level contracts
    assert (
        res["total_dist_sq"] < raw["total_dist_sq"]
    ), diag  # the payoff: the same budget reconstructs better
    grid = {
        (r["coarse"], r["codes"], r["index_kind"]): r["recall_permille"]
        for r in s.q_ann_residual_recall(spark, sf).collect()
    }
    m = "member_vectors"
    assert grid[(m, "residual", "single")] >= grid[(m, "raw", "single")], grid
    assert grid[(m, "residual", "spill")] >= grid[(m, "raw", "spill")], grid
    # the r13 coarse axis: all eight grid points emit on this fixture
    # too (the trained k-means level also contracts here — its seeds
    # are cluster members — but its recall relation to the designated
    # member-vector level is a property of the fixture, not asserted)
    assert len(grid) == 8, grid
    diagk = diag[("residual", "kmeans")]
    assert diagk["energy_micro2"] < raw["energy_micro2"], diag


def test_kranked_home_cell_is_the_kmeans_assignment(spark):
    """The k-means serve stack's routing table agrees with the
    clustering surface it claims to route on: _kranked_cells' rn=1
    row per vector IS _assignment_r2's (cid, dist_sq) exactly — the
    trained coarse level serves the SAME partition kmeans_assign
    publishes, so a curation step joining on cluster_id and an ANN
    probe routing on cell read one geometry. Also pins the probe
    order's totality: every vector ranks every trained cell exactly
    once (rn is a permutation of 1..n_cells)."""
    from jaws_effective_processor_spark.functions import similarity as s
    from jaws_effective_processor_spark.functions.clustering import (
        _assignment_r2,
    )

    ranked = s._kranked_cells(spark, SF_ORACLE).collect()
    homes = {
        r["vec_id"]: (r["cell"], r["dist_sq"])
        for r in ranked
        if r["rn"] == 1
    }
    a2 = {
        r["vec_id"]: (r["cid"], r["dist_sq"])
        for r in _assignment_r2(spark, SF_ORACLE).collect()
    }
    assert homes == a2
    from collections import defaultdict

    per_vec = defaultdict(list)
    n_cells = len({r["cell"] for r in ranked})
    for r in ranked:
        per_vec[r["vec_id"]].append(r["rn"])
    for vid, rns in per_vec.items():
        assert sorted(rns) == list(range(1, n_cells + 1)), vid


def test_residual_micro_is_exact_integer_identity(spark):
    """The residual micro table is the EXACT integer decomposition of
    the raw one: for every (vec, m, d) with a home cell, residual +
    centroid_micro == raw micro (floored first, subtracted after);
    vectors without a home cell (zero-norm) carry their raw values.
    This is the cross-engine-exactness foundation of the residual
    family — no float subtraction anywhere."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions import similarity as s

    raw = s._pq_micro(spark, SF_SMOKE).select(
        "vec_id", "m", "d", F.col("xm").alias("_raw")
    )
    res = s._pqr_micro(spark, SF_SMOKE).select(
        "vec_id", "m", "d", F.col("xm").alias("_res")
    )
    homes = (
        s._ranked_cells(spark, SF_SMOKE)
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cent_id").alias("_cell"))
    )
    centm = s._pq_micro(spark, SF_SMOKE).filter(
        (F.col("vec_id") >= s.N_QUERIES)
        & (F.col("vec_id") < s.N_QUERIES + s.N_CELLS)
    ).select(
        F.col("vec_id").alias("_cell"), "m", "d", F.col("xm").alias("_cxm")
    )
    joined = (
        raw.join(res, ["vec_id", "m", "d"])
        .join(homes, "vec_id", "left")
        .join(centm, ["_cell", "m", "d"], "left")
    )
    bad = joined.filter(
        F.col("_res") + F.coalesce(F.col("_cxm"), F.lit(0))
        != F.col("_raw")
    ).count()
    assert bad == 0
    # totality: one residual row per raw row
    assert res.count() == raw.count()


def test_residual_code_table_shape(spark):
    """The residual code table indexes every norm>0 vector in exactly
    SPILL_ASSIGN distinct cells (assign_rn dense 1..SPILL_ASSIGN) —
    codes are duplicated per assignment, raw vectors never are."""
    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions import similarity as s

    codes = s._pqr_codes(spark, SF_SMOKE)
    per_vec = codes.groupBy("vec_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("cell").alias("nc"),
        F.sort_array(F.collect_list("assign_rn")).alias("rns"),
    )
    bad = per_vec.filter(
        (F.col("n") != s.SPILL_ASSIGN)
        | (F.col("nc") != s.SPILL_ASSIGN)
        | (F.col("rns") != F.array(*[F.lit(i + 1) for i in range(s.SPILL_ASSIGN)]))
    ).count()
    assert bad == 0
    n_vectors = s._vectors(spark, SF_SMOKE).count()
    assert codes.count() == n_vectors * s.SPILL_ASSIGN


def test_residual_recall_grid_consistency(spark):
    """The (coarse x codes x index) acceptance grid is internally
    consistent: the (member, raw, single) row reproduces
    q_ann_refine_recall's total exactly, the (member, raw, spill) row
    reproduces the spill path's recall, and the (kmeans, residual, *)
    rows reproduce the dedicated kmeans serve queries' recall (same
    serve chains, same evaluation) — the grid adds no new ranking,
    only the side-by-side artifact. Measured (recorded, deliberately
    NOT asserted as a lift for the member rows: on this corpus the
    classic residual lever INVERTS on the non-contracting
    member-vector coarse level — see q_ann_ivfpq_residual's
    disclosure — while the r13 trained-k-means coarse level routes
    dramatically better): sf0.01 member raw/single 260, raw/spill
    580, residual/single 280, residual/spill 540; kmeans rows
    measured in PLANS.md round-13."""
    from jaws_effective_processor_spark.functions import similarity as s

    grid = {
        (r["coarse"], r["codes"], r["index_kind"]): (
            r["n_hits"],
            r["recall_permille"],
        )
        for r in s.q_ann_residual_recall(spark, SF_ORACLE).collect()
    }
    assert set(grid) == {
        (coarse, codes, kind)
        for coarse in ("member_vectors", "kmeans")
        for codes in ("raw", "residual")
        for kind in ("single", "spill")
    }
    m = "member_vectors"
    single = s.q_ann_refine_recall(spark, SF_ORACLE).collect()
    raw_single_hits = sum(r["n_hits"] for r in single)
    assert grid[(m, "raw", "single")][0] == raw_single_hits
    spill = s._recall_vs_truth(
        spark,
        SF_ORACLE,
        s.q_ann_ivfpq_spill(spark, SF_ORACLE).select(
            "query_id", "neighbor_id"
        ),
    ).collect()
    raw_spill_hits = sum(r["n_hits"] for r in spill)
    assert grid[(m, "raw", "spill")][0] == raw_spill_hits
    kres_single = s._recall_vs_truth(
        spark,
        SF_ORACLE,
        s.q_ann_ivfpq_kmeans(spark, SF_ORACLE).select(
            "query_id", "neighbor_id"
        ),
    ).collect()
    assert grid[("kmeans", "residual", "single")][0] == sum(
        r["n_hits"] for r in kres_single
    )
    # recall values are sane permille quantities; no cross-codebook
    # ordering is asserted (the measured member inversion is exactly
    # why the grid exists)
    for (coarse, codes, kind), (n_hits, permille) in grid.items():
        assert 0 <= permille <= 1000, (coarse, codes, kind, permille)
        assert n_hits >= 0


def test_pqm_kraw_code_artifacts_match_inline_join(spark):
    """The r14-opt cached code layouts ('pqm_codes'/'kraw_codes') and
    the cached trained query LUTs ('pq_qluts') equal the inline
    per-execution forms they replaced, row for row (codes/ranks are
    ints; LUT doubles compared bit-for-bit)."""
    import struct as st

    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions import similarity as s

    ranked = s._ranked_cells(spark, SF_ORACLE)
    codes = s._pq_codes(spark, SF_ORACLE)
    inline_pqm = (
        ranked.filter(F.col("rn") <= s.SPILL_ASSIGN)
        .select(
            "vec_id",
            F.col("cent_id").alias("cell"),
            F.col("rn").cast("long").alias("assign_rn"),
        )
        .join(codes, "vec_id")
    )
    key = lambda r: tuple(r)  # noqa: E731 — all-int rows
    assert sorted(
        key(r) for r in s._pqm_codes(spark, SF_ORACLE).collect()
    ) == sorted(key(r) for r in inline_pqm.collect())

    kranked = s._kranked_cells(spark, SF_ORACLE)
    inline_kraw = (
        kranked.filter(F.col("rn") <= s.SPILL_ASSIGN)
        .select(
            "vec_id", "cell", F.col("rn").cast("long").alias("assign_rn")
        )
        .join(s._vectors(spark, SF_ORACLE).select("vec_id"), "vec_id")
        .join(codes, "vec_id")
    )
    assert sorted(
        key(r) for r in s._kraw_codes(spark, SF_ORACLE).collect()
    ) == sorted(key(r) for r in inline_kraw.collect())

    cd = s._pq_codebook_double(s._pq_codebook(spark, SF_ORACLE))
    inline_luts = s._adc_query_luts(spark, SF_ORACLE, cd)

    def lut_rows(df):
        return sorted(
            (
                r["query_id"],
                st.pack("<d", r["_qnorm"]),
                tuple(
                    tuple(st.pack("<d", x) for x in r[f"_lut{m}"])
                    for m in range(s.PQ_M)
                ),
            )
            for r in df.collect()
        )

    assert lut_rows(
        s._adc_trained_query_luts(spark, SF_ORACLE)
    ) == lut_rows(inline_luts)

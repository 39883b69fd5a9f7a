"""Embedding-space clustering — the corpus-organization pass a
training-data pipeline runs between embedding and curation (topic
balancing, cluster-aware sampling, SemDeDup's cluster stage all
consume a k-means partition of the embedding space).

Deterministic fixed-point Lloyd's algorithm: components floor to
integer micro-units, centroids are integer means, distances exact
integer sums of squared differences — both engines evaluate the
identical integer expressions (the same discipline as
functions/similarity.py's q_embedding_outliers), so the DuckDB twin
is bit-exact with no float summation-order hazard. Seeding is the K
smallest vec_ids (k-means++ trades determinism for quality; a
fixed-seed variant belongs in a follow-up, not under an exact
oracle).

Scale shape per Lloyd iteration: the centroid table is K x dims rows
— broadcast by construction — so assignment is a broadcast join on
dim with map-side partial aggregation down to (vec, cid), then a
per-vec argmin window over K rows; the centroid update is one
(cid, dim) aggregation with map-side partials. Nothing all-pairs,
nothing driver-side; iterations chain as narrow dependencies on the
exploded micro table, which is session-cached like the dedup
signature frames so the explode runs once per session, not once per
iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

KMEANS_K = 8
KMEANS_MICRO = 1_000_000


def _emb_micro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, dim, xm): embeddings exploded to fixed-point
    micro-units, session-cached — every Lloyd pass reads it."""
    from ..tables import load_table
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return emb.select(
            "vec_id",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "dim", "x"
            ),
        ).select(
            "vec_id",
            "dim",
            F.floor(F.col("x") * KMEANS_MICRO).cast("long").alias("xm"),
        )

    return _cached_frame(spark, sf_dir, "kmeans_emb_micro", _build)


# _assign's dim-keyed broadcast join materializes vecs x dims x K rows
# before the map-side partial aggregation — the plan is LINEAR IN K.
# That is the right trade for routing-scale K (tens to ~a thousand):
# the join stays whole-stage-codegen, exact-integer, and oracle-
# twinnable. At a production curation K (10^3-10^5 clusters,
# SemDeDup-style), K x the exploded corpus per iteration is the wrong
# plan — use assign_arrow below, which keeps the K x dims codebook in
# one Arrow-side matrix and never row-expands.
KMEANS_BROADCAST_K_MAX = 1024

# Arrow kernel: centroids processed in blocks of this many per batch,
# bounding the n x K_block x dims distance intermediate regardless of
# K. Module-level so the multi-block path is testable at small K.
ASSIGN_ARROW_K_BLOCK = 256


def _emb_xs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, xs): the embedding table flattened to ONE fixed-point
    micro-int array per vector (the same floor(x * MICRO) expression
    as _emb_micro, element i = dim i), session-cached 'kmeans_xs'.
    The scan-local Lloyd rounds below read this instead of the
    exploded micro table, so an assignment never moves a row (r14 opt
    round, the similarity._pq_xs discipline)."""
    from ..tables import load_table
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        emb = load_table(spark, sf_dir, "embeddings")
        return emb.select(
            "vec_id",
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda t: F.floor(t * KMEANS_MICRO).cast("long"),
            ).alias("xs"),
        )

    return _cached_frame(spark, sf_dir, "kmeans_xs", _build)


def _km_cent_matrix(cent: DataFrame) -> tuple[list, list]:
    """Collect a (cid, dim, cm) centroid table into (sorted cid list,
    matching row-per-cid int matrix in dim order) — the codebook-load
    class of .collect() (K x dims bounded artifact rows, the
    streaming/vectors.py precedent). cids may be non-contiguous: a
    cell emptied by the previous round has no trained centroid."""
    by: dict[int, dict[int, int]] = {}
    for r in cent.collect():
        by.setdefault(int(r["cid"]), {})[int(r["dim"])] = int(r["cm"])
    cids = sorted(by)
    dims = sorted(by[cids[0]])
    return cids, [[by[c][d] for d in dims] for c in cids]


def _km_scored(
    spark: SparkSession, sf_dir: str, tag: str, cent
) -> DataFrame:
    """(vec_id, cid, dist_sq, xs): scan-local nearest-centroid of
    every vector against the centroid table `cent` folded in as ONE
    SQL-string literal matrix (similarity._int_aa_sql — the Column-
    API tree costs seconds of py4j per plan). Exact integer distances
    (the same (xm - cm)^2 fold as _assign, commutative long
    addition); argmin = array_position(array_min) over the cid-sorted
    matrix, first match = smallest cid — _assign's window ORDER BY
    (dist_sq, cid) exactly, mapped back through a literal cid array
    because trained cids may be non-contiguous. Chain-cached under
    `tag` so the assignment artifact and the centroid update share
    one build. Literal plan size is K x dims ints — the same
    KMEANS_BROADCAST_K_MAX bound as the join form; beyond it use
    assign_arrow (unchanged advice)."""
    from .dedup import _cached_frame
    from .similarity import _int_aa_sql

    def _build() -> DataFrame:
        cids, mat = _km_cent_matrix(cent)
        dists = F.expr(
            f"transform({_int_aa_sql(mat)}, "
            "c -> aggregate(zip_with(xs, c, "
            "(a, b) -> (a - b) * (a - b)), "
            "cast(0 as bigint), (acc, z) -> acc + z))"
        )
        cid_arr = F.expr(
            "array(" + ",".join(str(int(c)) for c in cids) + ")"
        )
        staged = _emb_xs(spark, sf_dir).select(
            "vec_id", "xs", dists.alias("_kds")
        )
        return staged.select(
            "vec_id",
            F.element_at(
                cid_arr,
                F.array_position(
                    F.col("_kds"), F.array_min(F.col("_kds"))
                ).cast("int"),
            )
            .cast("long")
            .alias("cid"),
            F.array_min(F.col("_kds")).alias("dist_sq"),
            "xs",
        )

    return _cached_frame(spark, sf_dir, tag, _build)


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, cid, dist_sq), ties
    broken toward the smallest cid. cent is (cid, dim, cm) — K x dims
    rows, broadcast.

    Scale bound: materializes vecs x dims x K rows pre-aggregation
    (see KMEANS_BROADCAST_K_MAX above); for K beyond that use
    assign_arrow, parity-pinned in
    tests/test_properties.py::test_assign_arrow_matches_broadcast_join.
    Kept as the REFERENCE implementation of a Lloyd round; the
    shipped per-round builds ride _km_scored's scan-local form,
    pinned equal integers by test_km_scored_matches_reference."""
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
    return (
        d.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_arrow(emb: DataFrame, cent_rows: list) -> DataFrame:
    """Large-K nearest-centroid assignment: the Arrow-batched distance
    kernel _assign's docstring points to for K > KMEANS_BROADCAST_K_MAX.

    `emb` is the raw (vec_id, embedding array<double>) table;
    `cent_rows` is the collected (cid, dim, cm) centroid table (K x
    dims values — a bounded pipeline artifact, like the IVF codebook
    at streaming/vectors.py). The codebook ships to executors once in
    the task closure as a K x dims int64 matrix; each Arrow batch
    computes exact-integer squared distances blockwise over K (block
    size caps the n x K_block x dims intermediate, so memory is
    bounded by the batch, not by K) and keeps a running (min, argmin).
    No row expansion, no shuffle — scan-local, one output row per
    vector, ties toward the smallest cid exactly like _assign.
    """
    import numpy as np

    by_cid: dict[int, dict[int, int]] = {}
    for r in cent_rows:
        by_cid.setdefault(int(r["cid"]), {})[int(r["dim"])] = int(r["cm"])
    cids = sorted(by_cid)
    dims = sorted(by_cid[cids[0]])
    C = np.array(
        [[by_cid[c][d] for d in dims] for c in cids], dtype=np.int64
    )
    cid_arr = np.array(cids, dtype=np.int64)
    k_block = ASSIGN_ARROW_K_BLOCK

    def _batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.floor(
                np.stack(pdf["embedding"].to_numpy()) * KMEANS_MICRO
            ).astype(np.int64)
            best_d = None
            best_c = None
            for lo in range(0, len(cid_arr), k_block):
                diff = X[:, None, :] - C[None, lo : lo + k_block, :]
                d = (diff * diff).sum(axis=2)
                am = d.argmin(axis=1)
                dm = d[np.arange(len(am)), am]
                cm_ = cid_arr[lo + am]
                if best_d is None:
                    best_d, best_c = dm, cm_
                else:
                    # strict <: earlier blocks hold smaller cids, so
                    # ties keep the smallest cid, matching _assign
                    take = dm < best_d
                    best_d = np.where(take, dm, best_d)
                    best_c = np.where(take, cm_, best_c)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cid": best_c,
                    "dist_sq": best_d,
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        _batches, "vec_id long, cid long, dist_sq long"
    )


def route_arrow(
    emb: DataFrame, cent_rows: list, nprobe: int
) -> DataFrame:
    """Large-K RANK-RETAINING routing: assign_arrow's blockwise Arrow
    kernel extended from argmin to the `nprobe` nearest cells — the
    serve stack's probe routing (similarity._kranked_cells'
    (vec_id, cell, dist_sq, rn) shape) at a K where neither of the
    small-K shapes survives: the inlined literal-array candidates of
    streaming routing grow the plan linearly in K x dims, and the
    broadcast-join + window ranking ships and shuffles a K x dims
    table that outgrows executor memory near K ~ 10^6 (the 512 MB
    bound in PLANS.md's 100 TB sizing note, demonstrated at
    K > KMEANS_BROADCAST_K_MAX by
    tests/test_properties.py::test_large_k_routing_matches_window_ranking).

    Same exact-integer distances and (dist_sq, cid) ascending
    tie-break as _kranked_cells' window: each Arrow batch carries a
    running (n x p) candidate set; every K-block's distances are
    concatenated onto it and the per-row top-p re-selected by a
    lexicographic (dist, cid) sort — so peak memory is
    n x (K_BLOCK + p), bounded by the batch and the block, never by
    K. No shuffle; one output row per (vector, probe rank)."""
    import numpy as np

    by_cid: dict[int, dict[int, int]] = {}
    for r in cent_rows:
        by_cid.setdefault(int(r["cid"]), {})[int(r["dim"])] = int(r["cm"])
    cids = sorted(by_cid)
    dims = sorted(by_cid[cids[0]])
    C = np.array(
        [[by_cid[c][d] for d in dims] for c in cids], dtype=np.int64
    )
    cid_arr = np.array(cids, dtype=np.int64)
    k_block = ASSIGN_ARROW_K_BLOCK
    p = min(int(nprobe), len(cid_arr))

    def _batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            X = np.floor(
                np.stack(pdf["embedding"].to_numpy()) * KMEANS_MICRO
            ).astype(np.int64)
            best_d = best_c = None
            for lo in range(0, len(cid_arr), k_block):
                diff = X[:, None, :] - C[None, lo : lo + k_block, :]
                d = (diff * diff).sum(axis=2)
                cb = np.broadcast_to(
                    cid_arr[lo : lo + k_block], d.shape
                )
                if best_d is not None:
                    d = np.concatenate([best_d, d], axis=1)
                    cb = np.concatenate([best_c, cb], axis=1)
                # lexsort: last key primary — (dist ASC, cid ASC),
                # the _kranked_cells window's ORDER BY dist_sq, cid
                idx = np.lexsort((cb, d), axis=1)[:, :p]
                best_d = np.take_along_axis(d, idx, axis=1)
                best_c = np.take_along_axis(
                    np.ascontiguousarray(cb), idx, axis=1
                )
            n = len(X)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), p),
                    "cell": best_c.ravel(),
                    "dist_sq": best_d.ravel(),
                    "rn": np.tile(
                        np.arange(1, p + 1, dtype=np.int64), n
                    ),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        _batches, "vec_id long, cell long, dist_sq long, rn long"
    )


def _assignment_r2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 assignment (vec_id, cid, dist_sq), session-cached
    behind the chain-cached round-2 scored frame ('kmeans_s2'): like
    the trained centroids it is a
    persisted pipeline artifact — every consumer (the partition table,
    the quality report, label purity, balanced sampling) reads the
    SAME materialized assignment instead of re-running the argmin
    exchange, and plans that use it twice (balanced_sample's census +
    join-back) scan the cache instead of evaluating the assignment
    subtree twice."""
    return _km_scored(
        spark,
        sf_dir,
        "kmeans_s2",
        _trained_centroids(spark, sf_dir),
    ).select("vec_id", "cid", "dist_sq")


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd iterations over the embedding table:
    seed centroids = the KMEANS_K smallest vec_ids' vectors (cid in
    vec_id order), assign, recompute integer-mean centroids, assign
    again. Output one row per vector: (vec_id, cluster_id, dist_sq)
    under the refreshed centroids — the partition table every
    cluster-aware curation step joins against."""
    a2 = _assignment_r2(spark, sf_dir)
    return a2.select(
        "vec_id", F.col("cid").alias("cluster_id"), "dist_sq"
    )


def _trained_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-2 centroid table (cid, dim, cm) — K x dims rows.

    Session-cached like streaming/vectors.py's IVF codebook and the
    dedup signature frames: a trained codebook is a persisted
    pipeline artifact (clustering runs once per corpus snapshot;
    every consumer — assignment, routing, reporting — then reads the
    centroids), so per-execution work is ONE assignment pass against
    the cached table, not a re-train. Size is bounded by the
    clustering geometry (K x dims), independent of corpus scale."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        # members from the round-1 scored frame, the carried xs
        # posexploded in place (position IS dim) — one bounded
        # (cid, dim) aggregation with map-side partials instead of a
        # join back against the exploded micro table (r14 opt round)
        memb = _km_scored(
            spark,
            sf_dir,
            "kmeans_s1",
            _seed_centroids(spark, sf_dir),
        ).select("cid", F.posexplode("xs").alias("dim", "xm"))
        return (
            memb.groupBy("cid", "dim")
            .agg(F.sum("xm").alias("_s"), F.count("*").alias("_c"))
            .select("cid", "dim", F.expr("_s DIV _c").alias("cm"))
        )

    return _cached_frame(spark, sf_dir, "kmeans_centroids", _build)


def q_kmeans_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality report over the k-means partition: per cluster,
    member count, total and mean squared distance to the centroid
    (exact integer micro^2 units) — the balance/tightness QA view
    (a mega-cluster or an empty cell flags a bad seed or a collapsed
    embedding space, the clustering analog of dedup_cluster_sizes).

    Reads the SAME cached round-2 assignment as q_kmeans_assign, so
    per-execution work is one K-row aggregation over the cached
    frame — no new argmin exchange."""
    a2 = _assignment_r2(spark, sf_dir)
    return (
        a2.groupBy("cid")
        .agg(
            F.count("*").alias("n_vectors"),
            F.sum("dist_sq").alias("total_dist_sq"),
        )
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vectors",
            "total_dist_sq",
            F.expr("total_dist_sq DIV n_vectors").alias("mean_dist_sq"),
        )
    )


def q_kmeans_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-vs-label agreement: per k-means cluster, the member
    count, the majority label (smallest label on ties), and purity in
    permille — the standard external clustering evaluation, and the
    report that decides whether cluster-aware sampling can stand in
    for label-aware sampling when labels are scarce.

    Reads the cached round-2 assignment; the only new work is the
    vec-keyed join to the label column (scan-local projection of the
    embeddings table) and a (cluster, label) aggregation whose
    cardinality is K x #labels — bounded by geometry, not data."""
    from ..tables import load_table

    a2 = _assignment_r2(spark, sf_dir)
    labels = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("label").cast("long").alias("label")
    )
    per = (
        a2.join(labels, "vec_id")
        .groupBy("cid", "label")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("cid").orderBy(
        F.col("n").desc(), F.col("label")
    )
    return (
        per.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "n_vectors",
            F.sum("n").over(Window.partitionBy("cid")).cast("long"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col("cid").alias("cluster_id"),
            "n_vectors",
            F.col("label").alias("majority_label"),
            F.expr("(1000 * n) DIV n_vectors").alias("purity_permille"),
        )
    )


CLUSTER_CAP_64K = 19660  # ~300 permille of the vector mass in 1/65536


def q_kmeans_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cluster-balanced downsampling — the curation ACTION the k-means
    partition feeds (SemDeDup-style diversity selection caps
    over-represented regions of embedding space the way
    q_mixture_rebalance caps over-represented languages): any cluster
    holding more than ~300 permille of the vectors is hash-sampled
    down to the cap, the rest keep rate 65536/65536. Emits the
    retained vectors with the applied per-cluster rate.

    The keep decision is a pure function of vec_id (md5 16-bit
    fingerprint vs the cluster's rate) — reproducible across
    engines/runs, stable under corpus growth, same machinery as
    q_mixture_rebalance with the OBSERVED cluster census in place of
    the language census (one-pass pre-sampling rates, same
    documented approximation).

    Scale shape: both the census and the join-back read the cached
    round-2 assignment (one materialization, two scans — not two
    evaluations of the argmin subtree in one plan); the K-row rate
    table broadcasts via AQE and the filter is scan-local."""
    a2 = _assignment_r2(spark, sf_dir).select(
        "vec_id", F.col("cid").alias("cluster_id")
    )
    from .corpus import capped_rate_64k_expr, h16_of

    census = a2.groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    rates = census.select(
        "cluster_id",
        capped_rate_64k_expr(CLUSTER_CAP_64K, "n_members").alias(
            "rate_64k"
        ),
    )
    h16 = h16_of(F.col("vec_id"))
    return (
        a2.join(rates, "cluster_id")
        .select("vec_id", "cluster_id", "rate_64k", h16.alias("h16"))
        .filter(F.col("h16") < F.col("rate_64k"))
        .select("vec_id", "cluster_id", "rate_64k")
    )


def _seed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-0 seed centroid table (cid, dim, cm) — the KMEANS_K
    smallest vec_ids' vectors, session-cached (tag 'kmeans_c0') so
    the trainer and the convergence report read one materialization."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        e = _emb_micro(spark, sf_dir)
        seed_w = Window.orderBy("vec_id")
        seeds = (
            e.select("vec_id")
            .distinct()
            .orderBy("vec_id")
            .limit(KMEANS_K)
            .select(
                "vec_id",
                (F.row_number().over(seed_w) - 1).cast("long").alias("cid"),
            )
        )
        return seeds.join(e, "vec_id").select(
            "cid", "dim", F.col("xm").alias("cm")
        )

    return _cached_frame(spark, sf_dir, "kmeans_c0", _build)


def _assignment_r1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-1 assignment against the seed centroids — read by
    the centroid trainer and the convergence report. A projection
    over the round's chain-cached scored frame ('kmeans_s1', shared
    with the centroid update): same schema, same integers as the
    _assign reference form."""
    return _km_scored(
        spark, sf_dir, "kmeans_s1", _seed_centroids(spark, sf_dir)
    ).select("vec_id", "cid", "dist_sq")


def q_kmeans_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd convergence diagnostic — the per-round numbers a k-means
    trainer logs to decide when to stop: per surviving cluster, the
    exact integer squared centroid displacement between the seed and
    the trained centroid (micro^2 units), the dimension count, the
    round-2 member count, and how many vectors moved in/out of the
    cluster between the two assignments. Small shifts + few moves =
    converged; a cluster with a huge shift flags an unstable seed.

    Scale shape: everything reads session-cached artifacts (seed
    centroids, trained centroids, both assignments); the centroid
    join is K x dims rows on both sides, and the movement join keys
    on vec_id between two cached assignment tables — one exchange,
    aggregated to at most K rows. Clusters emptied by round 1 have
    no trained centroid and are absent, documented."""
    c0 = _seed_centroids(spark, sf_dir).select(
        "cid", "dim", F.col("cm").alias("cm0")
    )
    c1 = _trained_centroids(spark, sf_dir).select(
        "cid", "dim", F.col("cm").alias("cm1")
    )
    shift = (
        c1.join(c0, ["cid", "dim"])
        .groupBy("cid")
        .agg(
            F.sum(
                (F.col("cm1") - F.col("cm0")) * (F.col("cm1") - F.col("cm0"))
            )
            .cast("long")
            .alias("shift_sq"),
            F.count("*").cast("long").alias("n_dims"),
        )
    )
    a1 = _assignment_r1(spark, sf_dir).select(
        "vec_id", F.col("cid").alias("cid1")
    )
    a2 = _assignment_r2(spark, sf_dir).select(
        "vec_id", F.col("cid").alias("cid2")
    )
    mv = a1.join(a2, "vec_id")
    memb = mv.groupBy(F.col("cid2").alias("cid")).agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum((F.col("cid1") != F.col("cid2")).cast("long"))
        .cast("long")
        .alias("n_moved_in"),
    )
    outs = mv.groupBy(F.col("cid1").alias("cid")).agg(
        F.sum((F.col("cid1") != F.col("cid2")).cast("long"))
        .cast("long")
        .alias("n_moved_out"),
    )
    return (
        shift.join(memb, "cid", "left")
        .join(outs, "cid", "left")
        .select(
            F.col("cid").alias("cluster_id"),
            "shift_sq",
            "n_dims",
            F.coalesce(F.col("n_members"), F.lit(0)).cast("long").alias(
                "n_members"
            ),
            F.coalesce(F.col("n_moved_in"), F.lit(0)).cast("long").alias(
                "n_moved_in"
            ),
            F.coalesce(F.col("n_moved_out"), F.lit(0)).cast("long").alias(
                "n_moved_out"
            ),
        )
    )

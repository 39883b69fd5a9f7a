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


def _assign(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, cid, dist_sq), ties
    broken toward the smallest cid. cent is (cid, dim, cm) — K x dims
    rows, broadcast."""
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


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic Lloyd iterations over the embedding table:
    seed centroids = the KMEANS_K smallest vec_ids' vectors (cid in
    vec_id order), assign, recompute integer-mean centroids, assign
    again. Output one row per vector: (vec_id, cluster_id, dist_sq)
    under the refreshed centroids — the partition table every
    cluster-aware curation step joins against."""
    e = _emb_micro(spark, sf_dir)
    c1 = _trained_centroids(spark, sf_dir)
    a2 = _assign(e, c1)
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
        c0 = seeds.join(e, "vec_id").select(
            "cid", "dim", F.col("xm").alias("cm")
        )
        a1 = _assign(e, c0)
        return (
            a1.select("vec_id", "cid")
            .join(e, "vec_id")
            .groupBy("cid", "dim")
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

    Reuses the SAME cached artifacts as q_kmeans_assign (exploded
    vectors + trained centroid table), so per-execution work is one
    assignment pass and one K-row aggregation — nothing new shuffles
    beyond the vec-keyed argmin exchange."""
    e = _emb_micro(spark, sf_dir)
    a2 = _assign(e, _trained_centroids(spark, sf_dir))
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

    Reuses the cached assignment artifacts; the only new work is the
    vec-keyed join to the label column (scan-local projection of the
    embeddings table) and a (cluster, label) aggregation whose
    cardinality is K x #labels — bounded by geometry, not data."""
    from ..tables import load_table

    e = _emb_micro(spark, sf_dir)
    a2 = _assign(e, _trained_centroids(spark, sf_dir))
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

    Scale shape: the census is a K-row aggregate over the cached
    assignment, window-totaled and joined back (AQE broadcasts it);
    the vec side never shuffles beyond the assignment's own argmin
    exchange and the filter is scan-local."""
    e = _emb_micro(spark, sf_dir)
    a2 = _assign(e, _trained_centroids(spark, sf_dir)).select(
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

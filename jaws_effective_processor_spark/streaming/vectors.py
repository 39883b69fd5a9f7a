"""Streaming vector ingest: the continuous-arrival half of the
similarity family (functions/similarity.py is the batch half).

An embedding feed lands vectors continuously; before an ANN index can
serve them they need (1) zero-norm rejection, (2) IVF cell routing to
the nearest centroid, and (3) the int8 storage quantization — all
BEFORE the write, so the landed layout is directly servable
(partitioned by cell, exactly the directories an IVF probe reads).

Streaming constraint that shapes the design: the batch cell
assignment (`similarity._cell_assignment`) ranks a (vector x
centroid) join with a row_number window — stateful, illegal in a
streaming plan. Here the centroids are a CONFIG-SIZED artifact (K
rows — a real IVF index always holds its codebook in memory), so
they inline as literal arrays and the argmax is a pure column
expression: array_max over (cos, -cent_id) structs, ties resolved to
the smallest centroid id exactly like the batch window's
(cos DESC, cent_id) ordering. Stateless per micro-batch, scan-local
at any scale.

Float discipline: centroid norms are folded in Python in the SAME
left-to-right order as the engine's sequential-fold dot(), so stream
and batch assignments are bit-identical (pinned by test).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.similarity import N_CELLS, N_QUERIES, dot
from ..tables import load_table

# wire schema of the vector feed (test transport: parquet dir;
# production: kafka_stream with this as the value schema)
VEC_FEED_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)


def load_centroids(
    spark: SparkSession, sf_dir: str
) -> list[tuple[int, list[float]]]:
    """The IVF codebook: the same N_CELLS seed vectors the batch IVF
    queries use (vec_id in [N_QUERIES, N_QUERIES + N_CELLS)). K rows
    cross the driver ONCE at stream setup — the codebook is
    configuration, not data (same stance as the LSH plane lists)."""
    v = F.col("embedding").cast("array<double>")
    rows = (
        load_table(spark, sf_dir, "embeddings")
        .filter(
            (F.col("vec_id") >= N_QUERIES)
            & (F.col("vec_id") < N_QUERIES + N_CELLS)
        )
        # zero-norm seeds are excluded exactly like the batch side's
        # _vectors filter — otherwise the stream would score a NaN
        # cosine against a centroid the batch assignment never sees
        .filter(dot(v, v) > 0)
        .select("vec_id", v.alias("v"))
        .collect()
    )
    return [(r["vec_id"], list(r["v"])) for r in rows]


def _fold_norm(v: list[float]) -> float:
    """Left-to-right fold of sum(x*x), then sqrt — the exact IEEE
    operation sequence of dot(v, v) so Python-side centroid norms
    match engine-side folded norms to the bit."""
    acc = 0.0
    for x in v:
        acc += x * x
    return math.sqrt(acc)


def load_pq_codebook(spark: SparkSession, sf_dir: str) -> list:
    """The PQ sub-codebooks the batch coder uses
    (similarity._pq_codebook) — K rows crossing the driver once at
    stream setup, configuration like the IVF centroids."""
    from ..functions.similarity import _pq_codebook

    return _pq_codebook(spark, sf_dir)


def load_residual_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[list, dict]:
    """(residual PQ codebook, per-cell centroid micro vectors) — the
    two config-sized artifacts residual ingest/serve shares with the
    batch residual family (similarity._pq_codebook(res=True) /
    similarity._cent_micro), crossing the driver once at stream
    setup."""
    from ..functions.similarity import _cent_micro, _pq_codebook

    return _pq_codebook(spark, sf_dir, res=True), _cent_micro(
        spark, sf_dir
    )


def load_kmeans_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[list, dict]:
    """(k-means-residual PQ codebook, per-trained-cell centroid micro
    vectors) — the config-sized artifacts of the r13 TRAINED k-means
    coarse level (similarity._pq_codebook(res='kmeans') /
    similarity._kcent_micro), crossing the driver once at stream
    setup. The micro dict doubles as the Euclidean routing codebook
    (pass it as euclidean_centroids) AND the residual base (pass it
    as residual_centroids) — routing and coding read the same trained
    table, exactly like the batch serve stack."""
    from ..functions.similarity import _kcent_micro, _pq_codebook

    return _pq_codebook(spark, sf_dir, res="kmeans"), _kcent_micro(
        spark, sf_dir
    )


def start_ann_store(
    spark: SparkSession,
    sf_dir: str,
    vecs: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = False,
):
    """THE shipped ANN ingest — the measured serving recommendation
    (trained-k-means coarse, residual codes, SINGLE assignment)
    pre-configured, so a user who just wants "an ANN index" lands
    the configuration the 2x2x2 acceptance grid
    (q_ann_residual_recall) and the tuning surface
    (q_ann_kmeans_tuning) measured best: highest sf0.1 recall
    (600 permille vs the member family's best 540) at HALF the spill
    layout's code storage (r13, PLANS.md). Loads the trained
    artifacts itself (one config-sized driver crossing) and starts
    the cell-partitioned exactly-once store. Member-vector routing,
    raw codes, and spill layouts remain available as the explicit
    start_vector_shards parameters this wrapper pins."""
    kcb, kcent = load_kmeans_artifacts(spark, sf_dir)
    return start_vector_shards(
        vecs,
        None,
        path,
        checkpoint,
        available_now=available_now,
        pq_codebook=kcb,
        spill=1,
        residual_centroids=kcent,
        euclidean_centroids=kcent,
    )


def ann_topk_against_store(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    store_path: str,
    k: int = 5,
    nprobe: int = 2,
    exclude_self: bool = False,
) -> DataFrame:
    """THE shipped ANN serve tier over a start_ann_store index —
    residual ADC shortlist routed on the trained k-means coarse
    level, candidates-only exact refine; the streaming twin of
    q_ann_serve (== q_ann_ivfpq_kmeans's measured-best
    configuration). dedupe_best is OFF because the shipped store is
    single-assignment (one code per vector); parity vs the batch
    path is pinned by test_default_ann_store_serve_matches_batch."""
    from ..functions.similarity import _vectors

    kcb, kcent = load_kmeans_artifacts(spark, sf_dir)
    return adc_residual_refine_topk_against_store(
        spark,
        queries,
        store_path,
        None,
        kcb,
        kcent,
        _vectors(spark, sf_dir),
        k=k,
        nprobe=nprobe,
        exclude_self=exclude_self,
        dedupe_best=False,
    )


def _euclid_candidates(xm_col: F.Column, cent_micro: dict) -> F.Column:
    """The (dist_sq, cid) candidate struct array of Euclidean
    micro-int routing — exact integer arithmetic (the k-means
    assignment rule), ascending struct order == the batch
    (dist_sq, cid) tie-break of clustering._assign /
    similarity._kranked_cells."""
    return F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        xm_col,
                        F.array(
                            *[F.lit(int(c)).cast("long") for c in cm]
                        ),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, z: acc + z,
                ).alias("dist"),
                F.lit(int(cid)).cast("long").alias("cent"),
            )
            for cid, cm in sorted(cent_micro.items())
        ]
    )


def _cent_micro_map(cent_micro: dict) -> F.Column:
    """The per-cell centroid micro vectors as a literal MAP column
    (cell -> array<long>) — config-sized (N_CELLS x DIM literals),
    inlined exactly like the centroid cosine candidates."""
    pairs = []
    for cell in sorted(cent_micro):
        pairs.append(F.lit(int(cell)).cast("long"))
        pairs.append(
            F.array(
                *[F.lit(int(x)).cast("long") for x in cent_micro[cell]]
            )
        )
    return F.create_map(*pairs)


def vector_ingest_stream(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]] | None,
    pq_codebook: list | None = None,
    spill: int = 1,
    residual_centroids: dict | None = None,
    euclidean_centroids: dict | None = None,
) -> DataFrame:
    """Feed -> zero-norm-filtered, cell-routed, int8-quantized vectors
    ready for a partitioned ANN store. With `pq_codebook` the row also
    carries the packed product-quantization code (pq_code) — the
    second, coarser compression level a serving index stores next to
    the int8 payload; coding shares similarity.with_pq_codes with the
    batch coder, so stream and batch codes are bit-identical (pinned
    by test_vector_ingest_pq_codes_match_batch).

    `spill > 1` lands MULTI-ASSIGNMENT rows (one per (vector, cell)
    for the vector's `spill` nearest cells, same tie order as the
    batch _ranked_cells window) — the streaming half of
    similarity.q_ann_ivfpq_spill's index layout: the code payload is
    duplicated per home cell, the raw int8 payload rides along, and
    a store server probing ANY home cell sees the vector (dedupe at
    serve time; parity pinned by
    test_spill_store_server_matches_batch).

    `residual_centroids` (r12, with pq_codebook required) lands
    RESIDUAL codes — pq_codebook is then the residual family's
    codebook and each landed row's pq_code encodes
    floor(x*1e6) - floor(centroid(cell)*1e6) against it, PER assigned
    cell (with spill > 1 the same vector carries a DIFFERENT code in
    each home cell — the classic-IVFADC layout of
    similarity.q_ann_ivfpq_spill_residual; parity pinned by
    test_residual_store_server_matches_batch). The centroid micro
    vectors inline as a literal map (config-sized), so coding stays
    scan-local and stateless.

    `euclidean_centroids` (r13) switches ROUTING to exact-integer
    Euclidean argmin over the given micro centroid vectors — the
    TRAINED k-means coarse level of similarity._kranked_cells
    (`centroids` is then ignored and may be None). Pass the same
    dict as residual_centroids to land the full (kmeans, residual)
    layout of similarity.q_ann_ivfpq_spill_kmeans; parity pinned by
    test_kmeans_store_server_matches_batch. Zero-norm rows are
    filtered either way: Euclidean COULD assign them, but the store
    only holds servable (cosine-scorable) vectors, matching the
    batch _pqk_codes servable-join rule."""
    if residual_centroids is not None and pq_codebook is None:
        raise ValueError(
            "residual_centroids requires pq_codebook (the residual "
            "family's codebook)"
        )
    if centroids is None and euclidean_centroids is None:
        raise ValueError(
            "either centroids (cosine routing) or euclidean_centroids "
            "(trained k-means routing) is required"
        )
    v = F.col("embedding").cast("array<double>")
    base = vecs.select(
        "vec_id",
        F.col("label").cast("long").alias("label"),
        "ingest_ts",
        v.alias("v"),
        F.sqrt(dot(v, v)).alias("norm"),
    ).filter(F.col("norm") > 0)

    if euclidean_centroids is not None:
        from ..functions.similarity import PQ_MICRO as _MICRO

        xm = F.transform(
            F.col("v"), lambda t: F.floor(t * _MICRO).cast("long")
        )
        ecand = _euclid_candidates(xm, euclidean_centroids)
        if spill == 1:
            # ascending struct order (dist, cid): ties to the
            # smallest cid, the batch _assign rule
            routed = base.withColumn("cell", F.array_min(ecand)["cent"])
        else:
            eordered = F.slice(F.array_sort(ecand), 1, spill)
            routed = base.withColumn(
                "cell",
                F.explode(F.transform(eordered, lambda s: s["cent"])),
            )
    else:
        # argmax over the codebook: array_max on (cos, -cent_id)
        # structs == the batch window's ORDER BY cos DESC, cent_id ASC
        candidates = F.array(
            *[
                F.struct(
                    (
                        dot(F.col("v"), F.array(*[F.lit(x) for x in cv]))
                        / (F.col("norm") * F.lit(_fold_norm(cv)))
                    ).alias("ccos"),
                    F.lit(-cid).cast("long").alias("neg_cent"),
                )
                for cid, cv in centroids
            ]
        )
        if spill == 1:
            routed = base.withColumn(
                "cell", -F.array_max(candidates)["neg_cent"]
            )
        else:
            # top-`spill` cells: ascending sort on (neg_cos, cent_id)
            # structs == the batch window's (cos DESC, cent_id ASC),
            # then one landed row per home cell
            ordered = F.slice(
                F.array_sort(
                    F.transform(
                        candidates,
                        lambda c: F.struct(
                            (-c["ccos"]).alias("neg_cos"),
                            (-c["neg_cent"]).alias("cent"),
                        ),
                    )
                ),
                1,
                spill,
            )
            routed = base.withColumn(
                "cell",
                F.explode(F.transform(ordered, lambda s: s["cent"])),
            )

    # int8 storage quantization — the same floor expression tree as
    # functions/similarity.q_embedding_quantize
    m = routed.withColumn(
        "maxabs", F.array_max(F.transform(F.col("v"), lambda x: F.abs(x)))
    )
    q = F.transform(
        F.col("v"),
        lambda x: F.when(
            F.col("maxabs") > 0,
            F.floor(x * 127 / F.col("maxabs")).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    out_cols = [
        "vec_id",
        "label",
        "ingest_ts",
        "cell",
        F.when(F.col("maxabs") > 0, F.floor(F.col("maxabs") * 1000000 / 127))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("scale_micro"),
        F.array_join(F.transform(q, lambda d: d.cast("string")), ",").alias(
            "q_csv"
        ),
    ]
    if pq_codebook is None:
        return m.select(*out_cols)
    from ..functions.similarity import (
        PQ_MICRO,
        pq_pack_expr,
        with_pq_codes,
    )

    if residual_centroids is None:
        coded = with_pq_codes(m, pq_codebook)
    else:
        staged = m.withColumn(
            "_rv",
            F.zip_with(
                F.transform(
                    F.col("v"),
                    lambda t: F.floor(t * PQ_MICRO).cast("long"),
                ),
                F.element_at(
                    _cent_micro_map(residual_centroids), F.col("cell")
                ),
                lambda a, b: a - b,
            ),
        )
        coded = with_pq_codes(
            staged, pq_codebook, v_col="_rv", micro=True
        ).drop("_rv")
    return coded.select(*out_cols, pq_pack_expr().alias("pq_code"))


def start_vector_shards(
    vecs: DataFrame,
    centroids: list[tuple[int, list[float]]] | None,
    path: str,
    checkpoint: str,
    available_now: bool = False,
    pq_codebook: list | None = None,
    spill: int = 1,
    residual_centroids: dict | None = None,
    euclidean_centroids: dict | None = None,
):
    """Run the vector ingest continuously into a cell-partitioned
    parquet store — each cell directory is exactly the file set an
    IVF probe of that cell reads, so the landed layout IS the index
    (exactly-once via the checkpointed file-sink commit log). With
    `pq_codebook` each landed row also carries its packed PQ code,
    which adc_topk_against_store serves from without touching the
    int8 payload. `spill` lands the multi-assignment layout and
    `residual_centroids` the residual-code layout,
    `euclidean_centroids` the trained-k-means routing (see
    vector_ingest_stream)."""
    writer = (
        vector_ingest_stream(
            vecs,
            centroids,
            pq_codebook=pq_codebook,
            spill=spill,
            residual_centroids=residual_centroids,
            euclidean_centroids=euclidean_centroids,
        )
        .writeStream.format("parquet")
        .partitionBy("cell")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_vector_shards(
    spark: SparkSession,
    path: str,
    out_path: str,
    max_records_per_file: int = 1_000_000,
    drop_vec_ids: list | None = None,
) -> None:
    """Compact a landed cell-partitioned vector store (the per-
    microbatch files start_vector_shards / start_ann_store
    accumulate — a file sink cannot re-cluster across triggers)
    back into one bounded file set per cell directory — the
    vector-store twin of sources.io.compact_corpus_shards, and the
    periodic maintenance job an IVF deployment actually runs: a
    probe reads its WHOLE cell directory, so probe cost at serve
    time is (files x open cost + rows), and a day of micro-batches
    multiplies the file term a few hundredfold while rows stay flat.

    Reads the partitioned layout (cell comes back as the partition
    column), re-clusters with repartition(cell), restores
    within-file vec_id order (tight parquet min/max stats for any
    vec_id-keyed lookup), and rewrites with bounded file sizes.
    Compaction changes file geometry, never rows — and therefore
    never answers: pinned by test_compact_vector_shards_preserves_serving
    (row-set identity AND served top-k identity across the rewrite).
    Run it per hot cell subtree in production.

    `drop_vec_ids` turns the same rewrite into the store's DELETE
    path (removal requests — the one mutation an append-only
    file-sink index cannot express in place): the listed vectors'
    rows (ALL their assignment rows, on a spill store) are filtered
    out during the rewrite, so the compacted store serves as if
    they were never ingested — a deleted vector cannot appear as a
    neighbor, because serve-path candidates come exclusively from
    the store's code rows (the raw-vector side table never
    generates candidates). Pinned by
    test_compact_vector_shards_preserves_serving's delete leg."""
    df = spark.read.parquet(path)
    if drop_vec_ids:
        df = df.filter(
            ~F.col("vec_id").isin([int(v) for v in drop_vec_ids])
        )
    (
        df.repartition("cell")
        .sortWithinPartitions("cell", "vec_id")
        .write.partitionBy("cell")
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(out_path)
    )


def _dequant_store(store: DataFrame) -> DataFrame:
    """Reconstruct servable vectors from the landed quantized layout:
    v[i] ~= q[i] * scale_micro / 1e6. Both serving paths (pruned and
    full) run this identical expression tree, so their scores are
    bit-equal and any top-k difference could only come from WHICH
    rows were read — which is exactly what the pruning parity test
    pins."""
    q_arr = F.transform(
        F.split(F.col("q_csv"), ","), lambda s: s.cast("double")
    )
    v = F.transform(
        q_arr, lambda x: x * F.col("scale_micro") / F.lit(1000000.0)
    )
    return store.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell"),
        v.alias("cv"),
    ).withColumn("cnorm", F.sqrt(dot(F.col("cv"), F.col("cv"))))


def route_query_cells(
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]] | None,
    nprobe: int,
    euclidean_centroids: dict | None = None,
) -> DataFrame:
    """(query cols, v, norm, cells): each query's `nprobe` nearest IVF
    cells, ranked by the SAME (cos DESC, cent_id ASC) ordering as the
    batch multiprobe's window (q_knn_ivf_multiprobe) and the ingest
    router's argmax — pure column work over the inlined codebook, so
    it composes into a streaming plan. With `euclidean_centroids`
    routing is the exact-integer Euclidean (dist ASC, cid ASC)
    ranking of the trained k-means coarse level instead
    (similarity._kranked_cells); the norm > 0 filter stays — the
    serve stack scores cosine, so zero-norm queries are unservable
    under either routing."""
    v = F.col("embedding").cast("array<double>")
    base = queries.select(
        "*",
        v.alias("v"),
        F.sqrt(dot(v, v)).alias("norm"),
    ).filter(F.col("norm") > 0)
    if euclidean_centroids is not None:
        from ..functions.similarity import PQ_MICRO as _MICRO

        xm = F.transform(
            F.col("v"), lambda t: F.floor(t * _MICRO).cast("long")
        )
        candidates = _euclid_candidates(xm, euclidean_centroids)
    else:
        candidates = F.array(
            *[
                F.struct(
                    (
                        -dot(F.col("v"), F.array(*[F.lit(x) for x in cv]))
                        / (F.col("norm") * F.lit(_fold_norm(cv)))
                    ).alias("neg_cos"),
                    F.lit(cid).cast("long").alias("cent"),
                )
                for cid, cv in centroids
            ]
        )
    ranked = F.slice(F.array_sort(candidates), 1, nprobe)
    return base.withColumn(
        "cells", F.transform(ranked, lambda s: s["cent"])
    )


def knn_topk_against_store(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 2,
    prune: bool = True,
) -> DataFrame:
    """One serving pass of a query BATCH against the landed
    cell-partitioned store (the micro-batch body of
    start_knn_store_server, and the scale path knn_query_stream's
    docstring promises): route each query to its nprobe nearest
    cells, read ONLY those cell partitions, dequantize, score cosine,
    top-k.

    The probed-cell list crosses the driver once per micro-batch —
    bounded by the IVF geometry (at most N_CELLS longs, whatever the
    batch or corpus size), the same configuration-not-data stance as
    the codebook itself. With `prune=True` the cell list becomes a
    PartitionFilter on the store scan, so the probe reads exactly the
    cell directories it needs (pinned by
    tests/test_streaming.py::test_knn_store_server_prunes_partitions)
    instead of joining the full table; `prune=False` is the same
    logical plan minus the partition filter — identical output, used
    as the parity baseline."""
    routed = route_query_cells(queries, centroids, nprobe)
    cells = [
        r["c"]
        for r in routed.select(F.explode("cells").alias("c"))
        .distinct()
        .collect()
    ]
    store = spark.read.parquet(store_path)
    if prune:
        store = store.filter(F.col("cell").isin(cells))
    corpus = _dequant_store(store)
    q = routed.select(
        "query_id",
        F.explode("cells").alias("cell"),
        "v",
        "norm",
    )
    cos = dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm"))
    scored = q.join(corpus, "cell").select(
        "query_id", "neighbor_id", cos.alias("cos")
    )
    topk = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cos")).alias("neg_cos"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            )
        ),
        1,
        k,
    )
    return (
        scored.groupBy("query_id")
        .agg(topk.alias("_top"))
        .select(
            "query_id",
            F.transform(
                F.col("_top"),
                lambda s: F.struct(
                    s["neighbor_id"].alias("neighbor_id"),
                    F.floor(-s["neg_cos"] * 10000)
                    .cast("long")
                    .alias("cos_permyriad"),
                ),
            ).alias("topk"),
        )
    )


def adc_topk_against_store(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    centroids: list[tuple[int, list[float]]],
    pq_codebook: list,
    k: int = 5,
    nprobe: int = 2,
    prune: bool = True,
    exclude_self: bool = False,
    dedupe: bool = False,
) -> DataFrame:
    """IVFADC serving against the landed store: route each query to
    its nprobe nearest cells, read ONLY those cell partitions, and
    score candidates ASYMMETRICALLY from the persisted pq_code column
    — the serve path never touches q_csv/scale_micro, so a pure-PQ
    store tier (codes only, ~4 bytes/vector at M=8/K=16) could answer
    it. The streaming twin of functions/similarity.q_ann_ivfpq: codes
    unpack via pq_unpack_exprs (the pack inverse), LUTs and the
    fixed-m-order cos_hat are the SHARED adc_query_luts/_adc_cos_hat
    expressions, so a stored vector scores bit-identically to the
    batch index (parity pinned by
    tests/test_streaming.py::test_adc_store_server_matches_batch).

    `exclude_self` drops neighbor_id == query_id pairs — the batch
    evaluation queries' convention when the query set is a corpus
    slice; a real serving tier keeps it False (query ids are their
    own domain). Per-query ranking is the same bounded
    collect_list -> array_sort -> slice fold as
    knn_topk_against_store."""
    from ..functions.similarity import (
        _adc_cos_hat,
        _pq_codebook_double,
        adc_query_luts,
        pq_unpack_exprs,
    )

    cd = _pq_codebook_double(pq_codebook)
    routed = route_query_cells(queries, centroids, nprobe)
    cells = [
        r["c"]
        for r in routed.select(F.explode("cells").alias("c"))
        .distinct()
        .collect()
    ]
    store = spark.read.parquet(store_path)
    if prune:
        store = store.filter(F.col("cell").isin(cells))
    corpus = store.select(
        F.col("vec_id").alias("neighbor_id"),
        "cell",
        "pq_code",
    ).select("neighbor_id", "cell", *pq_unpack_exprs())
    q = adc_query_luts(
        routed.select(
            "query_id", F.explode("cells").alias("cell"), "v", "norm"
        ),
        cd,
        keep=("cell",),
    )
    scored = q.join(corpus, "cell")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "neighbor_id", _adc_cos_hat(cd).alias("cos_hat")
    )
    if dedupe:
        # a SPILL store shows a vector once per home cell; the rows
        # are byte-identical (the score reads codes + LUTs, never the
        # cell), so dropping duplicates is deterministic — mirrors
        # the batch spill path's distinct-before-ranking
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    topk = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cos_hat")).alias("neg_cos"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            )
        ),
        1,
        k,
    )
    return (
        scored.groupBy("query_id")
        .agg(topk.alias("_top"))
        .select("query_id", F.posexplode("_top").alias("_pos", "_s"))
        .select(
            "query_id",
            F.col("_s.neighbor_id").alias("neighbor_id"),
            (F.col("_pos") + 1).cast("long").alias("rank"),
            F.floor(-F.col("_s.neg_cos") * 10000)
            .cast("long")
            .alias("adc_permyriad"),
        )
    )


def adc_refine_topk_against_store(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    centroids: list[tuple[int, list[float]]],
    pq_codebook: list,
    vectors: DataFrame,
    k: int = 5,
    k_refine: int | None = None,  # None -> similarity.REFINE_K at call time
    nprobe: int = 2,
    prune: bool = True,
    exclude_self: bool = False,
    dedupe: bool = False,
) -> DataFrame:
    """IVFADC + REFINE serving against the landed store (the serving
    twin of functions/similarity.q_ann_ivfpq_refined): ADC-shortlist
    k_refine candidates per query from the persisted pq_code column
    (adc_topk_against_store — codes only, partition-pruned probe),
    then re-rank ONLY those candidates by exact cosine against the
    raw-vector side table `vectors` ((vec_id, v array<double>, norm)
    — the higher-fidelity tier a production refine fetches from; the
    code store alone CANNOT refine, which is the point of keeping
    one). The shortlist is bounded (queries x k_refine rows) and
    broadcasts into the vector table, so the refine is a
    candidates-only lookup exactly like the batch stage — the vector
    tier is never scanned into the scorer. Exact cosine and
    (cos DESC, neighbor_id) ordering are the shared fold expressions,
    so the served answer equals the batch refined query row-for-row
    (parity pinned inside
    tests/test_streaming.py::test_adc_store_server_matches_batch).

    k_refine defaults to similarity.REFINE_K RESOLVED AT CALL TIME
    (ADVICE r11: a hardcoded literal silently desynchronized the
    serving default from the batch default on the next REFINE_K
    change)."""
    if k_refine is None:
        from ..functions.similarity import REFINE_K

        k_refine = REFINE_K
    short = adc_topk_against_store(
        spark,
        queries,
        store_path,
        centroids,
        pq_codebook,
        k=k_refine,
        nprobe=nprobe,
        prune=prune,
        exclude_self=exclude_self,
        dedupe=dedupe,
    ).select("query_id", "neighbor_id")
    v = F.col("embedding").cast("array<double>")
    qv = queries.select(
        "query_id",
        v.alias("_qv"),
        F.sqrt(dot(v, v)).alias("_qnorm"),
    ).filter(F.col("_qnorm") > 0)
    cand = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("_cv"),
        F.col("norm").alias("_cnorm"),
    ).join(F.broadcast(short), "neighbor_id")
    exact = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("_qv"), F.col("_cv"))
            / (F.col("_qnorm") * F.col("_cnorm"))
        ).alias("cos"),
    )
    topk = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cos")).alias("neg_cos"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            )
        ),
        1,
        k,
    )
    return (
        exact.groupBy("query_id")
        .agg(topk.alias("_top"))
        .select("query_id", F.posexplode("_top").alias("_pos", "_s"))
        .select(
            "query_id",
            F.col("_s.neighbor_id").alias("neighbor_id"),
            (F.col("_pos") + 1).cast("long").alias("rank"),
            F.floor(-F.col("_s.neg_cos") * 10000)
            .cast("long")
            .alias("cos_permyriad"),
        )
    )


def _res_luts_on(qframe: DataFrame, cellbooks: dict) -> DataFrame:
    """Append the residual family's per-cell LUT columns
    (_lut0.._lut{M-1}, _cn2_0.._cn2_{M-1}) to a routed query frame
    carrying (.., cell, v, _qnorm) — a per-cell filter + projection
    union over the literal cell books (config-sized, stateless, so it
    composes into a streaming micro-batch). The expressions are the
    batch side's (similarity._adc_res_query_luts) verbatim, so a
    stored vector scores bit-identically to q_ann_ivfpq_*_residual."""
    from ..functions.similarity import (
        PQ_K,
        PQ_M,
        PQ_SUB,
        _dbl_a_sql,
        _dbl_aa_sql,
        _sq_fold,
    )

    staged = qframe.select(
        "*",
        *[
            F.slice(F.col("v"), m * PQ_SUB + 1, PQ_SUB).alias(f"_q{m}")
            for m in range(PQ_M)
        ],
    )
    parts = []
    for cell in sorted(cellbooks):
        cd = cellbooks[cell]
        parts.append(
            staged.filter(F.col("cell") == cell).select(
                "*",
                *[
                    # SQL-string literal matrices (similarity.
                    # _dbl_aa_sql — the Column-API tree cost seconds
                    # of py4j per build); the inner fold is dot()'s
                    # sequential aggregate, token for token, so a
                    # stored vector still scores bit-identically to
                    # the batch serve paths
                    F.expr(
                        f"transform({_dbl_aa_sql(cd[m])}, "
                        f"c -> aggregate(zip_with(_q{m}, c, "
                        "(p, q) -> p * q), 0.0D, (acc, z) -> acc + z))"
                    ).alias(f"_lut{m}")
                    for m in range(PQ_M)
                ],
                *[
                    F.expr(
                        _dbl_a_sql(
                            [_sq_fold(cd[m][j]) for j in range(PQ_K)]
                        )
                    ).alias(f"_cn2_{m}")
                    for m in range(PQ_M)
                ],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def adc_residual_topk_against_store(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    centroids: list[tuple[int, list[float]]] | None,
    res_codebook: list,
    cent_micro: dict,
    k: int = 5,
    nprobe: int = 2,
    prune: bool = True,
    exclude_self: bool = False,
    dedupe_best: bool = False,
    euclidean_route: bool = True,
) -> DataFrame:
    """IVFADC serving against a RESIDUAL-code store (the streaming
    twin of functions/similarity's residual serve paths): probe
    routing and partition pruning as adc_topk_against_store, but the
    persisted pq_code decodes against the per-cell COMBINED
    reconstruction books (centroid folded in at the integer level —
    similarity.pqr_cellbooks_of, shared), so the LUT columns are
    per (query, probed cell). `dedupe_best` keeps the best
    reconstruction per (query, neighbor) — required on a spill store,
    where the same vector carries a DIFFERENT residual code per home
    cell (unlike the raw spill store's byte-identical rows); mirrors
    the batch groupBy/max. `euclidean_route` (the DEFAULT since r14 —
    the measured serving recommendation routes on the trained k-means
    coarse level, see start_ann_store) probes by exact-integer
    Euclidean rank against cent_micro itself; pass
    euclidean_route=False for the member-vector cosine-routing
    variant (cent_micro is then only the residual base and `centroids`
    carries the routing codebook — the cellbooks are generic over the
    coarse level either way)."""
    from ..functions.similarity import (
        _adc_cos_hat_cells,
        pq_unpack_exprs,
        pqr_cellbooks_of,
    )

    cellbooks = pqr_cellbooks_of(res_codebook, cent_micro)
    routed = route_query_cells(
        queries,
        centroids,
        nprobe,
        euclidean_centroids=cent_micro if euclidean_route else None,
    )
    cells = [
        r["c"]
        for r in routed.select(F.explode("cells").alias("c"))
        .distinct()
        .collect()
    ]
    store = spark.read.parquet(store_path)
    if prune:
        store = store.filter(F.col("cell").isin(cells))
    corpus = store.select(
        F.col("vec_id").alias("neighbor_id"), "cell", "pq_code"
    ).select("neighbor_id", "cell", *pq_unpack_exprs())
    q = _res_luts_on(
        routed.select(
            "query_id",
            F.explode("cells").alias("cell"),
            "v",
            F.col("norm").alias("_qnorm"),
        ),
        cellbooks,
    )
    scored = q.join(corpus, "cell")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id", "neighbor_id", _adc_cos_hat_cells().alias("cos_hat")
    )
    if dedupe_best:
        scored = scored.groupBy("query_id", "neighbor_id").agg(
            F.max("cos_hat").alias("cos_hat")
        )
    topk = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cos_hat")).alias("neg_cos"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            )
        ),
        1,
        k,
    )
    return (
        scored.groupBy("query_id")
        .agg(topk.alias("_top"))
        .select("query_id", F.posexplode("_top").alias("_pos", "_s"))
        .select(
            "query_id",
            F.col("_s.neighbor_id").alias("neighbor_id"),
            (F.col("_pos") + 1).cast("long").alias("rank"),
            F.floor(-F.col("_s.neg_cos") * 10000)
            .cast("long")
            .alias("adc_permyriad"),
        )
    )


def adc_residual_refine_topk_against_store(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    centroids: list[tuple[int, list[float]]] | None,
    res_codebook: list,
    cent_micro: dict,
    vectors: DataFrame,
    k: int = 5,
    k_refine: int | None = None,
    nprobe: int = 2,
    prune: bool = True,
    exclude_self: bool = False,
    dedupe_best: bool = False,
    euclidean_route: bool = True,
) -> DataFrame:
    """Residual IVFADC + REFINE against the landed store — by DEFAULT
    (euclidean_route=True, the r14 flip shipping the measured
    recommendation) the serving twin of q_ann_ivfpq_kmeans /
    q_ann_ivfpq_spill_kmeans (the trained-k-means store, routed like
    ann_topk_against_store); with euclidean_route=False the
    member-vector variant twinning q_ann_ivfpq_residual
    (single-assignment store) / q_ann_ivfpq_spill_residual (spill
    store + dedupe_best): residual ADC shortlist from the persisted
    codes, candidates-only exact re-rank against the raw-vector side
    table. k_refine defaults to similarity.REFINE_K at call time like
    the raw serving twin."""
    if k_refine is None:
        from ..functions.similarity import REFINE_K

        k_refine = REFINE_K
    short = adc_residual_topk_against_store(
        spark,
        queries,
        store_path,
        centroids,
        res_codebook,
        cent_micro,
        k=k_refine,
        nprobe=nprobe,
        prune=prune,
        exclude_self=exclude_self,
        dedupe_best=dedupe_best,
        euclidean_route=euclidean_route,
    ).select("query_id", "neighbor_id")
    v = F.col("embedding").cast("array<double>")
    qv = queries.select(
        "query_id",
        v.alias("_qv"),
        F.sqrt(dot(v, v)).alias("_qnorm"),
    ).filter(F.col("_qnorm") > 0)
    cand = vectors.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("_cv"),
        F.col("norm").alias("_cnorm"),
    ).join(F.broadcast(short), "neighbor_id")
    exact = cand.join(F.broadcast(qv), "query_id").select(
        "query_id",
        "neighbor_id",
        (
            dot(F.col("_qv"), F.col("_cv"))
            / (F.col("_qnorm") * F.col("_cnorm"))
        ).alias("cos"),
    )
    topk = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cos")).alias("neg_cos"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            )
        ),
        1,
        k,
    )
    return (
        exact.groupBy("query_id")
        .agg(topk.alias("_top"))
        .select("query_id", F.posexplode("_top").alias("_pos", "_s"))
        .select(
            "query_id",
            F.col("_s.neighbor_id").alias("neighbor_id"),
            (F.col("_pos") + 1).cast("long").alias("rank"),
            F.floor(-F.col("_s.neg_cos") * 10000)
            .cast("long")
            .alias("cos_permyriad"),
        )
    )


def start_knn_store_server(
    spark: SparkSession,
    queries: DataFrame,
    store_path: str,
    centroids: list[tuple[int, list[float]]],
    out_path: str,
    checkpoint: str,
    k: int = 5,
    nprobe: int = 2,
    available_now: bool = False,
):
    """Continuous kNN serving against the landed store: each query
    micro-batch runs knn_topk_against_store (partition-pruned probe)
    and lands results under `out_path` — the closed loop between
    start_vector_shards (which lands the index) and the serving
    path (which reads only the probed shards).

    Each micro-batch writes to its OWN batch=<id> directory with
    overwrite: foreachBatch replays the last uncommitted batch after
    a restart, and a blind append would duplicate those answers —
    per-batch overwrite makes the replay idempotent (the same
    discipline the file-sink commit log gives the shard writer)."""

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        knn_topk_against_store(
            spark,
            batch_df,
            store_path,
            centroids,
            k=k,
            nprobe=nprobe,
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    writer = (
        queries.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ann_store_server(
    spark: SparkSession,
    sf_dir: str,
    queries: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    k: int = 5,
    nprobe: int = 2,
    exclude_self: bool = False,
    available_now: bool = False,
):
    """Continuous serving for THE shipped ANN default — the closed
    loop over start_ann_store's landed index: each query micro-batch
    runs ann_topk_against_store (trained-k-means routing, residual
    ADC shortlist, candidates-only exact refine — the measured
    (kmeans, residual, single) recommendation) and lands answers
    under out_path. Completes the default's deployment story:
    ingest = start_ann_store, batch serve = ann_topk_against_store /
    q_ann_serve, continuous serve = THIS. The raw-knn server
    (start_knn_store_server) stays as the member-vector variant.

    `exclude_self` defaults False: a query stream is its OWN id
    domain (the knn_query_stream stance — a corpus vector whose
    vec_id equals a query_id is a legitimate neighbor); pass True
    when replaying corpus vectors as queries, as the parity test
    does to diff against q_ann_serve.

    Same idempotent per-batch-overwrite discipline as the raw
    server: foreachBatch replays the last uncommitted batch after a
    restart, and a blind append would duplicate those answers.
    Round-trip parity vs q_ann_serve pinned by
    test_default_ann_store_server_round_trip."""

    def _serve(batch_df: DataFrame, batch_id: int) -> None:
        ann_topk_against_store(
            spark,
            sf_dir,
            batch_df,
            store_path,
            k=k,
            nprobe=nprobe,
            exclude_self=exclude_self,
        ).write.mode("overwrite").parquet(f"{out_path}/batch={batch_id}")

    writer = (
        queries.writeStream.foreachBatch(_serve)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


QUERY_FEED_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("query_ts", T.TimestampType()),
    ]
)

KNN_STATE_WATERMARK = "10 minutes"


def knn_query_stream(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    watermark: str = KNN_STATE_WATERMARK,
) -> DataFrame:
    """Serving side of the ANN stack: arriving query vectors answered
    with their cosine top-k from the (static) indexed corpus — the
    continuous complement of vector_ingest_stream (which builds the
    store) and the batch knn_* queries (which define the semantics).

    Routing is the SAME hyperplane-LSH bucket expression as the batch
    q_knn_lsh (functions/similarity.bucket_of), so a query probes
    exactly the bucket its batch twin would: scan-local signature on
    the stream side, one stream-static equi-join on the bucket key —
    never a cross product against the corpus. The per-query top-k is
    a streaming aggregation (collect_list folded to a sorted slice —
    sorted on the raw float cosine with vec_id tie-break, matching
    the batch window's ORDER BY exactly), grouped on
    (query_id, window(query_ts)) so the watermark actually EVICTS
    per-query aggregation state — Spark only cleans streaming-agg
    state when the grouping keys carry the event-time column, so a
    bare groupBy(query_id) under a watermark would retain every
    query's collect_list forever. Query ids are their OWN id domain
    (unlike the batch knn_* queries, whose query set IS a corpus
    slice), so no self-exclusion filter: a corpus vector whose
    vec_id happens to equal a query_id is still a legitimate
    neighbor.

    At 100 TB the corpus side is the cell-partitioned store
    start_vector_shards lands (bucket -> partition pruning instead of
    a join against the full table); the semantics here are identical.
    """
    from ..functions.similarity import bucket_of

    v = F.col("embedding").cast("array<double>")

    def staged(df: DataFrame, id_col: str, out: str) -> DataFrame:
        return (
            df.select(
                F.col(id_col).alias(out),
                *[c for c in df.columns if c not in (id_col, "embedding")],
                v.alias("v"),
                F.sqrt(dot(v, v)).alias("norm"),
            )
            .filter(F.col("norm") > 0)
            .withColumn("bucket", bucket_of(F.col("v")))
        )

    c = staged(corpus, "vec_id", "neighbor_id").select(
        "neighbor_id",
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
        "bucket",
    )
    q = staged(queries, "query_id", "query_id").withWatermark(
        "query_ts", watermark
    )
    cos = dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm"))
    scored = q.join(c, "bucket").select(
        "query_id",
        "query_ts",
        F.col("neighbor_id"),
        cos.alias("cos"),
    )
    # top-k as a sorted slice: struct sort on (-cos, neighbor_id)
    # replicates the batch window's (cos DESC, neighbor_id ASC)
    topk = F.slice(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("cos")).alias("neg_cos"),
                    F.col("neighbor_id").alias("neighbor_id"),
                )
            )
        ),
        1,
        k,
    )
    return (
        scored.groupBy(
            "query_id", F.window("query_ts", watermark)
        )
        .agg(topk.alias("_top"))
        .select(
            "query_id",
            F.transform(
                F.col("_top"),
                lambda s: F.struct(
                    s["neighbor_id"].alias("neighbor_id"),
                    F.floor(-s["neg_cos"] * 10000)
                    .cast("long")
                    .alias("cos_permyriad"),
                ),
            ).alias("topk"),
        )
    )

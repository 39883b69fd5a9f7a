"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode* step is a
deterministic fake behind `decode_stub` (clearly marked; swap in a
real decoder in production). Everything Spark-side is real and
tested: binary columns, metadata structs, Arrow-batched mapInPandas
with an explicit output schema, and partition-parallel batch shape.

Scale: mapInPandas streams Arrow batches — memory is bounded by batch
size, not partition size; the decode fan-out keeps the (doc_id)
partitioning so downstream joins need no extra shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..tables import load_table

MEDIA_TYPES = ("image", "audio", "video")


def media_type_expr() -> F.Column:
    """The modality assignment (doc_id -> image/audio/video) as ONE
    shared expression — consumed by with_media_columns AND the
    streaming phash gate (ADVICE r8: an inline duplicate would let
    the stream gate and the batch near-dup classify the same asset
    differently if the mapping ever changes)."""
    return F.element_at(
        F.array(*[F.lit(t) for t in MEDIA_TYPES]),
        (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
    )


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct."""
    media_type = media_type_expr()
    blob = F.col("text").cast("binary")
    return docs.select(
        "doc_id",
        blob.alias("payload"),
        media_type.alias("media_type"),
        F.struct(
            F.octet_length("text").cast("long").alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("media_meta"),
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle-checkable projection of the media table (no raw
    bytes in the output — binary reprs differ across engines)."""
    docs = load_table(spark, sf_dir, "documents")
    m = with_media_columns(docs)
    return m.select(
        "doc_id",
        "media_type",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.origin").alias("origin"),
        F.octet_length("payload").cast("long").alias("payload_bytes"),
    )


# feature emitted as SCALAR columns, not array<double>: the driver's
# canonicalizer sorts output values, and list cells are unhashable —
# scalars also make the stub decode DuckDB-oracle-expressible
_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("feature_0", T.DoubleType()),
        T.StructField("feature_1", T.DoubleType()),
        T.StructField("feature_2", T.DoubleType()),
        T.StructField("feature_3", T.DoubleType()),
    ]
)


def decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decoder.

    Real deployment: image -> PIL/cv2 decode + resize, audio ->
    soundfile frames, video -> frame sampling. Those libs are not in
    this container; the fake keeps the exact batch shape and schema a
    real decoder would produce.
    """
    n = len(payload)
    n_frames = 1 if media_type == "image" else (n % 7) + 1
    feature = [
        float(n % 256),
        float(payload[0] if n else 0),
        float(payload[-1] if n else 0),
        float(n_frames),
    ]
    return {"n_frames": n_frames, "feature": feature}


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas feature extraction over binary payloads. The decode
    is a stub, but the plumbing — Arrow batches, explicit schema,
    preserved partitioning — is the real path, and because the stub is
    deterministic arithmetic the output is fully oracle-checked."""
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                decode_stub(payload, mt)
                for payload, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_frames": [d["n_frames"] for d in decoded],
                    **{
                        f"feature_{i}": [d["feature"][i] for d in decoded]
                        for i in range(4)
                    },
                }
            )

    return media.mapInPandas(extract, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("resized_w", T.LongType()),
        T.StructField("resized_h", T.LongType()),
    ]
)

FRAME_STRIDE = 2  # sample every 2nd frame
RESIZE_MAX = 224  # cap the longer edge (stub arithmetic)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling + resize plumbing: one media row fans out to its
    sampled frames via mapInPandas — the row-expanding UDF shape a
    real video pipeline uses (decode -> sample every k-th frame ->
    resize -> emit per-frame rows).

    The decode/resize math is the deterministic stub (codecs absent in
    this container; a real deployment swaps cv2/PIL into the loop
    body), but the distribution-critical parts are real: Arrow-batched
    input, explicit per-frame output schema, bounded memory (the
    fan-out is per input batch), and doc_id partitioning preserved so
    a downstream per-doc aggregation needs no extra shuffle. Stub
    arithmetic is integer-only, so the whole fan-out is
    DuckDB-oracle-checked row-for-row.
    """
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs)

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in _FRAME_SCHEMA.fields}
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                n = len(payload)
                n_frames = 1 if mt == "image" else (n % 7) + 1
                per_frame = n // n_frames if n_frames else 0
                orig_w, orig_h = 64 + n % 64, 48 + n % 48
                scale_w = min(orig_w, RESIZE_MAX)
                scale_h = min(orig_h, RESIZE_MAX)
                for idx in range(0, n_frames, FRAME_STRIDE):
                    rows["doc_id"].append(doc_id)
                    rows["media_type"].append(mt)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(idx * per_frame)
                    rows["frame_bytes"].append(per_frame)
                    rows["resized_w"].append(scale_w)
                    rows["resized_h"].append(scale_h)
            yield pd.DataFrame(rows)

    return media.mapInPandas(frames, schema=_FRAME_SCHEMA)


# ------------------------------------------ perceptual-hash near-dup
# dHash over the stub decoder's pixel grid: an 8x8 byte grid sampled
# from the payload (px(r,c) = payload[(r*8+c) mod n]) stands in for
# the downscaled luminance grid a real image pipeline hashes; each of
# the 8 rows contributes 7 left<right comparisons -> a 56-bit hash
# whose Hamming distance tracks payload similarity (what dHash gives
# real images). 56 bits (not 64) keeps every bit literal a positive
# BIGINT in both engines.
MEDIA_GRID = 8
MEDIA_PHASH_BITS = MEDIA_GRID * (MEDIA_GRID - 1)  # 56
MEDIA_PHASH_BAND_BITS = 14
MEDIA_PHASH_N_BANDS = MEDIA_PHASH_BITS // MEDIA_PHASH_BAND_BITS  # 4
# pigeonhole: <= n_bands-1 bit flips leave >= 1 of the 4 bands exact,
# so the (media_type, band, val) equi-join is recall-lossless at this
# threshold — the q_dedup_simhash_pairs guarantee, reused verbatim
MEDIA_PHASH_MAX_HAMMING = MEDIA_PHASH_N_BANDS - 1


def media_phash_py(payload: bytes) -> int:
    """Deterministic stub dHash (row-wise gradient sign over the
    sampled byte grid). Production swaps a real decode+downscale in
    front; the banding/verify machinery downstream is unchanged."""
    n = len(payload)
    if n == 0:
        return 0
    g = MEDIA_GRID
    h = 0
    for r in range(g):
        row = [payload[(r * g + c) % n] for c in range(g)]
        for c in range(g - 1):
            if row[c + 1] > row[c]:
                h |= 1 << (r * (g - 1) + c)
    return h


_PHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def media_phash_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-row 56-bit perceptual hash (doc_id, media_type,
    phash) — session-cached artifact, Arrow mapInPandas like the rest
    of the multimodal decode family (the hash IS the decode step: in
    production it runs PIL/cv2 then dHash; the stub keeps batch shape
    and determinism)."""
    from .dedup import _cached_frame

    def _build() -> DataFrame:
        docs = load_table(spark, sf_dir, "documents")
        media = with_media_columns(docs).select(
            "doc_id", "media_type", "payload"
        )

        def hash_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "media_type": pdf["media_type"],
                        "phash": [
                            media_phash_py(p) for p in pdf["payload"]
                        ],
                    }
                )

        return media.mapInPandas(hash_batches, schema=_PHASH_SCHEMA)

    return _cached_frame(spark, sf_dir, "media_phash", _build)


def q_media_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate media pairs (per modality,
    Hamming <= MEDIA_PHASH_MAX_HAMMING) — what a training-data
    pipeline runs on images/video before mixing sources: two crawls
    of the same asset re-encode to slightly different bytes but
    near-identical perceptual hashes.

    Scale shape: the q_dedup_simhash_pairs blocking applied to the
    media stack (dedup.py:350 machinery, multimodal decode front):
    each hash is replicated MEDIA_PHASH_N_BANDS times (a constant)
    into (media_type, band, 14-bit val) keys; candidates come from
    one equi-join on those keys — never an all-pairs compare — and
    the exact bit_count(xor) verify touches only candidates. The
    phash table is a session-cached artifact shared with any future
    media operator."""
    sig = media_phash_table(spark, sf_dir)
    return _media_neardup_pairs(sig)


def _media_neardup_pairs(sig: DataFrame) -> DataFrame:
    bands = sig.select(
        "doc_id",
        "media_type",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("long").alias("band"),
                        (
                            F.shiftright(
                                F.col("phash"), MEDIA_PHASH_BAND_BITS * i
                            )
                            % F.lit(1 << MEDIA_PHASH_BAND_BITS)
                        ).alias("val"),
                    )
                    for i in range(MEDIA_PHASH_N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "media_type", "phash", "bk.band", "bk.val")
    a, b = bands.alias("a"), bands.alias("b")
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))).cast("long")
    return (
        a.join(
            b,
            (F.col("a.media_type") == F.col("b.media_type"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.media_type").alias("media_type"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
        .select("media_type", "doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= MEDIA_PHASH_MAX_HAMMING)
    )


def _media_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached component labels over the perceptual-hash pair
    set — the media twin of corpus._minhash_components (same shared-
    artifact discipline: the iterative label loop runs once, every
    consumer reads the cached frame)."""
    from .corpus import connected_components
    from .dedup import _cached_frame

    return _cached_frame(
        spark,
        sf_dir,
        "media_components",
        lambda: connected_components(
            q_media_neardup(spark, sf_dir).select("doc_a", "doc_b")
        ),
    )


def q_media_dedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media retention set: keep ONE representative (min doc_id) per
    perceptual-hash near-dup component plus every unpaired media row —
    the asset list a multimodal training mixture actually ships after
    image/video dedup (q_dedup_keep's discipline applied to the media
    stack; pairs never cross media_type, so components stay within a
    modality by construction).

    Scale shape: the pair set and the iterative min-label loop are
    candidate-driven (see q_media_neardup / connected_components);
    the non-canonical member set is tiny and LEFT ANTI joins against
    the media projection under AQE broadcast."""
    comp = _media_components(spark, sf_dir)
    dropped = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    media = with_media_columns(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "media_type"
    )
    return media.join(dropped, "doc_id", "left_anti")

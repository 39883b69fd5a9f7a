"""DuckDB oracles for the LLM-data-pipeline operators.

Generated programmatically where the Spark side is generated from the
same constants (minhash count, simhash bits, LSH hyperplanes) so the
two dialects cannot drift.
"""

from __future__ import annotations

from .functions.dedup import (
    MINHASH_P,
    MINHASH_VERIFY_PERMILLE,
    N_BANDS,
    N_MINHASH,
    ROWS_PER_BAND,
    SHINGLE_K,
    SIMHASH_BITS,
)
from .functions.similarity import HYPERPLANES, N_QUERIES, TOP_K
from .functions.text import LANG_MARKERS, STOPWORDS

_STOP_LIST = ", ".join(f"'{s}'" for s in STOPWORDS)

TEXT_STATS_SQL = f"""
SELECT doc_id, len_chars, n_tokens, n_distinct_tokens, n_stopwords,
       (1000 * n_stopwords) // n_tokens AS stopword_permille,
       (100 * tok_chars) // n_tokens AS avg_token_len_centi
FROM (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS len_chars,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
           AS n_stopwords,
         CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
           AS tok_chars
  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t0
) t1
"""


def _marker_list(lang: str) -> str:
    return ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])


LANGUAGE_ID_SQL = f"""
SELECT doc_id, labeled_lang, score_en, score_es, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_de
                 AND score_en > 0 THEN 'en'
            WHEN score_es >= score_de AND score_es > 0 THEN 'es'
            WHEN score_de > 0 THEN 'de'
            ELSE 'unknown' END AS predicted_lang
FROM (
  SELECT doc_id, lang AS labeled_lang,
         CAST(len(list_filter(tk, t -> t IN ({_marker_list("en")}))) AS BIGINT)
           AS score_en,
         CAST(len(list_filter(tk, t -> t IN ({_marker_list("es")}))) AS BIGINT)
           AS score_es,
         CAST(len(list_filter(tk, t -> t IN ({_marker_list("de")}))) AS BIGINT)
           AS score_de
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents) t0
) t1
"""

DOC_FINGERPRINT_SQL = """
SELECT doc_id, md5(text) AS fp_exact,
       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))),
                           ' ')) AS fp_tokenset
FROM documents
"""

DEDUP_EXACT_SQL = """
SELECT md5(text) AS fp, count(*) AS n_copies,
       min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1
"""

# affine minhash family: one md5 per shingle split into 32-bit halves
# (h1, h2), then minhash_i = min((h1 + i*h2) mod P) — mirrors
# functions/dedup.py _hash_pairs/_minhash_cols incl. the hex->int
# conversion (CAST('0x'||substr AS BIGINT) == Spark conv(_, 16, 10))
_MINHASH_COLS = ",\n         ".join(
    f"list_aggregate(list_transform(hp, p -> (p.h1 + {i} * p.h2) "
    f"% {MINHASH_P}), 'min') AS m{i}"
    for i in range(N_MINHASH)
)
_BAND_SELECTS = "\n  UNION ALL ".join(
    "SELECT doc_id, CAST({b} AS BIGINT) AS band, {concat} AS key FROM sig".format(
        b=b,
        concat=" || '|' || ".join(
            f"CAST(m{ROWS_PER_BAND * b + r} AS VARCHAR)"
            for r in range(ROWS_PER_BAND)
        ),
    )
    for b in range(N_BANDS)
)
# SHINGLE_K-word grams over the 1-indexed token list; short docs fall
# back to one whole-doc shingle (mirrors functions/dedup.py _shingles)
_SHINGLE_CONCAT = " || ' ' || ".join(f"tk[i + {o}]" for o in range(SHINGLE_K))
_SHINGLE = (
    f"CASE WHEN len(tk) >= {SHINGLE_K} THEN "
    f"list_distinct(list_transform(range(1, len(tk) - {SHINGLE_K - 2}), "
    f"i -> {_SHINGLE_CONCAT})) "
    f"ELSE [array_to_string(tk, ' ')] END"
)

DEDUP_MINHASH_LSH_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
shing AS (
  SELECT doc_id, {_SHINGLE} AS sh FROM toks
),
hpairs AS (
  SELECT doc_id,
         list_transform(sh, t -> struct_pack(
           h1 := CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT),
           h2 := CAST(('0x' || substr(md5(t), 9, 8)) AS BIGINT)
         )) AS hp
  FROM shing
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS}
  FROM hpairs
),
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, jac_permille FROM (
  SELECT c.doc_a, c.doc_b,
         (1000 * CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT))
           // CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)
           AS jac_permille
  FROM cand c
  JOIN shing sa ON c.doc_a = sa.doc_id
  JOIN shing sb ON c.doc_b = sb.doc_id
) v
WHERE jac_permille >= {MINHASH_VERIFY_PERMILLE}
"""

DEDUP_NGRAM_JACCARD_SQL = """
SELECT doc_a, doc_b, jac_permille FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         (1000 * CAST(len(list_intersect(a.tk, b.tk)) AS BIGINT))
           // CAST(len(list_distinct(list_concat(a.tk, b.tk))) AS BIGINT)
           AS jac_permille
  FROM (SELECT doc_id, lang, n_chars,
               list_distinct(string_split(text, ' ')) AS tk FROM documents) a
  JOIN (SELECT doc_id, lang, n_chars,
               list_distinct(string_split(text, ' ')) AS tk FROM documents) b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= 2
) p
WHERE jac_permille >= 800
"""

# hex digit -> value without from_hex: strpos on the hex alphabet
_H = "0123456789abcdef"
_HEX4 = (
    f"(strpos('{_H}', substr(md5(t), 1, 1)) - 1) * 4096"
    f" + (strpos('{_H}', substr(md5(t), 2, 1)) - 1) * 256"
    f" + (strpos('{_H}', substr(md5(t), 3, 1)) - 1) * 16"
    f" + (strpos('{_H}', substr(md5(t), 4, 1)) - 1)"
)
_SIMHASH_TERMS = " + ".join(
    f"CASE WHEN 2 * CAST(len(list_filter(hv, h -> (h // {1 << bit}) % 2 = 1)) AS BIGINT)"
    f" > n THEN {1 << bit} ELSE 0 END"
    for bit in range(SIMHASH_BITS)
)

DEDUP_SIMHASH_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(list_distinct(string_split(text, ' ')),
                        t -> {_HEX4}) AS hv,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n
  FROM documents
)
SELECT doc_id, CAST({_SIMHASH_TERMS} AS BIGINT) AS simhash16 FROM t
"""

_COS = (
    "list_dot_product(a.v, b.v) / "
    "(sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
)

# hyperplane-LSH banding shared VERBATIM with the Spark side: the
# plane lists come from dedup.NEARDUP_PLANES, so both engines compute
# the same band values, the same candidate pairs, and the same
# fold-order cosine re-score.
from .functions.dedup import (  # noqa: E402
    NEARDUP_BAND_BITS,
    NEARDUP_BANDS,
    NEARDUP_PLANES,
)


def _nd_plane_lit(plane: list[float]) -> str:
    return "[" + ", ".join(f"{w:.1f}" for w in plane) + "]"


def _nd_band_val(b: int) -> str:
    bits = []
    for j in range(NEARDUP_BAND_BITS):
        plane = NEARDUP_PLANES[b * NEARDUP_BAND_BITS + j]
        bits.append(
            f"(CASE WHEN list_dot_product(v, {_nd_plane_lit(plane)}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(bits)


_ND_BAND_SELECTS = "\n  UNION ALL\n  ".join(
    f"SELECT vec_id, label, v, {b} AS band, "
    f"CAST({_nd_band_val(b)} AS BIGINT) AS val FROM e"
    for b in range(NEARDUP_BANDS)
)

EMBEDDING_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
bands AS (
  {_ND_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
  FROM bands a
  JOIN bands b ON a.label = b.label AND a.band = b.band
              AND a.val = b.val AND a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cos_permyriad FROM (
  SELECT vec_a, vec_b,
         CAST(floor((list_dot_product(x.v, y.v) /
               (sqrt(list_dot_product(x.v, x.v)) *
                sqrt(list_dot_product(y.v, y.v)))) * 10000) AS BIGINT)
           AS cos_permyriad
  FROM cand JOIN e x ON cand.vec_a = x.vec_id
            JOIN e y ON cand.vec_b = y.vec_id
) p
WHERE cos_permyriad >= 3000
"""

_QCOS = (
    "list_dot_product(q.v, c.v) / "
    "(sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v)))"
)

KNN_BRUTEFORCE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_QCOS} AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM ranked WHERE rank <= {TOP_K}
"""

KNN_LABEL_VOTE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.label AS neighbor_label, c.vec_id AS neighbor_id,
         {_QCOS} AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
topk AS (
  SELECT * FROM (
    SELECT query_id, true_label, neighbor_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
votes AS (
  SELECT query_id, true_label, neighbor_label, count(*) AS votes
  FROM topk GROUP BY query_id, true_label, neighbor_label
)
SELECT query_id, true_label, neighbor_label AS predicted_label,
       votes, neighbor_label = true_label AS correct
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY votes DESC, neighbor_label) AS vr
  FROM votes
) WHERE vr = 1
"""


HARD_NEGATIVES_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(label AS BIGINT) AS label,
         CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
scored AS (
  SELECT q.vec_id AS query_id, q.label AS true_label,
         c.vec_id AS neighbor_id, c.label AS neighbor_label,
         {_QCOS} AS cos
  FROM e q JOIN e c ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
),
topk AS (
  SELECT query_id, true_label, neighbor_id, neighbor_label,
         CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad, rank
  FROM (
    SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                      ORDER BY cos DESC, neighbor_id)
                   AS BIGINT) AS rank
    FROM scored
  ) WHERE rank <= {TOP_K}
),
marks AS (
  SELECT query_id, true_label,
         min(CASE WHEN neighbor_label = true_label THEN rank END)
           AS pos_rank,
         min(CASE WHEN neighbor_label <> true_label THEN rank END)
           AS neg_rank
  FROM topk GROUP BY query_id, true_label
)
SELECT m.query_id, m.true_label,
       p.neighbor_id AS pos_id, p.cos_permyriad AS pos_cos_permyriad,
       n.neighbor_id AS neg_id, n.neighbor_label AS neg_label,
       n.cos_permyriad AS neg_cos_permyriad,
       p.cos_permyriad - n.cos_permyriad AS margin_permyriad
FROM marks m
JOIN topk p ON p.query_id = m.query_id AND p.rank = m.pos_rank
JOIN topk n ON n.query_id = m.query_id AND n.rank = m.neg_rank
"""


def _plane_literal(plane: list[int]) -> str:
    vals = ", ".join(f"{float(w)}" for w in plane)
    return f"CAST([{vals}] AS DOUBLE[])"


_BUCKET = " + ".join(
    f"CASE WHEN list_dot_product(v, {_plane_literal(p)}) >= 0"
    f" THEN {1 << j} ELSE 0 END"
    for j, p in enumerate(HYPERPLANES)
)

KNN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         CAST({_BUCKET} AS BIGINT) AS bucket
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, {_QCOS} AS cos
  FROM e q JOIN e c
    ON q.bucket = c.bucket AND q.vec_id < {N_QUERIES}
   AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM ranked WHERE rank <= {TOP_K}
"""

MULTIMODAL_META_SQL = """
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       source AS origin,
       CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
FROM documents
"""

# Twin of q_multimodal_frames: the same integer stub arithmetic, with
# DuckDB range() unnest playing the frame fan-out
MULTIMODAL_FRAMES_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n
  FROM documents
),
f AS (
  SELECT doc_id, media_type, n,
         CASE WHEN media_type = 'image' THEN 1 ELSE (n % 7) + 1 END
           AS n_frames
  FROM m
)
SELECT doc_id, media_type,
       CAST(frame_idx AS BIGINT) AS frame_idx,
       CAST(frame_idx * (n // n_frames) AS BIGINT) AS frame_offset,
       CAST(n // n_frames AS BIGINT) AS frame_bytes,
       CAST(least(64 + n % 64, 224) AS BIGINT) AS resized_w,
       CAST(least(48 + n % 48, 224) AS BIGINT) AS resized_h
FROM (SELECT *, unnest(range(0, n_frames, 2)) AS frame_idx FROM f) t
"""

# Twin of functions/multimodal.py decode_stub: payload is the UTF-8
# text bytes; first/last byte come from the hex dump of the blob (the
# payload may hold non-ASCII, so byte != codepoint)
MULTIMODAL_FEATURES_SQL = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx
  FROM documents
)
SELECT doc_id, media_type,
       CAST(CASE WHEN media_type = 'image' THEN 1 ELSE n % 7 + 1 END
            AS BIGINT) AS n_frames,
       CAST(n % 256 AS DOUBLE) AS feature_0,
       CAST(CASE WHEN n > 0
                 THEN CAST(('0x' || substr(hx, 1, 2)) AS INT)
                 ELSE 0 END AS DOUBLE) AS feature_1,
       CAST(CASE WHEN n > 0
                 THEN CAST(('0x' || substr(hx, 2 * n - 1, 2)) AS INT)
                 ELSE 0 END AS DOUBLE) AS feature_2,
       CAST(CASE WHEN media_type = 'image' THEN 1 ELSE n % 7 + 1 END
            AS DOUBLE) AS feature_3
FROM m
"""


from .functions.multimodal import (  # noqa: E402
    MEDIA_GRID,
    MEDIA_PHASH_BAND_BITS,
    MEDIA_PHASH_BITS,
    MEDIA_PHASH_MAX_HAMMING,
    MEDIA_PHASH_N_BANDS,
)

# Twin of multimodal.media_phash_py: px[j] = payload byte at
# (j mod n) via the hex-substr idiom (byte != codepoint for
# non-ASCII); dHash bit i compares grid cells (i//7)*8+(i%7) and +1.
_MEDIA_PX = (
    f"list_transform(range({MEDIA_GRID * MEDIA_GRID}), j -> "
    "CASE WHEN n = 0 THEN 0 ELSE "
    "CAST(('0x' || substr(hx, CAST(2*(j % n)+1 AS INT), 2)) AS INT) "
    "END)"
)
_MEDIA_PHASH = (
    f"CAST(list_sum(list_transform(range({MEDIA_PHASH_BITS}), i -> "
    f"CASE WHEN px[CAST((i // {MEDIA_GRID - 1}) * {MEDIA_GRID}"
    f" + (i % {MEDIA_GRID - 1}) + 2 AS INT)]"
    f" > px[CAST((i // {MEDIA_GRID - 1}) * {MEDIA_GRID}"
    f" + (i % {MEDIA_GRID - 1}) + 1 AS INT)]"
    " THEN (CAST(1 AS BIGINT) << CAST(i AS INT)) ELSE CAST(0 AS BIGINT)"
    " END)) AS BIGINT)"
)

MEDIA_NEARDUP_SQL = f"""
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         octet_length(encode(text)) AS n,
         hex(encode(text)) AS hx
  FROM documents
),
grid AS (
  SELECT doc_id, media_type, {_MEDIA_PX} AS px FROM m
),
sig AS (
  SELECT doc_id, media_type, {_MEDIA_PHASH} AS phash FROM grid
),
bands AS (
  SELECT doc_id, media_type, phash, b AS band,
         (phash >> CAST({MEDIA_PHASH_BAND_BITS} * b AS INT))
           & {(1 << MEDIA_PHASH_BAND_BITS) - 1} AS val
  FROM sig, unnest(range({MEDIA_PHASH_N_BANDS})) AS t(b)
),
cand AS (
  SELECT DISTINCT a.media_type AS media_type,
         a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash AS ph_a, b.phash AS ph_b
  FROM bands a
  JOIN bands b ON a.media_type = b.media_type AND a.band = b.band
              AND a.val = b.val AND a.doc_id < b.doc_id
)
SELECT media_type, doc_a, doc_b, hamming FROM (
  SELECT media_type, doc_a, doc_b,
         CAST(bit_count(CAST(xor(ph_a, ph_b) AS BIGINT)) AS BIGINT)
           AS hamming
  FROM cand
) v
WHERE hamming <= {MEDIA_PHASH_MAX_HAMMING}
"""


# Twin of q_media_dedup_keep: the DEDUP_KEEP_SQL recursive component
# fixpoint over the perceptual-hash pair set, then the media
# projection minus non-canonical members
MEDIA_DEDUP_KEEP_SQL = f"""
WITH RECURSIVE pairs AS (
  {MEDIA_NEARDUP_SQL}
),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
),
nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.doc_b, w.lab
  FROM walk w JOIN edges e ON w.node = e.doc_a
),
comp AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp WHERE node <> cluster_id)
SELECT doc_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END AS media_type
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


from .functions.text import BPE_PATTERN, QUALITY_EXPR_T  # noqa: E402

_Q = QUALITY_EXPR_T.format(d="//")

TOKEN_COUNTS_SQL = f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_PATTERN}', 0)) AS BIGINT)
         AS bpe_tokens,
       (length(text) + 3) // 4 AS est_subwords
FROM documents
"""

QUALITY_SCORE_SQL = f"""
SELECT doc_id,
       CAST({_Q} AS BIGINT) AS quality_score,
       CASE WHEN ({_Q}) >= 750 THEN 'keep'
            WHEN ({_Q}) >= 500 THEN 'review'
            ELSE 'drop' END AS bucket
FROM (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS len_chars,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
           AS n_stopwords,
         CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
           AS tok_chars
  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t0
) t1
"""


from .functions.similarity import N_CELLS  # noqa: E402

KNN_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm FROM e
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
),
assigned AS (
  SELECT vec_id, v, norm, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC, cent_id
         ) AS rn
  FROM e CROSS JOIN cent
),
cells AS (
  SELECT vec_id, v, norm, cent_id AS cell FROM assigned WHERE rn = 1
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM cells q JOIN cells c
    ON q.cell = c.cell AND q.vec_id < {N_QUERIES}
   AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM ranked WHERE rank <= {TOP_K}
"""


# ---------------------------------------------------- corpus curation
# Twins of functions/corpus.py. DuckDB regexp_replace needs the 'g'
# flag to match Spark's replace-all semantics.

DEDUP_NORMALIZED_SQL = """
SELECT md5(trim(regexp_replace(
         regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
         ' +', ' ', 'g'))) AS fp_norm,
       count(*) AS n_copies,
       min(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1
"""

_REP_GRAM = (
    f"list_transform(range(1, len(tk) - {SHINGLE_K - 2}), "
    f"i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])"
)

DOC_REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
g AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= {SHINGLE_K} THEN {_REP_GRAM}
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM t
),
c AS (
  SELECT doc_id,
         CAST(len(grams) AS BIGINT) AS n_grams,
         CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct
  FROM g
)
SELECT doc_id, n_grams,
       CASE WHEN n_grams > 0
            THEN (1000 * (n_grams - n_distinct)) // n_grams
            ELSE CAST(0 AS BIGINT) END AS repetition_permille
FROM c
"""

from .functions.corpus import (  # noqa: E402
    PII_PATTERNS,
    SAMPLE_DEFAULT_64K,
    SAMPLE_RATES_64K,
)

_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {r}" for lang, r in SAMPLE_RATES_64K.items()
) + f" ELSE {SAMPLE_DEFAULT_64K} END"

STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, lang, h16, rate_64k FROM (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
              AS BIGINT) AS h16,
         CAST({_RATE_CASE} AS BIGINT) AS rate_64k
  FROM documents
) t WHERE h16 < rate_64k
"""

from .functions.corpus import (  # noqa: E402
    N_SPLIT_SHARDS,
    SPLIT_TRAIN_64K,
    SPLIT_VAL_64K,
)

CORPUS_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN h16 < {SPLIT_TRAIN_64K} THEN 'train'
              WHEN h16 < {SPLIT_VAL_64K} THEN 'val'
              ELSE 'test' END AS split,
         hshard % {N_SPLIT_SHARDS} AS shard,
         n_tok
  FROM (
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS BIGINT) AS h16,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))
                AS BIGINT) AS hshard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
    FROM documents
  )
),
per_shard AS (
  SELECT split, shard, count(*) AS n_docs, sum(n_tok) AS n_tokens
  FROM assigned GROUP BY split, shard
)
SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       count(*) AS n_shards
FROM per_shard GROUP BY split
"""

_PII_COLS = ",\n       ".join(
    f"CAST(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT) AS {name}"
    for name, pat in PII_PATTERNS.items()
)

PII_SCAN_SQL = f"""
SELECT doc_id,
       {_PII_COLS}
FROM documents
"""

# Connected components over the verified near-dup pairs: recursive
# reachability, component id = min reachable doc id — the fixpoint the
# Spark min-label-propagation loop converges to.
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_MINHASH_LSH_SQL}
),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
),
nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.doc_b, w.lab
  FROM walk w JOIN edges e ON w.node = e.doc_a
)
SELECT node AS doc_id, min(lab) AS cluster_id
FROM walk GROUP BY node
"""

DEDUP_CLUSTER_SIZES_SQL = f"""
WITH clusters AS (
  {DEDUP_CLUSTERS_SQL}
)
SELECT cluster_size, count(*) AS n_clusters,
       CAST(cluster_size * count(*) AS BIGINT) AS n_docs
FROM (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
  FROM clusters GROUP BY cluster_id
) s
GROUP BY cluster_size
"""

# SimHash hamming pairs over SHINGLE signatures: byte-band blocking +
# exact bit_count verify (twin of functions/dedup.py
# q_dedup_simhash_pairs; shares _SHINGLE/_HEX4/_SIMHASH-term forms)
from .functions.dedup import (  # noqa: E402
    SIMHASH_BAND_BITS,
    SIMHASH_MAX_HAMMING,
    SIMHASH_N_BANDS,
)

_SIMHASH_BAND_SELECTS = "\n  UNION ALL ".join(
    f"SELECT doc_id, s16, CAST({i} AS BIGINT) AS band, "
    f"(s16 // {1 << (SIMHASH_BAND_BITS * i)}) % {1 << SIMHASH_BAND_BITS} AS val "
    f"FROM sig"
    for i in range(SIMHASH_N_BANDS)
)

DEDUP_SIMHASH_PAIRS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
shing AS (
  SELECT doc_id, {_SHINGLE} AS sh FROM toks
),
t AS (
  SELECT doc_id, list_transform(sh, t -> {_HEX4}) AS hv,
         CAST(len(sh) AS BIGINT) AS n
  FROM shing
),
sig AS (
  SELECT doc_id, CAST({_SIMHASH_TERMS} AS BIGINT) AS s16 FROM t
),
bands AS (
  {_SIMHASH_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.s16 AS sh_a, b.s16 AS sh_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.val = b.val
             AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM (
  SELECT doc_a, doc_b,
         CAST(bit_count(CAST(xor(sh_a, sh_b) AS BIGINT)) AS BIGINT)
           AS hamming
  FROM cand
) v
WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""

# ------------------------------------------- chunking & packing twins
from .functions.corpus import (  # noqa: E402
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    PACK_BUDGET_TOKENS,
)

DOC_CHUNKS_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
c AS (
  SELECT doc_id, tk,
         CASE WHEN len(tk) <= {CHUNK_TOKENS} THEN 1
              ELSE (len(tk) - {CHUNK_TOKENS} + {CHUNK_STRIDE - 1})
                   // {CHUNK_STRIDE} + 1 END AS n_chunks
  FROM t
)
SELECT doc_id, CAST(i - 1 AS BIGINT) AS chunk_idx,
       array_to_string(
         list_slice(tk, (i - 1) * {CHUNK_STRIDE} + 1,
                    (i - 1) * {CHUNK_STRIDE} + {CHUNK_TOKENS}), ' ')
         AS chunk_text
FROM c, UNNEST(range(1, n_chunks + 1)) AS u(i)
"""

PACK_SEQUENCES_SQL = f"""
SELECT doc_id, lang, n_tokens,
       CAST((cum_tokens - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT)
           AS pack_id
FROM (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         sum(CAST(len(string_split(text, ' ')) AS BIGINT))
           OVER (PARTITION BY lang ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM documents
) t
"""

# Twin of q_packing_report: the pack-assignment SQL reused verbatim
# as the inner table, folded per (lang, pack) then per lang.
PACKING_REPORT_SQL = f"""
WITH packs AS ({PACK_SEQUENCES_SQL}),
per_pack AS (
  SELECT lang, pack_id, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
  FROM packs GROUP BY lang, pack_id
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(max(pack_tokens) AS BIGINT) AS max_pack_tokens,
       CAST(min(pack_tokens) AS BIGINT) AS min_pack_tokens,
       (1000 * CAST(sum(pack_tokens) AS BIGINT))
         // (CAST(count(*) AS BIGINT) * {PACK_BUDGET_TOKENS})
         AS mean_fill_permille,
       CAST(max(n_docs) AS BIGINT) AS max_docs_per_pack
FROM per_pack GROUP BY lang
"""

# -------------------------------- contamination / vocab / mixture twins
from .functions.corpus import (  # noqa: E402
    CONTAM_K,
    CONTAM_MULT,
    CONTAM_P,
    GRAM_MULT2,
    GRAM_PACK,
    HOLDOUT_MOD,
    VOCAB_TOP_K,
)

# one md5 per token (two independent 28-bit halves) + the WIDENED
# pair-of-integer-folds gram identity (r12: f1 * 2^31 + f2 — see
# corpus.GRAM_MULT2 for the collision bound) — the same folds
# functions/corpus.contam_gram_combine builds, written out by the
# same python loop so the dialects cannot drift
_contam_acc1 = "th[i]"
_contam_acc2 = "th2[i]"
for _o in range(1, CONTAM_K):
    _contam_acc1 = (
        f"(({_contam_acc1}) * {CONTAM_MULT} + th[i + {_o}]) % {CONTAM_P}"
    )
    _contam_acc2 = (
        f"(({_contam_acc2}) * {GRAM_MULT2} + th2[i + {_o}]) % {CONTAM_P}"
    )
_contam_acc = f"(({_contam_acc1}) * {GRAM_PACK} + ({_contam_acc2}))"
_CONTAM_GRAM = (
    f"list_transform(range(1, len(th) - {CONTAM_K - 2}), i -> {_contam_acc})"
)

# shared CTE prefix: per-doc gram-hash table + test-side gram set —
# used by both the contamination report and the decontaminate pass so
# the two oracles cannot drift from each other
_CONTAM_BASE = f"""t AS (
  SELECT doc_id,
         list_transform(dig,
           d -> CAST(('0x' || substr(d, 1, 7)) AS BIGINT)) AS th,
         list_transform(dig,
           d -> CAST(('0x' || substr(d, 8, 7)) AS BIGINT)) AS th2
  FROM (
    SELECT doc_id,
           list_transform(string_split(text, ' '), t -> md5(t)) AS dig
    FROM documents
  )
),
g AS (
  SELECT doc_id,
         CASE WHEN len(th) >= {CONTAM_K}
              THEN list_distinct({_CONTAM_GRAM})
              ELSE CAST([] AS BIGINT[]) END AS grams
  FROM t
),
test_g AS (
  SELECT DISTINCT unnest(grams) AS gram_h
  FROM g WHERE doc_id % {HOLDOUT_MOD} = 0
)"""

CONTAMINATION_SQL = f"""
WITH {_CONTAM_BASE},
train AS (
  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams,
         unnest(grams) AS gram_h
  FROM g WHERE doc_id % {HOLDOUT_MOD} <> 0
)
SELECT train.doc_id,
       max(train.n_grams) AS n_grams,
       count(DISTINCT train.gram_h) AS n_contam,
       (1000 * count(DISTINCT train.gram_h)) // max(train.n_grams)
         AS contam_permille
FROM train JOIN test_g USING (gram_h)
GROUP BY train.doc_id
"""

# Twin of q_decontaminate: the retained train docs — those sharing no
# gram with the held-out set (short docs have zero grams and survive)
DECONTAMINATE_SQL = f"""
WITH {_CONTAM_BASE},
train AS (
  SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams, grams
  FROM g WHERE doc_id % {HOLDOUT_MOD} <> 0
),
contam AS (
  SELECT DISTINCT e.doc_id
  FROM (SELECT doc_id, unnest(grams) AS gram_h FROM train) e
  JOIN test_g USING (gram_h)
)
SELECT doc_id, n_grams FROM train
WHERE doc_id NOT IN (SELECT doc_id FROM contam)
"""

VOCAB_TOPK_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
c AS (SELECT token, count(*) AS n_occurrences FROM tok GROUP BY token),
top AS (
  SELECT token, n_occurrences FROM c
  ORDER BY n_occurrences DESC, token LIMIT {VOCAB_TOP_K}
)
SELECT row_number() OVER (ORDER BY n_occurrences DESC, token) AS rank,
       token, n_occurrences
FROM top
"""

CORPUS_MIXTURE_SQL = """
WITH per_lang AS (
  SELECT lang, count(*) AS n_docs,
         CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       CAST((1000 * n_tokens) // (sum(n_tokens) OVER ()) AS BIGINT)
         AS token_share_permille
FROM per_lang
"""

from .functions.similarity import IVF_NPROBE  # noqa: E402

KNN_IVF_MULTIPROBE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm FROM e
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
),
assigned AS (
  SELECT vec_id, v, norm, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC, cent_id
         ) AS rn
  FROM e CROSS JOIN cent
),
cells AS (
  SELECT vec_id, v, norm, cent_id AS cell FROM assigned WHERE rn = 1
),
probes AS (
  SELECT vec_id, v, norm, cent_id AS cell FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM probes q JOIN cells c
    ON q.cell = c.cell AND q.vec_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id) AS BIGINT)
           AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM ranked WHERE rank <= {TOP_K}
"""

TOKEN_RARITY_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (SELECT token, count(*) AS tok_count FROM tok GROUP BY token)
SELECT tok.doc_id,
       count(*) AS n_tokens,
       min(freq.tok_count) AS min_tok_count,
       CAST(sum(freq.tok_count) // count(*) AS BIGINT) AS avg_tok_count
FROM tok JOIN freq USING (token)
GROUP BY tok.doc_id
"""


# Twin of q_semdedup_keep: recursive reachability over the embedding
# near-dup pairs (same min-label fixpoint as DEDUP_CLUSTERS_SQL), then
# the retained set = everything except non-canonical component members
SEMDEDUP_KEEP_SQL = f"""
WITH RECURSIVE pairs AS (
  {EMBEDDING_NEARDUP_SQL}
),
edges AS (
  SELECT vec_a AS doc_a, vec_b AS doc_b FROM pairs
  UNION ALL
  SELECT vec_b AS doc_a, vec_a AS doc_b FROM pairs
),
nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.doc_b, w.lab
  FROM walk w JOIN edges e ON w.node = e.doc_a
),
comp AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node),
dropped AS (SELECT node AS vec_id FROM comp WHERE node <> cluster_id)
SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings
WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
"""

from .functions.corpus import REBALANCE_CAP_64K  # noqa: E402

# Twin of q_mixture_rebalance: the keep rate is all-integer and the
# CAP_64K constant is imported from the Spark side, so the boundary
# arithmetic is shared to the bit
MIXTURE_REBALANCE_SQL = f"""
WITH base AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
per_lang AS (
  SELECT lang, sum(n_tok) AS lang_tokens FROM base GROUP BY lang
),
rates AS (
  SELECT lang,
         CAST(least(65536,
              ({REBALANCE_CAP_64K} * sum(lang_tokens) OVER ())
                // lang_tokens) AS BIGINT) AS rate_64k
  FROM per_lang
)
SELECT doc_id, lang, n_tok, rate_64k
FROM base JOIN rates USING (lang)
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)
      < rate_64k
"""

from .functions.corpus import KEYWORD_TOP_K  # noqa: E402

# Twin of q_keyword_topk: integer tf/df rarity score, row_number over
# (score DESC, token) per doc
KEYWORD_TOPK_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
),
dfq AS (
  SELECT token, count(*) AS df
  FROM (SELECT DISTINCT doc_id, token FROM tok) d
  GROUP BY token
),
s AS (
  SELECT doc_id, token, tf, df, (tf * 1000000) // df AS score
  FROM tf JOIN dfq USING (token)
)
SELECT doc_id, token, tf, df, score,
       CAST(row_number() OVER (
         PARTITION BY doc_id ORDER BY score DESC, token) AS BIGINT) AS rank
FROM s
QUALIFY rank <= {KEYWORD_TOP_K}
"""

# Twin of q_inverted_index: sorted distinct posting list, comma-joined
INVERTED_INDEX_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS df,
       array_to_string(
         list_transform(list_sort(list_distinct(list(doc_id))),
                        d -> CAST(d AS VARCHAR)), ',') AS postings
FROM tok GROUP BY token
"""


# Twin of q_curation_funnel: the same staged flags, one filtered
# aggregate, four literal rows
CURATION_FUNNEL_SQL = f"""
WITH {_CONTAM_BASE},
contam AS (
  SELECT DISTINCT e.doc_id
  FROM (SELECT doc_id, unnest(grams) AS gram_h FROM g
        WHERE doc_id % {HOLDOUT_MOD} <> 0) e
  JOIN test_g USING (gram_h)
),
stats AS (
  SELECT doc_id, fp, n_tokens AS n_tok, CAST({_Q} AS BIGINT) AS score
  FROM (
    SELECT doc_id, md5(text) AS fp,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
             AS n_stopwords,
           CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
             AS tok_chars
    FROM (SELECT doc_id, text, string_split(text, ' ') AS tk
          FROM documents WHERE doc_id % {HOLDOUT_MOD} <> 0) t0
  ) t1
),
canon AS (
  SELECT fp, min(doc_id) AS canon_id FROM stats
  WHERE score >= 500 GROUP BY fp
),
flags AS (
  SELECT s.n_tok,
         s.score >= 500 AS q_ok,
         (s.score >= 500 AND s.doc_id = c.canon_id) AS d_ok,
         (s.score >= 500 AND s.doc_id = c.canon_id
          AND s.doc_id NOT IN (SELECT doc_id FROM contam)) AS c_ok
  FROM stats s LEFT JOIN canon c USING (fp)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n0, CAST(sum(n_tok) AS BIGINT) AS t0,
         CAST(count(*) FILTER (q_ok) AS BIGINT) AS n1,
         CAST(coalesce(sum(n_tok) FILTER (q_ok), 0) AS BIGINT) AS t1,
         CAST(count(*) FILTER (d_ok) AS BIGINT) AS n2,
         CAST(coalesce(sum(n_tok) FILTER (d_ok), 0) AS BIGINT) AS t2,
         CAST(count(*) FILTER (c_ok) AS BIGINT) AS n3,
         CAST(coalesce(sum(n_tok) FILTER (c_ok), 0) AS BIGINT) AS t3
  FROM flags
)
SELECT '0_total' AS stage, n0 AS n_docs, t0 AS n_tokens FROM agg
UNION ALL SELECT '1_quality', n1, t1 FROM agg
UNION ALL SELECT '2_dedup', n2, t2 FROM agg
UNION ALL SELECT '3_decontaminated', n3, t3 FROM agg
"""


# Twin of q_dedup_keep: the same recursive component fixpoint as
# DEDUP_CLUSTERS_SQL, then documents minus non-canonical members
DEDUP_KEEP_SQL = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_MINHASH_LSH_SQL}
),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
),
nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.doc_b, w.lab
  FROM walk w JOIN edges e ON w.node = e.doc_a
),
comp AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node),
dropped AS (SELECT node AS doc_id FROM comp WHERE node <> cluster_id)
SELECT doc_id, lang FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


# Twin of q_dedup_keep_best: the same recursive component CTE, the
# same exact-integer composite quality score (QUALITY_EXPR_T with
# DuckDB's // division), winner per cluster by
# (quality_score DESC, doc_id) — replayed entirely in SQL so the
# hash match proves both the clustering and the winner rule.
DEDUP_KEEP_BEST_SQL = f"""
WITH RECURSIVE pairs AS (
  {DEDUP_MINHASH_LSH_SQL}
),
edges AS (
  SELECT doc_a, doc_b FROM pairs
  UNION ALL
  SELECT doc_b AS doc_a, doc_a AS doc_b FROM pairs
),
nodes AS (SELECT DISTINCT doc_a AS node FROM edges),
walk(node, lab) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.doc_b, w.lab
  FROM walk w JOIN edges e ON w.node = e.doc_a
),
comp AS (SELECT node, min(lab) AS cluster_id FROM walk GROUP BY node),
scored AS (
  SELECT doc_id, lang, CAST({_Q} AS BIGINT) AS quality_score
  FROM (
    SELECT doc_id, lang,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
             AS n_stopwords,
           CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
             AS tok_chars
    FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS tk
          FROM documents) t0
  ) t1
),
ranked AS (
  SELECT s.doc_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY s.quality_score DESC, s.doc_id)
           AS rn
  FROM scored s JOIN comp c ON s.doc_id = c.node
),
dropped AS (SELECT doc_id FROM ranked WHERE rn > 1)
SELECT doc_id, lang, quality_score FROM scored
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
"""


# Twin of q_embedding_quantize: identical IEEE expression tree,
# floor quantization, integer micro-unit scale
# Twin of q_dsir_weights: same hashed-bucket counts over the shared
# contamination gram CTE, same length(bin(x)) integer log
from .functions.corpus import DSIR_BUCKETS  # noqa: E402

DSIR_WEIGHTS_SQL = f"""
WITH {_CONTAM_BASE},
ex AS (
  SELECT doc_id, unnest(grams) % {DSIR_BUCKETS} AS bucket FROM g
),
stats AS (
  SELECT bucket,
         CAST(sum(CASE WHEN doc_id % {HOLDOUT_MOD} = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tgt_n,
         CAST(sum(CASE WHEN doc_id % {HOLDOUT_MOD} <> 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS raw_n
  FROM ex GROUP BY bucket
),
per_doc AS (
  SELECT e.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CAST(length(bin(s.tgt_n + 1)) AS BIGINT)
                  - CAST(length(bin(s.raw_n + 1)) AS BIGINT)) AS BIGINT)
           AS weight_bits
  FROM ex e JOIN stats s USING (bucket)
  WHERE e.doc_id % {HOLDOUT_MOD} <> 0
  GROUP BY e.doc_id
)
SELECT doc_id, n_grams, weight_bits,
       (1000 * weight_bits) // n_grams AS per_gram_milli
FROM per_doc
"""

from .functions.corpus import (  # noqa: E402
    DSIR_CENTER_MILLI,
    DSIR_SLOPE,
)

# Twin of q_dsir_resample: DSIR_WEIGHTS_SQL's per-doc table + the
# clamped linear rate map + the md5(doc_id) 12-hex uniform draw
_DSIR_RATE = (
    f"LEAST(1000, GREATEST(0, 1000 + (per_gram_milli"
    f" - ({DSIR_CENTER_MILLI})) * {DSIR_SLOPE}))"
)
_DSIR_DRAW = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))"
    " AS BIGINT) % 1000"
)

DSIR_RESAMPLE_SQL = f"""
SELECT doc_id, per_gram_milli,
       CAST({_DSIR_RATE} AS BIGINT) AS rate_permille,
       CAST({_DSIR_DRAW} AS BIGINT) AS hash_permille,
       ({_DSIR_DRAW}) < ({_DSIR_RATE}) AS kept
FROM ({DSIR_WEIGHTS_SQL})
"""

# Twin of q_dsir_mixture_shift: per-source raw/kept/target token
# shares + the toward-target delta
DSIR_MIXTURE_SHIFT_SQL = f"""
WITH kept AS (
  SELECT doc_id FROM ({DSIR_RESAMPLE_SQL}) WHERE kept
),
d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         doc_id % {HOLDOUT_MOD} = 0 AS t,
         doc_id IN (SELECT doc_id FROM kept) AS k
  FROM documents
),
per AS (
  SELECT source,
         CAST(sum(CASE WHEN NOT t THEN n_tok ELSE 0 END) AS BIGINT)
           AS train_tokens,
         CAST(sum(CASE WHEN k THEN n_tok ELSE 0 END) AS BIGINT)
           AS kept_tokens,
         CAST(sum(CASE WHEN t THEN n_tok ELSE 0 END) AS BIGINT)
           AS target_tokens
  FROM d GROUP BY source
),
shares AS (
  SELECT source, train_tokens, kept_tokens, target_tokens,
         CASE WHEN sum(train_tokens) OVER () > 0
              THEN (1000 * train_tokens)
                   // CAST(sum(train_tokens) OVER () AS BIGINT)
              ELSE 0 END AS train_permille,
         CASE WHEN sum(kept_tokens) OVER () > 0
              THEN (1000 * kept_tokens)
                   // CAST(sum(kept_tokens) OVER () AS BIGINT)
              ELSE 0 END AS kept_permille,
         CASE WHEN sum(target_tokens) OVER () > 0
              THEN (1000 * target_tokens)
                   // CAST(sum(target_tokens) OVER () AS BIGINT)
              ELSE 0 END AS target_permille
  FROM per
)
SELECT source, train_tokens, kept_tokens, target_tokens,
       train_permille, kept_permille, target_permille,
       CAST(abs(train_permille - target_permille)
            - abs(kept_permille - target_permille) AS BIGINT)
         AS shift_permille
FROM shares
"""


# Twin of q_importance_resampling: QUALITY_SCORE_SQL's stats subquery
# + the md5-12-hex-chars uniform draw, strict < verdict
IMPORTANCE_RESAMPLING_SQL = f"""
SELECT doc_id,
       CAST({_Q} AS BIGINT) AS score_permille,
       CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) % 1000
         AS hash_permille,
       (CAST(('0x' || substr(md5(text), 1, 12)) AS BIGINT) % 1000)
         < CAST({_Q} AS BIGINT) AS kept
FROM (
  SELECT doc_id, text,
         CAST(length(text) AS BIGINT) AS len_chars,
         CAST(len(tk) AS BIGINT) AS n_tokens,
         CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
         CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
           AS n_stopwords,
         CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
           AS tok_chars
  FROM (SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents) t0
) t1
"""

from .functions.similarity import (  # noqa: E402
    PQ_CONVERGE_PERMILLE,
    PQ_K,
    PQ_M,
    PQ_MICRO,
    PQ_SUB,
    PQ_TRAIN_CAP,
    REFINE_K,
)

# Shared trained-PQ CTE chain: the same deterministic fixed-point
# Lloyd rounds the Spark trainer runs (functions/similarity.py
# _pq_seed/_pq_assign/_pq_centroids), unrolled to the PQ_TRAIN_CAP
# ceiling — micro table from the UNFILTERED embeddings scan (ADVICE
# r8: a zero-norm vector inside the seed range must seed its cell),
# seed = designated vectors, per-round integer-mean update with empty
# cells carried forward (LEFT JOIN + coalesce) — plus the
# CONVERGENCE-CHOSEN shipped round (r10): the `ship` CTE replays
# _pq_ship_round's multiplicative integer stop rule over the per-round
# distortion totals, and `pcodes`/`cvd` read the assignment/centroids
# of exactly that round, so both engines ship the identical codebook
# at any data. Static SQL must materialize all CAP+1 assignments even
# when training stops early; the Spark side computes only K+1.
_PQ_ASSIGN = """
  SELECT vec_id, m, j, dist_sq FROM (
    SELECT vec_id, m, j, dist_sq,
           row_number() OVER (PARTITION BY vec_id, m
                              ORDER BY dist_sq, j) AS rn
    FROM (
      SELECT px.vec_id, px.m, c.j,
             CAST(sum((px.xm - c.cm) * (px.xm - c.cm)) AS BIGINT)
               AS dist_sq
      FROM {px} px JOIN {cent} c ON px.m = c.m AND px.d = c.d
      GROUP BY px.vec_id, px.m, c.j
    )
  ) WHERE rn = 1
"""

_PQ_UPDATE = """
  SELECT c.m, c.j, c.d, coalesce(n.cm, c.cm) AS cm
  FROM {prev} c LEFT JOIN (
    SELECT a.m, a.j, e.d,
           CAST(sum(e.xm) AS BIGINT) // count(*) AS cm
    FROM {assign} a JOIN {px} e ON e.vec_id = a.vec_id AND e.m = a.m
    GROUP BY a.m, a.j, e.d
  ) n ON n.m = c.m AND n.j = c.j AND n.d = c.d
"""

def _pq_ctes() -> str:
    """The unrolled trainer chain + convergence selection (see the
    block comment above): pa1..pa{CAP+1}, pc1..pc{CAP}, the per-round
    distortion table `tds`, the shipped-round scalar `ship`, the
    round-tagged unions `pa_all`/`pc_all`, and the shipped code table
    `pcodes`."""
    parts = [
        f"""px AS MATERIALIZED (
  SELECT vec_id, CAST(u.dim // {PQ_SUB} AS BIGINT) AS m,
         CAST(u.dim % {PQ_SUB} AS BIGINT) AS d, u.xm AS xm FROM (
    SELECT vec_id,
           unnest(list_transform(range(1, len(embedding) + 1),
             i -> struct_pack(dim := i - 1,
                  xm := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                   * {PQ_MICRO}) AS BIGINT)))) AS u
    FROM embeddings
  )
)""",
        f"""pc0 AS (
  SELECT m, CAST(vec_id - {N_QUERIES} AS BIGINT) AS j, d, xm AS cm
  FROM px WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}
)""",
    ]
    for r in range(1, PQ_TRAIN_CAP + 2):
        parts.append(
            f"pa{r} AS MATERIALIZED "
            f"({_PQ_ASSIGN.format(px='px', cent=f'pc{r - 1}')})"
        )
        if r <= PQ_TRAIN_CAP:
            parts.append(
                f"pc{r} AS MATERIALIZED "
                f"({_PQ_UPDATE.format(px='px', prev=f'pc{r - 1}', assign=f'pa{r}')})"
            )
    parts.append(
        "tds AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS k,"
            f" (SELECT CAST(sum(dist_sq) AS BIGINT) FROM pa{r}) AS td,"
            f" (SELECT CAST(count(*) AS BIGINT) FROM pa{r}) AS n"
            for r in range(1, PQ_TRAIN_CAP + 2)
        )
        + "\n)"
    )
    # _pq_ship_round's exact integer stop rule: first update k whose
    # improvement (td_k - td_{k+1}) * 1000 < td_k * thresh (or a
    # fully-converged td_k = 0), else the cap — multiplicative form,
    # no division, so every engine agrees bit-for-bit
    parts.append(
        f"""ship AS (
  SELECT coalesce(min(a.k), CAST({PQ_TRAIN_CAP} AS BIGINT)) AS r
  FROM tds a JOIN tds b ON b.k = a.k + 1
  WHERE a.td = 0
     OR (a.td - b.td) * 1000 < a.td * {PQ_CONVERGE_PERMILLE}
)"""
    )
    parts.append(
        "pa_all AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS r, vec_id, m, j, dist_sq"
            f" FROM pa{r}"
            for r in range(1, PQ_TRAIN_CAP + 2)
        )
        + "\n)"
    )
    parts.append(
        "pc_all AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS r, m, j, d, cm FROM pc{r}"
            for r in range(0, PQ_TRAIN_CAP + 1)
        )
        + "\n)"
    )
    codes_cols = ", ".join(
        f"CAST(max(CASE WHEN m = {m} THEN j END) AS BIGINT) AS code_{m}"
        for m in range(PQ_M)
    )
    parts.append(
        f"""pcodes AS MATERIALIZED (
  SELECT vec_id, {codes_cols}
  FROM pa_all WHERE r = (SELECT r + 1 FROM ship) GROUP BY vec_id
)"""
    )
    return ",\n".join(parts)


_PQ_CTES = _pq_ctes()

# Twin of q_pq_quantize: trained codebook (2 unrolled Lloyd rounds),
# exact-integer squared-L2 coding, same (dist, j) tie-break
PQ_QUANTIZE_SQL = f"""
WITH {_PQ_CTES}
SELECT vec_id, {", ".join(f"code_{m}" for m in range(PQ_M))},
       CAST({"".join("(" for _ in range(PQ_M - 1))}code_0
            {"".join(f") * {PQ_K} + code_{m}" for m in range(1, PQ_M))}
            AS BIGINT) AS pq_code
FROM pcodes
"""


# Twin of q_pq_train_round: the SHIPPED round's member counts and
# integer centroid displacement |pc_K - pc_{K-1}| per cell, K from
# the shared `ship` convergence CTE
PQ_TRAIN_ROUND_SQL = f"""
WITH {_PQ_CTES},
memb AS (
  SELECT m, j, CAST(count(*) AS BIGINT) AS n_members
  FROM pa_all WHERE r = (SELECT r FROM ship) GROUP BY m, j
),
shift AS (
  SELECT c2.m, c2.j,
         CAST(sum(abs(c2.cm - c1.cm)) AS BIGINT) AS shift_micro_sum
  FROM (SELECT * FROM pc_all WHERE r = (SELECT r FROM ship)) c2
  JOIN (SELECT * FROM pc_all WHERE r = (SELECT r - 1 FROM ship)) c1
    ON c1.m = c2.m AND c1.j = c2.j AND c1.d = c2.d
  GROUP BY c2.m, c2.j
)
SELECT s.m, s.j,
       CAST(coalesce(mb.n_members, 0) AS BIGINT) AS n_members,
       s.shift_micro_sum
FROM shift s LEFT JOIN memb mb ON mb.m = s.m AND mb.j = s.j
"""


# Twin of q_pq_train_trace: the per-round distortion table the stop
# rule consumed — exactly rounds 1..K+1 (the K+1 row scores the
# shipped codebook), K from the shared `ship` CTE
PQ_TRAIN_TRACE_SQL = f"""
WITH {_PQ_CTES}
SELECT k AS round, td AS total_dist_sq, n AS n_assignments
FROM tds WHERE k <= (SELECT r + 1 FROM ship)
"""


# Shared ADC CTEs: the trained reconstruction codebook as DOUBLE
# lists (micro ints / 1e6 — exact in both engines), the norm-filtered
# vector view, and the per-query 128-entry LUT (list_dot_product is
# the sequential fold the Spark transform lambdas match).
_PQ_ADC_CTES = f"""codes AS (SELECT * FROM pcodes),
cvd AS (
  SELECT m, j,
         list(CAST(cm AS DOUBLE) / {PQ_MICRO}.0 ORDER BY d) AS cv
  FROM pc_all WHERE r = (SELECT r FROM ship) GROUP BY m, j
),
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
)"""

# Twin of q_ann_pq_recall: trained codebook reconstructions (micro
# ints / 1e6 — exact doubles), same ADC lookup-table scoring with
# fixed-order sums (explicit LUT joins, never a float aggregation),
# same (cos_hat DESC, neighbor) ranking, exact side = the brute-force
# cosine top-k
ANN_PQ_RECALL_SQL = f"""
WITH {_PQ_CTES},
{_PQ_ADC_CTES},
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.m, c.j,
         list_dot_product(
           q.v[CAST(c.m*{PQ_SUB}+1 AS INT)
               : CAST(c.m*{PQ_SUB}+{PQ_SUB} AS INT)],
           c.cv
         ) AS d,
         list_dot_product(c.cv, c.cv) AS cn2
  FROM e q, cvd c
  WHERE q.vec_id < {N_QUERIES}
),
scored AS (
  SELECT qn.vec_id AS query_id, x.vec_id AS neighbor_id,
         CASE WHEN ({" + ".join(f"l{m}.cn2" for m in range(PQ_M))}) > 0
              THEN ({" + ".join(f"l{m}.d" for m in range(PQ_M))})
                   / (qn.norm * sqrt(
                        {" + ".join(f"l{m}.cn2" for m in range(PQ_M))}))
              ELSE -2.0 END AS cos_hat
  FROM (SELECT vec_id, norm FROM e WHERE vec_id < {N_QUERIES}) qn
  JOIN e x ON x.vec_id <> qn.vec_id
  JOIN codes k ON k.vec_id = x.vec_id
  {" ".join(
    f"JOIN lut l{m} ON l{m}.query_id = qn.vec_id AND l{m}.m = {m}"
    f" AND l{m}.j = k.code_{m}" for m in range(PQ_M)
  )}
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM scored
  ) r WHERE rn <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT bf.query_id, count(*) AS n_hits
  FROM bf JOIN approx USING (query_id, neighbor_id)
  GROUP BY bf.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT)) // {TOP_K}
         AS recall_permille
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN hits h USING (query_id)
"""


# Twin of q_ann_cell_balance: same cell assignment as the IVF twins,
# one GROUP BY cell + window totals
ANN_CELL_BALANCE_SQL = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm FROM e
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
),
assigned AS (
  SELECT vec_id, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC, cent_id
         ) AS rn
  FROM e CROSS JOIN cent
),
per AS (
  SELECT cent_id AS cell_id, CAST(count(*) AS BIGINT) AS n_vectors
  FROM assigned WHERE rn = 1 GROUP BY cent_id
)
SELECT cell_id, n_vectors,
       (1000 * n_vectors) // CAST(sum(n_vectors) OVER () AS BIGINT)
         AS share_permille,
       (1000 * n_vectors * {N_CELLS})
         // CAST(sum(n_vectors) OVER () AS BIGINT) AS load_permille
FROM per
"""


# Twin of q_vocab_coverage: the vocab head (VOCAB_TOPK's order/limit)
# marked into the tf table, per-lang mass + OOV permille
VOCAB_COVERAGE_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, token
),
freq AS (
  SELECT token, CAST(sum(tf) AS BIGINT) AS n FROM tf GROUP BY token
),
vocab AS (
  SELECT token FROM freq ORDER BY n DESC, token LIMIT {VOCAB_TOP_K}
),
j AS (
  SELECT d.lang, tf.tf,
         tf.token IN (SELECT token FROM vocab) AS inv
  FROM tf JOIN documents d USING (doc_id)
)
SELECT lang, CAST(sum(tf) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN inv THEN tf ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       (1000 * (CAST(sum(tf) AS BIGINT)
                - CAST(sum(CASE WHEN inv THEN tf ELSE 0 END) AS BIGINT)))
         // CAST(sum(tf) AS BIGINT) AS oov_permille
FROM j GROUP BY lang
"""


# Shared IVFADC ROUTING prefix (through `cells`): PQ artifacts + ADC
# LUTs + the IVF cell assignment — consumed by the nprobe-pinned
# scored chain below AND the probe-curve twin (which sweeps nprobe)
_IVFPQ_ROUTE_CTES = f"""{_PQ_CTES},
{_PQ_ADC_CTES},
lut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.m, c.j,
         list_dot_product(
           q.v[CAST(c.m*{PQ_SUB}+1 AS INT)
               : CAST(c.m*{PQ_SUB}+{PQ_SUB} AS INT)],
           c.cv
         ) AS d,
         list_dot_product(c.cv, c.cv) AS cn2
  FROM e q, cvd c
  WHERE q.vec_id < {N_QUERIES}
),
cent AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm FROM e
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
),
assigned AS (
  SELECT vec_id, norm, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC, cent_id
         ) AS rn
  FROM e CROSS JOIN cent
),
cells AS (
  SELECT vec_id, cent_id AS cell FROM assigned WHERE rn = 1
)"""

# the ADC score expression shared by the pinned chain and the sweep
_ADC_COS_HAT_EXPR = f"""CASE
         WHEN ({" + ".join(f"l{m}.cn2" for m in range(PQ_M))}) > 0
              THEN ({" + ".join(f"l{m}.d" for m in range(PQ_M))})
                   / (p.norm * sqrt(
                        {" + ".join(f"l{m}.cn2" for m in range(PQ_M))}))
              ELSE -2.0 END"""

_ADC_LUT_JOINS = " ".join(
    f"JOIN lut l{m} ON l{m}.query_id = p.vec_id AND l{m}.m = {m}"
    f" AND l{m}.j = k.code_{m}"
    for m in range(PQ_M)
)

# Shared IVFADC scored-candidate CTE chain (through `scored`): the
# routing prefix + probes at the serving default IVF_NPROBE + ADC
# scoring from codes via the shared LUT joins — consumed by the
# ADC-ranked serve twin, the refine twin, and the refine recall twin
_IVFPQ_SCORED_CTES = f"""{_IVFPQ_ROUTE_CTES},
probes AS (
  SELECT vec_id, norm, cent_id AS cell FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
scored AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM probes p
  JOIN cells c ON p.cell = c.cell AND p.vec_id <> c.vec_id
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
)"""

# Twin of q_ann_ivfpq: ADC-ranked top-k over the shared scored chain;
# floor(cos_hat * 10000) is exact on identical doubles
ANN_IVFPQ_SQL = f"""
WITH {_IVFPQ_SCORED_CTES},
ranked AS (
  SELECT query_id, neighbor_id, cos_hat,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos_hat DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos_hat * 10000) AS BIGINT) AS adc_permyriad
FROM ranked WHERE rank <= {TOP_K}
"""

# Refined serve-path CTE tail: ADC shortlist of REFINE_K, exact
# cosine over ONLY those candidates, re-rank — shared by the refined
# twin and its recall twin
_IVFPQ_REFINED_CTES = f"""{_IVFPQ_SCORED_CTES},
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {REFINE_K}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM short s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
refined AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM exact
)"""

# Twin of q_ann_ivfpq_refined: the exact re-rank of the ADC shortlist
ANN_IVFPQ_REFINED_SQL = f"""
WITH {_IVFPQ_REFINED_CTES}
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM refined WHERE rank <= {TOP_K}
"""

# Twin of q_ann_refine_curve: recall@TOP_K vs shortlist size k' —
# the max-k' shortlist exact-scored once (adc_rank retained), each
# swept k' a filter + per-(k', query) re-rank on those bounded rows
from .functions.similarity import REFINE_CURVE_KS  # noqa: E402

ANN_REFINE_CURVE_SQL = f"""
WITH {_IVFPQ_SCORED_CTES},
shortr AS (
  SELECT query_id, neighbor_id, rn AS adc_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {REFINE_K}
),
exact AS (
  SELECT s.query_id, s.neighbor_id, s.adc_rank,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM shortr s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
ks AS (
  SELECT CAST(k AS BIGINT) AS k_refine
  FROM (VALUES {", ".join(f"({k})" for k in REFINE_CURVE_KS)}) t(k)
),
curanked AS (
  SELECT k.k_refine, x.query_id, x.neighbor_id,
         row_number() OVER (PARTITION BY k.k_refine, x.query_id
                            ORDER BY x.cos DESC, x.neighbor_id) AS rank
  FROM exact x JOIN ks k ON x.adc_rank <= k.k_refine
),
approx AS (
  SELECT k_refine, query_id, neighbor_id FROM curanked
  WHERE rank <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT a.k_refine, CAST(count(*) AS BIGINT) AS n_hits
  FROM approx a JOIN bf USING (query_id, neighbor_id)
  GROUP BY a.k_refine
),
nq AS (
  SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM bf
)
SELECT k.k_refine,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT))
         // (nq.n * {TOP_K}) AS recall_permille
FROM ks k LEFT JOIN hits h USING (k_refine), nq
"""


# Twin of q_ann_ivfpq_spill: the refined serve chain over a
# SPILL_ASSIGN-way multi-assignment index — cells at rn <= SPILL,
# byte-identical duplicate rows removed with DISTINCT before ranking
from .functions.similarity import SPILL_ASSIGN  # noqa: E402

ANN_IVFPQ_SPILL_SQL = f"""
WITH {_IVFPQ_ROUTE_CTES},
cells2 AS (
  SELECT vec_id, cent_id AS cell FROM assigned
  WHERE rn <= {SPILL_ASSIGN}
),
probes AS (
  SELECT vec_id, norm, cent_id AS cell FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
scored AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM probes p
  JOIN cells2 c ON p.cell = c.cell AND p.vec_id <> c.vec_id
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM scored
  ) WHERE rn <= {REFINE_K}
),
exact AS (
  SELECT s.query_id, s.neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM short s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
refined AS (
  SELECT query_id, neighbor_id, cos,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY cos DESC, neighbor_id)
              AS BIGINT) AS rank
  FROM exact
)
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM refined WHERE rank <= {TOP_K}
"""


# ------------------------------------------------------------------
# RESIDUAL PQ twins (classic IVFADC): the unrolled Lloyd chain rerun
# on HOME-CELL RESIDUALS rpx = px - centroid(px) (LEFT JOIN +
# coalesce(0) keeps zero-norm vectors total, matching _pqr_micro),
# per-(vec, assigned-cell) residual coding rpcodes over the spills
# table, and per-(query, cell) ADC LUTs rlut built from COMBINED
# integer-micro reconstructions (centroid folded into the codebook
# before the /1e6 division, so both engines divide identical ints —
# see similarity._pqr_cellbooks).


def _pqr_ctes(
    include_base: bool,
    include_px: bool | None = None,
    trainer_only: bool = False,
) -> str:
    """The residual trainer + coder + LUT CTE chain (all names
    r-prefixed so it composes with the raw chain in one query).
    include_base=True emits its own e/cent/assigned/cells (+ px,
    unless include_px=False because a raw chain like _PQ_CTES
    already defines px); False assumes a raw chain (e.g.
    _IVFPQ_SCORED_CTES) already defined all of them. trainer_only
    stops after the convergence selection (rtds/rship) — for
    consumers that need the residual TRAINER but not the coder/LUT
    serve chain (the diagnosis twin)."""
    if include_px is None:
        include_px = include_base
    parts = []
    if include_base:
        parts.append(
            f"""e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
)"""
        )
        parts.append(
            f"""cent AS (
  SELECT vec_id AS cent_id, v AS cv, norm AS cnorm FROM e
  WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + N_CELLS}
)"""
        )
        parts.append(
            """assigned AS (
  SELECT vec_id, norm, cent_id,
         row_number() OVER (
           PARTITION BY vec_id
           ORDER BY list_dot_product(v, cv) / (norm * cnorm) DESC, cent_id
         ) AS rn
  FROM e CROSS JOIN cent
)"""
        )
        parts.append(
            """cells AS (
  SELECT vec_id, cent_id AS cell FROM assigned WHERE rn = 1
)"""
        )
        if include_px:
            parts.append(
                f"""px AS MATERIALIZED (
  SELECT vec_id, CAST(u.dim // {PQ_SUB} AS BIGINT) AS m,
         CAST(u.dim % {PQ_SUB} AS BIGINT) AS d, u.xm AS xm FROM (
    SELECT vec_id,
           unnest(list_transform(range(1, len(embedding) + 1),
             i -> struct_pack(dim := i - 1,
                  xm := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                   * {PQ_MICRO}) AS BIGINT)))) AS u
    FROM embeddings
  )
)"""
            )
    if not trainer_only:
        parts.append(
            f"""spills AS (
  SELECT vec_id, cent_id AS cell, CAST(rn AS BIGINT) AS assign_rn
  FROM assigned WHERE rn <= {SPILL_ASSIGN}
)"""
        )
    parts.append(
        """rpx AS MATERIALIZED (
  SELECT p.vec_id, p.m, p.d, p.xm - coalesce(cx.xm, 0) AS xm
  FROM px p
  LEFT JOIN cells cl ON cl.vec_id = p.vec_id
  LEFT JOIN px cx ON cx.vec_id = cl.cell AND cx.m = p.m AND cx.d = p.d
)"""
    )
    parts.append(
        f"""rpc0 AS (
  SELECT m, CAST(vec_id - {N_QUERIES} AS BIGINT) AS j, d, xm AS cm
  FROM rpx WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}
)"""
    )
    for r in range(1, PQ_TRAIN_CAP + 2):
        parts.append(
            f"rpa{r} AS MATERIALIZED "
            f"({_PQ_ASSIGN.format(px='rpx', cent=f'rpc{r - 1}')})"
        )
        if r <= PQ_TRAIN_CAP:
            parts.append(
                f"rpc{r} AS MATERIALIZED ("
                + _PQ_UPDATE.format(
                    px="rpx", prev=f"rpc{r - 1}", assign=f"rpa{r}"
                )
                + ")"
            )
    parts.append(
        "rtds AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS k,"
            f" (SELECT CAST(sum(dist_sq) AS BIGINT) FROM rpa{r}) AS td"
            for r in range(1, PQ_TRAIN_CAP + 2)
        )
        + "\n)"
    )
    parts.append(
        f"""rship AS (
  SELECT coalesce(min(a.k), CAST({PQ_TRAIN_CAP} AS BIGINT)) AS r
  FROM rtds a JOIN rtds b ON b.k = a.k + 1
  WHERE a.td = 0
     OR (a.td - b.td) * 1000 < a.td * {PQ_CONVERGE_PERMILLE}
)"""
    )
    if trainer_only:
        return ",\n".join(parts)
    parts.append(
        "rpc_all AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS r, m, j, d, cm FROM rpc{r}"
            for r in range(0, PQ_TRAIN_CAP + 1)
        )
        + "\n)"
    )
    parts.append(
        """rshipc AS MATERIALIZED (
  SELECT m, j, d, cm FROM rpc_all WHERE r = (SELECT r FROM rship)
)"""
    )
    parts.append(
        """rspx AS MATERIALIZED (
  SELECT s.vec_id, s.cell, s.assign_rn, p.m, p.d, p.xm - cx.xm AS xm
  FROM px p
  JOIN spills s ON s.vec_id = p.vec_id
  JOIN px cx ON cx.vec_id = s.cell AND cx.m = p.m AND cx.d = p.d
)"""
    )
    codes_cols = ", ".join(
        f"CAST(max(CASE WHEN m = {m} THEN j END) AS BIGINT) AS code_{m}"
        for m in range(PQ_M)
    )
    parts.append(
        f"""rpcodes AS MATERIALIZED (
  SELECT vec_id, cell, assign_rn, {codes_cols}
  FROM (
    SELECT vec_id, cell, assign_rn, m, j,
           row_number() OVER (PARTITION BY vec_id, cell, m
                              ORDER BY dist_sq, j) AS rn
    FROM (
      SELECT r.vec_id, r.cell, r.assign_rn, r.m, c.j,
             CAST(sum((r.xm - c.cm) * (r.xm - c.cm)) AS BIGINT)
               AS dist_sq
      FROM rspx r JOIN rshipc c ON r.m = c.m AND r.d = c.d
      GROUP BY r.vec_id, r.cell, r.assign_rn, r.m, c.j
    )
  ) WHERE rn = 1
  GROUP BY vec_id, cell, assign_rn
)"""
    )
    parts.append(
        f"""rcvd AS MATERIALIZED (
  SELECT cx.vec_id AS cell, c.m, c.j,
         list(CAST(cx.xm + c.cm AS DOUBLE) / {PQ_MICRO}.0
              ORDER BY c.d) AS cv
  FROM rshipc c
  JOIN px cx ON cx.m = c.m AND cx.d = c.d
  WHERE cx.vec_id >= {N_QUERIES} AND cx.vec_id < {N_QUERIES + N_CELLS}
  GROUP BY cx.vec_id, c.m, c.j
)"""
    )
    parts.append(
        f"""rlut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cell, c.m, c.j,
         list_dot_product(
           q.v[CAST(c.m*{PQ_SUB}+1 AS INT)
               : CAST(c.m*{PQ_SUB}+{PQ_SUB} AS INT)],
           c.cv
         ) AS d,
         list_dot_product(c.cv, c.cv) AS cn2
  FROM e q, rcvd c
  WHERE q.vec_id < {N_QUERIES}
)"""
    )
    return ",\n".join(parts)


# the residual cos_hat over the cell-keyed LUT joins
_RES_COS_HAT_EXPR = f"""CASE
         WHEN ({" + ".join(f"l{m}.cn2" for m in range(PQ_M))}) > 0
              THEN ({" + ".join(f"l{m}.d" for m in range(PQ_M))})
                   / (p.norm * sqrt(
                        {" + ".join(f"l{m}.cn2" for m in range(PQ_M))}))
              ELSE -2.0 END"""

def _res_lut_joins(lut: str) -> str:
    """The PQ_M cell-keyed LUT joins of a residual ADC score, against
    an arbitrary (query, cell)-keyed LUT CTE."""
    return " ".join(
        f"JOIN {lut} l{m} ON l{m}.query_id = p.vec_id"
        f" AND l{m}.cell = k.cell"
        f" AND l{m}.m = {m} AND l{m}.j = k.code_{m}"
        for m in range(PQ_M)
    )


def _res_scored_sql(
    spill: int,
    name: str,
    probes: str = "probes",
    codes: str = "rpcodes",
    lut: str = "rlut",
) -> str:
    """The residual ADC candidate CTE at assignment multiplicity
    `spill` (needs the named probes/codes/lut CTEs in scope —
    defaults are the member-vector family's; the k-means twins pass
    kprobes/kpcodes/klut). spill > 1 rows are NOT byte-identical
    (codes differ per cell) — dedupe keeps the best reconstruction
    per (query, neighbor), matching Spark's groupBy/max."""
    base = f"""
  SELECT p.vec_id AS query_id, k.vec_id AS neighbor_id,
         {_RES_COS_HAT_EXPR} AS cos_hat
  FROM {probes} p
  JOIN {codes} k ON k.cell = p.cell AND k.vec_id <> p.vec_id
                AND k.assign_rn <= {spill}
  {_res_lut_joins(lut)}"""
    if spill == 1:
        return f"{name} AS ({base})"
    return (
        f"{name} AS (\n  SELECT query_id, neighbor_id,"
        f" max(cos_hat) AS cos_hat FROM ({base}\n  )"
        f" GROUP BY query_id, neighbor_id\n)"
    )


def _refine_topk_sql(scored: str, prefix: str) -> str:
    """ADC shortlist -> candidates-only exact re-rank -> top-k pair
    CTEs ({prefix}short, {prefix}topk) over a scored CTE."""
    return f"""{prefix}short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM {scored}
  ) WHERE rn <= {REFINE_K}
),
{prefix}topk AS (
  SELECT query_id, neighbor_id, rank, cos FROM (
    SELECT s.query_id, s.neighbor_id,
           list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos,
           CAST(row_number() OVER (PARTITION BY s.query_id
             ORDER BY list_dot_product(q.v, c.v) / (q.norm * c.norm)
                      DESC, s.neighbor_id) AS BIGINT) AS rank
    FROM {prefix}short s
    JOIN e q ON q.vec_id = s.query_id
    JOIN e c ON c.vec_id = s.neighbor_id
  ) WHERE rank <= {TOP_K}
)"""


# Twin of q_ann_ivfpq_residual: the refined serve chain over
# single-assignment RESIDUAL codes
ANN_IVFPQ_RESIDUAL_SQL = f"""
WITH {_pqr_ctes(include_base=True)},
probes AS (
  SELECT vec_id, norm, cent_id AS cell FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
{_res_scored_sql(1, "rscored")},
{_refine_topk_sql("rscored", "r_")}
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM r_topk
"""

# Twin of q_ann_ivfpq_spill_residual: residual codes x SPILL_ASSIGN
# multi-assignment, best-reconstruction dedupe before ranking
ANN_IVFPQ_SPILL_RESIDUAL_SQL = f"""
WITH {_pqr_ctes(include_base=True)},
probes AS (
  SELECT vec_id, norm, cent_id AS cell FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {IVF_NPROBE}
),
{_res_scored_sql(SPILL_ASSIGN, "rscored")},
{_refine_topk_sql("rscored", "r_")}
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM r_topk
"""

# (ANN_RESIDUAL_RECALL_SQL — extended r13 to the coarse axis — is
# defined near the k-means twins at the bottom of this module; its
# kmeans rows need the _KMEANS_CTES + _pqk_* chains.)


# Twin of q_ann_spill_tuning: the (spill x nprobe) surface at fixed
# k' — the spill code layout scored once at max routing with BOTH
# ranks retained (grid points are filters), per-grid-point DISTINCT
# dedupe, refined tails, recall per point
from .functions.similarity import (  # noqa: E402
    SPILL_TUNING_NPROBES,
    SPILL_TUNING_SPILLS,
)

ANN_SPILL_TUNING_SQL = f"""
WITH {_IVFPQ_ROUTE_CTES},
probesx AS (
  SELECT vec_id, norm, cent_id AS cell, CAST(rn AS BIGINT) AS probe_rn
  FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {max(SPILL_TUNING_NPROBES)}
),
cellsx AS (
  SELECT vec_id, cent_id AS cell, CAST(rn AS BIGINT) AS assign_rn
  FROM assigned WHERE rn <= {SPILL_ASSIGN}
),
scoredx AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         p.probe_rn, c.assign_rn,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM probesx p
  JOIN cellsx c ON p.cell = c.cell AND p.vec_id <> c.vec_id
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
),
grid AS (
  SELECT CAST(s.spill AS BIGINT) AS spill,
         CAST(n.np AS BIGINT) AS nprobe
  FROM (VALUES {", ".join(f"({s})" for s in SPILL_TUNING_SPILLS)})
         s(spill),
       (VALUES {", ".join(f"({p})" for p in SPILL_TUNING_NPROBES)})
         n(np)
),
cand AS (
  SELECT DISTINCT g.spill, g.nprobe, x.query_id, x.neighbor_id,
         x.cos_hat
  FROM scoredx x JOIN grid g
    ON x.probe_rn <= g.nprobe AND x.assign_rn <= g.spill
),
shortx AS (
  SELECT spill, nprobe, query_id, neighbor_id FROM (
    SELECT spill, nprobe, query_id, neighbor_id,
           row_number() OVER (PARTITION BY spill, nprobe, query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM cand
  ) WHERE rn <= {REFINE_K}
),
exactx AS (
  SELECT s.spill, s.nprobe, s.query_id, s.neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM shortx s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
approxx AS (
  SELECT spill, nprobe, query_id, neighbor_id FROM (
    SELECT spill, nprobe, query_id, neighbor_id,
           row_number() OVER (PARTITION BY spill, nprobe, query_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM exactx
  ) WHERE rn <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT a.spill, a.nprobe, CAST(count(*) AS BIGINT) AS n_hits
  FROM approxx a JOIN bf USING (query_id, neighbor_id)
  GROUP BY a.spill, a.nprobe
),
nq AS (
  SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM bf
)
SELECT g.spill, g.nprobe,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT))
         // (nq.n * {TOP_K}) AS recall_permille
FROM grid g LEFT JOIN hits h USING (spill, nprobe), nq
"""


# (PQ_RESIDUAL_DIAGNOSIS_SQL is defined near the k-means twins at the
# bottom of this module — its third row needs the _KMEANS_CTES chain.)


# Twin of q_ann_probe_curve: refined-path recall@TOP_K vs nprobe —
# the corpus ADC-scored ONCE at exhaustive routing with the probe
# rank retained (candidate sets nest), each swept nprobe a filter,
# the exact stage scoring the distinct shortlist union once
from .functions.similarity import PROBE_CURVE_NPROBES  # noqa: E402

ANN_PROBE_CURVE_SQL = f"""
WITH {_IVFPQ_ROUTE_CTES},
probesx AS (
  SELECT vec_id, norm, cent_id AS cell, CAST(rn AS BIGINT) AS probe_rn
  FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {max(PROBE_CURVE_NPROBES)}
),
scoredp AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, p.probe_rn,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM probesx p
  JOIN cells c ON p.cell = c.cell AND p.vec_id <> c.vec_id
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
),
ps AS (
  SELECT CAST(p AS BIGINT) AS nprobe
  FROM (VALUES {", ".join(f"({p})" for p in PROBE_CURVE_NPROBES)}) t(p)
),
shortp AS (
  SELECT nprobe, query_id, neighbor_id FROM (
    SELECT ps.nprobe, s.query_id, s.neighbor_id,
           row_number() OVER (PARTITION BY ps.nprobe, s.query_id
                              ORDER BY s.cos_hat DESC, s.neighbor_id)
             AS rn
    FROM scoredp s JOIN ps ON s.probe_rn <= ps.nprobe
  ) WHERE rn <= {REFINE_K}
),
pairs AS (
  SELECT DISTINCT query_id, neighbor_id FROM shortp
),
exactp AS (
  SELECT x.query_id, x.neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM pairs x
  JOIN e q ON q.vec_id = x.query_id
  JOIN e c ON c.vec_id = x.neighbor_id
),
curanked AS (
  SELECT s.nprobe, s.query_id, s.neighbor_id,
         row_number() OVER (PARTITION BY s.nprobe, s.query_id
                            ORDER BY x.cos DESC, s.neighbor_id) AS rank
  FROM shortp s JOIN exactp x USING (query_id, neighbor_id)
),
approx AS (
  SELECT nprobe, query_id, neighbor_id FROM curanked
  WHERE rank <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT a.nprobe, CAST(count(*) AS BIGINT) AS n_hits
  FROM approx a JOIN bf USING (query_id, neighbor_id)
  GROUP BY a.nprobe
),
nq AS (
  SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM bf
)
SELECT p.nprobe,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT))
         // (nq.n * {TOP_K}) AS recall_permille
FROM ps p LEFT JOIN hits h USING (nprobe), nq
"""

# Twin of q_ann_joint_tuning: refined-path recall@TOP_K over the
# JOINT (nprobe x k') grid — one exhaustive-routing ADC pass (probe
# rank retained, candidate sets nest), per-(nprobe, query) max-k'
# shortlist with ADC rank retained so each smaller k' is a filter,
# exact cosine computed once per distinct shortlisted pair
from .functions.similarity import JOINT_KS, JOINT_NPROBES  # noqa: E402

ANN_JOINT_TUNING_SQL = f"""
WITH {_IVFPQ_ROUTE_CTES},
probesx AS (
  SELECT vec_id, norm, cent_id AS cell, CAST(rn AS BIGINT) AS probe_rn
  FROM assigned
  WHERE vec_id < {N_QUERIES} AND rn <= {max(JOINT_NPROBES)}
),
scoredp AS (
  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id, p.probe_rn,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM probesx p
  JOIN cells c ON p.cell = c.cell AND p.vec_id <> c.vec_id
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
),
ps AS (
  SELECT CAST(p AS BIGINT) AS nprobe
  FROM (VALUES {", ".join(f"({p})" for p in JOINT_NPROBES)}) t(p)
),
ks AS (
  SELECT CAST(k AS BIGINT) AS k_refine
  FROM (VALUES {", ".join(f"({k})" for k in JOINT_KS)}) t(k)
),
shortj AS (
  SELECT nprobe, query_id, neighbor_id, rn AS adc_rank FROM (
    SELECT ps.nprobe, s.query_id, s.neighbor_id,
           row_number() OVER (PARTITION BY ps.nprobe, s.query_id
                              ORDER BY s.cos_hat DESC, s.neighbor_id)
             AS rn
    FROM scoredp s JOIN ps ON s.probe_rn <= ps.nprobe
  ) WHERE rn <= {max(JOINT_KS)}
),
pairs AS (
  SELECT DISTINCT query_id, neighbor_id FROM shortj
),
exactj AS (
  SELECT x.query_id, x.neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM pairs x
  JOIN e q ON q.vec_id = x.query_id
  JOIN e c ON c.vec_id = x.neighbor_id
),
curanked AS (
  SELECT s.nprobe, k.k_refine, s.query_id, s.neighbor_id,
         row_number() OVER (PARTITION BY s.nprobe, k.k_refine,
                                         s.query_id
                            ORDER BY x.cos DESC, s.neighbor_id) AS rank
  FROM shortj s
  JOIN ks k ON s.adc_rank <= k.k_refine
  JOIN exactj x USING (query_id, neighbor_id)
),
approx AS (
  SELECT nprobe, k_refine, query_id, neighbor_id FROM curanked
  WHERE rank <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT a.nprobe, a.k_refine, CAST(count(*) AS BIGINT) AS n_hits
  FROM approx a JOIN bf USING (query_id, neighbor_id)
  GROUP BY a.nprobe, a.k_refine
),
nq AS (
  SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM bf
)
SELECT g.nprobe, g.k_refine,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT))
         // (nq.n * {TOP_K}) AS recall_permille
FROM (SELECT p.nprobe, k.k_refine FROM ps p CROSS JOIN ks k) g
LEFT JOIN hits h USING (nprobe, k_refine), nq
"""


# Twin of q_ann_refine_recall: the refined top-k intersected with the
# brute-force exact top-k (ANN_PQ_RECALL_SQL's evaluation shape)
ANN_REFINE_RECALL_SQL = f"""
WITH {_IVFPQ_REFINED_CTES},
approx AS (
  SELECT query_id, neighbor_id FROM refined WHERE rank <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT bf.query_id, count(*) AS n_hits
  FROM bf JOIN approx USING (query_id, neighbor_id)
  GROUP BY bf.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT)) // {TOP_K}
         AS recall_permille
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN hits h USING (query_id)
"""


EMBEDDING_QUANTIZE_SQL = """
WITH m AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         list_aggregate(list_transform(CAST(embedding AS DOUBLE[]),
                                       x -> abs(x)), 'max') AS maxabs
  FROM embeddings
)
SELECT vec_id,
       CAST(CASE WHEN maxabs > 0 THEN floor(maxabs * 1000000 / 127)
                 ELSE 0 END AS BIGINT) AS scale_micro,
       array_to_string(
         list_transform(v, x -> CAST(CAST(
           CASE WHEN maxabs > 0 THEN floor(x * 127 / maxabs)
                ELSE 0 END AS BIGINT) AS VARCHAR)), ',') AS q_csv
FROM m
"""


# Twin of q_source_quality_report: same flags, same integer ratios
SOURCE_QUALITY_REPORT_SQL = f"""
WITH {_CONTAM_BASE},
contam AS (
  SELECT DISTINCT e.doc_id
  FROM (SELECT doc_id, unnest(grams) AS gram_h FROM g
        WHERE doc_id % {HOLDOUT_MOD} <> 0) e
  JOIN test_g USING (gram_h)
),
base AS (
  SELECT doc_id, source, fp, n_tokens AS n_tok, CAST({_Q} AS BIGINT) AS score
  FROM (
    SELECT doc_id, source, md5(text) AS fp,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
             AS n_stopwords,
           CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
             AS tok_chars
    FROM (SELECT doc_id, source, text, string_split(text, ' ') AS tk
          FROM documents) t0
  ) t1
),
canon AS (SELECT fp, min(doc_id) AS canon_id FROM base GROUP BY fp),
flags AS (
  SELECT b.source, b.n_tok, b.score,
         b.doc_id <> c.canon_id AS is_dup,
         b.doc_id IN (SELECT doc_id FROM contam) AS is_contam,
         b.doc_id % {HOLDOUT_MOD} <> 0 AS is_train
  FROM base b JOIN canon c USING (fp)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(score) AS BIGINT) // count(*) AS mean_quality,
       (1000 * CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT))
         // count(*) AS dup_permille,
       CASE WHEN sum(CASE WHEN is_train THEN 1 ELSE 0 END) > 0 THEN
         (1000 * CAST(sum(CASE WHEN is_contam THEN 1 ELSE 0 END) AS BIGINT))
           // CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
       ELSE 0 END AS contam_permille
FROM flags GROUP BY source
"""


# Twin of q_quality_calibration: SOURCE_QUALITY_REPORT_SQL's flags
# keyed by the score band instead of the source
QUALITY_CALIBRATION_SQL = f"""
WITH {_CONTAM_BASE},
contam AS (
  SELECT DISTINCT e.doc_id
  FROM (SELECT doc_id, unnest(grams) AS gram_h FROM g
        WHERE doc_id % {HOLDOUT_MOD} <> 0) e
  JOIN test_g USING (gram_h)
),
base AS (
  SELECT doc_id, fp, n_tokens AS n_tok,
         CAST({_Q} AS BIGINT) AS score_permille
  FROM (
    SELECT doc_id, md5(text) AS fp,
           CAST(length(text) AS BIGINT) AS len_chars,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct_tokens,
           CAST(len(list_filter(tk, t -> t IN ({_STOP_LIST}))) AS BIGINT)
             AS n_stopwords,
           CAST(list_sum(list_transform(tk, t -> length(t))) AS BIGINT)
             AS tok_chars
    FROM (SELECT doc_id, text, string_split(text, ' ') AS tk
          FROM documents) t0
  ) t1
),
canon AS (SELECT fp, min(doc_id) AS canon_id FROM base GROUP BY fp),
flags AS (
  SELECT b.score_permille, b.n_tok,
         b.doc_id <> c.canon_id AS is_dup,
         b.doc_id IN (SELECT doc_id FROM contam) AS is_contam,
         b.doc_id % {HOLDOUT_MOD} <> 0 AS is_train
  FROM base b JOIN canon c USING (fp)
)
SELECT score_permille,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       (1000 * CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT))
         // count(*) AS dup_permille,
       CASE WHEN sum(CASE WHEN is_train THEN 1 ELSE 0 END) > 0 THEN
         (1000 * CAST(sum(CASE WHEN is_contam THEN 1 ELSE 0 END) AS BIGINT))
           // CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
       ELSE 0 END AS contam_permille
FROM flags GROUP BY score_permille
"""


# Twin of q_ann_recall: both knn twins as nested CTE subqueries, then
# the per-query overlap count
ANN_RECALL_SQL = f"""
WITH bf AS (
  {KNN_BRUTEFORCE_SQL}
),
iv AS (
  {KNN_IVF_MULTIPROBE_SQL}
),
hits AS (
  SELECT bf.query_id, count(*) AS n_hits
  FROM bf JOIN iv USING (query_id, neighbor_id)
  GROUP BY bf.query_id
)
SELECT q.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT)) // {TOP_K}
         AS recall_permille
FROM (SELECT DISTINCT query_id FROM bf) q
LEFT JOIN hits h USING (query_id)
"""


# Twin of q_packed_token_ids: ordinality-preserving unnest, ranked
# vocab join, ordered list/string aggregation per doc then per pack
PACKED_TOKEN_IDS_SQL = f"""
WITH tok AS (
  SELECT doc_id, i AS pos, tk[i] AS token
  FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents) d,
       UNNEST(range(1, len(tk) + 1)) AS u(i)
),
vocab AS (
  SELECT token,
         CAST(row_number() OVER (ORDER BY count(*) DESC, token) AS BIGINT)
           AS token_id
  FROM tok GROUP BY token
),
per_doc AS (
  SELECT doc_id,
         string_agg(CAST(token_id AS VARCHAR), ',' ORDER BY pos) AS ids_csv
  FROM tok JOIN vocab USING (token)
  GROUP BY doc_id
),
packs AS (
  SELECT doc_id, lang, n_tokens,
         CAST((cum_tokens - n_tokens) // {PACK_BUDGET_TOKENS} AS BIGINT)
           AS pack_id
  FROM (
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           sum(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
    FROM documents
  ) t
)
SELECT lang, pack_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       string_agg(ids_csv, ',' ORDER BY doc_id) AS pack_ids_csv
FROM packs JOIN per_doc USING (doc_id)
GROUP BY lang, pack_id
"""

# ---------------------------------------------------------------------------
# round-5 filtering / gating / retrieval twins (functions/filtering.py,
# functions/retrieval.py) — thresholds and hash geometry imported from the
# Spark modules so the dialects cannot drift
from .functions.filtering import (  # noqa: E402
    BLOCK_MULT2,
    BLOCK_TOKENS,
    BLOOM_BITS,
    BLOOM_HASHES,
    BLOOM_INGESTED_MOD,
    QUALITY_MAX_AVG_TOKEN_CENTI,
    QUALITY_MAX_TOKENS,
    QUALITY_MAX_TOP_TOKEN_PERMILLE,
    QUALITY_MIN_AVG_TOKEN_CENTI,
    QUALITY_MIN_STOPWORDS,
    QUALITY_MIN_TOKENS,
)
from .functions.retrieval import (  # noqa: E402
    BM25_B_MILLI,
    BM25_K1_MILLI,
    BM25_QUERY_TERMS,
    BM25_TOP_K,
)

GOPHER_QUALITY_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY doc_id, token
),
s AS (
  SELECT doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN token IN ({_STOP_LIST}) THEN cnt ELSE 0 END)
              AS BIGINT) AS n_stopwords,
         CAST(sum(length(token) * cnt) AS BIGINT) AS tok_chars,
         CAST(max(cnt) AS BIGINT) AS top_cnt
  FROM tf GROUP BY doc_id
),
d AS (
  SELECT doc_id, n_tokens, n_stopwords,
         (100 * tok_chars) // n_tokens AS avg_token_len_centi,
         (1000 * top_cnt) // n_tokens AS top_token_permille
  FROM s
)
SELECT doc_id, n_tokens, n_stopwords, avg_token_len_centi,
       top_token_permille,
       n_tokens BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}
         AS ok_length,
       avg_token_len_centi BETWEEN {QUALITY_MIN_AVG_TOKEN_CENTI}
         AND {QUALITY_MAX_AVG_TOKEN_CENTI} AS ok_mean_token_len,
       n_stopwords >= {QUALITY_MIN_STOPWORDS} AS ok_stopwords,
       top_token_permille <= {QUALITY_MAX_TOP_TOKEN_PERMILLE} AS ok_top_token,
       (n_tokens BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS})
         AND (avg_token_len_centi BETWEEN {QUALITY_MIN_AVG_TOKEN_CENTI}
              AND {QUALITY_MAX_AVG_TOKEN_CENTI})
         AND n_stopwords >= {QUALITY_MIN_STOPWORDS}
         AND top_token_permille <= {QUALITY_MAX_TOP_TOKEN_PERMILLE} AS keep
FROM d
"""

BLOCK_DEDUP_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '),
           tk -> CAST(('0x' || substr(md5(tk), 1, 7)) AS BIGINT)) AS th,
         list_transform(string_split(text, ' '),
           tk -> CAST(('0x' || substr(md5(tk), 8, 7)) AS BIGINT)) AS th2
  FROM documents
),
b AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, CAST((len(th) + {BLOCK_TOKENS - 1}) // {BLOCK_TOKENS}
                 AS BIGINT)),
           i -> struct_pack(
             block_idx := i,
             block_h := list_reduce(
               th[i * {BLOCK_TOKENS} + 1 : i * {BLOCK_TOKENS}
                  + {BLOCK_TOKENS}],
               (a, x) -> (a * {CONTAM_MULT} + x) % {CONTAM_P})
               * 2147483648
               + list_reduce(
               th2[i * {BLOCK_TOKENS} + 1 : i * {BLOCK_TOKENS}
                  + {BLOCK_TOKENS}],
               (a, x) -> (a * {BLOCK_MULT2} + x) % {CONTAM_P})))) AS blk
  FROM t
),
blocks AS (
  SELECT doc_id, blk.block_idx AS block_idx, blk.block_h AS block_h FROM b
),
flagged AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY block_h
                            ORDER BY doc_id, block_idx) AS rn
  FROM blocks
)
SELECT doc_id,
       count(*) AS n_blocks,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped,
       CAST((1000 * (count(*) - sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)))
         // count(*) AS BIGINT) AS drop_permille
FROM flagged GROUP BY doc_id
"""

DUP_GRAM_COVERAGE_SQL = f"""
WITH {_CONTAM_BASE},
e AS (SELECT doc_id, unnest(grams) AS gram_h FROM g),
c AS (SELECT gram_h, count(*) AS nd FROM e GROUP BY gram_h)
SELECT e.doc_id,
       count(*) AS n_grams,
       CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_grams,
       CAST((1000 * sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END))
         // count(*) AS BIGINT) AS dup_permille
FROM e JOIN c USING (gram_h)
GROUP BY e.doc_id
"""

# Twin of q_exact_substring_spans: positioned windows as a list of
# {pos, gram_h} structs (the SAME python-generated rolling fold as
# _CONTAM_GRAM, so the dialects cannot drift), dup set = grams in
# >= 2 docs over the shared per-doc-distinct gram CTE, then the
# identical gaps-and-islands merge in window functions
from .functions.filtering import EXSUB_K  # noqa: E402

_EXSUB_ISLANDS_CTES = f"""{_CONTAM_BASE},
dup AS (
  SELECT gram_h FROM (
    SELECT doc_id, unnest(grams) AS gram_h FROM g
  ) GROUP BY gram_h HAVING count(*) >= 2
),
pg AS (
  SELECT doc_id, CAST(len(th) AS BIGINT) AS n_tokens,
         unnest(list_transform(range(1, len(th) - {EXSUB_K - 2}),
                i -> {{'pos': CAST(i AS BIGINT),
                       'gram_h': {_contam_acc}}}),
                recursive := true)
  FROM t WHERE len(th) >= {EXSUB_K}
),
hit AS (
  SELECT pg.doc_id, pg.n_tokens, pg.pos
  FROM pg JOIN dup USING (gram_h)
),
fl AS (
  SELECT doc_id, n_tokens, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id
                                        ORDER BY pos) > {EXSUB_K}
              THEN 1 ELSE 0 END AS brk
  FROM hit
),
isl AS (
  SELECT doc_id, n_tokens, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS isl_id
  FROM fl
),
sp AS (
  SELECT doc_id, max(n_tokens) AS n_tokens, isl_id,
         CAST(min(pos) AS BIGINT) AS span_start,
         CAST(max(pos) + {EXSUB_K - 1} AS BIGINT) AS span_end,
         CAST(max(pos) - min(pos) + {EXSUB_K} AS BIGINT) AS span_tok
  FROM isl GROUP BY doc_id, isl_id
)"""

EXACT_SUBSTRING_SPANS_SQL = f"""
WITH {_EXSUB_ISLANDS_CTES}
SELECT doc_id,
       max(n_tokens) AS n_tokens,
       count(*) AS n_dup_spans,
       CAST(sum(span_tok) AS BIGINT) AS dup_tokens,
       max(span_tok) AS max_span_tokens,
       (1000 * CAST(sum(span_tok) AS BIGINT)) // max(n_tokens)
         AS dup_permille
FROM sp GROUP BY doc_id
"""

# Twin of q_exact_substring_cut: span intervals per doc, then the
# identical doc-local rebuild — per token position an interval-list
# probe, NULL inside any span, rejoin with single spaces, md5
EXACT_SUBSTRING_CUT_SQL = f"""
WITH {_EXSUB_ISLANDS_CTES},
spl AS (
  SELECT doc_id,
         list({{'s': span_start, 'e': span_end}}) AS spans
  FROM sp GROUP BY doc_id
),
base AS (
  SELECT d.doc_id, string_split(d.text, ' ') AS tk,
         coalesce(spl.spans,
                  CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS sps
  FROM documents d LEFT JOIN spl USING (doc_id)
),
reb AS (
  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
         list_filter(
           list_transform(range(1, len(tk) + 1),
             i -> CASE WHEN len(list_filter(sps,
                          sp -> i >= sp.s AND i <= sp.e)) > 0
                       THEN NULL ELSE tk[i] END),
           x -> x IS NOT NULL) AS kept
  FROM base
)
SELECT doc_id, n_tokens,
       CAST(len(kept) AS BIGINT) AS kept_tokens,
       CAST(n_tokens - len(kept) AS BIGINT) AS cut_tokens,
       md5(coalesce(array_to_string(kept, ' '), '')) AS kept_fp
FROM reb
"""

_BLOOM_POS = "list_distinct([" + ", ".join(
    f"CAST(('0x' || substr(md5('{i}:' || text), 1, 7)) AS BIGINT)"
    f" % {BLOOM_BITS}"
    for i in range(BLOOM_HASHES)
) + "])"

BLOOM_DEDUP_GATE_SQL = f"""
WITH pos AS (
  SELECT doc_id, text, {_BLOOM_POS} AS ps FROM documents
),
bits AS (
  SELECT DISTINCT unnest(ps) AS p FROM pos
  WHERE doc_id % {BLOOM_INGESTED_MOD} <> 0
),
probe AS (
  SELECT doc_id, text, ps FROM pos WHERE doc_id % {BLOOM_INGESTED_MOD} = 0
),
hit AS (
  SELECT pr.doc_id,
         max(len(pr.ps)) = count(bits.p) AS bloom_hit
  FROM (SELECT doc_id, ps, unnest(ps) AS p FROM probe) pr
  LEFT JOIN bits USING (p)
  GROUP BY pr.doc_id
),
ing AS (
  SELECT DISTINCT md5(text) AS fp FROM documents
  WHERE doc_id % {BLOOM_INGESTED_MOD} <> 0
),
truth AS (
  SELECT doc_id, md5(text) IN (SELECT fp FROM ing) AS is_dup FROM probe
)
SELECT hit.doc_id, bloom_hit, is_dup,
       (bloom_hit OR NOT is_dup) AS sound
FROM hit JOIN truth USING (doc_id)
"""

_BM25_TERMS = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

BM25_SEARCH_SQL = f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
totals AS (
  SELECT CAST(sum(dl) AS BIGINT) AS total_tokens,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM dl
),
postings AS (
  SELECT doc_id, token
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents)
  WHERE token IN ({_BM25_TERMS})
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM postings GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY token
),
per_term AS (
  SELECT tf.doc_id,
         (((1000000 * (n_docs - df) + 500000) // (df + 1))
          * (tf * (1000 + {BM25_K1_MILLI})))
         // (1000 * tf + ({BM25_K1_MILLI} * (1000 - {BM25_B_MILLI}
             + ({BM25_B_MILLI} * dl.dl * n_docs) // total_tokens)) // 1000)
           AS term_score
  FROM tf
  JOIN dfreq USING (token)
  JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN totals
),
per_doc AS (
  SELECT doc_id, CAST(sum(term_score) AS BIGINT) AS score_micro
  FROM per_term GROUP BY doc_id
),
topk AS (
  SELECT doc_id, score_micro FROM per_doc
  ORDER BY score_micro DESC, doc_id LIMIT {BM25_TOP_K}
)
SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id) AS BIGINT)
         AS rank,
       doc_id, score_micro
FROM topk
"""

from .functions.tokenizer import BPE_TOP_PAIRS  # noqa: E402
from .functions.similarity import OUTLIER_K, OUTLIER_MICRO  # noqa: E402

BPE_PAIR_COUNTS_SQL = f"""
WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
p AS (
  SELECT unnest(list_transform(range(1, len(tk)),
           i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
  FROM t
),
c AS (
  SELECT pr.l AS "left", pr.r AS "right", count(*) AS n_pairs
  FROM p GROUP BY pr.l, pr.r
),
top AS (
  SELECT "left", "right", n_pairs FROM c
  ORDER BY n_pairs DESC, "left", "right" LIMIT {BPE_TOP_PAIRS}
)
SELECT CAST(row_number() OVER (ORDER BY n_pairs DESC, "left", "right")
            AS BIGINT) AS rank,
       "left", "right", n_pairs
FROM top
"""

EMBEDDING_OUTLIERS_SQL = f"""
WITH e AS (
  SELECT vec_id, label,
         unnest(list_transform(range(1, len(embedding) + 1),
           i -> struct_pack(dim := i - 1,
                xm := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                 * {OUTLIER_MICRO}) AS BIGINT)))) AS u
  FROM embeddings
),
x AS (SELECT vec_id, label, u.dim AS dim, u.xm AS xm FROM e),
cent AS (
  SELECT label, dim, CAST(sum(xm) AS BIGINT) // count(*) AS cm
  FROM x GROUP BY label, dim
),
dist AS (
  SELECT vec_id, x.label AS label,
         CAST(sum((xm - cm) * (xm - cm)) AS BIGINT) AS dist_sq
  FROM x JOIN cent ON x.label = cent.label AND x.dim = cent.dim
  GROUP BY vec_id, x.label
),
top AS (
  SELECT vec_id, label, dist_sq FROM dist
  ORDER BY dist_sq DESC, vec_id LIMIT {OUTLIER_K}
)
SELECT CAST(row_number() OVER (ORDER BY dist_sq DESC, vec_id) AS BIGINT)
         AS rank,
       vec_id, label, dist_sq
FROM top
"""

from .functions.corpus import PII_PATTERNS, PII_REDACTIONS  # noqa: E402

# sequential redaction twin: each pass counts + replaces on the
# PREVIOUS pass's output, mirroring the Spark expression chain
_redact_cte = ["s0 AS (SELECT doc_id, lower(text) AS t FROM documents)"]
_count_cols = []
for _i, (_name, _ph) in enumerate(PII_REDACTIONS):
    _pat = PII_PATTERNS[_name]
    _prev = f"s{_i}"
    _carry = ", ".join(f"c{_j}" for _j in range(_i))
    _carry = (_carry + ", ") if _carry else ""
    _redact_cte.append(
        f"s{_i + 1} AS (SELECT doc_id, {_carry}"
        f"CAST(len(regexp_extract_all(t, '{_pat}')) AS BIGINT) AS c{_i}, "
        f"regexp_replace(t, '{_pat}', '{_ph}', 'g') AS t FROM {_prev})"
    )
    _count_cols.append(f"c{_i}")

PII_REDACT_SQL = (
    "WITH " + ",\n".join(_redact_cte) + "\n"
    "SELECT doc_id, t AS redacted_text, "
    f"CAST({' + '.join(_count_cols)} AS BIGINT) AS n_redactions "
    f"FROM s{len(PII_REDACTIONS)}"
)

LANGUAGE_CONFUSION_SQL = f"""
WITH pred AS (
  {LANGUAGE_ID_SQL}
),
cells AS (
  SELECT labeled_lang, predicted_lang, count(*) AS n_docs
  FROM pred GROUP BY labeled_lang, predicted_lang
)
SELECT labeled_lang, predicted_lang, n_docs,
       CAST((1000 * n_docs) //
         (sum(n_docs) OVER (PARTITION BY labeled_lang)) AS BIGINT)
         AS row_share_permille
FROM cells
"""

SHARD_SKEW_REPORT_SQL = f"""
WITH assigned AS (
  SELECT CASE WHEN h16 < {SPLIT_TRAIN_64K} THEN 'train'
              WHEN h16 < {SPLIT_VAL_64K} THEN 'val'
              ELSE 'test' END AS split,
         hshard % {N_SPLIT_SHARDS} AS shard,
         n_tok
  FROM (
    SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                AS BIGINT) AS h16,
           CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 5, 4))
                AS BIGINT) AS hshard,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
    FROM documents
  )
),
per_shard AS (
  SELECT split, shard, CAST(sum(n_tok) AS BIGINT) AS shard_tokens
  FROM assigned GROUP BY split, shard
)
SELECT split, count(*) AS n_shards,
       CAST(sum(shard_tokens) AS BIGINT) AS n_tokens,
       CAST(min(shard_tokens) AS BIGINT) AS min_shard_tokens,
       CAST(max(shard_tokens) AS BIGINT) AS max_shard_tokens,
       CAST((1000 * max(shard_tokens) * count(*)) // sum(shard_tokens)
         AS BIGINT) AS skew_permille
FROM per_shard GROUP BY split
"""

BPE_MERGE_ROUND_SQL = """
WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents
),
p AS (
  SELECT unnest(list_transform(range(1, len(tk)),
           i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
  FROM t WHERE len(tk) >= 2
),
winner AS (
  SELECT pr.l AS lft, pr.r AS rgt, count(*) AS n_pairs
  FROM p WHERE pr.l <> pr.r
  GROUP BY pr.l, pr.r
  ORDER BY n_pairs DESC, lft, rgt LIMIT 1
),
m AS (
  SELECT w.lft, w.rgt, w.n_pairs,
         CAST(len(t.tk) AS BIGINT) AS n_tok,
         CAST(len(list_filter(range(1, len(t.tk)),
                i -> t.tk[i] = w.lft AND t.tk[i + 1] = w.rgt))
              AS BIGINT) AS n_merges
  FROM t CROSS JOIN winner w
)
SELECT lft AS "left", rgt AS "right", n_pairs,
       CAST(sum(CASE WHEN n_merges > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_touched,
       CAST(sum(n_merges) AS BIGINT) AS n_merges,
       CAST(sum(n_tok) AS BIGINT) AS tokens_before,
       CAST(sum(n_tok) - sum(n_merges) AS BIGINT) AS tokens_after
FROM m GROUP BY lft, rgt, n_pairs
"""

DOC_EMBEDDING_NORMS_SQL = f"""
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
e AS (
  SELECT vec_id AS doc_id,
         list_sum(list_transform(range(1, len(embedding) + 1),
           i -> CAST(floor(CAST(embedding[i] AS DOUBLE)
                           * {OUTLIER_MICRO}) AS BIGINT)
                * CAST(floor(CAST(embedding[i] AS DOUBLE)
                             * {OUTLIER_MICRO}) AS BIGINT)))
           AS norm_sq
  FROM embeddings
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       CAST(sum(norm_sq) AS BIGINT) // count(*) AS mean_norm_sq_micro2
FROM d JOIN e USING (doc_id)
GROUP BY lang
"""

from .functions.retrieval import RAG_EMBED_DIMS, RAG_SIGN_BITS  # noqa: E402

_RAG_DIM = (
    "(CAST(('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || chunk_text),"
    " 1, 7)) AS BIGINT) % 2001) - 1000"
)
_RAG_BITS = " + ".join(
    f"CASE WHEN e[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END"
    for i in range(RAG_SIGN_BITS)
)

RAG_BUCKET_REPORT_SQL = f"""
WITH chunks AS (
  {DOC_CHUNKS_SQL}
),
emb AS (
  SELECT doc_id,
         list_transform(range(0, {RAG_EMBED_DIMS}), d -> {_RAG_DIM}) AS e
  FROM chunks
),
routed AS (
  SELECT doc_id, CAST({_RAG_BITS} AS BIGINT) AS bucket_id FROM emb
)
SELECT bucket_id, count(*) AS n_chunks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM routed GROUP BY bucket_id
"""

from .functions.clustering import KMEANS_K, KMEANS_MICRO  # noqa: E402
from .functions.corpus import CONTEXT_BUCKETS  # noqa: E402
from .functions.retrieval import PHRASE_TERMS  # noqa: E402

_KM_ASSIGN = """
  SELECT vec_id, cid, dist_sq FROM (
    SELECT vec_id, cid, dist_sq,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist_sq, cid) AS rn
    FROM (
      SELECT x.vec_id, c.cid,
             CAST(sum((x.xm - c.cm) * (x.xm - c.cm)) AS BIGINT) AS dist_sq
      FROM x JOIN {cent} c ON x.dim = c.dim
      GROUP BY x.vec_id, c.cid
    )
  ) WHERE rn = 1
"""

_KMEANS_CTES = f"""x AS (
  SELECT vec_id, u.dim AS dim, u.xm AS xm FROM (
    SELECT vec_id,
           unnest(list_transform(range(1, len(embedding) + 1),
             i -> struct_pack(dim := i - 1,
                  xm := CAST(floor(CAST(embedding[i] AS DOUBLE)
                                   * {KMEANS_MICRO}) AS BIGINT)))) AS u
    FROM embeddings
  )
),
seeds AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cid
  FROM (SELECT DISTINCT vec_id FROM x ORDER BY vec_id LIMIT {KMEANS_K})
),
c0 AS (
  SELECT s.cid, x.dim, x.xm AS cm
  FROM seeds s JOIN x ON s.vec_id = x.vec_id
),
a1 AS ({_KM_ASSIGN.format(cent="c0")}),
c1 AS (
  SELECT a1.cid, x.dim, CAST(sum(x.xm) AS BIGINT) // count(*) AS cm
  FROM a1 JOIN x ON a1.vec_id = x.vec_id
  GROUP BY a1.cid, x.dim
),
a2 AS ({_KM_ASSIGN.format(cent="c1")})"""

KMEANS_ASSIGN_SQL = f"""
WITH {_KMEANS_CTES}
SELECT vec_id, cid AS cluster_id, dist_sq FROM a2
"""


def _pqk_trainer_ctes() -> str:
    """The k-means-residual PQ trainer chain (k-prefixed names):
    kpx = x - trained centroid (Euclidean a2 assignment over the
    _KMEANS_CTES chain, total — every vector has a cluster), then
    the standard unrolled Lloyd rounds + convergence selection via
    the shared _PQ_ASSIGN/_PQ_UPDATE templates."""
    parts = [
        f"""kpx AS MATERIALIZED (
  SELECT x.vec_id,
         CAST(x.dim // {PQ_SUB} AS BIGINT) AS m,
         CAST(x.dim % {PQ_SUB} AS BIGINT) AS d,
         x.xm - c.cm AS xm
  FROM x
  JOIN a2 ON a2.vec_id = x.vec_id
  JOIN c1 c ON c.cid = a2.cid AND c.dim = x.dim
)""",
        f"""kpc0 AS (
  SELECT m, CAST(vec_id - {N_QUERIES} AS BIGINT) AS j, d, xm AS cm
  FROM kpx WHERE vec_id >= {N_QUERIES} AND vec_id < {N_QUERIES + PQ_K}
)""",
    ]
    for r in range(1, PQ_TRAIN_CAP + 2):
        parts.append(
            f"kpa{r} AS MATERIALIZED "
            f"({_PQ_ASSIGN.format(px='kpx', cent=f'kpc{r - 1}')})"
        )
        if r <= PQ_TRAIN_CAP:
            parts.append(
                f"kpc{r} AS MATERIALIZED ("
                + _PQ_UPDATE.format(
                    px="kpx", prev=f"kpc{r - 1}", assign=f"kpa{r}"
                )
                + ")"
            )
    parts.append(
        "ktds AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS k,"
            f" (SELECT CAST(sum(dist_sq) AS BIGINT) FROM kpa{r}) AS td"
            for r in range(1, PQ_TRAIN_CAP + 2)
        )
        + "\n)"
    )
    parts.append(
        f"""kship AS (
  SELECT coalesce(min(a.k), CAST({PQ_TRAIN_CAP} AS BIGINT)) AS r
  FROM ktds a JOIN ktds b ON b.k = a.k + 1
  WHERE a.td = 0
     OR (a.td - b.td) * 1000 < a.td * {PQ_CONVERGE_PERMILLE}
)"""
    )
    return ",\n".join(parts)


# Twin of q_pq_residual_diagnosis: THREE trainer chains in one query
# (raw via _PQ_CTES; member-vector residuals via the trainer-only
# slice of _pqr_ctes sharing the raw px; trained-k-means residuals
# via _KMEANS_CTES + _pqk_trainer_ctes), per family the input
# energy, shipped depth, final absolute distortion, and relative
# miss — the oracle-checked WHY of the residual inversion AND of its
# converse under a contracting (trained) coarse level
PQ_RESIDUAL_DIAGNOSIS_SQL = f"""
WITH {_PQ_CTES},
{_pqr_ctes(include_base=True, include_px=False, trainer_only=True)},
{_KMEANS_CTES},
{_pqk_trainer_ctes()},
rows_ AS (
  SELECT 'raw' AS codebook, 'none' AS coarse,
         (SELECT CAST(sum(xm * xm) AS BIGINT) FROM px)
           AS energy_micro2,
         (SELECT CAST(r AS BIGINT) FROM ship) AS ship_round,
         (SELECT CAST(td AS BIGINT) FROM tds
          WHERE k = (SELECT r + 1 FROM ship)) AS total_dist_sq
  UNION ALL
  SELECT 'residual', 'member_vectors',
         (SELECT CAST(sum(xm * xm) AS BIGINT) FROM rpx),
         (SELECT CAST(r AS BIGINT) FROM rship),
         (SELECT CAST(td AS BIGINT) FROM rtds
          WHERE k = (SELECT r + 1 FROM rship))
  UNION ALL
  SELECT 'residual', 'kmeans',
         (SELECT CAST(sum(xm * xm) AS BIGINT) FROM kpx),
         (SELECT CAST(r AS BIGINT) FROM kship),
         (SELECT CAST(td AS BIGINT) FROM ktds
          WHERE k = (SELECT r + 1 FROM kship))
)
SELECT codebook, coarse, energy_micro2, ship_round, total_dist_sq,
       (1000 * total_dist_sq) // energy_micro2 AS dist_permille
FROM rows_
"""


# ------------------------------------------------------------------
# K-MEANS COARSE serve twins (r13): the IVFADC serve chain routed on
# the TRAINED round-2 k-means codebook — Euclidean full ranking
# (kassigned, the serve extension of a2's argmin), servable spills,
# per-assignment residual codes against the kpx-trained codebook,
# per-(query, k-means cell) combined-reconstruction LUTs. Mirrors
# similarity._kranked_cells/_pqk_codes/_adc_kres_query_luts.


def _pqk_serve_ctes() -> str:
    """The k-means serve chain (needs _KMEANS_CTES + _pqk_trainer_ctes
    + an `e` CTE in scope): kassigned/kspills/kprobes routing,
    kshipc/kpcodes coding, kcvd/klut ADC tables."""
    codes_cols = ", ".join(
        f"CAST(max(CASE WHEN m = {m} THEN j END) AS BIGINT) AS code_{m}"
        for m in range(PQ_M)
    )
    parts = [
        """kassigned AS MATERIALIZED (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY dist_sq, cid) AS rn
  FROM (
    SELECT x.vec_id, c.cid,
           CAST(sum((x.xm - c.cm) * (x.xm - c.cm)) AS BIGINT) AS dist_sq
    FROM x JOIN c1 c ON x.dim = c.dim
    GROUP BY x.vec_id, c.cid
  )
)""",
        f"""kspills AS (
  SELECT a.vec_id, a.cid AS cell, CAST(a.rn AS BIGINT) AS assign_rn
  FROM kassigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.rn <= {SPILL_ASSIGN}
)""",
        f"""kprobes AS (
  SELECT a.vec_id, e.norm, a.cid AS cell
  FROM kassigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id < {N_QUERIES} AND a.rn <= {IVF_NPROBE}
)""",
        "kpc_all AS (\n  "
        + "\n  UNION ALL ".join(
            f"SELECT CAST({r} AS BIGINT) AS r, m, j, d, cm FROM kpc{r}"
            for r in range(0, PQ_TRAIN_CAP + 1)
        )
        + "\n)",
        """kshipc AS MATERIALIZED (
  SELECT m, j, d, cm FROM kpc_all WHERE r = (SELECT r FROM kship)
)""",
        f"""kspx AS MATERIALIZED (
  SELECT s.vec_id, s.cell, s.assign_rn,
         CAST(x.dim // {PQ_SUB} AS BIGINT) AS m,
         CAST(x.dim % {PQ_SUB} AS BIGINT) AS d,
         x.xm - c.cm AS xm
  FROM x
  JOIN kspills s ON s.vec_id = x.vec_id
  JOIN c1 c ON c.cid = s.cell AND c.dim = x.dim
)""",
        f"""kpcodes AS MATERIALIZED (
  SELECT vec_id, cell, assign_rn, {codes_cols}
  FROM (
    SELECT vec_id, cell, assign_rn, m, j,
           row_number() OVER (PARTITION BY vec_id, cell, m
                              ORDER BY dist_sq, j) AS rn
    FROM (
      SELECT r.vec_id, r.cell, r.assign_rn, r.m, c.j,
             CAST(sum((r.xm - c.cm) * (r.xm - c.cm)) AS BIGINT)
               AS dist_sq
      FROM kspx r JOIN kshipc c ON r.m = c.m AND r.d = c.d
      GROUP BY r.vec_id, r.cell, r.assign_rn, r.m, c.j
    )
  ) WHERE rn = 1
  GROUP BY vec_id, cell, assign_rn
)""",
        f"""kcvd AS MATERIALIZED (
  SELECT c1.cid AS cell, k.m, k.j,
         list(CAST(c1.cm + k.cm AS DOUBLE) / {PQ_MICRO}.0
              ORDER BY k.d) AS cv
  FROM kshipc k
  JOIN c1 ON c1.dim = k.m * {PQ_SUB} + k.d
  GROUP BY c1.cid, k.m, k.j
)""",
        f"""klut AS MATERIALIZED (
  SELECT q.vec_id AS query_id, c.cell, c.m, c.j,
         list_dot_product(
           q.v[CAST(c.m*{PQ_SUB}+1 AS INT)
               : CAST(c.m*{PQ_SUB}+{PQ_SUB} AS INT)],
           c.cv
         ) AS d,
         list_dot_product(c.cv, c.cv) AS cn2
  FROM e q, kcvd c
  WHERE q.vec_id < {N_QUERIES}
)""",
    ]
    return ",\n".join(parts)


def _kraw_scored_sql(spill: int, name: str) -> str:
    """RAW codes routed on the k-means coarse level (needs kprobes +
    kspills + the raw chain's codes/lut in scope): the global
    query-keyed LUT joins — only ROUTING differs from the member raw
    path. Multi-cell rows are byte-identical; DISTINCT when
    spill > 1, matching Spark."""
    distinct = "DISTINCT " if spill > 1 else ""
    return f"""{name} AS (
  SELECT {distinct}p.vec_id AS query_id, k.vec_id AS neighbor_id,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM kprobes p
  JOIN kspills c ON c.cell = p.cell AND c.vec_id <> p.vec_id
                AND c.assign_rn <= {spill}
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
)"""


_E_CTE = f"""e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
  WHERE list_dot_product(CAST(embedding AS DOUBLE[]),
                         CAST(embedding AS DOUBLE[])) > 0
)"""

_KRES_SCORED_KW = dict(probes="kprobes", codes="kpcodes", lut="klut")

# Twin of q_ann_ivfpq_kmeans: the refined serve chain over the
# trained-k-means coarse level with single-assignment residual codes
ANN_IVFPQ_KMEANS_SQL = f"""
WITH {_E_CTE},
{_KMEANS_CTES},
{_pqk_trainer_ctes()},
{_pqk_serve_ctes()},
{_res_scored_sql(1, "kscored", **_KRES_SCORED_KW)},
{_refine_topk_sql("kscored", "k_")}
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM k_topk
"""

# Twin of q_ann_ivfpq_spill_kmeans: k-means coarse x residual codes x
# SPILL_ASSIGN multi-assignment, best-reconstruction dedupe
ANN_IVFPQ_SPILL_KMEANS_SQL = f"""
WITH {_E_CTE},
{_KMEANS_CTES},
{_pqk_trainer_ctes()},
{_pqk_serve_ctes()},
{_res_scored_sql(SPILL_ASSIGN, "kscored", **_KRES_SCORED_KW)},
{_refine_topk_sql("kscored", "k_")}
SELECT query_id, neighbor_id, rank,
       CAST(floor(cos * 10000) AS BIGINT) AS cos_permyriad
FROM k_topk
"""

# Twin of q_ann_residual_recall (extended r13): the FULL 2x2x2
# (coarse x codes x index) acceptance grid — all three trainer
# chains (raw, member-vector residual, k-means residual) plus both
# routing levels in ONE query, eight refined serve tails, total
# recall per combination
ANN_RESIDUAL_RECALL_SQL = f"""
WITH {_IVFPQ_SCORED_CTES},
{_pqr_ctes(include_base=False)},
cells2 AS (
  SELECT vec_id, cent_id AS cell FROM assigned
  WHERE rn <= {SPILL_ASSIGN}
),
sscored AS (
  SELECT DISTINCT p.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_ADC_COS_HAT_EXPR} AS cos_hat
  FROM probes p
  JOIN cells2 c ON p.cell = c.cell AND p.vec_id <> c.vec_id
  JOIN codes k ON k.vec_id = c.vec_id
  {_ADC_LUT_JOINS}
),
{_res_scored_sql(1, "rscored1")},
{_res_scored_sql(SPILL_ASSIGN, "rscored2")},
{_KMEANS_CTES},
{_pqk_trainer_ctes()},
{_pqk_serve_ctes()},
{_kraw_scored_sql(1, "kraw1")},
{_kraw_scored_sql(SPILL_ASSIGN, "kraw2")},
{_res_scored_sql(1, "kres1", **_KRES_SCORED_KW)},
{_res_scored_sql(SPILL_ASSIGN, "kres2", **_KRES_SCORED_KW)},
{_refine_topk_sql("scored", "rawsingle_")},
{_refine_topk_sql("sscored", "rawspill_")},
{_refine_topk_sql("rscored1", "ressingle_")},
{_refine_topk_sql("rscored2", "resspill_")},
{_refine_topk_sql("kraw1", "krawsingle_")},
{_refine_topk_sql("kraw2", "krawspill_")},
{_refine_topk_sql("kres1", "kressingle_")},
{_refine_topk_sql("kres2", "kresspill_")},
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT 'member_vectors' AS coarse, 'raw' AS codes,
         'single' AS index_kind, CAST(count(*) AS BIGINT) AS n_hits
  FROM rawsingle_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'member_vectors', 'raw', 'spill', CAST(count(*) AS BIGINT)
  FROM rawspill_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'member_vectors', 'residual', 'single',
         CAST(count(*) AS BIGINT)
  FROM ressingle_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'member_vectors', 'residual', 'spill',
         CAST(count(*) AS BIGINT)
  FROM resspill_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'kmeans', 'raw', 'single', CAST(count(*) AS BIGINT)
  FROM krawsingle_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'kmeans', 'raw', 'spill', CAST(count(*) AS BIGINT)
  FROM krawspill_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'kmeans', 'residual', 'single', CAST(count(*) AS BIGINT)
  FROM kressingle_topk t JOIN bf USING (query_id, neighbor_id)
  UNION ALL
  SELECT 'kmeans', 'residual', 'spill', CAST(count(*) AS BIGINT)
  FROM kresspill_topk t JOIN bf USING (query_id, neighbor_id)
),
nq AS (
  SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM bf
)
SELECT h.coarse, h.codes, h.index_kind, h.n_hits,
       (1000 * h.n_hits) // (nq.n * {TOP_K}) AS recall_permille
FROM hits h, nq
"""

# Twin of q_ann_coarse_cost: per coarse level the build price tag —
# training rounds, measured codebook size, assignment distortion
# (== the residual trainer-input energy, by identity), the residual
# family's convergence-chosen PQ depth, and total full-corpus passes
ANN_COARSE_COST_SQL = f"""
WITH {_pqr_ctes(include_base=True, trainer_only=True)},
{_KMEANS_CTES},
{_pqk_trainer_ctes()}
SELECT 'member_vectors' AS coarse,
       CAST(0 AS BIGINT) AS coarse_train_rounds,
       (SELECT CAST(count(*) AS BIGINT) FROM cent) AS coarse_cells,
       (SELECT CAST(sum(xm * xm) AS BIGINT) FROM rpx)
         AS coarse_dist_sq,
       (SELECT CAST(r AS BIGINT) FROM rship) AS pq_train_rounds,
       (SELECT CAST(r + 2 AS BIGINT) FROM rship) AS corpus_passes
UNION ALL
SELECT 'kmeans', CAST(2 AS BIGINT),
       (SELECT CAST(count(DISTINCT cid) AS BIGINT) FROM c1),
       (SELECT CAST(sum(xm * xm) AS BIGINT) FROM kpx),
       (SELECT CAST(r AS BIGINT) FROM kship),
       (SELECT CAST(r + 4 AS BIGINT) FROM kship)
"""

# Twin of q_ann_kmeans_tuning: the (spill x nprobe) surface on the
# (kmeans, residual) serving default — the kmeans code layout scored
# once at max routing with both ranks retained, per-grid-point
# best-reconstruction dedupe (GROUP BY max — residual rows differ per
# cell), refined tails, recall per point
ANN_KMEANS_TUNING_SQL = f"""
WITH {_E_CTE},
{_KMEANS_CTES},
{_pqk_trainer_ctes()},
{_pqk_serve_ctes()},
kprobesx AS (
  SELECT a.vec_id, e.norm, a.cid AS cell, CAST(a.rn AS BIGINT) AS probe_rn
  FROM kassigned a JOIN e ON e.vec_id = a.vec_id
  WHERE a.vec_id < {N_QUERIES} AND a.rn <= {max(SPILL_TUNING_NPROBES)}
),
kscoredx AS (
  SELECT p.vec_id AS query_id, k.vec_id AS neighbor_id,
         p.probe_rn, k.assign_rn,
         {_RES_COS_HAT_EXPR} AS cos_hat
  FROM kprobesx p
  JOIN kpcodes k ON k.cell = p.cell AND k.vec_id <> p.vec_id
  {_res_lut_joins("klut")}
),
grid AS (
  SELECT CAST(s.spill AS BIGINT) AS spill,
         CAST(n.np AS BIGINT) AS nprobe
  FROM (VALUES {", ".join(f"({s})" for s in SPILL_TUNING_SPILLS)})
         s(spill),
       (VALUES {", ".join(f"({p})" for p in SPILL_TUNING_NPROBES)})
         n(np)
),
cand AS (
  SELECT g.spill, g.nprobe, x.query_id, x.neighbor_id,
         max(x.cos_hat) AS cos_hat
  FROM kscoredx x JOIN grid g
    ON x.probe_rn <= g.nprobe AND x.assign_rn <= g.spill
  GROUP BY g.spill, g.nprobe, x.query_id, x.neighbor_id
),
shortx AS (
  SELECT spill, nprobe, query_id, neighbor_id FROM (
    SELECT spill, nprobe, query_id, neighbor_id,
           row_number() OVER (PARTITION BY spill, nprobe, query_id
                              ORDER BY cos_hat DESC, neighbor_id) AS rn
    FROM cand
  ) WHERE rn <= {REFINE_K}
),
exactx AS (
  SELECT s.spill, s.nprobe, s.query_id, s.neighbor_id,
         list_dot_product(q.v, c.v) / (q.norm * c.norm) AS cos
  FROM shortx s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
approxx AS (
  SELECT spill, nprobe, query_id, neighbor_id FROM (
    SELECT spill, nprobe, query_id, neighbor_id,
           row_number() OVER (PARTITION BY spill, nprobe, query_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM exactx
  ) WHERE rn <= {TOP_K}
),
bf AS (
  {KNN_BRUTEFORCE_SQL}
),
hits AS (
  SELECT a.spill, a.nprobe, CAST(count(*) AS BIGINT) AS n_hits
  FROM approxx a JOIN bf USING (query_id, neighbor_id)
  GROUP BY a.spill, a.nprobe
),
nq AS (
  SELECT CAST(count(DISTINCT query_id) AS BIGINT) AS n FROM bf
)
SELECT g.spill, g.nprobe,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       (1000 * CAST(coalesce(h.n_hits, 0) AS BIGINT))
         // (nq.n * {TOP_K}) AS recall_permille
FROM grid g LEFT JOIN hits h USING (spill, nprobe), nq
"""

QUALITY_LOGIT_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
p AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(sum(CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT)
                  % 2001 - 1000) AS BIGINT) AS s
  FROM t GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       (1000 * s) // n_tokens AS logit_milli,
       (1000 * s) // n_tokens >= 0 AS keep
FROM p
"""

_CTX_CASE = "CASE " + " ".join(
    f"WHEN n_tok >= {b} THEN {b}"
    for b in sorted(CONTEXT_BUCKETS, reverse=True)
) + " ELSE 0 END"

CONTEXT_LENGTH_REPORT_SQL = f"""
WITH d AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
),
per AS (
  SELECT CAST({_CTX_CASE} AS BIGINT) AS bucket_lo,
         count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM d GROUP BY 1
)
SELECT bucket_lo, n_docs, n_tokens,
       (1000 * n_docs) // CAST(sum(n_docs) OVER () AS BIGINT)
         AS doc_permille,
       (1000 * n_tokens) // CAST(sum(n_tokens) OVER () AS BIGINT)
         AS token_permille
FROM per
"""

MIXTURE_TEMPERATURE_SQL = """
WITH per_lang AS (
  SELECT lang,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
weighted AS (
  SELECT lang, n_tokens,
         CAST(floor(sqrt(n_tokens)) AS BIGINT) AS weight
  FROM per_lang
)
SELECT lang, n_tokens, weight,
       (1000 * weight) // CAST(sum(weight) OVER () AS BIGINT)
         AS sample_permille,
       (n_tokens * ((1000 * weight)
                    // CAST(sum(weight) OVER () AS BIGINT))) // 1000
         AS expected_tokens
FROM weighted
"""

# identical replace-trick formula as the Spark side: double-spaced
# padding makes token-boundary matches non-overlapping, so plain
# substring counting is exact
_PHRASE_NEEDLE = " " + "  ".join(PHRASE_TERMS) + " "

PHRASE_SEARCH_SQL = f"""
WITH d AS (
  SELECT doc_id,
         ' ' || replace(text, ' ', '  ') || ' ' AS p
  FROM documents
)
SELECT doc_id,
       CAST((length(p) - length(replace(p, '{_PHRASE_NEEDLE}', '')))
            / {len(_PHRASE_NEEDLE)} AS BIGINT) AS n_occurrences
FROM d
WHERE length(p) <> length(replace(p, '{_PHRASE_NEEDLE}', ''))
"""

# Twin of q_split_leakage: same cached gram artifact CTEs
# (_CONTAM_BASE's g), same md5 split assignment as CORPUS_SPLIT_SQL,
# gram -> split bitmask via bit_or, 3 pair rows via UNION ALL.
_SL_H16 = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS BIGINT)"
)

SPLIT_LEAKAGE_SQL = f"""
WITH {_CONTAM_BASE},
sg AS (
  SELECT CASE WHEN {_SL_H16} < {SPLIT_TRAIN_64K} THEN 1
              WHEN {_SL_H16} < {SPLIT_VAL_64K} THEN 2
              ELSE 4 END AS b,
         unnest(grams) AS gram_h
  FROM g
),
pm AS (SELECT gram_h, bit_or(b) AS mask FROM sg GROUP BY gram_h),
mc AS (SELECT mask, count(*) AS n FROM pm GROUP BY mask),
one AS (
  SELECT
    CAST(coalesce(sum(CASE WHEN (mask & 1) <> 0 THEN n END), 0)
         AS BIGINT) AS g_train,
    CAST(coalesce(sum(CASE WHEN (mask & 2) <> 0 THEN n END), 0)
         AS BIGINT) AS g_val,
    CAST(coalesce(sum(CASE WHEN (mask & 4) <> 0 THEN n END), 0)
         AS BIGINT) AS g_test,
    CAST(coalesce(sum(CASE WHEN (mask & 1) <> 0 AND (mask & 2) <> 0
                      THEN n END), 0) AS BIGINT) AS s_tv,
    CAST(coalesce(sum(CASE WHEN (mask & 1) <> 0 AND (mask & 4) <> 0
                      THEN n END), 0) AS BIGINT) AS s_tt,
    CAST(coalesce(sum(CASE WHEN (mask & 2) <> 0 AND (mask & 4) <> 0
                      THEN n END), 0) AS BIGINT) AS s_vt
  FROM mc
),
pairs AS (
  SELECT 'train' AS split_a, 'val' AS split_b, s_tv AS shared_grams,
         g_train AS a_grams, g_val AS b_grams FROM one
  UNION ALL
  SELECT 'train', 'test', s_tt, g_train, g_test FROM one
  UNION ALL
  SELECT 'val', 'test', s_vt, g_val, g_test FROM one
)
SELECT split_a, split_b, shared_grams, a_grams, b_grams,
       CASE WHEN least(a_grams, b_grams) > 0
            THEN (1000 * shared_grams) // least(a_grams, b_grams)
            ELSE 0 END AS leak_permille
FROM pairs
"""

# Twin of q_source_overlap: same _CONTAM_BASE gram hashing, pair
# counts via a distinct (source, gram) self-join — count semantics
# identical to the engine's bounded source-set pair expansion.
SOURCE_OVERLAP_SQL = f"""
WITH {_CONTAM_BASE},
sg AS (
  SELECT DISTINCT source, gram_h FROM (
    SELECT d.source, unnest(g.grams) AS gram_h
    FROM g JOIN documents d USING (doc_id)
  )
),
per AS (SELECT source, count(*) AS n FROM sg GROUP BY source),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS shared_grams
  FROM sg a JOIN sg b ON a.gram_h = b.gram_h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b, s.shared_grams,
       pa.n AS a_grams, pb.n AS b_grams,
       (1000 * s.shared_grams) // least(pa.n, pb.n) AS overlap_permille
FROM shared s
JOIN per pa ON pa.source = s.source_a
JOIN per pb ON pb.source = s.source_b
"""

# same CTE chain as the assignment twin, folded per cluster
KMEANS_REPORT_SQL = f"""
WITH {_KMEANS_CTES},
rep AS (
  SELECT cid AS cluster_id, count(*) AS n_vectors,
         CAST(sum(dist_sq) AS BIGINT) AS total_dist_sq
  FROM a2 GROUP BY cid
)
SELECT cluster_id, n_vectors, total_dist_sq,
       total_dist_sq // n_vectors AS mean_dist_sq
FROM rep
"""

# Twin of q_unigram_surprisal: same integer floor-log2 bit lengths
# (length(bin(x)) in both engines), same tf-weighted reduction.
UNIGRAM_SURPRISAL_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, token
),
freq AS (
  SELECT token, CAST(sum(tf) AS BIGINT) AS tok_count
  FROM tf GROUP BY token
),
tot AS (SELECT CAST(sum(tok_count) AS BIGINT) AS total FROM freq),
per AS (
  SELECT tf.doc_id,
         CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
         CAST(sum(tf.tf * (CAST(length(bin(tot.total)) AS BIGINT)
                           - CAST(length(bin(freq.tok_count)) AS BIGINT)))
              AS BIGINT) AS surprisal_bits
  FROM tf JOIN freq USING (token) CROSS JOIN tot
  GROUP BY tf.doc_id
)
SELECT doc_id, n_tokens, surprisal_bits,
       (1000 * surprisal_bits) // n_tokens AS mean_millibits
FROM per
"""

# Twin of q_kmeans_label_purity: the assignment CTE chain joined to
# the label column, majority via the same (count desc, label) order.
KMEANS_LABEL_PURITY_SQL = f"""
WITH {_KMEANS_CTES},
lab AS (
  SELECT a2.vec_id, a2.cid, CAST(e.label AS BIGINT) AS label
  FROM a2 JOIN embeddings e ON a2.vec_id = e.vec_id
),
per AS (
  SELECT cid, label, CAST(count(*) AS BIGINT) AS n
  FROM lab GROUP BY cid, label
),
ranked AS (
  SELECT cid, label, n,
         row_number() OVER (PARTITION BY cid
                            ORDER BY n DESC, label) AS rn,
         CAST(sum(n) OVER (PARTITION BY cid) AS BIGINT) AS n_vectors
  FROM per
)
SELECT cid AS cluster_id, n_vectors, label AS majority_label,
       (1000 * n) // n_vectors AS purity_permille
FROM ranked WHERE rn = 1
"""

from .functions.clustering import CLUSTER_CAP_64K  # noqa: E402

# Twin of q_kmeans_balanced_sample: assignment CTEs + K-row census +
# the same integer rate and md5 16-bit keep decision.
KMEANS_BALANCED_SAMPLE_SQL = f"""
WITH {_KMEANS_CTES},
census AS (
  SELECT cid AS cluster_id, CAST(count(*) AS BIGINT) AS n_members
  FROM a2 GROUP BY cid
),
rates AS (
  SELECT cluster_id,
         least(CAST(65536 AS BIGINT),
               ({CLUSTER_CAP_64K}
                * CAST(sum(n_members) OVER () AS BIGINT))
               // n_members) AS rate_64k
  FROM census
)
SELECT a2.vec_id, a2.cid AS cluster_id, rates.rate_64k
FROM a2 JOIN rates ON a2.cid = rates.cluster_id
WHERE CAST(('0x' || substr(md5(CAST(a2.vec_id AS VARCHAR)), 1, 4))
           AS BIGINT) < rates.rate_64k
"""

from .functions.tokenizer import PMI_MIN_PAIRS, PMI_TOP  # noqa: E402

# Twin of q_bigram_pmi: cached pair/unigram artifacts re-derived as
# CTEs, identical integer floor-log2 bit lengths.
BIGRAM_PMI_SQL = f"""
WITH t AS (
  SELECT string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
p AS (
  SELECT unnest(list_transform(range(1, len(tk)),
           i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
  FROM t
),
c AS (
  SELECT pr.l AS "left", pr.r AS "right",
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM p GROUP BY pr.l, pr.r
),
u AS (
  SELECT token, CAST(count(*) AS BIGINT) AS tok_count FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token
),
tot AS (SELECT CAST(sum(tok_count) AS BIGINT) AS total FROM u),
scored AS (
  SELECT c."left", c."right", c.n_pairs,
         CAST(length(bin(c.n_pairs)) AS BIGINT)
           + CAST(length(bin(tot.total)) AS BIGINT)
           - CAST(length(bin(ul.tok_count)) AS BIGINT)
           - CAST(length(bin(ur.tok_count)) AS BIGINT) AS pmi_bits
  FROM c
  JOIN u ul ON c."left" = ul.token
  JOIN u ur ON c."right" = ur.token
  CROSS JOIN tot
  WHERE c.n_pairs >= {PMI_MIN_PAIRS}
),
top AS (
  SELECT * FROM scored
  ORDER BY pmi_bits DESC, n_pairs DESC, "left", "right"
  LIMIT {PMI_TOP}
)
SELECT CAST(row_number() OVER (ORDER BY pmi_bits DESC, n_pairs DESC,
                               "left", "right") AS BIGINT) AS rank,
       "left", "right", n_pairs, pmi_bits
FROM top
"""

# Twin of q_token_entropy: tf CTE + per-doc total window, same
# floor-log2 bit lengths.
TOKEN_ENTROPY_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, token
),
staged AS (
  SELECT doc_id, tf,
         CAST(sum(tf) OVER (PARTITION BY doc_id) AS BIGINT) AS n
  FROM tf
),
per AS (
  SELECT doc_id,
         max(n) AS n_tokens,
         CAST(count(*) AS BIGINT) AS distinct_tokens,
         CAST(sum(tf * (CAST(length(bin(n)) AS BIGINT)
                        - CAST(length(bin(tf)) AS BIGINT))) AS BIGINT)
           AS entropy_bits_sum
  FROM staged GROUP BY doc_id
)
SELECT doc_id, n_tokens, distinct_tokens, entropy_bits_sum,
       (1000 * entropy_bits_sum) // n_tokens AS mean_millibits
FROM per
"""

# Twin of q_tokenizer_fertility.
TOKENIZER_FERTILITY_SQL = """
WITH per AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang
)
SELECT lang, n_docs, n_tokens, n_chars,
       (1000 * n_chars) // n_tokens AS chars_per_token_milli,
       (1000 * n_tokens) // n_docs AS tokens_per_doc_milli
FROM per
"""

# Twin of q_doc_length_deciles: SQL-standard ntile on the identical
# deterministic (n_chars, doc_id) order.
DOC_LENGTH_DECILES_SQL = """
WITH d AS (
  SELECT doc_id, n_chars,
         CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT)
           AS decile
  FROM documents
)
SELECT decile,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM d GROUP BY decile
"""

# Twin of q_nearest_neighbor_jaccard: the LSH candidate CTE chain,
# exact jaccard on canonical pairs, both orientations, per-doc argmax.
# shared CTE prefix: the exact-Jaccard-scored canonical candidate
# table — used by both the nearest-duplicate review and the
# threshold-tuning curve so the two oracles cannot drift
_CAND_JACCARD_CTES = f"""toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
shing AS (
  SELECT doc_id, {_SHINGLE} AS sh FROM toks
),
hpairs AS (
  SELECT doc_id,
         list_transform(sh, t -> struct_pack(
           h1 := CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT),
           h2 := CAST(('0x' || substr(md5(t), 9, 8)) AS BIGINT)
         )) AS hp
  FROM shing
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS}
  FROM hpairs
),
bands AS (
  {_BAND_SELECTS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         (1000 * CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT))
           // CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS BIGINT)
           AS jac_permille
  FROM cand c
  JOIN shing sa ON c.doc_a = sa.doc_id
  JOIN shing sb ON c.doc_b = sb.doc_id
)"""

NEAREST_NEIGHBOR_JACCARD_SQL = f"""
WITH {_CAND_JACCARD_CTES},
orient AS (
  SELECT doc_a AS doc_id, doc_b AS neighbor_id, jac_permille FROM scored
  UNION ALL
  SELECT doc_b AS doc_id, doc_a AS neighbor_id, jac_permille FROM scored
)
SELECT doc_id, neighbor_id, jac_permille FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY jac_permille DESC, neighbor_id)
              AS rn
  FROM orient
) r WHERE rn = 1
"""

from .functions.dedup import DEDUP_LADDER  # noqa: E402
from .functions.dedup import N_MINHASH  # noqa: E402

_SIG_MATCHES = " + ".join(
    f"(CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END)" for i in range(N_MINHASH)
)

# Twin of q_minhash_calibration: same scored-candidate CTE prefix (the
# sig CTE inside it carries m0..m{N-1}), agreement counted per pair.
MINHASH_CALIBRATION_SQL = f"""
WITH {_CAND_JACCARD_CTES},
cal AS (
  SELECT s.jac_permille,
         CAST({_SIG_MATCHES} AS BIGINT) AS sig_matches
  FROM scored s
  JOIN sig a ON s.doc_a = a.doc_id
  JOIN sig b ON s.doc_b = b.doc_id
)
SELECT sig_matches,
       (1000 * sig_matches) // {N_MINHASH} AS est_jac_permille,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(jac_permille) AS BIGINT) // CAST(count(*) AS BIGINT)
         AS mean_jac_permille,
       CAST(min(jac_permille) AS BIGINT) AS min_jac_permille,
       CAST(max(jac_permille) AS BIGINT) AS max_jac_permille
FROM cal GROUP BY sig_matches
"""


_LADDER_LIST = ", ".join(str(t) for t in DEDUP_LADDER)

# Twin of q_dedup_threshold_curve: same scored-candidate CTE chain,
# pair/doc survival counted per ladder threshold.
DEDUP_THRESHOLD_CURVE_SQL = f"""
WITH {_CAND_JACCARD_CTES},
ladder AS (SELECT unnest([{_LADDER_LIST}]) AS threshold_permille),
per_doc AS (
  SELECT doc_id, max(jac_permille) AS best FROM (
    SELECT doc_a AS doc_id, jac_permille FROM scored
    UNION ALL
    SELECT doc_b AS doc_id, jac_permille FROM scored
  ) GROUP BY doc_id
),
pairs_by_t AS (
  SELECT t.threshold_permille, CAST(count(s.doc_a) AS BIGINT) AS n_pairs
  FROM ladder t LEFT JOIN scored s ON s.jac_permille >= t.threshold_permille
  GROUP BY t.threshold_permille
),
docs_by_t AS (
  SELECT t.threshold_permille,
         CAST(count(p.doc_id) AS BIGINT) AS n_docs_affected
  FROM ladder t LEFT JOIN per_doc p ON p.best >= t.threshold_permille
  GROUP BY t.threshold_permille
)
SELECT CAST(p.threshold_permille AS BIGINT) AS threshold_permille,
       p.n_pairs, d.n_docs_affected
FROM pairs_by_t p JOIN docs_by_t d USING (threshold_permille)
"""

from .functions.filtering import BEST_OF_SOURCE_K  # noqa: E402

# Twin of q_best_of_source: the quality_logit reduction joined to the
# source column, per-source top-K on the identical ordering.
BEST_OF_SOURCE_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
p AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT)
                  % 2001 - 1000) AS BIGINT) AS s
  FROM t GROUP BY doc_id
),
lg AS (
  SELECT doc_id, (1000 * s) // n AS logit_milli FROM p
),
ranked AS (
  SELECT d.source, lg.doc_id, lg.logit_milli,
         CAST(row_number() OVER (PARTITION BY d.source
                                 ORDER BY lg.logit_milli DESC, lg.doc_id)
              AS BIGINT) AS rank
  FROM lg JOIN documents d ON lg.doc_id = d.doc_id
)
SELECT source, rank, doc_id, logit_milli
FROM ranked WHERE rank <= {BEST_OF_SOURCE_K}
"""

# Twin of q_ngram_lm_bits: per-doc pair counts joined to the corpus
# pair table and its left marginal, identical floor-log2 bit costs.
NGRAM_LM_BITS_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
dp AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(tk)),
           i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
  FROM t
),
per_doc AS (
  SELECT doc_id, pr.l AS l, pr.r AS r, CAST(count(*) AS BIGINT) AS cnt
  FROM dp GROUP BY doc_id, pr.l, pr.r
),
c AS (
  SELECT pr.l AS l, pr.r AS r, CAST(count(*) AS BIGINT) AS n_pairs
  FROM (
    SELECT unnest(list_transform(range(1, len(tk)),
             i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
    FROM t
  ) GROUP BY pr.l, pr.r
),
marg AS (
  SELECT l, CAST(sum(n_pairs) AS BIGINT) AS left_n FROM c GROUP BY l
),
agg AS (
  SELECT per_doc.doc_id,
         CAST(sum(cnt) AS BIGINT) AS n_bigrams,
         CAST(sum(cnt * (CAST(length(bin(marg.left_n)) AS BIGINT)
                         - CAST(length(bin(c.n_pairs)) AS BIGINT)))
              AS BIGINT) AS surprisal_bits
  FROM per_doc
  JOIN c ON per_doc.l = c.l AND per_doc.r = c.r
  JOIN marg ON per_doc.l = marg.l
  GROUP BY per_doc.doc_id
)
SELECT doc_id, n_bigrams, surprisal_bits,
       (1000 * surprisal_bits) // n_bigrams AS mean_millibits
FROM agg
"""

# Twin of q_ccnet_buckets: the bigram-LM chain with lang carried
# through, per-language ntile(3) over the identical fully-tie-broken
# (mean_millibits, doc_id) ordering, folded to the per-bucket report.
CCNET_BUCKETS_SQL = """
WITH t AS (
  SELECT doc_id, lang, string_split(text, ' ') AS tk FROM documents
  WHERE len(string_split(text, ' ')) >= 2
),
dp AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(tk)),
           i -> struct_pack(l := tk[i], r := tk[i + 1]))) AS pr
  FROM t
),
dpx AS (
  SELECT doc_id, lang, pr.l AS l, pr.r AS r FROM dp
),
c AS (
  SELECT l, r, CAST(count(*) AS BIGINT) AS n_pairs
  FROM dpx GROUP BY l, r
),
marg AS (
  SELECT l, CAST(sum(n_pairs) AS BIGINT) AS left_n FROM c GROUP BY l
),
per_doc AS (
  SELECT dpx.doc_id, dpx.lang,
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(length(bin(marg.left_n)) AS BIGINT)
                  - CAST(length(bin(c.n_pairs)) AS BIGINT)) AS BIGINT)
           AS surprisal_bits
  FROM dpx
  JOIN c ON dpx.l = c.l AND dpx.r = c.r
  JOIN marg ON dpx.l = marg.l
  GROUP BY dpx.doc_id, dpx.lang
),
scored AS (
  SELECT doc_id, lang, n_bigrams,
         (1000 * surprisal_bits) // n_bigrams AS mean_millibits
  FROM per_doc
),
bucketed AS (
  SELECT lang, n_bigrams, mean_millibits,
         ntile(3) OVER (PARTITION BY lang
                        ORDER BY mean_millibits, doc_id) AS b
  FROM scored
)
SELECT lang,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
       min(mean_millibits) AS min_millibits,
       max(mean_millibits) AS max_millibits
FROM bucketed GROUP BY lang, b
"""

# Twin of q_minhash_band_stats: the band CTE chain folded to the
# per-band bucket-population summary.
MINHASH_BAND_STATS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM documents
),
shing AS (
  SELECT doc_id, {_SHINGLE} AS sh FROM toks
),
hpairs AS (
  SELECT doc_id,
         list_transform(sh, t -> struct_pack(
           h1 := CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT),
           h2 := CAST(('0x' || substr(md5(t), 9, 8)) AS BIGINT)
         )) AS hp
  FROM shing
),
sig AS (
  SELECT doc_id,
         {_MINHASH_COLS}
  FROM hpairs
),
bands AS (
  {_BAND_SELECTS}
),
sizes AS (
  SELECT band, key, CAST(count(*) AS BIGINT) AS sz
  FROM bands GROUP BY band, key
)
SELECT band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_singletons,
       CAST(sum(CASE WHEN sz > 1 THEN sz ELSE 0 END) AS BIGINT)
         AS n_colliding_docs
FROM sizes GROUP BY band
"""

# Twin of q_kmeans_centroid_shift: the shared kmeans CTE chain's
# c0/c1/a1/a2 folded into the per-cluster convergence report.
KMEANS_CENTROID_SHIFT_SQL = f"""
WITH {_KMEANS_CTES},
shift AS (
  SELECT c1.cid,
         CAST(sum((c1.cm - c0.cm) * (c1.cm - c0.cm)) AS BIGINT)
           AS shift_sq,
         CAST(count(*) AS BIGINT) AS n_dims
  FROM c1 JOIN c0 ON c1.cid = c0.cid AND c1.dim = c0.dim
  GROUP BY c1.cid
),
mv AS (
  SELECT a1.vec_id, a1.cid AS cid1, a2.cid AS cid2
  FROM a1 JOIN a2 ON a1.vec_id = a2.vec_id
),
memb AS (
  SELECT cid2 AS cid,
         CAST(count(*) AS BIGINT) AS n_members,
         CAST(sum(CASE WHEN cid1 <> cid2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved_in
  FROM mv GROUP BY cid2
),
outs AS (
  SELECT cid1 AS cid,
         CAST(sum(CASE WHEN cid1 <> cid2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_moved_out
  FROM mv GROUP BY cid1
)
SELECT shift.cid AS cluster_id, shift.shift_sq, shift.n_dims,
       CAST(coalesce(memb.n_members, 0) AS BIGINT) AS n_members,
       CAST(coalesce(memb.n_moved_in, 0) AS BIGINT) AS n_moved_in,
       CAST(coalesce(outs.n_moved_out, 0) AS BIGINT) AS n_moved_out
FROM shift
LEFT JOIN memb ON shift.cid = memb.cid
LEFT JOIN outs ON shift.cid = outs.cid
"""

from .functions.corpus import STOPWORD_TOP  # noqa: E402

# Twin of q_stopword_candidates.
STOPWORD_CANDIDATES_SQL = f"""
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, token
),
per AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df,
         CAST(sum(tf) AS BIGINT) AS tok_count
  FROM tf GROUP BY token
),
nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
top AS (
  SELECT token, df, tok_count,
         (1000 * df) // nd.n_docs AS df_permille
  FROM per CROSS JOIN nd
  ORDER BY df DESC, token LIMIT {STOPWORD_TOP}
)
SELECT CAST(row_number() OVER (ORDER BY df DESC, token) AS BIGINT)
         AS rank,
       token, df, tok_count, df_permille
FROM top
"""

"""Streaming rule tests.

Strategy (mirrors the reference's TopologyTestDriver per-rule tests,
SURVEY.md §5): deterministic event logs in -> full expected output
compare. The transition test additionally proves batch<->streaming
equivalence: the transformWithState path over a multi-batch file
stream must produce exactly the batch lag()-window result, which is
itself oracle-checked against DuckDB.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark import adapters
from jaws_effective_processor_spark.operators.transitions import with_transitions
from jaws_effective_processor_spark.streaming import rules
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="jaws_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _memory_table(spark, q_name):
    return spark.sql(f"SELECT * FROM {q_name}")


def test_transitions_stream_equals_batch(spark, tmpdir):
    """T1 streaming == T1 batch on the sf0.001 activation log, with the
    log split across files to force multiple micro-batches."""
    events = load_table(spark, SF_SMOKE, "events")
    log = adapters.activations_log(events)

    # two chronological chunks -> two+ micro-batches in file order
    mid = log.approxQuantile("seq", [0.5], 0.0)[0]
    src = os.path.join(tmpdir, "activations")
    log.filter(F.col("seq") <= mid).coalesce(1).write.parquet(
        os.path.join(src, "batch0")
    )
    log.filter(F.col("seq") > mid).coalesce(1).write.parquet(
        os.path.join(src, "batch1")
    )

    stream = rules.dir_stream(
        spark,
        f"{src}/*",
        rules.ACTIVATION_LOG_SCHEMA,
        max_files=1,
    )
    name = f"trans_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        rules.transitions_stream(stream), name, os.path.join(tmpdir, "ckpt")
    )
    got = {
        tuple(r)
        for r in _memory_table(spark, name)
        .select(
            "name", "seq", "active", "transition_to_active", "transition_to_normal"
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in with_transitions(log)
        .select(
            "name",
            "seq",
            F.col("cur_active").alias("active"),
            "transition_to_active",
            "transition_to_normal",
        )
        .collect()
    }
    assert got == want and len(got) > 0


def _run_monolog_scenario(spark, tmpdir, rows, stream_fn, out_cols):
    src = os.path.join(tmpdir, "monolog")
    df = spark.createDataFrame(rows, schema=rules.MONOLOG_SCHEMA)
    df.coalesce(1).write.parquet(src)
    stream = rules.dir_stream(spark, src, rules.MONOLOG_SCHEMA)
    name = f"rule_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(stream_fn(stream), name, os.path.join(tmpdir, "ckpt"))
    return {
        tuple(r) for r in _memory_table(spark, name).select(*out_cols).collect()
    }


def _mono(seq, name="alarm1", latchable=True, ondelay=None, to_active=False,
          to_normal=False, ov_latched=False, ov_ondelayed=False,
          shelved_oneshot=False):
    return (seq, name, latchable, ondelay, to_active, to_normal,
            ov_latched, ov_ondelayed, shelved_oneshot)


def test_latch_scenario(spark, tmpdir):
    """LatchRuleTest 'latching' lifecycle: trigger -> flag persists ->
    Latched override observed -> flag clears (LatchRuleTest.java:119-175)."""
    rows = [
        _mono(1),                         # no transition: not latching
        _mono(2, to_active=True),         # trigger: latching
        _mono(3),                         # persists (store)
        _mono(4, ov_latched=True),        # override arrives: clears
        _mono(5, latchable=False),        # unlatchable: never flagged
    ]
    got = _run_monolog_scenario(
        spark, tmpdir, rows, rules.latch_stream, ["seq", "latching"]
    )
    assert got == {(1, False), (2, True), (3, True), (4, False), (5, False)}


def test_ondelay_scenario(spark, tmpdir):
    rows = [
        _mono(1, ondelay=5),
        _mono(2, ondelay=5, to_active=True),
        _mono(3, ondelay=5),
        _mono(4, ondelay=5, ov_ondelayed=True),
        _mono(5, ondelay=None, to_active=True),  # not registered for delay
    ]
    got = _run_monolog_scenario(
        spark, tmpdir, rows, rules.ondelay_stream, ["seq", "ondelaying"]
    )
    assert got == {(1, False), (2, True), (3, True), (4, False), (5, False)}


def test_oneshot_scenario(spark, tmpdir):
    """OneShotRuleTest: unshelving on toNormal while oneshot-shelved;
    state clears when the shelve goes away (OneShotRuleTest.java:122-168)."""
    rows = [
        _mono(1, shelved_oneshot=True),
        _mono(2, shelved_oneshot=True, to_normal=True),   # unshelve
        _mono(3, shelved_oneshot=True),                   # persists
        _mono(4, shelved_oneshot=False),                  # shelve removed: clears
        _mono(5, shelved_oneshot=False, to_normal=True),  # no shelve: no flag
    ]
    got = _run_monolog_scenario(
        spark, tmpdir, rows, rules.oneshot_stream, ["seq", "unshelving"]
    )
    assert got == {(1, False), (2, True), (3, True), (4, False), (5, False)}


def test_expiration_timer(spark, tmpdir):
    """W1: an already-expired shelve fires (clamped past-due timer) and
    emits a tombstone; a far-future one does not
    (ShelveExpirationRuleTest.java:59-100)."""
    import time

    src = os.path.join(tmpdir, "overrides")
    now_ms = int(time.time() * 1000)
    rows = [
        (1, "alarm1", "Shelved", False, now_ms - 5000),       # past due -> fires
        (2, "alarm2", "Shelved", False, now_ms + 3600_000),   # future -> silent
        (3, "alarm3", "Shelved", True, None),                 # tombstone in -> cancel
    ]
    spark.createDataFrame(rows, schema=rules.OVERRIDE_LOG_SCHEMA).coalesce(
        1
    ).write.parquet(src)

    stream = rules.dir_stream(spark, src, rules.OVERRIDE_LOG_SCHEMA)
    name = f"exp_{uuid.uuid4().hex[:8]}"
    q = (
        rules.expiration_stream(stream, "Shelved")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        fired = []
        while time.time() < deadline:
            fired = _memory_table(spark, name).collect()
            if fired:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert [(r["name"], r["tombstone"]) for r in fired] == [("alarm1", True)]


def test_ondelay_expiration_scenarios(spark, tmpdir):
    """W2 on the OnDelayed path, the reference's three named cases in
    one log (OnDelayExpirationRuleTest.java:58-100): `tombstoneMsg` —
    a REPLACED override (two records, same key) expires as ONE
    tombstone, not one per record; `notYetExpired`/`expired` — a
    past-due override fires while a far-future one stays silent; and
    the cancel case — a tombstoned override never fires."""
    import time

    src = os.path.join(tmpdir, "ondelay_overrides")
    now_ms = int(time.time() * 1000)
    rows = [
        # alarm1: override replaced (same key), both past due -> ONE fire
        (1, "alarm1", "OnDelayed", False, now_ms - 10_000),
        (2, "alarm1", "OnDelayed", False, now_ms - 5_000),
        # alarm2: not yet expired -> silent
        (3, "alarm2", "OnDelayed", False, now_ms + 3_600_000),
        # alarm3: past due but tombstoned -> cancelled
        (4, "alarm3", "OnDelayed", False, now_ms - 5_000),
        (5, "alarm3", "OnDelayed", True, None),
    ]
    spark.createDataFrame(rows, schema=rules.OVERRIDE_LOG_SCHEMA).coalesce(
        1
    ).write.parquet(src)

    stream = rules.dir_stream(spark, src, rules.OVERRIDE_LOG_SCHEMA)
    name = f"odexp_{uuid.uuid4().hex[:8]}"
    q = (
        rules.expiration_stream(stream, "OnDelayed")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt_od"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        fired = []
        while time.time() < deadline:
            fired = _memory_table(spark, name).collect()
            if fired:
                # one extra settle batch: a duplicate fire for alarm1
                # (the tombstoneMsg regression) must get the chance to
                # show up before we assert exactly-once
                time.sleep(3)
                fired = _memory_table(spark, name).collect()
                break
            time.sleep(1)
    finally:
        q.stop()
    assert [(r["name"], r["tombstone"]) for r in fired] == [("alarm1", True)]


def test_mask_scenario(spark, tmpdir):
    """Corrected T5 (MaskRule intent, MaskRule.java:27-29): a Masked
    override is added when the parent becomes active and tombstoned
    when it stops; no emission while nothing changes. The upstream
    bug this corrects: the unmask branch mapped the mask stream
    (MaskRule.java:124-125), so every add was instantly deleted."""
    import uuid as _uuid

    src = os.path.join(tmpdir, "masklog")
    rows = [
        (1, "alarm1", False, False),  # parent normal: nothing
        (2, "alarm1", True, None),    # parent activates -> mask add
        (3, "alarm1", True, True),    # still active: no re-emit
        (4, "alarm1", False, True),   # parent normal -> tombstone
        (5, "alarm2", False, True),   # already masked, parent normal
                                      # at first sight -> unmask
    ]
    spark.createDataFrame(rows, schema=rules.MASK_LOG_SCHEMA).coalesce(
        1
    ).write.parquet(src)
    stream = rules.dir_stream(spark, src, rules.MASK_LOG_SCHEMA)
    name = f"mask_{_uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        rules.mask_stream(stream), name, os.path.join(tmpdir, "ckpt")
    )
    got = {
        tuple(r)
        for r in _memory_table(spark, name)
        .select("name", "seq", "masking", "unmasking")
        .collect()
    }
    assert got == {
        ("alarm1", 2, True, False),
        ("alarm1", 4, False, True),
        ("alarm2", 5, False, True),
    }


def test_ingest_stream_dedup_quality_split(spark, tmpdir):
    """Streaming corpus ingest: cross-microbatch exact dedup by
    content fingerprint, quality gate and split assignment identical
    to the batch expressions."""
    import datetime

    from jaws_effective_processor_spark.functions.corpus import assign_split
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def doc(i, text, minute):
        return (
            i,
            text,
            "en",
            "crawl",
            t0 + datetime.timedelta(minutes=minute),
        )

    # ~25-word docs built to pass all four quality gates; the "junk"
    # doc fails length + diversity gates and must be dropped
    good = (
        "the quick brown fox jumps over a lazy sleeping dog while "
        "seven wizards of oxford brew giant black quartz potions "
        "and judge every vexing word"
    )
    good2 = (
        "a misty harbor town wakes early in cold light as fishing "
        "boats drift past stone piers carrying nets ropes lanterns "
        "and the patient hopes of sailors"
    )
    junk = "spam spam spam"
    rows0 = [doc(1, good, 0), doc(2, good2, 1), doc(3, junk, 2)]
    # batch 1 re-fetches doc 1's text under a new doc_id (dup) and
    # lands one genuinely new doc
    good3 = (
        "under desert stars an old caravan rests beside red dunes "
        "while traders share warm bread salted olives and long "
        "stories of distant rainy kingdoms"
    )
    rows1 = [doc(4, good, 7), doc(5, good3, 8)]

    src = os.path.join(tmpdir, "feed")
    for i, rows in enumerate([rows0, rows1]):
        spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA).coalesce(
            1
        ).write.parquet(os.path.join(src, f"batch{i}"))

    stream = rules.dir_stream(
        spark, f"{src}/*", ingest.DOC_FEED_SCHEMA, max_files=1
    )
    name = f"ingest_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.ingest_stream(stream), name, os.path.join(tmpdir, "ckpt")
    )
    got = {r["doc_id"]: r for r in _memory_table(spark, name).collect()}

    # doc 4 is a within-watermark re-fetch of doc 1's content; doc 3
    # fails the quality gate
    assert set(got) == {1, 2, 5}
    assert all(r["quality_score"] >= ingest.MIN_QUALITY for r in got.values())
    # split/shard match the batch assignment for the surviving doc_ids
    batch = {
        r["doc_id"]: (r["split"], r["shard"])
        for r in assign_split(
            spark.createDataFrame(rows0 + rows1, ingest.DOC_FEED_SCHEMA)
        ).collect()
    }
    for i, r in got.items():
        assert (r["split"], r["shard"]) == batch[i], i


def test_ingest_shards_sink_matches_batch_layout(spark, tmpdir):
    """Streaming ingest lands in the same (split, shard) partitioned
    layout as the batch writer, readable with per-split pruning."""
    import datetime

    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    good = (
        "the quick brown fox jumps over a lazy sleeping dog while "
        "seven wizards of oxford brew giant black quartz potions "
        "and judge every vexing word"
    )
    rows = [(1, good, "en", "crawl", t0)]
    src = os.path.join(tmpdir, "feed")
    spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "batch0"))

    out = os.path.join(tmpdir, "shards")
    q = ingest.start_ingest_shards(
        rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA),
        out,
        os.path.join(tmpdir, "ckpt"),
        available_now=True,
    )
    q.awaitTermination()

    back = spark.read.parquet(out)
    assert back.count() == 1
    row = back.collect()[0]
    assert row["doc_id"] == 1 and row["split"] in ("train", "val", "test")
    import glob as _glob

    assert _glob.glob(f"{out}/split=*/shard=*/*.parquet")


def test_decontaminate_stream_gate(spark, tmpdir):
    """Streaming decontamination: an arriving doc sharing an 8-gram
    with the static holdout gram set is dropped; clean docs and
    sub-gram-width docs pass. The gate hashes via the shared
    with_contam_grams expression, so batch and stream agree."""
    import datetime

    from jaws_effective_processor_spark.functions.corpus import (
        with_contam_grams,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    holdout_text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    )
    # doc 1 embeds an 8-token run of the holdout text -> contaminated;
    # doc 2 is clean; doc 3 is shorter than the gram width -> passes
    leaky = "intro words alpha beta gamma delta epsilon zeta eta theta tail"
    clean = "one two three four five six seven eight nine ten eleven"
    short = "tiny doc"
    rows = [
        (1, leaky, "en", "crawl", t0),
        (2, clean, "en", "crawl", t0),
        (3, short, "en", "crawl", t0),
    ]

    holdout = with_contam_grams(
        spark.createDataFrame(
            [(100, holdout_text)], "doc_id long, text string"
        )
    ).select(F.explode("grams").alias("gram_h")).distinct()

    src = os.path.join(tmpdir, "decontam_feed")
    spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"decontam_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.decontaminate_stream(stream, holdout),
        name,
        os.path.join(tmpdir, "decontam_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == {2, 3}


def test_exsub_gate_matches_batch(spark, tmpdir):
    """Streaming ExactSubstr gate == batch spans report, per doc: feed
    the sf0.001 corpus through exsub_gate_stream against the batch
    dup-gram snapshot; every flagged doc's (n_tokens, n_dup_spans,
    dup_tokens) equals q_exact_substring_spans' row exactly, no
    un-flagged doc appears in the batch report, and kept + dup ==
    total everywhere — the islands merge computed as a per-row
    integer fold agrees with the batch window-function merge."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.filtering import (
        _dup_gram_set,
    )
    from jaws_effective_processor_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    docs = load_table(spark, sf, "documents")
    feed_cols = [f.name for f in ingest.DOC_FEED_SCHEMA.fields]
    feed = docs.select(
        "doc_id", "text", "lang", "source", F.lit(t0).alias("ingest_ts")
    ).select(*feed_cols)
    src = os.path.join(tmpdir, "exsub_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"exsub_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.exsub_gate_stream(stream, _dup_gram_set(spark, sf)),
        name,
        os.path.join(tmpdir, "exsub_ckpt"),
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_spans"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["exsub_hit"],
        )
        for r in _memory_table(spark, name).collect()
    }
    assert got  # every arriving doc emits a verdict row
    batch = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["dup_tokens"])
        for r in QUERIES["exact_substring_spans"](spark, sf).collect()
    }
    flagged = {d for d, v in got.items() if v[4]}
    assert flagged == set(batch), (
        sorted(flagged - set(batch))[:5],
        sorted(set(batch) - flagged)[:5],
    )
    for d in flagged:
        n_tok, spans, dup, kept, _hit = got[d]
        assert (n_tok, spans, dup) == batch[d], (d, got[d], batch[d])
    for d, (n_tok, spans, dup, kept, hit) in got.items():
        assert kept + dup == n_tok, (d, got[d])
        assert hit == (spans > 0)


def test_exsub_bloom_gate_superset_of_exact(spark, tmpdir):
    """Bloom ExactSubstr gate vs the exact gate on the same feed
    (verdict r12 #3): the Bloom side may over-flag (disclosed false
    positives) but NEVER under-flags — per doc its dup_tokens and
    span count dominate the exact gate's, every exact hit stays a
    hit, the report stays internally consistent (kept + dup ==
    total), and the FP inflation on this fixture is bounded (the
    rate formula at EXSUB_BLOOM_BITS predicts ~0 at the sf0.001
    dup-set size)."""
    import datetime

    from jaws_effective_processor_spark.functions.filtering import (
        _dup_gram_set,
    )
    from jaws_effective_processor_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    docs = load_table(spark, sf, "documents")
    feed_cols = [f.name for f in ingest.DOC_FEED_SCHEMA.fields]
    feed = docs.select(
        "doc_id", "text", "lang", "source", F.lit(t0).alias("ingest_ts")
    ).select(*feed_cols)
    src = os.path.join(tmpdir, "exsubb_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"exsubb_{uuid.uuid4().hex[:8]}"
    dup = _dup_gram_set(spark, sf)
    rules.run_to_memory(
        ingest.exsub_bloom_gate_stream(stream, dup),
        name,
        os.path.join(tmpdir, "exsubb_ckpt"),
    )
    bloom = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_spans"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["exsub_hit"],
        )
        for r in _memory_table(spark, name).collect()
    }
    exact = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_spans"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["exsub_hit"],
        )
        for r in ingest.exsub_gate_stream(
            feed, _dup_gram_set(spark, sf)
        ).collect()
    }
    assert set(bloom) == set(exact) and bloom
    fp_docs = 0
    for d, (n_tok, spans, dup_t, kept, hit) in bloom.items():
        e_tok, e_spans, e_dup, _e_kept, e_hit = exact[d]
        assert n_tok == e_tok, (d, n_tok, e_tok)
        assert kept + dup_t == n_tok, (d, bloom[d])
        assert hit == (spans > 0)
        # no false negatives: Bloom membership is a superset
        assert dup_t >= e_dup, (d, bloom[d], exact[d])
        assert hit or not e_hit, (d, bloom[d], exact[d])
        if (spans, dup_t) != (e_spans, e_dup):
            fp_docs += 1
    # FP rate (1 - e^(-kn/m))^k is < 1e-4 per window at this dup-set
    # size; allow a thin margin rather than asserting exact zero
    assert fp_docs <= max(2, len(bloom) // 100), fp_docs


def test_exsub_gate_auto_boundaries(spark, monkeypatch):
    """The auto gate's planner probe at its decision boundaries (r13
    verdict item 4): a dup set exactly AT broadcast_max stays on the
    exact broadcast gate; ONE past it switches to the exact join
    gate; the Bloom shape is reachable ONLY by the explicit
    allow_fp opt-in (exactness is never traded silently). Both the
    pure decision function and the real delegation path (including
    the static-side count probe) are exercised; per-shape output
    parity is each gate's own stream test."""
    from jaws_effective_processor_spark.streaming import ingest

    # pure decision function at the boundaries
    assert ingest._exsub_gate_choice(10, 10, False) == "broadcast"
    assert ingest._exsub_gate_choice(10, 10, True) == "broadcast"
    assert ingest._exsub_gate_choice(11, 10, False) == "join"
    assert ingest._exsub_gate_choice(11, 10, True) == "bloom"
    assert ingest._exsub_gate_choice(0, 0, False) == "broadcast"

    # delegation: the probe counts the REAL static frame and routes
    # to the matching gate with the caller's frames/watermark
    seen = []
    monkeypatch.setattr(
        ingest,
        "exsub_gate_stream",
        lambda d, g: seen.append(("broadcast", d)) or "B",
    )
    monkeypatch.setattr(
        ingest,
        "exsub_bloom_gate_stream",
        lambda d, g: seen.append(("bloom", d)) or "F",
    )
    monkeypatch.setattr(
        ingest,
        "exsub_join_gate_stream",
        lambda d, g, watermark: seen.append(("join", d, watermark))
        or "J",
    )
    dup = spark.range(10).select(F.col("id").alias("gram_h"))
    assert ingest.exsub_gate_auto("docs", dup, broadcast_max=10) == "B"
    assert ingest.exsub_gate_auto("docs", dup, broadcast_max=9) == "J"
    assert (
        ingest.exsub_gate_auto(
            "docs", dup, broadcast_max=9, allow_fp=True
        )
        == "F"
    )
    assert (
        ingest.exsub_gate_auto(
            "docs", dup, broadcast_max=9, watermark="5 minutes"
        )
        == "J"
    )
    assert seen[0][0] == "broadcast" and seen[1][0] == "join"
    assert seen[2][0] == "bloom" and seen[3][2] == "5 minutes"


def test_exsub_join_gate_matches_exact(spark, tmpdir):
    """The exploded-join ExactSubstr gate == the broadcast exact gate,
    per doc, THROUGH A REAL WATERMARKED STREAM: feed the sf0.001
    corpus as batch0 plus a far-future flush doc as batch1
    (max_files=1 so the flush advances the watermark and closes
    batch0's groups), and every emitted doc's full spans report
    equals the broadcast gate's — the stream-static join + regroup
    reassembles exactly the per-row fold's numbers, with the
    sentinel row keeping zero-hit and sub-CONTAM_K docs present."""
    import datetime

    from jaws_effective_processor_spark.functions.filtering import (
        _dup_gram_set,
    )
    from jaws_effective_processor_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    docs = load_table(spark, sf, "documents")
    feed_cols = [f.name for f in ingest.DOC_FEED_SCHEMA.fields]
    feed = docs.select(
        "doc_id", "text", "lang", "source", F.lit(t0).alias("ingest_ts")
    ).select(*feed_cols)
    src = os.path.join(tmpdir, "exsubj_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    flush = spark.createDataFrame(
        [(-1, "flush doc", "en", "flush",
          t0 + datetime.timedelta(days=30))],
        ingest.DOC_FEED_SCHEMA,
    )
    flush.coalesce(1).write.parquet(os.path.join(src, "batch1"))
    stream = rules.dir_stream(
        spark, f"{src}/*", ingest.DOC_FEED_SCHEMA, max_files=1
    )
    name = f"exsubj_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.exsub_join_gate_stream(stream, _dup_gram_set(spark, sf)),
        name,
        os.path.join(tmpdir, "exsubj_ckpt"),
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_spans"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["exsub_hit"],
        )
        for r in _memory_table(spark, name).collect()
        if r["doc_id"] >= 0
    }
    exact = {
        r["doc_id"]: (
            r["n_tokens"],
            r["n_dup_spans"],
            r["dup_tokens"],
            r["kept_tokens"],
            r["exsub_hit"],
        )
        for r in ingest.exsub_gate_stream(
            feed, _dup_gram_set(spark, sf)
        ).collect()
    }
    assert got == exact
    assert got


def test_ccnet_gate_matches_batch(spark, tmpdir):
    """Streaming CCNet gate vs the batch bucketing, THROUGH A REAL
    WATERMARKED STREAM (the exsub join-gate harness: batch0 corpus +
    far-future flush doc at max_files=1): replayed corpus docs'
    mean_millibits equal the batch per-doc scores EXACTLY (no
    unknown bigrams on a replay), buckets agree except the disclosed
    boundary class (a doc whose mean equals a tercile boundary
    buckets LOWER under thresholds while ntile may split the tie
    positionally — any disagreement must sit exactly ON the
    boundary between the two buckets), sub-2-token docs emit
    'short', and the flush doc's unseen language emits
    'unknown_lang' (its 'flush doc' bigram is also a novel pair,
    exercising the UNK ceiling)."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.tokenizer import (
        _pair_count_table,
    )
    from jaws_effective_processor_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    docs = load_table(spark, sf, "documents")
    feed = docs.select(
        "doc_id", "text", "lang", "source", F.lit(t0).alias("ingest_ts")
    )
    src = os.path.join(tmpdir, "ccnet_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    flush = spark.createDataFrame(
        [(-1, "flush doc", "zz", "flush",
          t0 + datetime.timedelta(days=30))],
        ingest.DOC_FEED_SCHEMA,
    )
    flush.coalesce(1).write.parquet(os.path.join(src, "batch1"))
    stream = rules.dir_stream(
        spark, f"{src}/*", ingest.DOC_FEED_SCHEMA, max_files=1
    )
    th = ingest.ccnet_thresholds(spark, sf)
    assert th and all(h <= m for _, h, m in th)
    name = f"ccnet_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.ccnet_gate_stream(
            stream, _pair_count_table(spark, sf), th
        ),
        name,
        os.path.join(tmpdir, "ccnet_ckpt"),
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["mean_millibits"], r["bucket"])
        for r in _memory_table(spark, name).collect()
    }
    assert got
    # the flush doc's OWN group stays open (nothing later advances
    # the watermark past it) — append mode emits batch0 only
    assert -1 not in got
    # unseen-lang + novel-bigram (UNK ceiling) semantics, via the
    # same gate run as a batch query (watermark no-op), like the
    # exsub exact-gate parity pattern
    fl = {
        r["doc_id"]: (r["n_bigrams"], r["mean_millibits"], r["bucket"])
        for r in ingest.ccnet_gate_stream(
            flush, _pair_count_table(spark, sf), th
        ).collect()
    }[-1]
    assert fl[0] == 1 and fl[1] is not None and fl[2] == "unknown_lang"

    # batch per-doc scores + tie-splitting ntile buckets
    lm = {
        r["doc_id"]: (r["n_bigrams"], r["mean_millibits"])
        for r in QUERIES["ngram_lm_bits"](spark, sf).collect()
    }
    langs = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", "lang").collect()
    }
    bounds = {lang: (h, m) for lang, h, m in th}
    # recompute the batch ntile assignment per doc for comparison
    from pyspark.sql import Window

    per_doc = (
        QUERIES["ngram_lm_bits"](spark, sf)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .withColumn(
            "b",
            F.ntile(3).over(
                Window.partitionBy("lang").orderBy(
                    "mean_millibits", "doc_id"
                )
            ),
        )
    )
    batch_bucket = {
        r["doc_id"]: ["head", "middle", "tail"][r["b"] - 1]
        for r in per_doc.collect()
    }
    order = {"head": 0, "middle": 1, "tail": 2}
    for d, (nb, mb, bucket) in got.items():
        if d not in lm:  # sub-2-token doc: excluded by batch
            assert nb == 0 and mb is None and bucket == "short", (d, got[d])
            continue
        assert (nb, mb) == lm[d], (d, got[d], lm[d])
        if bucket != batch_bucket[d]:
            # only the disclosed boundary class may disagree, and
            # thresholds always choose the LOWER bucket of the two
            h, m = bounds[langs[d]]
            assert order[bucket] < order[batch_bucket[d]], (d, bucket)
            assert mb in (h, m), (d, mb, h, m)


def test_vector_ingest_pq_codes_match_batch(spark, tmpdir):
    """With a PQ codebook, the streaming ingest lands the SAME packed
    code the batch coder assigns (shared with_pq_codes expressions,
    shared literal codebook), so the landed store's pq_code column and
    the batch index artifact can never disagree."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "vpq_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    cents = sv.load_centroids(spark, sf)
    cb = sv.load_pq_codebook(spark, sf)
    stream = rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA)
    name = f"vpq_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        sv.vector_ingest_stream(stream, cents, pq_codebook=cb),
        name,
        os.path.join(tmpdir, "vpq_ckpt"),
    )
    got = {
        r["vec_id"]: r["pq_code"]
        for r in _memory_table(spark, name).collect()
    }
    batch = {
        r["vec_id"]: r["pq_code"]
        for r in QUERIES["pq_quantize"](spark, sf).collect()
    }
    # the stream drops zero-norm vectors; every landed code must match
    assert got
    assert all(batch[k] == v for k, v in got.items())


def test_sessionize_stream_matches_batch(spark, tmpdir):
    """Replaying the events table through the native session-window
    sessionizer lands the batch q_events_sessionization sessions —
    same (user, start, end, n_events) set (the batch ordinal
    session_id has no streaming meaning). A far-future sentinel event
    in a second micro-batch pushes the watermark past every real
    session so append mode flushes them all; the sentinel user is
    excluded from the comparison. The feed ALSO carries a synthetic
    boundary user with an exact-1800000 ms gap (must MERGE, per the
    batch rule's strict-> split) and an exact-1800001 ms gap (must
    SPLIT) — pinning that the native session_window's merge horizon
    is INCLUSIVE and therefore batch-identical at the exact-threshold
    boundary (settles ADVICE r9: no exact-gap precondition needed)."""
    from pyspark.sql import types as T

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.streaming.ingest import (
        sessionize_stream,
    )

    from jaws_effective_processor_spark.relational import ms_of

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    ev = raw.select("user_id", ms_of(raw, "ts").alias("ms"))

    # synthetic boundary user: gap of exactly 1800000 ms (merge) then
    # exactly 1800001 ms (split) — expected sessions: (t0, t0+1800000,
    # 2 events) and a singleton at t0+3600001
    t0 = 86400000
    boundary = spark.createDataFrame(
        [(-2, t0), (-2, t0 + 1800000), (-2, t0 + 3600001)],
        "user_id long, ms long",
    )
    ev = ev.unionByName(boundary)

    events = ev.select(
        "user_id", F.timestamp_millis(F.col("ms")).alias("ts")
    )
    src = os.path.join(tmpdir, "sess_feed")
    events.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    far = ev.agg(
        F.timestamp_millis(F.max("ms") + 10 * 86400000).alias("ts")
    ).select(F.lit(-1).cast("long").alias("user_id"), "ts")
    far.coalesce(1).write.parquet(os.path.join(src, "batch1"))

    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    stream = rules.dir_stream(spark, f"{src}/*", schema, max_files=1)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        sessionize_stream(stream),
        name,
        os.path.join(tmpdir, "sess_ckpt"),
    )
    rows = {
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"])
        for r in _memory_table(spark, name).collect()
        if r["user_id"] != -1
    }
    got = {t for t in rows if t[0] != -2}
    batch = {
        (r["user_id"], r["start_ms"], r["end_ms"], r["n_events"])
        for r in QUERIES["events_sessionization"](spark, sf).collect()
    }
    assert got == batch
    assert got  # non-vacuous
    # the boundary user: exact-threshold gap MERGED, +1 ms gap SPLIT
    assert {t for t in rows if t[0] == -2} == {
        (-2, t0, t0 + 1800000, 2),
        (-2, t0 + 3600001, t0 + 3600001, 1),
    }


def test_daily_rollup_stream_matches_batch(spark, tmpdir):
    """Replaying the events table through the tumbling-day rollup
    stream lands the batch q_events_daily rows exactly (same UTC
    epoch-day buckets, same counts, same exact cents sums); the
    far-future sentinel closes every real day so append mode flushes
    them all."""
    from pyspark.sql import types as T

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.relational import ms_of
    from jaws_effective_processor_spark.streaming.ingest import (
        daily_rollup_stream,
    )

    sf = "/root/testdata/sf0.001"
    raw = load_table(spark, sf, "events")
    ev = raw.select(
        ms_of(raw, "ts").alias("ms"), "event_type", "value"
    )
    events = ev.select(
        F.timestamp_millis(F.col("ms")).alias("ts"), "event_type", "value"
    )
    src = os.path.join(tmpdir, "daily_feed")
    events.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    far = ev.agg(
        F.timestamp_millis(F.max("ms") + 30 * 86400000).alias("ts")
    ).select("ts", F.lit("_flush").alias("event_type"),
             F.lit(0.0).alias("value"))
    far.coalesce(1).write.parquet(os.path.join(src, "batch1"))

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    stream = rules.dir_stream(spark, f"{src}/*", schema, max_files=1)
    name = f"daily_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        daily_rollup_stream(stream),
        name,
        os.path.join(tmpdir, "daily_ckpt"),
    )
    got = {
        (r["day_bucket"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in _memory_table(spark, name).collect()
        if r["event_type"] != "_flush"
    }
    batch = {
        (r["day_bucket"], r["event_type"]): (r["n"], r["sum_value_cents"])
        for r in QUERIES["events_daily"](spark, sf).collect()
    }
    assert got == batch
    assert got


def test_debounce_gate_matches_batch(spark, tmpdir):
    """Replaying the events table through the streaming debounce gate
    (two micro-batches, split by event_id so state carries across the
    trigger boundary) lands EXACTLY the batch q_events_debounce
    verdicts — same retained event_ids, same gaps, NULL for series
    starts."""
    from pyspark.sql import types as T

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.streaming.ingest import (
        debounce_gate_stream,
    )

    sf = "/root/testdata/sf0.001"
    events = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = os.path.join(tmpdir, "deb_feed")
    events.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(
        os.path.join(src, "batch0")
    )
    events.filter(F.col("event_id") > mid).coalesce(1).write.parquet(
        os.path.join(src, "batch1")
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = rules.dir_stream(spark, f"{src}/*", schema, max_files=1)
    name = f"deb_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        debounce_gate_stream(stream),
        name,
        os.path.join(tmpdir, "deb_ckpt"),
    )
    rows = _memory_table(spark, name).collect()
    got = {
        (r["user_id"], r["event_type"], r["event_id"]): r["gap_ms"]
        for r in rows
    }
    batch = {
        (r["user_id"], r["event_type"], r["event_id"]): r["gap_ms"]
        for r in QUERIES["events_debounce"](spark, sf).collect()
    }
    assert got == batch
    assert any(v is None for v in batch.values())  # series starts
    # the feed is id-ordered across triggers, so the parity
    # precondition held and the observability counter says so
    assert all(r["order_regressions"] == 0 for r in rows)


def test_debounce_gate_counts_order_regressions(spark, tmpdir):
    """A source that splits a (user, event_type) series OUT of
    event_id order across micro-batch boundaries violates the gate's
    parity precondition — instead of silently diverging from batch,
    the gate's max-seen-id state counts every cross-trigger
    regression and surfaces the running total on the output rows
    (r10 verdict item 5)."""
    import datetime

    from pyspark.sql import types as T

    from jaws_effective_processor_spark.streaming.ingest import (
        debounce_gate_stream,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    day = datetime.timedelta(days=1)
    mk = lambda ids: [  # noqa: E731 — wide gaps so every event passes
        (i, t0 + i * day, 7, "click") for i in ids
    ]
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    src = os.path.join(tmpdir, "oo_feed")
    # trigger 1 carries the TAIL of the series, trigger 2 the head
    spark.createDataFrame(mk([4, 5, 6]), schema).coalesce(1).write.parquet(
        os.path.join(src, "batch0")
    )
    spark.createDataFrame(mk([1, 2, 3]), schema).coalesce(1).write.parquet(
        os.path.join(src, "batch1")
    )
    stream = rules.dir_stream(spark, f"{src}/*", schema, max_files=1)
    name = f"oo_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        debounce_gate_stream(stream),
        name,
        os.path.join(tmpdir, "oo_ckpt"),
    )
    by_eid = {
        r["event_id"]: r["order_regressions"]
        for r in _memory_table(spark, name).collect()
    }
    # trigger 1 saw a fresh key: no regressions yet
    assert by_eid[4] == by_eid[5] == by_eid[6] == 0
    # trigger 2's three ids all regress below trigger 1's max (6)
    assert by_eid[1] == by_eid[2] == by_eid[3] == 3


def test_vector_ingest_stream_matches_batch(spark, tmpdir):
    """Streaming vector ingest: cell routing equals the batch IVF
    assignment bit-for-bit (expression argmax == window argmax, shared
    fold-order norms) and the quantized payload equals the batch
    quantizer; zero-norm vectors are rejected."""
    import datetime

    from jaws_effective_processor_spark.functions.similarity import (
        _cell_assignment,
        _vectors,
        q_embedding_quantize,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "vec_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    cents = sv.load_centroids(spark, sf)
    stream = rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA)
    name = f"vecingest_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        sv.vector_ingest_stream(stream, cents),
        name,
        os.path.join(tmpdir, "vec_ckpt"),
    )
    got = {r["vec_id"]: r for r in _memory_table(spark, name).collect()}

    batch_cells = {
        r["vec_id"]: r["cell"]
        for r in _cell_assignment(_vectors(spark, sf)).collect()
    }
    assert set(got) == set(batch_cells)  # zero-norm drop matches
    assert {k: v["cell"] for k, v in got.items()} == batch_cells

    batch_q = {
        r["vec_id"]: (r["scale_micro"], r["q_csv"])
        for r in q_embedding_quantize(spark, sf).collect()
    }
    for k, v in got.items():
        assert (v["scale_micro"], v["q_csv"]) == batch_q[k]


def test_vector_shards_sink_cell_partitioned(spark, tmpdir):
    """The streaming vector sink lands cell-partitioned parquet — each
    cell directory is the file set an IVF probe of that cell reads."""
    import datetime
    import glob as _glob

    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .limit(20)
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "vec_sink_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    out = os.path.join(tmpdir, "vec_store")
    q = sv.start_vector_shards(
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        sv.load_centroids(spark, sf),
        out,
        os.path.join(tmpdir, "vec_sink_ckpt"),
        available_now=True,
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    assert back.count() > 0
    assert set(back.columns) == {
        "vec_id", "label", "ingest_ts", "scale_micro", "q_csv", "cell",
    }
    assert _glob.glob(f"{out}/cell=*/*.parquet")


def test_gopher_gate_stream_matches_batch(spark, tmpdir):
    """Streaming Gopher rule gate keeps exactly the docs the batch
    rule filter keeps — shared with_gopher_stats expressions, so the
    verdict sets must be identical on the same feed."""
    import datetime

    from jaws_effective_processor_spark.functions.filtering import (
        with_gopher_stats,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    good = (
        "the quick brown fox jumps over a lazy sleeping dog while "
        "seven wizards of oxford brew giant black quartz potions "
        "and judge every vexing word"
    )
    rows = [
        (1, good, "en", "crawl", t0),
        (2, "too short", "en", "crawl", t0),  # fails length floor
        (3, "the " * 30 + "of a", "en", "crawl", t0),  # top-token dominance
    ]
    src = os.path.join(tmpdir, "gq_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    batch_kept = {
        r["doc_id"]
        for r in with_gopher_stats(feed).filter("keep").collect()
    }
    assert batch_kept == {1}

    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"gq_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.gopher_gate_stream(stream),
        name,
        os.path.join(tmpdir, "gq_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == batch_kept


def test_bloom_gate_stream_drops_known_content(spark, tmpdir):
    """Streaming Bloom gate: an arriving doc whose text was already
    ingested is dropped (all k positions set); novel docs pass. The
    gate hashes via the shared bloom_positions expression."""
    import datetime

    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    seen = "this exact body of text was already ingested yesterday"
    novel = "a completely new crawl result never before observed"
    ingested = spark.createDataFrame(
        [(100, seen)], "doc_id long, text string"
    )
    rows = [
        (1, seen, "en", "crawl", t0),
        (2, novel, "en", "crawl", t0),
    ]
    src = os.path.join(tmpdir, "bg_feed")
    spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"bg_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.bloom_gate_stream(stream, ingested),
        name,
        os.path.join(tmpdir, "bg_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == {2}


def test_token_threshold_stream_emits_once(spark, tmpdir):
    """Cumulative cross-batch token counting with emit-once semantics:
    a token crossing the threshold in batch 2 is emitted exactly once
    with its cumulative count; tokens never crossing stay silent."""
    import datetime

    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    b0 = [(1, "hot hot warm cold", "en", "crawl", t0)]
    b1 = [(2, "hot warm warm", "en", "crawl", t0)]
    src = os.path.join(tmpdir, "tt_feed")
    spark.createDataFrame(b0, ingest.DOC_FEED_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "batch0"))
    spark.createDataFrame(b1, ingest.DOC_FEED_SCHEMA).coalesce(
        1
    ).write.parquet(os.path.join(src, "batch1"))
    # maxFilesPerTrigger=1 -> each batch dir is its own micro-batch,
    # so the crossing genuinely spans state checkpoints
    stream = rules.dir_stream(
        spark, f"{src}/*", ingest.DOC_FEED_SCHEMA, max_files=1
    )
    name = f"tt_{uuid.uuid4().hex[:8]}"
    ckpt = os.path.join(tmpdir, "tt_ckpt")
    # threshold 3: no single batch crosses alone (hot: 2 then 1,
    # warm: 1 then 2); only the cumulative count does. cold never.
    rules.run_to_memory(
        ingest.token_threshold_stream(stream, 3), name, ckpt
    )
    got = {
        (r["token"], r["n_occurrences"])
        for r in _memory_table(spark, name).collect()
    }
    assert got == {("hot", 3), ("warm", 3)}


def test_pii_redact_stream_matches_batch(spark, tmpdir):
    """Streamed redaction output equals the batch operator's on the
    same docs (shared pattern chain)."""
    import datetime

    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "email bob@x.co and url https://a.b/c plus 42", "en", "c", t0),
        (2, "clean text only", "en", "c", t0),
    ]
    src = os.path.join(tmpdir, "pr_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"pr_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.pii_redact_stream(stream),
        name,
        os.path.join(tmpdir, "pr_ckpt"),
    )
    got = {
        r["doc_id"]: (r["text"], r["n_redactions"])
        for r in _memory_table(spark, name).collect()
    }
    assert got[1] == ("email <email> and url <url> plus <num>", 3)
    assert got[2] == ("clean text only", 0)


def test_logit_gate_stream_matches_batch(spark, tmpdir):
    """Streaming logit gate keeps exactly the docs whose per-row
    classifier logit is >= 0 — same _token_weight expression as the
    batch q_quality_logit reduction, so the verdict sets must be
    identical on the same feed."""
    import datetime

    from jaws_effective_processor_spark.functions.filtering import (
        LOGIT_MILLI_EXPR,
        logit_stat_columns,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, " ".join(f"t{i}_{j}" for j in range(12)), "en", "crawl", t0)
        for i in range(30)
    ]
    src = os.path.join(tmpdir, "lg_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    batch_kept = {
        r["doc_id"]
        for r in feed.select("doc_id", *logit_stat_columns())
        .filter(F.expr(LOGIT_MILLI_EXPR) >= 0)
        .collect()
    }
    # the hash-weighted feed must split both ways or the gate is vacuous
    assert 0 < len(batch_kept) < len(rows)

    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"lg_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.logit_gate_stream(stream),
        name,
        os.path.join(tmpdir, "lg_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == batch_kept


def test_neardup_gate_stream_matches_batch_candidates(spark, tmpdir):
    """Streaming LSH near-dup gate drops exactly the arriving docs
    that share a band bucket with the ingested corpus — the same
    candidate set the batch MinHash-LSH pass would generate, computed
    from the shared shingle/minhash/band expressions. A verbatim copy
    of an ingested doc shares every band and must always be dropped."""
    import datetime

    from jaws_effective_processor_spark.functions.dedup import (
        _shingles,
        explode_band_buckets,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    seen = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    ingested = spark.createDataFrame(
        [(100, seen)], "doc_id long, text string"
    )
    rows = [
        (1, seen, "en", "crawl", t0),  # verbatim copy: every band hits
        (2, near, "en", "crawl", t0),  # near-dup: gate follows batch bands
        (3, "completely unrelated words about spark shuffles", "en",
         "crawl", t0),
        (4, "another novel document with fresh vocabulary", "en",
         "crawl", t0),
    ]
    src = os.path.join(tmpdir, "nd_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    def bands_of(df):
        shing = df.select(
            "doc_id", _shingles(F.split(F.col("text"), " ")).alias("sh")
        )
        return explode_band_buckets(shing)

    corpus_buckets = {
        (r["band"], r["key"]) for r in bands_of(ingested).collect()
    }
    batch_kept = set()
    feed_bands: dict[int, set] = {}
    for r in bands_of(feed.select("doc_id", "text")).collect():
        feed_bands.setdefault(r["doc_id"], set()).add((r["band"], r["key"]))
    for doc_id, bks in feed_bands.items():
        if not (bks & corpus_buckets):
            batch_kept.add(doc_id)
    assert 1 not in batch_kept  # the verbatim copy always collides

    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"nd_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.neardup_gate_stream(stream, ingested),
        name,
        os.path.join(tmpdir, "nd_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == batch_kept


def test_logit_gate_weighted_matches_hash_gate(spark, tmpdir):
    """The weight-TABLE quality gate (model artifact as a one-row
    broadcast vocab map) reproduces the inline-hash gate's verdicts
    exactly when fed the same md5-derived weights as a table — the
    real-model path and its stand-in are interchangeable. OOV
    behavior pinned separately: an EMPTY weight table scores every
    doc 0 and keeps everything."""
    import datetime

    from jaws_effective_processor_spark.functions.filtering import (
        _token_weight,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, " ".join(f"tok{(i * 7 + j) % 23}" for j in range(12)),
         "en", "crawl", t0)
        for i in range(40)
    ]
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    hash_kept = {
        r["doc_id"]
        for r in ingest.logit_gate_stream(feed).collect()
    }
    assert 0 < len(hash_kept) < len(rows)  # gate must split the feed

    vocab = feed.select(
        F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    weights = vocab.select(
        "token", _token_weight(F.col("token")).alias("w_milli")
    )
    src = os.path.join(tmpdir, "lgw_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"lgw_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.logit_gate_stream_weighted(stream, weights),
        name,
        os.path.join(tmpdir, "lgw_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == hash_kept

    # OOV: empty weight table -> every token scores 0 -> all kept
    empty = weights.filter(F.lit(False))
    assert (
        ingest.logit_gate_stream_weighted(feed, empty).count() == len(rows)
    )


def test_importance_gate_stream_matches_batch(spark, tmpdir):
    """The streaming quality-proportional sampler keeps exactly the
    docs the batch q_importance_resampling marks kept=true on the
    same corpus — shared quality stats + md5 draw expressions, so a
    backfill and the live stream converge doc-for-doc. The fixture
    must actually split (some kept, some dropped)."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    texts = [
        " ".join(
            ("the quick brown fox jumps over a lazy dog near the %d bank"
             % j).split()
            * (2 + j % 5)
        )
        for j in range(30)
    ]
    rows = [(i, t, "en", "crawl", t0) for i, t in enumerate(texts)]
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)

    # batch verdicts over the same corpus written as a documents table
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(tmpdir, "imp_docs")
    os.makedirs(d, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts), pa.string()),
                "source": pa.array(["crawl"] * len(texts), pa.string()),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    batch_kept = {
        r["doc_id"]
        for r in QUERIES["importance_resampling"](spark, d).collect()
        if r["kept"]
    }
    assert 0 < len(batch_kept) < len(texts)

    src = os.path.join(tmpdir, "imp_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"imp_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.importance_gate_stream(stream),
        name,
        os.path.join(tmpdir, "imp_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == batch_kept


def test_dsir_gate_matches_batch_resample(spark, tmpdir):
    """The streaming DSIR gate keeps exactly the documents the batch
    q_dsir_resample marks kept=true on the same corpus: the FULL
    sf0.001 documents table replayed as a feed (holdout/target docs
    included — the gate itself must drop them, ADVICE r10: batch
    emits no decision for the target sample, so admitting one would
    both diverge from batch and leak the target into the training
    corpus) against the broadcast 2^16-bucket bits table lands the
    identical kept set (shared gram hashing, bucket lookup, DIV
    weight, rate map, and md5 draw), and a doc too short to featurize
    never passes the gate (the batch weight table has no row for it).
    The fixture must actually split and must contain holdout docs."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.corpus import (
        CONTAM_K,
        HOLDOUT_MOD,
        dsir_bucket_bits_frame,
    )
    from jaws_effective_processor_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    batch_rows = QUERIES["dsir_resample"](spark, sf).collect()
    batch_kept = {r["doc_id"] for r in batch_rows if r["kept"]}
    assert 0 < len(batch_kept) < len(batch_rows)  # real split

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    docs = load_table(spark, sf, "documents")
    assert docs.filter(F.col("doc_id") % HOLDOUT_MOD == 0).count() > 0
    feed = docs.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.lit(t0).cast("timestamp").alias("ingest_ts"),
    )
    # an unfeaturizable short doc (< CONTAM_K tokens) must be dropped
    short = spark.createDataFrame(
        [(-7, " ".join(["w"] * (CONTAM_K - 1)), "en", "crawl", t0)],
        ingest.DOC_FEED_SCHEMA,
    )
    feed = feed.unionByName(short)

    src = os.path.join(tmpdir, "dsir_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"dsir_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.dsir_gate_stream(
            stream, dsir_bucket_bits_frame(spark, sf)
        ),
        name,
        os.path.join(tmpdir, "dsir_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert -7 not in got
    assert got == batch_kept


def test_dsir_gate_novel_vocab_matches_python_replay(spark, tmpdir):
    """A doc whose grams hash into buckets NO snapshot gram occupies
    (novel vocabulary) must score those grams at bits 0 — the
    coalesce path the corpus-replay parity test cannot reach, checked
    against a plain-Python replay of the whole chain: token md5
    7-hex-char hashes, the rolling gram combine, bucket fold, DIV
    weight, clamped rate map, md5(doc_id) draw."""
    import datetime
    import hashlib

    from jaws_effective_processor_spark.functions import corpus as C
    from jaws_effective_processor_spark.streaming import ingest

    sf = "/root/testdata/sf0.001"
    bb = {
        r["bucket"]: r["bits"]
        for r in C.dsir_bucket_bits_frame(spark, sf).collect()
    }

    def replay(doc_id: int, text: str):
        toks = text.split(" ")
        th = [
            int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in toks
        ]
        grams = []
        for i in range(len(th) - C.CONTAM_K + 1):
            acc = th[i]
            for o in range(1, C.CONTAM_K):
                acc = (acc * C.CONTAM_MULT + th[i + o]) % C.CONTAM_P
            grams.append(acc)
        grams = list(dict.fromkeys(grams))  # array_distinct order
        if not grams:
            return None, False
        wb = sum(bb.get(g % C.DSIR_BUCKETS, 0) for g in grams)
        # Spark's DIV truncates toward zero; Python // floors, so
        # divide magnitudes and re-sign (exact integer arithmetic)
        pgm = (abs(1000 * wb) // len(grams)) * (1 if wb >= 0 else -1)
        rate = max(0, min(1000, 1000 + (pgm - C.DSIR_CENTER_MILLI) * C.DSIR_SLOPE))
        draw = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16)
            % 1000
        )
        return sum(1 for g in grams if g % C.DSIR_BUCKETS not in bb), (
            draw < rate
        )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1000 + i, " ".join(f"zxqv{i}tok{j}" for j in range(12)), "xx",
         "novel", t0)
        for i in range(30)
    ]
    novel_misses = [replay(r[0], r[1])[0] for r in rows]
    assert sum(novel_misses) > 0  # the fixture actually hits empty buckets
    # doc_id 1000 is a HOLDOUT id (1000 % HOLDOUT_MOD == 0) — the gate
    # must drop it regardless of its draw (ADVICE r10 domain rule)
    assert any(r[0] % C.HOLDOUT_MOD == 0 for r in rows)
    expected = {
        r[0]
        for r in rows
        if r[0] % C.HOLDOUT_MOD != 0 and replay(r[0], r[1])[1]
    }

    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    src = os.path.join(tmpdir, "dsirn_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"dsirn_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        ingest.dsir_gate_stream(
            stream, C.dsir_bucket_bits_frame(spark, sf)
        ),
        name,
        os.path.join(tmpdir, "dsirn_ckpt"),
    )
    got = {r["doc_id"] for r in _memory_table(spark, name).collect()}
    assert got == expected


def test_media_gate_parity(spark, tmpdir):
    """The streaming perceptual-hash media gate: (1) broadcast and
    shuffle shapes keep/drop identical rows on the same feed+corpus,
    (2) the verdicts equal a plain-Python replay of the batch bucket
    predicate (drop iff ANY (media_type, band, val) bucket is already
    occupied by the ingested corpus), (3) a verbatim same-modality
    copy is always dropped and a fresh asset always passes."""
    import datetime

    from jaws_effective_processor_spark.functions.multimodal import (
        MEDIA_PHASH_BAND_BITS,
        MEDIA_PHASH_N_BANDS,
        media_phash_py,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    seen = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    ingested = spark.createDataFrame(
        [(99, seen), (45, "spark plans shuffle exchanges into stages")],
        "doc_id long, text string",
    )
    rows = [
        (3, seen, "en", "crawl", t0),  # image copy of image doc 99
        (2, seen, "en", "crawl", t0),  # video copy: DIFFERENT modality
        (6, "another novel document with fresh vocabulary", "en",
         "crawl", t0),
        (9, "spark plans shuffle exchanges into stages", "en", "crawl",
         t0),  # image copy of image doc 45
        (12, "completely unrelated words about media here", "en",
         "crawl", t0),
    ]
    src = os.path.join(tmpdir, "mpg_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    got = {}
    for mode in ("broadcast", "shuffle"):
        stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
        name = f"mpg_{mode}_{uuid.uuid4().hex[:8]}"
        rules.run_to_memory(
            ingest.media_phash_gate_stream(stream, ingested, mode=mode),
            name,
            os.path.join(tmpdir, f"mpg_ckpt_{mode}"),
        )
        got[mode] = {
            r["doc_id"] for r in _memory_table(spark, name).collect()
        }
    assert got["shuffle"] == got["broadcast"]

    # Python replay of the bucket predicate
    mt_of = ("image", "audio", "video")
    mask = (1 << MEDIA_PHASH_BAND_BITS) - 1

    def buckets(doc_id, text):
        h = media_phash_py(text.encode())
        return {
            (mt_of[doc_id % 3], b, (h >> (MEDIA_PHASH_BAND_BITS * b)) & mask)
            for b in range(MEDIA_PHASH_N_BANDS)
        }

    corpus_buckets = set()
    for doc_id, text in [(99, seen),
                         (45, "spark plans shuffle exchanges into stages")]:
        corpus_buckets |= buckets(doc_id, text)
    expected = {
        doc_id
        for doc_id, text, *_ in rows
        if not (buckets(doc_id, text) & corpus_buckets)
    }
    assert got["shuffle"] == expected
    assert 3 not in expected  # same-modality verbatim copy dropped
    assert 9 not in expected
    assert 2 in expected  # cross-modality copy passes (blocked per type)
    assert 6 in expected  # fresh assets pass
    assert 12 in expected


def test_neardup_gate_shuffle_parity(spark, tmpdir):
    """The near-dup gate's two physical shapes — one-row broadcast
    fingerprint array vs N_BANDS shuffled stream-static left-anti
    equi-joins — keep or drop the IDENTICAL documents on the same
    feed and corpus (same discipline as the fuzzy-join
    no-broadcast parity pin: the at-scale fallback must change the
    plan, never a verdict). Also pins the auto switch: a corpus
    larger than NEARDUP_BROADCAST_MAX_DOCS routes to shuffle."""
    import datetime

    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    seen = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    ingested = spark.createDataFrame(
        [(100, seen), (101, "spark plans shuffle exchanges into stages")],
        "doc_id long, text string",
    )
    rows = [
        (1, seen, "en", "crawl", t0),
        (2, near, "en", "crawl", t0),
        (3, "completely unrelated words about spark shuffles", "en",
         "crawl", t0),
        (4, "another novel document with fresh vocabulary", "en",
         "crawl", t0),
        (5, "spark plans shuffle exchanges into stages", "en", "crawl",
         t0),
    ]
    src = os.path.join(tmpdir, "ndp_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    got = {}
    for mode in ("broadcast", "shuffle"):
        stream = rules.dir_stream(
            spark, f"{src}/*", ingest.DOC_FEED_SCHEMA
        )
        name = f"ndp_{mode}_{uuid.uuid4().hex[:8]}"
        rules.run_to_memory(
            ingest.neardup_gate_stream(stream, ingested, mode=mode),
            name,
            os.path.join(tmpdir, f"ndp_ckpt_{mode}"),
        )
        got[mode] = {
            r["doc_id"] for r in _memory_table(spark, name).collect()
        }
    assert got["shuffle"] == got["broadcast"]
    assert 1 not in got["shuffle"]  # verbatim copy always dropped
    assert 5 not in got["shuffle"]  # second corpus doc's copy too

    # the auto switch: a corpus past the broadcast bound routes to the
    # anti-join shape (visible as N_BANDS LeftAnti joins in the plan)
    import unittest.mock as mock

    with mock.patch.object(ingest, "NEARDUP_BROADCAST_MAX_DOCS", 1):
        gated = ingest.neardup_gate_stream(
            spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA),
            ingested,
            mode="auto",
        )
    from jaws_effective_processor_spark.functions.dedup import N_BANDS

    plan = gated._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftAnti") == N_BANDS


def test_full_gate_chain_stream_matches_batch(spark, tmpdir):
    """The whole stateless ingest-gate chain composed as ONE streaming
    plan — gopher rules -> model logit -> Bloom exact gate -> LSH
    near-dup gate -> decontamination -> PII redaction -> split
    assignment — produces row-identical output to the same shared
    expressions applied in batch to the same feed. This is the
    composition claim behind every individual streamed==batch pin:
    the gates are pure column stages, so chaining them cannot change
    any verdict."""
    import datetime

    from jaws_effective_processor_spark.functions.corpus import (
        assign_split,
        with_contam_grams,
    )
    from jaws_effective_processor_spark.functions.filtering import (
        LOGIT_MILLI_EXPR,
        logit_stat_columns,
        with_gopher_stats,
        GOPHER_STAT_COLS,
    )
    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    good = (
        "the quick brown fox jumps over a lazy sleeping dog while "
        "seven wizards of oxford brew giant black quartz potions "
        "and judge every vexing word of substance"
    )
    ingested = spark.createDataFrame(
        [(900, good + " exactly as previously ingested")],
        "doc_id long, text string",
    )
    holdout = spark.createDataFrame(
        [(0, "a held out benchmark sentence with eight distinct "
             "tokens for the contamination gate to key on plus "
             "several more filler words to clear the gram width")],
        "doc_id long, text string",
    )
    holdout_grams = (
        with_contam_grams(holdout).select(
            F.explode("grams").alias("gram_h")
        ).distinct()
    )

    rows = [
        (i, f"{good} variant token{i} appended here", "en", "crawl", t0)
        for i in range(12)
    ] + [
        (100, "too short", "en", "crawl", t0),  # gopher drop
        (101, good + " exactly as previously ingested", "en", "crawl", t0),
    ]
    src = os.path.join(tmpdir, "chain_feed")
    feed = spark.createDataFrame(rows, ingest.DOC_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    def chain(df):
        out = with_gopher_stats(df).filter(F.col("keep")).drop(
            *GOPHER_STAT_COLS
        )
        out = out.select("*", *logit_stat_columns()).filter(
            F.expr(LOGIT_MILLI_EXPR) >= 0
        ).drop("_logit_s", "_logit_n")
        out = ingest.bloom_gate_stream(out, ingested)
        out = ingest.neardup_gate_stream(out, ingested)
        out = ingest.decontaminate_stream(out, holdout_grams)
        out = ingest.pii_redact_stream(out)
        return assign_split(out).select(
            "doc_id", "text", "split", "shard", "n_redactions"
        )

    batch_rows = {tuple(r) for r in chain(feed).collect()}
    # the feed must be non-trivially split by the chain
    assert 0 < len(batch_rows) < len(rows)
    batch_ids = {r[0] for r in batch_rows}
    assert 100 not in batch_ids and 101 not in batch_ids

    stream = rules.dir_stream(spark, f"{src}/*", ingest.DOC_FEED_SCHEMA)
    name = f"chain_{uuid.uuid4().hex[:8]}"
    rules.run_to_memory(
        chain(stream), name, os.path.join(tmpdir, "chain_ckpt")
    )
    got = {
        tuple(r)
        for r in _memory_table(spark, name)
        .select("doc_id", "text", "split", "shard", "n_redactions")
        .collect()
    }
    assert got == batch_rows


def test_knn_query_stream_matches_batch(spark, tmpdir):
    """Serving-side streaming kNN: arriving query vectors get the
    same LSH-bucket top-k (same routing, same float cosine order,
    same tie-breaks) as the identical expressions applied in batch
    to the same feed."""
    import datetime

    from jaws_effective_processor_spark.streaming import vectors as sv

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    dim = 64
    # corpus ids OVERLAP the query-id range (ids 0-5) on purpose:
    # query and corpus ids are independent domains, so a corpus
    # vector sharing a query's id must still be a legal neighbor
    corpus_rows = [
        (i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(dim)])
        for i in range(30)
    ]
    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<float>"
    )
    q_rows = [
        (i, [((i * 17 + j * 5) % 11 - 5) / 5.0 for j in range(dim)], t0)
        for i in range(6)
    ]
    src = os.path.join(tmpdir, "knnq_feed")
    feed = spark.createDataFrame(q_rows, sv.QUERY_FEED_SCHEMA)
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))

    batch = {
        (r["query_id"], tuple((s["neighbor_id"], s["cos_permyriad"])
                              for s in r["topk"]))
        for r in sv.knn_query_stream(feed, corpus, k=3).collect()
    }
    assert len(batch) > 0 and all(len(t) > 0 for _, t in batch)
    # at least one result set must contain a neighbor with the same id
    # as SOME query (the id-collision legality claim); weaker than
    # per-query because bucket routing decides who meets whom
    returned_ids = {n for _, t in batch for n, _ in t}
    assert returned_ids & {q[0] for q in q_rows}

    stream = rules.dir_stream(spark, f"{src}/*", sv.QUERY_FEED_SCHEMA)
    name = f"knnq_{uuid.uuid4().hex[:8]}"
    q = (
        sv.knn_query_stream(stream, corpus, k=3)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(tmpdir, "knnq_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["query_id"], tuple((s["neighbor_id"], s["cos_permyriad"])
                              for s in r["topk"]))
        for r in _memory_table(spark, name).collect()
    }
    assert got == batch


def test_adc_store_server_matches_batch(spark, tmpdir):
    """IVFADC served FROM THE LANDED STORE equals the batch index:
    land the cell-partitioned store with PQ codes, serve the corpus's
    designated query vectors from the persisted pq_code column only
    (unpack -> shared LUT/cos_hat expressions), and land EXACTLY
    q_ann_ivfpq's rows — same neighbors, same ranks, same
    adc_permyriad. Pins the whole round trip: pack -> parquet ->
    unpack -> ADC scores bit-identical to the batch codes."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "adc_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "adc_store")
    cents = sv.load_centroids(spark, sf)
    cb = sv.load_pq_codebook(spark, sf)
    q = sv.start_vector_shards(
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        cents,
        store,
        os.path.join(tmpdir, "adc_ckpt"),
        available_now=True,
        pq_codebook=cb,
    )
    q.awaitTermination()

    queries = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )
    served = {
        tuple(r)
        for r in sv.adc_topk_against_store(
            spark,
            queries,
            store,
            cents,
            cb,
            k=TOP_K,
            nprobe=IVF_NPROBE,
            exclude_self=True,
        ).collect()
    }
    batch = {
        tuple(r) for r in QUERIES["ann_ivfpq"](spark, sf).collect()
    }
    assert served == batch

    # r10: the REFINE tier over the same landed store — ADC-shortlist
    # from the persisted codes, exact re-rank against the raw-vector
    # side table — equals the batch refined query row-for-row
    from jaws_effective_processor_spark.functions.similarity import (
        REFINE_K,
        _vectors,
    )

    refined_served = {
        tuple(r)
        for r in sv.adc_refine_topk_against_store(
            spark,
            queries,
            store,
            cents,
            cb,
            _vectors(spark, sf),
            k=TOP_K,
            k_refine=REFINE_K,
            nprobe=IVF_NPROBE,
            exclude_self=True,
        ).collect()
    }
    refined_batch = {
        tuple(r)
        for r in QUERIES["ann_ivfpq_refined"](spark, sf).collect()
    }
    assert refined_served == refined_batch


def test_knn_store_server_prunes_partitions(spark, tmpdir):
    """The closed loop between the vector store and the kNN server:
    start_vector_shards lands the cell-partitioned store, then the
    serving path answers query micro-batches by reading ONLY the
    probed cell partitions — pruned file reads (strict subset of the
    store's files, and a PartitionFilters entry in the scan) with
    top-k IDENTICAL to the same logical probe over the unpruned
    store. This is the scale shape knn_query_stream's docstring
    promises: partition pruning instead of a full-table join."""
    import datetime

    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "store_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "knn_store")
    cents = sv.load_centroids(spark, sf)
    q = sv.start_vector_shards(
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        cents,
        store,
        os.path.join(tmpdir, "store_ckpt"),
        available_now=True,
    )
    q.awaitTermination()

    # one query vector, nprobe=2: probes at most 2 of the landed cells
    q_rows = [
        r
        for r in load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") >= 50)
        .limit(1)
        .collect()
    ]
    queries = spark.createDataFrame(
        [(int(r["vec_id"]), list(r["embedding"]), t0) for r in q_rows],
        sv.QUERY_FEED_SCHEMA,
    )

    # serve through the streaming server (foreachBatch pruned probe)
    qsrc = os.path.join(tmpdir, "qfeed")
    queries.coalesce(1).write.parquet(os.path.join(qsrc, "batch0"))
    out = os.path.join(tmpdir, "knn_answers")
    server = sv.start_knn_store_server(
        spark,
        rules.dir_stream(spark, f"{qsrc}/*", sv.QUERY_FEED_SCHEMA),
        store,
        cents,
        out,
        os.path.join(tmpdir, "serve_ckpt"),
        k=3,
        nprobe=2,
        available_now=True,
    )
    server.awaitTermination()

    def norm(df):
        return {
            (r["query_id"], tuple((s["neighbor_id"], s["cos_permyriad"])
                                  for s in r["topk"]))
            for r in df.collect()
        }

    served = norm(spark.read.parquet(out))
    assert served and all(len(t) == 3 for _, t in served)

    # parity: the same logical probe without partition pruning
    baseline = norm(
        sv.knn_topk_against_store(
            spark, queries, store, cents, k=3, nprobe=2, prune=False
        )
    )
    assert served == baseline

    # pruning evidence: the probed-cell filter reads strictly fewer
    # files than the full store, and reaches the scan as a
    # PartitionFilter (not a post-scan filter)
    cells = [
        r["c"]
        for r in sv.route_query_cells(queries, cents, 2)
        .select(F.explode("cells").alias("c"))
        .distinct()
        .collect()
    ]
    full = spark.read.parquet(store)
    n_cells_landed = full.select("cell").distinct().count()
    assert len(cells) < n_cells_landed  # precondition for strictness
    pruned = full.filter(F.col("cell").isin(cells))

    def files_read(df):
        return {
            r["f"]
            for r in df.select(
                F.input_file_name().alias("f")
            ).distinct().collect()
        }

    pruned_files, full_files = files_read(pruned), files_read(full)
    assert pruned_files and pruned_files < full_files  # strict subset
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters: ["
    )[1].split("]")[0]


def test_ingest_restart_recovers_dedup_state(spark, tmpdir):
    """Checkpoint recovery: stop the ingest query, land a new feed
    batch containing a re-fetch of PRE-restart content, start a NEW
    query on the same checkpoint — the duplicate is still dropped
    (dedup state restored from the state store, since nothing in the
    new batch alone identifies it as a dup) and the pre-restart rows
    are not re-emitted (file-sink exactly-once via the commit log)."""
    import datetime

    from jaws_effective_processor_spark.streaming import ingest

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    good = (
        "the quick brown fox jumps over a lazy sleeping dog while "
        "seven wizards of oxford brew giant black quartz potions "
        "and judge every vexing word"
    )
    good2 = (
        "a misty harbor town wakes early in cold light as fishing "
        "boats drift past stone piers carrying nets ropes lanterns "
        "and the patient hopes of sailors"
    )

    def doc(i, text, minute):
        return (i, text, "en", "crawl",
                t0 + datetime.timedelta(minutes=minute))

    src = os.path.join(tmpdir, "rfeed")
    sink = os.path.join(tmpdir, "rsink")
    ckpt = os.path.join(tmpdir, "rckpt")
    spark.createDataFrame(
        [doc(1, good, 0), doc(2, good2, 1)], ingest.DOC_FEED_SCHEMA
    ).coalesce(1).write.parquet(os.path.join(src, "batch0"))

    def run_once():
        stream = rules.dir_stream(
            spark, f"{src}/*", ingest.DOC_FEED_SCHEMA, max_files=1
        )
        q = ingest.start_ingest_shards(
            stream, sink, ckpt, available_now=True
        )
        q.awaitTermination()

    run_once()
    first = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert first == {1, 2}

    # restart with a re-fetch of doc 1's content + one new doc
    good3 = (
        "under desert stars an old caravan rests beside red dunes "
        "while traders share warm bread salted olives and long "
        "stories of distant rainy kingdoms"
    )
    spark.createDataFrame(
        [doc(3, good, 5), doc(4, good3, 6)], ingest.DOC_FEED_SCHEMA
    ).coalesce(1).write.parquet(os.path.join(src, "batch1"))
    run_once()

    rows = spark.read.parquet(sink).collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == [1, 2, 4], ids  # dup 3 dropped, nothing re-emitted


def test_spill_store_server_matches_batch(spark, tmpdir):
    """The MULTI-ASSIGNMENT store round trip: land the feed with
    spill = SPILL_ASSIGN (one cell-partitioned row per home cell,
    same (cos DESC, cent_id) tie order as the batch _ranked_cells
    window), then serve the refined tier with serve-time dedupe —
    and land EXACTLY q_ann_ivfpq_spill's rows: same neighbors, same
    ranks, same cos_permyriad. Pins the whole spill layout: top-2
    routing == batch rn <= 2, duplicated code rows score
    byte-identically through pack -> parquet -> unpack, and the
    dedupe mirrors the batch distinct-before-ranking."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        REFINE_K,
        SPILL_ASSIGN,
        TOP_K,
        _vectors,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "spill_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "spill_store")
    cents = sv.load_centroids(spark, sf)
    cb = sv.load_pq_codebook(spark, sf)
    q = sv.start_vector_shards(
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        cents,
        store,
        os.path.join(tmpdir, "spill_ckpt"),
        available_now=True,
        pq_codebook=cb,
        spill=SPILL_ASSIGN,
    )
    q.awaitTermination()

    # the landed layout IS the multi-assignment index: every vector
    # owns exactly SPILL_ASSIGN distinct cell rows
    landed = spark.read.parquet(store)
    per_vec = landed.groupBy("vec_id").agg(
        F.count("*").alias("n"),
        F.countDistinct("cell").alias("nc"),
    )
    bad = per_vec.filter(
        (F.col("n") != SPILL_ASSIGN) | (F.col("nc") != SPILL_ASSIGN)
    ).count()
    assert bad == 0

    queries = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )
    served = {
        tuple(r)
        for r in sv.adc_refine_topk_against_store(
            spark,
            queries,
            store,
            cents,
            cb,
            _vectors(spark, sf),
            k=TOP_K,
            k_refine=REFINE_K,
            nprobe=IVF_NPROBE,
            exclude_self=True,
            dedupe=True,
        ).collect()
    }
    batch = {
        tuple(r)
        for r in QUERIES["ann_ivfpq_spill"](spark, sf).collect()
    }
    assert served == batch
    assert served


def test_residual_store_server_matches_batch(spark, tmpdir):
    """The RESIDUAL-code store round trip (r12, classic IVFADC): land
    the feed with spill = SPILL_ASSIGN and residual coding (each
    (vec, cell) row's pq_code encodes x - centroid(THAT cell) against
    the residual codebook), then serve the residual refined tier with
    best-reconstruction dedupe — and land EXACTLY
    q_ann_ivfpq_spill_residual's rows. Pins: per-cell residual codes
    survive pack -> parquet -> unpack, the per-(query, cell) LUT
    union scores bit-identically to the batch cell books, and the
    groupBy/max dedupe mirrors the batch rule (rows are NOT
    byte-identical on a residual spill store). The single-assignment
    serve is additionally pinned against q_ann_ivfpq_residual by
    filtering the landed store to its home-cell rows — one store,
    both serve tiers."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        SPILL_ASSIGN,
        TOP_K,
        _vectors,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "res_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "res_store")
    cents = sv.load_centroids(spark, sf)
    rcb, cent_micro = sv.load_residual_artifacts(spark, sf)
    q = sv.start_vector_shards(
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        cents,
        store,
        os.path.join(tmpdir, "res_ckpt"),
        available_now=True,
        pq_codebook=rcb,
        spill=SPILL_ASSIGN,
        residual_centroids=cent_micro,
    )
    q.awaitTermination()

    # landed residual codes equal the batch residual code table
    # per (vec, cell) — the layout IS q_ann_ivfpq_spill_residual's
    # index
    from jaws_effective_processor_spark.functions.similarity import (
        PQ_M,
        _pqr_codes,
        pq_pack_expr,
    )

    landed = {
        (r["vec_id"], r["cell"], r["pq_code"])
        for r in spark.read.parquet(store)
        .select("vec_id", "cell", "pq_code")
        .collect()
    }
    batch_codes = {
        (r["vec_id"], r["cell"], r["pq_code"])
        for r in _pqr_codes(spark, sf)
        .select("vec_id", "cell", pq_pack_expr().alias("pq_code"))
        .collect()
    }
    assert landed == batch_codes
    assert landed

    queries = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )
    served_spill = {
        tuple(r)
        for r in sv.adc_residual_refine_topk_against_store(
            spark,
            queries,
            store,
            cents,
            rcb,
            cent_micro,
            _vectors(spark, sf),
            k=TOP_K,
            nprobe=IVF_NPROBE,
            exclude_self=True,
            dedupe_best=True,
            # the member-vector cosine-routing VARIANT — since the
            # r14 default flip the trained-k-means routing is the
            # default and this path opts out explicitly
            euclidean_route=False,
        ).collect()
    }
    batch_spill = {
        tuple(r)
        for r in QUERIES["ann_ivfpq_spill_residual"](spark, sf).collect()
    }
    assert served_spill == batch_spill
    assert served_spill


def test_kmeans_store_server_matches_batch(spark, tmpdir):
    """The TRAINED-k-means store round trip (r13): land the feed with
    Euclidean micro-int routing (euclidean_centroids = the trained
    round-2 codebook) + spill + residual coding against the pqk
    codebook, then serve the residual refined tier with
    euclidean_route probing — and land EXACTLY
    q_ann_ivfpq_spill_kmeans's rows. Pins: the streaming Euclidean
    argmin/top-spill rank equals the batch _kranked_cells window
    (ties to the smallest cid), per-(vec, kmeans cell) residual codes
    survive pack -> parquet -> unpack, and the generic cellbooks LUT
    union scores the trained coarse level bit-identically to
    batch."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        PQ_M,
        SPILL_ASSIGN,
        TOP_K,
        _kranked_cells,
        _pqk_codes,
        _vectors,
        pq_pack_expr,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "kres_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "kres_store")
    kcb, kcent = sv.load_kmeans_artifacts(spark, sf)
    q = sv.start_vector_shards(
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        None,
        store,
        os.path.join(tmpdir, "kres_ckpt"),
        available_now=True,
        pq_codebook=kcb,
        spill=SPILL_ASSIGN,
        residual_centroids=kcent,
        euclidean_centroids=kcent,
    )
    q.awaitTermination()

    # landed (vec, kmeans cell, code) rows equal the batch pqk code
    # table — the layout IS q_ann_ivfpq_spill_kmeans's index
    landed = {
        (r["vec_id"], r["cell"], r["pq_code"])
        for r in spark.read.parquet(store)
        .select("vec_id", "cell", "pq_code")
        .collect()
    }
    batch_codes = {
        (r["vec_id"], r["cell"], r["pq_code"])
        for r in _pqk_codes(spark, sf)
        .select("vec_id", "cell", pq_pack_expr().alias("pq_code"))
        .collect()
    }
    assert landed == batch_codes
    assert landed

    queries = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )
    served_spill = {
        tuple(r)
        for r in sv.adc_residual_refine_topk_against_store(
            spark,
            queries,
            store,
            None,
            kcb,
            kcent,
            _vectors(spark, sf),
            k=TOP_K,
            nprobe=IVF_NPROBE,
            exclude_self=True,
            dedupe_best=True,
            # euclidean_route deliberately NOT passed: the trained
            # k-means routing IS the default since the r14 flip, so
            # this parity pin now exercises the default path
        ).collect()
    }
    batch_spill = {
        tuple(r)
        for r in QUERIES["ann_ivfpq_spill_kmeans"](spark, sf).collect()
    }
    assert served_spill == batch_spill
    assert served_spill


def test_default_ann_store_serve_matches_batch(spark, tmpdir):
    """The SHIPPED default round trip (r14, verdict item 1): land the
    feed through start_ann_store — no routing/coding/spill arguments
    at all — and serve through ann_topk_against_store, and get
    EXACTLY the rows of q_ann_serve (== q_ann_ivfpq_kmeans, the
    measured-best (kmeans, residual, single) configuration). This is
    the pin that a user following the defaults gets the measured
    recommendation, not the member-vector variant."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "serve_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "serve_store")
    q = sv.start_ann_store(
        spark,
        sf,
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        store,
        os.path.join(tmpdir, "serve_ckpt"),
        available_now=True,
    )
    q.awaitTermination()

    queries = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )
    served = {
        tuple(r)
        for r in sv.ann_topk_against_store(
            spark,
            sf,
            queries,
            store,
            k=TOP_K,
            nprobe=IVF_NPROBE,
            exclude_self=True,
        ).collect()
    }
    batch = {
        tuple(r) for r in QUERIES["ann_serve"](spark, sf).collect()
    }
    assert served == batch
    assert served


def test_compact_vector_shards_preserves_serving(spark, tmpdir):
    """The ANN store compactor: land the default store across
    MULTIPLE micro-batches (max_files=1 -> several files per cell
    directory), compact, and pin (1) row-set identity, (2) fewer
    data files, (3) IDENTICAL served answers from the compacted
    store — compaction changes file geometry, never answers."""
    import datetime
    import glob as globmod

    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "cmp_feed")
    # three micro-batches -> at least three files in any shared cell
    for i in range(3):
        feed.filter(F.col("vec_id") % 3 == i).coalesce(1).write.parquet(
            os.path.join(src, f"batch{i}")
        )
    store = os.path.join(tmpdir, "cmp_store")
    sv.start_ann_store(
        spark,
        sf,
        rules.dir_stream(
            spark, f"{src}/*", sv.VEC_FEED_SCHEMA, max_files=1
        ),
        store,
        os.path.join(tmpdir, "cmp_ckpt"),
        available_now=True,
    ).awaitTermination()

    compacted = os.path.join(tmpdir, "cmp_store_c")
    sv.compact_vector_shards(spark, store, compacted)

    def files(p):
        return [
            f
            for f in globmod.glob(f"{p}/**/*.parquet", recursive=True)
            if "_spark_metadata" not in f
        ]

    assert len(files(compacted)) < len(files(store))
    before = {
        tuple(r) for r in spark.read.parquet(store).collect()
    }
    after = {
        tuple(r) for r in spark.read.parquet(compacted).collect()
    }
    assert before == after and before

    queries = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )

    def serve(p):
        return {
            tuple(r)
            for r in sv.ann_topk_against_store(
                spark,
                sf,
                queries,
                p,
                k=TOP_K,
                nprobe=IVF_NPROBE,
                exclude_self=True,
            ).collect()
        }

    assert serve(compacted) == serve(store)

    # DELETE path: the same rewrite with drop_vec_ids removes every
    # assignment row of the listed vectors, and a deleted vector can
    # never come back as a neighbor (candidates come only from the
    # store's code rows). Deleted ids chosen FROM the original
    # answers so the assertion is not vacuous; every query still
    # gets a full top-k from the survivors.
    victims = sorted(
        {r[1] for r in serve(store)}
    )[:2]
    assert victims
    deleted = os.path.join(tmpdir, "cmp_store_d")
    sv.compact_vector_shards(
        spark, store, deleted, drop_vec_ids=victims
    )
    left = spark.read.parquet(deleted)
    assert left.filter(F.col("vec_id").isin(victims)).count() == 0
    assert left.count() == spark.read.parquet(store).filter(
        ~F.col("vec_id").isin(victims)
    ).count()
    after_del = serve(deleted)
    assert not {r[1] for r in after_del} & set(victims)
    assert {r[0] for r in after_del} == {r[0] for r in serve(store)}
    assert len(after_del) == len(serve(store))  # full top-k refilled


def test_default_ann_store_server_round_trip(spark, tmpdir):
    """The CONTINUOUS half of the shipped default (r14): a query
    STREAM served by start_ann_store_server against a
    start_ann_store index lands, across its per-batch output
    directories, exactly q_ann_serve's rows — ingest, batch serve,
    and continuous serve all pinned to the same measured
    configuration. Queries arrive split across TWO micro-batches
    (max_files=1) so the per-batch overwrite discipline and
    cross-batch union are both exercised."""
    import datetime

    from jaws_effective_processor_spark.entry_queries import QUERIES
    from jaws_effective_processor_spark.functions.similarity import (
        IVF_NPROBE,
        N_QUERIES,
        TOP_K,
    )
    from jaws_effective_processor_spark.streaming import vectors as sv

    sf = "/root/testdata/sf0.001"
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    feed = (
        load_table(spark, sf, "embeddings")
        .withColumn("ingest_ts", F.lit(t0))
        .select("vec_id", "embedding", "label", "ingest_ts")
    )
    src = os.path.join(tmpdir, "srv_feed")
    feed.coalesce(1).write.parquet(os.path.join(src, "batch0"))
    store = os.path.join(tmpdir, "srv_store")
    sv.start_ann_store(
        spark,
        sf,
        rules.dir_stream(spark, f"{src}/*", sv.VEC_FEED_SCHEMA),
        store,
        os.path.join(tmpdir, "srv_ckpt"),
        available_now=True,
    ).awaitTermination()

    qsrc = os.path.join(tmpdir, "srv_queries")
    qfeed = (
        load_table(spark, sf, "embeddings")
        .filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding"),
            F.lit(t0).alias("query_ts"),
        )
    )
    half = N_QUERIES // 2
    qfeed.filter(F.col("query_id") < half).coalesce(1).write.parquet(
        os.path.join(qsrc, "batch0")
    )
    qfeed.filter(F.col("query_id") >= half).coalesce(1).write.parquet(
        os.path.join(qsrc, "batch1")
    )
    out = os.path.join(tmpdir, "srv_out")
    sv.start_ann_store_server(
        spark,
        sf,
        rules.dir_stream(
            spark, f"{qsrc}/*", sv.QUERY_FEED_SCHEMA, max_files=1
        ),
        store,
        out,
        os.path.join(tmpdir, "srv_out_ckpt"),
        k=TOP_K,
        nprobe=IVF_NPROBE,
        exclude_self=True,  # queries ARE corpus vectors here
        available_now=True,
    ).awaitTermination()

    served = {
        tuple(r)
        for r in spark.read.parquet(out)
        .select("query_id", "neighbor_id", "rank", "cos_permyriad")
        .collect()
    }
    batch = {
        tuple(r) for r in QUERIES["ann_serve"](spark, sf).collect()
    }
    assert served == batch
    assert served

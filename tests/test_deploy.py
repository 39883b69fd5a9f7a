"""End-to-end deployment test WITHOUT a broker: the exact
`deploy.start_rule_queries` query graph — the production wiring —
runs over `sources.fake_broker` topics that carry the Kafka wire
columns (binary key/value, offset, headers, null-value tombstones).

This is the analog of the reference's compose-up smoke flow
(reference compose.yaml, README.md:16-34): seed the input topics,
let the 8 queries settle through the feedback cycle, assert the
effective states and the wire layout of what was produced.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark.adapters import _ACTIONS_SCHEMA
from jaws_effective_processor_spark.operators.compaction import latest_per_key
from jaws_effective_processor_spark.sources.fake_broker import FakeBroker
from jaws_effective_processor_spark.streaming import deploy

_ACTIONS = [
    ("cls_latch", True, False, None, None, "P1_CRITICAL", "RF", None, None),
    # ondelay long enough that the OnDelayed override cannot expire
    # mid-test (the W2 timer query is live during settle passes)
    ("cls_delay", False, False, 3600, None, "P2_MAJOR", "BPM", None, None),
    ("cls_plain", False, False, None, None, "P3_MINOR", "CAMAC", None, None),
]

_INSTANCES = [
    ("al_latch", "cls_latch"),
    ("al_delay", "cls_delay"),
    ("al_plain", "cls_plain"),
    ("al_oneshot", "cls_plain"),
    ("al_shelf", "cls_plain"),
    ("al_dis", "cls_plain"),
    ("al_norm", "cls_plain"),
]

_ACTIVATIONS = [
    (10, "al_latch", "Activation"),
    (11, "al_delay", "Activation"),
    (12, "al_plain", "Activation"),
    (13, "al_oneshot", "Activation"),
    (14, "al_oneshot", "NoActivation"),  # -> transition to normal
    (15, "al_shelf", "Activation"),
    (16, "al_dis", "Activation"),
    (17, "al_norm", "Activation"),
    (18, "al_norm", "NoActivation"),
]

_OVERRIDES = [
    # (name, type, tombstone, expiration, oneshot)
    ("al_oneshot", "Shelved", False, None, True),
    ("al_shelf", "Shelved", False, None, False),
    ("al_dis", "Disabled", False, None, None),
]

_EXPECTED = {
    "al_latch": (True, "ActiveLatched"),
    "al_delay": (True, "NormalOnDelayed"),
    "al_plain": (True, "Active"),
    "al_oneshot": (False, "Normal"),
    "al_shelf": (True, "NormalContinuousShelved"),
    "al_dis": (True, "NormalDisabled"),
    "al_norm": (False, "Normal"),
}


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="jaws_deploy_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _seed(spark, broker: FakeBroker) -> None:
    """Produce the input topics exactly as external producers would:
    keyed records, JSON values, composite keys for overrides."""
    inst = spark.createDataFrame(_INSTANCES, "name string, action string")
    broker.write(
        inst.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("action")).alias("value"),
        ),
        "alarm-instances",
    )
    act = spark.createDataFrame(
        _ACTIVATIONS, "seq long, name string, union_type string"
    )
    broker.write(
        act.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("seq", "name", "union_type")).alias("value"),
        ),
        "alarm-activations",
    )
    ovr = spark.createDataFrame(
        _OVERRIDES,
        "name string, type string, tombstone boolean, "
        "expiration long, oneshot boolean",
    )
    broker.write(
        ovr.select(
            F.to_json(F.struct("name", "type")).alias("key"),
            F.to_json(
                F.struct("type", "tombstone", "expiration", "oneshot")
            ).alias("value"),
        ),
        "alarm-overrides",
    )


def _effective_states(spark, broker: FakeBroker) -> dict:
    """Consumer-side KTable materialization of effective-alarms:
    latest record per key in ARRIVAL (offset) order, like a broker."""
    raw = broker.raw_batch("effective-alarms")
    eff = raw.select(
        F.col("offset"),
        F.from_json(
            F.col("value").cast("string"),
            "seq long, name string, active boolean, state string",
        ).alias("v"),
    ).select("offset", "v.*")
    latest = latest_per_key(eff, ["name"], order_col="offset")
    return {
        r["name"]: (r["active"], r["state"]) for r in latest.collect()
    }


def test_deploy_settles_reference_scenarios(spark, tmpdir):
    broker = FakeBroker(spark, os.path.join(tmpdir, "broker"))
    transport = deploy.FakeBrokerTransport(broker)
    _seed(spark, broker)

    # patch the class dim the monolog join reads (same as test_topology)
    import jaws_effective_processor_spark.adapters as adapters

    actions = spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA)
    orig = adapters.actions_dim
    adapters.actions_dim = lambda _spark: actions
    # 8 stateful queries x settle rounds over ~10-row topics: state
    # stores inherit shuffle.partitions at FIRST start (fresh
    # checkpoints here), so 4 partitions cuts per-restart task count
    # 8x without touching semantics; production keeps the session's
    # sizing. Two sequential passes settle every scenario (feedback
    # written in pass 1 is consumed in pass 2).
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )

        assert _effective_states(spark, broker) == _EXPECTED

        # second wave: a producer publishes AFTER the deployment
        # settled; every checkpointed query resumes from its offsets
        # and the update propagates the whole chain in one
        # dependency-ordered pass (the resident deployment's steady
        # state, exercised through restart)
        wave = spark.createDataFrame(
            [(30, "al_plain", "NoActivation")],
            "seq long, name string, union_type string",
        )
        broker.write(
            wave.select(
                F.col("name").alias("key"),
                F.to_json(F.struct("seq", "name", "union_type")).alias(
                    "value"
                ),
            ),
            "alarm-activations",
        )
        deploy.start_rule_queries(
            spark,
            checkpoint_root=os.path.join(tmpdir, "ckpt"),
            transport=transport,
            available_now=True,
        )
    finally:
        adapters.actions_dim = orig
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)

    assert _effective_states(spark, broker) == {
        **_EXPECTED,
        "al_plain": (False, "Normal"),
    }

    # wire-layout asserts: what reached the topics is byte-for-byte
    # what a broker would have received
    eff_raw = broker.raw_batch("effective-alarms").collect()
    assert eff_raw, "effective-alarms topic is empty"
    for r in eff_raw:
        assert isinstance(r["key"], (bytes, bytearray))
        payload = json.loads(bytes(r["value"]).decode("utf-8"))
        assert bytes(r["key"]).decode("utf-8") == payload["name"]
        assert set(payload) == {"seq", "name", "active", "state"}

    # the oneshot consumed itself: a composite-key NULL-VALUE tombstone
    # must have been produced onto alarm-overrides
    ovr_raw = broker.raw_batch("alarm-overrides")
    tombs = [
        t
        for t in ovr_raw.filter(F.col("value").isNull())
        .select(F.col("key").cast("string").alias("k"))
        .collect()
        if json.loads(t["k"])["name"] != deploy.RESERVED_TICK_NAME
    ]
    assert {json.loads(t["k"])["name"] for t in tombs} >= {"al_oneshot"}
    assert all(
        json.loads(t["k"]).keys() >= {"name", "type"} for t in tombs
    )

    # feedback records for latch/ondelay carry the composite key too
    fb = (
        ovr_raw.filter(F.col("value").isNotNull())
        .select(F.col("key").cast("string").alias("k"))
        .collect()
    )
    fb_names = {json.loads(r["k"]).get("name") for r in fb}
    assert {"al_latch", "al_delay"} <= fb_names


def test_deploy_oneshot_race_no_spurious_tombstone(spark, tmpdir):
    """The reference's oneshotABunch race (OneShotRuleTest.java:148-168):
    a oneshot-shelved alarm that keeps REPEATING its current side of
    the activation stream must not consume the shelve. Two live
    activations (no normal transition) -> zero tombstones and the
    alarm settles NormalOneShotShelved; then two repeated normals ->
    exactly ONE tombstone (the first normal's transition), never a
    second from the repeat, and the alarm settles Normal."""
    broker = FakeBroker(spark, os.path.join(tmpdir, "broker"))
    transport = deploy.FakeBrokerTransport(broker)

    inst = spark.createDataFrame(
        [("al_osrace", "cls_plain")], "name string, action string"
    )
    broker.write(
        inst.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("action")).alias("value"),
        ),
        "alarm-instances",
    )
    act = spark.createDataFrame(
        [(19, "al_osrace", "Activation"), (20, "al_osrace", "Activation")],
        "seq long, name string, union_type string",
    )
    broker.write(
        act.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("seq", "name", "union_type")).alias("value"),
        ),
        "alarm-activations",
    )
    ovr = spark.createDataFrame(
        [("al_osrace", "Shelved", False, None, True)],
        "name string, type string, tombstone boolean, "
        "expiration long, oneshot boolean",
    )
    broker.write(
        ovr.select(
            F.to_json(F.struct("name", "type")).alias("key"),
            F.to_json(
                F.struct("type", "tombstone", "expiration", "oneshot")
            ).alias("value"),
        ),
        "alarm-overrides",
    )

    import jaws_effective_processor_spark.adapters as adapters

    actions = spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA)
    orig = adapters.actions_dim
    adapters.actions_dim = lambda _spark: actions
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    def _tombstones() -> list:
        # the W1/W2 boot-tick tombstones are deployment plumbing, not
        # rule output — exclude the reserved key
        return [
            r
            for r in broker.raw_batch("alarm-overrides")
            .filter(F.col("value").isNull())
            .select(F.col("key").cast("string").alias("k"))
            .collect()
            if json.loads(r["k"])["name"] != deploy.RESERVED_TICK_NAME
        ]

    try:
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )
        # live + oneshot-shelved, NO normal transition yet: the shelve
        # must survive both activations — zero tombstones on the wire
        assert _tombstones() == []
        assert _effective_states(spark, broker)["al_osrace"] == (
            True,
            "NormalOneShotShelved",
        )

        # repeated normals: only the FIRST is a transition
        wave = spark.createDataFrame(
            [(31, "al_osrace", "NoActivation"),
             (32, "al_osrace", "NoActivation")],
            "seq long, name string, union_type string",
        )
        broker.write(
            wave.select(
                F.col("name").alias("key"),
                F.to_json(F.struct("seq", "name", "union_type")).alias(
                    "value"
                ),
            ),
            "alarm-activations",
        )
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )
        tombs = _tombstones()
        assert [json.loads(t["k"])["name"] for t in tombs] == ["al_osrace"]
        assert _effective_states(spark, broker)["al_osrace"] == (
            False,
            "Normal",
        )
    finally:
        adapters.actions_dim = orig
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)


def test_deploy_latch_settle_clears_flag(spark, tmpdir):
    """The reference's latch settle loop (LatchRuleTest.java:119-175)
    through the REAL feedback topic: a latchable alarm's activation
    makes the latch stage (T2) emit exactly one Latched override and
    stamp `latching=true` on the in-transit monolog; the override
    feeds back onto alarm-overrides, re-enters the activation side as
    an at-rest monolog (prev == next, both transition flags false),
    and the re-emitted row clears the flag (`latching=false`) without
    producing a SECOND override — the settled deployment is a fixed
    point (further settle passes leave the wire unchanged)."""
    broker = FakeBroker(spark, os.path.join(tmpdir, "broker"))
    transport = deploy.FakeBrokerTransport(broker)

    inst = spark.createDataFrame(
        [("al_lsettle", "cls_latch")], "name string, action string"
    )
    broker.write(
        inst.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("action")).alias("value"),
        ),
        "alarm-instances",
    )
    act = spark.createDataFrame(
        [(40, "al_lsettle", "Activation")],
        "seq long, name string, union_type string",
    )
    broker.write(
        act.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("seq", "name", "union_type")).alias("value"),
        ),
        "alarm-activations",
    )

    import jaws_effective_processor_spark.adapters as adapters

    actions = spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA)
    orig = adapters.actions_dim
    adapters.actions_dim = lambda _spark: actions
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    def _latched_overrides() -> list:
        return (
            broker.raw_batch("alarm-overrides")
            .filter(F.col("value").isNotNull())
            .select(
                F.col("key").cast("string").alias("k"),
                F.col("value").cast("string").alias("v"),
            )
            .collect()
        )

    def _latch_flags() -> list:
        """(offset, latching) for the alarm on intermediate-latch, in
        arrival order — the passthrough stream the reference test
        reads."""
        rows = (
            broker.raw_batch("intermediate-latch")
            .select(
                "offset",
                F.get_json_object(
                    F.col("value").cast("string"), "$.name"
                ).alias("name"),
                F.get_json_object(
                    F.col("value").cast("string"), "$.latching"
                ).alias("latching"),
            )
            .filter(F.col("name") == "al_lsettle")
            .orderBy("offset")
            .collect()
        )
        return [r["latching"] for r in rows]

    try:
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )
        ovr1 = _latched_overrides()
        # exactly ONE Latched override fed back, composite-keyed
        assert len(ovr1) == 1
        assert json.loads(ovr1[0]["k"]) == {
            "name": "al_lsettle",
            "type": "Latched",
        }
        flags = _latch_flags()
        # first in-transit row latches; the feedback re-entry clears it
        assert flags[0] == "true"
        assert flags[-1] == "false"
        assert _effective_states(spark, broker)["al_lsettle"] == (
            True,
            "ActiveLatched",
        )

        # fixed point: two more settle passes change NOTHING on the wire
        before = (
            len(_latched_overrides()),
            len(flags),
            broker.raw_batch("effective-alarms").count(),
        )
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )
        after = (
            len(_latched_overrides()),
            len(_latch_flags()),
            broker.raw_batch("effective-alarms").count(),
        )
        assert after == before
    finally:
        adapters.actions_dim = orig
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)


def test_deploy_shelve_timer_survives_restart(spark, tmpdir):
    """W1 through the deployment lifecycle: a Shelved override whose
    expiration lies BEYOND the settle passes registers a processing-
    time timer in the W1 query's checkpointed state; after the
    deployment stops and later restarts (fresh start_rule_queries
    over the same checkpoints — the reference's RocksDB-backed
    punctuator surviving a rebalance), the timer fires past expiry
    and the composite-key tombstone lands on alarm-overrides, with
    the effective state returning to Active. Pins what the
    per-operator timer tests cannot: pending timers crossing a
    query restart."""
    import json as _json
    import time as _time

    broker = FakeBroker(spark, os.path.join(tmpdir, "broker"))
    transport = deploy.FakeBrokerTransport(broker)

    inst = spark.createDataFrame(
        [("al_shexp", "cls_plain")], "name string, action string"
    )
    broker.write(
        inst.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("action")).alias("value"),
        ),
        "alarm-instances",
    )
    act = spark.createDataFrame(
        [(60, "al_shexp", "Activation")],
        "seq long, name string, union_type string",
    )
    broker.write(
        act.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("seq", "name", "union_type")).alias("value"),
        ),
        "alarm-activations",
    )
    exp_ms = int(_time.time() * 1000) + 100_000
    ovr = spark.createDataFrame(
        [("al_shexp", "Shelved", False, exp_ms, False)],
        "name string, type string, tombstone boolean, "
        "expiration long, oneshot boolean",
    )
    broker.write(
        ovr.select(
            F.to_json(F.struct("name", "type")).alias("key"),
            F.to_json(
                F.struct("type", "tombstone", "expiration", "oneshot")
            ).alias("value"),
        ),
        "alarm-overrides",
    )

    import jaws_effective_processor_spark.adapters as adapters

    actions = spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA)
    orig = adapters.actions_dim
    adapters.actions_dim = lambda _spark: actions
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")

    def _tombstone_names() -> set:
        return {
            _json.loads(r["k"])["name"]
            for r in broker.raw_batch("alarm-overrides")
            .filter(F.col("value").isNull())
            .select(F.col("key").cast("string").alias("k"))
            .collect()
        } - {deploy.RESERVED_TICK_NAME}

    try:
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )
        # only assert the pre-expiry picture if we actually got here
        # before the deadline (co-tenant load can stretch the passes)
        if _time.time() * 1000 < exp_ms - 2000:
            assert "al_shexp" not in _tombstone_names()
            assert _effective_states(spark, broker)["al_shexp"] == (
                True,
                "NormalContinuousShelved",
            )

        while _time.time() * 1000 < exp_ms + 1500:
            _time.sleep(1)

        # RESTART: same checkpoints, no new input records — only the
        # checkpointed timer can produce the tombstone
        for _round in range(2):
            deploy.start_rule_queries(
                spark,
                checkpoint_root=os.path.join(tmpdir, "ckpt"),
                transport=transport,
                available_now=True,
            )
        assert "al_shexp" in _tombstone_names()
        assert _effective_states(spark, broker)["al_shexp"] == (
            True,
            "Active",
        )
    finally:
        adapters.actions_dim = orig
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)


def test_deploy_resident_mode_propagates(spark, tmpdir):
    """The RESIDENT deployment shape (available_now=False — the
    production posture: every query live simultaneously, no drain
    ordering): seed the topics, start the full graph, and poll the
    effective-alarms topic while the feedback chain settles on its
    own triggers. Pins that the dependency ordering the settle mode
    enforces explicitly is not load-bearing — the chain converges
    through continuous micro-batches exactly as the reference's 8
    always-on KafkaStreams apps do."""
    import time as _time

    broker = FakeBroker(spark, os.path.join(tmpdir, "broker"))
    transport = deploy.FakeBrokerTransport(broker)

    inst = spark.createDataFrame(
        [("al_res", "cls_plain"), ("al_reslatch", "cls_latch")],
        "name string, action string",
    )
    broker.write(
        inst.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("action")).alias("value"),
        ),
        "alarm-instances",
    )
    act = spark.createDataFrame(
        [(70, "al_res", "Activation"), (71, "al_reslatch", "Activation")],
        "seq long, name string, union_type string",
    )
    broker.write(
        act.select(
            F.col("name").alias("key"),
            F.to_json(F.struct("seq", "name", "union_type")).alias("value"),
        ),
        "alarm-activations",
    )

    import jaws_effective_processor_spark.adapters as adapters

    actions = spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA)
    orig = adapters.actions_dim
    adapters.actions_dim = lambda _spark: actions
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    queries = []
    try:
        queries = deploy.start_rule_queries(
            spark,
            checkpoint_root=os.path.join(tmpdir, "ckpt"),
            transport=transport,
            available_now=False,
        )
        want = {
            "al_res": (True, "Active"),
            "al_reslatch": (True, "ActiveLatched"),
        }
        deadline = _time.time() + 240
        got: dict = {}
        while _time.time() < deadline:
            try:
                states = _effective_states(spark, broker)
            except Exception:
                states = {}
            got = {k: v for k, v in states.items() if k in want}
            if got == want:
                break
            _time.sleep(3)
        assert got == want
    finally:
        for q in queries:
            try:
                q.stop()
            except Exception:
                pass
        for q in queries:
            try:
                q.awaitTermination(30)
            except Exception:
                pass
        adapters.actions_dim = orig
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)

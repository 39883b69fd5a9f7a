"""Full-topology streaming test: the 6 rule queries wired through
directory topics with the override feedback cycle live between them.

One settle() run covers the reference's end-to-end scenarios
(LatchRuleTest.java:119-175, OnDelayRuleTest.java:119-175,
OneShotRuleTest.java:122-168, EffectiveStateRuleTest.java:118-186):
each alarm below is one reference test case; feedback written in
round r is consumed in round r+1, so states settle exactly like the
reference's eventually-consistent Kafka pipeline.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jaws_effective_processor_spark.adapters import _ACTIONS_SCHEMA
from jaws_effective_processor_spark.streaming.topology import (
    OVERRIDE_TOPIC_SCHEMA,
    AlarmTopology,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="jaws_topo_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


# one class per behavior so each rule triggers in isolation
# (the built-in actions_dim conflates latchable with ondelay)
_ACTIONS = [
    ("cls_latch", True, False, None, None, "P1_CRITICAL", "RF", None, None),
    ("cls_delay", False, False, 5, None, "P2_MAJOR", "BPM", None, None),
    ("cls_plain", False, False, None, None, "P3_MINOR", "CAMAC", None, None),
]

_INSTANCES = [
    (1, "al_latch", "cls_latch"),
    (2, "al_delay", "cls_delay"),
    (3, "al_plain", "cls_plain"),
    (4, "al_oneshot", "cls_plain"),
    (5, "al_shelf", "cls_plain"),
    (6, "al_dis", "cls_plain"),
    (7, "al_norm", "cls_plain"),
    (8, "al_expshelf", "cls_plain"),
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
    (19, "al_expshelf", "Activation"),
]

_OVERRIDES = [
    # (seq, name, type, tombstone, expiration, oneshot)
    (20, "al_oneshot", "Shelved", False, None, True),
    (21, "al_shelf", "Shelved", False, None, False),
    (22, "al_dis", "Disabled", False, None, None),
    # already past expiry: W1 sweep tombstones it, state returns to Active
    (23, "al_expshelf", "Shelved", False, 1_000_000_000_000, False),
]

_EXPECTED = {
    # latch trigger fires, Latched override feeds back, settles latched
    "al_latch": (True, "ActiveLatched"),
    # ondelay trigger fires, OnDelayed override suppresses until expiry
    "al_delay": (True, "NormalOnDelayed"),
    # no rule applies: plain Active
    "al_plain": (True, "Active"),
    # one-shot shelve consumed by the normal transition -> tombstone -> Normal
    "al_oneshot": (False, "Normal"),
    # continuous shelve survives while active
    "al_shelf": (True, "NormalContinuousShelved"),
    # disabled wins the cascade outright
    "al_dis": (True, "NormalDisabled"),
    # active then back to normal, no overrides
    "al_norm": (False, "Normal"),
    # shelved with past expiration: shelved until the W1 sweep runs
    "al_expshelf": (True, "NormalContinuousShelved"),
}


def test_topology_settles_reference_scenarios(spark, tmpdir):
    topo = AlarmTopology(
        spark,
        os.path.join(tmpdir, "topics"),
        actions=spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA),
    )
    topo.seed(
        spark.createDataFrame(_INSTANCES, "seq long, name string, action string"),
        spark.createDataFrame(_ACTIVATIONS, "seq long, name string, union_type string"),
        spark.createDataFrame(
            _OVERRIDES,
            "seq long, name string, type string, tombstone boolean, "
            "expiration long, oneshot boolean",
        ),
    )
    topo.settle(rounds=3)

    got = {
        r["name"]: (r["active"], r["state"])
        for r in topo.effective_states().collect()
    }
    assert got == _EXPECTED

    # the feedback topic carries the rule emissions, like the reference's
    # overrides-out asserts (LatchRuleTest.java:150-156, OneShotRule tombstone)
    ovr = spark.read.schema(OVERRIDE_TOPIC_SCHEMA).parquet(topo.topics["overrides"])
    fed = {
        (r["name"], r["type"], r["tombstone"])
        for r in ovr.filter(F.col("seq") >= 10**9).collect()
    }
    assert ("al_latch", "Latched", False) in fed
    assert ("al_delay", "OnDelayed", False) in fed
    assert ("al_oneshot", "Shelved", True) in fed
    # nothing fires for the plain/normal alarms
    assert not any(n in ("al_plain", "al_norm") for n, _, _ in fed)

    # E1 intermediate-drop: the latching record is never emitted — the
    # first and only effective record for al_latch is already latched
    # (EffectiveStateRuleTest.java:118-155)
    eff_log = spark.read.parquet(topo.topics["effective"])
    latch_states = [
        r["state"]
        for r in eff_log.filter(F.col("name") == "al_latch")
        .orderBy("seq")
        .collect()
    ]
    assert latch_states == ["ActiveLatched"]

    # W1/W2: the expiration sweep tombstones past-due overrides onto
    # the feedback topic; the next round restores Active. Both timer
    # rules fire here: al_expshelf's shelve was seeded past-due (W1,
    # ShelveExpirationRuleTest.java:86-100) and al_delay's 5s ondelay
    # genuinely expired during settle (W2, OnDelayExpirationRule
    # semantics: delay persists only until expiry).
    topo.run_expirations()
    topo.settle(rounds=1)
    after = {
        r["name"]: (r["active"], r["state"])
        for r in topo.effective_states().collect()
    }
    expected_after = dict(
        _EXPECTED, al_expshelf=(True, "Active"), al_delay=(True, "Active")
    )
    assert after == expected_after


def test_topology_fixpoint_on_derived_logs(spark, tmpdir):
    """Robustness: the full topology settles to a fixpoint on the
    sf0.001 adapter-derived event logs (real data shape, ~hundreds of
    alarms): an extra round after settling emits nothing new, and all
    states are valid AlarmState values."""
    from jaws_effective_processor_spark import adapters
    from jaws_effective_processor_spark.tables import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    topo = AlarmTopology(spark, os.path.join(tmpdir, "topics"))
    ovr = adapters.overrides_log(events)
    topo.seed(
        adapters.instances_log(events),
        adapters.activations_log(events),
        ovr.select(
            "seq", "name", "type", "tombstone",
            F.col("expiration").cast("long").alias("expiration"),
            "oneshot",
        ),
    )
    topo.settle(rounds=3)
    n_settled = spark.read.parquet(topo.topics["effective"]).count()
    assert n_settled > 0

    topo.run_round()  # extra round: must be a no-op
    assert spark.read.parquet(topo.topics["effective"]).count() == n_settled

    valid = {
        "Normal", "Active", "ActiveOffDelayed", "ActiveLatched",
        "NormalOnDelayed", "NormalOneShotShelved",
        "NormalContinuousShelved", "NormalMasked", "NormalFiltered",
        "NormalDisabled",
    }
    states = {r["state"] for r in topo.effective_states().collect()}
    assert states and states <= valid


def test_topology_mask_extension(spark, tmpdir):
    """Optional corrected MaskRule wired through the feedback topic:
    run_mask() reconciles children against parent activity, the next
    settle round folds the Masked override into the cascade. Covers
    both branches — add (active parent, unmasked child) and tombstone
    (inactive parent, masked child) — which the reference's dead-code
    MaskRule could never do (its unmask stream mapped the mask
    stream, MaskRule.java:124-125)."""
    topo = AlarmTopology(
        spark,
        os.path.join(tmpdir, "topics"),
        actions=spark.createDataFrame(_ACTIONS, schema=_ACTIONS_SCHEMA),
    )
    overrides = _OVERRIDES + [
        # a stale Masked override whose parent is NOT active: the
        # sweep must tombstone it
        (24, "al_dis", "Masked", False, None, None),
    ]
    topo.seed(
        spark.createDataFrame(_INSTANCES, "seq long, name string, action string"),
        spark.createDataFrame(_ACTIVATIONS, "seq long, name string, union_type string"),
        spark.createDataFrame(
            overrides,
            "seq long, name string, type string, tombstone boolean, "
            "expiration long, oneshot boolean",
        ),
    )
    topo.settle(rounds=3)

    mapping = spark.createDataFrame(
        [("al_plain", "al_latch"), ("al_dis", "al_norm")],
        "name string, parent string",
    )
    topo.run_mask(mapping)
    ovr = spark.read.schema(OVERRIDE_TOPIC_SCHEMA).parquet(
        topo.topics["overrides"]
    )
    masked_rows = {
        (r["name"], r["tombstone"])
        for r in ovr.filter(
            (F.col("type") == "Masked") & (F.col("seq") >= 10**9)
        ).collect()
    }
    assert masked_rows == {("al_plain", False), ("al_dis", True)}

    topo.settle(rounds=1)
    got = {
        r["name"]: (r["active"], r["state"])
        for r in topo.effective_states().collect()
    }
    # the mask lands in the cascade; Disabled still outranks everything
    assert got["al_plain"] == (True, "NormalMasked")
    assert got["al_dis"] == (True, "NormalDisabled")
    assert got["al_latch"] == (True, "ActiveLatched")

    # idempotent once reconciled: a second sweep emits nothing new
    n_before = ovr.filter(F.col("type") == "Masked").count()
    topo.run_mask(mapping)
    n_after = (
        spark.read.schema(OVERRIDE_TOPIC_SCHEMA)
        .parquet(topo.topics["overrides"])
        .filter(F.col("type") == "Masked")
        .count()
    )
    assert n_after == n_before

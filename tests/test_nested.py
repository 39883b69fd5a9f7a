"""Nested-struct output parity (SURVEY §1.3) — the typed schemas.

The oracle gate hash-checks the JSON serialization; these tests pin
the TYPED StructType a downstream consumer of the topics would bind
to (EffectiveStateRule.java:83-93, RegistrationRule.java:142-157).
"""

from __future__ import annotations

from pyspark.sql import types as T

from jaws_effective_processor_spark import nested
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


def _field(struct: T.StructType, name: str) -> T.StructField:
    return struct[name]


def test_effective_registration_schema(spark):
    events = load_table(spark, SF_SMOKE, "events")
    df = nested.registration_structs(spark, events)
    reg = df.schema["registration"].dataType
    assert isinstance(reg, T.StructType)
    action = _field(reg, "action").dataType
    assert [f.name for f in action.fields] == [
        "latchable",
        "system",
        "filterable",
        "correctiveaction",
        "priority",
        "rationale",
        "ondelayseconds",
        "offdelayseconds",
    ]
    alarm = _field(reg, "alarm").dataType
    assert [f.name for f in alarm.fields] == ["action", "source", "location"]
    assert isinstance(_field(alarm, "location").dataType, T.ArrayType)
    assert isinstance(_field(alarm, "source").dataType, T.StructType)


def test_override_set_and_transitions_schema(spark):
    df = nested._assembled(spark, SF_SMOKE).select(
        nested._notification_struct().alias("notification"),
        nested._transitions_struct().alias("transitions"),
    )
    notif = df.schema["notification"].dataType
    assert [f.name for f in notif.fields] == ["activation", "overrides", "state"]
    ovr = _field(notif, "overrides").dataType
    assert [f.name for f in ovr.fields] == [
        "disabled",
        "filtered",
        "latched",
        "masked",
        "offdelayed",
        "ondelayed",
        "shelved",
    ]
    shelved = _field(ovr, "shelved").dataType
    assert [f.name for f in shelved.fields] == [
        "oneshot",
        "expiration",
        "reason",
        "comments",
    ]
    assert [f.name for f in _field(ovr, "disabled").dataType.fields] == [
        "comments"
    ]
    trans = df.schema["transitions"].dataType
    assert [f.name for f in trans.fields] == [
        "transitionToActive",
        "transitionToNormal",
        "latching",
        "unshelving",
        "ondelaying",
        "offdelaying",
        "masking",
        "unmasking",
    ]
    assert all(
        isinstance(f.dataType, T.BooleanType) for f in trans.fields
    )


def test_shelved_payload_values(spark):
    """Live Shelved overrides carry reason + oneshot + expiration, and
    the JSON output renders them (not just presence booleans)."""
    import json

    rows = nested.q_effective_alarms_nested(spark, SF_SMOKE).collect()
    parsed = [json.loads(r["effective_alarm"]) for r in rows]
    shelved = [
        p["notification"]["overrides"]["shelved"]
        for p in parsed
        if p["notification"]["overrides"]["shelved"] is not None
    ]
    assert shelved, "expected at least one live Shelved override at sf0.001"
    for s in shelved:
        assert s["reason"] in ("Chattering_Fleeting_Alarm", "Other")
        assert isinstance(s["oneshot"], bool)
        assert isinstance(s["expiration"], int)

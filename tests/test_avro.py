"""S4 Avro serde — executed coverage for the jar-less fallback.

The reference's wire format is Confluent SpecificAvroSerde
(RegistrationRule.java:72-79): registry frame + Avro binary body.
These tests round-trip a reference-shaped schema (union-of-records
override payload, enum reason, array location, nullable fields —
the shapes of AlarmOverrideUnion / Registration per SURVEY §1.3)
through the pure-Python codec, and through the DataFrame-level
decode/encode built on it.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from jaws_effective_processor_spark.sources import avro_codec as ac

AVSC = json.dumps(
    {
        "type": "record",
        "name": "OverrideMsg",
        "fields": [
            {"name": "alarm", "type": "string"},
            {
                "name": "priority",
                "type": [
                    "null",
                    {
                        "type": "enum",
                        "name": "Priority",
                        "symbols": ["P1", "P2", "P3", "P4"],
                    },
                ],
            },
            {"name": "location", "type": {"type": "array", "items": "string"}},
            {
                "name": "override",
                "type": [
                    "null",
                    {
                        "type": "record",
                        "name": "Shelved",
                        "fields": [
                            {
                                "name": "reason",
                                "type": {
                                    "type": "enum",
                                    "name": "ShelvedReason",
                                    "symbols": [
                                        "Stale_Alarm",
                                        "Chattering_Fleeting_Alarm",
                                        "Other",
                                    ],
                                },
                            },
                            {"name": "expiration", "type": "long"},
                            {
                                "name": "comments",
                                "type": ["null", "string"],
                            },
                        ],
                    },
                    {
                        "type": "record",
                        "name": "Latched",
                        "fields": [
                            {"name": "latched_at", "type": "long"}
                        ],
                    },
                ],
            },
            {"name": "counts", "type": {"type": "map", "values": "long"}},
        ],
    }
)

MSG_SHELVED = {
    "alarm": "alarm-7",
    "priority": "P2",
    "location": ["HallA", "HallC"],
    "override": {
        "reason": "Chattering_Fleeting_Alarm",
        "expiration": 1700000123456,
        "comments": "noisy sensor",
    },
    "counts": {"activations": 12, "clears": 11},
}

MSG_LATCHED = {
    "alarm": "alarm-9",
    "priority": None,
    "location": [],
    "override": {"latched_at": -5},
    "counts": {},
}


def test_roundtrip_union_of_records():
    schema = ac.parse_schema(AVSC)
    for msg in (MSG_SHELVED, MSG_LATCHED):
        assert ac.decode(schema, ac.encode(schema, msg)) == msg


def test_null_branch_and_missing_fields():
    schema = ac.parse_schema(AVSC)
    # to_json drops null fields — encode must route them to the
    # union's null branch and decode restores explicit nulls
    sparse = {"alarm": "a", "location": ["x"], "counts": {}}
    out = ac.decode(schema, ac.encode(schema, sparse))
    assert out == {
        "alarm": "a",
        "priority": None,
        "location": ["x"],
        "override": None,
        "counts": {},
    }


def test_confluent_frame():
    body = b"\x02\x04abc"
    framed = ac.confluent_frame(body, schema_id=42)
    assert framed[:5] == b"\x00\x00\x00\x00\x2a"
    assert ac.strip_confluent_frame(framed) == (42, body)
    with pytest.raises(ValueError):
        ac.strip_confluent_frame(b"\x01xxxx")


def test_varint_known_encodings():
    # spec examples: zigzag(0)=0, (-1)=1, (1)=2, (-2)=3, (2)=4
    sch = ac.parse_schema('"long"')
    assert ac.encode(sch, 0) == b"\x00"
    assert ac.encode(sch, -1) == b"\x01"
    assert ac.encode(sch, 1) == b"\x02"
    assert ac.encode(sch, -2) == b"\x03"
    assert ac.encode(sch, 64) == b"\x80\x01"


PRIM = st.fixed_dictionaries(
    {
        "s": st.text(max_size=40),
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.floats(allow_nan=False, allow_infinity=False),
        "b": st.booleans(),
        "opt": st.one_of(
            st.none(), st.integers(min_value=-(2**31), max_value=2**31 - 1)
        ),
        "arr": st.lists(
            st.integers(min_value=-(2**31), max_value=2**31 - 1), max_size=8
        ),
    }
)

PRIM_AVSC = json.dumps(
    {
        "type": "record",
        "name": "Prim",
        "fields": [
            {"name": "s", "type": "string"},
            {"name": "i", "type": "long"},
            {"name": "d", "type": "double"},
            {"name": "b", "type": "boolean"},
            {"name": "opt", "type": ["null", "long"]},
            {"name": "arr", "type": {"type": "array", "items": "long"}},
        ],
    }
)


@settings(deadline=None, max_examples=200)
@given(PRIM)
def test_roundtrip_primitives_property(msg):
    schema = ac.parse_schema(PRIM_AVSC)
    assert ac.decode(schema, ac.encode(schema, msg)) == msg


def test_dataframe_decode_encode_roundtrip(spark):
    """Wire-level DataFrame round-trip with NO spark-avro jar:
    python-encoded Confluent-framed binaries -> avro_decode_py ->
    typed struct -> avro_encode_py -> byte-identical re-encode."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jaws_effective_processor_spark.sources.io import (
        avro_decode_py,
        avro_encode_py,
    )

    schema = ac.parse_schema(AVSC)
    rows = [
        (m["alarm"], ac.confluent_frame(ac.encode(schema, m), 7))
        for m in (MSG_SHELVED, MSG_LATCHED)
    ]
    raw = spark.createDataFrame(rows, "key string, value binary")

    spark_schema = T.StructType(
        [
            T.StructField("alarm", T.StringType()),
            T.StructField("priority", T.StringType()),
            T.StructField("location", T.ArrayType(T.StringType())),
            T.StructField(
                "override",
                T.StructType(
                    [
                        T.StructField("reason", T.StringType()),
                        T.StructField("expiration", T.LongType()),
                        T.StructField("comments", T.StringType()),
                        T.StructField("latched_at", T.LongType()),
                    ]
                ),
            ),
            T.StructField("counts", T.MapType(T.StringType(), T.LongType())),
        ]
    )

    decoded = raw.select(
        "key", avro_decode_py(F.col("value"), AVSC, spark_schema).alias("v")
    )
    got = {r["key"]: r["v"].asDict(recursive=True) for r in decoded.collect()}
    assert got["alarm-7"]["override"]["reason"] == "Chattering_Fleeting_Alarm"
    assert got["alarm-7"]["override"]["expiration"] == 1700000123456
    assert got["alarm-7"]["counts"] == {"activations": 12, "clears": 11}
    assert got["alarm-9"]["priority"] is None
    assert got["alarm-9"]["override"]["latched_at"] == -5

    # encode the decoded struct back; decode THAT and compare values
    # (byte-identity isn't guaranteed: map ordering + the flattened
    # union struct change field presence, value equality is the spec)
    slim_avsc = json.dumps(
        {
            "type": "record",
            "name": "Slim",
            "fields": [
                {"name": "alarm", "type": "string"},
                {"name": "priority", "type": ["null", "string"]},
                {
                    "name": "location",
                    "type": {"type": "array", "items": "string"},
                },
                {
                    "name": "override_latched",
                    "type": [
                        "null",
                        {
                            "type": "record",
                            "name": "L",
                            "fields": [
                                {
                                    "name": "latched_at",
                                    "type": ["null", "long"],
                                }
                            ],
                        },
                    ],
                },
                {
                    "name": "counts",
                    "type": {"type": "map", "values": "long"},
                },
            ],
        }
    )
    reenc = decoded.select(
        "key",
        avro_encode_py(
            F.struct(
                F.col("v.alarm").alias("alarm"),
                F.col("v.priority").alias("priority"),
                F.col("v.location").alias("location"),
                F.when(
                    F.col("v.override.latched_at").isNotNull(),
                    F.struct(F.col("v.override.latched_at").alias("latched_at")),
                ).alias("override_latched"),
                F.col("v.counts").alias("counts"),
            ),
            slim_avsc,
            schema_id=7,
        ).alias("wire"),
    )
    slim_schema = ac.parse_schema(slim_avsc)
    for r in reenc.collect():
        sid, body = ac.strip_confluent_frame(bytes(r["wire"]))
        assert sid == 7
        val = ac.decode(slim_schema, body)
        assert val["alarm"] == r["key"]
        if r["key"] == "alarm-9":
            assert val["override_latched"] == {"latched_at": -5}
            assert val["priority"] is None


def test_kafka_avro_payload_roundtrip(spark):
    """S3+S4: rows -> Confluent-framed Avro wire (tombstone -> null
    value) -> decode -> original values. The Avro twin of
    test_sources.py's JSON wire round-trip."""
    import json as _json

    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.io import kafka_avro_payload

    avsc = _json.dumps(
        {
            "type": "record",
            "name": "Ovr",
            "fields": [
                {"name": "type", "type": ["null", "string"]},
                {"name": "expiration", "type": ["null", "long"]},
                {"name": "oneshot", "type": ["null", "boolean"]},
            ],
        }
    )
    rows = [
        ("alarm_1", "Shelved", 1700000000123, True, False),
        ("alarm_2", "OnDelayed", -1, False, False),
        ("alarm_3", None, None, None, True),  # tombstone
    ]
    df = spark.createDataFrame(
        rows,
        "name string, type string, expiration long, oneshot boolean,"
        " __tombstone boolean",
    )
    wire = kafka_avro_payload(df, avsc, schema_id=9).orderBy("key").collect()
    schema = ac.parse_schema(avsc)
    assert [r["key"] for r in wire] == ["alarm_1", "alarm_2", "alarm_3"]
    assert wire[2]["value"] is None  # tombstone ships a null value
    sid, body = ac.strip_confluent_frame(bytes(wire[0]["value"]))
    assert sid == 9
    assert ac.decode(schema, body) == {
        "type": "Shelved",
        "expiration": 1700000000123,
        "oneshot": True,
    }
    sid, body = ac.strip_confluent_frame(bytes(wire[1]["value"]))
    assert ac.decode(schema, body) == {
        "type": "OnDelayed",
        "expiration": -1,
        "oneshot": False,
    }


# ------------------------------------------------ schema registry stub


def test_registry_register_lookup_idempotent():
    from jaws_effective_processor_spark.sources.registry import (
        MockSchemaRegistry,
    )

    reg = MockSchemaRegistry()
    sid1 = reg.register("alarm-overrides-value", AVSC)
    # same content (different whitespace/key order) -> same global id
    reshuffled = json.dumps(json.loads(AVSC), indent=2, sort_keys=True)
    assert reg.register("alarm-overrides-value", reshuffled) == sid1
    # same schema under another subject reuses the id, adds a version
    assert reg.register("alarm-overrides-dlq-value", AVSC) == sid1
    assert reg.subjects() == [
        "alarm-overrides-dlq-value",
        "alarm-overrides-value",
    ]
    sid, version, schema = reg.latest("alarm-overrides-value")
    assert (sid, version) == (sid1, 1)
    assert json.loads(reg.get_by_id(sid1)) == json.loads(AVSC)


def test_registry_subject_versions_advance():
    from jaws_effective_processor_spark.sources.registry import (
        MockSchemaRegistry,
        SchemaNotFound,
    )

    reg = MockSchemaRegistry()
    v1 = '{"type": "record", "name": "M", "fields": [{"name": "a", "type": "long"}]}'
    v2 = (
        '{"type": "record", "name": "M", "fields": ['
        '{"name": "a", "type": "long"}, '
        '{"name": "b", "type": ["null", "string"]}]}'
    )
    id1 = reg.register("m-value", v1)
    id2 = reg.register("m-value", v2)
    assert id1 != id2
    assert reg.version_of("m-value", id1) == 1
    assert reg.version_of("m-value", id2) == 2
    assert reg.latest("m-value")[0] == id2
    import pytest as _pytest

    with _pytest.raises(SchemaNotFound):
        reg.get_by_id(999)
    with _pytest.raises(SchemaNotFound):
        reg.latest("nope-value")


def test_serde_roundtrip_resolves_writer_schema_by_frame_id():
    """The deserializer must decode with the schema named by the
    record's OWN frame id (the writer's), not the serde's pinned one —
    the property the reference relies on for rolling schema upgrades
    (SpecificAvroSerde + registry, ProcessingRule.java:41-52)."""
    from jaws_effective_processor_spark.sources.registry import (
        MockAvroSerde,
        MockSchemaRegistry,
    )

    reg = MockSchemaRegistry()
    serde = MockAvroSerde(reg, "override-msg-value", AVSC)
    for msg in (MSG_SHELVED, MSG_LATCHED):
        wire = serde.serialize(msg)
        assert wire[0] == 0  # Confluent magic byte
        assert serde.deserialize(wire) == msg

    # a record written by an OLDER serde version still decodes through
    # a serde pinned to the newer version
    slim = (
        '{"type": "record", "name": "OverrideMsg", "fields": '
        '[{"name": "alarm", "type": "string"}]}'
    )
    old = MockAvroSerde(reg, "override-msg-value", slim)
    new = MockAvroSerde(reg, "override-msg-value", AVSC)
    assert old.schema_id != new.schema_id
    assert new.deserialize(old.serialize({"alarm": "a1"})) == {"alarm": "a1"}


def test_avro_records_ride_the_broker(spark, tmp_path):
    """S3+S4 over the transport: Confluent-framed Avro records are
    produced onto a fake-broker topic (binary wire columns), read
    back, and decoded DISTRIBUTED via the jar-less pandas-UDF path —
    with the writer schema resolved from the registry by the id the
    producer stamped into the frame. The last hop the driver-side
    round-trip above doesn't cover."""
    import json as _json

    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.sources.fake_broker import FakeBroker
    from jaws_effective_processor_spark.sources.io import (
        avro_decode_py,
        kafka_avro_payload,
    )
    from jaws_effective_processor_spark.sources.registry import (
        MockSchemaRegistry,
    )

    avsc = _json.dumps(
        {
            "type": "record",
            "name": "Ovr",
            "fields": [
                {"name": "type", "type": ["null", "string"]},
                {"name": "expiration", "type": ["null", "long"]},
            ],
        }
    )
    registry = MockSchemaRegistry()
    sid = registry.register("alarm-overrides-value", avsc)

    rows = [
        ("alarm_1", "Shelved", 1700000000123, False),
        ("alarm_2", "OnDelayed", None, False),
        ("alarm_3", None, None, True),  # tombstone
    ]
    df = spark.createDataFrame(
        rows, "name string, type string, expiration long, __tombstone boolean"
    )
    broker = FakeBroker(spark, str(tmp_path / "broker"))
    broker.write(
        kafka_avro_payload(df, avsc, schema_id=sid), "alarm-overrides-avro"
    )

    raw = broker.raw_batch("alarm-overrides-avro")
    # tombstone: null value survives the topic as a null binary
    tombs = raw.filter(F.col("value").isNull()).select(
        F.col("key").cast("string").alias("k")
    )
    assert [r["k"] for r in tombs.collect()] == ["alarm_3"]

    # consumer resolves the writer schema from the registry by the
    # frame id, then decodes in the Arrow-batched UDF path
    first = raw.filter(F.col("value").isNotNull()).first()
    import jaws_effective_processor_spark.sources.avro_codec as ac

    frame_id, _ = ac.strip_confluent_frame(bytes(first["value"]))
    writer_avsc = registry.get_by_id(frame_id)
    decoded = (
        raw.filter(F.col("value").isNotNull())
        .select(
            F.col("key").cast("string").alias("name"),
            avro_decode_py(
                F.col("value"), writer_avsc, "type string, expiration long"
            ).alias("v"),
        )
        .select("name", "v.*")
        .orderBy("name")
    )
    assert [tuple(r) for r in decoded.collect()] == [
        ("alarm_1", "Shelved", 1700000000123),
        ("alarm_2", "OnDelayed", None),
    ]

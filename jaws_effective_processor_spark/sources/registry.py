"""In-memory Schema Registry client (S4's register/lookup path).

The reference registers and resolves schemas at runtime through
Confluent Schema Registry: every serde is configured with
SCHEMA_REGISTRY_URL_CONFIG (ProcessingRule.java:41-52) and its tests
run against the in-memory `mock://testing` registry
(RegistrationRuleTest.java:36). This module is the batch engine's
analog of that mock: the full register/lookup contract — global
content-addressed schema ids, per-subject version lists, id->schema
resolution for the Confluent wire frame — with no network and no
service dependency, so serde round-trips are testable offline exactly
like the reference's unit tests.

Semantics follow the public Confluent API:
- ids are GLOBAL and content-addressed: registering the same schema
  text (whitespace-insensitively, via canonical JSON) under any
  subject yields the same id;
- a subject holds an ordered version list (1-based); re-registering
  a schema already in the subject returns its existing version;
- lookup by id serves the deserializer (the 4-byte id in the wire
  frame), lookup by subject+latest serves the serializer.

`MockAvroSerde` composes this with the pure-Python codec
(avro_codec.py) into the serialize/deserialize pair the reference's
SpecificAvroSerde provides: serialize = register (idempotent) +
encode + frame; deserialize = strip frame + resolve WRITER schema by
the frame's id + decode. A reader that pins its own schema version
still decodes old messages because resolution is by the id embedded
in each record — the property the wire frame exists to provide.
"""

from __future__ import annotations

import json
from typing import Any

from .avro_codec import (
    confluent_frame,
    decode,
    encode,
    parse_schema,
    strip_confluent_frame,
)


def _canonical(schema: str | dict) -> str:
    """Whitespace/key-order-insensitive schema identity (the stand-in
    for Confluent's 'canonical form' used for id dedup)."""
    doc = json.loads(schema) if isinstance(schema, str) else schema
    return json.dumps(doc, sort_keys=True, separators=(",", ":"))


class SchemaNotFound(KeyError):
    pass


class MockSchemaRegistry:
    """Offline register/lookup store with Confluent-shaped semantics."""

    def __init__(self) -> None:
        self._by_id: dict[int, str] = {}
        self._id_by_canonical: dict[str, int] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    # -- registration -------------------------------------------------
    def register(self, subject: str, schema: str | dict) -> int:
        """Idempotent: same schema content -> same global id; appends
        a new subject version only if the subject doesn't already
        hold this schema."""
        canon = _canonical(schema)
        sid = self._id_by_canonical.get(canon)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
            self._id_by_canonical[canon] = sid
            self._by_id[sid] = canon
        versions = self._subjects.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
        return sid

    # -- lookup -------------------------------------------------------
    def get_by_id(self, schema_id: int) -> str:
        try:
            return self._by_id[schema_id]
        except KeyError:
            raise SchemaNotFound(f"schema id {schema_id}") from None

    def latest(self, subject: str) -> tuple[int, int, str]:
        """(schema_id, version, schema_json) of the subject's latest."""
        versions = self._subjects.get(subject)
        if not versions:
            raise SchemaNotFound(f"subject {subject}")
        sid = versions[-1]
        return sid, len(versions), self._by_id[sid]

    def version_of(self, subject: str, schema_id: int) -> int:
        versions = self._subjects.get(subject, [])
        try:
            return versions.index(schema_id) + 1
        except ValueError:
            raise SchemaNotFound(
                f"id {schema_id} in subject {subject}"
            ) from None

    def lookup(self, subject: str, schema: str | dict) -> tuple[int, int]:
        """(schema_id, version) of an ALREADY-registered schema under
        a subject — the Confluent POST /subjects/{subject} check. No
        side effects: raises SchemaNotFound when the subject does not
        exist (REST 40401) or does not hold the schema (40403) —
        registering on lookup would fabricate versions the caller
        never created."""
        canon = _canonical(schema)
        versions = self._subjects.get(subject)
        if versions is None:
            raise SchemaNotFound(f"subject {subject}")
        sid = self._id_by_canonical.get(canon)
        if sid is None or sid not in versions:
            raise SchemaNotFound(f"schema not registered in {subject}")
        return sid, versions.index(sid) + 1

    def subjects(self) -> list[str]:
        return sorted(self._subjects)


class MockAvroSerde:
    """serialize/deserialize against a MockSchemaRegistry — the
    offline analog of the reference's SpecificAvroSerde."""

    def __init__(
        self,
        registry: MockSchemaRegistry,
        subject: str,
        schema: str | dict,
    ) -> None:
        self._registry = registry
        self._subject = subject
        self._schema_json = (
            schema if isinstance(schema, str) else json.dumps(schema)
        )
        self._schema = parse_schema(self._schema_json)
        self._schema_id = registry.register(subject, self._schema_json)

    @property
    def schema_id(self) -> int:
        return self._schema_id

    def serialize(self, value: Any) -> bytes:
        return confluent_frame(encode(self._schema, value), self._schema_id)

    def deserialize(self, data: bytes) -> Any:
        """Decode with the WRITER's schema resolved from the frame id —
        not this serde's pinned schema — so records written under any
        registered version round-trip."""
        sid, body = strip_confluent_frame(data)
        writer = parse_schema(self._registry.get_by_id(sid))
        return decode(writer, body)

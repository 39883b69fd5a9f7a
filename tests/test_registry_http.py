"""HttpSchemaRegistry against a protocol-faithful in-process server.

The container has no network, so the Confluent REST protocol is
verified the same way the Kafka path is (sources/fake_broker.py): a
real HTTP exchange over localhost against a fake server that speaks
the public API — endpoints, content type, error codes — backed by
the offline MockSchemaRegistry. The client must behave identically
to the mock on the shared method surface, and the serde stack must
round-trip through it unchanged.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from jaws_effective_processor_spark.sources.registry import (
    MockAvroSerde,
    MockSchemaRegistry,
    SchemaNotFound,
)
from jaws_effective_processor_spark.sources.registry_http import (
    CONTENT_TYPE,
    HttpSchemaRegistry,
)

AVSC = json.dumps(
    {
        "type": "record",
        "name": "Reg",
        "fields": [
            {"name": "action", "type": ["null", "string"], "default": None},
            {"name": "n", "type": "long"},
        ],
    }
)
AVSC_V2 = json.dumps(
    {
        "type": "record",
        "name": "Reg",
        "fields": [
            {"name": "action", "type": ["null", "string"], "default": None},
            {"name": "n", "type": "long"},
            {"name": "extra", "type": ["null", "long"], "default": None},
        ],
    }
)


def _make_handler(store: MockSchemaRegistry):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *_a):  # quiet
            pass

        def _send(self, code: int, payload) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", CONTENT_TYPE)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _not_found(self, error_code: int, message: str) -> None:
            self._send(404, {"error_code": error_code, "message": message})

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_GET(self):
            m = re.fullmatch(r"/schemas/ids/(\d+)", self.path)
            if m:
                try:
                    schema = store.get_by_id(int(m.group(1)))
                except SchemaNotFound:
                    return self._not_found(40403, "Schema not found")
                return self._send(200, {"schema": schema})
            m = re.fullmatch(r"/subjects/([^/]+)/versions/latest", self.path)
            if m:
                try:
                    sid, version, schema = store.latest(m.group(1))
                except SchemaNotFound:
                    return self._not_found(40401, "Subject not found")
                return self._send(
                    200,
                    {
                        "subject": m.group(1),
                        "id": sid,
                        "version": version,
                        "schema": schema,
                    },
                )
            if self.path == "/subjects":
                return self._send(200, store.subjects())
            self._not_found(40401, "unknown path")

        def do_POST(self):
            m = re.fullmatch(r"/subjects/([^/]+)/versions", self.path)
            if m:
                sid = store.register(m.group(1), self._body()["schema"])
                return self._send(200, {"id": sid})
            m = re.fullmatch(r"/subjects/([^/]+)", self.path)
            if m:
                subject = m.group(1)
                schema = self._body()["schema"]
                # Confluent semantics: this endpoint is a LOOKUP with
                # no side effects — 40403 when the schema is not
                # registered under the subject (registering here would
                # fabricate versions the client never created)
                try:
                    sid, version = store.lookup(subject, schema)
                except SchemaNotFound:
                    return self._not_found(40403, "Schema not found")
                return self._send(
                    200,
                    {
                        "subject": subject,
                        "id": sid,
                        "version": version,
                        "schema": schema,
                    },
                )
            self._not_found(40401, "unknown path")

    return Handler


@pytest.fixture()
def registry_server():
    store = MockSchemaRegistry()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(store))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", store
    finally:
        server.shutdown()
        server.server_close()


def test_register_is_content_addressed_and_versioned(registry_server):
    url, _ = registry_server
    reg = HttpSchemaRegistry(url)
    id1 = reg.register("alarm-instances-value", AVSC)
    # same content (different whitespace) -> same global id
    id1b = reg.register(
        "alarm-instances-value", json.dumps(json.loads(AVSC), indent=2)
    )
    assert id1 == id1b
    # same content under another subject -> same id, own version list
    id1c = reg.register("other-value", AVSC)
    assert id1c == id1
    id2 = reg.register("alarm-instances-value", AVSC_V2)
    assert id2 != id1
    assert reg.latest("alarm-instances-value") == (id2, 2, json.dumps(
        json.loads(AVSC_V2), sort_keys=True, separators=(",", ":")
    ))
    assert reg.version_of("alarm-instances-value", id1) == 1
    assert reg.subjects() == ["alarm-instances-value", "other-value"]


def test_not_found_maps_to_schema_not_found(registry_server):
    url, _ = registry_server
    reg = HttpSchemaRegistry(url)
    with pytest.raises(SchemaNotFound):
        reg.get_by_id(999)
    with pytest.raises(SchemaNotFound):
        reg.latest("nope")


def test_http_and_mock_agree(registry_server):
    """The two registry implementations must be interchangeable: the
    same call sequence yields identical ids/versions/schemas."""
    url, _ = registry_server
    http, mock = HttpSchemaRegistry(url), MockSchemaRegistry()
    for reg in (http, mock):
        reg.register("s1", AVSC)
        reg.register("s1", AVSC_V2)
        reg.register("s2", AVSC)
    assert http.latest("s1") == mock.latest("s1")
    assert http.latest("s2") == mock.latest("s2")
    assert http.subjects() == mock.subjects()


def test_serde_round_trip_over_http(registry_server):
    """MockAvroSerde is duck-typed over the registry: wire-framed
    records written against the HTTP registry decode with the writer
    schema resolved BY THE FRAME ID over HTTP — including records
    written under an older version."""
    url, _ = registry_server
    reg = HttpSchemaRegistry(url)
    v1 = MockAvroSerde(reg, "alarm-instances-value", AVSC)
    old_wire = v1.serialize({"action": "alarming", "n": 7})
    v2 = MockAvroSerde(reg, "alarm-instances-value", AVSC_V2)
    new_wire = v2.serialize({"action": None, "n": 1, "extra": 5})
    assert v2.deserialize(old_wire) == {"action": "alarming", "n": 7}
    assert v2.deserialize(new_wire) == {"action": None, "n": 1, "extra": 5}
    assert v1.schema_id != v2.schema_id


def test_version_of_unregistered_schema_raises(registry_server):
    """POST /subjects/{s} is a side-effect-free lookup: version_of for
    a schema never registered under the subject raises SchemaNotFound
    (Confluent 40403) and must NOT create the subject or a version."""
    base, store = registry_server
    client = HttpSchemaRegistry(base)
    sid = client.register("topic-a-value", AVSC)
    with pytest.raises(SchemaNotFound):
        client.version_of("topic-b-value", sid)
    assert "topic-b-value" not in store.subjects()
    # and an id that exists but under another subject: still not found
    client.register("topic-b-value", AVSC_V2)
    with pytest.raises(SchemaNotFound):
        client.version_of("topic-b-value", sid)
    assert store.latest("topic-b-value")[1] == 1  # no fabricated version

"""Confluent Schema Registry HTTP client (S4's production
register/lookup path).

The reference's serdes talk to a live Confluent Schema Registry over
REST (SCHEMA_REGISTRY_URL_CONFIG, ProcessingRule.java:41-52); its
tests swap in `mock://testing` (RegistrationRuleTest.java:36). This
module is the production half of that pair for this engine:
`registry.MockSchemaRegistry` is the offline mock, and
`HttpSchemaRegistry` speaks the PUBLIC Confluent REST protocol —

    POST /subjects/{subject}/versions   {"schema": "..."} -> {"id": N}
    POST /subjects/{subject}            {"schema": "..."} -> {..., "version": V}
    GET  /schemas/ids/{id}              -> {"schema": "..."}
    GET  /subjects/{subject}/versions/latest
                                        -> {"id","version","schema",...}
    GET  /subjects                      -> ["s", ...]

with the registry content type (application/vnd.schemaregistry.v1+json)
and 404/40401-style error mapping to SchemaNotFound. Pure stdlib
(urllib) — no confluent-kafka dependency, which this container cannot
install.

Both classes expose the SAME method surface (register / get_by_id /
latest / version_of / subjects), and `registry.MockAvroSerde` is
duck-typed over it, so the serde stack runs unchanged against either:
offline in tests, HTTP in production. The protocol itself is
verified in-process against a faithful fake server
(tests/test_registry_http.py) because the container has no network —
same technique as the broker-less Kafka transport
(sources/fake_broker.py).
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

from .registry import SchemaNotFound

CONTENT_TYPE = "application/vnd.schemaregistry.v1+json"


class HttpSchemaRegistry:
    """Confluent REST client with the MockSchemaRegistry surface."""

    def __init__(self, base_url: str, timeout_s: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    # -- wire ---------------------------------------------------------
    def _request(self, method: str, path: str, body: dict | None = None):
        data = None if body is None else json.dumps(body).encode("utf-8")
        req = urllib.request.Request(
            self.base_url + path,
            data=data,
            method=method,
            headers={
                "Accept": CONTENT_TYPE,
                **({"Content-Type": CONTENT_TYPE} if data else {}),
            },
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s) as r:
                return json.loads(r.read().decode("utf-8"))
        except urllib.error.HTTPError as exc:
            if exc.code == 404:
                # Confluent encodes the reason in error_code
                # (40401 subject, 40403 schema); both are not-found
                raise SchemaNotFound(f"{method} {path}") from None
            raise

    # -- MockSchemaRegistry surface -----------------------------------
    def register(self, subject: str, schema: str | dict) -> int:
        schema_str = (
            schema if isinstance(schema, str) else json.dumps(schema)
        )
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": schema_str},
        )
        return int(out["id"])

    def get_by_id(self, schema_id: int) -> str:
        return self._request("GET", f"/schemas/ids/{schema_id}")["schema"]

    def latest(self, subject: str) -> tuple[int, int, str]:
        out = self._request(
            "GET", f"/subjects/{subject}/versions/latest"
        )
        return int(out["id"]), int(out["version"]), out["schema"]

    def version_of(self, subject: str, schema_id: int) -> int:
        """Version of an already-registered schema within a subject —
        the check-if-registered endpoint, looked up by schema content
        (the REST API has no by-id-within-subject lookup)."""
        schema_str = self.get_by_id(schema_id)
        out = self._request(
            "POST", f"/subjects/{subject}", {"schema": schema_str}
        )
        return int(out["version"])

    def subjects(self) -> list[str]:
        return sorted(self._request("GET", "/subjects"))

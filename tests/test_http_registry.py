"""HTTP Schema Registry client tests against a stdlib http.server stub.

The reference resolves schemas over HTTP against per-cluster Confluent
registries (/root/reference/src/main/resources/application-local.yml:7,13);
its own test swaps in mock:// scopes (ReplicationApplicationTest.java:55-56).
Here the real REST protocol is exercised end to end: a stdlib
ThreadingHTTPServer implements the public Confluent subset
(POST /subjects/{s}/versions, GET /schemas/ids/{id},
GET /subjects, GET /subjects/{s}/versions[/latest|/{v}]) and
HttpSchemaRegistry speaks to it — including a full replication round trip
(test_replication_golden parity) with HTTP registries on both sides.
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from avro_topic_replication_spark.operators import replication as R
from avro_topic_replication_spark.sources.registry import (
    HttpSchemaRegistry,
    SchemaRegistryError,
)
from avro_topic_replication_spark.streaming.replay import SCRATCH


class _RegistryState:
    """Same semantics as MockSchemaRegistry, held by the stub server."""

    def __init__(self) -> None:
        self.by_id: dict[int, str] = {}
        self.subjects: dict[str, list[int]] = {}
        self.next_id = 1

    def register(self, subject: str, text: str) -> int:
        for sid in self.subjects.get(subject, []):
            if self.by_id[sid] == text:
                return sid
        sid = self.next_id
        self.next_id += 1
        self.by_id[sid] = text
        self.subjects.setdefault(subject, []).append(sid)
        return sid


def _make_handler(state: _RegistryState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _send(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            parts = [p for p in self.path.split("/") if p]
            if parts == ["subjects"]:
                return self._send(sorted(state.subjects))
            if len(parts) == 3 and parts[:2] == ["schemas", "ids"]:
                sid = int(parts[2])
                if sid not in state.by_id:
                    return self._send({"error_code": 40403, "message": "not found"}, 404)
                return self._send({"schema": state.by_id[sid]})
            if len(parts) >= 3 and parts[0] == "subjects" and parts[2] == "versions":
                subject = parts[1]
                ids = state.subjects.get(subject)
                if ids is None:
                    return self._send({"error_code": 40401, "message": "not found"}, 404)
                if len(parts) == 3:
                    return self._send(list(range(1, len(ids) + 1)))
                version = len(ids) if parts[3] == "latest" else int(parts[3])
                sid = ids[version - 1]
                return self._send(
                    {
                        "subject": subject,
                        "version": version,
                        "id": sid,
                        "schema": state.by_id[sid],
                    }
                )
            return self._send({"error_code": 404, "message": "bad path"}, 404)

        def do_POST(self):
            parts = [p for p in self.path.split("/") if p]
            if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n))
                sid = state.register(parts[1], body["schema"])
                return self._send({"id": sid})
            return self._send({"error_code": 404, "message": "bad path"}, 404)

    return Handler


@pytest.fixture()
def http_registry():
    state = _RegistryState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        yield HttpSchemaRegistry(f"http://127.0.0.1:{server.server_address[1]}")
    finally:
        server.shutdown()
        server.server_close()


def _two_registries():
    """Two independent stub servers = the two-cluster registry topology of
    application-local.yml (source :8083, target :8084)."""
    servers = []
    regs = []
    for _ in range(2):
        state = _RegistryState()
        server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        servers.append(server)
        regs.append(HttpSchemaRegistry(f"http://127.0.0.1:{server.server_address[1]}"))
    return servers, regs


def test_http_register_fetch_latest(http_registry):
    a = http_registry.register("topic-value", R.FOO_SCHEMA)
    b = http_registry.register("topic-value", R.FOO_SCHEMA)
    assert a == b  # idempotent: same canonical schema → same id
    assert http_registry.get_by_id(a)["name"] == "Foo"
    sid, schema = http_registry.latest("topic-value")
    assert sid == a and schema["name"] == "Foo"
    assert http_registry.subjects() == ["topic-value"]
    assert set(http_registry.snapshot()) == {a}


def test_http_registry_errors_surface(http_registry):
    with pytest.raises(SchemaRegistryError):
        http_registry.get_by_id(999)
    with pytest.raises(SchemaRegistryError):
        http_registry.latest("no-such-subject")


def test_http_schema_evolution_versions(http_registry):
    v1 = {"type": "record", "name": "Foo", "fields": [{"name": "id", "type": "string"}]}
    v2 = {
        "type": "record",
        "name": "Foo",
        "fields": [
            {"name": "id", "type": "string"},
            {"name": "name", "type": ["null", "string"], "default": None},
        ],
    }
    id1 = http_registry.register("s-value", v1)
    id2 = http_registry.register("s-value", v2)
    assert id1 != id2
    assert http_registry.latest("s-value")[0] == id2
    snap = http_registry.snapshot()
    assert set(snap) == {id1, id2}
    assert len(snap[id1]["fields"]) == 1 and len(snap[id2]["fields"]) == 2


def test_replication_golden_over_http_registries(spark):
    """ReplicationApplicationTest parity with the real registry protocol:
    the same golden assertions as test_replication_golden, but schemas
    resolve over HTTP on both sides — the exact wiring of
    application-local.yml, minus only the Kafka brokers."""
    servers, (src_reg, tgt_reg) = _two_registries()
    base = os.path.join(SCRATCH, "httpreg", uuid.uuid4().hex[:8])
    dirs = {
        "src": os.path.join(base, "source-topic-a"),
        "tgt": os.path.join(base, "target-topic-b"),
        "ckpt": os.path.join(base, "ckpt"),
    }
    try:
        rid = str(uuid.uuid4())
        R.write_envelope_fixture(
            spark, [{"id": rid, "name": None}], dirs["src"], "source-topic-a",
            src_reg, R.FOO_SCHEMA,
        )
        R.replicate_stream(
            spark, dirs["src"], dirs["tgt"], src_reg, tgt_reg,
            "target-topic-b", R.FOO_SCHEMA, dirs["ckpt"],
        )
        out_env = R.read_committed(spark, dirs["tgt"])
        decoded = R.decode_envelope(out_env, tgt_reg.snapshot(), R.FOO_SCHEMA).collect()
        assert len(decoded) == 1
        assert decoded[0]["kafka_key"] == rid
        assert decoded[0]["id"] == rid
        # schema auto-registered on the target over HTTP (README.adoc:27)
        assert tgt_reg.latest("target-topic-b-value")[1]["name"] == "Foo"
    finally:
        for s in servers:
            s.shutdown()
            s.server_close()

"""Schema Registry clients (R3/R6 support).

The reference wires Confluent serdes to per-cluster registry URLs
(/root/reference/src/main/resources/application-local.yml:7,13) and relies
on producer-side auto-registration (README.adoc:27); its test swaps in
mock:// scoped registries (ReplicationApplicationTest.java:55-56).

Mirrored here:
- MockSchemaRegistry — in-process, scope-named (the mock:// analog); used
  by every test, picklable so a plan-time snapshot ships to executors.
- HttpSchemaRegistry — minimal REST client for a real Confluent-compatible
  registry (register + fetch by id/subject over the public
  /subjects/{s}/versions and /schemas/ids/{id} endpoints). Not exercised
  in tests (no network in this environment) but interface-identical.

Plan-time resolution policy (SURVEY.md §7 hard-part 2): a streaming query
snapshots {schema_id → schema} when it is planned; per-record ids are
honored against that snapshot, and an unseen id fails the batch — the
restart-on-evolution contract.
"""

from __future__ import annotations

import json
import urllib.request

from ..functions.avro_codec import canonical_json, parse_schema


class SchemaRegistryError(RuntimeError):
    pass


class MockSchemaRegistry:
    """In-process registry with named scopes (mock://<scope> analog)."""

    _scopes: dict[str, "MockSchemaRegistry"] = {}

    def __init__(self) -> None:
        self._by_id: dict[int, str] = {}
        self._subjects: dict[str, list[int]] = {}
        self._next_id = 1

    @classmethod
    def get_scope(cls, scope: str) -> "MockSchemaRegistry":
        return cls._scopes.setdefault(scope, cls())

    @classmethod
    def drop_scope(cls, scope: str) -> None:
        cls._scopes.pop(scope, None)

    def register(self, subject: str, schema) -> int:
        """Idempotent register: same canonical schema → same id."""
        text = canonical_json(schema)
        for sid, known in self._by_id.items():
            if known == text and sid in self._subjects.get(subject, []):
                return sid
        sid = self._next_id
        self._next_id += 1
        self._by_id[sid] = text
        self._subjects.setdefault(subject, []).append(sid)
        return sid

    def get_by_id(self, schema_id: int):
        if schema_id not in self._by_id:
            raise SchemaRegistryError(f"unknown schema id {schema_id}")
        return parse_schema(self._by_id[schema_id])

    def latest(self, subject: str) -> tuple[int, object]:
        ids = self._subjects.get(subject)
        if not ids:
            raise SchemaRegistryError(f"unknown subject {subject!r}")
        return ids[-1], self.get_by_id(ids[-1])

    def snapshot(self) -> dict[int, object]:
        """Plan-time {id → parsed schema} snapshot (picklable, shipped to
        executors inside the decode closure)."""
        return {sid: parse_schema(text) for sid, text in self._by_id.items()}


class HttpSchemaRegistry:
    """Minimal Confluent-compatible REST registry client."""

    def __init__(self, base_url: str, timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _request(self, method: str, path: str, body: dict | None = None):
        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode() if body is not None else None,
            method=method,
            headers={"Content-Type": "application/vnd.schemaregistry.v1+json"},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except Exception as e:  # network/HTTP errors surface as registry errors
            raise SchemaRegistryError(f"{method} {path} failed: {e}") from e

    def register(self, subject: str, schema) -> int:
        out = self._request(
            "POST",
            f"/subjects/{subject}/versions",
            {"schema": canonical_json(schema)},
        )
        return int(out["id"])

    def get_by_id(self, schema_id: int):
        out = self._request("GET", f"/schemas/ids/{schema_id}")
        return parse_schema(out["schema"])

    def latest(self, subject: str) -> tuple[int, object]:
        out = self._request("GET", f"/subjects/{subject}/versions/latest")
        return int(out["id"]), parse_schema(out["schema"])

    def subjects(self) -> list[str]:
        return list(self._request("GET", "/subjects"))

    def snapshot(self) -> dict[int, object]:
        """Plan-time {id → parsed schema} snapshot, assembled by walking the
        public /subjects → /subjects/{s}/versions/{v} endpoints (same
        contract as MockSchemaRegistry.snapshot: picklable, shipped to
        executors inside the decode closure)."""
        out: dict[int, object] = {}
        for subject in self.subjects():
            for version in self._request("GET", f"/subjects/{subject}/versions"):
                entry = self._request("GET", f"/subjects/{subject}/versions/{version}")
                out[int(entry["id"])] = parse_schema(entry["schema"])
        return out

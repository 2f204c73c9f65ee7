"""REST catalog client — MoonrayCatalog semantics over a running
moonray HTTP service.

The reference exposes its table registry both as an embedded metadata
store (SQLite/Postgres, base_metadata_store.rs:15-68) and through the
REST API's table routes (rest_api.rs: list/create/drop). moonray's
``service.py`` is that server; this module is the matching CLIENT, the
Glue/REST-catalog model:

- CONTROL PLANE over HTTP: create / list / drop / exists / schema /
  describe / ingest go through the service, which serializes registry
  writes (its json backend is single-writer; its sqlite backend allows
  concurrent services).
- DATA PLANE direct: ``open_table`` returns a real ``MoonrayTable``
  bound to the table root the registry reports — scans, merges and
  maintenance run in THIS process's Ray session against shared storage,
  never proxied through the catalog server. (Same assumption the
  manifest already makes: table roots live on storage every node sees.)

    cat = RestCatalog("http://127.0.0.1:8642")
    cat.create_table("imgs", schema=SCHEMA, key_col="image_id")
    t = cat.open_table("imgs")          # local MoonrayTable, direct I/O
    cat.ingest("imgs", "upsert", [{...}])   # through the service
    cat.drop_table("imgs")
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pyarrow as pa

from moonray.table import MoonrayTable


class CatalogError(RuntimeError):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _schema_to_json(schema: pa.Schema) -> list[list[str]]:
    return [[f.name, str(f.type)] for f in schema]


class RestCatalog:
    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    # ---------------- transport ----------------
    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self.base_url + path, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read())
        except urllib.error.HTTPError as ex:
            try:
                msg = json.loads(ex.read()).get("error", str(ex))
            except Exception:  # noqa: BLE001 — best-effort error body
                msg = str(ex)
            raise CatalogError(ex.code, msg) from None

    # ---------------- registry ops ----------------
    def list_tables(self) -> dict:
        return self._call("GET", "/tables")["tables"]

    def table_exists(self, name: str) -> bool:
        return name in self.list_tables()

    def create_table(self, name: str, *, schema: pa.Schema,
                     key_col: str | None = None, key_cols=None,
                     identity: str = "keys", zone_cols=(),
                     **table_kwargs) -> MoonrayTable:
        body = {"schema": _schema_to_json(schema), "key_col": key_col,
                "identity": identity, "zone_cols": list(zone_cols)}
        if key_cols:
            body["key_cols"] = list(key_cols)
        body.update({k: v for k, v in table_kwargs.items()
                     if k in ("index_partitions", "rows_per_fragment")})
        self._call("POST", f"/tables/{name}", body)
        return self.open_table(name)

    def drop_table(self, name: str) -> None:
        self._call("DELETE", f"/tables/{name}")

    # ---------------- data plane ----------------
    def open_table(self, name: str) -> MoonrayTable:
        entry = self.list_tables().get(name)
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        return MoonrayTable.open(entry["root"])

    def schema(self, name: str) -> pa.Schema:
        pairs = self._call("GET", f"/schema/{name}")["schema"]
        from moonray.service import schema_from_json

        return schema_from_json(pairs)

    def describe(self, name: str) -> dict:
        return self._call("GET", f"/tables/{name}")

    # ---------------- write passthrough ----------------
    def ingest(self, name: str, operation: str, rows: list[dict],
               request_mode: str = "sync") -> dict:
        """Row ingest THROUGH the service (its write lock + event WAL
        apply); use ``open_table(name).merge(...)`` for bulk Dataset
        writes from this process instead."""
        return self._call("POST", f"/ingest/{name}",
                          {"operation": operation, "data": rows,
                           "request_mode": request_mode})

    def optimize(self, name: str, mode: str = "full") -> dict:
        return self._call("POST", f"/tables/{name}/optimize", {"mode": mode})

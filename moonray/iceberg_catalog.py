"""Iceberg REST catalog — spec-level server backend + client.

The reference commits Iceberg snapshots through an Iceberg REST catalog
client (src/moonlink/src/storage/table/iceberg/rest_catalog.rs, ~256
lines, alongside file_catalog.rs and glue_catalog.rs). moonray's
interop story goes the same way: ``export_iceberg`` (sinks/iceberg.py)
writes spec-format metadata, and this module makes those exports
DISCOVERABLE — a spec-level subset of the Apache Iceberg REST Catalog
OpenAPI surface mounted under ``/iceberg/v1`` on the moonray service
(service.py), plus the matching client (the ``rest_catalog.rs`` role):

    GET    /iceberg/v1/config
    GET    /iceberg/v1/namespaces
    POST   /iceberg/v1/namespaces                    {"namespace": ["ns"]}
    DELETE /iceberg/v1/namespaces/{ns}               (must be empty)
    GET    /iceberg/v1/namespaces/{ns}/tables
    POST   /iceberg/v1/namespaces/{ns}/register      {"name", "metadata-location"}
    GET    /iceberg/v1/namespaces/{ns}/tables/{t}    -> LoadTableResult
    DELETE /iceberg/v1/namespaces/{ns}/tables/{t}

Registration points at metadata an export already wrote (the spec's
register-table route); after each new export the client re-registers
the new metadata-location — the commit-to-catalog step of the
reference's iceberg_table_syncer. Any Iceberg-REST-speaking reader can
then list and load these tables; moonray's own distributed read path
resolves a LoadTableResult via
``read_iceberg_dataset(dest, metadata_location=...)``.

Scope notes (documented divergence from the full OpenAPI spec):
single-part namespaces only (no %1F multipart), no pagination, no
vended credentials, and no createTable route — moonray tables are
created through the engine and REACH Iceberg via export, so the
catalog's write surface is register/drop. Errors use the spec error
model ``{"error": {"message", "type", "code"}}``.
"""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request


class IcebergCatalogError(RuntimeError):
    """Spec error-model carrier: maps to/from the REST error payload."""

    def __init__(self, code: int, message: str, etype: str = "RESTError"):
        super().__init__(message)
        self.code = code
        self.etype = etype

    def payload(self) -> dict:
        return {"error": {"message": str(self), "type": self.etype,
                          "code": self.code}}


# ---------------------------------------------------------------------------
# Server backend (mounted by service.py under /iceberg/v1)
# ---------------------------------------------------------------------------


class IcebergCatalogRegistry:
    """Warehouse-scoped registry: namespace -> table -> metadata-location.

    Persisted as one JSON file under the warehouse, rewritten atomically
    on each mutation (registry entries are a handful of strings — the
    heavy metadata lives in the export's own files). Single-writer like
    the json MoonrayCatalog backend; concurrent registries belong to the
    sqlite backend, not this file.
    """

    def __init__(self, warehouse: str):
        self.path = os.path.join(warehouse, "iceberg_catalog.json")

    def _load(self) -> dict:
        try:
            with open(self.path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"namespaces": {}}

    def _save(self, state: dict) -> None:
        from moonray.util import atomic_write_text

        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        atomic_write_text(self.path, json.dumps(state, indent=1,
                                                sort_keys=True))

    # -------------- spec operations --------------
    def config(self) -> dict:
        return {"defaults": {}, "overrides": {}}

    def list_namespaces(self) -> dict:
        ns = sorted(self._load()["namespaces"])
        return {"namespaces": [[n] for n in ns]}

    def create_namespace(self, body: dict) -> dict:
        parts = body.get("namespace") or []
        if len(parts) != 1 or not parts[0]:
            raise IcebergCatalogError(
                400, "single-part namespace required", "BadRequestException")
        state = self._load()
        if parts[0] in state["namespaces"]:
            raise IcebergCatalogError(
                409, f"namespace {parts[0]} already exists",
                "AlreadyExistsException")
        state["namespaces"][parts[0]] = {}
        self._save(state)
        return {"namespace": parts, "properties": {}}

    def drop_namespace(self, ns: str) -> dict:
        state = self._load()
        tables = state["namespaces"].get(ns)
        if tables is None:
            raise IcebergCatalogError(
                404, f"no namespace {ns}", "NoSuchNamespaceException")
        if tables:
            raise IcebergCatalogError(
                409, f"namespace {ns} is not empty",
                "NamespaceNotEmptyException")
        del state["namespaces"][ns]
        self._save(state)
        return {}

    def _tables(self, state: dict, ns: str) -> dict:
        tables = state["namespaces"].get(ns)
        if tables is None:
            raise IcebergCatalogError(
                404, f"no namespace {ns}", "NoSuchNamespaceException")
        return tables

    def list_tables(self, ns: str) -> dict:
        tables = self._tables(self._load(), ns)
        return {"identifiers": [{"namespace": [ns], "name": t}
                                for t in sorted(tables)]}

    def register_table(self, ns: str, body: dict) -> dict:
        name = body.get("name")
        loc = body.get("metadata-location")
        if not name or not loc:
            raise IcebergCatalogError(
                400, "name and metadata-location required",
                "BadRequestException")
        if not os.path.isfile(loc):
            raise IcebergCatalogError(
                400, f"metadata-location not readable: {loc}",
                "BadRequestException")
        state = self._load()
        tables = self._tables(state, ns)
        # re-register = point the same identifier at newer metadata (the
        # per-export commit step); registering a NEW identifier over an
        # existing one with a different location history is still just a
        # pointer swap — Iceberg metadata files are immutable
        tables[name] = loc
        self._save(state)
        return self.load_table(ns, name)

    def load_table(self, ns: str, name: str) -> dict:
        tables = self._tables(self._load(), ns)
        loc = tables.get(name)
        if loc is None:
            raise IcebergCatalogError(
                404, f"no table {ns}.{name}", "NoSuchTableException")
        try:
            with open(loc) as f:
                meta = json.load(f)
        except FileNotFoundError:
            raise IcebergCatalogError(
                404, f"metadata missing for {ns}.{name}: {loc}",
                "NoSuchTableException") from None
        return {"metadata-location": loc, "metadata": meta, "config": {}}

    def drop_table(self, ns: str, name: str) -> dict:
        state = self._load()
        tables = self._tables(state, ns)
        if name not in tables:
            raise IcebergCatalogError(
                404, f"no table {ns}.{name}", "NoSuchTableException")
        # purge=false semantics: the registry entry goes, the exported
        # files stay (expire_iceberg_snapshots owns file GC)
        del tables[name]
        self._save(state)
        return {}

    # -------------- service dispatch --------------
    def route(self, method: str, parts: list[str], body: dict) -> dict:
        """Dispatch /iceberg/v1/... (parts exclude the mount prefix)."""
        if method == "GET":
            if parts == ["config"]:
                return self.config()
            if parts == ["namespaces"]:
                return self.list_namespaces()
            if len(parts) == 3 and parts[0] == "namespaces" \
                    and parts[2] == "tables":
                return self.list_tables(parts[1])
            if len(parts) == 4 and parts[0] == "namespaces" \
                    and parts[2] == "tables":
                return self.load_table(parts[1], parts[3])
        elif method == "POST":
            if parts == ["namespaces"]:
                return self.create_namespace(body)
            if len(parts) == 3 and parts[0] == "namespaces" \
                    and parts[2] == "register":
                return self.register_table(parts[1], body)
        elif method == "DELETE":
            if len(parts) == 2 and parts[0] == "namespaces":
                return self.drop_namespace(parts[1])
            if len(parts) == 4 and parts[0] == "namespaces" \
                    and parts[2] == "tables":
                return self.drop_table(parts[1], parts[3])
        raise IcebergCatalogError(
            404, f"no route {method} /iceberg/v1/{'/'.join(parts)}",
            "BadRequestException")


# ---------------------------------------------------------------------------
# Client (the reference's rest_catalog.rs role)
# ---------------------------------------------------------------------------


class IcebergRestCatalog:
    """Client for an Iceberg REST catalog serving moonray exports.

    ``register_export`` is the commit-to-catalog step: after each
    ``export_iceberg`` run it points the catalog identifier at the
    export's CURRENT metadata file, so catalog readers follow the table
    head while pinned readers keep their immutable metadata-location.
    """

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base = base_url.rstrip("/") + "/iceberg/v1"
        self.timeout = timeout

    def _call(self, method: str, path: str, body: dict | None = None) -> dict:
        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            self.base + path, data=data, method=method,
            headers={"Content-Type": "application/json"} if data else {})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read() or b"{}")
        except urllib.error.HTTPError as ex:
            try:
                err = json.loads(ex.read())["error"]
                raise IcebergCatalogError(
                    err.get("code", ex.code), err.get("message", str(ex)),
                    err.get("type", "RESTError")) from None
            except (json.JSONDecodeError, KeyError, TypeError):
                raise IcebergCatalogError(ex.code, str(ex)) from None

    def config(self) -> dict:
        return self._call("GET", "/config")

    def create_namespace(self, ns: str) -> dict:
        return self._call("POST", "/namespaces", {"namespace": [ns]})

    def list_namespaces(self) -> list[str]:
        return [p[0] for p in self._call("GET", "/namespaces")["namespaces"]]

    def drop_namespace(self, ns: str) -> None:
        self._call("DELETE", f"/namespaces/{ns}")

    def list_tables(self, ns: str) -> list[str]:
        out = self._call("GET", f"/namespaces/{ns}/tables")
        return [i["name"] for i in out["identifiers"]]

    def register_table(self, ns: str, name: str,
                       metadata_location: str) -> dict:
        return self._call("POST", f"/namespaces/{ns}/register",
                          {"name": name,
                           "metadata-location": metadata_location})

    def load_table(self, ns: str, name: str) -> dict:
        return self._call("GET", f"/namespaces/{ns}/tables/{name}")

    def table_exists(self, ns: str, name: str) -> bool:
        try:
            self.load_table(ns, name)
            return True
        except IcebergCatalogError as ex:
            if ex.code == 404:
                return False
            raise

    def drop_table(self, ns: str, name: str) -> None:
        self._call("DELETE", f"/namespaces/{ns}/tables/{name}")

    # -------------- moonray integration --------------
    def register_export(self, ns: str, name: str, dest: str) -> dict:
        """Register (or advance) ``ns.name`` to the CURRENT metadata of
        the Iceberg export at ``dest`` — call after export_iceberg."""
        from moonray.sinks.iceberg import load_table_metadata

        meta = load_table_metadata(dest)
        if meta is None:
            raise IcebergCatalogError(
                400, f"{dest} holds no Iceberg export", "BadRequestException")
        loc = os.path.join(dest, "metadata",
                           f"v{meta['_hint_version']}.metadata.json")
        return self.register_table(ns, name, loc)

    def read_dataset(self, ns: str, name: str, **scan_kwargs):
        """Catalog-resolved distributed read: loadTable → pin its
        metadata-location → ``read_iceberg_dataset`` over it (columns /
        ranges / snapshot_id pushdown all apply)."""
        from moonray.sources.iceberg_read import read_iceberg_dataset

        res = self.load_table(ns, name)
        loc = res["metadata-location"]
        dest = os.path.dirname(os.path.dirname(loc))
        return read_iceberg_dataset(dest, metadata_location=loc,
                                    **scan_kwargs)

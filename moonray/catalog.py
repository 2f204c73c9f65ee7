"""Catalog — the table registry.

The analogue of the reference's metadata store (table registry persisted
in SQLite/Postgres behind ``MetadataStoreTrait { metadata_table_exists,
get_all_table_metadata_entries, store_table_metadata,
delete_table_metadata }``, src/moonlink_metadata_store/src/
base_metadata_store.rs:15-68) and its file catalog
(src/moonlink/src/storage/table/iceberg/file_catalog.rs).

Two registry backends behind one MoonrayCatalog API:

- ``json`` (default): a ``tables.json`` beside the table roots,
  atomically rewritten — single-writer per warehouse (the same rule
  tables follow), works on local AND remote (``scheme://``) roots via
  the commit store.
- ``sqlite``: a ``catalog.sqlite`` registry with per-operation
  transactions (BEGIN IMMEDIATE + WAL) — the reference's
  sqlite_metadata_store analogue for CONCURRENT multi-driver
  registries on a shared filesystem. Local warehouses only.

``backend=None`` auto-detects: an existing ``catalog.sqlite`` selects
sqlite, otherwise json.

    cat = MoonrayCatalog("/warehouse")            # or backend="sqlite"
    t = cat.create_table("imgs", key_col=..., schema=...)
    cat.list_tables() -> {"imgs": {...}}
    t = cat.open_table("imgs")
    cat.drop_table("imgs")          # registry remove + data delete
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow as pa

from moonray.table import MoonrayTable
from moonray.util import atomic_write_json, read_json


class _JsonRegistry:
    """Whole-registry read/rewrite (single-writer; remote-capable)."""

    def __init__(self, warehouse: str, remote: bool):
        self.warehouse = warehouse
        self.remote = remote

    @property
    def _path(self) -> str:
        return os.path.join(self.warehouse, "tables.json")

    def _load(self) -> dict:
        if self.remote:
            from moonray.commitstore import store_for

            st = store_for(self.warehouse)
            if st.exists("tables.json"):
                return json.loads(st.read("tables.json"))
            return {}
        if os.path.exists(self._path):
            return read_json(self._path).get("tables", {})
        return {}

    def _save(self, tables: dict) -> None:
        if self.remote:
            from moonray.storage import publish_bytes

            publish_bytes(self.warehouse, "tables.json",
                          json.dumps(tables, indent=1, sort_keys=True).encode())
            return
        atomic_write_json(self._path, {"tables": tables}, durable=True)

    def entries(self) -> dict:
        t = self._load()
        # remote registry historically stored {"tables": {...}}
        return t.get("tables", t) if self.remote and "tables" in t else t

    def insert(self, name: str, entry: dict) -> None:
        t = self.entries()
        if name in t:
            raise ValueError(f"table {name!r} already exists")
        t[name] = entry
        self._save(t)

    def mutate(self, name: str, fn) -> None:
        t = self.entries()
        if name not in t:
            raise KeyError(f"no such table {name!r}")
        t[name] = fn(t[name])
        self._save(t)

    def delete(self, name: str) -> dict:
        t = self.entries()
        entry = t.pop(name, None)
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        self._save(t)
        return entry


class _SqliteRegistry:
    """Per-operation transactional registry (concurrent multi-driver
    safe): every call opens its own connection, takes BEGIN IMMEDIATE
    (a real write lock), and commits — the reference's SQLite metadata
    store shape (src/moonlink_metadata_store/src/sqlite/*)."""

    FILE = "catalog.sqlite"

    def __init__(self, warehouse: str):
        self.path = os.path.join(warehouse, self.FILE)
        with self._conn() as c:
            c.execute("PRAGMA journal_mode=WAL")
            c.execute("CREATE TABLE IF NOT EXISTS tables("
                      "name TEXT PRIMARY KEY, entry TEXT NOT NULL)")

    def _conn(self):
        import sqlite3

        return sqlite3.connect(self.path, timeout=30.0,
                               isolation_level=None)

    def entries(self) -> dict:
        with self._conn() as c:
            rows = c.execute("SELECT name, entry FROM tables").fetchall()
        return {n: json.loads(e) for n, e in rows}

    def insert(self, name: str, entry: dict) -> None:
        import sqlite3

        with self._conn() as c:
            try:
                c.execute("BEGIN IMMEDIATE")
                c.execute("INSERT INTO tables(name, entry) VALUES(?, ?)",
                          (name, json.dumps(entry, sort_keys=True)))
                c.execute("COMMIT")
            except sqlite3.IntegrityError:
                c.execute("ROLLBACK")
                raise ValueError(f"table {name!r} already exists") from None

    def mutate(self, name: str, fn) -> None:
        with self._conn() as c:
            c.execute("BEGIN IMMEDIATE")
            row = c.execute("SELECT entry FROM tables WHERE name=?",
                            (name,)).fetchone()
            if row is None:
                c.execute("ROLLBACK")
                raise KeyError(f"no such table {name!r}")
            c.execute("UPDATE tables SET entry=? WHERE name=?",
                      (json.dumps(fn(json.loads(row[0])), sort_keys=True),
                       name))
            c.execute("COMMIT")

    def delete(self, name: str) -> dict:
        with self._conn() as c:
            c.execute("BEGIN IMMEDIATE")
            row = c.execute("SELECT entry FROM tables WHERE name=?",
                            (name,)).fetchone()
            if row is None:
                c.execute("ROLLBACK")
                raise KeyError(f"no such table {name!r}")
            c.execute("DELETE FROM tables WHERE name=?", (name,))
            c.execute("COMMIT")
        return json.loads(row[0])


class _EntryRegistry:
    """Glue-catalog-shaped registry (reference glue_catalog.rs:1-317):
    ONE registry object per table behind per-entry catalog calls —
    ``catalog/<name>.json`` through the commit store — instead of a
    whole-registry file or a local database. Create is a conditional
    object create (put_if_absent → the Glue AlreadyExistsException
    semantics, serialized server-side even across racing drivers);
    list/get are per-entry reads; delete is a per-entry delete.
    Works on any commit-store scheme — mock:// and the real-HTTP
    s3test:// object server in tests, the documented S3 conditional
    writes in production. ``mutate`` is read-modify-write on the one
    entry (per-table metadata follows the table's single-writer rule;
    CREATE races are what the conditional create must serialize)."""

    PREFIX = "catalog"

    def __init__(self, warehouse: str):
        self.warehouse = warehouse

    def _store(self):
        from moonray.commitstore import store_for

        return store_for(self.warehouse)

    def _rel(self, name: str) -> str:
        if "/" in name or "\\" in name:
            raise ValueError(f"invalid table name {name!r}")
        if name == self.PREFIX:
            # a table named 'catalog' would root at <warehouse>/catalog
            # — the registry's own prefix: entries() would read its
            # manifests as phantom tables and drop would wipe EVERY
            # registration
            raise ValueError(
                f"table name {name!r} is reserved by the entry registry")
        return f"{self.PREFIX}/{name}.json"

    def entries(self) -> dict:
        st = self._store()
        out = {}
        for rel in st.list(self.PREFIX):
            fn = os.path.basename(rel)
            if fn.endswith(".json"):
                try:
                    out[fn[:-5]] = json.loads(st.read(rel))
                except FileNotFoundError:
                    continue   # dropped between list and read — omit
        return out

    def insert(self, name: str, entry: dict) -> None:
        from moonray.commitstore import CommitConflict

        try:
            self._store().put_if_absent(
                self._rel(name),
                json.dumps(entry, sort_keys=True).encode())
        except CommitConflict:
            raise ValueError(f"table {name!r} already exists") from None

    def _get(self, name: str) -> dict:
        try:
            return json.loads(self._store().read(self._rel(name)))
        except FileNotFoundError:
            raise KeyError(f"no such table {name!r}") from None

    def mutate(self, name: str, fn) -> None:
        entry = fn(self._get(name))
        import tempfile

        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            f.write(json.dumps(entry, sort_keys=True))
            tmp = f.name
        try:
            self._store().put(self._rel(name), tmp)
        finally:
            try:
                os.unlink(tmp)
            except FileNotFoundError:
                pass

    def delete(self, name: str) -> dict:
        entry = self._get(name)
        self._store().delete(self._rel(name))
        return entry


class MoonrayCatalog:
    """A warehouse may live on a local filesystem OR an object store
    (``scheme://`` — mock:// in tests, the documented S3 mapping in
    production): registry reads/writes route through the selected
    backend, table roots are ``<warehouse>/<name>`` on the same scheme,
    and drop deletes the table's objects by prefix. The json backend
    assumes one catalog writer per warehouse; the sqlite backend allows
    concurrent writers on a shared filesystem; the ``entry`` backend
    (per-table registry objects, conditional create — the Glue shape)
    allows concurrent CREATE racers on any commit-store scheme."""

    def __init__(self, warehouse: str, backend: str | None = None):
        from moonray.filecache import is_remote

        self.warehouse = warehouse
        self._remote = is_remote(warehouse)
        if not self._remote:
            os.makedirs(warehouse, exist_ok=True)
        if backend is None:
            if not self._remote and os.path.exists(
                    os.path.join(warehouse, _SqliteRegistry.FILE)):
                backend = "sqlite"
            elif self._detect_entry_registry():
                backend = "entry"
            else:
                backend = "json"
        if backend == "sqlite":
            if self._remote:
                raise ValueError("sqlite catalog backend requires a local "
                                 "warehouse path")
            self._reg = _SqliteRegistry(warehouse)
        elif backend == "json":
            self._reg = _JsonRegistry(warehouse, self._remote)
        elif backend == "entry":
            self._reg = _EntryRegistry(warehouse)
        else:
            raise ValueError(f"unknown catalog backend {backend!r}")
        self.backend = backend

    def _detect_entry_registry(self) -> bool:
        """backend=None auto-detect of the per-entry (Glue-shaped)
        registry: a populated ``catalog/`` prefix with no whole-file
        registry present."""
        if not self._remote:
            d = os.path.join(self.warehouse, _EntryRegistry.PREFIX)
            return (not os.path.exists(
                os.path.join(self.warehouse, "tables.json"))
                and os.path.isdir(d)
                and any(f.endswith(".json") for f in os.listdir(d)))
        from moonray.commitstore import store_for

        st = store_for(self.warehouse)
        return (not st.exists("tables.json")
                and bool(st.list(_EntryRegistry.PREFIX)))

    # ---------------- operations ----------------
    def create_table(self, name: str, *, schema: pa.Schema,
                     key_col: str | None = None, key_cols=None,
                     identity: str = "keys", **table_kwargs) -> MoonrayTable:
        root = os.path.join(self.warehouse, name)
        entry = {
            "root": root,
            "key_col": key_col,
            "key_cols": list(key_cols) if key_cols else None,
            "identity": identity,
            "config": {k: v for k, v in table_kwargs.items()
                       if isinstance(v, (int, str, float, list, tuple))},
        }
        # reserve the name atomically FIRST (concurrent creators race on
        # the registry row, not on half-written table roots)
        self._reg.insert(name, entry)
        try:
            return MoonrayTable.create(root, key_col=key_col,
                                       key_cols=key_cols, identity=identity,
                                       schema=schema, **table_kwargs)
        except BaseException:
            self._reg.delete(name)
            raise

    def register_table(self, name: str, root: str) -> MoonrayTable:
        """Register an EXISTING table root under a catalog name (e.g. a
        shallow clone or an imported table) — the catalog analogue of
        Iceberg registerTable. Raises if the root holds no table."""
        t = MoonrayTable.open(root)  # must exist
        m = t.manifest()
        self._reg.insert(name, {
            "root": root,
            "key_col": m.get("key_col"),
            "key_cols": m.get("key_cols"),
            "identity": m.get("identity", "keys"),
            "config": {},
        })
        return t

    def set_table_meta(self, name: str, key: str, value) -> None:
        """Attach a JSON-serializable metadata entry to a registered
        table (e.g. a Kafka topic's Avro schema) — the analogue of the
        reference's per-table MoonlinkTableConfig persisted in the
        metadata store (base_metadata_store.rs:15-68)."""
        def upd(entry: dict) -> dict:
            entry.setdefault("meta", {})[key] = value
            return entry

        self._reg.mutate(name, upd)

    def get_table_meta(self, name: str, key: str, default=None):
        entry = self._reg.entries().get(name)
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        return entry.get("meta", {}).get(key, default)

    def table_exists(self, name: str) -> bool:
        return name in self._reg.entries()

    def list_tables(self) -> dict:
        return self._reg.entries()

    def open_table(self, name: str) -> MoonrayTable:
        entry = self._reg.entries().get(name)
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        return MoonrayTable.open(entry["root"])

    def drop_table(self, name: str) -> None:
        """Registry removal FIRST (the table disappears atomically),
        then best-effort data deletion — mirroring the reference's
        DropTable event ordering. Dropping a shallow CLONE releases its
        retention pin on the source (best-effort), so the source's
        expire_snapshots stops keeping files for a table that no
        longer exists."""
        entry = self._reg.delete(name)
        try:
            from moonray import manifest as mf
            from moonray.clone import release_clone_at

            src = mf.load_manifest(entry["root"]).get("cloned_from")
            if src:
                release_clone_at(src["root"], entry["root"])
        except Exception:
            pass  # best-effort: a missing/cold source must not block drop
        if self._remote:
            from moonray.commitstore import store_for
            from moonray.storage import scratch_for

            st = store_for(self.warehouse)
            for rel in st.list(name):
                st.delete(rel)
            shutil.rmtree(scratch_for(entry["root"]), ignore_errors=True)
            return
        shutil.rmtree(entry["root"], ignore_errors=True)

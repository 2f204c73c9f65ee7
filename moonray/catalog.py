"""Catalog — the table registry.

The analogue of the reference's metadata store (table registry persisted
in SQLite/Postgres behind ``MetadataStoreTrait { metadata_table_exists,
get_all_table_metadata_entries, store_table_metadata,
delete_table_metadata }``, src/moonlink_metadata_store/src/
base_metadata_store.rs:15-68) and its file catalog
(src/moonlink/src/storage/table/iceberg/file_catalog.rs): a
``tables.json`` registry beside the table roots, atomically rewritten.

    cat = MoonrayCatalog("/warehouse")
    t = cat.create_table("imgs", key_col=..., schema=...)
    cat.list_tables() -> {"imgs": {...}}
    t = cat.open_table("imgs")
    cat.drop_table("imgs")          # registry remove + data delete
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa

from moonray.table import MoonrayTable
from moonray.util import atomic_write_json, read_json


class MoonrayCatalog:
    """A warehouse may live on a local filesystem OR an object store
    (``scheme://`` — mock:// in tests, the documented S3 mapping in
    production): the registry reads/writes route through the commit
    store, table roots are ``<warehouse>/<name>`` on the same scheme,
    and drop deletes the table's objects by prefix. One catalog writer
    per warehouse (the same single-writer rule tables follow)."""

    def __init__(self, warehouse: str):
        from moonray.filecache import is_remote

        self.warehouse = warehouse
        self._remote = is_remote(warehouse)
        if not self._remote:
            os.makedirs(warehouse, exist_ok=True)

    @property
    def _registry_path(self) -> str:
        return os.path.join(self.warehouse, "tables.json")

    def _registry(self) -> dict:
        if self._remote:
            import json

            from moonray.commitstore import store_for

            st = store_for(self.warehouse)
            if st.exists("tables.json"):
                return json.loads(st.read("tables.json"))
            return {"tables": {}}
        if os.path.exists(self._registry_path):
            return read_json(self._registry_path)
        return {"tables": {}}

    def _save(self, reg: dict) -> None:
        if self._remote:
            import json

            from moonray.storage import publish_bytes

            publish_bytes(self.warehouse, "tables.json",
                          json.dumps(reg, indent=1, sort_keys=True).encode())
            return
        atomic_write_json(self._registry_path, reg, durable=True)

    # ---------------- operations ----------------
    def create_table(self, name: str, *, schema: pa.Schema,
                     key_col: str | None = None, key_cols=None,
                     identity: str = "keys", **table_kwargs) -> MoonrayTable:
        reg = self._registry()
        if name in reg["tables"]:
            raise ValueError(f"table {name!r} already exists")
        root = os.path.join(self.warehouse, name)
        t = MoonrayTable.create(root, key_col=key_col, key_cols=key_cols,
                                identity=identity, schema=schema,
                                **table_kwargs)
        reg["tables"][name] = {
            "root": root,
            "key_col": key_col,
            "key_cols": list(key_cols) if key_cols else None,
            "identity": identity,
            "config": {k: v for k, v in table_kwargs.items()
                       if isinstance(v, (int, str, float, list, tuple))},
        }
        self._save(reg)
        return t

    def set_table_meta(self, name: str, key: str, value) -> None:
        """Attach a JSON-serializable metadata entry to a registered
        table (e.g. a Kafka topic's Avro schema) — the analogue of the
        reference's per-table MoonlinkTableConfig persisted in the
        metadata store (base_metadata_store.rs:15-68)."""
        reg = self._registry()
        if name not in reg["tables"]:
            raise KeyError(f"no such table {name!r}")
        reg["tables"][name].setdefault("meta", {})[key] = value
        self._save(reg)

    def get_table_meta(self, name: str, key: str, default=None):
        entry = self._registry()["tables"].get(name)
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        return entry.get("meta", {}).get(key, default)

    def table_exists(self, name: str) -> bool:
        return name in self._registry()["tables"]

    def list_tables(self) -> dict:
        return dict(self._registry()["tables"])

    def open_table(self, name: str) -> MoonrayTable:
        reg = self._registry()
        if name not in reg["tables"]:
            raise KeyError(f"no such table {name!r}")
        return MoonrayTable.open(reg["tables"][name]["root"])

    def drop_table(self, name: str) -> None:
        """Registry removal FIRST (the table disappears atomically),
        then best-effort data deletion — mirroring the reference's
        DropTable event ordering."""
        reg = self._registry()
        entry = reg["tables"].pop(name, None)
        if entry is None:
            raise KeyError(f"no such table {name!r}")
        self._save(reg)
        if self._remote:
            from moonray.commitstore import store_for
            from moonray.storage import scratch_for

            st = store_for(self.warehouse)
            for rel in st.list(name):
                st.delete(rel)
            shutil.rmtree(scratch_for(entry["root"]), ignore_errors=True)
            return
        shutil.rmtree(entry["root"], ignore_errors=True)

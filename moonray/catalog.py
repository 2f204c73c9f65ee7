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
    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    @property
    def _registry_path(self) -> str:
        return os.path.join(self.warehouse, "tables.json")

    def _registry(self) -> dict:
        if os.path.exists(self._registry_path):
            return read_json(self._registry_path)
        return {"tables": {}}

    def _save(self, reg: dict) -> None:
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
        shutil.rmtree(entry["root"], ignore_errors=True)

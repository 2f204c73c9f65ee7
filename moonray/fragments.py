"""Fragment writing + scanning.

A *fragment* is one immutable parquet file carrying the user columns plus
``_rowoff`` (uint32 in-fragment row offset — the explicit form of the
reference's ``RecordLocation::DiskFile(file_id, row_offset)``,
src/moonlink/src/storage/storage_utils.rs:83-91). Fragment writes happen
inside ``map_batches`` tasks on any worker; each write emits

- the parquet file under ``fragments/``,
- a JSON *sidecar* under ``staging/{job}/meta/`` with rows/bytes/zone
  maps (min/max per zone column — the Iceberg-manifest stats analogue,
  reference: src/moonlink/src/storage/table/iceberg/parquet_stats_utils.rs),
- and returns the key-index entry rows ``(key, _frag, _off)`` downstream
  (the reference builds its GlobalIndex from the same triples at flush:
  src/moonlink/src/storage/mooncake_table.rs:862-955).

Writes are idempotent per (job, task uuid): files land under unique
names and only become visible when a manifest references them; a crashed
job leaves invisible orphans that ``expire_snapshots`` GCs.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from moonray.util import atomic_write_json

ROWOFF = "_rowoff"
NBYTES = "_nbytes"


def row_payload_bytes(t: pa.Table) -> pa.Array | None:
    """Per-row payload size (uint32) when the table carries variable-
    width binary columns, else None. Persisted as ``{NBYTES}`` alongside
    ``{ROWOFF}`` so later planners (Z-order boundary sampling) can cut
    equal-BYTE partitions from a thin-column read: equal-ROW cuts on an
    image table skew reducer input 7× (payload size correlates with the
    Z-key columns), and the biggest bucket alone sets the makespan."""
    var_cols = [f.name for f in t.schema
                if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)]
    if not var_cols:
        return None
    total = np.zeros(len(t), dtype=np.int64)
    for c in var_cols:
        total += np.asarray(
            pc.binary_length(t[c].combine_chunks()), dtype=np.int64)
    for f in t.schema:
        if f.name not in var_cols:
            try:
                total += f.type.bit_width // 8
            except ValueError:  # nested / var-width non-binary: flat fee
                total += 8
    return pa.array(np.minimum(total, np.iinfo(np.uint32).max).astype(np.uint32))


def normalize_to_schema(t: pa.Table, schema: pa.Schema,
                        defaults: dict | None = None,
                        keep_extra: tuple[str, ...] = ()) -> pa.Table:
    """Project a fragment table onto the current table schema: columns
    added by ALTER TABLE after the fragment was written are filled with
    their declared default (or null); columns dropped by ALTER vanish.
    Mirrors the reference's add/drop-only schema evolution
    (src/moonlink/src/storage/mooncake_table.rs:100-126,644-647)."""
    defaults = defaults or {}
    cols, names = [], []
    for field in schema:
        if field.name in t.column_names:
            cols.append(t[field.name])
        else:
            fill = defaults.get(field.name)
            cols.append(pa.array([fill] * len(t), field.type))
        names.append(field.name)
    for extra in keep_extra:
        if extra in t.column_names and extra not in names:
            cols.append(t[extra])
            names.append(extra)
    return pa.table(dict(zip(names, cols)))


def compute_zones(table: pa.Table, zone_cols) -> dict:
    """min/max per zone column, JSON-safe and order-preserving for the
    full extended-type palette (decimal/date/time/timestamp/binary —
    see moonray/types.py for the encodings); nested types are skipped
    (no total order)."""
    from moonray.types import compute_zones_typed

    return compute_zones_typed(table, zone_cols)


def rg_rows_of(rows_per_fragment: int) -> int:
    """Row-group granularity for fragment parquets: 8 scan splits per
    flush-sized fragment (floor 64 rows so narrow tables don't explode
    into sliver groups)."""
    return max(64, rows_per_fragment // 8)


def write_fragment(
    root: str,
    job_id: str,
    table: pa.Table,
    *,
    key_col: str | None,
    zone_cols,
    frag_id: str | None = None,
    compression: str = "snappy",
    data_cols: list[str] | None = None,
    row_group_rows: int | None = None,
) -> tuple[dict, pa.Table | None]:
    """Write one fragment parquet + sidecar; return (meta, index_entries).

    ``data_cols`` limits what lands in the parquet (e.g. the user schema,
    excluding a derived ``_ckey`` identity column that still feeds the
    index entries). ``key_col=None`` (identity='none' append-only
    tables) skips index entries entirely — returns (meta, None)."""
    if frag_id is None:
        # content-derived id → idempotent under Ray task retries (a
        # retried task overwrites the same files, never duplicates rows)
        from moonray.util import content_id

        id_cols = [key_col] if key_col else list(table.column_names)[:2]
        frag_id = f"f-{job_id}-{content_id(table, *id_cols)}"
    rel = os.path.join("fragments", f"{frag_id}.parquet")
    n = len(table)
    offs = pa.array(np.arange(n, dtype=np.uint32))
    data = table.select(data_cols) if data_cols is not None else table
    out = data.append_column(ROWOFF, offs)
    nb = row_payload_bytes(data)
    if nb is not None:
        out = out.append_column(NBYTES, nb)
    from moonray.storage import publish_file, publish_tmp, stage_path

    tmp = publish_tmp(root, rel)
    # binary payload columns (image bytes) are already codec-compressed;
    # re-compressing them costs CPU on both write and every scan for ~0%
    # size win — store them raw, compress only the narrow columns.
    comp: str | dict = compression
    binary_cols = [f.name for f in out.schema
                   if pa.types.is_binary(f.type) or pa.types.is_large_binary(f.type)]
    if binary_cols:
        comp = {c: "none" for c in binary_cols}
        for f in out.schema:
            if f.name not in comp:
                comp[f.name] = compression
    if row_group_rows:
        # fixed row-group granularity, recorded in the fragment meta:
        # scans split one big fragment into per-row-group ReadTasks, so
        # compaction can consolidate files without capping scan
        # parallelism at the fragment count (the file-split story every
        # scan engine has)
        pq.write_table(out, tmp, compression=comp,
                       row_group_size=row_group_rows)
    else:
        pq.write_table(out, tmp, compression=comp)
    nbytes = os.path.getsize(tmp)
    # manifest-referenced: durable before the manifest is (publish_file
    # fsyncs locally / uploads the complete object remotely)
    publish_file(root, rel, tmp)
    meta = {
        "id": frag_id,
        "path": rel,
        "rows": n,
        "bytes": nbytes,
        "dv": None,
        "dv_count": 0,
        "zones": compute_zones(table, zone_cols),
        **({"rg_rows": int(row_group_rows)} if row_group_rows else {}),
    }
    meta_dir = stage_path(root, "staging", job_id, "meta")
    os.makedirs(meta_dir, exist_ok=True)
    atomic_write_json(os.path.join(meta_dir, f"{frag_id}.json"), meta)
    if key_col is None:
        return meta, None
    entries = pa.table(
        {
            key_col: table[key_col],
            "_frag": pa.array([frag_id] * n, pa.string()),
            "_off": offs,
        }
    )
    return meta, entries


class FragmentWriter:
    """map_batches stage: Arrow batch in → index-entry rows out, fragment
    parquet + sidecar written as a side effect. Stateless w.r.t. batches;
    used as a task (plain callable would also work) — kept as a class so
    config is serialized once per actor.

    With ``index_partitions`` set, the task also stages its index entries
    pre-partitioned (keyindex.stage_entry_runs) and returns only a tiny
    count row — the caller then folds partitions with
    ``build_index_from_runs`` instead of running a Ray Data entry
    shuffle behind the write pipeline."""

    def __init__(self, root: str, job_id: str, key_col: str | None, zone_cols,
                 compression: str = "snappy", data_cols: list[str] | None = None,
                 index_partitions: int | None = None,
                 row_group_rows: int | None = None):
        self.root = root
        self.job_id = job_id
        self.key_col = key_col
        self.zone_cols = list(zone_cols)
        self.compression = compression
        self.data_cols = data_cols
        self.index_partitions = index_partitions
        self.row_group_rows = row_group_rows

    def _empty_entries(self, batch: pa.Table) -> pa.Table:
        cols = {}
        if self.key_col is not None:
            cols[self.key_col] = (batch[self.key_col].slice(0, 0)
                                  if self.key_col in batch.column_names
                                  else pa.array([], pa.string()))
        cols["_frag"] = pa.array([], pa.string())
        cols["_off"] = pa.array([], pa.uint32())
        return pa.table(cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            if self.index_partitions is not None:
                return pa.table({"rows": pa.array([0], pa.int64())})
            return self._empty_entries(batch)
        _meta, entries = write_fragment(
            self.root, self.job_id, batch,
            key_col=self.key_col, zone_cols=self.zone_cols,
            compression=self.compression, data_cols=self.data_cols,
            row_group_rows=self.row_group_rows,
        )
        if self.index_partitions is not None:
            if entries is not None and self.key_col is not None:
                from moonray.keyindex import stage_entry_runs

                stage_entry_runs(self.root, self.job_id, entries,
                                 self.key_col, self.index_partitions)
            return pa.table({"rows": pa.array([len(batch)], pa.int64())})
        return entries if entries is not None else self._empty_entries(batch)


def collect_staged_fragment_meta(root: str, job_id: str) -> list[dict]:
    """Driver-side: gather the sidecars a job's write stages produced."""
    import glob as _glob
    import json

    metas = []
    from moonray.storage import stage_path

    for p in sorted(_glob.glob(os.path.join(
            stage_path(root, "staging", job_id, "meta"), "*.json"))):
        with open(p) as f:
            metas.append(json.load(f))
    return metas

"""Distributed Iceberg read: an exported (or any Hadoop-catalog v3)
Iceberg table as a ``ray.data.Dataset``.

``sinks.iceberg.read_iceberg_table`` is the spec-level verifier — it
replays the snapshot into ONE driver-side ``pa.Table`` (fine for
parity checks, wrong at scale). This module is the scale path: the
driver touches only metadata (version-hint JSON → manifest-list OCF →
manifest OCFs → entry records); every data file becomes its own
ReadTask that opens the parquet column-pruned and subtracts its
puffin deletion vector *inside the task*. The puffin blob is decoded
on the worker, so DV bytes never pass through the driver, and the DV
filter is a vectorized boolean mask over row positions.

Reference parity: this is moonlink's union-read consumed from the
Iceberg side (iceberg/deletion_vector.rs:80-145 blob framing;
DataFusion's scan over snapshot+DV state) — the path an external
warehouse (Spark/Trino/DuckDB-iceberg) takes when it reads the
exported table.

Scale contract: one ReadTask per data file. File granularity is set
at export time by the engine's fragment sizing (rows_per_fragment /
~128 MiB target), so tasks are already right-sized for the object
store; row-group splitting would need per-file parquet footer reads
on the driver for position bookkeeping and buys nothing here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from moonray.sinks.iceberg import _replay_entries, load_table_metadata


def _dv_specs(deletes: list[dict]) -> dict[str, tuple[str, int, int]]:
    """referenced data file → (puffin path, blob offset, blob size)."""
    out: dict[str, tuple[str, int, int]] = {}
    for e in deletes:
        df = e["data_file"]
        out[df["referenced_data_file"]] = (
            df["file_path"], df["content_offset"],
            df["content_size_in_bytes"])
    return out


def _decode_bound(raw: bytes, ice_type: str):
    """Iceberg single-value deserialization for the primitive types the
    export's bounds writer produces (sinks.iceberg._single_value_bytes)."""
    import struct as _struct

    if ice_type in ("int", "date"):
        return _struct.unpack("<i", raw)[0]
    if ice_type in ("long", "time", "timestamp", "timestamptz"):
        return _struct.unpack("<q", raw)[0]
    if ice_type == "float":
        return _struct.unpack("<f", raw)[0]
    if ice_type == "double":
        return _struct.unpack("<d", raw)[0]
    if ice_type == "string":
        return raw.decode()
    if ice_type == "boolean":
        return raw != b"\x00"
    if isinstance(ice_type, str) and ice_type.startswith("decimal("):
        return int.from_bytes(raw, "big", signed=True)  # unscaled
    if ice_type == "uuid" or (isinstance(ice_type, str)
                              and ice_type.startswith("fixed[")) \
            or ice_type == "binary":
        return raw
    return None


def _ice_bound_encoded(v, ice_type):
    """User-supplied bound (natural Python value) → the same domain
    _decode_bound returns, per Iceberg type (moonray/types.py does the
    per-Arrow-type work)."""
    import pyarrow as _pa

    from moonray import types as _ty

    if v is None:
        return None
    if ice_type == "date":
        return _ty.bound_encoded(v, _pa.date32())
    if ice_type in ("timestamp", "timestamptz"):
        return _ty.bound_encoded(v, _pa.timestamp("us"))
    if ice_type == "time":
        return _ty.bound_encoded(v, _pa.time64("us"))
    if isinstance(ice_type, str) and ice_type.startswith("decimal("):
        p, s = ice_type[8:-1].split(",")
        return _ty.bound_encoded(v, _pa.decimal128(int(p), int(s)))
    if ice_type in ("uuid", "binary") or (isinstance(ice_type, str)
                                          and ice_type.startswith("fixed[")):
        return bytes.fromhex(v) if isinstance(v, str) else bytes(v)
    return v


def _bounds_overlap(df: dict, ranges: dict, fid_of: dict,
                    type_of: dict) -> bool:
    """Manifest-entry bounds vs requested ranges — False only when the
    bounds PROVE no row matches (files without bounds always read; the
    in-task filter stays the source of truth)."""
    lo_map = {kv["key"]: kv["value"] for kv in df.get("lower_bounds") or []}
    hi_map = {kv["key"]: kv["value"] for kv in df.get("upper_bounds") or []}
    for col, (lo, hi) in ranges.items():
        fid = fid_of.get(col)
        typ = type_of.get(col)
        if fid is None or fid not in lo_map or fid not in hi_map:
            continue
        fmin = _decode_bound(lo_map[fid], typ)
        fmax = _decode_bound(hi_map[fid], typ)
        if fmin is None or fmax is None:
            continue
        try:
            elo, ehi = _ice_bound_encoded(lo, typ), _ice_bound_encoded(hi, typ)
            if (elo is not None and fmax < elo) or \
                    (ehi is not None and fmin > ehi):
                return False
        except (TypeError, ValueError):  # uncomparable → keep the file
            continue
    return True


def _read_one(path: str, dv_spec, columns, ranges=None) -> pa.Table:
    import pyarrow.parquet as pq

    from moonray.util import cap_kernel_threads

    cap_kernel_threads()
    present = set(pq.read_schema(path).names)
    cols = ([c for c in columns if c in present]
            if columns is not None else None)
    if cols is not None and ranges:
        # ranged columns are read for the in-task filter and dropped
        # before the block is emitted when outside the projection
        cols = list(dict.fromkeys(
            cols + [c for c in ranges if c in present]))
    t = pq.read_table(path, columns=cols, memory_map=True,
                      pre_buffer=False)
    if dv_spec is not None:
        from moonray.sinks.puffin import apply_puffin_dv

        t = apply_puffin_dv(t, *dv_spec)
    if ranges:
        from moonray.table import _range_mask

        m = _range_mask(t, ranges)
        if m is not None:
            t = t.filter(m)
        if columns is not None:
            t = t.select([c for c in columns if c in t.column_names])
    return t.replace_schema_metadata(None)


class IcebergDatasource(Datasource):
    """One ReadTask per live data file of the current snapshot; DV
    decode + positional filter run inside the task (see module doc)."""

    def __init__(self, dest: str, columns=None, snapshot_id=None,
                 ranges=None, metadata_location=None, ref=None):
        if metadata_location is not None:
            # catalog-resolved read: honor the LoadTableResult's pinned
            # metadata file (immutable) instead of the version hint —
            # a concurrent re-export must not move this reader's feet
            import json as _json

            with open(metadata_location) as f:
                meta = _json.load(f)
        else:
            meta = load_table_metadata(dest)
        if meta is None:
            raise FileNotFoundError(f"no Iceberg table at {dest}")
        if ref is not None:
            if snapshot_id is not None:
                raise ValueError("pass snapshot_id or ref, not both")
            refs = meta.get("refs", {})
            if ref not in refs:
                raise KeyError(f"no ref {ref!r} in table metadata "
                               f"(have: {sorted(refs)})")
            snapshot_id = refs[ref]["snapshot-id"]
        data, deletes = _replay_entries(meta, snapshot_id)
        # file-index puffins live in the data manifest (content 0,
        # format PUFFIN) — they are lookup accelerators, not row
        # sources (sinks.iceberg.iceberg_index_lookup reads them)
        data = [e for e in data
                if e["data_file"]["file_format"] == "PARQUET"]
        self._dest = dest
        self._columns = list(columns) if columns is not None else None
        self._dvs = _dv_specs(deletes)
        self._ranges = ranges
        if ranges:
            # resolve bounds field-ids under the CHOSEN snapshot's
            # schema — after a column drop the current schema
            # re-allocates ids, and decoding an old snapshot's bounds
            # with the new mapping would prune the wrong files
            sid = meta["current-schema-id"]
            if snapshot_id is not None:
                snap = next(s for s in meta["snapshots"]
                            if s["snapshot-id"] == snapshot_id)
                sid = snap.get("schema-id", sid)
            schema = next(s for s in meta["schemas"]
                          if s["schema-id"] == sid)
            fid_of = {f["name"]: f["id"] for f in schema["fields"]}
            type_of = {f["name"]: f["type"] for f in schema["fields"]}
            data = [e for e in data
                    if _bounds_overlap(e["data_file"], ranges, fid_of,
                                       type_of)]
        # deterministic task order → stable block order for tests
        self._files = sorted(data, key=lambda e: e["data_file"]["file_path"])

    def get_name(self) -> str:
        return "IcebergScan"

    def estimate_inmemory_data_size(self):
        return sum(e["data_file"]["file_size_in_bytes"]
                   for e in self._files)

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        out = []
        for e in self._files:
            df = e["data_file"]
            path = df["file_path"]
            dv_spec = self._dvs.get(path)
            # num_rows must be None when a DV exists: Ray answers
            # Dataset.count() from read-task metadata WITHOUT executing,
            # and the deleted-row subtraction happens only in-task
            meta = BlockMetadata(
                num_rows=(None if (dv_spec is not None or self._ranges)
                          else int(df["record_count"])),
                size_bytes=int(df["file_size_in_bytes"]),
                exec_stats=None, input_files=[path])
            cols, rngs = self._columns, self._ranges

            def fn(path=path, dv_spec=dv_spec, cols=cols, rngs=rngs):
                return [_read_one(path, dv_spec, cols, ranges=rngs)]

            out.append(ReadTask(fn, meta))
        return out


def read_iceberg_dataset(dest: str, *, columns=None, snapshot_id=None,
                         ranges=None, metadata_location=None, ref=None):
    """Exported Iceberg table → lazy Dataset.

    ``columns`` prunes at the parquet read — DV subtraction is
    positional and needs no extra columns, so a 2-column projection
    over an image table never moves the ``bytes`` payload.
    ``snapshot_id`` reads a pinned snapshot instead of the current one
    (Iceberg time travel over the export history).
    ``ranges`` {col: (lo, hi)} prunes whole files via the manifests'
    lower/upper bounds (no file opened at all when bounds prove
    non-overlap) and applies the exact inclusive filter in-task.
    ``metadata_location`` pins an exact metadata file instead of the
    version hint — the catalog-resolved read path
    (iceberg_catalog.IcebergRestCatalog.read_dataset).
    ``ref`` resolves a named ref from the metadata (moonray tags export
    as Iceberg tag refs) to its snapshot — time travel by name.
    """
    import ray.data

    return ray.data.read_datasource(
        IcebergDatasource(dest, columns=columns, snapshot_id=snapshot_id,
                          ranges=ranges, metadata_location=metadata_location,
                          ref=ref))

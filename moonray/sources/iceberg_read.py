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


def _read_one(path: str, dv_spec, columns) -> pa.Table:
    import pyarrow.parquet as pq

    from moonray.util import cap_kernel_threads

    cap_kernel_threads()
    present = set(pq.read_schema(path).names)
    cols = ([c for c in columns if c in present]
            if columns is not None else None)
    t = pq.read_table(path, columns=cols, memory_map=True,
                      pre_buffer=False)
    if dv_spec is not None:
        from moonray.sinks.puffin import apply_puffin_dv

        t = apply_puffin_dv(t, *dv_spec)
    return t.replace_schema_metadata(None)


class IcebergDatasource(Datasource):
    """One ReadTask per live data file of the current snapshot; DV
    decode + positional filter run inside the task (see module doc)."""

    def __init__(self, dest: str, columns=None, snapshot_id=None):
        meta = load_table_metadata(dest)
        if meta is None:
            raise FileNotFoundError(f"no Iceberg table at {dest}")
        data, deletes = _replay_entries(meta, snapshot_id)
        self._dest = dest
        self._columns = list(columns) if columns is not None else None
        self._dvs = _dv_specs(deletes)
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
                num_rows=(None if dv_spec is not None
                          else int(df["record_count"])),
                size_bytes=int(df["file_size_in_bytes"]),
                exec_stats=None, input_files=[path])
            cols = self._columns

            def fn(path=path, dv_spec=dv_spec, cols=cols):
                return [_read_one(path, dv_spec, cols)]

            out.append(ReadTask(fn, meta))
        return out


def read_iceberg_dataset(dest: str, *, columns=None, snapshot_id=None):
    """Exported Iceberg table → lazy Dataset.

    ``columns`` prunes at the parquet read — DV subtraction is
    positional and needs no extra columns, so a 2-column projection
    over an image table never moves the ``bytes`` payload.
    ``snapshot_id`` reads a pinned snapshot instead of the current one
    (Iceberg time travel over the export history).
    """
    import ray.data

    return ray.data.read_datasource(
        IcebergDatasource(dest, columns=columns, snapshot_id=snapshot_id))

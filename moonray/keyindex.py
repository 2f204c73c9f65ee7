"""Hash-partitioned persistent key index.

The analogue of the reference's ``GlobalIndex`` — a persisted hash map of
``key → (file, row)`` built at flush and merged in the background
(reference: src/moonlink/src/storage/index/persisted_bucket_hash_map.rs,
build_from_flush :1375, build_from_merge :1458; batch lookup
hash_index.rs:392). Here each index *partition* ``p = hash(key) % P``
owns a list of parquet files of ``(key, _frag, _off)`` rows sorted by
key; lookups hash-partition the probe keys the same way and merge-join
per partition — so a MERGE round touches O(changes) index rows, never
the table.

Entries are append-only and may go stale (point at fragments no longer
live or at DV'd rows). Staleness is harmless: probes filter candidate
fragments against the pinned manifest's live set, and re-deleting an
already-deleted row offset is an idempotent DV union. ``merge_partitions``
(optimize("index")) rewrites each partition to a single sorted file and
drops dead entries — the index-merge maintenance op (reference trigger:
src/moonlink/src/storage/mooncake_table/snapshot_maintenance.rs:227-309).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from moonray.storage import publish_file, publish_tmp, stage_path
from moonray.util import as_fn, hash_key_array

PART_COL = "_part"


def add_partition_column(batch: pa.Table, key_col: str, num_partitions: int) -> pa.Table:
    h = hash_key_array(batch[key_col])
    part = (h % np.uint64(num_partitions)).astype(np.int32)
    return batch.append_column(PART_COL, pa.array(part))


class WriteIndexDelta:
    """map_groups stage over ``_part``: write one sorted index-delta
    parquet per partition for this job; return (part, path, rows)."""

    def __init__(self, root: str, job_id: str, key_col: str):
        self.root = root
        self.job_id = job_id
        self.key_col = key_col

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"part": pa.array([], pa.int32()),
                             "path": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        part = int(group[PART_COL][0].as_py())
        tbl = group.drop_columns([PART_COL]).sort_by(self.key_col)
        rel = os.path.join("index", f"p{part:04d}",
                           f"idx-{self.job_id}-{part:04d}.parquet")
        tmp = publish_tmp(self.root, rel)
        pq.write_table(tbl, tmp, compression="snappy")
        publish_file(self.root, rel, tmp)
        return pa.table({"part": [part], "path": [rel], "rows": [len(tbl)]})


def write_index_deltas(entries_ds, root: str, job_id: str, key_col: str,
                       num_partitions: int) -> dict[str, list[str]]:
    """Shuffle index entries to their partitions and write delta files.
    Returns {part: [rel_path]} for the manifest. The shuffle moves only
    (key, frag, off) triples — never payload bytes."""
    with_part = entries_ds.map_batches(
        lambda b: add_partition_column(b, key_col, num_partitions),
        batch_format="pyarrow",
    )
    summary = with_part.groupby(PART_COL).map_groups(
        as_fn(WriteIndexDelta(root, job_id, key_col)), batch_format="pyarrow"
    )
    out: dict[str, list[str]] = {}
    for row in summary.take_all():
        out.setdefault(str(row["part"]), []).append(row["path"])
    return out


def _idxruns_dir(root: str, job_id: str) -> str:
    return stage_path(root, "staging", job_id, "idxruns")


def stage_entry_runs(root: str, job_id: str, entries: pa.Table, key_col: str,
                     num_partitions: int) -> None:
    """Called INSIDE a write/reduce task: split this task's fresh index
    entries ``(key, _frag, _off)`` by hash partition and append one
    content-named run parquet per partition present under
    ``staging/{job}/idxruns/p{part}/``. Together with
    ``build_index_from_runs`` this replaces the Ray Data
    ``groupby(part).map_groups`` entry shuffle with a storage-backed
    hash exchange: entries land pre-partitioned as a side effect of the
    task that created them, and the only remaining work is one tiny
    concat+sort task per partition — no extra all-to-all stage in the
    pipeline. Content-derived run names keep retries idempotent
    (a rerun rewrites the same paths; see shuffle.py)."""
    if len(entries) == 0:
        return
    from moonray.util import content_id

    part = (hash_key_array(entries[key_col])
            % np.uint64(num_partitions)).astype(np.int32)
    order = np.argsort(part, kind="stable")
    se = entries.take(pa.array(order))
    sp = part[order]
    edges = np.flatnonzero(np.diff(sp)) + 1
    starts = np.concatenate([[0], edges])
    ends = np.concatenate([edges, [len(sp)]])
    base = _idxruns_dir(root, job_id)
    for s, e in zip(starts, ends):
        p = int(sp[s])
        chunk = se.slice(s, e - s)
        d = os.path.join(base, f"p{p:04d}")
        os.makedirs(d, exist_ok=True)
        rid = content_id(chunk, key_col, "_frag", "_off")
        path = os.path.join(d, f"run-{rid}.parquet")
        tmp = path + f".tmp.{uuid.uuid4().hex[:6]}"
        pq.write_table(chunk, tmp, compression="snappy")
        os.rename(tmp, path)


def build_index_from_runs(root: str, job_id: str,
                          key_col: str) -> dict[str, list[str]]:
    """Fold the staged per-partition entry runs into one sorted index
    delta file per partition — raw Ray tasks (a Dataset pipeline costs
    ~0.5 s of fixed launch overhead; the per-partition work is a tiny
    thin-column concat+sort). Idempotent: the final file name is
    (job, part)-deterministic and published via temp+fsync+rename."""
    import glob as _glob

    import ray

    from moonray.util import cap_kernel_threads

    base = _idxruns_dir(root, job_id)
    parts = sorted(int(os.path.basename(d)[1:])
                   for d in _glob.glob(os.path.join(base, "p[0-9]*")))
    if not parts:
        return {}

    @ray.remote
    def build(part: int) -> tuple[int, str, int]:
        cap_kernel_threads()
        paths = sorted(_glob.glob(os.path.join(base, f"p{part:04d}", "run-*.parquet")))
        tbl = pa.concat_tables([pq.read_table(p) for p in paths]).sort_by(key_col)
        if len(tbl) == 0:
            return part, "", 0
        rel = os.path.join("index", f"p{part:04d}",
                           f"idx-{job_id}-{part:04d}.parquet")
        tmp = publish_tmp(root, rel)
        pq.write_table(tbl, tmp, compression="snappy")
        publish_file(root, rel, tmp)
        return part, rel, len(tbl)

    build = build.options(name="build_index_part")
    res = ray.get([build.remote(p) for p in parts])
    return {str(p): [rel] for p, rel, _n in res if rel}


class MergeIndexPartition:
    """One task per partition: fold all delta files into a single sorted
    file, dropping entries whose fragment is dead or whose row is DV'd."""

    def __init__(self, root: str, job_id: str, key_col: str,
                 partitions: dict[str, list[str]], live_frags: set[str],
                 dv_paths: dict[str, str]):
        self.root = root
        self.job_id = job_id
        self.key_col = key_col
        self.partitions = partitions
        self.live_frags = live_frags
        self.dv_paths = dv_paths

    def __call__(self, batch: pa.Table) -> pa.Table:
        from moonray.dv import load_dv_union

        out_parts, out_paths, out_rows = [], [], []
        from moonray.filecache import data_path

        for part in batch["part"].to_pylist():
            part = str(part)
            files = self.partitions.get(part, [])
            tables = [pq.read_table(data_path(self.root, rel)) for rel in files]
            if tables:
                merged = pa.concat_tables(tables)
                frags_np = np.asarray(merged["_frag"].combine_chunks())
                mask = np.isin(frags_np, list(self.live_frags))
                merged = merged.filter(pa.array(mask))
                if len(merged):
                    # vectorized dead-row drop — no pandas round-trip
                    frags_np = frags_np[mask]
                    offs_np = np.asarray(merged["_off"].combine_chunks())
                    keep = np.ones(len(merged), dtype=bool)
                    for frag, dvrels in self.dv_paths.items():
                        sel = frags_np == frag
                        if sel.any():
                            dv = load_dv_union(self.root, dvrels)
                            keep[sel] &= ~np.isin(offs_np[sel], dv)
                    if not keep.all():
                        merged = merged.filter(pa.array(keep))
            else:
                merged = None
            if merged is None or len(merged) == 0:
                out_parts.append(int(part)); out_paths.append(""); out_rows.append(0)
                continue
            merged = merged.sort_by(self.key_col)
            rel = os.path.join("index", f"p{int(part):04d}",
                               f"idx-{self.job_id}-{int(part):04d}.parquet")
            tmp = publish_tmp(self.root, rel)
            pq.write_table(merged, tmp, compression="snappy")
            publish_file(self.root, rel, tmp)
            out_parts.append(int(part)); out_paths.append(rel); out_rows.append(len(merged))
        return pa.table({"part": pa.array(out_parts, pa.int32()),
                         "path": pa.array(out_paths, pa.string()),
                         "rows": pa.array(out_rows, pa.int64())})

"""Storage-backed hash/range shuffle.

Ray Data's built-in sort/groupby shuffle moves every block through the
object store with O(blocks × partitions) intermediate objects — measured
quadratic blow-up on wide-payload tables (48k images: maintenance 13 s →
80 s purely from shuffle metadata). For the payload paths (MERGE dedup,
Z-order cluster) we instead shuffle THROUGH STORAGE, the way external
shuffle services do:

  map   — one ``map_batches`` pass splits each Arrow batch by a bucket
          column and appends one parquet *run file* per (task, bucket)
          under ``staging/{job}/shuffle/{name}/b{bucket:05d}/``;
  reduce— one task per bucket globs its directory and processes all runs.

Payload bytes touch storage exactly once per pass and the object store
never holds the all-to-all. On a multi-node cluster the staging dir must
be on shared storage (S3 / NFS) — the same assumption the manifest
already makes. Reduce tasks are embarrassingly parallel and resumable
per bucket (the reducer callables write done-markers).

Exactly-once under Ray task retries: run files (like fragments) get
CONTENT-DERIVED names — a retried map task rewrites the same path
instead of duplicating rows (see ``content_id``).
"""

from __future__ import annotations

import glob
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from moonray.util import cap_kernel_threads, content_id

BUCKET_COL = "_bucket"


def shuffle_dir(root: str, job_id: str, name: str) -> str:
    # scratch plane: run files are one-hop coordination state, written
    # and globbed POSIX-style — a remote table root keeps them on the
    # shared scratch mount (storage.scratch_for), not the object store
    from moonray.storage import stage_path

    return stage_path(root, "staging", job_id, "shuffle", name)


class RunWriter:
    """map stage: split the batch by ``BUCKET_COL`` and write one run
    file per bucket present. Returns (bucket, rows, bytes) summary rows.

    Run files are Arrow IPC, not parquet: they live exactly one
    map→reduce hop on tmpfs/local scratch, so durability encoding buys
    nothing — IPC write is a straight buffer copy and the reduce side
    memory-maps it zero-copy, where parquet paid a full encode on write
    plus a full decode on read. On this VM's shared memory bus (the
    binding resource for payload shuffles — BASELINE.md) those two
    avoided passes are the difference between a reduce that scales and
    one that saturates."""

    def __init__(self, root: str, job_id: str, name: str, id_cols: tuple[str, ...]):
        self.base = shuffle_dir(root, job_id, name)
        self.id_cols = id_cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        cap_kernel_threads()
        if len(batch) == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "rows": pa.array([], pa.int64()),
                             "bytes": pa.array([], pa.int64())})
        buckets = batch[BUCKET_COL].to_numpy(zero_copy_only=False)
        order = np.argsort(buckets, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        sb = buckets[order]
        edges = np.flatnonzero(np.diff(sb)) + 1
        starts = np.concatenate([[0], edges])
        ends = np.concatenate([edges, [len(sb)]])
        out_b, out_r, out_n = [], [], []
        for s, e in zip(starts, ends):
            part = sorted_batch.slice(s, e - s).drop_columns([BUCKET_COL])
            b = int(sb[s])
            d = os.path.join(self.base, f"b{b:05d}")
            os.makedirs(d, exist_ok=True)
            rid = content_id(part, *self.id_cols)
            path = os.path.join(d, f"run-{rid}.arrow")
            tmp = path + f".tmp.{uuid.uuid4().hex[:6]}"
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, part.schema) as w:
                    w.write_table(part)
            os.rename(tmp, path)
            out_b.append(b)
            out_r.append(e - s)
            out_n.append(os.path.getsize(path))
        return pa.table({"bucket": pa.array(out_b, pa.int32()),
                         "rows": pa.array(out_r, pa.int64()),
                         "bytes": pa.array(out_n, pa.int64())})


def write_runs(ds, root: str, job_id: str, name: str, num_buckets: int,
               bucket_fn, id_cols: tuple[str, ...],
               batch_rows: int = 1024) -> list[int]:
    """Execute the map half: ``bucket_fn(batch) -> int32 np.ndarray`` adds
    the bucket assignment. ``batch_rows`` coalesces input blocks before
    splitting so each task emits few, large runs instead of one sliver
    per (tiny block × bucket). Returns the sorted non-empty buckets."""
    def add_bucket(b: pa.Table) -> pa.Table:
        return b.append_column(BUCKET_COL, pa.array(bucket_fn(b).astype(np.int32)))

    summary = ds.map_batches(add_bucket, batch_format="pyarrow").map_batches(
        RunWriter(root, job_id, name, id_cols), batch_format="pyarrow",
        batch_size=batch_rows)
    sizes: dict[int, int] = {}
    for row in summary.take_all():
        sizes[int(row["bucket"])] = (sizes.get(int(row["bucket"]), 0)
                                     + int(row.get("bytes", 0) or 0))
    # biggest buckets first: the caller submits reduce tasks in this
    # order, so stragglers (payload-byte skew across equal-ROW buckets —
    # image size correlates with the Z-key columns) start in the first
    # wave instead of serializing the last one (LPT packing)
    return sorted(sizes, key=lambda b: -sizes[b])


def read_bucket(root: str, job_id: str, name: str, bucket: int) -> pa.Table | None:
    """reduce-side helper: concat every run of one bucket (sorted paths
    for determinism). IPC runs memory-map ZERO-copy — the payload only
    crosses the bus when downstream kernels touch it; parquet runs (if
    any linger from an older job) still read via memory_map."""
    d = os.path.join(shuffle_dir(root, job_id, name), f"b{bucket:05d}")
    parts = []
    for p in sorted(glob.glob(os.path.join(d, "run-*.arrow"))):
        with pa.memory_map(p, "r") as src:
            parts.append(pa.ipc.open_file(src).read_all())
    for p in sorted(glob.glob(os.path.join(d, "run-*.parquet"))):
        parts.append(pq.read_table(p, memory_map=True, pre_buffer=False))
    if not parts:
        return None
    return pa.concat_tables(parts)


def reduce_buckets(buckets: list[int], reducer, *, concurrency=None):
    """Run ``reducer`` (an as_fn-wrapped callable taking a one-row batch
    {"bucket": i}) over every bucket as parallel Ray tasks; returns the
    concatenated result Dataset. Use when the results feed a further
    Dataset stage (e.g. the index-delta groupby after cluster)."""
    import ray.data as rd

    from moonray.util import as_fn

    items = [{"bucket": int(b)} for b in buckets]
    # one block per bucket, or Ray Data bundles the tiny item blocks
    # into FEWER map tasks and serializes the reduce (measured: the
    # cluster reduce ran at the same wall time on 2 and 8 cpus)
    return rd.from_items(items, override_num_blocks=len(items)).map_batches(
        as_fn(reducer), batch_format="pyarrow", batch_size=1,
        concurrency=concurrency)


def reduce_buckets_tasks(buckets: list[int], reducer) -> list[pa.Table]:
    """Run the reducer over buckets as RAW Ray tasks and return the
    result tables. A ``from_items`` Dataset pipeline costs a fixed
    ~0.5 s of driver planning/launch per call — pure overhead when the
    reduce results are consumed on the driver anyway (MERGE apply
    summaries), and a measurable drag on job-level scaling efficiency.
    Per-bucket idempotency (done-markers inside the reducer) and Ray's
    task retries behave exactly as under map_batches."""
    import ray

    @ray.remote
    def run_bucket(b: int) -> pa.Table:
        cap_kernel_threads()
        return reducer(pa.table({"bucket": pa.array([b], pa.int32())}))

    run_bucket = run_bucket.options(name=f"reduce:{type(reducer).__name__}")
    return ray.get([run_bucket.remote(int(b)) for b in buckets])


def run_items_tasks(items: list[dict], reducer) -> list[pa.Table]:
    """``reduce_buckets_tasks`` generalized to arbitrary one-row item
    dicts (e.g. compaction's {"gid", "spec"}) — same raw-task shape,
    same idempotency contract (the reducer owns per-item done-markers)."""
    import ray

    @ray.remote
    def run_item(item: dict) -> pa.Table:
        cap_kernel_threads()
        return reducer(pa.table({k: [v] for k, v in item.items()}))

    run_item = run_item.options(name=f"reduce:{type(reducer).__name__}")
    return ray.get([run_item.remote(i) for i in items])

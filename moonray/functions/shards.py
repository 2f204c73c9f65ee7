"""Resumable training-shard export: deterministic partitioned parquet.

The task brief's output doctrine as a first-class operator: "write
partitioned Parquet (one directory per input shard / key range) so a
failed run can skip finished partitions; never one giant file". The
engine's own fragments already work this way (per-bucket done markers,
merge.py); this exposes the same contract for training-data exports
consumed OUTSIDE the engine (a dataloader reading shard directories).

Determinism: shard = key % n (``mode="modulo"``, SQL-reproducible) or
splitmix64(key) % n (``mode="hash"``, balanced under skewed key spaces);
rows inside a shard sort by key, so a re-export is byte-stable and a
dataloader's epoch order is a pure function of (corpus, n_shards, mode).

Resume: each shard directory gets a ``_DONE`` marker only after its
parquet file is fully written and fsynced. A re-run lists markers FIRST
and filters finished shards out of the shuffle — a killed export redoes
only incomplete shards (their partial files are overwritten in place,
never appended)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from moonray.util import splitmix64

_DONE = "_DONE"


def _shard_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, f"shard={shard:05d}")


def finished_shards(out_dir: str) -> set[int]:
    out = set()
    if not os.path.isdir(out_dir):
        return out
    for d in os.listdir(out_dir):
        if d.startswith("shard=") and os.path.exists(
                os.path.join(out_dir, d, _DONE)):
            out.add(int(d.split("=")[1]))
    return out


def export_training_shards(ds, out_dir: str, n_shards: int, key_col: str,
                           mode: str = "hash") -> "object":
    """Export ``ds`` to ``out_dir/shard=K/part.parquet`` (+ _DONE
    markers), skipping shards already complete from a previous run.
    Returns a Dataset of per-shard summaries (shard, n_rows) — read from
    the FILES on disk, so the summary also verifies completed shards a
    resumed run never touched."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if mode not in ("hash", "modulo"):
        raise ValueError("mode must be 'hash' or 'modulo'")
    os.makedirs(out_dir, exist_ok=True)
    done = finished_shards(out_dir)

    def assign(b: pa.Table) -> pa.Table:
        k = b[key_col].to_numpy(zero_copy_only=False)
        if mode == "hash":
            shard = (splitmix64(k.astype(np.uint64))
                     % np.uint64(n_shards)).astype(np.int64)
        else:
            shard = (k % n_shards).astype(np.int64)
        t = b.append_column("_shard", pa.array(shard))
        if done:
            t = t.filter(pa.array(~np.isin(shard, list(done))))
        return t

    assign.__name__ = "assign_shard"

    def write_shard(grp: pa.Table) -> pa.Table:
        if len(grp) == 0:
            return pa.table({"shard": pa.array([], pa.int64())})
        shard = int(grp["_shard"][0].as_py())
        t = grp.drop_columns(["_shard"]).sort_by(key_col)
        d = _shard_dir(out_dir, shard)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, "part.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, path)
        # marker only after the data file is durably in place
        with open(os.path.join(d, _DONE), "w") as f:
            f.write(str(len(t)))
            f.flush()
            os.fsync(f.fileno())
        return pa.table({"shard": pa.array([shard], pa.int64())})

    write_shard.__name__ = "write_shard"
    # drive the export; the returned shard ids are discarded — the
    # summary below re-reads the directory so finished-earlier shards
    # are included too
    (ds.map_batches(assign, batch_format="pyarrow")
       .groupby("_shard").map_groups(write_shard, batch_format="pyarrow")
       .materialize())

    items = sorted(finished_shards(out_dir))
    summaries = []
    for s in items:
        md = pq.read_metadata(os.path.join(_shard_dir(out_dir, s),
                                           "part.parquet"))
        summaries.append({"shard": s, "n_rows": md.num_rows})
    return rd.from_items(summaries) if summaries else rd.from_arrow(
        pa.table({"shard": pa.array([], pa.int64()),
                  "n_rows": pa.array([], pa.int64())}))

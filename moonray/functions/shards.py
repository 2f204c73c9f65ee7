"""Resumable training-shard export: deterministic partitioned parquet.

The task brief's output doctrine as a first-class operator: "write
partitioned Parquet (one directory per input shard / key range) so a
failed run can skip finished partitions; never one giant file". The
engine's own fragments already work this way (per-bucket done markers,
merge.py); this exposes the same contract for training-data exports
consumed OUTSIDE the engine (a dataloader reading shard directories).

Determinism: shard = key % n (``mode="modulo"``, SQL-reproducible) or
hash_key_array(key) % n (``mode="hash"``, balanced under skewed key
spaces, works for string keys); rows inside a shard sort by ALL columns
(key first), so a re-export is byte-stable even with duplicate keys and
a dataloader's epoch order is a pure function of (corpus, n_shards,
mode). Null keys raise — a NaN-routed shard id would silently misfile
rows.

Resume: ``_export.json`` records (n_shards, mode, key_col) and is
validated on re-run (an export resumed with different parameters would
silently drop rows into already-"done" shards otherwise). Each shard
directory gets a ``_DONE`` marker only after its parquet file is fully
written, fsynced and renamed into place (power-loss safe, not just
kill-safe); empty shards still get a file + marker so "complete" is
distinguishable from "not started" and resume never re-shuffles a
finished export. A re-run lists markers FIRST and filters finished
shards out of the shuffle — a killed export redoes only incomplete
shards (partial files are overwritten in place, never appended)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from moonray.util import (atomic_write_json, fsync_dir, fsync_file,
                          hash_key_array, splitmix64)

_DONE = "_DONE"
_MANIFEST = "_export.json"


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


def _check_manifest(out_dir: str, params: dict) -> None:
    from moonray.util import read_json

    path = os.path.join(out_dir, _MANIFEST)
    if os.path.exists(path):
        prev = read_json(path)
        if prev != params:
            raise ValueError(
                f"out_dir was written with {prev}, resume requested "
                f"{params} — mixing shard layouts silently drops rows; "
                "use a fresh directory or matching parameters")
    else:
        atomic_write_json(path, params, durable=True)


def _write_one(out_dir: str, shard: int, t: pa.Table) -> None:
    import pyarrow.parquet as pq

    d = _shard_dir(out_dir, shard)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "part.parquet")
    tmp = path + ".tmp"
    pq.write_table(t, tmp, compression="zstd")
    fsync_file(tmp)               # data durable BEFORE it becomes visible
    os.replace(tmp, path)
    with open(os.path.join(d, _DONE), "w") as f:
        f.write(str(len(t)))
        f.flush()
        os.fsync(f.fileno())
    fsync_dir(d)


def export_training_shards(ds, out_dir: str, n_shards: int, key_col: str,
                           mode: str = "hash",
                           shuffle_seed: int | None = None) -> "object":
    """Export ``ds`` to ``out_dir/shard=K/part.parquet`` (+ _DONE
    markers), skipping shards already complete from a previous run.
    Returns a Dataset of per-shard summaries (shard, n_rows) — read from
    the FILES on disk, so the summary also verifies completed shards a
    resumed run never touched.

    ``shuffle_seed``: rows inside each shard order by
    splitmix64(hash(key) ^ seed) instead of key order — a randomized
    training order that is still a pure function of (corpus, n_shards,
    seed), so a re-export (and a resumed one) is byte-identical and a
    new epoch is just a new seed."""
    import pyarrow.parquet as pq
    import ray.data as rd

    if mode not in ("hash", "modulo"):
        raise ValueError("mode must be 'hash' or 'modulo'")
    os.makedirs(out_dir, exist_ok=True)
    _check_manifest(out_dir, {"n_shards": n_shards, "mode": mode,
                              "key_col": key_col,
                              "shuffle_seed": shuffle_seed})
    done = finished_shards(out_dir)
    if len(done) == n_shards:
        pass  # fully complete — skip the shuffle entirely
    else:
        schema = ds.schema().base_schema  # arrow schema for empty shards

        def assign(b: pa.Table) -> pa.Table:
            col = b[key_col]
            if col.null_count:
                raise ValueError(
                    f"null {key_col!r} values cannot be sharded "
                    "deterministically; filter or fill them first")
            if mode == "hash":
                shard = (hash_key_array(col)
                         % np.uint64(n_shards)).astype(np.int64)
            else:
                k = col.to_numpy(zero_copy_only=False)
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
            t = grp.drop_columns(["_shard"])
            if shuffle_seed is not None:
                rk = splitmix64(hash_key_array(t[key_col])
                                ^ np.uint64(shuffle_seed & ((1 << 64) - 1)))
                t = t.append_column("_rk", pa.array(rk.astype(np.int64)))
            # total order: (shuffle rank or key) first, then every other
            # column — byte-stable even when key_col has duplicates
            # (groupby arrival order is not deterministic)
            first = "_rk" if shuffle_seed is not None else key_col
            sort_keys = [(first, "ascending")] + [
                (c, "ascending") for c in t.column_names if c != first]
            t = t.sort_by(sort_keys)
            if shuffle_seed is not None:
                t = t.drop_columns(["_rk"])
            _write_one(out_dir, shard, t)
            return pa.table({"shard": pa.array([shard], pa.int64())})

        write_shard.__name__ = "write_shard"
        (ds.map_batches(assign, batch_format="pyarrow")
           .groupby("_shard").map_groups(write_shard, batch_format="pyarrow")
           .materialize())
        # assigned-but-empty shards: write an empty file + marker so the
        # export has exactly n_shards complete directories and resume
        # can tell "empty" from "not started"
        for s in sorted(set(range(n_shards)) - finished_shards(out_dir)):
            _write_one(out_dir, s, schema.empty_table())

    summaries = []
    for s in sorted(finished_shards(out_dir)):
        md = pq.read_metadata(os.path.join(_shard_dir(out_dir, s),
                                           "part.parquet"))
        summaries.append({"shard": s, "n_rows": md.num_rows})
    return rd.from_items(summaries) if summaries else rd.from_arrow(
        pa.table({"shard": pa.array([], pa.int64()),
                  "n_rows": pa.array([], pa.int64())}))

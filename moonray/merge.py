"""MERGE INTO — CDC apply (insert/update/delete, last-writer-wins by LSN).

Semantics replayed from the reference's ingest path: Update ≡
Delete(old)+Append(new) (src/moonlink_connectors/src/pg_replicate/
moonlink_sink.rs:277-345), Upsert ≡ delete_if_exists+Append
(src/moonlink_connectors/src/rest_ingest/moonlink_rest_sink.rs:211-246),
deletions batch-probed against the key index sorted by (key, lsn)
(src/moonlink/src/storage/mooncake_table/snapshot.rs:1037-1106), commit
advances the table's LSN baseline (mooncake_table.rs:1290-1312) with
batch-atomic visibility: the whole change Dataset becomes visible at one
manifest version (read-at-LSN rule, mooncake_table.rs:438-443).

Ray-Data-first plan (one pass over changes, zero passes over the table):

1. DEDUP   changes → hash-bucket groupby → keep max-LSN row per key
           (the shuffle moves only the change batch, never the table).
2. PROBE   winner keys (key,lsn,op only — no payload bytes) hash-
           partitioned to the key-index partitions → per-partition
           merge-join → hit list (key, frag, off)  [semi join].
3. DV      hits grouped by fragment bucket → union into per-fragment
           deletion vectors (new immutable DV files).
4. WRITE   non-delete winners → new fragments + index-entry triples →
           per-partition index delta files  [the anti-join half: keys
           absent from the index simply produce no hits].
5. COMMIT  driver folds sidecars + DV summaries + index deltas into one
           atomically-published manifest version.

Cost: O(|changes|) shuffle + O(touched index partitions) reads.
Image payload bytes move exactly twice (dedup shuffle, fragment write) —
never through the probe/DV path.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from moonray import manifest as mf
from moonray.checkpoint import LineageLog
from moonray.dv import load_dv, merge_dv, save_dv
from moonray.fragments import FragmentWriter, collect_staged_fragment_meta
from moonray.keyindex import add_partition_column, probe_keys, write_index_deltas
from moonray.util import as_fn, hash_key_array, new_job_id

OP_COL, LSN_COL = "op", "lsn"
_BKT = "_bkt"


class DedupLastWriter:
    """map_groups over a key-hash bucket: keep the max-LSN row per key
    (strictly increasing LSNs guarantee a unique winner). Pure Arrow —
    pandas would coerce nullable int64 payload columns (D rows carry
    nulls) to float64 and corrupt 64-bit phash values."""

    def __init__(self, key_col: str):
        self.key_col = key_col

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns([_BKT])
        t = group.sort_by([(LSN_COL, "ascending")])
        keys = np.asarray(t[self.key_col].to_pandas(), dtype=object)
        _, first_rev = np.unique(keys[::-1], return_index=True)
        keep = np.sort(len(keys) - 1 - first_rev)
        return t.take(pa.array(keep)).drop_columns([_BKT])


class WriteDVUpdates:
    """map_groups over a fragment bucket: union this round's hits into
    each fragment's deletion vector → new job-scoped immutable DV file.
    Existing DV paths come from the pinned parent manifest."""

    def __init__(self, root: str, job_id: str, old_dv: dict[str, str | None]):
        self.root = root
        self.job_id = job_id
        self.old_dv = old_dv

    def __call__(self, group: pa.Table) -> pa.Table:
        frags = group["_frag"].to_numpy(zero_copy_only=False)
        offs = group["_off"].to_numpy(zero_copy_only=False).astype(np.uint32)
        out = {"frag": [], "dv": [], "dv_count": []}
        for frag in np.unique(frags):
            new_offs = offs[frags == frag]
            old_rel = self.old_dv.get(frag)
            old = load_dv(os.path.join(self.root, old_rel)) if old_rel else np.empty(0, np.uint32)
            dv = merge_dv(old, new_offs)
            rel = os.path.join("dv", f"{frag}.{self.job_id}.npy")
            save_dv(os.path.join(self.root, rel), dv)
            out["frag"].append(str(frag))
            out["dv"].append(rel)
            out["dv_count"].append(len(dv))
        return pa.table({"frag": pa.array(out["frag"], pa.string()),
                         "dv": pa.array(out["dv"], pa.string()),
                         "dv_count": pa.array(out["dv_count"], pa.int64())})


def _add_bucket(batch: pa.Table, key_col: str, n_buckets: int) -> pa.Table:
    b = (hash_key_array(batch[key_col]) % np.uint64(n_buckets)).astype(np.int32)
    return batch.append_column(_BKT, pa.array(b))


def merge_into(table, changes, *, job_id: str | None = None,
               dedup_buckets: int = 32, dv_buckets: int = 32) -> int:
    """Apply one CDC change Dataset (op ∈ {I,U,D}, strictly increasing
    lsn, full-row payload for I/U) to the table; returns the committed
    version. Idempotent per job_id (resume-safe)."""
    job_id = job_id or new_job_id()
    prev = mf.find_version_by_job(table.root, job_id)
    if prev is not None:
        return prev

    m = table.manifest()
    key_col = m["key_col"]
    num_parts = m["index"]["num_partitions"]
    live = {f["id"] for f in m["fragments"]}
    old_dv = {f["id"]: f.get("dv") for f in m["fragments"]}
    log = LineageLog(table.root, job_id)

    dv_out = log.stage_outputs("dv")
    write_out = log.stage_outputs("write")

    winners = None
    if dv_out is None or write_out is None:
        log.stage_start("dedup")
        deduped = (
            changes.map_batches(lambda b: _add_bucket(b, key_col, dedup_buckets),
                                batch_format="pyarrow")
            .groupby(_BKT)
            .map_groups(as_fn(DedupLastWriter(key_col)), batch_format="pyarrow")
        )
        winners = deduped.materialize()
        log.stage_done("dedup", {"counters": {"winners": winners.count()}})

    # ---- stage: probe + DV update (semi join) ----
    if dv_out is None:
        log.stage_start("dv")
        keys_ds = winners.select_columns([key_col, LSN_COL, OP_COL])
        hits = probe_keys(keys_ds, table.root, key_col, num_parts,
                          m["index"]["partitions"], live)
        hits_b = hits.map_batches(
            lambda b: b.append_column(
                "_dvb", pa.array((hash_key_array(b["_frag"]) % np.uint64(dv_buckets)).astype(np.int32))),
            batch_format="pyarrow")
        dv_summary = hits_b.groupby("_dvb").map_groups(
            as_fn(WriteDVUpdates(table.root, job_id, old_dv)), batch_format="pyarrow")
        dv_rows = [r for r in dv_summary.take_all()]
        max_lsn = int(winners.max(LSN_COL) or 0)
        dv_out = {"dv_rows": dv_rows, "max_lsn": max_lsn,
                  "counters": {"fragments_touched": len(dv_rows),
                               "rows_deleted": sum(r["dv_count"] for r in dv_rows)}}
        log.stage_done("dv", dv_out)

    # ---- stage: write insert fragments + index deltas (anti join) ----
    if write_out is None:
        log.stage_start("write")
        user_cols = [f for f in table.schema().names]
        inserts = winners.map_batches(
            lambda b: b.filter(pa.compute.not_equal(b[OP_COL], pa.scalar("D"))).select(user_cols),
            batch_format="pyarrow",
        )
        writer = FragmentWriter(table.root, job_id, key_col, m["zone_cols"])
        entries = inserts.map_batches(as_fn(writer), batch_format="pyarrow",
                                      batch_size=m["rows_per_fragment"])
        deltas = write_index_deltas(entries, table.root, job_id, key_col, num_parts)
        new_frags = collect_staged_fragment_meta(table.root, job_id)
        write_out = {"index_deltas": deltas, "new_frags": new_frags,
                     "counters": {"fragments_written": len(new_frags),
                                  "rows_inserted": sum(f["rows"] for f in new_frags)}}
        log.stage_done("write", write_out)

    # ---- stage: commit (single-writer, atomic) ----
    log.stage_start("commit")
    dv_updates = {r["frag"]: {"dv": r["dv"], "dv_count": int(r["dv_count"])}
                  for r in dv_out["dv_rows"]}
    v = table._commit_append(
        m, write_out["new_frags"], write_out["index_deltas"],
        lsn=dv_out["max_lsn"], job_id=job_id, dv_updates=dv_updates,
    )
    log.stage_done("commit", {"counters": {"version": v}})
    return v

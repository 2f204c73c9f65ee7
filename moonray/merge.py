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

Ray-Data-first plan — ONE storage-backed shuffle, ONE reduce pass, zero
passes over the table (the moonlink single-writer event loop becomes P
independent single-writer partitions):

  map     changes → bucket = hash(image_id) % P (P = the key-index
          partition count, so every reducer owns exactly its index
          partition) → per-bucket run files (shuffle.py; payload bytes
          touch storage once, never the object-store all-to-all).
  reduce  per bucket: sort runs by (key, lsn) → last-writer-wins winner
          per key → probe THIS bucket's index files (semi join: existing
          rows → fresh DV-delta offsets, minus already-deleted) → write
          insert fragments from non-D winners (anti join: keys absent
          from the index simply produce no hits) + this bucket's index
          delta. Idempotent per bucket (done-marker w/ summary).
  commit  driver folds the per-bucket summaries into one atomically
          published manifest version.

Cost: O(|changes|) storage writes + O(touched index partitions) reads.
Image payload bytes move exactly twice (run file, fragment) — never
through the probe/DV path.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray

from moonray import manifest as mf
from moonray.checkpoint import LineageLog
from moonray.dv import dv_paths_of, load_dv_union, save_dv
from moonray.fragments import rg_rows_of
from moonray.storage import publish_file, publish_tmp, stage_path
from moonray.fragments import write_fragment
from moonray.shuffle import read_bucket, reduce_buckets_tasks, write_runs
from moonray.util import atomic_write_json, hash_key_array, read_json

OP_COL, LSN_COL = "op", "lsn"


def _require_cols(t: pa.Table, schema: pa.Schema, defaults: dict) -> None:
    """Schema-lag guard: a change set may omit only columns with a
    declared ALTER default; any other missing column is a producer bug
    and must fail, not silently null-fill."""
    missing = [f.name for f in schema
               if f.name not in t.column_names and f.name not in defaults]
    if missing:
        raise KeyError(
            f"change set is missing required columns {missing} "
            "(only ALTER-added columns with a declared default may be "
            "omitted)")


class MergeApply:
    """Reduce task for one key partition: dedup → probe → DV deltas →
    insert fragments → index delta. The per-partition analogue of the
    reference's single-writer apply loop (table_handler.rs:828-938),
    running in parallel across partitions because key spaces are
    disjoint. ``ctx_ref`` is a ray.put broadcast of the pinned manifest
    views (index partition files, per-fragment DV lists, live set)."""

    def __init__(self, root: str, job_id: str, key_col: str, zone_cols,
                 rows_per_fragment: int, schema: pa.Schema, ctx_ref,
                 seq_col: str | None = None, defaults: dict | None = None):
        self.root = root
        self.job_id = job_id
        self.key_col = key_col
        self.zone_cols = list(zone_cols)
        self.rpf = rows_per_fragment
        self.schema = schema
        self.user_cols = list(schema.names)
        self.defaults = defaults or {}
        self.ctx_ref = ctx_ref
        self.seq_col = seq_col
        self._ctx = None

    @property
    def ctx(self) -> dict:
        if self._ctx is None:
            self._ctx = ray.get(self.ctx_ref)
        return self._ctx

    def _winners(self, data: pa.Table) -> pa.Table:
        """Last-writer-wins per key (strictly increasing LSNs — or the
        ``seq_col`` tie-break within one streaming xact's constant LSN —
        guarantee a unique winner). Pure Arrow — pandas would coerce
        nullable int64 payload columns (D rows carry nulls) to float64
        and corrupt 64-bit phash values."""
        sort_keys = [(self.key_col, "ascending"), (LSN_COL, "ascending")]
        if self.seq_col and self.seq_col in data.column_names:
            sort_keys.append((self.seq_col, "ascending"))
        t = data.sort_by(sort_keys)
        n = len(t)
        if n == 0:
            return t
        k = t[self.key_col]
        neq = pa.compute.not_equal(k.slice(0, n - 1), k.slice(1))
        last = np.ones(n, dtype=bool)
        last[:-1] = np.asarray(neq)
        return t.filter(pa.array(last))

    def _probe(self, bucket: int, keys: pa.Array) -> dict[str, np.ndarray]:
        """Semi join of winner keys vs this bucket's index files →
        {fragment: fresh row offsets to delete} (already-deleted offsets
        subtracted so DV deltas stay disjoint and counts exact). Pure
        Arrow/numpy: pc.is_in against the probe-key set, then a per-frag
        np.unique (which also dedupes repeated (frag, off) entries)."""
        import pyarrow.compute as pc

        files = self.ctx["partitions"].get(str(bucket), [])
        live = self.ctx["live"]
        if not files or len(keys) == 0:
            return {}
        key_set = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
        live_set = pa.array(list(live), pa.string())
        from moonray.filecache import data_path

        frag_parts, off_parts = [], []
        for rel in files:
            idx = pq.read_table(data_path(self.root, rel))
            mask = pc.and_(pc.is_in(idx[self.key_col], value_set=key_set),
                           pc.is_in(idx["_frag"], value_set=live_set))
            hit = idx.filter(mask)
            if len(hit):
                frag_parts.append(np.asarray(hit["_frag"].combine_chunks()))
                off_parts.append(np.asarray(hit["_off"].combine_chunks()))
        if not frag_parts:
            return {}
        frags_np = np.concatenate(frag_parts)
        offs_np = np.concatenate(off_parts)
        out: dict[str, np.ndarray] = {}
        for frag in np.unique(frags_np):
            offs = np.unique(offs_np[frags_np == frag]).astype(np.uint32)
            old = load_dv_union(self.root, self.ctx["old_dv"].get(frag, []))
            fresh = np.setdiff1d(offs, old, assume_unique=True)
            if len(fresh):
                out[str(frag)] = fresh
        return out

    def _check_fault_injection(self) -> None:
        """Deterministic failure injection for kill-and-resume tests
        (the reference ships the same pattern in production code:
        src/moonlink/src/storage/filesystem/accessor/
        filesystem_accessor_chaos_wrapper.rs). If the job's staging dir
        contains FAIL_INJECT with an integer n, every apply task fails
        once ≥ n buckets have completed — including Ray's retries, so
        the whole job aborts mid-apply."""
        import glob as _glob

        flag = stage_path(self.root, "staging", self.job_id, "FAIL_INJECT")
        if os.path.exists(flag):
            n = int(open(flag).read().strip() or 0)
            done = len(_glob.glob(os.path.join(
                stage_path(self.root, "staging", self.job_id),
                "apply-b*.done.json")))
            if done >= n:
                raise RuntimeError(
                    f"injected failure: {done} buckets applied (limit {n})")

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_rows = []
        for bucket in batch["bucket"].to_pylist():
            bucket = int(bucket)
            self._check_fault_injection()
            marker = stage_path(self.root, "staging", self.job_id,
                                f"apply-b{bucket:05d}.done.json")
            if os.path.exists(marker):
                out_rows.append(json.dumps(read_json(marker)))
                continue
            data = read_bucket(self.root, self.job_id, "merge", bucket)
            summary = {"bucket": bucket, "max_lsn": 0, "dv": [],
                       "new_frags": [], "index": None, "rows_in": 0}
            if data is not None and len(data):
                summary["rows_in"] = len(data)
                summary["max_lsn"] = int(pa.compute.max(data[LSN_COL]).as_py())
                win = self._winners(data)
                # semi join → DV deltas
                for frag, offs in self._probe(bucket, win[self.key_col]).items():
                    rel = os.path.join(
                        "dv", f"{frag}.{self.job_id}.b{bucket:05d}.npy")
                    save_dv(self.root, rel, np.sort(offs))
                    summary["dv"].append(
                        {"frag": frag, "path": rel, "count": int(len(offs))})
                # anti-join half: write non-delete winners as fragments
                # (keep the key column — possibly the derived _ckey —
                # for index entries; data_cols limits the parquet to the
                # user schema)
                ins = win.filter(pa.compute.not_equal(win[OP_COL], pa.scalar("D")))
                # project onto the CURRENT table schema: change sets from
                # a source lagging an ALTER TABLE may omit newly-added
                # columns — fill their DECLARED default (reference fills
                # missing nullable fields the same way in the JSON
                # converter, rest_ingest/json_converter.rs). Columns
                # missing WITHOUT a declared default still fail loudly:
                # silently null-filling a typo'd core column would
                # corrupt data.
                from moonray.fragments import normalize_to_schema
                _require_cols(ins, self.schema, self.defaults)
                ins = normalize_to_schema(ins, self.schema, self.defaults,
                                          keep_extra=(self.key_col,))
                entries_parts = []
                for start in range(0, len(ins), self.rpf):
                    chunk = ins.slice(start, self.rpf)
                    meta, entries = write_fragment(
                        self.root, self.job_id, chunk,
                        key_col=self.key_col, zone_cols=self.zone_cols,
                        data_cols=self.user_cols, row_group_rows=rg_rows_of(self.rpf))
                    summary["new_frags"].append(meta)
                    entries_parts.append(entries)
                if entries_parts:
                    merged = pa.concat_tables(entries_parts).sort_by(self.key_col)
                    rel = os.path.join(
                        "index", f"p{bucket:04d}",
                        f"idx-{self.job_id}-{bucket:04d}.parquet")
                    tmp = publish_tmp(self.root, rel)
                    pq.write_table(merged, tmp, compression="snappy")
                    publish_file(self.root, rel, tmp)
                    summary["index"] = rel
            atomic_write_json(marker, summary)
            out_rows.append(json.dumps(summary))
        return pa.table({"payload": pa.array(out_rows, pa.string())})


def merge_into(table, changes, *, job_id: str | None = None,
               seq_col: str | None = None) -> int:
    """Apply one CDC change Dataset (op ∈ {I,U,D}, strictly increasing
    lsn, full-row payload for I/U) to the table; returns the committed
    version. Idempotent per job_id (resume-safe at bucket granularity).
    ``seq_col``: optional int column breaking LSN ties (streaming xacts
    commit many staged batches under ONE caller LSN); consumed by the
    winner sort, never reaches the committed manifest."""
    from moonray.util import new_job_id

    job_id = job_id or new_job_id()
    prev = mf.find_version_by_job(table.root, job_id)
    if prev is not None:
        return prev

    m = table.manifest()
    key_col = m["key_col"]
    if key_col is None:  # identity='none': append-only fast path
        return _append_only_merge(table, changes, m, job_id)
    from moonray.identity import with_identity_key

    changes = with_identity_key(changes, m)
    num_parts = m["index"]["num_partitions"]
    log = LineageLog(table.root, job_id)

    # ---- stage: shuffle (map half) ----
    shuffle_out = log.stage_outputs("shuffle")
    if shuffle_out is None:
        log.stage_start("shuffle")

        def bucket_fn(b: pa.Table) -> np.ndarray:
            return (hash_key_array(b[key_col]) % np.uint64(num_parts)).astype(np.int32)

        id_cols = (key_col, LSN_COL) + ((seq_col,) if seq_col else ())
        buckets = write_runs(changes, table.root, job_id, "merge", num_parts,
                             bucket_fn, id_cols=id_cols)
        shuffle_out = {"buckets": buckets, "counters": {"buckets": len(buckets)}}
        log.stage_done("shuffle", shuffle_out)

    # ---- stage: apply (reduce half; per-bucket idempotent) ----
    apply_out = log.stage_outputs("apply")
    if apply_out is None:
        log.stage_start("apply")
        ctx_ref = ray.put({
            "partitions": m["index"]["partitions"],
            "old_dv": {f["id"]: dv_paths_of(f) for f in m["fragments"]},
            "live": {f["id"] for f in m["fragments"]},
        })
        reducer = MergeApply(table.root, job_id, key_col, m["zone_cols"],
                             m["rows_per_fragment"], table.schema(), ctx_ref,
                             seq_col=seq_col,
                             defaults=m.get("column_defaults", {}))
        res = reduce_buckets_tasks(shuffle_out["buckets"], reducer)
        summaries = [json.loads(s) for t in res for s in t["payload"].to_pylist()]
        apply_out = {"summaries": summaries, "counters": {
            "rows_in": sum(s["rows_in"] for s in summaries),
            "rows_deleted": sum(d["count"] for s in summaries for d in s["dv"]),
            "fragments_written": sum(len(s["new_frags"]) for s in summaries),
        }}
        log.stage_done("apply", apply_out)

    # ---- stage: commit (single-writer, atomic) ----
    log.stage_start("commit")
    return _commit_merge(table, m, apply_out, job_id, log)


def _commit_merge(table, m, apply_out, job_id, log) -> int:
    summaries = apply_out["summaries"]
    dv_updates: dict[str, dict] = {}
    for s in summaries:
        for d in s["dv"]:
            u = dv_updates.setdefault(d["frag"], {"add": [], "add_count": 0})
            u["add"].append(d["path"])
            u["add_count"] += d["count"]
    new_frags = [f for s in summaries for f in s["new_frags"]]
    index_deltas = {str(s["bucket"]): [s["index"]] for s in summaries if s["index"]}
    max_lsn = max((s["max_lsn"] for s in summaries), default=0)
    v = table._commit_append(m, new_frags, index_deltas, lsn=max_lsn,
                             job_id=job_id, dv_updates=dv_updates, op="merge")
    log.stage_done("commit", {"counters": {"version": v}})
    return v


def _append_only_merge(table, changes, m: dict, job_id: str) -> int:
    """identity='none' tables are append-only (reference: delete
    validation at mooncake_table.rs:129-139): only op='I' rows are
    legal, no key index exists and no probe runs — the change set lands
    as fresh fragments in ONE batch-atomic commit. Idempotent per
    job_id via content-derived fragment names + the version job marker."""
    import pyarrow.compute as pc

    from moonray.fragments import FragmentWriter, collect_staged_fragment_meta
    from moonray.util import as_fn

    from moonray.fragments import normalize_to_schema

    log = LineageLog(table.root, job_id)
    log.stage_start("append")
    schema = table.schema()
    user_cols = list(schema.names)
    defaults = m.get("column_defaults", {})
    writer = FragmentWriter(table.root, job_id, None, m["zone_cols"],
                            data_cols=user_cols)

    def apply_append(b: pa.Table) -> pa.Table:
        bad = pc.sum(pc.cast(pc.not_equal(b[OP_COL], pa.scalar("I")),
                             pa.int64())).as_py() or 0
        if bad:
            raise ValueError(
                "identity='none' table is append-only: deletes/updates "
                f"are forbidden ({bad} non-insert rows in change set)")
        _require_cols(b, schema, defaults)
        writer(normalize_to_schema(b, schema, defaults,
                                   keep_extra=(OP_COL, LSN_COL)))
        mx = pa.compute.max(b[LSN_COL]).as_py() if len(b) else 0
        return pa.table({"rows": pa.array([len(b)], pa.int64()),
                         "max_lsn": pa.array([int(mx or 0)], pa.int64())})

    summary = changes.map_batches(as_fn(apply_append, "append_only"),
                                  batch_format="pyarrow",
                                  batch_size=m["rows_per_fragment"]).take_all()
    max_lsn = max((int(r["max_lsn"]) for r in summary), default=0)
    new_frags = collect_staged_fragment_meta(table.root, job_id)
    log.stage_done("append", {"counters": {
        "rows_in": sum(int(r["rows"]) for r in summary),
        "fragments_written": len(new_frags)}})
    return table._commit_append(m, new_frags, {}, lsn=max_lsn, job_id=job_id)

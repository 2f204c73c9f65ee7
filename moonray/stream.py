"""Streaming transactions — large multi-batch xacts staged outside the
table, folded in atomically at commit or discarded at abort.

Mirrors the reference's per-xact ``TransactionStreamState`` (own mem
slice + index + local deletions, commit folds flushed files + deletions
into the main table, abort discards; src/moonlink/src/storage/
mooncake_table/transaction_stream.rs:9-67). Ray-native shape: every
``append`` batch becomes staged fragments + staged index deltas under
``staging/xact-{xid}/`` immediately (streaming — nothing buffers in
driver memory); ``delete`` keys accumulate as staged parquet. COMMIT
runs the normal MERGE machinery over the staged change-set in one
batch-atomic manifest publish; ABORT removes the staging dir — the
table never saw anything.

Usage::

    x = table.stream_begin("xact-42")
    x.append(ds_part1); x.append(ds_part2)
    x.delete(keys_ds)          # Dataset with the key column
    x.commit(lsn=...)          # or x.abort()
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


class StreamTransaction:
    def __init__(self, table, xid: str):
        self.table = table
        self.xid = xid
        from moonray.storage import stage_path

        self.dir = stage_path(table.root, "staging", f"xact-{xid}")
        os.makedirs(os.path.join(self.dir, "appends"), exist_ok=True)
        os.makedirs(os.path.join(self.dir, "deletes"), exist_ok=True)
        self._seq = 0
        self._committed_version: int | None = None

    def _check_open(self):
        if self._committed_version is not None:
            raise RuntimeError(f"xact {self.xid} already committed")
        if not os.path.isdir(self.dir):
            raise RuntimeError(f"xact {self.xid} aborted")

    # ---------------- staging ----------------
    def append(self, ds) -> int:
        """Stage an append Dataset: rows land as parquet run files under
        the xact dir via parallel tasks (streamed, never buffered on the
        driver). Returns rows staged."""
        self._check_open()
        out_dir = os.path.join(self.dir, "appends")
        schema = self.table.schema()

        seq = self._seq
        self._seq += 1
        from moonray.identity import key_cols_of

        key_cols = key_cols_of(self.table.manifest()) or list(schema.names)[:1]

        def stage(batch: pa.Table) -> pa.Table:
            from moonray.util import cap_kernel_threads, content_id

            cap_kernel_threads()
            batch = batch.select(schema.names)
            rid = content_id(batch, *key_cols)
            path = os.path.join(out_dir, f"a-{seq:05d}-{rid}.parquet")
            tmp = path + ".tmp"
            pq.write_table(batch, tmp, compression="snappy")
            os.rename(tmp, path)
            return pa.table({"rows": pa.array([len(batch)], pa.int64())})

        total = ds.map_batches(stage, batch_format="pyarrow").sum("rows")
        return int(total or 0)

    def delete(self, keys_ds) -> int:
        """Stage a delete key set (Dataset carrying the key column)."""
        self._check_open()
        key_col = self.table.manifest()["key_col"]
        if key_col is None:
            raise ValueError("identity='none' table is append-only: "
                             "deletes are forbidden (reference: "
                             "mooncake_table.rs:129-139)")
        from moonray.identity import key_cols_of

        key_cols = key_cols_of(self.table.manifest())
        out_dir = os.path.join(self.dir, "deletes")

        seq = self._seq
        self._seq += 1

        def stage(batch: pa.Table) -> pa.Table:
            from moonray.util import cap_kernel_threads, content_id

            cap_kernel_threads()
            batch = batch.select(key_cols)
            rid = content_id(batch, *key_cols)
            path = os.path.join(out_dir, f"d-{seq:05d}-{rid}.parquet")
            tmp = path + ".tmp"
            pq.write_table(batch, tmp, compression="snappy")
            os.rename(tmp, path)
            return pa.table({"rows": pa.array([len(batch)], pa.int64())})

        total = keys_ds.map_batches(stage, batch_format="pyarrow").sum("rows")
        return int(total or 0)

    # ---------------- terminal ----------------
    def commit(self, lsn: int = 0) -> int:
        """Fold the staged change-set into the table as ONE atomic merge
        commit (reference: TransactionStreamCommit folds flushed files +
        local deletions, transaction_stream.rs:59-67). Appends are
        upserts; deletes are delete-if-exists; ordering across
        append()/delete() calls is preserved via their staging sequence
        number (last call wins per key); within one call, keys must be
        distinct (as in one flushed mem-slice). Idempotent per xact id."""
        import ray.data as rd

        self._check_open()
        key_col = self.table.manifest()["key_col"]
        schema = self.table.schema()

        def seq_of(p: str) -> int:
            return int(os.path.basename(p).split("-")[1])

        append_kind = "I" if self.table.manifest()["key_col"] is None else "U"
        parts = []
        for kind, sub in ((append_kind, "appends"), ("D", "deletes")):
            base = os.path.join(self.dir, sub)
            by_seq: dict[int, list[str]] = {}
            for p in sorted(os.listdir(base)):
                if p.endswith(".parquet"):
                    by_seq.setdefault(seq_of(p), []).append(os.path.join(base, p))
            for seq, paths in sorted(by_seq.items()):
                ds = rd.read_parquet(paths)

                # The caller's RAW lsn becomes the commit LSN; ordering
                # across append()/delete() calls rides in the _seq
                # tie-break column, which stays INTERNAL to the merge
                # (never reaches commit_lsn) — an inflated synthetic LSN
                # would permanently pollute the table's LSN domain and
                # break scan_begin(lsn)/wait_for_commit_lsn resolution.
                def tag(b: pa.Table, kind=kind, seq=seq) -> pa.Table:
                    n = len(b)
                    cols = {"op": pa.array([kind] * n, pa.string()),
                            "lsn": pa.array([lsn] * n, pa.int64()),
                            "_seq": pa.array([seq] * n, pa.int64())}
                    for f in schema:
                        if f.name in b.column_names:
                            cols[f.name] = b[f.name]
                        else:
                            cols[f.name] = pa.array([None] * n, f.type)
                    return pa.table(cols)

                parts.append(ds.map_batches(tag, batch_format="pyarrow"))
        if not parts:
            v = self.table.latest_version()
        else:
            changes = parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])
            v = self.table.merge(changes, job_id=f"xact-{self.xid}",
                                 seq_col="_seq")
        self._committed_version = v
        shutil.rmtree(self.dir, ignore_errors=True)
        return v

    def abort(self) -> None:
        """Discard every staged file; the table state is untouched
        (reference: abort drops TransactionStreamState)."""
        if self._committed_version is not None:
            raise RuntimeError(f"xact {self.xid} already committed")
        shutil.rmtree(self.dir, ignore_errors=True)

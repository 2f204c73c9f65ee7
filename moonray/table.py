"""MoonrayTable — the user-facing table API.

The Ray-native analogue of the reference's backend facade
(``create_table / scan_table(lsn) / optimize_table / create_snapshot``,
src/moonlink_backend/src/lib.rs:37-460) and its blocking admin API
(``TableEventManager``,
src/moonlink/src/storage/mooncake_table/table_event_manager.rs:9-123):

    t = MoonrayTable.create(root, key_col="image_id", zone_cols=("phash","w","h"))
    t.bulk_load(ds)                      # LoadFiles / initial copy
    t.merge(changes_ds)                  # CDC apply / MERGE INTO
    t.scan(version=None)                 # snapshot-isolated union read
    t.optimize("data"|"index"|"full")    # compaction / index merge
    t.cluster()                          # Z-order clustering
    t.expire_snapshots(keep_last=2)
    t.pin(version, token) / t.unpin(token)
    t.describe()                         # TableSnapshotStatus analogue

Scans never materialize the table: they return a lazy ``ray.data.Dataset``
(parquet read pruned by zone maps → zero-copy Arrow ``map_batches`` DV
filter), mirroring the reference's union read of parquet + DVs
(src/moonlink/src/storage/mooncake_table/snapshot_read.rs:152-241).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
from ray.data.block import BlockMetadata
from ray.data.datasource import Datasource, ReadTask

from moonray import manifest as mf
from moonray.dv import dv_paths_of
from moonray.fragments import ROWOFF, FragmentWriter, collect_staged_fragment_meta
from moonray.keyindex import build_index_from_runs
from moonray.util import as_fn, new_job_id

# bound on optimistic-append rebase retries (see _commit_append): each
# retry is one manifest read + one conditional put — cheap — but an
# unbounded loop under pathological contention would hide the problem
_COMMIT_REBASE_ATTEMPTS = 50

DEFAULT_ROWS_PER_FRAGMENT = 4096  # reference mem-slice: 4096-row batches × 32
PATH_COL = "path"  # added by read_parquet(include_paths=True)


def _rg_stats_overlap(pf, rg_idx: int, ranges: dict, present: set,
                      in_sets: dict | None = None) -> bool:
    """Row-group min/max stats vs the pushed ranges / IN-lists — False
    only when the footer PROVES no row can match (missing/partial stats
    keep the group; the in-task mask stays the source of truth)."""
    md = pf.metadata.row_group(rg_idx)
    by_name = {md.column(i).path_in_schema: md.column(i)
               for i in range(md.num_columns)}

    def stats_of(col):
        c = by_name.get(col)
        st = c.statistics if c is not None else None
        return st if (st is not None and st.has_min_max) else None

    for col, (lo, hi) in (ranges or {}).items():
        st = stats_of(col) if col in present else None
        if st is None:
            continue
        try:
            if (lo is not None and st.max < lo) or \
                    (hi is not None and st.min > hi):
                return False
        except TypeError:  # uncomparable stat/bound domains → keep
            continue
    for col, values in (in_sets or {}).items():
        st = stats_of(col) if col in present else None
        if st is None:
            continue
        try:
            if not any(st.min <= v <= st.max for v in values):
                return False
        except TypeError:
            continue
    return True


def _zones_contain_any(zones: dict, in_sets: dict) -> bool:
    """Fragment zone maps vs IN-lists: False only when the zone map
    PROVES no listed value can occur (min/max containment — zone maps
    can't prove equality, so the in-task is_in filter stays mandatory)."""
    for col, values in in_sets.items():
        z = zones.get(col)
        if z is None:
            continue
        zmin, zmax = z
        if zmin is None or zmax is None:
            continue
        if not any(zmin <= v <= zmax for v in values):
            return False
    return True


def _range_mask(t: pa.Table, ranges: dict | None,
                in_sets: dict | None = None):
    """Inclusive-bounds + IN-list row mask; None bounds are open. Null
    values compare to null and are dropped by filter (SQL semantics —
    same rows a downstream BETWEEN / IN keeps)."""
    import pyarrow.compute as pc

    m = None
    for col, (lo, hi) in (ranges or {}).items():
        if col not in t.column_names:
            continue
        for bound, op in ((lo, pc.greater_equal), (hi, pc.less_equal)):
            if bound is None:
                continue
            part = op(t[col], bound)
            m = part if m is None else pc.and_(m, part)
    for col, values in (in_sets or {}).items():
        if col not in t.column_names:
            continue
        part = pc.is_in(t[col], value_set=pa.array(
            list(values), t.schema.field(col).type))
        m = part if m is None else pc.and_(m, part)
    return m


def _read_fragment(root: str, rel_path: str, dv_rels: list[str],
                   read_schema: pa.Schema, defaults: dict,
                   with_internal: bool,
                   rg_span: tuple[int, int] | None = None,
                   ranges: dict | None = None,
                   in_sets: dict | None = None,
                   drop_after: tuple = (),
                   bloom: dict | None = None) -> pa.Table:
    """Read one fragment (column-pruned, memory-mapped) + inline DV
    filter + projection onto the current schema (ALTER-added columns
    filled with defaults). Each read task loads only ITS fragment's DV
    delta files — no broadcast needed. ``rg_span=(a, b)`` reads only
    parquet row groups [a, b) — the scan-split unit that decouples scan
    parallelism from the fragment count. ``ranges`` pushes the exact
    inclusive range filter into the task (parquet row-group stats
    prune at the read where the column is present in the file; the
    post-projection mask covers schema-evolution columns filled from
    defaults); ``drop_after`` columns were read only for that filter
    and never leave the task."""
    from moonray.dv import filter_batch, load_dv_union
    from moonray.fragments import normalize_to_schema
    from moonray.util import cap_kernel_threads

    from moonray.filecache import data_path

    cap_kernel_threads()
    path = data_path(root, rel_path)
    cols = list(read_schema.names)
    if (dv_rels or with_internal) and ROWOFF not in cols:
        cols.append(ROWOFF)
    if rg_span is None and not (bloom and in_sets):
        present = set(pq.read_schema(path).names)
        filters = None
        if ranges or in_sets:
            conj = [(c, op, b)
                    for c, (lo, hi) in (ranges or {}).items() if c in present
                    for b, op in ((lo, ">="), (hi, "<=")) if b is not None]
            conj += [(c, "in", list(v))
                     for c, v in (in_sets or {}).items() if c in present]
            filters = [conj] if conj else None
        t = pq.read_table(path, columns=[c for c in cols if c in present],
                          memory_map=True, pre_buffer=False,
                          filters=filters)
    else:
        pf = pq.ParquetFile(path, memory_map=True, pre_buffer=False)
        present = set(pf.schema_arrow.names)
        span = rg_span or (0, pf.num_row_groups)
        hi = min(span[1], pf.num_row_groups)
        rgs = list(range(span[0], hi))
        if ranges or in_sets:
            rgs = [g for g in rgs
                   if _rg_stats_overlap(pf, g, ranges, present, in_sets)]
        if bloom and in_sets and rgs:
            rgs = _rgs_bloom_maybe(root, bloom, rgs)
        t = (pf.read_row_groups(rgs,
                                columns=[c for c in cols if c in present])
             if rgs else
             pf.schema_arrow.empty_table().select(
                 [c for c in cols if c in present]))
    if dv_rels:
        t = filter_batch(t, ROWOFF, load_dv_union(root, dv_rels))
    t = normalize_to_schema(t, read_schema, defaults,
                            keep_extra=(ROWOFF,) if with_internal else ())
    if ranges or in_sets:
        m = _range_mask(t, ranges, in_sets)
        if m is not None:
            t = t.filter(m)
        if drop_after:
            t = t.drop_columns([c for c in drop_after
                                if c in t.column_names])
    if with_internal:
        t = t.append_column(PATH_COL, pa.array(
            [os.path.join(root, rel_path)] * len(t), pa.string()))
    return t


def _rgs_bloom_maybe(root: str, bloom: dict, rgs: list) -> list:
    """Intersect the candidate row groups with each indexed predicate
    column's per-row-group blooms (colindex sidecar v2). Conservative:
    a missing/foreign sidecar keeps everything."""
    import numpy as np

    from moonray import colindex

    for _col, (entry, h) in bloom.items():
        if not rgs:
            break
        data = colindex.read_sidecar(root, entry)
        if data is None:
            continue
        try:
            mask = colindex.rgs_maybe(data, np.asarray(h, np.uint64), rgs)
        except Exception:  # noqa: BLE001 — corrupt sidecar → keep all
            continue
        rgs = [g for g, keep in zip(rgs, mask) if keep]
    return rgs


class FragmentDatasource(Datasource):
    """Custom Ray Data source over a pinned manifest's fragment list —
    one ReadTask per fragment, exact row/byte metadata from the manifest.
    Replaces ray.data.read_parquet, whose driver-side metadata/sampling
    machinery costs seconds of fixed overhead per pipeline; fragment
    sizing (rows_per_fragment) already fixes block granularity, so its
    splitting logic buys nothing. A real read op (not a map stage) so
    downstream map_batches batch_size semantics stay row-based."""

    def __init__(self, root: str, frags: list[dict], read_schema: pa.Schema,
                 defaults: dict, with_internal: bool,
                 ranges: dict | None = None, in_sets: dict | None = None,
                 drop_after: tuple = (), bloom_info: dict | None = None):
        self.root = root
        self.frags = frags
        self.read_schema = read_schema
        self.defaults = defaults
        self.with_internal = with_internal
        self.ranges = ranges
        self.in_sets = in_sets
        self.drop_after = drop_after
        # {col: (entries_by_path, value_hashes)} — per-row-group bloom
        # consult plan for in_sets columns (colindex.scan_plan)
        self.bloom_info = bloom_info

    def get_name(self) -> str:
        return "MoonrayFragments"

    def estimate_inmemory_data_size(self):
        return sum(f["bytes"] for f in self.frags)

    def get_read_tasks(self, parallelism: int) -> list[ReadTask]:
        from moonray.dv import dv_paths_of

        n = max(1, len(self.frags))
        per_frag = max(1, -(-max(parallelism, n) // n))
        out = []
        for f in self.frags:
            rg = f.get("rg_rows")
            n_rgs = -(-f["rows"] // rg) if rg else 1
            k = min(per_frag, n_rgs)
            live_frac = 1 - f["dv_count"] / max(1, f["rows"])
            bounds = [round(i * n_rgs / k) for i in range(k + 1)]
            root, rel, dvs = self.root, f["path"], dv_paths_of(f)
            sch, dflt, internal = self.read_schema, self.defaults, self.with_internal
            rngs, insets, drop = self.ranges, self.in_sets, self.drop_after
            fb = None
            if self.bloom_info:
                fb = {c: (ents[f["path"]], h)
                      for c, (ents, h) in self.bloom_info.items()
                      if f["path"] in ents} or None
            for a, b in zip(bounds, bounds[1:]):
                if a == b:
                    continue
                span = None if k == 1 else (a, b)
                rows = (f["rows"] if span is None
                        else min(f["rows"] - a * rg, (b - a) * rg))
                # num_rows must be None under a pushed filter: Ray
                # answers Dataset.count() from read-task metadata
                # WITHOUT executing, and the filter drops rows in-task
                meta = BlockMetadata(
                    num_rows=(None if (self.ranges or self.in_sets)
                              else int(rows * live_frac)),
                    size_bytes=int(f["bytes"] * (rows / f["rows"]) * live_frac),
                    exec_stats=None,
                    input_files=[os.path.join(self.root, f["path"])])

                def fn(root=root, rel=rel, dvs=dvs, sch=sch, dflt=dflt,
                       internal=internal, span=span, rngs=rngs,
                       insets=insets, drop=drop, fb=fb):
                    return [_read_fragment(root, rel, dvs, sch, dflt,
                                           internal, rg_span=span,
                                           ranges=rngs, in_sets=insets,
                                           drop_after=drop, bloom=fb)]

                out.append(ReadTask(fn, meta))
        return out


def _zones_overlap(zones: dict, ranges: dict) -> bool:
    for col, (lo, hi) in ranges.items():
        z = zones.get(col)
        if z is None:
            continue
        zmin, zmax = z
        if zmin is None or zmax is None:
            continue
        if (lo is not None and zmax < lo) or (hi is not None and zmin > hi):
            return False
    return True


class MoonrayTable:
    def __init__(self, root: str):
        self.root = root

    def _assert_writable(self, op: str) -> None:
        """Writes to a remote (``scheme://``) root require a commit
        store that implements the write plane (put / put_if_absent /
        set_pointer — mock:// in tests; the documented S3 mapping in
        production) AND a shared scratch mount for the coordination
        plane ($MOONRAY_SCRATCH; see storage.py). The store raises
        NotImplementedError for schemes whose write calls aren't
        wired (s3:// in this container), which surfaces here before
        any data moves. Reads never come through this check."""
        from moonray.commitstore import store_for
        from moonray.manifest import is_remote_root

        if is_remote_root(self.root):
            store_for(self.root)  # raises for write-incapable schemes

    # ---------------- lifecycle ----------------
    @staticmethod
    def create(root: str, *, schema: pa.Schema, key_col: str | None = None,
               key_cols=None, identity: str = "keys",
               zone_cols=(), index_partitions: int = 16,
               rows_per_fragment: int = DEFAULT_ROWS_PER_FRAGMENT) -> "MoonrayTable":
        """Create an empty table at version 0.

        Identity modes (reference ``IdentityProp``, moonlink_row.rs:270-277):
        ``keys`` + key_col (single) or key_cols (composite tuple),
        ``full_row`` (every column is key), ``none`` (append-only — no
        key index, deletes/updates forbidden)."""
        from moonray.identity import resolve_identity

        identity, kcols, index_key = resolve_identity(identity, key_col,
                                                      key_cols, schema)
        mf.init_table_dirs(root)
        m = {
            "version": 0,
            "parent": None,
            "commit_lsn": 0,
            "job_id": "create",
            "key_col": index_key,
            "key_cols": kcols,
            "identity": identity,
            "zone_cols": list(zone_cols),
            "index": {"num_partitions": index_partitions, "partitions": {}},
            "fragments": [],
            "rows_per_fragment": rows_per_fragment,
            "schema_ipc": schema.serialize().to_pybytes().hex(),
            "column_defaults": {},
            "stats": {},
        }
        mf.commit_manifest(root, m)
        return MoonrayTable(root)

    @staticmethod
    def open(root: str) -> "MoonrayTable":
        mf.latest_version(root)  # raises if absent
        return MoonrayTable(root)

    # ---------------- metadata ----------------
    def manifest(self, version: int | None = None) -> dict:
        return mf.load_manifest(self.root, version)

    def schema(self) -> pa.Schema:
        return pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(self.manifest()["schema_ipc"])))

    def latest_version(self) -> int:
        return mf.latest_version(self.root)

    def versions(self) -> list[int]:
        return mf.list_versions(self.root)

    def fsck(self, *, deep: bool = True, concurrency=None) -> dict:
        """Table-integrity verification (moonray.fsck): manifest claims
        vs file reality — missing/duplicated refs, footer row counts,
        DV range/cardinality, zone-map containment, key nulls. Deep
        pass is one Ray task per fragment over thin columns only."""
        from moonray.fsck import fsck

        return fsck(self, deep=deep, concurrency=concurrency)

    def analyze(self, columns: list[str] | None = None, *,
                version: int | None = None, distinct: str = "hash64"):
        """ANALYZE TABLE: per-column statistics over the live rows of
        ``version`` (DV-excluded scan → functions/profile) — one row per
        column with rows/nulls/distinct/min/max/length mass. The scan is
        column-pruned to exactly the profiled columns."""
        from moonray.functions.profile import profile_columns

        schema_names = set(self.schema().names)
        if columns is None:
            columns = [f.name for f in self.schema()
                       if not f.name.startswith("_")]
        # validate eagerly on the driver: a bad column name must raise
        # KeyError HERE, not as a RayTaskError inside a map task (the
        # HTTP service maps eager KeyError/ValueError to 400; a task
        # error would surface as a 500)
        missing = [c for c in columns if c not in schema_names]
        if missing:
            raise KeyError(f"no such column(s): {missing}")
        ds = self.scan(version=version, columns=list(columns))
        return profile_columns(ds, list(columns), distinct=distinct)

    def validate(self, *, unique: tuple | None = None,
                 not_null: tuple = (), ranges: dict | None = None,
                 in_set: dict | None = None, version: int | None = None):
        """Declared-expectation validation over the live rows
        (functions/validate): key uniqueness defaults to this table's
        identity key TUPLE (one composite constraint, not one per
        column) — a post-MERGE invariant worth asserting after
        restores, imports and manual repairs. full_row / append-only
        identities have no uniqueness guarantee, so the default is no
        unique check there. ``unique`` entries may be column names or
        tuples (composite)."""
        from moonray.functions.validate import check_constraints
        from moonray.identity import key_cols_of

        if unique is None:
            m = self.manifest()
            kc = key_cols_of(m) if m.get("identity", "keys") == "keys" \
                else None
            unique = ((tuple(kc),) if kc and len(kc) > 1
                      else tuple(kc or ()))
        ucols = {c for k in unique
                 for c in ([k] if isinstance(k, str) else k)}
        cols = ucols | set(not_null) | set(ranges or {}) \
            | set(in_set or {})
        # eager driver-side column check (same rationale as analyze):
        # bad names 400 at the service instead of RayTaskError→500
        missing = sorted(cols - set(self.schema().names))
        if missing:
            raise KeyError(f"no such column(s): {missing}")
        ds = self.scan(columns=sorted(cols) or None, version=version)
        return check_constraints(ds, unique=tuple(unique),
                                 not_null=tuple(not_null),
                                 ranges=ranges, in_set=in_set)

    def describe(self, version: int | None = None) -> dict:
        """TableSnapshotStatus analogue (reference:
        src/moonlink/src/storage/mooncake_table/table_status.rs:5-14)."""
        m = self.manifest(version)
        rows = sum(f["rows"] - f["dv_count"] for f in m["fragments"])
        return {
            "version": m["version"],
            "commit_lsn": m["commit_lsn"],
            "cardinality": rows,
            "num_fragments": len(m["fragments"]),
            "bytes": sum(f["bytes"] for f in m["fragments"]),
            "deleted_rows": sum(f["dv_count"] for f in m["fragments"]),
            "index_files": sum(len(v) for v in m["index"]["partitions"].values()),
        }

    def history(self) -> list[dict]:
        """Version history (the Iceberg snapshots/metadata-table
        analogue): one row per retained version with commit LSN, job and
        stats — newest last."""
        out = []
        for v in self.versions():
            m = self.manifest(v)
            out.append({
                "version": v, "parent": m["parent"],
                "commit_lsn": m["commit_lsn"], "job_id": m["job_id"],
                "committed_at": m.get("committed_at"),
                "num_fragments": len(m["fragments"]),
                "rows": sum(f["rows"] - f["dv_count"] for f in m["fragments"]),
                "stats": m.get("stats", {}),
            })
        return out

    def fragments(self, version: int | None = None) -> pa.Table:
        """Fragment metadata as an Arrow table (the files/manifests
        metadata-table analogue): id, path, rows, bytes, dv_count and
        flattened zone-map min/max per zone column."""
        m = self.manifest(version)
        rows = []
        for f in m["fragments"]:
            row = {"id": f["id"], "path": f["path"], "rows": f["rows"],
                   "bytes": f["bytes"], "dv_count": f["dv_count"]}
            for c, (lo, hi) in f.get("zones", {}).items():
                row[f"zone_{c}_min"] = lo
                row[f"zone_{c}_max"] = hi
            rows.append(row)
        if not rows:
            return pa.table({"id": pa.array([], pa.string())})
        return pa.Table.from_pylist(rows)

    def sql(self, query: str, *, view_name: str = "t",
            version: int | None = None):
        """Run a DuckDB query against this table's snapshot (registered
        as ``view_name`` via duckdb_view — the external-SQL consumption
        path). Returns a pyarrow Table."""
        import duckdb

        con = duckdb.connect()
        self.duckdb_view(con, view_name, version)
        return con.sql(query).arrow()

    def pin(self, version: int, token: str) -> None:
        mf.pin(self.root, version, token)

    def unpin(self, token: str) -> None:
        mf.unpin(self.root, token)

    # -------- named refs (the Iceberg tag analogue: a durable
    # name → version pointer retained across expire_snapshots; our
    # linear version chain has no branches — tags only) --------
    def tag(self, name: str, version: int | None = None) -> int:
        """Name a snapshot. The tag both resolves (``scan(ref=name)``,
        ``ref_version``) and PINS its version against expiry, like an
        Iceberg tag ref with unbounded retention."""
        self._check_ref_name(name)
        v = self.latest_version() if version is None else int(version)
        self.manifest(v)  # must exist (raises otherwise)
        mf.pin(self.root, v, f"tag-{name}")
        return v

    def untag(self, name: str) -> None:
        self._check_ref_name(name)
        mf.unpin(self.root, f"tag-{name}")

    def tags(self) -> dict[str, int]:
        return mf.named_tags(self.root)

    def ref_version(self, name: str) -> int:
        self._check_ref_name(name)
        tags = mf.named_tags(self.root)
        if name not in tags:
            raise KeyError(f"no tag named {name!r} (have: {sorted(tags)})")
        return tags[name]

    @staticmethod
    def _check_ref_name(name: str) -> None:
        import re

        if not re.fullmatch(r"[A-Za-z0-9][A-Za-z0-9._-]{0,127}", name or ""):
            raise ValueError(
                f"invalid ref name {name!r}: use letters/digits/._- "
                "(max 128 chars, must start alphanumeric)")
        if name == "main":
            # Iceberg reserves 'main' for the branch head; a tag named
            # main would be silently unexportable as an Iceberg ref
            raise ValueError("'main' is reserved for the branch head")

    # -------- branch refs (writable lines of development; Iceberg
    # branch analogue realized as zero-copy clones under
    # <root>/branches/ — see branches.py for the model) --------
    def create_branch(self, name: str, *, version: int | None = None,
                      ref: str | None = None) -> "MoonrayTable":
        from moonray.branches import create_branch

        return create_branch(self, name, version=version, ref=ref)

    def branch(self, name: str) -> "MoonrayTable":
        from moonray.branches import open_branch

        return open_branch(self, name)

    def branches(self) -> list[str]:
        from moonray.branches import list_branches

        return list_branches(self)

    def publish_branch(self, name: str, *, drop: bool = False) -> int:
        from moonray.branches import publish_branch

        return publish_branch(self, name, drop=drop)

    def drop_branch(self, name: str) -> None:
        from moonray.branches import drop_branch

        drop_branch(self, name)

    # -------- reference RPC-surface parity (src/moonlink_rpc/src/lib.rs:28-39,
    # src/moonlink_backend/src/lib.rs:37-460) --------
    def scan_begin(self, lsn: int | None = None) -> tuple[int, str]:
        """scan_table_begin analogue: resolve the newest version whose
        commit_lsn ≥ the requested LSN is VISIBLE at (read-at-LSN rule:
        sees changes committed at LSN ≤ X, mooncake_table.rs:438-443),
        pin it, return (version, pin token). The reference blocks until
        replication catches up; batch-engine semantics: raise if no
        committed version covers the LSN yet."""
        versions = self.versions()
        if lsn is None:
            v = versions[-1]
        else:
            v = None
            for cand in versions:  # oldest version whose snapshot covers lsn
                if self.manifest(cand)["commit_lsn"] >= lsn:
                    v = cand
                    break
            if v is None:
                raise TimeoutError(
                    f"no committed version covers lsn {lsn} "
                    f"(latest commit_lsn={self.manifest()['commit_lsn']})")
        token = f"scan-{new_job_id()}"
        self.pin(v, token)
        return v, token

    def scan_end(self, token: str) -> None:
        """scan_table_end analogue: release the reader pin."""
        self.unpin(token)

    def wait_for_commit_lsn(self, lsn: int) -> int:
        """wait_for_wal_flush analogue; batch semantics: assert the LSN
        is already durable, returning the covering version."""
        v, token = self.scan_begin(lsn)
        self.unpin(token)
        return v

    def flush(self) -> int:
        """Force-snapshot analogue (ForceSnapshot / create_snapshot):
        every write path here commits durably before returning, so flush
        republishes the current state as a fresh manifest version."""
        from moonray.maintenance import rewrite_manifest

        return rewrite_manifest(self)

    def expire_snapshots(self, keep_last: int = 2, keep_versions=()) -> dict:
        self._assert_writable("expire_snapshots")
        return mf.expire_snapshots(self.root, keep_last, keep_versions)

    # ---------------- write paths ----------------
    def bulk_load(self, ds, *, lsn: int = 0, job_id: str | None = None,
                  rows_per_fragment: int | None = None) -> int:
        """Bulk ingest a Dataset as new fragments + index entries + one
        commit — the reference's LoadFiles / initial-copy path
        (src/moonlink/src/storage/mooncake_table/batch_ingestion.rs:65-120).
        Streams: fragment writes and index-entry emission happen inside
        map_batches tasks; only (key, frag, off) triples shuffle."""
        self._assert_writable("bulk_load")
        from moonray.identity import with_identity_key

        job_id = job_id or new_job_id()
        prev = mf.find_version_by_job(self.root, job_id)
        if prev is not None:
            return prev
        m = self.manifest()
        rpf = rows_per_fragment or m["rows_per_fragment"]
        # write tasks stage their index entries pre-partitioned
        # (keyindex.stage_entry_runs) — the index build is then one tiny
        # raw task per partition, not a Ray Data entry shuffle chained
        # behind the payload write pipeline
        from moonray.fragments import rg_rows_of

        writer = FragmentWriter(self.root, job_id, m["key_col"], m["zone_cols"],
                                data_cols=list(self.schema().names),
                                index_partitions=(m["index"]["num_partitions"]
                                                  if m["key_col"] else None),
                                row_group_rows=rg_rows_of(rpf))
        src = with_identity_key(ds, m)
        src.map_batches(as_fn(writer), batch_format="pyarrow",
                        batch_size=rpf).count()  # drive the write pipeline
        if m["key_col"] is None:  # identity='none': no key index
            deltas: dict[str, list[str]] = {}
        else:
            deltas = build_index_from_runs(self.root, job_id, m["key_col"])
        new_frags = collect_staged_fragment_meta(self.root, job_id)
        return self._commit_append(m, new_frags, deltas, lsn, job_id)

    def _commit_append(self, parent: dict, new_frags: list[dict],
                       index_deltas: dict[str, list[str]], lsn: int, job_id: str,
                       replaced_frag_ids: set[str] = frozenset(),
                       dv_updates: dict[str, dict] | None = None,
                       replace_index: bool = False,
                       op: str = "append") -> int:
        """Build + atomically publish the child manifest (driver-side
        commit, like the reference's snapshot commit at
        src/moonlink/src/storage/mooncake_table/snapshot.rs:484-662).

        Concurrency: PURE APPENDS (new fragments + appended index
        deltas, nothing replaced, no DV updates) commute with any
        concurrent commit, so when the conditional-put loses the
        version-id race the commit is REBASED onto the new head and
        retried — Delta/Iceberg-style optimistic concurrency for the
        multi-writer ingest pattern. Keyed merges and maintenance
        rewrites reference specific parent fragments (their DV offsets,
        replacement sets and index probes were computed against one
        snapshot), so they stay single-writer per table — the
        reference's one-TableHandler-per-table model — and a lost race
        surfaces as CommitConflict for the caller to re-run."""
        from moonray.commitstore import CommitConflict
        from moonray.dv import dv_paths_of

        def build(parent: dict) -> dict:
            frags = []
            for f in parent["fragments"]:
                if f["id"] in replaced_frag_ids:
                    continue
                if dv_updates and f["id"] in dv_updates:
                    upd = dv_updates[f["id"]]
                    # append this round's disjoint DV deltas (see dv.dv_paths_of)
                    f = dict(f, dv=dv_paths_of(f) + list(upd["add"]),
                             dv_count=f["dv_count"] + int(upd["add_count"]))
                    if f["dv_count"] >= f["rows"]:
                        continue  # fully dead fragment drops out of the manifest
                frags.append(f)
            for nf in new_frags:
                if nf["rows"] > 0:
                    frags.append(nf)
            if replace_index:
                partitions = {p: [x for x in v if x] for p, v in index_deltas.items()}
                partitions = {p: v for p, v in partitions.items() if v}
            else:
                partitions = {p: list(v) for p, v in parent["index"]["partitions"].items()}
                for p, paths in index_deltas.items():
                    partitions.setdefault(p, []).extend(x for x in paths if x)
            return {
                "version": parent["version"] + 1,
                "parent": parent["version"],
                # commit kind: append | merge | maintenance | alter — lets
                # the changelog reader (table.changes) skip data-preserving
                # rewrites, like Iceberg snapshot summary operation kinds
                "op": op,
                "commit_lsn": max(lsn, parent["commit_lsn"]),
                "job_id": job_id,
                "key_col": parent["key_col"],
                "key_cols": parent.get("key_cols"),
                "identity": parent.get("identity", "keys"),
                "zone_cols": parent["zone_cols"],
                "index": {"num_partitions": parent["index"]["num_partitions"],
                          "partitions": partitions},
                "fragments": frags,
                "rows_per_fragment": parent["rows_per_fragment"],
                "schema_ipc": parent["schema_ipc"],
                "column_defaults": parent.get("column_defaults", {}),
                "stats": {"new_fragments": len(new_frags),
                          "replaced_fragments": len(replaced_frag_ids),
                          "dv_updates": len(dv_updates or {})},
                # clone lineage survives every commit: drop_table needs
                # it to release the source retention pin
                **({"cloned_from": parent["cloned_from"]}
                   if "cloned_from" in parent else {}),
            }

        rebase_safe = (op == "append" and not replaced_frag_ids
                       and not dv_updates and not replace_index)
        for _attempt in range(_COMMIT_REBASE_ATTEMPTS):
            try:
                return mf.commit_manifest(self.root, build(parent))
            except CommitConflict:
                if not rebase_safe:
                    raise
                # the LATEST pointer can lag a just-committed version
                # (advance_pointer is monotonic, not instant): rebase on
                # the true head from the immutable version listing
                head = max(mf.list_versions(self.root))
                parent = mf.load_manifest(self.root, head)
        raise CommitConflict(
            f"append commit lost {_COMMIT_REBASE_ATTEMPTS} version races in a "
            "row — pathological writer contention; back off and retry")

    def alter(self, *, add_columns=(), drop_columns=(),
              job_id: str | None = None) -> int:
        """ALTER TABLE — add/drop columns ONLY, exactly the reference's
        evolution contract ("Only support alter table with add/drop
        fields", src/moonlink/src/storage/mooncake_table.rs:100-126,
        644-647). Metadata-only commit: existing fragments are untouched;
        scans project them onto the new schema, filling added columns
        with their declared default (or null).

        add_columns: iterable of (name, pyarrow type, default) or
        (name, type). drop_columns: iterable of names (never the key
        column; zone columns are removed from the clustering spec)."""
        self._assert_writable("alter")
        job_id = job_id or new_job_id()
        prev = mf.find_version_by_job(self.root, job_id)
        if prev is not None:
            return prev
        from moonray.identity import key_cols_of

        m = self.manifest()
        schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema_ipc"])))
        defaults = dict(m.get("column_defaults", {}))
        drop = set(drop_columns)
        dropped_keys = drop & set(key_cols_of(m))
        if dropped_keys:
            raise ValueError(f"cannot drop key column(s) {sorted(dropped_keys)}")
        fields = [f for f in schema if f.name not in drop]
        for spec in add_columns:
            name, typ = spec[0], spec[1]
            if name in {f.name for f in fields}:
                raise ValueError(f"column {name!r} already exists")
            fields.append(pa.field(name, typ))
            if len(spec) > 2 and spec[2] is not None:
                defaults[name] = spec[2]
        defaults = {k: v for k, v in defaults.items() if k not in drop}
        new_schema = pa.schema(fields)
        child = {
            "version": m["version"] + 1,
            "parent": m["version"],
            "commit_lsn": m["commit_lsn"],
            "job_id": job_id,
            "key_col": m["key_col"],
            "key_cols": m.get("key_cols"),
            "identity": m.get("identity", "keys"),
            "zone_cols": [c for c in m["zone_cols"] if c not in drop],
            "index": m["index"],
            "fragments": m["fragments"],
            "rows_per_fragment": m["rows_per_fragment"],
            "schema_ipc": new_schema.serialize().to_pybytes().hex(),
            "column_defaults": defaults,
            "stats": {"altered": {"added": [s[0] for s in add_columns],
                                  "dropped": sorted(drop)}},
        }
        return mf.commit_manifest(self.root, child)

    def initial_copy(self, snapshot_ds, buffered_changes, *,
                     snapshot_lsn: int, job_id: str | None = None) -> int:
        """Initial table copy with concurrent-change replay — the
        reference buffers CDC events that arrive while the snapshot copy
        runs and replays them once it finishes (pg_replicate.rs:244-309,
        table_handler.rs:352-380). Batch shape: bulk-load the snapshot
        (committed at ``snapshot_lsn``), then MERGE only the buffered
        changes with lsn > snapshot_lsn — events already REFLECTED in
        the snapshot are skipped, so replay is idempotent even when the
        buffer overlaps the copy. Both halves resume under job_id."""
        self._assert_writable("initial_copy")
        import pyarrow.compute as pc

        job_id = job_id or new_job_id()
        self.bulk_load(snapshot_ds, lsn=snapshot_lsn, job_id=f"{job_id}-copy")

        def later(b: pa.Table) -> pa.Table:
            return b.filter(pc.greater(b["lsn"], snapshot_lsn))

        later.__name__ = "changes_after_snapshot"
        return self.merge(buffered_changes.map_batches(
            later, batch_format="pyarrow"), job_id=f"{job_id}-replay")

    def merge(self, changes, *, job_id: str | None = None,
              seq_col: str | None = None) -> int:
        self._assert_writable("merge")
        from moonray.merge import merge_into

        return merge_into(self, changes, job_id=job_id, seq_col=seq_col)

    def delete_where(self, predicate, *, lsn: int, columns=(),
                     predicate_ranges=None, exact_ranges: bool = False,
                     job_id: str | None = None) -> int:
        """DELETE ... WHERE — predicate deletes. Zone-pruned scan of ONLY
        the key + predicate columns (``columns``), vectorized
        ``predicate(batch) -> bool mask`` per batch, and the matching
        keys re-enter the normal MERGE delete path (index probe → DV
        deltas) — batch-atomic visibility, last-writer-wins and
        idempotent resume hold unchanged. The reference has no row
        rewrite either: deletes are key-addressed events
        (moonlink_sink.rs:277-345); this operator derives the keys from
        a predicate instead of a CDC stream. Payload columns never move:
        the scan projects the thin columns and the merge ships only
        (op, lsn, key) rows.

        INVARIANT: ``predicate_ranges`` is a pruning hint and MUST cover
        (be a superset of) the predicate's true region — a fragment
        whose zone map misses the range is never scanned, so matching
        rows inside it would silently survive the delete. Omit it when
        unsure; it only saves I/O, never changes semantics when
        consistent. ``exact_ranges=True`` additionally pushes the range
        filter into the read tasks (row-group pruning, non-matching thin
        rows dropped at the read) — valid only when the hint EQUALS the
        predicate region, as in ``delete_range``; the predicate still
        runs on what survives, so a consistent hint stays idempotent."""
        self._assert_writable("delete_where")
        from moonray.identity import key_cols_of

        m = self.manifest()
        kcols = key_cols_of(m)
        if not kcols:
            raise ValueError("identity='none' tables are append-only; "
                             "delete_where is not allowed")
        schema = self.schema()
        need = sorted(set(kcols) | set(columns))

        def to_deletes(b: pa.Table) -> pa.Table:
            mask = predicate(b)
            if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
                import numpy as np

                mask = pa.array(np.asarray(mask, dtype=bool))
            hit = b.filter(mask)
            n = len(hit)
            cols = {"op": pa.array(["D"] * n, pa.string()),
                    "lsn": pa.array([lsn] * n, pa.int64())}
            for f in schema:
                cols[f.name] = (hit[f.name] if f.name in hit.column_names
                                else pa.nulls(n, f.type))
            return pa.table(cols)

        to_deletes.__name__ = "predicate_deletes"
        ds = self.scan(columns=need, predicate_ranges=predicate_ranges,
                       exact_filter=exact_ranges)
        return self.merge(ds.map_batches(to_deletes, batch_format="pyarrow"),
                          job_id=job_id)

    def update_where(self, predicate, set_fn, *, lsn: int,
                     predicate_ranges=None, exact_ranges: bool = False,
                     job_id: str | None = None) -> int:
        """UPDATE ... SET ... WHERE — completes the DML family (append /
        delete_where / merge). Matched rows are read once (zone-pruned
        scan, ALL columns — the replacement row must be whole),
        transformed by ``set_fn(batch) -> batch`` (same schema, any
        non-key values changed), and re-enter the normal MERGE upsert
        path: the old version is DV-deleted by key, the new row appends
        — batch-atomic visibility, last-writer-wins, idempotent resume
        all hold unchanged. The reference expresses updates only as CDC
        delete+insert pairs (moonlink_sink.rs); this derives them from
        a predicate instead of a wire stream.

        Key columns MUST be unchanged by ``set_fn`` — the upsert
        deletes by the NEW key, so a mutated key would orphan the old
        row. Checked per batch, loud ValueError. ``predicate_ranges`` /
        ``exact_ranges`` follow delete_where's contract (the hint must
        cover the predicate's true region)."""
        self._assert_writable("update_where")
        import pyarrow.compute as pc

        from moonray.identity import key_cols_of

        m = self.manifest()
        kcols = key_cols_of(m)
        if not kcols:
            raise ValueError("identity='none' tables are append-only; "
                             "update_where is not allowed")
        if m.get("identity") == "full_row":
            raise ValueError("identity='full_row' rows have no non-key "
                             "columns to update; use delete_where + append")
        schema = self.schema()

        def to_upserts(b: pa.Table) -> pa.Table:
            mask = predicate(b)
            if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
                import numpy as np

                mask = pa.array(np.asarray(mask, dtype=bool))
            hit = b.filter(mask)
            new = set_fn(hit)
            if len(new) != len(hit):
                raise ValueError("set_fn must return exactly the rows it "
                                 f"was given ({len(hit)} in, {len(new)} out)")
            for kc in kcols:
                if not (len(hit) == 0
                        or pc.all(pc.equal(new[kc], hit[kc])).as_py()):
                    raise ValueError(
                        f"set_fn mutated key column {kc!r}: the upsert "
                        "deletes by the NEW key and would orphan the old "
                        "row. Delete + insert explicitly instead.")
            n = len(new)
            cols = {"op": pa.array(["I"] * n, pa.string()),
                    "lsn": pa.array([lsn] * n, pa.int64())}
            for f in schema:
                cols[f.name] = new[f.name].cast(f.type)
            return pa.table(cols)

        to_upserts.__name__ = "predicate_updates"
        ds = self.scan(predicate_ranges=predicate_ranges,
                       exact_filter=exact_ranges)
        return self.merge(ds.map_batches(to_upserts, batch_format="pyarrow"),
                          job_id=job_id)

    def update_range(self, ranges: dict, set_values: dict, *, lsn: int,
                     job_id: str | None = None) -> int:
        """UPDATE rows inside closed per-column ranges to constant
        values — the safe primary form of ``update_where``: predicate
        and pruning hint derive from one ``{col: (lo, hi)}`` spec (like
        ``delete_range``), and ``set_values`` is a plain
        ``{col: constant}`` dict, so the key-immutability guard is
        checkable up front. The jobs CLI ``update-range`` wraps this."""
        import pyarrow.compute as pc

        from moonray.identity import key_cols_of

        if not ranges:
            raise ValueError("empty ranges would be an unconditional "
                             "full-table update; refuse")
        if not set_values:
            raise ValueError("set_values is empty — nothing to update")
        bad = set(set_values) & set(key_cols_of(self.manifest()))
        if bad:
            raise ValueError(f"set_values touches key columns {sorted(bad)}")
        schema = self.schema()
        missing = set(set_values) - set(schema.names)
        if missing:
            raise ValueError(f"unknown columns {sorted(missing)}")
        ranges = {c: (lo, hi) for c, (lo, hi) in ranges.items()}

        def pred(b, ranges=ranges):
            mask = None
            for c, (lo, hi) in ranges.items():
                m = pc.and_(pc.greater_equal(b[c], lo),
                            pc.less_equal(b[c], hi))
                mask = m if mask is None else pc.and_(mask, m)
            return mask

        def set_fn(b, sv=dict(set_values)):
            for c, val in sv.items():
                f = schema.field(c)
                b = b.set_column(b.column_names.index(c), c,
                                 pa.array([val] * len(b), f.type))
            return b

        return self.update_where(pred, set_fn, lsn=lsn,
                                 predicate_ranges=ranges, exact_ranges=True,
                                 job_id=job_id)

    def delete_range(self, ranges: dict, *, lsn: int,
                     job_id: str | None = None) -> int:
        """DELETE rows inside closed per-column ranges — the safe
        primary form of ``delete_where``: the predicate AND the zone
        pruning hint derive from the same ``{col: (lo, hi)}`` spec, so
        they cannot disagree (a hand-passed hint narrower than the
        predicate silently leaves rows undeleted). The jobs CLI
        ``delete-range`` is a thin wrapper over this."""
        import pyarrow.compute as pc

        if not ranges:
            raise ValueError("empty ranges would be an unconditional "
                             "full-table delete; refuse")
        ranges = {c: (lo, hi) for c, (lo, hi) in ranges.items()}

        def pred(b, ranges=ranges):
            mask = None
            for c, (lo, hi) in ranges.items():
                m = pc.and_(pc.greater_equal(b[c], lo),
                            pc.less_equal(b[c], hi))
                mask = m if mask is None else pc.and_(mask, m)
            return mask

        return self.delete_where(pred, lsn=lsn, columns=tuple(ranges),
                                 predicate_ranges=ranges, exact_ranges=True,
                                 job_id=job_id)

    def restore(self, version: int, *, job_id: str | None = None) -> int:
        """ROLLBACK to an earlier retained snapshot (Iceberg
        rollback-to-snapshot / Delta RESTORE): commits a NEW version
        whose logical state — fragments, DV refs, index, schema,
        column defaults — is the old version's, byte-for-byte. History
        stays linear and append-only: the bad commits remain time-
        travelable until expiry, and the restored state's files are
        re-referenced by the new head so expire_snapshots keeps them.
        ``commit_lsn`` never goes backwards (it keeps the current
        head's — LSN-visible reads must stay monotone). The commit op
        is ``restore``: the changelog surfaces it as a FULL replacement
        (delete every parent-live row, insert every restored-live row)
        because fragment diffing would miss rows a DV-shrink
        resurrects."""
        self._assert_writable("restore")
        job_id = job_id or new_job_id()
        prev = mf.find_version_by_job(self.root, job_id)
        if prev is not None:
            return prev
        cur = self.manifest()
        old = self.manifest(version)  # raises if expired
        if old["version"] == cur["version"]:
            return cur["version"]
        m = {
            "version": cur["version"] + 1,
            "parent": cur["version"],
            "op": "restore",
            "commit_lsn": cur["commit_lsn"],
            "job_id": job_id,
            "key_col": old["key_col"],
            "key_cols": old.get("key_cols"),
            "identity": old.get("identity", "keys"),
            "zone_cols": old["zone_cols"],
            "index": {"num_partitions": old["index"]["num_partitions"],
                      "partitions": {p: list(v) for p, v in
                                     old["index"]["partitions"].items()}},
            "fragments": [dict(f) for f in old["fragments"]],
            "rows_per_fragment": old["rows_per_fragment"],
            "schema_ipc": old["schema_ipc"],
            "column_defaults": dict(old.get("column_defaults", {})),
            "stats": {"restored_from": old["version"]},
            **({"cloned_from": cur["cloned_from"]}
               if "cloned_from" in cur else {}),
        }
        return mf.commit_manifest(self.root, m)

    def stream_begin(self, xid: str):
        """Open a streaming transaction (multi-batch xact staged outside
        the table; commit folds atomically, abort discards — reference:
        transaction_stream.rs). Returns a StreamTransaction."""
        self._assert_writable("stream_begin")
        from moonray.stream import StreamTransaction

        return StreamTransaction(self, xid)

    def optimize(self, mode: str = "data", **kw) -> int:
        """optimize(mode ∈ {data, index, full}) — mirrors the reference RPC
        ``optimize_table`` (src/moonlink_backend/src/lib.rs:353-384)."""
        self._assert_writable("optimize")
        from moonray import maintenance

        if mode == "data":
            return maintenance.compact(self, **kw)
        if mode == "index":
            return maintenance.merge_index(self, **kw)
        if mode == "full":
            v = maintenance.compact(self, force_full=True, **kw)
            return maintenance.merge_index(self)
        raise ValueError(f"unknown optimize mode {mode!r}")

    def cluster(self, cols=None, **kw) -> int:
        self._assert_writable("cluster")
        from moonray import maintenance

        return maintenance.cluster(self, cols=cols, **kw)

    def vacuum(self, *, grace_seconds: float = 86400.0,
               dry_run: bool = False) -> dict:
        """Orphan-file GC (Delta VACUUM / Iceberg remove-orphan-files
        analogue — vacuum.py): delete artifact files no retained
        version references (crashed pre-commit jobs, interrupted index
        builds). Referenced files of EVERY retained version — time
        travel, tags, pins, clone sources — stay."""
        from moonray.vacuum import vacuum_table

        return vacuum_table(self, grace_seconds=grace_seconds,
                            dry_run=dry_run)

    def build_column_index(self, col: str, *, fpp: float | None = None) -> dict:
        """(Re)build the per-fragment bloom index for a NON-key column
        (Delta bloom file index / Iceberg puffin stats analogue —
        colindex.py). scan(predicate_in={col: ...}) then drops
        fragments that provably lack every queried value. Incremental:
        only fragments without a sidecar are read."""
        from moonray import colindex

        return colindex.build_bloom_index(self, col, fpp=fpp)

    def maintenance_due(self, **kw) -> dict:
        """Which background-maintenance passes the reference's trigger
        policy would fire right now (metadata-only; see
        maintenance.maintenance_due for the thresholds)."""
        from moonray import maintenance

        return maintenance.maintenance_due(self.manifest(), **kw)

    def maintain_if_needed(self, *, expire_keep_last: int | None = None,
                           refresh_column_indexes: bool = True,
                           **kw) -> dict:
        """The engine-side analogue of the reference's background
        maintenance loop (500 ms tick evaluating compaction/index-merge
        triggers, table_handler_timer.rs:17-23 +
        snapshot_maintenance.rs:42-199): evaluate the thresholds against
        the current manifest and run exactly the passes that are due.
        Call after merge commits (or on any cadence). Returns the
        trigger evaluation plus the actions taken."""
        due = self.maintenance_due(**kw)
        actions = []
        if due["compact"]:
            self.optimize("data")
            actions.append("compact")
        if due["index_merge"]:
            self.optimize("index")
            actions.append("index_merge")
        if due["cluster"]:
            # after compact, so freshly-consolidated fragments sort too
            self.cluster(scope="incremental")
            actions.append("cluster_incremental")
        core_actions = list(actions)
        if refresh_column_indexes:
            # AFTER compact/cluster so their freshly-written fragments
            # are indexed too; incremental — only sidecar-less
            # fragments read, prior fpp kept, no-op ticks publish
            # nothing
            from moonray import colindex

            for col in colindex.list_indexed_columns(self.root):
                s = self.build_column_index(col, fpp=None)
                if s["built"] or s["gc_sidecars"]:
                    actions.append(
                        f"colindex({col}:+{s['built']}"
                        f"/-{s['gc_sidecars']})")
        # expiry fires only on CORE maintenance (compact/index/cluster)
        # — a colindex refresh after every merge must not trim the
        # time-travel horizon
        if core_actions and expire_keep_last is not None:
            self.expire_snapshots(keep_last=expire_keep_last)
            actions.append(f"expire(keep_last={expire_keep_last})")
        return {**due, "actions": actions, "version": self.latest_version()}

    def duckdb_view(self, con, name: str, version: int | None = None) -> str:
        """Register this table's snapshot as a DuckDB view — the
        reference's headline consumption path (union read of parquet +
        deletion vectors served to DuckDB/DataFusion,
        src/moonlink/src/storage/mooncake_table/snapshot_read.rs:152-241,
        src/moonlink_datafusion/src/table_provider.rs:226-253, where DVs
        become a parquet RowSelection). Here: a read_parquet view over
        the live fragments with an anti-join against the DV offsets
        (exact row-level exclusion via the persisted ``_rowoff``)."""
        import re

        import numpy as np

        from moonray.dv import load_dv_union

        if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            raise ValueError(f"view name must be a plain identifier: {name!r}")
        m = self.manifest(version)
        frags = [f for f in m["fragments"] if f["dv_count"] < f["rows"]]
        user_schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema_ipc"])))
        cols = ", ".join(f'"{c}"' for c in user_schema.names)
        if not frags:
            con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
                    f"(SELECT 1) WHERE 1=0")
            return name
        from moonray.filecache import data_path

        paths = [data_path(self.root, f["path"]) for f in frags]
        # single quotes doubled: a quote in the table root must not break
        # (or inject into) the view SQL
        path_sql = "[" + ", ".join("'" + p.replace("'", "''") + "'"
                                   for p in paths) + "]"
        # vectorized DV relation: concat per-fragment offset arrays +
        # repeat each filename by its DV length (no per-offset Python
        # loop). Filenames must match read_parquet's filename=true
        # column, i.e. the data_path-RESOLVED path (worker-cache path on
        # remote roots), not the raw root join.
        dv_offs, dv_names, dv_lens = [], [], []
        for f, p in zip(frags, paths):
            rels = dv_paths_of(f)
            if rels:
                offs = load_dv_union(self.root, rels)
                if len(offs):
                    dv_offs.append(offs)
                    dv_names.append(p)
                    dv_lens.append(len(offs))
        if dv_offs:
            dv_tbl = pa.table({
                "filename": pa.array(np.repeat(np.array(dv_names, dtype=object),
                                               dv_lens), pa.string()),
                "_rowoff": pa.array(np.concatenate(dv_offs).astype(np.uint32)),
            })
            con.register(f"{name}__dv", dv_tbl)
            con.sql(f"""
                CREATE OR REPLACE VIEW {name} AS
                SELECT {cols}
                FROM read_parquet({path_sql}, filename=true) t
                WHERE NOT EXISTS (
                  SELECT 1 FROM {name}__dv d
                  WHERE d.filename = t.filename AND d._rowoff = t._rowoff)
            """)
        else:
            con.sql(f"CREATE OR REPLACE VIEW {name} AS SELECT {cols} "
                    f"FROM read_parquet({path_sql})")
        return name

    # ---------------- read path ----------------
    def version_as_of(self, ts: float) -> int:
        """Timestamp time travel (Iceberg snapshot-as-of-timestamp
        analogue): the latest retained version whose commit wall-clock
        is ≤ ``ts`` (epoch seconds). Versions predating the
        committed_at field count as arbitrarily old — but only BEFORE
        the first timestamped version: after one, the scan stops at the
        first version whose committed_at exceeds ts OR is missing
        (mixed-version writers; commit order bounds its real time from
        below but not above), so an early ts can never resolve to a
        newer version."""
        best, seen_ts = None, False
        for v in self.versions():
            at = self.manifest(v).get("committed_at")
            if at is None:
                if seen_ts:
                    break
            elif at > ts:
                break
            else:
                seen_ts = True
            best = v
        if best is None:
            raise ValueError(f"no version committed at or before {ts}")
        return best

    def scan(self, version: int | None = None, *, columns=None,
             predicate_ranges: dict | None = None,
             predicate_in: dict | None = None, exact_filter: bool = False,
             with_internal: bool = False,
             concurrency=None, as_of: float | None = None,
             ref: str | None = None, use_column_index: bool = True):
        """Snapshot-isolated scan → lazy Dataset.

        - zone-map pruning: fragments whose min/max don't overlap
          ``predicate_ranges`` {col: (lo, hi)} are never read;
        - column pruning at the parquet read;
        - per-fragment DV filtering inside the read tasks (zero-copy
          Arrow; each task loads only its own DV deltas);
        - ``as_of`` (epoch seconds) resolves the version by commit
          timestamp when ``version`` is not given.
        ``predicate_ranges`` alone prunes fragments only — callers apply
        the exact row filter downstream. With ``exact_filter=True`` the
        inclusive range filter is ALSO pushed into the read tasks:
        parquet row-group stats prune inside surviving fragments and
        non-matching rows (payload included) never leave the read. The
        ranged columns needn't be in ``columns`` — they're read for the
        in-task filter and dropped before the block is emitted.
        ``predicate_in`` {col: [v, ...]} is an IN-list predicate: zone
        maps and row-group stats prune by min/max containment, and the
        exact ``is_in`` filter ALWAYS runs in-task (stats can't prove
        equality), so its semantics don't depend on exact_filter."""
        import ray.data as rd

        if ref is not None:
            if version is not None:
                raise ValueError("pass either version= or ref=, not both")
            version = self.ref_version(ref)
        if version is None and as_of is not None:
            version = self.version_as_of(as_of)
        m = self.manifest(version)
        frags = m["fragments"]
        bloom_info = None
        user_schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema_ipc"])))
        # two predicate domains (moonray/types.py): zone maps persist
        # extended types as order-preserving JSON primitives, so
        # PRUNING compares encoded bounds, while the in-task Arrow
        # kernels get natural Python values. For int/float/string
        # columns both transforms are identity.
        from moonray import types as _ty

        if predicate_ranges:
            predicate_ranges = _ty.normalize_ranges(predicate_ranges,
                                                    user_schema)
            enc_ranges = _ty.encode_ranges(predicate_ranges, user_schema)
            frags = [f for f in frags if _zones_overlap(f["zones"], enc_ranges)]
        if predicate_in:
            predicate_in = _ty.normalize_in(predicate_in, user_schema)
            enc_in = _ty.encode_in(predicate_in, user_schema)
            frags = [f for f in frags
                     if _zones_contain_any(f["zones"], enc_in)]
            if use_column_index and frags:
                # bloom-sidecar pruning (build_column_index): drops
                # fragments that PROVABLY lack every queried value, and
                # hands read tasks the per-row-group consult plan so
                # they also skip non-matching row groups INSIDE kept
                # fragments; conservative — unindexed fragments/columns
                # all keep, and the in-task is_in filter still runs
                from moonray import colindex

                frags, bloom_info = colindex.scan_plan(
                    self.root, frags, predicate_in, user_schema)
        frags = [f for f in frags if f["dv_count"] < f["rows"]]
        if not frags:
            cols = columns or user_schema.names
            empty = pa.table({c: pa.array([], user_schema.field(c).type) for c in cols})
            return rd.from_arrow(empty)
        read_cols = (list(dict.fromkeys(columns)) if columns
                     else [x for x in user_schema.names])
        ranges = in_sets = None
        drop_after = ()
        if exact_filter and predicate_ranges:
            ranges = {c: b for c, b in predicate_ranges.items()
                      if c in user_schema.names}
        if predicate_in:
            in_sets = {c: list(v) for c, v in predicate_in.items()
                       if c in user_schema.names}
        filter_cols = list(ranges or {}) + list(in_sets or {})
        drop_after = tuple(c for c in dict.fromkeys(filter_cols)
                           if c not in read_cols)
        read_cols = read_cols + list(drop_after)
        read_schema = pa.schema([user_schema.field(c) for c in read_cols])
        src = FragmentDatasource(self.root, frags, read_schema,
                                 m.get("column_defaults", {}), with_internal,
                                 ranges=ranges, in_sets=in_sets,
                                 drop_after=drop_after,
                                 bloom_info=bloom_info if in_sets else None)
        # block target: at least ~2 tasks per CPU when row-group splits
        # allow it, never fewer than one task per fragment — compaction
        # can consolidate files without capping scan parallelism
        import ray

        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        max_tasks = sum(-(-f["rows"] // f["rg_rows"]) if f.get("rg_rows") else 1
                        for f in frags)
        nblocks = min(max(len(frags), 2 * cpus), max(1, max_tasks))
        return rd.read_datasource(src, override_num_blocks=nblocks,
                                  concurrency=concurrency)

    def lookup(self, keys, *, columns=None, version=None) -> pa.Table:
        """Batch point-read by primary key, served from the persisted
        key index: O(touched index partitions + touched fragments),
        never a table scan. The analogue of the reference's GlobalIndex
        batch lookup (src/moonlink/src/storage/index/hash_index.rs:392)
        and its object-store-served variant
        (src/moonlink/src/storage/index/index_s3/): index partitions,
        DV deltas and fragments are all read through the worker file
        cache, so lookups work identically on a remote
        (``scheme://``) root. Superseded/deleted rows are excluded by
        the same live-fragment + DV filters the MERGE probe applies.

        ``keys``: list of key values (tuples for composite-key tables).
        Intended for bounded key sets — a serving/point-read path run
        driver-side with a thread pool; use merge()/scan() for bulk.
        Returns a pyarrow Table (row order unspecified)."""
        import numpy as np
        import pyarrow.compute as pc
        from concurrent.futures import ThreadPoolExecutor

        from moonray.dv import load_dv_union
        from moonray.filecache import data_path
        from moonray.identity import CKEY, encode_key_column, key_cols_of
        from moonray.util import hash_key_array

        m = self.manifest(version)
        key_col = m["key_col"]
        if key_col is None:
            raise ValueError(
                "identity='none' (append-only) tables keep no key index; "
                "use scan() with a predicate instead")
        user_schema = pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(m["schema_ipc"])))
        kcols = key_cols_of(m)
        keys = list(keys)
        read_cols = (list(dict.fromkeys(columns)) if columns
                     else list(user_schema.names))
        read_schema = pa.schema([user_schema.field(c) for c in read_cols])
        if not keys or not m["fragments"]:
            return pa.table({c: pa.array([], read_schema.field(c).type)
                             for c in read_cols})
        if key_col == CKEY:
            probe_tbl = pa.table({
                c: pa.array([k[i] for k in keys], user_schema.field(c).type)
                for i, c in enumerate(kcols)})
            probe = encode_key_column(probe_tbl, kcols)
        else:
            probe = pa.array(keys, user_schema.field(key_col).type)
        if isinstance(probe, pa.ChunkedArray):
            probe = probe.combine_chunks()
        P = m["index"]["num_partitions"]
        parts = (hash_key_array(probe) % np.uint64(P)).astype(np.int64)
        frag_meta = {f["id"]: f for f in m["fragments"]}
        live_arr = pa.array(list(frag_meta), pa.string())

        def probe_part(p: int) -> tuple[np.ndarray, np.ndarray]:
            keyset = probe.filter(pa.array(parts == p))
            frag_parts, off_parts = [], []
            for rel in m["index"]["partitions"].get(str(p), []):
                idx = pq.read_table(data_path(self.root, rel))
                hit = idx.filter(pc.and_(
                    pc.is_in(idx[key_col], value_set=keyset),
                    pc.is_in(idx["_frag"], value_set=live_arr)))
                if len(hit):
                    frag_parts.append(np.asarray(hit["_frag"].combine_chunks()))
                    off_parts.append(np.asarray(hit["_off"].combine_chunks()))
            if not frag_parts:
                return np.array([], dtype=object), np.array([], dtype=np.uint32)
            return np.concatenate(frag_parts), np.concatenate(off_parts)

        with ThreadPoolExecutor(max_workers=8) as ex:
            hits = list(ex.map(probe_part, np.unique(parts)))
        frags_np = np.concatenate([h[0] for h in hits])
        offs_np = np.concatenate([h[1] for h in hits])

        def read_frag(frag: str) -> pa.Table | None:
            # stale index entries may point at DV'd (superseded) offsets
            offs = np.unique(offs_np[frags_np == frag]).astype(np.uint32)
            f = frag_meta[frag]
            dv = load_dv_union(self.root, dv_paths_of(f))
            offs = np.setdiff1d(offs, dv, assume_unique=True)
            if not len(offs):
                return None
            rg = f.get("rg_rows")
            if rg:
                # point read: ROWOFF is file-positional (0..n-1 in write
                # order), so hit offsets map straight to row groups —
                # read ONLY those (the reference's
                # equals_parquet_at_offset point read,
                # src/moonlink/src/row/moonlink_row.rs:214-248); a 10-key
                # lookup on 512 MiB image fragments must not read GiBs.
                groups = np.unique(offs // np.uint32(rg)).astype(np.int64)
                runs = np.flatnonzero(np.r_[True, np.diff(groups) != 1])
                spans = [(int(groups[s]), int(groups[e - 1]) + 1)
                         for s, e in zip(runs, np.r_[runs[1:], len(groups)])]
                t = pa.concat_tables([
                    _read_fragment(self.root, f["path"], [], read_schema,
                                   m.get("column_defaults", {}), True,
                                   rg_span=sp)
                    for sp in spans])
            else:
                t = _read_fragment(self.root, f["path"], [], read_schema,
                                   m.get("column_defaults", {}), True)
            t = t.filter(pc.is_in(t[ROWOFF], value_set=pa.array(offs)))
            return t.select(read_cols)

        with ThreadPoolExecutor(max_workers=8) as ex:
            pieces = [t for t in ex.map(read_frag, set(frags_np.tolist()))
                      if t is not None]
        if not pieces:
            return pa.table({c: pa.array([], read_schema.field(c).type)
                             for c in read_cols})
        return pa.concat_tables(pieces)

    def changes(self, from_version: int, to_version: int | None = None):
        """Changelog read (CDC out): the logical row changes committed
        in ``(from_version, to_version]``, as a lazy Dataset with
        ``change_type`` ('insert' | 'delete') and ``commit_version``
        columns. Updates appear as delete + insert — the same
        decomposition this engine applies on CDC-in (reference upsert =
        delete_if_exists + append). Maintenance and ALTER commits are
        data-preserving rewrites and contribute nothing (commit ``op``
        kinds, like Iceberg snapshot summary operations).

        Cost is O(changed rows), never a table scan: inserts read only
        fragments born in a step; deletes read only the row offsets
        named by the step's new DV delta files (plus fragments the step
        dropped as fully dead) — the incremental-read story of Delta
        CDF / Iceberg incremental scans, derived purely from moonray's
        own commit metadata. Every manifest in the range must still be
        un-expired."""
        import ray.data as rd

        to_version = (self.latest_version() if to_version is None
                      else to_version)
        if to_version < from_version:
            raise ValueError(f"to_version {to_version} < from_version "
                             f"{from_version}")
        head = self.manifest(to_version)
        user_schema = pa.ipc.read_schema(
            pa.py_buffer(bytes.fromhex(head["schema_ipc"])))
        defaults = head.get("column_defaults", {})
        units: list[dict] = []
        for v in range(from_version + 1, to_version + 1):
            child = self.manifest(v)
            if child.get("op", "append") in ("maintenance", "alter"):
                continue
            parent = self.manifest(child["parent"])
            pfr = {f["id"]: f for f in parent["fragments"]}
            cfr = {f["id"]: f for f in child["fragments"]}
            if child.get("op") == "restore":
                # rollback commit: full replacement — fragment diffing
                # would miss rows that a DV SHRINK resurrects. Entries
                # identical on both sides (same id + same DV refs)
                # contribute nothing and are skipped.
                same = {fid for fid, f in pfr.items()
                        if fid in cfr
                        and dv_paths_of(f) == dv_paths_of(cfr[fid])}
                for fid, f in pfr.items():
                    if fid not in same:
                        units.append({"kind": "delete", "path": f["path"],
                                      "dv": dv_paths_of(f), "v": v})
                for fid, f in cfr.items():
                    if fid not in same:
                        units.append({"kind": "insert", "path": f["path"],
                                      "dv": dv_paths_of(f), "v": v})
                continue
            for fid, f in cfr.items():
                if fid not in pfr:
                    units.append({"kind": "insert", "path": f["path"],
                                  "dv": [], "v": v})
            for fid, f in pfr.items():
                c = cfr.get(fid)
                if c is None:
                    # fully-dead drop: every row still live at the
                    # parent died in this step
                    units.append({"kind": "delete", "path": f["path"],
                                  "dv": dv_paths_of(f), "v": v})
                else:
                    old = set(dv_paths_of(f))
                    new_rels = [r for r in dv_paths_of(c) if r not in old]
                    if new_rels:
                        units.append({"kind": "delete_offsets",
                                      "path": f["path"], "dv": new_rels,
                                      "v": v})
        out_schema = pa.schema(
            list(user_schema)
            + [pa.field("change_type", pa.string()),
               pa.field("commit_version", pa.int64())])
        if not units:
            return rd.from_arrow(pa.table(
                {f.name: pa.array([], f.type) for f in out_schema}))
        root = self.root

        def read_unit(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            from moonray.dv import load_dv_union

            pieces = []
            for u in batch.to_pylist():
                kind = u["kind"]
                if kind == "insert":
                    # dv is [] for born-in-step fragments; restore
                    # inserts carry the restored state's DV refs
                    t = _read_fragment(root, u["path"], list(u["dv"]),
                                       user_schema, defaults, False)
                    ct = "insert"
                elif kind == "delete":
                    # rows live at the parent (old DV filtered out)
                    t = _read_fragment(root, u["path"], list(u["dv"]),
                                       user_schema, defaults, False)
                    ct = "delete"
                else:  # delete_offsets: rows named by this step's deltas
                    t = _read_fragment(root, u["path"], [], user_schema,
                                       defaults, True)
                    offs = load_dv_union(root, list(u["dv"]))
                    t = t.filter(pc.is_in(t[ROWOFF],
                                          value_set=pa.array(offs)))
                    t = t.select(user_schema.names)
                    ct = "delete"
                t = t.append_column("change_type",
                                    pa.array([ct] * len(t), pa.string()))
                t = t.append_column("commit_version",
                                    pa.array([u["v"]] * len(t), pa.int64()))
                pieces.append(t)
            return pa.concat_tables(pieces)

        return rd.from_items(units, override_num_blocks=len(units)).map_batches(
            read_unit, batch_format="pyarrow", batch_size=1)

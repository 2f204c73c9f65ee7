"""Delta Lake sink: export a snapshot as a Delta-protocol table.

Re-expresses the reference's secondary Delta syncer
(src/moonlink/src/storage/table/deltalake/deltalake_table_syncer.rs —
per-snapshot Add/Remove action commits with parquet stats, flush LSN in
the commit metadata; table creation in .../utils.rs) without the
deltalake crate: we write the open Delta transaction-log protocol
directly (protocol v1: minReader 1 / minWriter 2 — plain parquet +
JSON actions, no column mapping / DV features), which any Delta reader
(Spark, delta-rs, DuckDB delta) consumes.

``dest`` must be a local or shared-mount path (source fragments may
live on a remote root — reads go through the worker file cache); an
object-store dest would swap the two ``os.replace`` publishes for
``commitstore.put`` blind PUTs (data files are content-named) plus a
conditional PUT of the next log entry, exactly the manifest commit
recipe in commitstore.py.

Incremental: each export diffs the snapshot against the files recorded
in the existing ``_delta_log`` and commits only Add/Remove actions —
the syncer's import/remove split. Deletion vectors are APPLIED during
export (a fragment whose DV changed re-exports under a new name):
Delta readers never see moonray's DV sidecars. Fragment rewrites run as
parallel Ray tasks, one per fragment, payload never touching the
driver.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa

from moonray.fragments import NBYTES, ROWOFF

_SPARK_TYPES = {
    "string": "string", "large_string": "string", "utf8": "string",
    "int64": "long", "int32": "integer", "int16": "short", "int8": "byte",
    "float": "float", "double": "double", "bool": "boolean",
    "binary": "binary", "large_binary": "binary",
    "date32[day]": "date",
}


def _spark_type(t: pa.DataType):
    if pa.types.is_timestamp(t):
        # Delta 'timestamp' is tz-adjusted; naive maps to
        # timestampNtz (reader feature since Delta 3.3)
        return "timestamp" if t.tz is not None else "timestampNtz"
    if pa.types.is_fixed_size_binary(t):
        return "binary"  # Delta has no fixed-width binary / uuid type
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return {"type": "array", "elementType": _spark_type(t.value_type),
                "containsNull": True}
    if pa.types.is_struct(t):
        return {"type": "struct", "fields": [
            {"name": f.name, "type": _spark_type(f.type), "nullable": True,
             "metadata": {}} for f in t]}
    if pa.types.is_map(t):
        return {"type": "map", "keyType": _spark_type(t.key_type),
                "valueType": _spark_type(t.item_type),
                "valueContainsNull": True}
    try:
        return _SPARK_TYPES[str(t)]
    except KeyError:
        raise ValueError(f"no Delta mapping for Arrow type {t}") from None


def _schema_string(schema: pa.Schema) -> str:
    return json.dumps({"type": "struct", "fields": [
        {"name": f.name, "type": _spark_type(f.type), "nullable": True,
         "metadata": {}} for f in schema]})


def _log_path(dest: str, v: int) -> str:
    return os.path.join(dest, "_delta_log", f"{v:020d}.json")


def _read_log_state(dest: str, up_to: int | None = None
                    ) -> tuple[int, dict[str, dict], str | None,
                               dict | None]:
    """Replay the existing _delta_log → (next log version,
    {data path: its add-action tags}, last logged schemaString,
    last logged protocol action).
    ``up_to``: stop AFTER commit ``up_to`` (Delta versionAsOf time
    travel — raises if that commit doesn't exist)."""
    if up_to is not None and not os.path.exists(_log_path(dest, up_to)):
        raise FileNotFoundError(
            f"no Delta commit {up_to} at {dest} (versionAsOf)")
    active: dict[str, dict] = {}
    v = 0
    schema_str = None
    protocol = None
    while os.path.exists(_log_path(dest, v)) \
            and (up_to is None or v <= up_to):
        with open(_log_path(dest, v)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    active[a["add"]["path"]] = a["add"]
                elif "remove" in a:
                    active.pop(a["remove"]["path"], None)
                elif "metaData" in a:
                    schema_str = a["metaData"]["schemaString"]
                elif "protocol" in a:
                    protocol = a["protocol"]
        v += 1
    return v, active, schema_str, protocol


def _uses_ntz(t) -> bool:
    """Whether a parsed Spark-schema type tree contains timestampNtz —
    checks TYPE positions only (a column merely NAMED 'timestampNtz'
    must not ratchet the protocol)."""
    if isinstance(t, str):
        return t == "timestampNtz"
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return any(_uses_ntz(f.get("type")) for f in t.get("fields", []))
        if kind == "array":
            return _uses_ntz(t.get("elementType"))
        if kind == "map":
            return _uses_ntz(t.get("keyType")) or _uses_ntz(t.get("valueType"))
    return False


def _needed_protocol(schema_str: str) -> dict:
    """The minimum Delta protocol for this schema. timestampNtz is a
    table feature (Delta spec: gated behind reader 3 / writer 7 with
    explicit readerFeatures/writerFeatures entries) — a (1,2) log that
    ships an NTZ column is rejected by spec-compliant engines. When
    upgrading to the features protocol, writerFeatures must also carry
    the features implied by the legacy writer version 2
    (appendOnly, invariants) per the table-features upgrade rule."""
    if _uses_ntz(json.loads(schema_str)):
        return {"minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["timestampNtz"],
                "writerFeatures": ["appendOnly", "invariants",
                                   "timestampNtz"]}
    return {"minReaderVersion": 1, "minWriterVersion": 2}


def _protocol_satisfies(logged: dict | None, needed: dict) -> bool:
    if logged is None:
        return False
    if logged.get("minReaderVersion", 0) < needed["minReaderVersion"] \
            or logged.get("minWriterVersion", 0) < needed["minWriterVersion"]:
        return False
    return (set(needed.get("readerFeatures", []))
            <= set(logged.get("readerFeatures", []))
            and set(needed.get("writerFeatures", []))
            <= set(logged.get("writerFeatures", [])))


def _export_name(frag: dict, schema_str: str) -> str:
    """Deterministic per (fragment, DV state, table schema): a changed
    DV or an ALTER TABLE re-exports under a new name (normalize fills
    the new columns), an unchanged fragment dedupes against the log."""
    import hashlib

    from moonray.dv import dv_paths_of

    state = hashlib.sha256(json.dumps(
        [sorted(dv_paths_of(frag)), schema_str]).encode()).hexdigest()[:12]
    return f"part-{frag['id']}-{state}.parquet"


def export_delta(table, dest: str, *, version: int | None = None) -> int:
    """Export the snapshot at ``version`` (default: latest) into the
    Delta table at ``dest``; returns the committed Delta log version.
    Repeated exports are incremental and idempotent (no new log entry
    when nothing changed)."""
    import ray

    m = table.manifest(version)
    os.makedirs(os.path.join(dest, "_delta_log"), exist_ok=True)
    next_v, active, logged_schema, logged_protocol = _read_log_state(dest)

    # the SNAPSHOT's schema (not the latest) — a pinned-version export
    # must ship the shape that version actually had
    schema = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema_ipc"])))
    schema_str = _schema_string(schema)
    defaults = m.get("column_defaults", {})

    live = {f["id"]: f for f in m["fragments"] if f["dv_count"] < f["rows"]}
    wanted = {_export_name(f, schema_str): f for f in live.values()}
    to_add = [f for name, f in wanted.items() if name not in active]
    to_remove = sorted(set(active) - set(wanted))
    schema_changed = logged_schema is not None and logged_schema != schema_str
    protocol = _needed_protocol(schema_str)
    protocol_upgrade = not _protocol_satisfies(logged_protocol, protocol)
    if next_v > 0 and not to_add and not to_remove and not schema_changed \
            and not protocol_upgrade:
        return next_v - 1  # unchanged snapshot → no empty commit

    root = table.root

    @ray.remote
    def export_frag(frag: dict) -> dict:
        import numpy as np
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from moonray.dv import load_dv_union
        from moonray.filecache import data_path
        from moonray.fragments import normalize_to_schema

        from moonray.dv import dv_paths_of

        t = pq.read_table(data_path(root, frag["path"]))
        dead = load_dv_union(root, dv_paths_of(frag))
        if len(dead):
            t = t.filter(pc.invert(pc.is_in(
                t[ROWOFF], value_set=pa.array(dead, t[ROWOFF].type))))
        t = normalize_to_schema(
            t.drop_columns([c for c in (ROWOFF, NBYTES)
                            if c in t.column_names]),
            schema, defaults)
        name = _export_name(frag, schema_str)
        tmp = os.path.join(dest, f".{name}.{uuid.uuid4().hex}.tmp")
        pq.write_table(t, tmp, compression="zstd")
        os.replace(tmp, os.path.join(dest, name))
        # exact per-file stats over the WRITTEN rows (DVs applied) for
        # JSON-representable columns — Delta readers file-prune on them
        mins, maxs, nulls = {}, {}, {}
        for field in t.schema:
            col = t[field.name]
            nulls[field.name] = col.null_count
            if t.num_rows == 0 or col.null_count == t.num_rows:
                continue
            if not (pa.types.is_integer(field.type)
                    or pa.types.is_floating(field.type)
                    or pa.types.is_string(field.type)
                    or pa.types.is_large_string(field.type)
                    or pa.types.is_boolean(field.type)):
                continue
            mm = pc.min_max(col)
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            # non-finite floats serialize as Infinity/NaN — invalid
            # strict JSON that spec-strict Delta readers reject; omit
            # the column's bounds instead (Delta writers do the same)
            import math

            if any(isinstance(x, float) and not math.isfinite(x)
                   for x in (lo, hi)):
                continue
            mins[field.name] = lo
            maxs[field.name] = hi
        return {"path": name, "size": os.path.getsize(os.path.join(dest, name)),
                "numRecords": t.num_rows, "frag": frag["id"],
                "minValues": mins, "maxValues": maxs, "nullCount": nulls}

    added = ray.get([export_frag.remote(f) for f in to_add])

    import time

    now_ms = int(time.time() * 1000)
    actions = []
    if next_v == 0 or protocol_upgrade:
        # first commit, or an ALTER introduced a type that needs a
        # higher protocol (e.g. a new naive-timestamp column on a
        # (1,2) table) — protocol actions only ever ratchet up
        actions.append({"protocol": protocol})
    if next_v == 0 or schema_changed:
        # ALTER TABLE → re-emit metaData (Delta metadata-update action);
        # every pre-ALTER file also re-exports (schema is part of the
        # export name), so log schema and parquet schemas always agree
        actions.append({"metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_str,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": now_ms,
        }})
    for a in added:
        actions.append({"add": {
            "path": a["path"], "size": a["size"], "partitionValues": {},
            "modificationTime": now_ms, "dataChange": True,
            "stats": json.dumps({"numRecords": a["numRecords"],
                                 "minValues": a["minValues"],
                                 "maxValues": a["maxValues"],
                                 "nullCount": a["nullCount"]}),
            "tags": {"moonray_frag": a["frag"],
                     "moonray_version": str(m["version"])},
        }})
    for p in to_remove:
        actions.append({"remove": {
            "path": p, "deletionTimestamp": now_ms, "dataChange": True}})
    # flush LSN rides the commit like the reference's
    # MOONCAKE_TABLE_FLUSH_LSN table property
    actions.append({"commitInfo": {
        "timestamp": now_ms, "operation": "WRITE",
        "operationParameters": {"mode": "Append"},
        "moonrayCommitLsn": m["commit_lsn"],
        "moonrayVersion": m["version"],
    }})
    tmp = _log_path(dest, next_v) + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    os.replace(tmp, _log_path(dest, next_v))
    return next_v


def read_delta_paths(dest: str) -> list[str]:
    """The active data files of the Delta table (log replay) — what a
    Delta reader would scan."""
    _, active, _, _ = _read_log_state(dest)
    return [os.path.join(dest, p) for p in sorted(active)]


_ARROW_OF_SPARK = {
    "string": pa.large_string(), "long": pa.int64(), "integer": pa.int32(),
    "short": pa.int16(), "byte": pa.int8(), "float": pa.float32(),
    "double": pa.float64(), "boolean": pa.bool_(),
    "binary": pa.large_binary(), "date": pa.date32(),
    "timestamp": pa.timestamp("us"),
}


def _stats_overlap(add: dict, ranges: dict) -> bool:
    """File-level add-action stats vs requested ranges — False only
    when the stats PROVE no row matches (files without stats always
    read; the pushed filter stays the source of truth)."""
    try:
        st = json.loads(add.get("stats") or "{}")
    except (TypeError, ValueError):
        return True
    mins, maxs = st.get("minValues") or {}, st.get("maxValues") or {}
    for col, (lo, hi) in ranges.items():
        if col not in mins or col not in maxs:
            continue
        if (lo is not None and maxs[col] < lo) or \
                (hi is not None and mins[col] > hi):
            return False
    return True


def read_delta_dataset(dest: str, *, columns=None, ranges=None,
                       version: int | None = None):
    """Delta table → lazy Dataset. The export applies DVs and writes
    plain protocol-v1 parquet, so the read is a straight distributed
    parquet scan over the log's active file set (column-pruned);
    only the tiny _delta_log replay happens on the driver. A table
    whose log replays to ZERO live files (everything deleted) is a
    valid empty table — the schema comes from the logged metaData
    action, not an error. ``ranges`` {col: (lo, hi)} prunes whole
    files via the add-actions' stats and pushes the exact inclusive
    filter into the parquet read (row-group pruning + row filtering;
    ranged columns needn't be projected). ``version`` = Delta
    versionAsOf time travel: replay the log only through that commit
    (the Iceberg reader's ``snapshot_id=`` analogue)."""
    import ray.data

    _, active, schema_str, _ = _read_log_state(dest, up_to=version)
    if schema_str is None:
        raise FileNotFoundError(f"no Delta table at {dest}")
    keep = sorted(active)
    expr = None
    if ranges:
        import pyarrow.dataset as pads

        # only columns in the logged schema participate — unknown names
        # are ignored (consistent with MoonrayTable.scan), never pushed
        # into the parquet read where pyarrow would fail the workers
        known = {f["name"] for f in json.loads(schema_str)["fields"]}
        ranges = {c: b for c, b in ranges.items() if c in known}
        keep = [p for p in keep if _stats_overlap(active[p], ranges)]
        for col, (lo, hi) in ranges.items():
            for bound, mk in ((lo, lambda f, b: f >= b),
                              (hi, lambda f, b: f <= b)):
                if bound is None:
                    continue
                part = mk(pads.field(col), bound)
                expr = part if expr is None else expr & part
    if not keep:
        fields = json.loads(schema_str)["fields"]
        if columns is not None:
            fields = [f for f in fields if f["name"] in set(columns)]
        empty = pa.table({f["name"]: pa.array(
            [], (_ARROW_OF_SPARK.get(f["type"], pa.large_string())
                 if isinstance(f["type"], str) else pa.null()))
            for f in fields})
        return ray.data.from_arrow(empty)
    paths = [os.path.join(dest, p) for p in keep]
    kw = {"filter": expr} if expr is not None else {}
    return ray.data.read_parquet(paths, columns=columns, **kw)


def vacuum_delta(dest: str) -> dict:
    """Remove data files no longer referenced by the log replay — the
    Delta VACUUM analogue for this single-writer export (no tombstone
    retention window needed: the one writer is the only committer, and
    readers of a pinned older log version re-export rather than rely on
    removed files). The log itself is never touched."""
    _, active, schema_str, _ = _read_log_state(dest)
    if schema_str is None:
        raise FileNotFoundError(f"no Delta table at {dest}")
    removed = 0
    for name in os.listdir(dest):
        if not name.endswith(".parquet") or name in active:
            continue
        os.remove(os.path.join(dest, name))
        removed += 1
    return {"removed_files": removed, "active_files": len(active)}

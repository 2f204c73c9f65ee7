"""HTTP control surface — the reference's REST API shim
(src/moonlink_service/src/rest_api.rs:407-423) over MoonrayCatalog /
MoonrayTable, stdlib-only (ThreadingHTTPServer):

    GET    /health                      liveness
    GET    /tables                      registry listing
    POST   /tables/{t}                  create (schema, key_col/key_cols/identity, ...)
    DELETE /tables/{t}                  drop
    GET    /schema/{t}                  column name/type pairs
    POST   /ingest/{t}                  {"operation": insert|upsert|delete,
                                         "data": row-object | [row-objects],
                                         "request_mode": sync|async}
                                        (rest_api.rs:1073-1075 op set;
                                        async = durable event-WAL buffering,
                                        rest_api.rs:60-66 + wal.rs — see
                                        moonray/wal.py)
    POST   /ingestpb/{t}                same, data = base64 MoonlinkRow
                                        protobuf datum(s) (rest_api.rs:417)
    POST   /upload/{t}                  {"operation": insert|upsert,
                                         "files": [parquet paths]}
    POST   /otel/{t}                    OTLP-JSON ExportMetricsServiceRequest
                                        → append-only point rows (metrics
                                        endpoint analogue, otel/service.rs)
    POST   /kafka/{t}/schema            register Avro schema (creates table)
    POST   /kafka/{t}/ingest            {"records": [base64 Avro datums]}
    POST   /tables/{t}/optimize         {"mode": data|index|full}
    POST   /tables/{t}/cluster          {"cols": [...], "curve": z|hilbert}
    POST   /tables/{t}/snapshot         force snapshot (flush analogue)
    POST   /tables/{t}/flush            same
    POST   /tables/{t}/maintain         engine-trigger maintenance pass
    POST   /tables/{t}/expire           {"keep_last": N}
    GET    /tables/{t}                  describe
    GET    /tables/{t}/history          version history
    GET    /tables/{t}/scan?version=&columns=&limit=   rows as JSON (capped)
    GET    /tables/{t}/scanplan?version=|lsn=&pin=1    union-read state:
                                        fragment paths + DV delta paths +
                                        schema (scan_table_begin analogue —
                                        SQL engines read the files directly)
    POST   /tables/{t}/scan_end         {"token": ...} release a scanplan pin
    POST   /tables/{t}/vacuum           {"grace_seconds": s, "dry_run": b}
    POST   /tables/{t}/colindex         {"col": ..., "fpp": p} bloom index
    POST   /tables/{t}/analyze          {"columns": [...]} column profile
    POST   /tables/{t}/validate         {"unique": [...], "not_null": [...],
                                         "ranges": {...}, "in_set": {...}}
                                        → {"ok": bool, "constraints": [...]}

One service process per warehouse = the single writer the engine
assumes (the reference likewise funnels all writes through one
TableHandler per table). LSNs for /ingest are assigned monotonically
from the table's commit_lsn.

Run:  python -m moonray.service --warehouse /wh --port 8642
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pyarrow as pa

_TYPES = {
    "string": pa.string(), "int32": pa.int32(), "int64": pa.int64(),
    "float32": pa.float32(), "float64": pa.float64(),
    "binary": pa.binary(), "bool": pa.bool_(),
    # pyarrow's own type spellings (str(pa.float64()) == "double"), so a
    # schema echoed from GET /schema/{t} round-trips into create
    "double": pa.float64(), "float": pa.float32(), "utf8": pa.string(),
    "large_string": pa.large_string(), "large_binary": pa.large_binary(),
}
_NAME_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_\-]*")
MAX_SCAN_ROWS = 10_000


def _json_rows(rows):
    for r in rows:  # binary columns aren't JSON-serializable
        for k, v in list(r.items()):
            if isinstance(v, (bytes, bytearray)):
                r[k] = {"__bytes__": len(v)}
    return rows


def schema_from_json(pairs) -> pa.Schema:
    fields = []
    for col, typ in pairs:
        if typ not in _TYPES:
            raise ValueError(f"unknown type {typ!r}; one of {sorted(_TYPES)}")
        fields.append(pa.field(col, _TYPES[typ]))
    return pa.schema(fields)


class ServiceError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


class MoonrayService:
    """Route handlers over a catalog; transport-agnostic (the HTTP
    handler below and tests call these directly)."""

    def __init__(self, warehouse: str, wal_autoflush: int = 64):
        from moonray.catalog import MoonrayCatalog
        from moonray.iceberg_catalog import IcebergCatalogRegistry

        self.catalog = MoonrayCatalog(warehouse)
        # Iceberg REST catalog registry (spec routes under /iceberg/v1;
        # the reference's rest_catalog.rs surface) — serves exports
        self.ice_catalog = IcebergCatalogRegistry(warehouse)
        self._write_lock = threading.Lock()  # single-writer per service
        self._kafka_schemas: dict[str, object] = {}  # table → Avro schema
        self._wals: dict[str, object] = {}           # table → EventWal
        self.wal_autoflush = wal_autoflush
        self._recover_wals()

    # ------------- event-level ingest WAL (see moonray/wal.py) -------
    def _wal(self, name: str, t):
        from moonray.wal import EventWal

        w = self._wals.get(name)
        if w is None:
            w = self._wals[name] = EventWal(t.root)
        return w

    def _recover_wals(self) -> None:
        """Startup recovery (reference wal.rs:670-760): fold every
        table's surviving ack'd-but-uncommitted ingest events into a
        merge, so a service crash between ack and commit loses no row."""
        for name in self.catalog.list_tables():
            try:
                t = self._table(name)
            except ServiceError:
                continue
            if len(self._wal(name, t)):
                self._fold_wal(name, t)

    def _fold_wal(self, name: str, t) -> dict:
        """Replay all pending WAL events (file order == ack order) into
        ONE merge job, then truncate. The job_id derives from the
        covered seq range, so a crash between commit and truncate
        re-folds into the SAME version (merge_into is idempotent per
        job_id) instead of duplicating rows. Caller holds _write_lock."""
        import numpy as np
        import ray.data as rd

        w = self._wal(name, t)
        events = w.pending()
        if not events:
            return {"folded_events": 0}
        schema = t.schema()
        op_char = {"insert": "I", "upsert": "U", "delete": "D"}
        ops: list = []
        rows: list = []
        for _seq, ev in events:
            ops.extend([op_char[ev["operation"]]] * len(ev["rows"]))
            rows.extend(ev["rows"])
        lsn0 = t.manifest()["commit_lsn"] + 1
        cols: dict = {
            "op": pa.array(ops, pa.string()),
            "lsn": pa.array(np.arange(lsn0, lsn0 + len(rows)), pa.int64()),
        }
        for f in schema:
            cols[f.name] = pa.array([r.get(f.name) for r in rows], f.type)
        job = f"wal-{name}-{events[0][0]:08d}-{events[-1][0]:08d}"
        v = t.merge(rd.from_arrow(pa.table(cols)), job_id=job)
        w.truncate_through(events[-1][0])
        return {"folded_events": len(events), "folded_rows": len(rows),
                "version": v}

    # ---------------- helpers ----------------
    def _table(self, name: str):
        try:
            return self.catalog.open_table(name)
        except KeyError:
            raise ServiceError(404, f"no such table {name!r}") from None

    def _rows_to_changes(self, t, op: str, rows: list[dict]) -> "object":
        import numpy as np
        import ray.data as rd

        op_char = {"insert": "I", "upsert": "U", "delete": "D"}.get(op)
        if op_char is None:
            raise ServiceError(400, f"operation must be insert|upsert|delete, got {op!r}")
        schema = t.schema()
        lsn0 = t.manifest()["commit_lsn"] + 1
        cols: dict = {
            "op": pa.array([op_char] * len(rows), pa.string()),
            "lsn": pa.array(np.arange(lsn0, lsn0 + len(rows)), pa.int64()),
        }
        for f in schema:
            try:
                cols[f.name] = pa.array([r.get(f.name) for r in rows], f.type)
            except pa.ArrowInvalid as ex:
                raise ServiceError(400, f"column {f.name!r}: {ex}") from None
        return rd.from_arrow(pa.table(cols))

    # ---------------- routes ----------------
    def health(self) -> dict:
        return {"service": "moonray-rest-api", "status": "healthy"}

    def list_tables(self) -> dict:
        return {"tables": self.catalog.list_tables()}

    def create_table(self, name: str, body: dict) -> dict:
        if not _NAME_RE.fullmatch(name):
            raise ServiceError(400, f"bad table name {name!r}")
        try:
            schema = schema_from_json(body["schema"])
        except (KeyError, ValueError, TypeError) as ex:
            raise ServiceError(400, f"bad schema: {ex}") from None
        kw = {k: body[k] for k in ("index_partitions", "rows_per_fragment")
              if k in body}
        try:
            with self._write_lock:
                self.catalog.create_table(
                    name, schema=schema, key_col=body.get("key_col"),
                    key_cols=body.get("key_cols"),
                    identity=body.get("identity", "keys"),
                    zone_cols=tuple(body.get("zone_cols", ())), **kw)
        except ValueError as ex:
            raise ServiceError(409, str(ex)) from None
        return {"created": name}

    def drop_table(self, name: str) -> dict:
        with self._write_lock:
            try:
                self.catalog.drop_table(name)
            except KeyError:
                raise ServiceError(404, f"no such table {name!r}") from None
        return {"dropped": name}

    def schema(self, name: str) -> dict:
        t = self._table(name)
        return {"schema": [[f.name, str(f.type)] for f in t.schema()]}

    def ingest(self, name: str, body: dict) -> dict:
        """``request_mode`` (reference rest_api.rs:60-66): "sync" (our
        default) merges + commits before replying; "async" appends the
        event to the table's durable WAL (fsync-before-ack) and returns
        immediately — it becomes visible at the next fold (autoflush
        threshold, explicit /flush, or service-restart recovery), and a
        crash after the ack can no longer lose it."""
        t = self._table(name)
        data = body.get("data")
        rows = data if isinstance(data, list) else [data]
        if not rows or any(not isinstance(r, dict) for r in rows):
            raise ServiceError(400, "data must be a row object or list of them")
        op = body.get("operation", "")
        if op not in ("insert", "upsert", "delete"):
            raise ServiceError(400, f"operation must be insert|upsert|delete, got {op!r}")
        if body.get("request_mode", "sync") == "async":
            with self._write_lock:
                w = self._wal(name, t)
                seq = w.append({"operation": op, "rows": rows})
                out = {"table": name, "buffered": True, "wal_seq": seq,
                       "pending_events": len(w)}
                if len(w) >= self.wal_autoflush:
                    out.update(self._fold_wal(name, t))
            return out
        changes = self._rows_to_changes(t, op, rows)
        with self._write_lock:
            v = t.merge(changes, job_id=body.get("job_id"))
        return {"table": name, "version": v, "rows": len(rows),
                "commit_lsn": t.manifest()["commit_lsn"]}

    def ingest_pb(self, name: str, body: dict) -> dict:
        """POST /ingestpb/{t} (reference rest_api.rs:417 +
        ingest_data_protobuf rest_api.rs:1026-1041): base64 MoonlinkRow
        protobuf datums decoded POSITIONALLY onto the table schema, then
        the normal ingest path (including request_mode async WAL
        buffering)."""
        import base64

        from moonray.sources.proto_ingest import (ProtoDecodeError,
                                                  decode_moonlink_row)

        t = self._table(name)
        data = body.get("data")
        datums = data if isinstance(data, list) else [data]
        if not datums or any(not isinstance(d, str) for d in datums):
            raise ServiceError(400, "data must be a base64 protobuf datum "
                                    "or list of them")
        schema = t.schema()
        rows = []
        for d in datums:
            try:
                vals = decode_moonlink_row(base64.b64decode(d))
            except (ProtoDecodeError, ValueError) as ex:
                raise ServiceError(400, f"bad protobuf datum: {ex}") from None
            row = {}
            for i, f in enumerate(schema):
                v = vals[i] if i < len(vals) else None
                if pa.types.is_string(f.type) and isinstance(v, bytes):
                    v = v.decode()
                row[f.name] = v
            rows.append(row)
        return self.ingest(name, {**body, "data": rows})

    def kafka_schema(self, name: str, body: dict) -> dict:
        """POST /kafka/{t}/schema: register the topic's Avro schema and
        create the backing table from it (reference route set,
        rest_api.rs:407-423 + avro_converter.rs). Identity comes from
        ``key_field`` (default: append-only stream)."""
        from moonray.sources.avro_ingest import (avro_to_arrow_schema,
                                                 parse_avro_schema)

        src = body.get("avro_schema")
        if not src:
            raise ServiceError(400, "kafka schema needs {'avro_schema': ...}")
        try:
            avro = parse_avro_schema(src if isinstance(src, str)
                                     else json.dumps(src))
            schema = avro_to_arrow_schema(avro)
        except Exception as ex:
            raise ServiceError(400, f"bad avro schema: {ex}") from None
        key = body.get("key_field")
        kw = {k: body[k] for k in ("index_partitions", "rows_per_fragment")
              if k in body}
        src_json = src if isinstance(src, str) else json.dumps(src)
        with self._write_lock:
            if name in self.catalog.list_tables():
                # re-registration must agree with the persisted table
                if not self._table(name).schema().equals(schema):
                    raise ServiceError(
                        409, f"avro schema for {name!r} does not match "
                             "the existing table schema")
            else:
                self.catalog.create_table(
                    name, schema=schema, key_col=key,
                    identity="keys" if key else "none", **kw)
            # persisted with the table — survives service restarts
            self.catalog.set_table_meta(name, "kafka_avro_schema", src_json)
            self._kafka_schemas[name] = avro
        return {"table": name,
                "schema": [[f.name, str(f.type)] for f in schema]}

    def kafka_ingest(self, name: str, body: dict) -> dict:
        """POST /kafka/{t}/ingest: base64 Avro binary datums (the Kafka
        record values) decoded with the registered schema and merged as
        inserts — the avro_converter.rs consume path."""
        import base64

        import ray.data as rd

        from moonray.sources.avro_ingest import decode_avro, parse_avro_schema

        avro = self._kafka_schemas.get(name)
        if avro is None:  # service restarted — reload from the catalog
            try:
                src = self.catalog.get_table_meta(name, "kafka_avro_schema")
            except KeyError:
                src = None
            if src:
                avro = self._kafka_schemas[name] = parse_avro_schema(src)
        if avro is None:
            raise ServiceError(409, f"no avro schema registered for {name!r} "
                                    "(POST /kafka/{t}/schema first)")
        datums = body.get("records") or []
        if not datums:
            raise ServiceError(400, "ingest needs {'records': [base64 ...]}")
        t = self._table(name)
        rows = [decode_avro(avro, base64.b64decode(d)) for d in datums]
        with self._write_lock:
            lsn0 = t.manifest()["commit_lsn"] + 1
            for i, r in enumerate(rows):
                r["op"], r["lsn"] = "I", lsn0 + i
            v = t.merge(rd.from_items(rows), job_id=body.get("job_id"))
        return {"table": name, "version": v, "rows": len(rows)}

    def otel_ingest(self, name: str, body: dict) -> dict:
        """POST /otel/{t}: OTLP-JSON ExportMetricsServiceRequest →
        point rows appended to an identity='none' metrics table
        (reference: the moonlink_service OTEL endpoint,
        otel/service.rs + otel_to_moonlink_pb.rs)."""
        import ray.data as rd

        from moonray.sources.otel_ingest import export_request_to_table

        t = self._table(name)
        rows = export_request_to_table(body)
        if not len(rows):
            return {"table": name, "rows": 0}
        with self._write_lock:
            lsn0 = t.manifest()["commit_lsn"] + 1
            n = len(rows)
            changes = (rows.add_column(0, "lsn", pa.array(
                range(lsn0, lsn0 + n), pa.int64()))
                .add_column(0, "op", pa.array(["I"] * n, pa.string())))
            v = t.merge(rd.from_arrow(changes), job_id=body.get("job_id"))
        return {"table": name, "version": v, "rows": n}

    def upload(self, name: str, body: dict) -> dict:
        import ray.data as rd

        t = self._table(name)
        files = body.get("files") or []
        op = body.get("operation", "insert")
        if op not in ("insert", "upsert"):
            raise ServiceError(400, "upload operation must be insert|upsert")
        ds = rd.read_parquet(files)
        with self._write_lock:
            if op == "insert":
                v = t.bulk_load(ds, job_id=body.get("job_id"))
            else:
                lsn0 = t.manifest()["commit_lsn"] + 1

                def tag(b: pa.Table, lsn0=lsn0) -> pa.Table:
                    import numpy as np

                    n = len(b)
                    out = {"op": pa.array(["U"] * n, pa.string()),
                           "lsn": pa.array(np.full(n, lsn0, np.int64))}
                    for c in b.column_names:
                        out[c] = b[c]
                    return pa.table(out)

                v = t.merge(ds.map_batches(tag, batch_format="pyarrow"),
                            job_id=body.get("job_id"), seq_col=None)
        return {"table": name, "version": v}

    def optimize(self, name: str, body: dict) -> dict:
        t = self._table(name)
        with self._write_lock:
            v = t.optimize(body.get("mode", "data"), job_id=body.get("job_id"))
        return {"table": name, "version": v}

    def cluster(self, name: str, body: dict) -> dict:
        t = self._table(name)
        with self._write_lock:
            v = t.cluster(cols=body.get("cols"), curve=body.get("curve", "z"),
                          job_id=body.get("job_id"))
        return {"table": name, "version": v}

    def snapshot(self, name: str, body: dict) -> dict:
        t = self._table(name)
        with self._write_lock:
            folded = self._fold_wal(name, t)  # buffered ingest first
            v = t.flush()
        return {"table": name, "version": v, **folded}

    def maintain(self, name: str, body: dict) -> dict:
        t = self._table(name)
        with self._write_lock:
            return {"table": name,
                    **t.maintain_if_needed(
                        expire_keep_last=body.get("expire_keep_last"))}

    def expire(self, name: str, body: dict) -> dict:
        t = self._table(name)
        with self._write_lock:
            return t.expire_snapshots(keep_last=int(body.get("keep_last", 2)))

    def vacuum(self, name: str, body: dict) -> dict:
        t = self._table(name)
        with self._write_lock:
            return t.vacuum(
                grace_seconds=float(body.get("grace_seconds", 86400.0)),
                dry_run=bool(body.get("dry_run", False)))

    def colindex(self, name: str, body: dict) -> dict:
        col = body.get("col")
        if not col:
            raise ServiceError(400, "colindex needs {'col': ...}")
        t = self._table(name)
        with self._write_lock:
            try:
                return t.build_column_index(col, fpp=body.get("fpp"))
            except ValueError as ex:
                raise ServiceError(400, str(ex)) from ex

    def analyze(self, name: str, body: dict) -> dict:
        t = self._table(name)
        cols = body.get("columns")
        try:
            prof = t.analyze(cols, distinct=body.get("distinct", "hash64"))
        except (KeyError, ValueError) as ex:
            raise ServiceError(400, str(ex)) from ex
        return {"table": name, "columns": prof.take_all()}

    def validate_table(self, name: str, body: dict) -> dict:
        t = self._table(name)
        uq = body.get("unique")
        try:
            rep = t.validate(
                unique=(tuple(tuple(k) if isinstance(k, list) else k
                              for k in uq) if uq is not None else None),
                not_null=tuple(body.get("not_null") or ()),
                ranges={k: tuple(v) for k, v in
                        (body.get("ranges") or {}).items()},
                in_set=body.get("in_set"),
            ).take_all()
        except (KeyError, ValueError) as ex:
            raise ServiceError(400, str(ex)) from ex
        return {"table": name, "ok": all(r["n_violations"] == 0
                                         for r in rep),
                "constraints": rep}

    def describe(self, name: str) -> dict:
        return self._table(name).describe()

    def history(self, name: str) -> dict:
        return {"history": self._table(name).history()}

    def scan(self, name: str, q: dict) -> dict:
        t = self._table(name)
        version = int(q["version"][0]) if "version" in q else None
        columns = q["columns"][0].split(",") if "columns" in q else None
        limit = min(int(q.get("limit", [1000])[0]), MAX_SCAN_ROWS)
        ds = t.scan(version=version, columns=columns).limit(limit)
        return {"rows": _json_rows(ds.take_all()), "truncated_at": limit}

    def scan_plan(self, name: str, q: dict) -> dict:
        """scan_table_begin analogue (src/moonlink_rpc/src/lib.rs:37 +
        snapshot_read.rs:152-241): return the union-read STATE — the
        snapshot's fragment parquet paths plus their deletion-vector
        delta files and the schema — so SQL engines (DuckDB/DataFusion)
        read the data files directly instead of proxying rows through
        HTTP row-JSON. ``?pin=1`` pins the version against snapshot
        expiry until POST /tables/{t}/scan_end {"token": ...} releases
        it (the reference's ReadState pin lifecycle). ``?ranges=`` /
        ``?in=`` (JSON: {col: [lo, hi]} / {col: [v, ...]}) zone-prune
        the fragment list server-side — a consumer scanning one phash
        band downloads only that band's fragments; the values echo
        back so the consumer knows the plan is partial and which exact
        row filter it still owes."""
        from moonray.dv import dv_paths_of
        from moonray.table import _zones_contain_any, _zones_overlap

        t = self._table(name)
        # parse + validate the pruning spec BEFORE any pin is written:
        # a malformed spec must be a 400, never a 500 that leaks a
        # persisted pin whose token the client never received
        ranges = in_sets = None
        try:
            if "ranges" in q:
                ranges = {c: (lo, hi) for c, (lo, hi)
                          in json.loads(q["ranges"][0]).items()}
            if "in" in q:
                in_sets = {c: list(v)
                           for c, v in json.loads(q["in"][0]).items()}
        except (ValueError, TypeError, AttributeError) as ex:
            raise ServiceError(
                400, f"bad ranges/in spec: {ex}") from ex
        token = None
        pin = q.get("pin", ["0"])[0] in ("1", "true")
        if "ref" in q and ("lsn" in q or "version" in q):
            raise ServiceError(400, "pass ref OR version/lsn, not both")
        if "lsn" in q:
            version, token = t.scan_begin(lsn=int(q["lsn"][0]))
            if not pin:
                t.scan_end(token)
                token = None
        else:
            if "ref" in q:
                try:
                    version = t.ref_version(q["ref"][0])
                except KeyError as ex:
                    raise ServiceError(404, str(ex)) from ex
                except ValueError as ex:  # malformed ref name is a 400
                    raise ServiceError(400, str(ex)) from ex
            else:
                version = int(q["version"][0]) if "version" in q \
                    else t.latest_version()
            if pin:
                from moonray.util import new_job_id

                token = f"scan-{new_job_id()}"
                t.pin(version, token)
        m = t.manifest(version)
        # the PINNED version's schema, not the latest — a plan held
        # across an ALTER must describe the files it actually lists
        sch = pa.ipc.read_schema(pa.py_buffer(bytes.fromhex(m["schema_ipc"])))
        try:
            # zone maps store extended types in the ENCODED JSON domain
            # (moonray/types.py) — put the user's bounds there before
            # pruning (identity for int/float/string columns), exactly
            # like table.scan does; the natural-value spec is echoed
            # back in pruned_by for the consumer's exact row filter
            from moonray import types as _ty

            enc_ranges = (_ty.encode_ranges(
                _ty.normalize_ranges(ranges, sch), sch)
                if ranges else None)
            nat_in = _ty.normalize_in(in_sets, sch) if in_sets else None
            enc_in = _ty.encode_in(nat_in, sch) if in_sets else None
            kept = [f for f in m["fragments"]
                    if (not enc_ranges
                        or _zones_overlap(f.get("zones", {}), enc_ranges))
                    and (not enc_in
                         or _zones_contain_any(f.get("zones", {}),
                                               enc_in))]
            if in_sets and kept:
                # bloom column indexes prune server-side too — the
                # consumer downloads only fragments that may hold a
                # queried value (conservative; it still owes the exact
                # row filter, echoed back in pruned_by)
                from moonray import colindex

                kept = colindex.prune_fragments(t.root, kept, nat_in,
                                                sch)
            frags = [{
                "path": f["path"], "rows": f["rows"], "bytes": f["bytes"],
                "dv_count": f["dv_count"], "dv_paths": dv_paths_of(f),
                "zones": f.get("zones", {}),
            } for f in kept]
        except (TypeError, ValueError) as ex:
            # spec values incomparable with the zone types, or IN-list
            # values that don't cast to a bloom-indexed column's type
            # (pa.ArrowInvalid is a ValueError): release the pin we
            # just took — the client never sees its token
            if token is not None:
                t.scan_end(token)
            raise ServiceError(
                400, f"ranges/in values don't compare with the "
                     f"column's type: {ex}") from ex
        return {
            "version": m["version"],
            "commit_lsn": m["commit_lsn"],
            "root": t.root,
            "schema": [{"name": f.name, "type": str(f.type)} for f in sch],
            "fragments": frags,
            "pruned_by": ({} if not (ranges or in_sets) else
                          {"ranges": ranges or {}, "in": in_sets or {}}),
            "pin_token": token,
        }

    def scan_end(self, name: str, body: dict) -> dict:
        token = body.get("token")
        if not token:
            raise ServiceError(400, "scan_end needs {'token': ...}")
        self._table(name).scan_end(token)
        return {"released": token}

    def lookup(self, name: str, body: dict) -> dict:
        t = self._table(name)
        keys = [tuple(k) if isinstance(k, list) else k
                for k in body.get("keys", [])]
        cols = body.get("columns")
        rows = t.lookup(keys, columns=cols).to_pylist()
        return {"rows": _json_rows(rows)}

    def changes(self, name: str, q: dict) -> dict:
        t = self._table(name)
        if "from" not in q:
            raise ServiceError(400, "changes needs ?from=<version>")
        from_v = int(q["from"][0])
        to_v = int(q["to"][0]) if "to" in q else None
        limit = min(int(q.get("limit", [1000])[0]), MAX_SCAN_ROWS)
        rows = t.changes(from_v, to_v).limit(limit).take_all()
        return {"rows": _json_rows(rows), "truncated_at": limit}


def make_handler(svc: MoonrayService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, status: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _body(self) -> dict:
            n = int(self.headers.get("Content-Length") or 0)
            if not n:
                return {}
            try:
                return json.loads(self.rfile.read(n))
            except json.JSONDecodeError as ex:
                raise ServiceError(400, f"bad JSON body: {ex}") from None

        def _route(self, method: str):
            u = urlparse(self.path)
            parts = [p for p in u.path.split("/") if p]
            q = parse_qs(u.query)
            if parts[:2] == ["iceberg", "v1"]:
                body = self._body() if method == "POST" else {}
                return svc.ice_catalog.route(method, parts[2:], body)
            if method == "GET":
                if parts == ["health"]:
                    return svc.health()
                if parts == ["tables"]:
                    return svc.list_tables()
                if len(parts) == 2 and parts[0] == "schema":
                    return svc.schema(parts[1])
                if len(parts) == 2 and parts[0] == "tables":
                    return svc.describe(parts[1])
                if len(parts) == 3 and parts[0] == "tables":
                    if parts[2] == "history":
                        return svc.history(parts[1])
                    if parts[2] == "scan":
                        return svc.scan(parts[1], q)
                    if parts[2] == "scanplan":
                        return svc.scan_plan(parts[1], q)
                    if parts[2] == "changes":
                        return svc.changes(parts[1], q)
            elif method == "POST":
                body = self._body()
                if len(parts) == 2 and parts[0] == "tables":
                    return svc.create_table(parts[1], body)
                if len(parts) == 2 and parts[0] == "ingest":
                    return svc.ingest(parts[1], body)
                if len(parts) == 2 and parts[0] == "ingestpb":
                    return svc.ingest_pb(parts[1], body)
                if len(parts) == 2 and parts[0] == "upload":
                    return svc.upload(parts[1], body)
                if len(parts) == 2 and parts[0] == "otel":
                    return svc.otel_ingest(parts[1], body)
                if len(parts) == 3 and parts[0] == "kafka":
                    if parts[2] == "schema":
                        return svc.kafka_schema(parts[1], body)
                    if parts[2] == "ingest":
                        return svc.kafka_ingest(parts[1], body)
                if len(parts) == 3 and parts[0] == "tables":
                    fn = {"optimize": svc.optimize, "cluster": svc.cluster,
                          "snapshot": svc.snapshot, "flush": svc.snapshot,
                          "maintain": svc.maintain, "expire": svc.expire,
                          "lookup": svc.lookup, "scan_end": svc.scan_end,
                          "vacuum": svc.vacuum, "colindex": svc.colindex,
                          "analyze": svc.analyze,
                          "validate": svc.validate_table,
                          }.get(parts[2])
                    if fn:
                        return fn(parts[1], body)
            elif method == "DELETE":
                if len(parts) == 2 and parts[0] == "tables":
                    return svc.drop_table(parts[1])
            raise ServiceError(404, f"no route {method} {u.path}")

        def _handle(self, method: str) -> None:
            from moonray.iceberg_catalog import IcebergCatalogError

            try:
                self._reply(200, self._route(method))
            except IcebergCatalogError as ex:
                self._reply(ex.code, ex.payload())  # spec error model
            except ServiceError as ex:
                self._reply(ex.status, {"error": str(ex)})
            except Exception as ex:  # noqa: BLE001 — service boundary
                self._reply(500, {"error": f"{type(ex).__name__}: {ex}"})

        def do_GET(self):
            self._handle("GET")

        def do_POST(self):
            self._handle("POST")

        def do_DELETE(self):
            self._handle("DELETE")

    return Handler


def serve(warehouse: str, host: str = "127.0.0.1", port: int = 8642):
    """Blocking serve loop. Returns (server, service) when used
    programmatically via ``start_in_thread``."""
    svc = MoonrayService(warehouse)
    server = ThreadingHTTPServer((host, port), make_handler(svc))
    return server, svc


def start_in_thread(warehouse: str, host: str = "127.0.0.1", port: int = 0):
    """Start the service on a daemon thread (port 0 = ephemeral);
    returns (server, base_url). Used by tests and embedders."""
    server, _svc = serve(warehouse, host, port)
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    return server, f"http://{server.server_address[0]}:{server.server_address[1]}"


def main(argv=None) -> int:
    import argparse

    import ray

    p = argparse.ArgumentParser(prog="moonray.service", description=__doc__)
    p.add_argument("--warehouse", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8642)
    args = p.parse_args(argv)
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    server, _ = serve(args.warehouse, args.host, args.port)
    print(json.dumps({"serving": f"http://{args.host}:{args.port}",
                      "warehouse": args.warehouse}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

"""CLI entry points for driving moonray tables from ``ray job submit``
(the north rule's execution surface) — the analogue of the reference's
RPC/REST control surface (src/moonlink_rpc/src/lib.rs:28-39,
src/moonlink_service/src/rest_api.rs:407-423):

    ray job submit -- python -m moonray.jobs create  --table /wh/imgs --key image_id --schema-json '[["image_id","string"],...]'
    ray job submit -- python -m moonray.jobs load    --table /wh/imgs --input /data/part-*.parquet
    ray job submit -- python -m moonray.jobs merge   --table /wh/imgs --changes /cdc/batch42/*.parquet --job-id batch42
    ray job submit -- python -m moonray.jobs optimize --table /wh/imgs --mode full
    ray job submit -- python -m moonray.jobs cluster --table /wh/imgs --curve hilbert
    ray job submit -- python -m moonray.jobs expire  --table /wh/imgs --keep-last 2
    ray job submit -- python -m moonray.jobs scan    --table /wh/imgs --output /out/snapshot
    ray job submit -- python -m moonray.jobs describe --table /wh/imgs

Idempotent per --job-id: resubmitting a finished job is a no-op, a
killed one resumes at bucket/fragment granularity (checkpoint.py)."""

from __future__ import annotations

import argparse
import json
import os
import sys

_TYPES = {
    "string": "pa.string()", "int32": "pa.int32()", "int64": "pa.int64()",
    "float32": "pa.float32()", "float64": "pa.float64()",
    "binary": "pa.binary()", "bool": "pa.bool_()",
}


def _pa_type(name: str):
    import pyarrow as pa

    table = {
        "string": pa.string(), "int32": pa.int32(), "int64": pa.int64(),
        "float32": pa.float32(), "float64": pa.float64(),
        "binary": pa.binary(), "bool": pa.bool_(),
    }
    if name not in table:
        raise SystemExit(f"unknown type {name!r}; one of {sorted(table)}")
    return table[name]


def _ensure_ray():
    import ray

    # workers at nice 0, not Ray's default 15 — see bench._init_ray
    os.environ.setdefault("RAY_worker_niceness", "0")
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="moonray.jobs", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    def tbl(sp):
        sp.add_argument("--table", required=True, help="table root directory")

    sp = sub.add_parser("create")
    tbl(sp)
    sp.add_argument("--key", default=None, help="single key column")
    sp.add_argument("--keys", default=None,
                    help="comma-separated composite key columns")
    sp.add_argument("--identity", choices=("keys", "full_row", "none"),
                    default="keys")
    sp.add_argument("--schema-json", required=True,
                    help='[["col","type"], ...] types: ' + ",".join(_TYPES))
    sp.add_argument("--zone-cols", default="")
    sp.add_argument("--index-partitions", type=int, default=16)
    sp.add_argument("--rows-per-fragment", type=int, default=4096)

    for name in ("load", "merge"):
        sp = sub.add_parser(name)
        tbl(sp)
        sp.add_argument("--input" if name == "load" else "--changes",
                        required=True, nargs="+")
        sp.add_argument("--job-id", default=None)

    sp = sub.add_parser("optimize")
    tbl(sp)
    sp.add_argument("--mode", choices=("data", "index", "full"), default="data")
    sp.add_argument("--job-id", default=None)

    sp = sub.add_parser("cluster")
    tbl(sp)
    sp.add_argument("--curve", choices=("z", "hilbert"), default="z")
    sp.add_argument("--cols", default=None,
                    help="comma-separated cluster columns (default: table zone_cols)")
    sp.add_argument("--job-id", default=None)

    sp = sub.add_parser("expire")
    tbl(sp)
    sp.add_argument("--keep-last", type=int, default=2)

    sp = sub.add_parser("scan")
    tbl(sp)
    sp.add_argument("--output", required=True, help="parquet output dir")
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--ref", default=None, help="scan a tagged snapshot")
    sp.add_argument("--columns", default=None)

    sp = sub.add_parser("tag")
    tbl(sp)
    sp.add_argument("name")
    sp.add_argument("--version", type=int, default=None)

    sp = sub.add_parser("untag")
    tbl(sp)
    sp.add_argument("name")

    sp = sub.add_parser("tags")
    tbl(sp)

    sp = sub.add_parser("clone")
    tbl(sp)
    sp.add_argument("--dest", required=True, help="clone table root")
    sp.add_argument("--version", type=int, default=None)

    sp = sub.add_parser("localize")
    tbl(sp)  # --table = root of the CLONE to localize
    sp.add_argument("--release-source", default=None,
                    help="source root whose clone pin to drop afterwards")

    sp = sub.add_parser("restore")
    tbl(sp)
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--ref", default=None, help="restore to a tagged snapshot")

    sp = sub.add_parser("describe")
    tbl(sp)

    sp = sub.add_parser("fsck")
    tbl(sp)
    sp.add_argument("--metadata-only", action="store_true")

    sp = sub.add_parser("analyze")
    tbl(sp)
    sp.add_argument("--columns", default=None)
    sp.add_argument("--distinct", default="hash64",
                    choices=["hash64", "exact"])

    sp = sub.add_parser("validate")
    tbl(sp)
    sp.add_argument("--unique", default=None,
                    help="comma-separated constraints, '+' joins a "
                         "composite tuple (a+b,c); '' disables; "
                         "default: the identity key tuple")
    sp.add_argument("--not-null", default=None)
    sp.add_argument("--ranges-json", default=None,
                    help='JSON {"col": [lo, hi]}')
    sp.add_argument("--in-set-json", default=None,
                    help='JSON {"col": [allowed...]}')

    sp = sub.add_parser("lookup")
    tbl(sp)
    sp.add_argument("--keys-json", required=True,
                    help='JSON list of key values (lists for composite keys)')
    sp.add_argument("--columns", default=None)

    sp = sub.add_parser("changes")
    tbl(sp)
    sp.add_argument("--from-version", type=int, required=True)
    sp.add_argument("--to-version", type=int, default=None)
    sp.add_argument("--output", required=True, help="parquet output dir")

    sp = sub.add_parser("export-delta")
    tbl(sp)
    sp.add_argument("--dest", required=True, help="Delta table directory")
    sp.add_argument("--version", type=int, default=None)

    sp = sub.add_parser("export-iceberg")
    tbl(sp)
    sp.add_argument("--dest", required=True, help="Iceberg table directory")
    sp.add_argument("--version", type=int, default=None)
    sp.add_argument("--register-catalog", default=None, metavar="URL",
                    help="Iceberg REST catalog base URL: after the "
                         "export, point --ident at the new metadata "
                         "(the commit-to-catalog step)")
    sp.add_argument("--ident", default=None, metavar="NS.NAME",
                    help="catalog identifier for --register-catalog")

    sp = sub.add_parser("vacuum-delta")
    sp.add_argument("--dest", required=True, help="Delta table directory")

    sp = sub.add_parser("expire-iceberg")
    sp.add_argument("--dest", required=True, help="Iceberg table directory")
    sp.add_argument("--keep-last", type=int, default=1)

    sp = sub.add_parser("import-iceberg")
    tbl(sp)
    sp.add_argument("--src", required=True, help="Iceberg table directory")
    sp.add_argument("--key-col", required=True)
    sp.add_argument("--rows-per-fragment", type=int, default=None)

    sp = sub.add_parser("delete-range")
    tbl(sp)
    sp.add_argument("--ranges-json", required=True,
                    help='{"col": [lo, hi], ...} — delete rows where every '
                         "col is inside its closed range (conjunction); the "
                         "same ranges drive zone-map pruning, so hint and "
                         "predicate can never disagree")
    sp.add_argument("--lsn", type=int, required=True)
    sp.add_argument("--job-id", default=None)

    sp = sub.add_parser("update-range")
    tbl(sp)
    sp.add_argument("--ranges-json", required=True,
                    help='{"col": [lo, hi], ...} — update rows where every '
                         "col is inside its closed range (conjunction)")
    sp.add_argument("--set-json", required=True,
                    help='{"col": constant, ...} — non-key columns only')
    sp.add_argument("--lsn", type=int, required=True)
    sp.add_argument("--job-id", default=None)

    sp = sub.add_parser("sync")
    tbl(sp)
    sp.add_argument("--into", required=True, help="destination table root")
    sp.add_argument("--state-key", default="default")

    sp = sub.add_parser("replicate")
    sp.add_argument("--wire", required=True,
                    help="replication wire: JSONL event file, or "
                         "tcp://host:port for the socket protocol "
                         "(keepalive/ack, auto-follow)")
    sp.add_argument("--map", action="append", required=True,
                    metavar="SRC=TABLE_ROOT",
                    help="source table name -> destination table root "
                         "(repeatable)")
    sp.add_argument("--state", required=True,
                    help="consumer position checkpoint file")
    sp.add_argument("--follow", action="store_true",
                    help="keep tailing: drain -> checkpoint -> sleep loop")
    sp.add_argument("--poll-interval", type=float, default=1.0)
    sp.add_argument("--idle-exit", type=int, default=None,
                    help="with --follow: exit after N consecutive "
                         "empty drains (default: run forever)")
    sp.add_argument("--codec", choices=("jsonl", "pgoutput"),
                    default="jsonl",
                    help="tcp:// wire codec: newline JSON events or "
                         "the pgoutput binary message set "
                         "(CopyData/XLogData/StandbyStatusUpdate)")

    sp = sub.add_parser("vacuum")
    tbl(sp)
    sp.add_argument("--grace-seconds", type=float, default=86400.0)
    sp.add_argument("--dry-run", action="store_true")

    sp = sub.add_parser("build-colindex")
    tbl(sp)
    sp.add_argument("--col", required=True,
                    help="non-key column to bloom-index (point/IN scans)")
    sp.add_argument("--fpp", type=float, default=0.01)

    sp = sub.add_parser("agg-view")
    tbl(sp)
    sp.add_argument("--into", required=True, help="view table root")
    sp.add_argument("--group-cols", required=True, help="comma-separated")
    sp.add_argument("--aggs-json", required=True,
                    help='{"out_col": ["count"|"sum"|"min"|"max", '
                         'src_col|null], ...} — a count column is '
                         "mandatory")
    sp.add_argument("--state-key", default="agg")

    sp = sub.add_parser("agg-view-sync")
    tbl(sp)
    sp.add_argument("--into", required=True, help="view table root")
    sp.add_argument("--group-cols", required=True, help="comma-separated")
    sp.add_argument("--aggs-json", required=True)
    sp.add_argument("--state-key", default="agg")

    sp = sub.add_parser("curate")
    tbl(sp)
    sp.add_argument("--lsn", type=int, required=True)
    sp.add_argument("--id-col", default="image_id")
    sp.add_argument("--caption-col", default="caption")
    sp.add_argument("--max-hamming", type=int, default=4)
    sp.add_argument("--min-tokens", type=int, default=4)
    sp.add_argument("--max-tokens", type=int, default=512)
    sp.add_argument("--job-id", default=None)

    args = p.parse_args(argv)
    _ensure_ray()
    import pyarrow as pa
    import ray.data as rd

    from moonray.table import MoonrayTable

    if args.cmd == "create":
        schema = pa.schema([(c, _pa_type(t))
                            for c, t in json.loads(args.schema_json)])
        MoonrayTable.create(
            args.table, key_col=args.key,
            key_cols=args.keys.split(",") if args.keys else None,
            identity=args.identity, schema=schema,
            zone_cols=tuple(x for x in args.zone_cols.split(",") if x),
            index_partitions=args.index_partitions,
            rows_per_fragment=args.rows_per_fragment)
        print(json.dumps({"created": args.table}))
        return 0

    if args.cmd == "replicate":
        from moonray.sources.cdc_tail import replicate_follow, replicate_once

        tables = {}
        for spec in args.map:
            src, _, root = spec.partition("=")
            if not root:
                raise SystemExit(f"--map needs SRC=TABLE_ROOT, got {spec!r}")
            tables[src] = MoonrayTable.open(root)
        if args.wire.startswith("tcp://"):
            # socket wire (keepalive/ack protocol, cdc_socket.py) —
            # inherently a follow loop; --idle-exit bounds it
            from moonray.sources.cdc_socket import replicate_socket

            applied = replicate_socket(args.wire, tables, args.state,
                                       idle_exit=args.idle_exit,
                                       codec=args.codec)
        elif args.follow:
            applied = replicate_follow(
                args.wire, tables, args.state,
                poll_interval=args.poll_interval, idle_exit=args.idle_exit)
        else:
            applied = replicate_once(args.wire, tables, args.state)
        print(json.dumps({"applied": applied}))
        return 0

    if args.cmd == "vacuum-delta":
        from moonray.sinks.delta import vacuum_delta

        print(json.dumps(vacuum_delta(args.dest)))
        return 0

    if args.cmd == "expire-iceberg":
        from moonray.sinks.iceberg import expire_iceberg_snapshots

        print(json.dumps(expire_iceberg_snapshots(
            args.dest, keep_last=args.keep_last)))
        return 0

    if args.cmd == "import-iceberg":
        # table may not exist yet: derive the schema from the Iceberg
        # snapshot and create, then bulk-load through the distributed
        # read (per-file tasks, in-task DV subtraction)
        from moonray.sources.iceberg_read import read_iceberg_dataset

        ds = read_iceberg_dataset(args.src)
        kwargs = ({"rows_per_fragment": args.rows_per_fragment}
                  if args.rows_per_fragment else {})
        t = MoonrayTable.create(args.table, key_col=args.key_col,
                                schema=ds.schema().base_schema, **kwargs)
        v = t.bulk_load(ds)
        print(json.dumps({"table": args.table, "version": v,
                          "rows": t.describe()["cardinality"]}))
        return 0

    t = MoonrayTable.open(args.table)
    if args.cmd == "load":
        v = t.bulk_load(rd.read_parquet(args.input), job_id=args.job_id)
    elif args.cmd == "merge":
        v = t.merge(rd.read_parquet(args.changes), job_id=args.job_id)
    elif args.cmd == "optimize":
        v = t.optimize(args.mode, job_id=args.job_id)
    elif args.cmd == "cluster":
        cols = args.cols.split(",") if args.cols else None
        v = t.cluster(cols=cols, curve=args.curve, job_id=args.job_id)
    elif args.cmd == "expire":
        print(json.dumps(t.expire_snapshots(keep_last=args.keep_last)))
        return 0
    elif args.cmd == "scan":
        cols = args.columns.split(",") if args.columns else None
        t.scan(version=args.version, ref=args.ref,
               columns=cols).write_parquet(args.output)
        print(json.dumps({"output": args.output}))
        return 0
    elif args.cmd == "tag":
        v = t.tag(args.name, version=args.version)
        print(json.dumps({"tag": args.name, "version": v}))
        return 0
    elif args.cmd == "untag":
        t.untag(args.name)
        print(json.dumps({"untagged": args.name}))
        return 0
    elif args.cmd == "tags":
        print(json.dumps(t.tags()))
        return 0
    elif args.cmd == "clone":
        from moonray.clone import clone_table

        c = clone_table(t, args.dest, version=args.version)
        print(json.dumps({"clone": args.dest,
                          "cloned_from": c.manifest()["cloned_from"]}))
        return 0
    elif args.cmd == "localize":
        from moonray.clone import localize_clone, release_clone_at

        v = localize_clone(t)
        out = {"localized": t.root, "version": v}
        # source root from the flag, else from the clone's own lineage
        # (cloned_from survives commits) — a localized clone should not
        # leave a retention pin behind by default
        src_root = args.release_source or \
            t.manifest().get("cloned_from", {}).get("root")
        if src_root:
            release_clone_at(src_root, t.root)
            out["released_pin_on"] = src_root
        print(json.dumps(out))
        return 0
    elif args.cmd == "restore":
        if (args.version is None) == (args.ref is None):
            raise SystemExit("restore: pass exactly one of --version/--ref")
        target = (args.version if args.version is not None
                  else t.ref_version(args.ref))
        v = t.restore(target)
        print(json.dumps({"restored_to": target, "version": v}))
        return 0
    elif args.cmd == "describe":
        print(json.dumps(t.describe()))
        return 0
    elif args.cmd == "fsck":
        rep = t.fsck(deep=not args.metadata_only)
        print(json.dumps(rep))
        return 0 if rep["ok"] else 3
    elif args.cmd == "analyze":
        cols = args.columns.split(",") if args.columns else None
        prof = t.analyze(cols, distinct=args.distinct)
        print(json.dumps(prof.take_all(), default=str))
        return 0
    elif args.cmd == "validate":
        def _unique_spec():
            if args.unique is None:
                return None
            out = []
            for part in args.unique.split(","):
                part = part.strip()
                if not part:
                    continue
                cols = tuple(c for c in part.split("+") if c)
                out.append(cols[0] if len(cols) == 1 else cols)
            return tuple(out)

        rep = t.validate(
            unique=_unique_spec(),
            not_null=tuple(c for c in (args.not_null or "").split(",")
                           if c),
            ranges={k: tuple(v) for k, v in
                    json.loads(args.ranges_json).items()}
            if args.ranges_json else None,
            in_set=json.loads(args.in_set_json)
            if args.in_set_json else None,
        ).take_all()
        print(json.dumps(rep, default=str))
        # non-zero violations → exit 4 (fsck uses 3)
        return 0 if all(r["n_violations"] == 0 for r in rep) else 4
    elif args.cmd == "lookup":
        keys = [tuple(k) if isinstance(k, list) else k
                for k in json.loads(args.keys_json)]
        cols = args.columns.split(",") if args.columns else None
        print(json.dumps(t.lookup(keys, columns=cols).to_pylist(), default=str))
        return 0
    elif args.cmd == "changes":
        t.changes(args.from_version, args.to_version).write_parquet(args.output)
        print(json.dumps({"output": args.output}))
        return 0
    elif args.cmd == "export-delta":
        from moonray.sinks.delta import export_delta

        dv = export_delta(t, args.dest, version=args.version)
        print(json.dumps({"delta_version": dv, "dest": args.dest}))
        return 0
    elif args.cmd == "export-iceberg":
        from moonray.sinks.iceberg import export_iceberg

        iv = export_iceberg(t, args.dest, version=args.version)
        out = {"iceberg_metadata_version": iv, "dest": args.dest}
        if args.register_catalog:
            from moonray.iceberg_catalog import IcebergRestCatalog

            if not args.ident or "." not in args.ident:
                raise SystemExit("--register-catalog needs --ident NS.NAME")
            ns, name = args.ident.split(".", 1)
            cat = IcebergRestCatalog(args.register_catalog)
            if ns not in cat.list_namespaces():
                cat.create_namespace(ns)
            res = cat.register_export(ns, name, args.dest)
            out["registered"] = {"identifier": args.ident,
                                 "metadata-location": res["metadata-location"]}
        print(json.dumps(out))
        return 0
    elif args.cmd == "delete-range":
        # keep json's native int/float types: float() coercion would
        # round int64 bounds near 2^53 (silent wrong-row deletes) and
        # make Arrow raise on int64 values float64 can't hold
        ranges = {c: (lo, hi)
                  for c, (lo, hi) in json.loads(args.ranges_json).items()}
        if not ranges:
            raise SystemExit("delete-range: empty --ranges-json would be "
                             "an unconditional full-table delete; refuse")
        v = t.delete_range(ranges, lsn=args.lsn, job_id=args.job_id)
    elif args.cmd == "update-range":
        ranges = {c: (lo, hi)
                  for c, (lo, hi) in json.loads(args.ranges_json).items()}
        v = t.update_range(ranges, json.loads(args.set_json),
                           lsn=args.lsn, job_id=args.job_id)
    elif args.cmd == "sync":
        from moonray.sync import sync_incremental

        v = sync_incremental(t, MoonrayTable.open(args.into),
                             state_key=args.state_key)
        print(json.dumps({"dst_version": v, "into": args.into}))
        return 0
    elif args.cmd == "vacuum":
        print(json.dumps(t.vacuum(grace_seconds=args.grace_seconds,
                                  dry_run=args.dry_run)))
        return 0
    elif args.cmd == "build-colindex":
        print(json.dumps(t.build_column_index(args.col, fpp=args.fpp)))
        return 0
    elif args.cmd == "agg-view":
        from moonray.aggview import build_aggregate_view

        aggs = {k: (kind, col) for k, (kind, col)
                in json.loads(args.aggs_json).items()}
        dst = build_aggregate_view(t, args.into,
                                   group_cols=args.group_cols.split(","),
                                   aggs=aggs, state_key=args.state_key)
        print(json.dumps({"view": args.into, **dst.describe()}))
        return 0
    elif args.cmd == "agg-view-sync":
        from moonray.aggview import sync_aggregate

        aggs = {k: (kind, col) for k, (kind, col)
                in json.loads(args.aggs_json).items()}
        stats: dict = {}
        v = sync_aggregate(t, MoonrayTable.open(args.into),
                           group_cols=args.group_cols.split(","),
                           aggs=aggs, state_key=args.state_key, stats=stats)
        print(json.dumps({"dst_version": v, "into": args.into, **stats}))
        return 0
    elif args.cmd == "curate":
        from moonray.pipelines.curation import curate_table

        v = curate_table(t, lsn=args.lsn, id_col=args.id_col,
                         caption_col=args.caption_col,
                         max_hamming=args.max_hamming,
                         min_tokens=args.min_tokens,
                         max_tokens=args.max_tokens, job_id=args.job_id)
    print(json.dumps({"version": v, **t.describe()}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

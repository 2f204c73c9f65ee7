"""MERGE INTO pipelines over the driver's TPC-H-ish parquet tables.

These exercise the REAL engine (MoonrayTable + merge_into + maintenance)
on SQL-expressible inputs so the driver's DuckDB oracle can verify
value-for-value: base table = ``customer`` keyed on ``c_custkey``;
the CDC change log is derived deterministically from ``orders``
(op by o_orderkey % 10: 0-1 → D, 2-4 → I on a shifted key space,
5-9 → U; lsn = o_orderkey; payload columns are pure functions of the
order row). The matching SQL lives in __ray_entry__.oracle_sql().
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

CUSTOMER_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
INSERT_KEY_SHIFT = 10_000_000


def orders_to_changes(batch: pa.Table) -> pa.Table:
    """Vectorized Arrow transform: orders batch → CDC change rows."""
    ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
    ck = batch["o_custkey"].to_numpy(zero_copy_only=False)
    tp = batch["o_totalprice"].to_numpy(zero_copy_only=False)
    sel = ok % 10
    op = np.where(sel < 2, "D", np.where(sel < 5, "I", "U"))
    key = np.where((sel >= 2) & (sel < 5), ck + INSERT_KEY_SHIFT, ck)
    is_del = op == "D"
    name = np.array([f"name-{k}" for k in ok], dtype=object)
    nation = (ok % 25).astype(np.int32)
    seg = np.full(len(ok), "SEG", dtype=object)
    return pa.table({
        "op": pa.array(op.tolist(), pa.string()),
        "lsn": pa.array(ok, pa.int64()),
        "c_custkey": pa.array(key, pa.int64()),
        "c_name": pa.array(np.where(is_del, None, name).tolist(), pa.string()),
        "c_nationkey": pa.array(
            [None if d else int(v) for d, v in zip(is_del, nation)], pa.int32()),
        "c_acctbal": pa.array(
            [None if d else float(v) for d, v in zip(is_del, tp)], pa.float64()),
        "c_mktsegment": pa.array(np.where(is_del, None, seg).tolist(), pa.string()),
    })


def _changes_dataset(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(orders_to_changes, batch_format="pyarrow")


def build_customer_table(sf_dir: str, root: str | None = None,
                         rows_per_fragment: int = 256, index_partitions: int = 8):
    """customer parquet → fresh MoonrayTable (bulk load)."""
    import ray.data as rd

    from moonray.table import MoonrayTable

    from moonray.util import scratch_root

    root = root or scratch_root("moonray-cust-")
    schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])
    t = MoonrayTable.create(root, key_col="c_custkey", schema=schema,
                            zone_cols=("c_acctbal", "c_nationkey"),
                            index_partitions=index_partitions,
                            rows_per_fragment=rows_per_fragment)
    ds = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                         columns=CUSTOMER_COLS)
    t.bulk_load(ds)
    return t


def merge_customer(sf_dir: str, *, maintenance: str | None = None,
                   scan_version: str | None = None):
    """Full pipeline: bulk load customer → MERGE orders-derived CDC →
    optional maintenance pass → scan. Returns a lazy Dataset.

    maintenance ∈ {None, "compact", "cluster", "full"};
    scan_version="pre_merge" scans the pinned bulk-load version instead
    (snapshot-isolation probe)."""
    t = build_customer_table(sf_dir)
    v_loaded = t.latest_version()
    t.pin(v_loaded, "pipeline-reader")
    t.merge(_changes_dataset(sf_dir))
    if maintenance == "compact":
        t.optimize("data", target_bytes=1 << 26, min_group=2)
    elif maintenance == "cluster":
        t.cluster()
    elif maintenance == "full":
        t.optimize("full")
        t.expire_snapshots(keep_last=1)
    if scan_version == "pre_merge":
        return t.scan(version=v_loaded)
    return t.scan()


def update_where_scan(sf_dir: str, lo: float = 1000.0, hi: float = 5000.0):
    """Predicate UPDATE: bump acctbal and rewrite the segment for every
    customer in the balance band, then scan. Exercises
    table.update_where (scan → set_fn → MERGE upsert) under the SQL
    UPDATE oracle."""
    import pyarrow.compute as pc

    t = build_customer_table(sf_dir)

    def pred(b):
        return pc.and_(pc.greater_equal(b["c_acctbal"], lo),
                       pc.less_equal(b["c_acctbal"], hi))

    def set_fn(b):
        return b.set_column(
            b.column_names.index("c_acctbal"), "c_acctbal",
            pc.add(b["c_acctbal"], 100.0)).set_column(
            b.column_names.index("c_mktsegment"), "c_mktsegment",
            pa.array(["UPDATED"] * len(b), pa.string()))

    t.update_where(pred, set_fn, lsn=7,
                   predicate_ranges={"c_acctbal": (lo, hi)},
                   exact_ranges=True)
    return t.scan()


def aggregate_view_scan(sf_dir: str):
    """Incremental aggregate-view maintenance end-to-end: full-build a
    per-nation (count, sum/min/max of half-up acctbal cents) view of
    customer at the loaded version, MERGE the orders-derived CDC round
    into the SOURCE, then sync_aggregate the view through the changelog
    — one merged row per changed group; min/max deletes rescan only
    affected nations (predicate_in pruning). Returns the view scan,
    which must equal a full recompute over post-merge customer."""
    import pyarrow.compute as pc

    from moonray.aggview import build_aggregate_view, sync_aggregate
    from moonray.util import scratch_root

    src = build_customer_table(sf_dir)

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            b["c_acctbal"], 100.0), 0.5)), pa.int64())
        return b.append_column("acctbal_cents", c)

    aggs = {"cnt": ("count", None), "bal_cents": ("sum", "acctbal_cents"),
            "bal_min": ("min", "acctbal_cents"),
            "bal_max": ("max", "acctbal_cents")}
    kw = dict(group_cols=["c_nationkey"], aggs=aggs, transform=cents,
              transform_columns=["c_acctbal"])
    dst = build_aggregate_view(src, scratch_root("moonray-aggview-"), **kw)
    src.merge(_changes_dataset(sf_dir))
    sync_aggregate(src, dst, **kw)
    return dst.scan()


def bloom_point_scan(sf_dir: str):
    """Secondary-index point reads on a NON-key column: bulk load
    customer, bloom-index c_name (colindex.py — Delta bloom file index
    analogue), then scan with an IN-list predicate. Zone maps can't
    prune c_name (not a zone column, high cardinality); the bloom
    sidecars drop every fragment that provably lacks the queried names
    and the in-task is_in filter keeps the result exact."""
    t = build_customer_table(sf_dir)
    t.build_column_index("c_name")
    names = [f"Customer#{k:09d}" for k in (7, 311, 888)]
    return t.scan(predicate_in={"c_name": names})


def aggregate_view_distinct_scan(sf_dir: str):
    """Exact incremental COUNT(DISTINCT) view: per-nation distinct
    market segments + row count of customer, maintained through the
    auxiliary support-count table across a CDC merge round (the merge
    rewrites every surviving row's segment to 'SEG', collapsing
    distincts — deletes of last-copies must drop them)."""
    from moonray.aggview import build_aggregate_view, sync_aggregate
    from moonray.util import scratch_root

    src = build_customer_table(sf_dir)
    aggs = {"cnt": ("count", None),
            "nd_seg": ("count_distinct", "c_mktsegment")}
    kw = dict(group_cols=["c_nationkey"], aggs=aggs)
    dst = build_aggregate_view(src, scratch_root("moonray-aggnd-"), **kw)
    src.merge(_changes_dataset(sf_dir))
    sync_aggregate(src, dst, **kw)
    return dst.scan()


def restore_rollback_scan(sf_dir: str):
    """Rollback pipeline: bulk load customer → tag → apply a bad merge
    (scrambles balances, deletes a band) → restore to the tag → scan.
    The result must equal the pristine customer table (resurrected
    deletes included)."""
    import pyarrow.compute as pc

    t = build_customer_table(sf_dir)
    t.tag("pre-incident")

    def corrupt(b: pa.Table) -> pa.Table:
        import numpy as np

        keep = b.select(["c_custkey", "c_name", "c_nationkey",
                         "c_acctbal", "c_mktsegment"])
        ck = keep["c_custkey"].to_numpy(zero_copy_only=False)
        ops = np.where(ck % 7 < 2, "D", "U")
        n = len(keep)
        return (keep
                .append_column("op", pa.array(ops.tolist(), pa.string()))
                .append_column("lsn", pa.array([9_000_000] * n, pa.int64()))
                .set_column(3, "c_acctbal",
                            pc.multiply(keep["c_acctbal"], -1.0)))

    t.merge(t.scan().map_batches(corrupt, batch_format="pyarrow"))
    t.restore(t.ref_version("pre-incident"))
    return t.scan()


def clone_cow_merge(sf_dir: str):
    """Shallow-clone pipeline: bulk load customer → zero-copy clone →
    MERGE the orders-derived CDC into the CLONE → scan the clone. The
    result equals merging into the original (same MERGE oracle), while
    the source must remain byte-identical to its bulk load — checked
    here, not just in pytest. Exercises: ext:: fragment/index refs
    under scan+merge, COW DV deltas, clone-local new fragments."""
    from moonray.clone import clone_table
    from moonray.util import scratch_root

    src = build_customer_table(sf_dir)
    src_v = src.latest_version()
    c = clone_table(src, scratch_root("moonray-clone-"))
    c.merge(_changes_dataset(sf_dir))
    if src.latest_version() != src_v:
        raise AssertionError("clone merge leaked a commit into the source")
    return c.scan()


def branch_publish_merge(sf_dir: str):
    """Branch-ref pipeline (branches.py): bulk load customer → fork a
    writable branch → MERGE the orders-derived CDC on the BRANCH →
    publish (changelog fast-forward into the parent) → scan the
    parent. The published parent equals merging directly (the
    merge_upsert SQL oracle); the parent must be untouched until
    publish — checked in-pipeline, not just in pytest."""
    t = build_customer_table(sf_dir)
    v0 = t.latest_version()
    br = t.create_branch("staging")
    br.merge(_changes_dataset(sf_dir))
    if t.latest_version() != v0:
        raise AssertionError("branch merge leaked a commit into the parent")
    t.publish_branch("staging", drop=True)
    return t.scan()


def cdc_wire_replication(sf_dir: str, tx_size: int = 1000,
                         codec: str = "pgoutput"):
    """CDC-in through the replication wire: the orders-derived change
    set is written to the wire as Relation + Begin/DML/Commit
    transactions of ``tx_size`` events and applied transaction-by-
    transaction. Final state must equal the one-shot MERGE (the
    merge_upsert SQL oracle).

    ``codec="pgoutput"`` (default) runs the ACTUAL pgoutput binary
    message set in CopyData frames (sources/pgoutput.py — the format
    the reference's connector decodes, postgres_source.rs);
    ``codec="jsonl"`` keeps the JSONL file wire
    (sources/cdc_tail.py). Both feed CdcTail.consume_events, both
    keep the torn-tail crash property, and both produce identical
    output."""
    import json

    from moonray.sources.cdc_tail import CdcTail
    from moonray.util import scratch_root

    t = build_customer_table(sf_dir)
    ch = pa.concat_tables(list(_changes_dataset(sf_dir).iter_batches(
        batch_format="pyarrow", batch_size=65536))).combine_chunks()
    ch = ch.sort_by([("lsn", "ascending")])
    log = os.path.join(scratch_root("moonray-cdcwire-"), f"wire.{codec}")
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment"]
    kinds = {"I": "insert", "U": "update", "D": "delete"}
    ops = ch["op"].to_pylist()
    lsns = ch["lsn"].to_pylist()
    vals = [ch[c].to_pylist() for c in cols]
    n = len(ops)

    def events():
        yield {"event": "relation", "rel_id": 1, "table": "customer",
               "columns": [["c_custkey", "int64"], ["c_name", "string"],
                           ["c_nationkey", "int32"],
                           ["c_acctbal", "float64"],
                           ["c_mktsegment", "string"]],
               "key_cols": ["c_custkey"]}
        for s in range(0, n, tx_size):
            e = min(s + tx_size, n)
            yield {"event": "begin", "xid": s // tx_size + 1}
            for i in range(s, e):
                yield {"event": kinds[ops[i]], "rel_id": 1,
                       "values": [v[i] for v in vals], "lsn": lsns[i]}
            yield {"event": "commit", "xid": s // tx_size + 1,
                   "end_lsn": lsns[e - 1]}

    if codec == "jsonl":
        with open(log, "w") as f:
            for ev in events():
                f.write(json.dumps(ev) + "\n")
        tail = CdcTail(log)
        tail.run_until_idle({"customer": t})
    else:
        from moonray.sources.pgoutput import PgWireDecoder, PgWireEncoder

        enc = PgWireEncoder()
        with open(log, "wb") as f:
            for ev in events():
                f.write(enc.encode(ev))
        tail = CdcTail(path="")
        dec = PgWireDecoder()
        with open(log, "rb") as f:
            while chunk := f.read(1 << 20):
                for tx in tail.consume_events(dec.feed(chunk)):
                    tail.apply(tx, {"customer": t})
    return t.scan()


def changelog_scan(sf_dir: str):
    """Changelog read (CDC out): bulk load customer, apply the
    orders-derived CDC log, run full maintenance (data-preserving —
    must contribute NOTHING), then read the logical changes since the
    bulk-load version. Updates appear as delete+insert, matching the
    engine's own CDC-in decomposition."""
    t = build_customer_table(sf_dir)
    v_loaded = t.latest_version()
    t.merge(_changes_dataset(sf_dir))
    t.optimize("full")
    return t.changes(v_loaded).drop_columns(["commit_version"])


def lookup_point_reads(sf_dir: str):
    """Index-served batch point reads after a MERGE — the reference's
    GlobalIndex batch lookup (hash_index.rs:392) as a pipeline: bulk
    load customer, apply the orders-derived CDC log, then look up a
    fixed key set (original custkeys 1..300 plus the +10M-shifted
    insert range) straight from the persisted key index. Returns the
    live rows as a pyarrow Table — deleted keys absent, updated keys
    with their post-merge values."""
    t = build_customer_table(sf_dir)
    t.merge(_changes_dataset(sf_dir))
    keys = list(range(1, 301)) + [10_000_000 + k for k in range(1, 301)]
    return t.lookup(keys)


def merge_composite_key(sf_dir: str):
    """Composite-key MERGE (reference IdentityProp::Keys,
    moonlink_row.rs:270-277): customer keyed on (c_nationkey, c_custkey)
    — the same c_custkey under a different nation is a different row.
    Changes derived deterministically from customer itself:
    custkey%4 == 0 → D, 1 → U (name 'upd-k', acctbal*2, segment 'CK'),
    2 → I on a +30M-shifted custkey, 3 → untouched; lsn = custkey."""
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    root = scratch_root("moonray-ck-")
    schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])
    t = MoonrayTable.create(root, key_cols=["c_nationkey", "c_custkey"],
                            schema=schema, zone_cols=("c_acctbal",),
                            index_partitions=8, rows_per_fragment=256)
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=CUSTOMER_COLS)
    t.bulk_load(cust)

    def to_changes(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        nk = b["c_nationkey"].to_numpy(zero_copy_only=False)
        ab = b["c_acctbal"].to_numpy(zero_copy_only=False)
        sel = ck % 4
        keep = sel < 3
        ck, nk, ab, sel = ck[keep], nk[keep], ab[keep], sel[keep]
        op = np.where(sel == 0, "D", np.where(sel == 1, "U", "I"))
        is_del = op == "D"
        key = np.where(sel == 2, ck + 30_000_000, ck)
        name = np.array([f"upd-{k}" for k in ck], dtype=object)
        return pa.table({
            "op": pa.array(op.tolist(), pa.string()),
            "lsn": pa.array(ck, pa.int64()),
            "c_custkey": pa.array(key, pa.int64()),
            "c_name": pa.array(np.where(is_del, None, name).tolist(), pa.string()),
            "c_nationkey": pa.array(nk, pa.int32()),
            "c_acctbal": pa.array(
                [None if d else float(v) * 2.0 for d, v in zip(is_del, ab)],
                pa.float64()),
            "c_mktsegment": pa.array(
                np.where(is_del, None, "CK").tolist(), pa.string()),
        })

    t.merge(cust.map_batches(to_changes, batch_format="pyarrow"))
    return t.scan()


def append_only_ingest(sf_dir: str):
    """Append-only table (reference IdentityProp::None — deletes
    forbidden, no key index): bulk load customer, then merge an
    insert-only change set (custkey%3==0, +40M key shift, acctbal+5)."""
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    root = scratch_root("moonray-ao-")
    schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])
    t = MoonrayTable.create(root, identity="none", schema=schema,
                            zone_cols=("c_acctbal",), rows_per_fragment=256)
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=CUSTOMER_COLS)
    t.bulk_load(cust)

    def to_inserts(b: pa.Table) -> pa.Table:
        ck_all = b["c_custkey"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ck_all % 3 == 0))
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "op": pa.array(["I"] * len(ck), pa.string()),
            "lsn": pa.array(ck, pa.int64()),
            "c_custkey": pa.array(ck + 40_000_000, pa.int64()),
            "c_name": pa.array([f"ap-{k}" for k in ck], pa.string()),
            "c_nationkey": b["c_nationkey"],
            "c_acctbal": pa.array(
                b["c_acctbal"].to_numpy(zero_copy_only=False) + 5.0, pa.float64()),
            "c_mktsegment": pa.array(["AO"] * len(ck), pa.string()),
        })

    t.merge(cust.map_batches(to_inserts, batch_format="pyarrow"))
    return t.scan()


def concurrent_append_commits(sf_dir: str):
    """Two WRITERS bulk-load disjoint halves of ``customer`` into ONE
    keyed table from concurrent threads — the multi-writer ingest
    pattern table._commit_append's optimistic rebase exists for: the
    loser of the version-id race rebases onto the new head instead of
    failing, so both commits land and the scan is the full union
    (oracle: SELECT the five columns FROM customer). Point lookups at
    the end prove the index deltas of BOTH writers survived the rebase."""
    import threading

    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    root = scratch_root("moonray-occ-")
    schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])
    t = MoonrayTable.create(root, key_col="c_custkey", schema=schema,
                            zone_cols=("c_acctbal",), index_partitions=8,
                            rows_per_fragment=256)
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=CUSTOMER_COLS)

    def half(parity: int):
        def f(b: pa.Table) -> pa.Table:
            ck = b["c_custkey"].to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ck % 2 == parity))

        f.__name__ = f"half_{parity}"
        return f

    errs: list[Exception] = []

    def load(parity: int) -> None:
        try:
            MoonrayTable.open(root).bulk_load(
                cust.map_batches(half(parity), batch_format="pyarrow"),
                job_id=f"writer-{parity}")
        except Exception as ex:  # noqa: BLE001 — surfaced below
            errs.append(ex)

    threads = [threading.Thread(target=load, args=(p,)) for p in (0, 1)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    if errs:
        raise errs[0]
    return t.scan()


def alter_evolution_scan(sf_dir: str):
    """Schema evolution end-to-end: bulk load customer → ALTER TABLE
    add c_loyalty (default 5) + drop c_mktsegment → scan. Old fragments
    are projected onto the new schema at read time (no rewrite)."""
    t = build_customer_table(sf_dir)
    t.alter(add_columns=[("c_loyalty", pa.int32(), 5)],
            drop_columns=["c_mktsegment"])
    return t.scan()


def stream_xact_scan(sf_dir: str):
    """Streaming transaction end-to-end: bulk load customer → one xact
    staging (a) upserted rows on a shifted key space derived from
    customers with c_custkey % 7 == 0 and (b) deletes of c_custkey % 5
    == 0 → single atomic commit → scan."""
    import ray.data as rd

    t = build_customer_table(sf_dir)
    cust = rd.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                           columns=CUSTOMER_COLS)

    def to_appends(b: pa.Table) -> pa.Table:
        ck_all = b["c_custkey"].to_numpy(zero_copy_only=False)
        b = b.filter(pa.array(ck_all % 7 == 0))
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(ck + 20_000_000, pa.int64()),
            "c_name": pa.array([f"snap-{k}" for k in ck], pa.string()),
            "c_nationkey": b["c_nationkey"],
            "c_acctbal": pa.array(
                b["c_acctbal"].to_numpy(zero_copy_only=False) * 2.0, pa.float64()),
            "c_mktsegment": pa.array(["XL"] * len(ck), pa.string()),
        })

    def to_deletes(b: pa.Table) -> pa.Table:
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({"c_custkey": pa.array(ck[ck % 5 == 0], pa.int64())})

    x = t.stream_begin("sx-pipeline")
    x.append(cust.map_batches(to_appends, batch_format="pyarrow"))
    x.delete(cust.map_batches(to_deletes, batch_format="pyarrow"))
    x.commit(lsn=1)
    return t.scan()


def zone_pruned_scan(sf_dir: str, lo: float = 1000.0, hi: float = 5000.0):
    """Cluster by (c_acctbal, c_nationkey), then a range scan that prunes
    fragments via zone maps and applies the exact row filter."""
    t = build_customer_table(sf_dir)
    t.cluster()
    # exact_filter pushes the row filter into the read tasks (row-group
    # stat pruning inside surviving fragments; non-matching rows never
    # leave the read) — verified value-for-value by the SQL oracle
    return t.scan(predicate_ranges={"c_acctbal": (lo, hi)},
                  exact_filter=True)


def json_props_agg(sf_dir: str):
    """JSON ingest-converter pipeline: parse the events table's embedded
    JSON ``props`` column into typed columns (sources/json_ingest.py —
    the reference's REST JSON→row converter analogue), then aggregate
    sum(k)/count per event_type with a partial pre-aggregation before
    the groupby shuffle."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from moonray.sources.json_ingest import JsonToRows

    path = os.path.join(sf_dir, "events.parquet")
    ds = rd.read_parquet(path, columns=["event_type", "props"])
    ds = ds.map_batches(
        JsonToRows(pa.schema([("k", pa.int64())]), json_col="props",
                   keep_cols=("event_type",)),
        batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        # pure-Arrow partial agg (a pandas detour per batch costs a full
        # copy and risks nullable-int → float64 coercion); count mode
        # "all" = SQL count(*) incl. null k
        g = b.group_by("event_type", use_threads=False).aggregate(
            [("k", "count", pc.CountOptions(mode="all")), ("k", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "n_events": g["k_count"].cast(pa.int64()),
                         "sum_k": g["k_sum"].cast(pa.int64())})

    partial.__name__ = "partial_agg"
    ds = ds.map_batches(partial, batch_format="pyarrow")
    return (ds.groupby("event_type")
              .aggregate(Sum("n_events", alias_name="n_events"),
                         Sum("sum_k", alias_name="sum_k")))


def sessionize_events(sf_dir: str, gap_sec: int = 1800,
                      buckets: int | None = None):
    """Streaming-shaped sessionization: per-user sessions split at event
    gaps > gap_sec; emits one row per session (user_id, session_start_us,
    n_events, duration_us). Classic gaps-and-islands — per-user event
    streams are totally ordered, so users hash-bucket into groups and
    each group sessionizes its users vectorized (no per-user Python
    group calls; the shuffle carries only ts/user_id columns)."""
    import ray.data as rd

    from moonray.util import default_buckets

    path = os.path.join(sf_dir, "events.parquet")
    gap_us = gap_sec * 1_000_000
    buckets = buckets or default_buckets()

    def bucketed(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        from moonray.util import splitmix64

        return pa.table({
            "user_id": b["user_id"],
            "ts_us": b["ts"].cast(pa.int64()),
            "_bkt": pa.array((splitmix64(uid) % np.uint64(buckets)).astype(np.int32)),
        })

    def sessionize(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_start_us": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64()),
                             "duration_us": pa.array([], pa.int64())})
        t = group.sort_by([("user_id", "ascending"), ("ts_us", "ascending")])
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts_us"].to_numpy(zero_copy_only=False)
        new_sess = np.ones(len(t), dtype=bool)
        new_sess[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], len(t)) - 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_start_us": pa.array(ts[starts], pa.int64()),
            "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            "duration_us": pa.array((ts[ends] - ts[starts]).astype(np.int64)),
        })

    sessionize.__name__ = "sessionize"
    ds = rd.read_parquet(path, columns=["ts", "user_id"])
    ds = ds.map_batches(bucketed, batch_format="pyarrow")
    return ds.groupby("_bkt").map_groups(sessionize, batch_format="pyarrow")


def tumbling_window_events(sf_dir: str, window_sec: int = 3600):
    """Streaming-shaped operator: tumbling event-time windows per user
    (count + int-cent sum for exact SQL parity). Pre-aggregates inside
    map_batches before the (user, window) groupby — partial aggregation
    so the shuffle carries one row per (user, window) per batch."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    path = os.path.join(sf_dir, "events.parquet")

    def add_window(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = us // (window_sec * 1_000_000)
        # half-up rounding (floor(x+0.5)) so DuckDB can reproduce exactly —
        # np.round's half-to-even would diverge on exact .5 cents
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "user_id": b["user_id"],
            "win": pa.array(win, pa.int64()),
            "value_cents": pa.array(cents, pa.int64()),
        })

    def partial(b: pa.Table) -> pa.Table:
        # pure-Arrow partial agg — see json_props_agg.partial
        g = b.group_by(["user_id", "win"], use_threads=False).aggregate(
            [("value_cents", "count", pc.CountOptions(mode="all")),
             ("value_cents", "sum")])
        return pa.table({"user_id": g["user_id"], "win": g["win"],
                         "n_events": g["value_cents_count"].cast(pa.int64()),
                         "sum_cents": g["value_cents_sum"].cast(pa.int64())})

    partial.__name__ = "partial_agg"
    ds = rd.read_parquet(path, columns=["ts", "user_id", "value"])
    ds = ds.map_batches(add_window, batch_format="pyarrow")
    ds = ds.map_batches(partial, batch_format="pyarrow")
    return (ds.groupby(["user_id", "win"])
              .aggregate(Sum("n_events", alias_name="n_events"),
                         Sum("sum_cents", alias_name="sum_cents")))


def avro_ingest_agg(sf_dir: str):
    """Kafka-shaped Avro ingest end-to-end (reference avro_converter.rs
    path): events rows → Avro binary datums (synthesized stream) →
    AvroToRows decode stage → exact integer-cent aggregate per
    event_type. The decode half is what production runs; the encode half
    stands in for the Kafka producer."""
    import ray.data as rd

    from moonray.sources.avro_ingest import (AvroToRows, encode_avro,
                                             parse_avro_schema)

    schema_json = ('{"type":"record","name":"ev","fields":['
                   '{"name":"user_id","type":"long"},'
                   '{"name":"event_type","type":"string"},'
                   '{"name":"value","type":"double"}]}')
    schema = parse_avro_schema(schema_json)

    def encode(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_pylist()
        et = b["event_type"].to_pylist()
        val = b["value"].to_pylist()
        datums = [encode_avro(schema, {"user_id": u, "event_type": e,
                                       "value": v})
                  for u, e, v in zip(uid, et, val)]
        return pa.table({"value": pa.array(datums, pa.binary())})

    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["user_id", "event_type", "value"])
    from moonray.util import as_fn

    rows = ds.map_batches(encode, batch_format="pyarrow").map_batches(
        as_fn(AvroToRows(schema_json)), batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100
                         + 0.5).astype(np.int64)
        t = pa.table({"event_type": b["event_type"],
                      "value_cents": pa.array(cents, pa.int64())})
        g = t.group_by("event_type", use_threads=False).aggregate(
            [("value_cents", "count", pc.CountOptions(mode="all")),
             ("value_cents", "sum")])
        return pa.table({"event_type": g["event_type"],
                         "n_events": g["value_cents_count"].cast(pa.int64()),
                         "sum_cents": g["value_cents_sum"].cast(pa.int64())})

    partial.__name__ = "partial_agg"
    from ray.data.aggregate import Sum

    return (rows.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_cents", alias_name="sum_cents")))


def otel_metrics_agg(sf_dir: str):
    """OTEL metrics ingest end-to-end (reference otel_to_moonlink_pb.rs
    path): events rows → OTLP-JSON ExportMetricsServiceRequest payloads
    (one gauge data point per event; synthesized collector stream) →
    OtelToRows point-row decode stage → exact integer-cent aggregate per
    metric name. The decode half is what production runs; the encode
    half stands in for the OTLP/HTTP collector."""
    import ray.data as rd

    from moonray.sources.otel_ingest import OtelToRows

    def encode(b: pa.Table) -> pa.Table:
        import json

        ts = b["ts"].cast(pa.int64()).to_pylist()          # µs since epoch
        et = b["event_type"].to_pylist()
        val = b["value"].to_pylist()
        uid = b["user_id"].to_pylist()
        points: dict[str, list] = {}
        for t, e, v, u in zip(ts, et, val, uid):
            points.setdefault(e, []).append({
                "timeUnixNano": str(int(t) * 1000),
                "asDouble": float(v),
                "attributes": [
                    {"key": "user_id", "value": {"intValue": str(int(u))}}],
            })
        req = {"resourceMetrics": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "events"}}]},
            "scopeMetrics": [{
                "scope": {"name": "moonray.fixture"},
                "metrics": [{"name": name, "unit": "1",
                             "gauge": {"dataPoints": dps}}
                            for name, dps in sorted(points.items())],
            }],
        }]}
        return pa.table({"payload": pa.array([json.dumps(req)], pa.string())})

    encode.__name__ = "otlp_encode"
    ds = rd.read_parquet(os.path.join(sf_dir, "events.parquet"),
                         columns=["ts", "event_type", "value", "user_id"])
    from moonray.util import as_fn

    rows = ds.map_batches(encode, batch_format="pyarrow").map_batches(
        as_fn(OtelToRows()), batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        cents = np.floor(b["value_double"].to_numpy(zero_copy_only=False)
                         * 100 + 0.5).astype(np.int64)
        t = pa.table({"name": b["name"],
                      "value_cents": pa.array(cents, pa.int64())})
        g = t.group_by("name", use_threads=False).aggregate(
            [("value_cents", "count", pc.CountOptions(mode="all")),
             ("value_cents", "sum")])
        return pa.table({"name": g["name"],
                         "n_points": g["value_cents_count"].cast(pa.int64()),
                         "sum_cents": g["value_cents_sum"].cast(pa.int64())})

    partial.__name__ = "partial_agg"
    from ray.data.aggregate import Sum

    return (rows.map_batches(partial, batch_format="pyarrow")
            .groupby("name")
            .aggregate(Sum("n_points", alias_name="n_points"),
                       Sum("sum_cents", alias_name="sum_cents")))


def hopping_window_events(sf_dir: str, window_sec: int = 3600,
                          hop_sec: int = 900):
    """Hopping (sliding) event-time windows: each event lands in
    window_sec/hop_sec overlapping windows (win = start index in hops).
    The ×k window fan-out happens vectorized inside map_batches
    (np.repeat/tile), partial-aggregated per (user, win) before the
    groupby shuffle — the shuffle carries one row per group per batch,
    not ×k event rows."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    assert window_sec % hop_sec == 0
    k = window_sec // hop_sec
    hop_us = hop_sec * 1_000_000
    path = os.path.join(sf_dir, "events.parquet")

    def fanout_partial(b: pa.Table) -> pa.Table:
        us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        cents = np.floor(b["value"].to_numpy(zero_copy_only=False) * 100
                         + 0.5).astype(np.int64)
        base = us // hop_us
        win = np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64),
                                           len(us))
        t = pa.table({
            "user_id": pa.array(np.repeat(uid, k), pa.int64()),
            "win": pa.array(win, pa.int64()),
            "value_cents": pa.array(np.repeat(cents, k), pa.int64()),
        })
        g = t.group_by(["user_id", "win"], use_threads=False).aggregate(
            [("value_cents", "count", pc.CountOptions(mode="all")),
             ("value_cents", "sum")])
        return pa.table({"user_id": g["user_id"], "win": g["win"],
                         "n_events": g["value_cents_count"].cast(pa.int64()),
                         "sum_cents": g["value_cents_sum"].cast(pa.int64())})

    fanout_partial.__name__ = "hop_fanout_partial"
    ds = rd.read_parquet(path, columns=["ts", "user_id", "value"])
    return (ds.map_batches(fanout_partial, batch_format="pyarrow")
            .groupby(["user_id", "win"])
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("sum_cents", alias_name="sum_cents")))


def iceberg_export_scan(sf_dir: str):
    """bulk load customer → MERGE orders-derived CDC → export to an
    Iceberg v3 table (incremental: once pre-merge, once post-merge so
    the second commit ships only new files + DV puffin blobs) → replay
    the ICEBERG state independently (read_iceberg_table). The driver's
    DuckDB oracle is the same MERGE SQL, so value-equality proves the
    exported metadata/manifests/DVs reconstruct the table exactly."""
    from moonray.sinks.iceberg import export_iceberg, read_iceberg_table
    from moonray.util import scratch_root

    t = build_customer_table(sf_dir)
    dest = scratch_root("moonray-ice-")
    export_iceberg(t, dest)
    t.merge(_changes_dataset(sf_dir))
    export_iceberg(t, dest)
    return read_iceberg_table(dest)


# ---------------- extended-type MERGE (decimal/date/ts/uuid) ----------------

# epoch-day of 1992-01-01 — the typed fixtures' date base
_TYPED_DAY0 = 8035
_TYPED_US0 = _TYPED_DAY0 * 86_400_000_000


def _md5_uid(keys) -> "pa.Array":
    import hashlib

    return pa.array([hashlib.md5(str(int(k)).encode()).digest()
                     for k in keys], pa.binary(16))


def _typed_customer_batch(b: pa.Table) -> pa.Table:
    """customer batch → the typed base table: price DECIMAL(12,2) from
    half-up acctbal cents, day DATE32, ts TIMESTAMP(µs), uid
    FixedSizeBinary[16] = md5(custkey). Every derivation is mirrored
    digit-for-digit by the typed_columns_merge SQL oracle."""
    from moonray.types import unscaled_to_decimal

    ck = b["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    cents = np.floor(b["c_acctbal"].to_numpy(zero_copy_only=False)
                     * 100.0 + 0.5).astype(np.int64)
    return pa.table({
        "k": pa.array(ck, pa.int64()),
        "price": unscaled_to_decimal(cents, 12, 2),
        "day": pa.array((_TYPED_DAY0 + ck % 2557).astype(np.int32),
                        pa.date32()),
        "ts": pa.array(_TYPED_US0 + (ck * 13 % 86400) * 1_000_000,
                       pa.timestamp("us")),
        "uid": _md5_uid(ck),
    })


def _typed_changes_batch(b: pa.Table) -> pa.Table:
    """orders batch → typed CDC rows (same op scheme as
    orders_to_changes: o_orderkey % 10 → 0-1 D, 2-4 I on shifted keys,
    5-9 U; lsn = o_orderkey)."""
    from moonray.types import unscaled_to_decimal

    ok = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ck = b["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
    sel = ok % 10
    op = np.where(sel < 2, "D", np.where(sel < 5, "I", "U"))
    key = np.where((sel >= 2) & (sel < 5), ck + INSERT_KEY_SHIFT, ck)
    is_del = op == "D"
    cents = np.floor(tp * 100.0 + 0.5).astype(np.int64)
    price = unscaled_to_decimal(cents, 12, 2)
    day = pa.array((_TYPED_DAY0 + 30 + ok % 2557).astype(np.int32),
                   pa.date32())
    ts = pa.array(_TYPED_US0 + (ok * 7 % 86400) * 1_000_000,
                  pa.timestamp("us"))
    uid = _md5_uid(key)
    dmask = pa.array(is_del)
    import pyarrow.compute as _pc

    def null_if_del(col):
        return _pc.if_else(dmask, pa.nulls(len(col), col.type), col)

    return pa.table({
        "op": pa.array(op.tolist(), pa.string()),
        "lsn": pa.array(ok, pa.int64()),
        "k": pa.array(key, pa.int64()),
        "price": null_if_del(price),
        "day": null_if_del(day),
        "ts": null_if_del(ts),
        "uid": null_if_del(uid),
    })


def typed_columns_merge(sf_dir: str):
    """MERGE over a table whose payload spans the extended type palette
    (decimal(12,2), date32, timestamp µs, FixedSizeBinary[16]) — the
    reference ingest data model's typed half
    (src/moonlink/src/row/moonlink_type.rs:5-21). The table STORES true
    Arrow extended types (zone maps on the decimal and date columns
    prune by the order-preserving encodings in moonray/types.py); only
    the final projection casts to SQL-robust primitives (unscaled
    cents, epoch days, epoch µs, hex) so the driver's dtype-sensitive
    hash compares exactly."""
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.types import decimal_to_unscaled
    from moonray.util import scratch_root

    schema = pa.schema([
        ("k", pa.int64()), ("price", pa.decimal128(12, 2)),
        ("day", pa.date32()), ("ts", pa.timestamp("us")),
        ("uid", pa.binary(16)),
    ])
    t = MoonrayTable.create(scratch_root("moonray-typed-"), key_col="k",
                            schema=schema, zone_cols=("price", "day"),
                            index_partitions=8, rows_per_fragment=256)
    t.bulk_load(rd.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_acctbal"],
    ).map_batches(_typed_customer_batch, batch_format="pyarrow"))
    t.merge(rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(_typed_changes_batch, batch_format="pyarrow"))

    def project(b: pa.Table) -> pa.Table:
        import polars as pl

        return pa.table({
            "k": b["k"],
            "price_cents": pa.array(decimal_to_unscaled(b["price"]),
                                    pa.int64()),
            "day_num": pc.cast(pc.cast(b["day"], pa.int32()), pa.int64()),
            "ts_us": pc.cast(b["ts"], pa.int64()),
            "uid_hex": pl.from_arrow(b["uid"].combine_chunks())
            .bin.encode("hex").to_arrow().cast(pa.string()),
        })

    project.__name__ = "typed_to_primitives"
    return t.scan().map_batches(project, batch_format="pyarrow")

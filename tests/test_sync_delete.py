"""delete_where (predicate deletes) + sync_incremental (changelog-fed
materialized view) vs pandas oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _scan_df(t, **kw):
    df = t.scan(**kw).to_pandas()
    return df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True)


def _cust_df():
    return pq.read_table(f"{SF}/customer.parquet").to_pandas()


def test_delete_where_matches_pandas():
    from moonray.pipelines.relational import build_customer_table

    t = build_customer_table(SF)
    t.delete_where(lambda b: pc.less(b["c_acctbal"], 1000.0), lsn=1,
                   columns=("c_acctbal",),
                   predicate_ranges={"c_acctbal": (-1e12, 1000.0)})
    got = _scan_df(t)
    df = _cust_df()
    want = df[~(df.c_acctbal < 1000.0)]
    want = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), ignore_index=True)
    pd.testing.assert_frame_equal(got, want)
    # deleted rows leave the index too (point lookups miss)
    dead = df[df.c_acctbal < 1000.0].c_custkey.head(5).tolist()
    assert len(t.lookup(dead)) == 0


def test_delete_where_append_only_rejected():
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    schema = pa.schema([("k", pa.int64()), ("v", pa.float64())])
    t = MoonrayTable.create(scratch_root("mr-ao-del-"), identity="none",
                            schema=schema)
    t.bulk_load(rd.from_arrow(pa.table({"k": [1, 2], "v": [0.5, 1.5]})))
    with pytest.raises(ValueError, match="append-only"):
        t.delete_where(lambda b: pc.greater(b["v"], 1.0), lsn=1)


def _view_oracle(df):
    want = df[df.c_nationkey < 13]
    return want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), ignore_index=True)


def test_sync_incremental_view_tracks_source():
    import pyarrow as pa

    from moonray.pipelines.relational import (_changes_dataset,
                                              build_customer_table)
    from moonray.sync import last_synced_version, sync_incremental
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    src = build_customer_table(SF)
    schema = src.schema()
    dst = MoonrayTable.create(scratch_root("mr-view-"),
                              key_col="c_custkey", schema=schema,
                              rows_per_fragment=256, index_partitions=8)

    def in_view(b: pa.Table):
        return pc.less(b["c_nationkey"], 13)

    # full first sync (changes since version 0 include the bulk load)
    sync_incremental(src, dst, insert_filter=in_view)
    base = _cust_df()
    pd.testing.assert_frame_equal(_scan_df(dst), _view_oracle(base))

    # source advances: CDC merge (updates move rows in AND out of the
    # view; inserts land on a shifted key space; deletes remove)
    src.merge(_changes_dataset(SF))
    v = sync_incremental(src, dst, insert_filter=in_view)
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    sel = orders.o_orderkey % 10
    ch = pd.DataFrame({
        "op": np.where(sel < 2, "D", np.where(sel < 5, "I", "U")),
        "lsn": orders.o_orderkey,
        "c_custkey": np.where((sel >= 2) & (sel < 5),
                              orders.o_custkey + 10_000_000, orders.o_custkey),
        "c_name": "name-" + orders.o_orderkey.astype(str),
        "c_nationkey": (orders.o_orderkey % 25).astype("int32"),
        "c_acctbal": orders.o_totalprice,
        "c_mktsegment": "SEG",
    })
    w = (ch.sort_values("lsn").groupby("c_custkey").tail(1))
    merged = pd.concat([
        base[~base.c_custkey.isin(w.c_custkey)],
        w[w.op != "D"].drop(columns=["op", "lsn"]),
    ])
    pd.testing.assert_frame_equal(_scan_df(dst), _view_oracle(merged))

    # idempotent: nothing new → no-op, pointer stable
    assert sync_incremental(src, dst, insert_filter=in_view) == v
    assert last_synced_version(dst) == src.latest_version()


def test_sync_crash_between_merge_and_pointer_converges(monkeypatch):
    """Crash window: the sync's MERGE committed but the sync pointer
    write died. On retry the source has ALSO advanced, so the replay
    window (old_last, new_cur] is a superset of the already-applied
    window — last-writer-wins over the superset must converge to the
    same state as a clean history."""
    import pyarrow as pa
    import ray.data as rd

    import moonray.commitstore as cs
    from moonray.sync import sync_incremental
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])

    def mk(prefix):
        return MoonrayTable.create(scratch_root(prefix), key_col="k",
                                   schema=schema, rows_per_fragment=64,
                                   index_partitions=4)

    def changes(rows, lsn):
        return rd.from_arrow(pa.table({
            "op": pa.array([r[0] for r in rows], pa.string()),
            "lsn": pa.array([lsn] * len(rows), pa.int64()),
            "k": pa.array([r[1] for r in rows], pa.int64()),
            "v": pa.array([r[2] for r in rows], pa.string()),
        }))

    src, dst = mk("mr-sync-a-"), mk("mr-sync-b-")
    src.bulk_load(rd.from_arrow(pa.table({
        "k": pa.array(range(20), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(20)], pa.string())})))
    sync_incremental(src, dst)
    src.merge(changes([("U", 3, "A3"), ("D", 4, "")], lsn=100))

    class CrashOnSyncPointer:
        """Passthrough store that dies ONLY on sync/* pointer writes —
        the table's own versions/LATEST publish must keep working so
        the merge half of the sync lands (that's the crash window)."""

        def __init__(self, inner):
            self._inner = inner

        def set_pointer(self, name, value):
            if name.startswith("sync"):
                raise RuntimeError("injected crash before sync pointer write")
            return self._inner.set_pointer(name, value)

        def __getattr__(self, name):
            return getattr(self._inner, name)

    real = cs.store_for
    monkeypatch.setattr(cs, "store_for",
                        lambda root: (CrashOnSyncPointer(real(root))
                                      if root == dst.root else real(root)))
    try:
        sync_incremental(src, dst)
        raise AssertionError("expected injected crash")
    except RuntimeError:
        pass
    monkeypatch.setattr(cs, "store_for", real)
    assert dst.scan().count() == 19  # the merge half DID land

    # source advances AGAIN before the retry → superset window replay
    src.merge(changes([("U", 3, "B3"), ("I", 99, "new")], lsn=200))
    sync_incremental(src, dst)

    got = {r["k"]: r["v"] for r in dst.scan().take_all()}
    want = {i: f"v{i}" for i in range(20)}
    want[3] = "B3"
    del want[4]
    want[99] = "new"
    assert got == want


def test_delete_where_composite_key():
    import pyarrow.compute as pc
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    schema = pa.schema([
        ("c_custkey", pa.int64()), ("c_name", pa.string()),
        ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
        ("c_mktsegment", pa.string()),
    ])
    t = MoonrayTable.create(scratch_root("mr-ck-del-"),
                            key_cols=["c_nationkey", "c_custkey"],
                            schema=schema, rows_per_fragment=256,
                            index_partitions=8)
    t.bulk_load(rd.read_parquet(f"{SF}/customer.parquet"))
    t.delete_where(lambda b: pc.greater(b["c_acctbal"], 5000.0), lsn=1,
                   columns=("c_acctbal",))
    got = _scan_df(t)
    df = _cust_df()
    want = df[~(df.c_acctbal > 5000.0)]
    want = want[sorted(want.columns)].sort_values(
        by=sorted(want.columns), ignore_index=True)
    pd.testing.assert_frame_equal(got, want)

"""Remote (object-store) table roots — read path end-to-end.

A table committed on shared storage must be openable and scannable from
a root that is NOT a local filesystem path: the metadata plane
(LATEST pointer, version manifests, pins) reads through the commit
store (commitstore.py) and the data plane (fragments, DV deltas, index
files) through the worker-local file cache (filecache.py). ``mock://``
is the emulated object store wired into both layers.

Reference analogue: the published Iceberg snapshots are readable by any
engine straight from S3 (src/moonlink/src/storage/table/iceberg/),
while exactly one TableHandler owns writes.
"""

import pyarrow as pa
import pytest

from moonray.commitstore import MockCommitStore
from moonray.table import MoonrayTable


@pytest.fixture()
def committed_table(tmp_path):
    root = str(tmp_path / "tbl")
    schema = pa.schema([("id", pa.int64()), ("payload", pa.binary()),
                        ("size", pa.int32())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            zone_cols=("size",), index_partitions=4,
                            rows_per_fragment=64)
    data = pa.table({
        "id": pa.array(range(200), pa.int64()),
        "payload": pa.array([bytes([i % 251]) * (50 + i) for i in range(200)],
                            pa.binary()),
        "size": pa.array([50 + i for i in range(200)], pa.int32()),
    })
    import ray.data as rd

    t.bulk_load(rd.from_arrow(data))
    changes = pa.table({
        "op": pa.array(["D"] * 10 + ["U"] * 5, pa.string()),
        "lsn": pa.array(range(1, 16), pa.int64()),
        "id": pa.array(list(range(10)) + list(range(20, 25)), pa.int64()),
        "payload": pa.array([None] * 10 + [b"upd"] * 5, pa.binary()),
        "size": pa.array([None] * 10 + [3] * 5, pa.int32()),
    })
    t.merge(rd.from_arrow(changes))
    return root, t


def test_open_and_scan_via_mock_root(committed_table):
    root, local = committed_table
    remote = MoonrayTable.open("mock://" + root)

    assert remote.describe() == local.describe()
    assert remote.versions() == local.versions()
    assert [h["commit_lsn"] for h in remote.history()] == \
           [h["commit_lsn"] for h in local.history()]

    got = remote.scan().take_all()
    want = local.scan().take_all()
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(got, key=key) == sorted(want, key=key)
    # DV applied: the 10 deleted ids are gone
    assert {r["id"] for r in got}.isdisjoint(set(range(10)))

    # snapshot read at an explicit version (pre-merge) still works
    v0 = remote.versions()[-2]
    assert remote.scan(version=v0).count() == 200


def test_metadata_reads_go_through_the_store(committed_table):
    root, _ = committed_table
    MockCommitStore.op_counts.clear()
    remote = MoonrayTable.open("mock://" + root)
    remote.describe()
    counts = dict(MockCommitStore.op_counts)
    assert counts.get("read_pointer", 0) >= 1  # LATEST
    assert counts.get("read", 0) >= 1          # manifest json


def test_unwired_scheme_rejects_writes(tmp_path):
    """Schemes whose commit-store write plane isn't implemented in this
    container (s3://) fail fast at _assert_writable, before any data
    moves."""
    schema = pa.schema([("id", pa.int64())])
    with pytest.raises(NotImplementedError, match="S3 commit store"):
        MoonrayTable.create("s3://bucket/t", schema=schema, key_col="id")


def _mk(root, schema):
    return MoonrayTable.create(root, key_col="id", schema=schema,
                               zone_cols=("size",), index_partitions=4,
                               rows_per_fragment=64)


def test_remote_root_full_write_path(tmp_path):
    """The whole write plane against an object-store root: create →
    bulk load → MERGE → full maintenance → cluster → expire → scan +
    lookup, value-for-value identical to the same job against a local
    root. Published artifacts go through the commit store (blind puts
    of complete objects — no rename, no append); coordination state
    lands on the scratch plane — the DEFAULT scratch base here, because
    $MOONRAY_SCRATCH must be visible to every Ray worker, and the
    long-lived session workers predate any per-test monkeypatch (on a
    real cluster: set it cluster-wide, e.g. via runtime_env)."""
    import ray.data as rd

    from moonray.commitstore import MockCommitStore
    schema = pa.schema([("id", pa.int64()), ("payload", pa.binary()),
                        ("size", pa.int32())])
    data = pa.table({
        "id": pa.array(range(200), pa.int64()),
        "payload": pa.array([bytes([i % 251]) * (50 + i) for i in range(200)],
                            pa.binary()),
        "size": pa.array([50 + i for i in range(200)], pa.int32()),
    })
    changes = pa.table({
        "op": pa.array(["D"] * 10 + ["U"] * 5, pa.string()),
        "lsn": pa.array(range(1, 16), pa.int64()),
        "id": pa.array(list(range(10)) + list(range(20, 25)), pa.int64()),
        "payload": pa.array([None] * 10 + [b"upd"] * 5, pa.binary()),
        "size": pa.array([None] * 10 + [3] * 3 + [4] * 2, pa.int32()),
    })

    def drive(t):
        t.bulk_load(rd.from_arrow(data))
        t.merge(rd.from_arrow(changes))
        t.optimize("full")
        t.cluster()
        t.expire_snapshots(keep_last=1)
        return t

    remote_backing = str(tmp_path / "obj")
    r = drive(_mk("mock://" + remote_backing, schema))
    l = drive(_mk(str(tmp_path / "local"), schema))  # noqa: E741

    # artifacts were uploaded into the object store (puts happen inside
    # Ray workers, so assert on the store contents, not driver counters)
    assert MockCommitStore("mock://" + remote_backing).list("fragments")
    assert MockCommitStore("mock://" + remote_backing).list("index")
    key = lambda row: row["id"]  # noqa: E731
    assert sorted(r.scan().take_all(), key=key) == \
        sorted(l.scan().take_all(), key=key)
    assert r.describe()["cardinality"] == l.describe()["cardinality"] == 190
    # index-served lookups off the remote root
    got = {row["id"]: row["size"] for row in r.lookup([0, 20, 50]).to_pylist()}
    assert got == {20: 3, 50: 100}
    # nothing but objects under the backing dir: no .tmp litter at rest
    import os as _os

    stray = [f for _d, _s, fs in _os.walk(remote_backing)
             for f in fs if ".tmp" in f]
    assert stray == []

    import shutil as _shutil

    from moonray.storage import scratch_for

    _shutil.rmtree(scratch_for("mock://" + remote_backing), ignore_errors=True)


def test_duckdb_view_over_mock_root(committed_table):
    import duckdb

    root, local = committed_table
    remote = MoonrayTable.open("mock://" + root)
    con = duckdb.connect()
    remote.duckdb_view(con, "r")
    n = con.sql("SELECT count(*) FROM r").fetchone()[0]
    assert n == local.scan().count()


def test_remote_warehouse_catalog(tmp_path):
    """A whole warehouse on the object store: registry + table lifecycle
    through the commit store, data through the write plane."""
    import ray.data as rd
    import shutil as _shutil

    from moonray.catalog import MoonrayCatalog
    from moonray.commitstore import MockCommitStore
    from moonray.storage import scratch_for

    wh = "mock://" + str(tmp_path / "wh")
    cat = MoonrayCatalog(wh)
    schema = pa.schema([("id", pa.int64()), ("v", pa.string())])
    t = cat.create_table("docs", key_col="id", schema=schema,
                         index_partitions=4, rows_per_fragment=32)
    assert cat.table_exists("docs") and "docs" in cat.list_tables()
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(50), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(50)], pa.string()),
    })))
    reopened = cat.open_table("docs")
    assert reopened.scan().count() == 50
    # drop removes registry entry AND the table's objects by prefix
    root = cat.list_tables()["docs"]["root"]
    cat.drop_table("docs")
    assert not cat.table_exists("docs")
    assert MockCommitStore(wh).list("docs") == []
    _shutil.rmtree(scratch_for(root), ignore_errors=True)


def test_clone_from_remote_root(committed_table, tmp_path):
    """A LOCAL clone of a table whose root is an object store: ext
    refs embed the mock:// root, reads recurse through the worker file
    cache, COW writes stay local."""
    import ray.data as rd

    from moonray.clone import clone_table

    root, local = committed_table
    remote = MoonrayTable.open("mock://" + root)
    c = clone_table(remote, str(tmp_path / "local-clone"))
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(c.scan().take_all(), key=key) == \
        sorted(local.scan().take_all(), key=key)
    # COW write on the clone never touches the remote source
    v_src = remote.latest_version()
    c.merge(rd.from_arrow(pa.table({
        "op": pa.array(["U"], pa.string()),
        "lsn": pa.array([99], pa.int64()),
        "id": pa.array([30], pa.int64()),
        "payload": pa.array([b"cow"], pa.binary()),
        "size": pa.array([3], pa.int32()),
    })))
    assert remote.latest_version() == v_src
    got = {r["id"]: r["payload"] for r in c.scan().take_all()}
    assert got[30] == b"cow"
    # point lookup rides the remote index files through ext refs
    assert c.lookup([30])["payload"][0].as_py() == b"cow"

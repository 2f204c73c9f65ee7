"""Changelog read (CDC out) — table.changes(from_v, to_v).

Logical change semantics: updates = delete+insert (the engine's own
CDC-in decomposition); maintenance/ALTER commits contribute nothing;
cost is O(changed rows) derived from commit metadata (new fragments +
new DV delta files per step), never a table scan.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.table import MoonrayTable


@pytest.fixture()
def table(tmp_path):
    root = str(tmp_path / "tbl")
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            index_partitions=4, rows_per_fragment=32)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(100), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(100)], pa.string()),
    })))
    return t


def _by_type(rows):
    out = {"insert": {}, "delete": {}}
    for r in rows:
        out[r["change_type"]][r["id"]] = r["val"]
    return out


def test_merge_changes(table):
    t = table
    v1 = t.latest_version()
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D", "D", "U", "U", "I"], pa.string()),
        "lsn": pa.array(range(1, 6), pa.int64()),
        "id": pa.array([0, 1, 10, 11, 500], pa.int64()),
        "val": pa.array([None, None, "u10", "u11", "new"], pa.string()),
    })))
    ch = _by_type(t.changes(v1).take_all())
    # deletes carry the OLD values; updates emit delete + insert
    assert ch["delete"] == {0: "v0", 1: "v1", 10: "v10", 11: "v11"}
    assert ch["insert"] == {10: "u10", 11: "u11", 500: "new"}


def test_maintenance_contributes_nothing(table):
    t = table
    v1 = t.latest_version()
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D", "U"], pa.string()),
        "lsn": pa.array([1, 2], pa.int64()),
        "id": pa.array([5, 6], pa.int64()),
        "val": pa.array([None, "u6"], pa.string()),
    })))
    before = sorted(t.changes(v1).take_all(), key=lambda r: (r["id"], r["change_type"]))
    t.optimize("full")
    t.cluster(cols=["id"])
    after_rows = t.changes(v1).take_all()
    after = sorted(after_rows, key=lambda r: (r["id"], r["change_type"]))
    assert [dict(r, commit_version=0) for r in after] == \
        [dict(r, commit_version=0) for r in before]
    v_mid = before[0]["commit_version"]
    # a window that contains ONLY maintenance commits is empty
    assert t.changes(v_mid).take_all() == []


def test_bulk_load_is_inserts(table):
    t = table
    ch = t.changes(0).take_all()
    assert len(ch) == 100
    assert {r["change_type"] for r in ch} == {"insert"}
    assert {r["commit_version"] for r in ch} == {t.latest_version()}


def test_multi_step_attribution(table):
    t = table
    v1 = t.latest_version()
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["U"], pa.string()), "lsn": pa.array([1], pa.int64()),
        "id": pa.array([3], pa.int64()), "val": pa.array(["a"], pa.string()),
    })))
    v2 = t.latest_version()
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["U"], pa.string()), "lsn": pa.array([2], pa.int64()),
        "id": pa.array([3], pa.int64()), "val": pa.array(["b"], pa.string()),
    })))
    v3 = t.latest_version()
    rows = t.changes(v1).take_all()
    steps = {(r["commit_version"], r["change_type"]): r["val"] for r in rows}
    assert steps == {(v2, "delete"): "v3", (v2, "insert"): "a",
                     (v3, "delete"): "a", (v3, "insert"): "b"}
    # half-open window: only the second step
    assert {(r["change_type"], r["val"])
            for r in t.changes(v2, v3).take_all()} == \
        {("delete", "a"), ("insert", "b")}


def test_bad_range_rejected(table):
    with pytest.raises(ValueError, match="from_version"):
        table.changes(5, 1)


def test_timestamp_time_travel(table):
    """scan(as_of=ts) resolves the version committed at or before ts
    (Iceberg snapshot-as-of-timestamp analogue)."""
    import time

    t = table
    ts_pre = time.time()
    time.sleep(0.02)
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D"] * 20, pa.string()),
        "lsn": pa.array(range(1, 21), pa.int64()),
        "id": pa.array(range(20), pa.int64()),
        "val": pa.array([None] * 20, pa.string()),
    })))
    assert t.version_as_of(ts_pre) < t.latest_version()
    assert t.scan(as_of=ts_pre).count() == 100
    assert t.scan(as_of=time.time()).count() == 80
    assert t.history()[-1]["committed_at"] is not None
    with pytest.raises(ValueError, match="no version"):
        t.version_as_of(0.0)


def test_incremental_cluster_touches_only_the_tail(table):
    """cluster(scope='incremental') sorts only fragments born since the
    last cluster pass; prior Z-sorted fragments survive by id (the
    LSM-style maintenance a 100 TB table needs — no full rewrite per
    round)."""
    t = table
    t.cluster(cols=["id"])  # full pass: everything becomes z- fragments
    sorted_ids = {f["id"] for f in t.manifest()["fragments"]}
    assert all(i.startswith("z-") for i in sorted_ids)
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["I"] * 10, pa.string()),
        "lsn": pa.array(range(1, 11), pa.int64()),
        "id": pa.array(range(1000, 1010), pa.int64()),
        "val": pa.array([f"n{i}" for i in range(10)], pa.string()),
    })))
    before = {r["id"]: r["val"] for r in t.scan().take_all()}
    t.cluster(cols=["id"], scope="incremental")
    after_frags = {f["id"] for f in t.manifest()["fragments"]}
    assert sorted_ids <= after_frags          # sorted set untouched
    assert all(i.startswith("z-") for i in after_frags)  # tail now sorted
    assert {r["id"]: r["val"] for r in t.scan().take_all()} == before
    # lookups still resolve through the appended index deltas
    assert t.lookup([1005]).to_pylist()[0]["val"] == "n5"
    # nothing to do → no-op commit
    v = t.latest_version()
    assert t.cluster(cols=["id"], scope="incremental") == v

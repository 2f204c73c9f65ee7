"""Index-served batch point lookup (reference GlobalIndex batch lookup,
hash_index.rs:392, and the object-store-served index_s3 variant).

Covers: post-MERGE visibility (updates win, deletes vanish), composite
keys, schema-evolution defaults, and the remote (mock://) root — the
same lookups answered entirely through the commit store + file cache.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.table import MoonrayTable


@pytest.fixture()
def merged_table(tmp_path):
    root = str(tmp_path / "tbl")
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            index_partitions=4, rows_per_fragment=32)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(100), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(100)], pa.string()),
    })))
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D"] * 5 + ["U"] * 5, pa.string()),
        "lsn": pa.array(range(1, 11), pa.int64()),
        "id": pa.array(list(range(5)) + list(range(10, 15)), pa.int64()),
        "val": pa.array([None] * 5 + ["updated"] * 5, pa.string()),
    })))
    return t


def test_lookup_after_merge(merged_table):
    t = merged_table
    got = t.lookup([0, 3, 10, 14, 50, 999])
    rows = {r["id"]: r["val"] for r in got.to_pylist()}
    assert rows == {10: "updated", 14: "updated", 50: "v50"}  # 0,3 deleted; 999 absent


def test_lookup_column_pruning_and_empty(merged_table):
    t = merged_table
    got = t.lookup([20, 21], columns=["val"])
    assert got.column_names == ["val"]
    assert sorted(got["val"].to_pylist()) == ["v20", "v21"]
    empty = t.lookup([])
    assert len(empty) == 0 and empty.column_names == ["id", "val"]


def test_lookup_version_pinned(merged_table):
    t = merged_table
    v1 = t.versions()[-2]  # post-bulk-load, pre-merge
    pre = t.lookup([0], version=v1)
    assert pre["val"].to_pylist() == ["v0"]  # deleted at head, live at v1
    assert len(t.lookup([0])) == 0


def test_lookup_survives_maintenance(merged_table):
    t = merged_table
    t.optimize("full")
    t.cluster(cols=["id"])
    rows = {r["id"]: r["val"] for r in t.lookup([0, 10, 50]).to_pylist()}
    assert rows == {10: "updated", 50: "v50"}


def test_lookup_composite_key(tmp_path):
    root = str(tmp_path / "ctbl")
    schema = pa.schema([("a", pa.string()), ("b", pa.int64()),
                        ("val", pa.string())])
    t = MoonrayTable.create(root, key_cols=["a", "b"], schema=schema,
                            index_partitions=4, rows_per_fragment=32)
    t.bulk_load(rd.from_arrow(pa.table({
        "a": pa.array(["x", "x", "y"], pa.string()),
        "b": pa.array([1, 2, 1], pa.int64()),
        "val": pa.array(["x1", "x2", "y1"], pa.string()),
    })))
    got = t.lookup([("x", 2), ("y", 1), ("y", 2)])
    rows = {(r["a"], r["b"]): r["val"] for r in got.to_pylist()}
    assert rows == {("x", 2): "x2", ("y", 1): "y1"}


def test_lookup_append_only_rejected(tmp_path):
    schema = pa.schema([("id", pa.int64())])
    t = MoonrayTable.create(str(tmp_path / "ao"), schema=schema,
                            identity="none")
    with pytest.raises(ValueError, match="append-only"):
        t.lookup([1])


def test_lookup_remote_root(merged_table):
    t = merged_table
    remote = MoonrayTable.open("mock://" + t.root)
    want = sorted(t.lookup([0, 10, 14, 50]).to_pylist(), key=lambda r: r["id"])
    got = sorted(remote.lookup([0, 10, 14, 50]).to_pylist(),
                 key=lambda r: r["id"])
    assert got == want


def test_lookup_reads_only_hit_row_groups(tmp_path, monkeypatch):
    """A 1-key lookup on a multi-row-group fragment must read only the
    row group holding the hit (VERDICT r2: full-fragment point reads
    turn a 10-key lookup over image fragments into gigabytes)."""
    import moonray.table as mt

    root = str(tmp_path / "tbl")
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    # rows_per_fragment=512 → rg_rows = max(64, 512//8) = 64: one
    # fragment, 8 row groups
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            index_partitions=4, rows_per_fragment=512)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(512), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(512)], pa.string()),
    })))
    m = t.manifest()
    assert len(m["fragments"]) == 1
    assert m["fragments"][0].get("rg_rows") == 64

    spans: list[tuple] = []
    real = mt._read_fragment

    def spy(*args, **kwargs):
        spans.append(kwargs.get("rg_span"))
        return real(*args, **kwargs)

    monkeypatch.setattr(mt, "_read_fragment", spy)
    got = t.lookup([300])
    assert {r["id"]: r["val"] for r in got.to_pylist()} == {300: "v300"}
    # offset 300 lives in row group 4 → exactly one single-group span
    assert spans == [(4, 5)]

    spans.clear()
    got = t.lookup([0, 1, 300, 511])
    assert len(got) == 4
    # groups {0, 4, 7} → spans (0,1), (4,5), (7,8); never a full read
    assert None not in spans
    assert sorted(spans) == [(0, 1), (4, 5), (7, 8)]

"""Reference-scenario parity tests on the F3 schema (the moonlink
unit-test/bench schema: id PK, name utf8, age int32 —
src/moonlink/src/storage/mooncake_table/mem_slice.rs:154-168) replaying
its canonical append/delete/commit shapes, plus the RPC-surface parity
(scan_begin/scan_end pinning, wait_for_commit_lsn, flush)."""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.table import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("age", pa.int32()),
])


def _mk(root):
    return MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                               index_partitions=4, rows_per_fragment=4)


def _scan_ids(t, version=None):
    batches = [b for b in t.scan(version).iter_batches(batch_format="pyarrow",
                                                       batch_size=1024)]
    if not batches:
        return []
    return sorted(pa.concat_tables(batches)["id"].to_pylist())


def _changes(rows):
    return rd.from_items(rows)


def test_append_delete_commit_scenario(tmp_path):
    """mem_slice.rs append-3 / delete-keys scenario: append rows 1,2,3;
    delete 2,3,1 across two batches; each commit is batch-atomic."""
    t = _mk(tmp_path / "f3")
    t.merge(_changes([
        {"op": "I", "lsn": 1, "id": 1, "name": "a", "age": 10},
        {"op": "I", "lsn": 2, "id": 2, "name": "b", "age": 20},
        {"op": "I", "lsn": 3, "id": 3, "name": "c", "age": 30},
    ]), job_id="b1")
    assert _scan_ids(t) == [1, 2, 3]
    v1 = t.latest_version()
    t.merge(_changes([
        {"op": "D", "lsn": 4, "id": 2, "name": None, "age": None},
        {"op": "D", "lsn": 5, "id": 3, "name": None, "age": None},
    ]), job_id="b2")
    assert _scan_ids(t) == [1]
    assert _scan_ids(t, version=v1) == [1, 2, 3]  # old snapshot intact
    t.merge(_changes([
        {"op": "D", "lsn": 6, "id": 1, "name": None, "age": None},
    ]), job_id="b3")
    assert _scan_ids(t) == []
    assert t.describe()["cardinality"] == 0


def test_update_is_delete_plus_append(tmp_path):
    """CDC Update ≡ Delete(old)+Append(new) (moonlink_sink.rs:295-326):
    the superseded row position must be dead, the new row visible."""
    t = _mk(tmp_path / "upd")
    t.merge(_changes([
        {"op": "I", "lsn": 1, "id": 7, "name": "old", "age": 1},
    ]), job_id="i")
    t.merge(_changes([
        {"op": "U", "lsn": 2, "id": 7, "name": "new", "age": 2},
    ]), job_id="u")
    rows = pa.concat_tables(
        [b for b in t.scan().iter_batches(batch_format="pyarrow",
                                          batch_size=64)]).to_pylist()
    assert rows == [{"id": 7, "name": "new", "age": 2}]
    m = t.manifest()
    # the old single-row fragment became fully dead → dropped from the
    # manifest entirely; only the new row's fragment remains
    assert len(m["fragments"]) == 1
    assert all(f["dv_count"] == 0 for f in m["fragments"])


def test_same_batch_insert_then_delete(tmp_path):
    """Within one commit, LSN order decides: I@1 then D@2 → key absent;
    D@1 then I@2 → key present (last-writer-wins dedup)."""
    t = _mk(tmp_path / "lww")
    t.merge(_changes([
        {"op": "I", "lsn": 1, "id": 1, "name": "x", "age": 1},
        {"op": "D", "lsn": 2, "id": 1, "name": None, "age": None},
        {"op": "D", "lsn": 3, "id": 2, "name": None, "age": None},
        {"op": "I", "lsn": 4, "id": 2, "name": "y", "age": 2},
    ]), job_id="lww")
    assert _scan_ids(t) == [2]


def test_scan_begin_end_lsn_visibility(tmp_path):
    t = _mk(tmp_path / "rpc")
    t.merge(_changes([
        {"op": "I", "lsn": 100, "id": 1, "name": "a", "age": 1},
    ]), job_id="b1")
    t.merge(_changes([
        {"op": "I", "lsn": 200, "id": 2, "name": "b", "age": 2},
    ]), job_id="b2")
    # read at lsn 100 → the FIRST version that covers it (not later ones)
    v, token = t.scan_begin(lsn=100)
    assert _scan_ids(t, version=v) == [1]
    # pinned version survives expiry while the token is held
    t.expire_snapshots(keep_last=1)
    assert _scan_ids(t, version=v) == [1]
    t.scan_end(token)
    with pytest.raises(TimeoutError):
        t.scan_begin(lsn=10_000)  # future LSN not yet durable
    assert t.wait_for_commit_lsn(200) == t.latest_version()


def test_flush_republishes(tmp_path):
    t = _mk(tmp_path / "flush")
    t.merge(_changes([
        {"op": "I", "lsn": 1, "id": 1, "name": "a", "age": 1},
    ]), job_id="b1")
    v = t.latest_version()
    v2 = t.flush()
    assert v2 == v + 1
    assert _scan_ids(t) == [1]
    assert t.manifest()["commit_lsn"] == 1


def test_history_fragments_sql(tmp_path):
    t = _mk(tmp_path / "meta")
    t.merge(_changes([
        {"op": "I", "lsn": 1, "id": 1, "name": "a", "age": 10},
        {"op": "I", "lsn": 2, "id": 2, "name": "b", "age": 20},
    ]), job_id="h1")
    t.merge(_changes([
        {"op": "D", "lsn": 3, "id": 2, "name": None, "age": None},
    ]), job_id="h2")
    h = t.history()
    assert [r["version"] for r in h] == [0, 1, 2]
    assert h[-1]["commit_lsn"] == 3 and h[-1]["job_id"] == "h2"
    fr = t.fragments()
    assert set(fr.column_names) >= {"id", "path", "rows", "bytes", "dv_count"}
    # DuckDB SQL over the snapshot honors the live deletion vector
    out = t.sql("SELECT count(*) AS n, sum(age) AS s FROM t")
    assert out.to_pylist() == [{"n": 1, "s": 10}]


def test_initial_copy_with_concurrent_replay(tmp_path):
    """Reference flow (pg_replicate.rs:244-309): CDC events buffered
    during the snapshot copy replay afterwards; events with
    lsn <= snapshot_lsn are already reflected in the snapshot and must
    not double-apply."""
    t = _mk(tmp_path / "ic")
    # snapshot at LSN 100 already reflects: row 1 updated, row 2 absent
    snapshot = rd.from_items([
        {"id": 1, "name": "a-upd", "age": 11},
        {"id": 3, "name": "c", "age": 30},
    ])
    # buffer overlaps the copy: lsn 90/95 are PRE-snapshot (skip), the
    # rest are post-snapshot (apply)
    buffered = _changes([
        {"op": "U", "lsn": 90, "id": 1, "name": "a-upd", "age": 11},
        {"op": "D", "lsn": 95, "id": 2, "name": None, "age": None},
        {"op": "I", "lsn": 110, "id": 4, "name": "d", "age": 40},
        {"op": "U", "lsn": 120, "id": 3, "name": "c2", "age": 31},
        {"op": "D", "lsn": 130, "id": 1, "name": None, "age": None},
    ])
    v = t.initial_copy(snapshot, buffered, snapshot_lsn=100, job_id="ic-1")
    assert t.manifest(v)["commit_lsn"] == 130
    rows = {r["id"]: r for b in t.scan().iter_batches(batch_format="pyarrow")
            for r in b.to_pylist()}
    assert set(rows) == {3, 4}
    assert rows[3]["name"] == "c2" and rows[4]["name"] == "d"
    # resume: identical call is a no-op at the same version
    assert t.initial_copy(snapshot, buffered, snapshot_lsn=100,
                          job_id="ic-1") == v

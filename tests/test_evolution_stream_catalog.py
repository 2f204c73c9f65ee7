"""Schema evolution (ALTER add/drop), streaming transactions
(commit/abort), catalog registry, staging GC."""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray import MoonrayCatalog, MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("age", pa.int32()),
])


def _rows(tbl):
    out = pa.concat_tables(
        [b for b in tbl.scan().iter_batches(batch_format="pyarrow", batch_size=4096)])
    return sorted(out.to_pylist(), key=lambda r: r["id"])


def _mk(root, **kw):
    """F3 reference-schema table (mem_slice.rs:154-168): id int32→int64 PK,
    name utf8, age int32."""
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8, **kw)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": 20 + i} for i in range(30)]))
    return t


def test_alter_add_column_with_default(tmp_path):
    t = _mk(tmp_path / "t1")
    t.alter(add_columns=[("score", pa.float64(), 1.5)])
    rows = _rows(t)
    assert all(r["score"] == 1.5 for r in rows)  # old fragments filled
    # new writes carry the column
    changes = rd.from_items([{
        "op": "U", "lsn": 10, "id": 0, "name": "upd", "age": 99, "score": 7.0}])
    t.merge(changes)
    rows = {r["id"]: r for r in _rows(t)}
    assert rows[0]["score"] == 7.0 and rows[0]["name"] == "upd"
    assert rows[1]["score"] == 1.5
    # compaction folds the default into rewritten fragments
    t.optimize("data", target_bytes=1 << 30, min_group=2)
    rows = {r["id"]: r for r in _rows(t)}
    assert rows[0]["score"] == 7.0 and rows[5]["score"] == 1.5


def test_merge_change_set_lagging_alter_fills_default(tmp_path):
    """A CDC source that hasn't learned about an ALTER yet sends change
    rows WITHOUT the new column; the merge fills the declared default
    (reference: json_converter fills missing nullable fields)."""
    t = _mk(tmp_path / "tlag")
    t.alter(add_columns=[("score", pa.float64(), 1.5)])
    # change set carries the PRE-alter schema
    t.merge(rd.from_items([
        {"op": "U", "lsn": 10, "id": 0, "name": "upd", "age": 99},
        {"op": "I", "lsn": 11, "id": 100, "name": "new", "age": 1},
    ]))
    rows = {r["id"]: r for r in _rows(t)}
    assert rows[0]["score"] == 1.5 and rows[0]["name"] == "upd"
    assert rows[100]["score"] == 1.5
    # append-only tables fill too
    t2 = MoonrayTable.create(str(tmp_path / "tnone"), key_col=None,
                             identity="none", schema=SCHEMA,
                             rows_per_fragment=8)
    t2.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": 20 + i} for i in range(5)]))
    t2.alter(add_columns=[("score", pa.float64(), 2.5)])
    t2.merge(rd.from_items(
        [{"op": "I", "lsn": 1, "id": 99, "name": "x", "age": 0}]))
    rows2 = {r["id"]: r for r in _rows(t2)}
    assert rows2[99]["score"] == 2.5 and rows2[0]["score"] == 2.5


def test_alter_drop_column(tmp_path):
    t = _mk(tmp_path / "t2")
    t.alter(drop_columns=["age"])
    rows = _rows(t)
    assert "age" not in rows[0]
    assert set(rows[0]) == {"id", "name"}
    with pytest.raises(ValueError):
        t.alter(drop_columns=["id"])  # key column undroppable
    with pytest.raises(ValueError):
        t.alter(add_columns=[("name", pa.string())])  # duplicate


def test_stream_xact_commit(tmp_path):
    t = _mk(tmp_path / "t3")
    x = t.stream_begin("x1")
    x.append(rd.from_items(
        [{"id": 100 + i, "name": f"s{i}", "age": 1} for i in range(5)]))
    x.append(rd.from_items([{"id": 0, "name": "replaced", "age": 2}]))
    x.delete(rd.from_items([{"id": 1}, {"id": 2}, {"id": 999}]))  # 999 missing
    before = t.latest_version()
    v = x.commit(lsn=50)
    assert v == before + 1  # ONE atomic commit
    rows = {r["id"]: r for r in _rows(t)}
    assert len(rows) == 30 + 5 - 2
    assert rows[0]["name"] == "replaced"
    assert 1 not in rows and 2 not in rows and 105 not in rows
    assert rows[104]["name"] == "s4"
    with pytest.raises(RuntimeError):
        x.append(rd.from_items([{"id": 1, "name": "x", "age": 1}]))


def test_stream_xact_lsn_domain(tmp_path):
    """A stream commit must record the caller's RAW lsn as commit_lsn —
    not a synthetic inflated value — so later CDC merges with ordinary
    LSNs still advance visibility and scan_begin(lsn) resolves the right
    snapshot (read-at-LSN rule)."""
    t = _mk(tmp_path / "t3b")
    x = t.stream_begin("xl")
    x.append(rd.from_items([{"id": 200, "name": "a", "age": 1}]))
    x.delete(rd.from_items([{"id": 200}]))  # seq tie-break: delete wins
    v_x = x.commit(lsn=3)
    assert t.manifest(v_x)["commit_lsn"] == 3
    rows = {r["id"] for r in _rows(t)}
    assert 200 not in rows  # later-seq delete beat the same-lsn append
    # a later CDC merge with a raw LSN must still raise commit_lsn …
    t.merge(rd.from_items(
        [{"op": "I", "lsn": 250, "id": 300, "name": "cdc", "age": 9}]))
    assert t.manifest()["commit_lsn"] == 250
    # … and scan_begin resolves to the post-merge version, not the xact's
    v, tok = t.scan_begin(lsn=250)
    assert v == t.latest_version()
    t.scan_end(tok)


def test_stream_xact_abort(tmp_path):
    t = _mk(tmp_path / "t4")
    state = _rows(t)
    x = t.stream_begin("x2")
    x.append(rd.from_items([{"id": 500, "name": "never", "age": 1}]))
    x.abort()
    assert _rows(t) == state  # untouched
    assert t.latest_version() == 1


@pytest.mark.parametrize("backend", ["json", "sqlite", "entry"])
def test_catalog_registry(tmp_path, backend):
    cat = MoonrayCatalog(str(tmp_path / "wh"), backend=backend)
    t = cat.create_table("events", key_col="id", schema=SCHEMA,
                         index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items([{"id": 1, "name": "a", "age": 1}]))
    assert cat.table_exists("events")
    assert set(cat.list_tables()) == {"events"}
    t2 = cat.open_table("events")
    assert t2.describe()["cardinality"] == 1
    with pytest.raises(ValueError):
        cat.create_table("events", key_col="id", schema=SCHEMA)
    cat.drop_table("events")
    assert not cat.table_exists("events")
    with pytest.raises(KeyError):
        cat.open_table("events")


def test_sqlite_catalog_concurrent_writers_and_autodetect(tmp_path):
    """The sqlite backend is the CONCURRENT-registry path (reference
    sqlite metadata store, base_metadata_store.rs:15-68): N threads
    racing create_table on distinct names all land; racing the SAME
    name yields exactly one winner; a fresh MoonrayCatalog with
    backend=None auto-detects the sqlite registry; per-table meta
    survives reopen."""
    from concurrent.futures import ThreadPoolExecutor

    wh = str(tmp_path / "wh")
    cat = MoonrayCatalog(wh, backend="sqlite")

    def mk(i):
        c = MoonrayCatalog(wh, backend="sqlite")  # own connection set
        return c.create_table(f"t{i}", key_col="id", schema=SCHEMA,
                              index_partitions=4, rows_per_fragment=8)

    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(mk, range(8)))
    assert set(cat.list_tables()) == {f"t{i}" for i in range(8)}

    def race_same(_):
        try:
            MoonrayCatalog(wh, backend="sqlite").create_table(
                "dup", key_col="id", schema=SCHEMA,
                index_partitions=4, rows_per_fragment=8)
            return 1
        except ValueError:
            return 0

    with ThreadPoolExecutor(max_workers=8) as ex:
        wins = sum(ex.map(race_same, range(8)))
    assert wins == 1
    cat.set_table_meta("t3", "topic", "clicks")

    reopened = MoonrayCatalog(wh)  # backend=None → auto-detect
    assert reopened.backend == "sqlite"
    assert reopened.get_table_meta("t3", "topic") == "clicks"
    assert reopened.open_table("t5").describe()["cardinality"] == 0
    reopened.drop_table("dup")
    assert not MoonrayCatalog(wh).table_exists("dup")


def test_expiry_gcs_staging_and_lineage(tmp_path):
    import os

    t = _mk(tmp_path / "t5")
    t.merge(rd.from_items([{
        "op": "D", "lsn": 5, "id": 3, "name": None, "age": None}]), job_id="m-gc")
    staging = os.path.join(t.root, "staging")
    assert any(d == "m-gc" for d in os.listdir(staging))
    t.expire_snapshots(keep_last=1)
    assert not os.path.exists(os.path.join(staging, "m-gc"))  # committed job GC'd
    # data still correct after GC
    assert {r["id"] for r in _rows(t)} == set(range(30)) - {3}

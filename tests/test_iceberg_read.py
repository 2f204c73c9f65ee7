"""Distributed Iceberg source (sources/iceberg_read): the exported
snapshot as a lazy Dataset — per-file ReadTasks, in-task puffin-DV
subtraction, column pruning at the parquet read. Parity vs the engine
scan and vs the driver-side spec replay."""

import pyarrow as pa
import ray.data as rd

from moonray import MoonrayTable
from moonray.sinks.iceberg import export_iceberg, read_iceberg_table
from moonray.sources.iceberg_read import IcebergDatasource, read_iceberg_dataset

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("score", pa.float64()),
])


def _mk_with_dvs(root):
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(40)]))
    # updates + deletes → DV puffin blobs in the export
    t.merge(rd.from_items(
        [{"id": i, "name": f"u{i}", "score": float(-i), "op": "U",
          "lsn": 100 + i} for i in range(0, 40, 3)]
        + [{"id": i, "name": "", "score": 0.0, "op": "D", "lsn": 200 + i}
           for i in range(1, 40, 5)]))
    return t


def _df(x):
    if isinstance(x, pa.Table):
        df = x.to_pandas()
    else:
        df = x.to_pandas()
    return df.sort_values("id", ignore_index=True)


def test_dataset_read_matches_engine_and_replay(tmp_path):
    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    ds = read_iceberg_dataset(dest)
    got = _df(pa.concat_tables(
        list(ds.iter_batches(batch_format="pyarrow"))))[
        ["id", "name", "score"]]
    want_engine = _df(pa.concat_tables(
        [b for b in t.scan().iter_batches(batch_format="pyarrow")]))[
        ["id", "name", "score"]]
    want_replay = _df(read_iceberg_table(dest))[["id", "name", "score"]]

    assert got.equals(want_engine)
    assert got.equals(want_replay)


def test_read_tasks_are_per_file_with_real_metadata(tmp_path):
    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    src = IcebergDatasource(dest)
    tasks = src.get_read_tasks(parallelism=4)
    assert len(tasks) == len(src._files) > 1
    # metadata rows/bytes come from manifest entries, not file opens
    assert all(m.size_bytes > 0 for m in (t.metadata for t in tasks))
    total_est = src.estimate_inmemory_data_size()
    assert total_est == sum(t.metadata.size_bytes for t in tasks)


def test_column_pruning_never_ships_unrequested_columns(tmp_path):
    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    ds = read_iceberg_dataset(dest, columns=["id", "score"])
    batches = list(ds.iter_batches(batch_format="pyarrow"))
    assert all(b.schema.names == ["id", "score"] for b in batches)
    got = _df(pa.concat_tables(batches))
    want = _df(read_iceberg_table(dest))[["id", "score"]]
    assert got.equals(want)


def test_cli_import_iceberg_roundtrip(tmp_path, capsys):
    """export → `jobs import-iceberg` → new engine table matches the
    source's live rows (DVs folded at import: the new table has no
    deleted rows, same cardinality/values)."""
    import json

    from moonray.jobs.__main__ import main

    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    imported = str(tmp_path / "imported")
    assert main(["import-iceberg", "--table", imported, "--src", dest,
                 "--key-col", "id"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    t2 = MoonrayTable.open(imported)
    got = _df(pa.concat_tables(
        [b for b in t2.scan().iter_batches(batch_format="pyarrow")]))[
        ["id", "name", "score"]]
    want = _df(read_iceberg_table(dest))[["id", "name", "score"]]
    assert got.equals(want)
    assert out["rows"] == len(want)


def test_dv_subtraction_happens_in_task(tmp_path):
    """Deleted ids never appear in any block."""
    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    deleted = set(range(1, 40, 5))
    ds = read_iceberg_dataset(dest, columns=["id"])
    ids = {r["id"] for r in ds.take_all()}
    assert ids.isdisjoint(deleted)
    assert ids == set(range(40)) - deleted


def test_snapshot_time_travel_on_export(tmp_path):
    """Two exports → the first snapshot stays readable by snapshot-id
    and reproduces the pre-merge state."""
    import json
    import os

    t = MoonrayTable.create(str(tmp_path / "tbl"), key_col="id",
                            schema=SCHEMA, index_partitions=4,
                            rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(40)]))
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        v1 = int(f.read().strip())
    with open(os.path.join(dest, "metadata", f"v{v1}.metadata.json")) as f:
        snap1 = json.load(f)["current-snapshot-id"]

    t.merge(rd.from_items(
        [{"id": i, "name": "", "score": 0.0, "op": "D", "lsn": 100 + i}
         for i in range(0, 40, 2)]))
    export_iceberg(t, dest)

    old = read_iceberg_dataset(dest, columns=["id"], snapshot_id=snap1)
    assert sorted(r["id"] for r in old.take_all()) == list(range(40))
    cur = read_iceberg_dataset(dest, columns=["id"])
    assert sorted(r["id"] for r in cur.take_all()) == list(range(1, 40, 2))


def test_expire_iceberg_snapshots_gc_and_safety(tmp_path, capsys):
    """Three exports → expire keep_last=1: old snapshot-ids are gone
    (time travel raises), orphaned data/manifest/puffin files are
    GC'd, the current snapshot still reads exactly, and the NEXT
    incremental export still works."""
    import json
    import os

    from moonray.jobs.__main__ import main
    from moonray.sinks.iceberg import (expire_iceberg_snapshots,
                                       load_table_metadata)

    t = MoonrayTable.create(str(tmp_path / "tbl"), key_col="id",
                            schema=SCHEMA, index_partitions=4,
                            rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(40)]))
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    snap1 = load_table_metadata(dest)["current-snapshot-id"]
    t.merge(rd.from_items(
        [{"id": i, "name": "", "score": 0.0, "op": "D", "lsn": 100 + i}
         for i in range(0, 40, 2)]))
    export_iceberg(t, dest)
    t.merge(rd.from_items(
        [{"id": i, "name": f"z{i}", "score": 9.0, "op": "U",
          "lsn": 200 + i} for i in range(1, 40, 6)]))
    export_iceberg(t, dest)

    def _files(sub):
        return set(os.listdir(os.path.join(dest, sub)))

    before_data, before_meta = _files("data"), _files("metadata")
    out = expire_iceberg_snapshots(dest, keep_last=1)
    assert out["dropped_snapshots"] == 2 and out["deleted_files"] > 0
    meta = load_table_metadata(dest)
    assert len(meta["snapshots"]) == 1
    assert "parent-snapshot-id" not in meta["snapshots"][0]
    assert _files("data") < before_data          # something GC'd

    # current snapshot still byte-exact vs engine
    got = _df(read_iceberg_table(dest))[["id", "name", "score"]]
    want = _df(pa.concat_tables(
        [b for b in t.scan().iter_batches(batch_format="pyarrow")]))[
        ["id", "name", "score"]]
    assert got.equals(want)

    # expired snapshot unreadable by id
    try:
        read_iceberg_dataset(dest, snapshot_id=snap1)
        raise AssertionError("expired snapshot still readable")
    except KeyError:
        pass

    # incremental export continues: no-op returns same version, a new
    # merge produces a valid new snapshot
    v_same = export_iceberg(t, dest)
    assert v_same == meta["_hint_version"]
    t.merge(rd.from_items(
        [{"id": 0, "name": "back", "score": 1.0, "op": "I", "lsn": 900}]))
    export_iceberg(t, dest)
    got2 = _df(read_iceberg_table(dest))[["id", "name", "score"]]
    want2 = _df(pa.concat_tables(
        [b for b in t.scan().iter_batches(batch_format="pyarrow")]))[
        ["id", "name", "score"]]
    assert got2.equals(want2)

    # CLI wrapper (idempotent second expiry: nothing to drop)
    assert main(["expire-iceberg", "--dest", dest, "--keep-last", "1"]) == 0
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["dropped_snapshots"] == 1   # the pre-merge snapshot


def test_ranges_prune_files_via_manifest_bounds(tmp_path):
    """read_iceberg_dataset(ranges=...) drops whole files whose
    manifest bounds prove non-overlap (no file open at all) and applies
    the exact filter in-task; ranged columns outside the projection are
    read for the filter and dropped."""
    t = MoonrayTable.create(str(tmp_path / "tbl"), key_col="id",
                            schema=SCHEMA, zone_cols=("score",),
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(64)]))
    t.cluster(cols=["score"])
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    src_all = IcebergDatasource(dest)
    src_rng = IcebergDatasource(dest, ranges={"score": (10.0, 20.0)})
    assert 0 < len(src_rng._files) < len(src_all._files)

    ds = read_iceberg_dataset(dest, columns=["id", "name"],
                              ranges={"score": (10.0, 20.0)})
    got = pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow")))
    assert got.schema.names == ["id", "name"]
    full = read_iceberg_table(dest)
    import pyarrow.compute as pc

    want = full.filter(
        pc.and_(pc.greater_equal(full["score"], 10.0),
                pc.less_equal(full["score"], 20.0))).select(["id", "name"])
    assert got.sort_by("id").equals(want.sort_by("id"))


def test_time_travel_ranges_use_snapshot_schema_ids(tmp_path):
    """After a column drop re-allocates field-ids, a ranged time-travel
    read of the PRE-drop snapshot must decode bounds under the old
    schema's id mapping — the current mapping would prune the wrong
    files (silently missing rows)."""
    import pyarrow.compute as pc

    sch = pa.schema([("id", pa.int64()), ("b", pa.string()),
                     ("score", pa.float64())])
    t = MoonrayTable.create(str(tmp_path / "tbl"), key_col="id",
                            schema=sch, zone_cols=("score",),
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "b": f"s{i}", "score": float(i)} for i in range(64)]))
    t.cluster(cols=["score"])
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    from moonray.sinks.iceberg import load_table_metadata

    snap1 = load_table_metadata(dest)["current-snapshot-id"]

    t.alter(drop_columns=["b"])
    t.merge(rd.from_items(
        [{"id": 100 + i, "score": 200.0 + i, "op": "I", "lsn": 900 + i}
         for i in range(8)]))
    export_iceberg(t, dest)
    meta = load_table_metadata(dest)
    assert len(meta["schemas"]) > 1   # the drop created a new schema-id

    old = read_iceberg_dataset(dest, snapshot_id=snap1,
                               ranges={"score": (10.0, 20.0)},
                               columns=["id", "score"])
    got = pa.concat_tables(list(old.iter_batches(batch_format="pyarrow")))
    assert sorted(got["id"].to_pylist()) == list(range(10, 21))
    assert pc.min(got["score"]).as_py() == 10.0
    assert pc.max(got["score"]).as_py() == 20.0


def test_tag_refs_export_read_and_expiry(tmp_path):
    """moonray tags export as Iceberg tag refs: readable by name, kept
    across export refresh, retained by Iceberg-side snapshot expiry,
    and dropped from refs after untag + re-export."""
    from moonray.sinks.iceberg import expire_iceberg_snapshots, \
        load_table_metadata

    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    t.tag("golden")  # tags the just-exported version

    # table moves on; re-export picks up the tag AND the new snapshot
    t.merge(rd.from_items(
        [{"id": i, "name": "late", "score": 9.9, "op": "U", "lsn": 900 + i}
         for i in range(0, 10)]))
    export_iceberg(t, dest)
    meta = load_table_metadata(dest)
    assert meta["refs"]["golden"]["type"] == "tag"
    golden_sid = meta["refs"]["golden"]["snapshot-id"]
    assert golden_sid != meta["current-snapshot-id"]

    by_ref = _df(pa.concat_tables(list(read_iceberg_dataset(
        dest, ref="golden").iter_batches(batch_format="pyarrow"))))
    by_sid = _df(pa.concat_tables(list(read_iceberg_dataset(
        dest, snapshot_id=golden_sid).iter_batches(
        batch_format="pyarrow"))))
    assert by_ref.equals(by_sid)
    assert "late" not in set(by_ref["name"])

    # expiry keeps the tagged snapshot even with keep_last=1
    expire_iceberg_snapshots(dest, keep_last=1)
    meta = load_table_metadata(dest)
    assert golden_sid in {s["snapshot-id"] for s in meta["snapshots"]}
    still = _df(pa.concat_tables(list(read_iceberg_dataset(
        dest, ref="golden").iter_batches(batch_format="pyarrow"))))
    assert still.equals(by_ref)

    # untag + re-export (with a real change) drops the ref
    t.untag("golden")
    t.merge(rd.from_items(
        [{"id": 0, "name": "z", "score": 0.1, "op": "U", "lsn": 2000}]))
    export_iceberg(t, dest)
    meta = load_table_metadata(dest)
    assert "golden" not in meta["refs"]

    import pytest as _pytest
    with _pytest.raises(KeyError):
        read_iceberg_dataset(dest, ref="golden")


def test_tag_only_change_still_publishes(tmp_path):
    """tag/untag with NO data change must still refresh refs (the
    export early-return path gets a metadata-only rewrite)."""
    from moonray.sinks.iceberg import load_table_metadata

    t = _mk_with_dvs(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    v1 = export_iceberg(t, dest)
    t.tag("rc")
    v2 = export_iceberg(t, dest)
    assert v2 == v1 + 1  # metadata-only bump
    meta = load_table_metadata(dest)
    assert meta["refs"]["rc"]["type"] == "tag"
    assert meta["snapshots"] == load_table_metadata(dest)["snapshots"]
    # idempotent: same tags, same data → no new metadata version
    assert export_iceberg(t, dest) == v2
    t.untag("rc")
    v3 = export_iceberg(t, dest)
    assert v3 == v2 + 1
    assert "rc" not in load_table_metadata(dest)["refs"]

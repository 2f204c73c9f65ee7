"""Delta Lake export sink: snapshot → open Delta transaction log
(protocol v1 Add/Remove actions, reference deltalake_table_syncer.rs).
Verified by replaying the log with an independent consumer (DuckDB over
the active file set) against the engine scan."""

import json
import os

import duckdb
import pyarrow as pa
import ray.data as rd

from moonray import MoonrayTable
from moonray.sinks.delta import export_delta, read_delta_paths

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("score", pa.float64()),
])


def _mk(root):
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(40)]))
    return t


def _delta_rows(dest):
    paths = read_delta_paths(dest)
    if not paths:
        return {}
    con = duckdb.connect()
    df = con.sql("SELECT * FROM read_parquet($p)", params={"p": paths}).df()
    return {int(r["id"]): (r["name"], float(r["score"]))
            for _, r in df.iterrows()}


def test_delta_export_roundtrip_and_incremental(tmp_path):
    t = _mk(tmp_path / "tbl")
    dest = str(tmp_path / "delta")

    v0 = export_delta(t, dest)
    assert v0 == 0
    log0 = [json.loads(x) for x in open(
        os.path.join(dest, "_delta_log", f"{0:020d}.json"))]
    kinds = [next(iter(a)) for a in log0]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert kinds[-1] == "commitInfo"
    meta = log0[1]["metaData"]
    fields = {f["name"]: f["type"]
              for f in json.loads(meta["schemaString"])["fields"]}
    assert fields == {"id": "long", "name": "string", "score": "double"}
    adds = [a["add"] for a in log0 if "add" in a]
    assert sum(json.loads(a["stats"])["numRecords"] for a in adds) == 40
    assert _delta_rows(dest) == {i: (f"n{i}", float(i)) for i in range(40)}

    # unchanged snapshot → no empty commit
    assert export_delta(t, dest) == 0
    assert not os.path.exists(os.path.join(dest, "_delta_log",
                                           f"{1:020d}.json"))

    # merge (update + delete + insert) → incremental commit: DV'd
    # fragments re-export under new names, old ones get remove actions
    t.merge(rd.from_items([
        {"op": "U", "lsn": 1, "id": 3, "name": "upd", "score": 9.5},
        {"op": "D", "lsn": 2, "id": 7, "name": None, "score": None},
        {"op": "I", "lsn": 3, "id": 100, "name": "new", "score": 1.0},
    ]))
    v1 = export_delta(t, dest)
    assert v1 == 1
    log1 = [json.loads(x) for x in open(
        os.path.join(dest, "_delta_log", f"{1:020d}.json"))]
    assert any("remove" in a for a in log1) and any("add" in a for a in log1)
    got = _delta_rows(dest)
    want = {i: (f"n{i}", float(i)) for i in range(40) if i not in (3, 7)}
    want[3] = ("upd", 9.5)
    want[100] = ("new", 1.0)
    assert got == want

    # compaction rewrites fragments → export follows, rows unchanged
    t.optimize("full")
    v2 = export_delta(t, dest)
    assert v2 == 2 and _delta_rows(dest) == want
    # commitInfo carries the table lineage (flush-LSN analogue)
    ci = [a["commitInfo"] for a in log1 if "commitInfo" in a][0]
    assert ci["moonrayCommitLsn"] == 3


def test_delta_export_pinned_version(tmp_path):
    t = _mk(tmp_path / "tbl2")
    v_pre = t.latest_version()
    t.merge(rd.from_items([
        {"op": "D", "lsn": 1, "id": 0, "name": None, "score": None}]))
    dest = str(tmp_path / "delta2")
    export_delta(t, dest, version=v_pre)
    assert len(_delta_rows(dest)) == 40  # pre-merge snapshot exported


def test_delta_export_follows_alter_table(tmp_path):
    """ALTER TABLE between exports re-emits metaData AND re-exports
    every pre-ALTER file (schema participates in the export name), so
    the Delta log schema and the parquet file schemas always agree."""
    t = _mk(tmp_path / "tbl3")
    dest = str(tmp_path / "delta3")
    export_delta(t, dest)

    t.alter(add_columns=[("tag", pa.string(), "dflt")])
    t.merge(rd.from_items([{"op": "I", "lsn": 1, "id": 100,
                            "name": "new", "score": 1.0, "tag": "T"}]))
    v1 = export_delta(t, dest)
    log1 = [json.loads(x) for x in open(
        os.path.join(dest, "_delta_log", f"{v1:020d}.json"))]
    metas = [a["metaData"] for a in log1 if "metaData" in a]
    assert len(metas) == 1  # schema change re-emitted
    fields = {f["name"] for f in json.loads(metas[0]["schemaString"])["fields"]}
    assert "tag" in fields
    # every active parquet file now carries the new column
    import pyarrow.parquet as pq

    for p in read_delta_paths(dest):
        assert "tag" in pq.read_schema(p).names
    rows = _delta_rows(dest)
    assert len(rows) == 41

    # pinned PRE-alter export into a fresh dest ships the OLD shape
    dest2 = str(tmp_path / "delta4")
    export_delta(t, dest2, version=1)  # v1 = the bulk load commit
    for p in read_delta_paths(dest2):
        assert "tag" not in pq.read_schema(p).names


def test_read_delta_dataset_matches_engine(tmp_path):
    """Distributed Delta read (read_delta_dataset): parity vs the
    engine scan after a merge (DVs applied at export), plus column
    pruning."""
    from moonray.sinks.delta import read_delta_dataset

    t = _mk(tmp_path / "tbl4")
    t.merge(rd.from_items(
        [{"id": i, "name": f"u{i}", "score": float(-i), "op": "U",
          "lsn": 100 + i} for i in range(0, 40, 4)]
        + [{"id": i, "name": "", "score": 0.0, "op": "D", "lsn": 200 + i}
           for i in range(1, 40, 7)]))
    dest = str(tmp_path / "delta4")
    export_delta(t, dest)

    got = read_delta_dataset(dest).to_pandas().sort_values(
        "id", ignore_index=True)[["id", "name", "score"]]
    want = t.scan().to_pandas().sort_values(
        "id", ignore_index=True)[["id", "name", "score"]]
    assert got.equals(want)

    pruned = read_delta_dataset(dest, columns=["id"])
    assert pruned.schema().names == ["id"]
    assert sorted(r["id"] for r in pruned.take_all()) == list(want["id"])


def test_read_delta_dataset_empty_table_is_valid(tmp_path):
    """A log that replays to zero live files is a valid EMPTY table
    (typed empty Dataset), not a missing one."""
    from moonray.sinks.delta import read_delta_dataset

    t = _mk(tmp_path / "tbl5")
    t.merge(rd.from_items(
        [{"id": i, "name": "", "score": 0.0, "op": "D", "lsn": 100 + i}
         for i in range(40)]))
    dest = str(tmp_path / "delta5")
    export_delta(t, dest)
    ds = read_delta_dataset(dest)
    assert ds.count() == 0
    assert set(ds.schema().names) == {"id", "name", "score"}
    try:
        read_delta_dataset(str(tmp_path / "nope"))
        raise AssertionError("missing table must raise")
    except FileNotFoundError:
        pass


def test_delta_stats_and_ranges_pruned_read(tmp_path):
    """Add actions carry exact per-file stats (numRecords, min/max,
    nullCount) over the WRITTEN rows; read_delta_dataset(ranges=...)
    prunes whole files via those stats and pushes the exact filter
    into the parquet read."""
    import json as _json
    import os as _os

    from moonray.sinks.delta import (_read_log_state, read_delta_dataset)

    t = MoonrayTable.create(str(tmp_path / "tbl6"), key_col="id",
                            schema=SCHEMA, zone_cols=("score",),
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(64)]))
    t.cluster(cols=["score"])
    dest = str(tmp_path / "delta6")
    export_delta(t, dest)

    _, active, _, _ = _read_log_state(dest)
    stats = [_json.loads(a["stats"]) for a in active.values()]
    assert all("minValues" in s and "maxValues" in s for s in stats)
    assert min(s["minValues"]["score"] for s in stats) == 0.0
    assert max(s["maxValues"]["score"] for s in stats) == 63.0
    assert all(s["nullCount"]["id"] == 0 for s in stats)

    ds = read_delta_dataset(dest, columns=["id"],
                            ranges={"score": (10.0, 20.0)})
    got = sorted(r["id"] for r in ds.take_all())
    assert got == list(range(10, 21))
    # pruning really dropped files: the pruned read's inputs are fewer
    full_files = read_delta_dataset(dest).input_files()
    pruned_files = ds.input_files()
    assert 0 < len(pruned_files) < len(full_files)


def test_vacuum_delta_removes_unreferenced_files(tmp_path, capsys):
    """After a merge re-exports fragments under new names, vacuum
    removes the superseded files; active files and the log stay
    intact, and the table still reads exactly."""
    import json as _json
    import os as _os

    from moonray.jobs.__main__ import main
    from moonray.sinks.delta import read_delta_dataset, vacuum_delta

    t = _mk(tmp_path / "tbl7")
    dest = str(tmp_path / "delta7")
    export_delta(t, dest)
    t.merge(rd.from_items(
        [{"id": i, "name": "", "score": 0.0, "op": "D", "lsn": 100 + i}
         for i in range(0, 40, 4)]))
    export_delta(t, dest)

    n_parquet_before = sum(1 for f in _os.listdir(dest)
                           if f.endswith(".parquet"))
    out = vacuum_delta(dest)
    assert out["removed_files"] > 0
    n_parquet_after = sum(1 for f in _os.listdir(dest)
                          if f.endswith(".parquet"))
    assert n_parquet_after == n_parquet_before - out["removed_files"]
    assert n_parquet_after == out["active_files"]

    got = read_delta_dataset(dest).to_pandas().sort_values(
        "id", ignore_index=True)[["id", "name", "score"]]
    want = t.scan().to_pandas().sort_values(
        "id", ignore_index=True)[["id", "name", "score"]]
    assert got.equals(want)

    # idempotent + CLI wrapper
    assert main(["vacuum-delta", "--dest", dest]) == 0
    out2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["removed_files"] == 0


def test_read_delta_dataset_version_as_of(tmp_path):
    """Delta versionAsOf: an export BEFORE a merge stays readable at
    its log version after a later export rewrote the active set."""
    import pytest

    from moonray.sinks.delta import read_delta_dataset

    t = _mk(tmp_path / "tbl6")
    dest = str(tmp_path / "delta6")
    export_delta(t, dest)
    v0_want = t.scan().to_pandas().sort_values("id", ignore_index=True)

    t.merge(rd.from_items(
        [{"id": i, "name": "new", "score": 1.5, "op": "U", "lsn": 500 + i}
         for i in range(0, 40, 2)]))
    export_delta(t, dest)

    old = read_delta_dataset(dest, version=0).to_pandas().sort_values(
        "id", ignore_index=True)
    assert old[["id", "name", "score"]].equals(
        v0_want[["id", "name", "score"]])
    new = read_delta_dataset(dest).to_pandas()
    assert (new["name"] == "new").sum() == 20
    with pytest.raises(FileNotFoundError, match="versionAsOf"):
        read_delta_dataset(dest, version=99)

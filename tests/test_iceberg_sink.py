"""Iceberg v3 export sink: snapshot → metadata JSON + Avro manifests +
DV puffin blobs (reference iceberg_table_syncer.rs /
deletion_vector.rs). Verified by an independent spec-level replay (the
test walks version-hint → metadata → manifest list → manifests →
parquet + puffin DVs itself, structurally validating magics, CRCs and
field-ids) against the engine scan — plus DuckDB over the live file
set with DVs applied."""

import json
import os
import struct

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from moonray import MoonrayTable
from moonray.sinks.avro_ocf import read_ocf
from moonray.sinks.iceberg import export_iceberg, read_iceberg_table
from moonray.sinks.puffin import (DV_MAGIC, PUFFIN_MAGIC, crc32c,
                                  decode_dv_blob)

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("score", pa.float64()),
])


def _mk(root):
    t = MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(40)]))
    return t


def _engine_df(t):
    df = t.scan().to_pandas()
    return df.sort_values("id", ignore_index=True)[["id", "name", "score"]]


def _independent_replay(dest):
    """Spec-level replay written against the public Iceberg v3 layout,
    NOT the sink's own state helpers: version-hint → metadata JSON →
    manifest-list avro → manifest avro → parquet minus puffin-DV
    positions."""
    with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
        v = int(f.read().strip())
    with open(os.path.join(dest, "metadata", f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert meta["format-version"] == 3
    snap = next(s for s in meta["snapshots"]
                if s["snapshot-id"] == meta["current-snapshot-id"])
    sj, mlmeta, manifests = read_ocf(snap["manifest-list"])
    assert mlmeta["format-version"] == "3"
    # spec field-ids present on the manifest-list schema
    ids = {f["field-id"] for f in json.loads(sj)["fields"]}
    assert {500, 501, 502, 517, 515, 516, 503}.issubset(ids)
    live_data, dv_of = [], {}
    for mf in manifests:
        esj, emeta, entries = read_ocf(mf["manifest_path"])
        eids = {f["field-id"] for f in json.loads(esj)["fields"]}
        assert {0, 1, 2, 3, 4} == eids
        for e in entries:
            if e["status"] == 2:
                continue
            df = e["data_file"]
            if mf["content"] == 0:
                if df["file_format"] == "PUFFIN":
                    # file-index blob (reference utils.rs is_file_index:
                    # content Data + format Puffin, no referenced file)
                    assert df["referenced_data_file"] is None
                    assert df["content_offset"] is None
                    continue
                live_data.append(df)
            else:
                assert df["file_format"] == "PUFFIN"
                with open(df["file_path"], "rb") as f:
                    raw = f.read()
                assert raw[:4] == PUFFIN_MAGIC and raw[-4:] == PUFFIN_MAGIC
                blob = raw[df["content_offset"]:
                           df["content_offset"] + df["content_size_in_bytes"]]
                # structural: length-framed magic + crc32c
                (ln,) = struct.unpack_from(">I", blob, 0)
                assert blob[4:8] == DV_MAGIC
                (crc,) = struct.unpack_from(">I", blob, 4 + ln)
                assert crc == crc32c(blob[4:4 + ln])
                pos = decode_dv_blob(blob)
                assert len(pos) == df["record_count"]
                dv_of[df["referenced_data_file"]] = pos
    frames = []
    for df in live_data:
        pqt = pq.read_table(df["file_path"])
        assert pqt.num_rows == df["record_count"]
        pdf = pqt.to_pandas()
        dv = dv_of.get(df["file_path"])
        if dv is not None:
            pdf = pdf.drop(index=dv.astype(np.int64))
        frames.append(pdf)
    out = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
    return out.sort_values("id", ignore_index=True)[["id", "name", "score"]]


def test_iceberg_export_roundtrip_incremental_dv(tmp_path):
    t = _mk(tmp_path / "tbl")
    dest = str(tmp_path / "ice")

    assert export_iceberg(t, dest) == 1
    pd.testing.assert_frame_equal(_independent_replay(dest), _engine_df(t))

    # unchanged snapshot → idempotent, no new metadata version
    assert export_iceberg(t, dest) == 1

    # merge (update + delete + insert): data files exported earlier
    # must NOT re-export — deletes ship as puffin DVs (the v3 property)
    before = set(os.listdir(os.path.join(dest, "data")))
    t.merge(rd.from_items([
        {"op": "U", "lsn": 1, "id": 3, "name": "upd", "score": 9.5},
        {"op": "D", "lsn": 2, "id": 7, "name": None, "score": None},
        {"op": "I", "lsn": 3, "id": 100, "name": "new", "score": 1.0},
    ]))
    assert export_iceberg(t, dest) == 2
    after = set(os.listdir(os.path.join(dest, "data")))
    assert before.issubset(after)          # nothing re-exported
    assert any(p.endswith(".puffin") for p in after - before)
    pd.testing.assert_frame_equal(_independent_replay(dest), _engine_df(t))

    # second delete on the SAME fragment: changed DV re-ships, data
    # files still untouched
    t.merge(rd.from_items([
        {"op": "D", "lsn": 4, "id": 4, "name": None, "score": None}]))
    assert export_iceberg(t, dest) == 3
    pd.testing.assert_frame_equal(_independent_replay(dest), _engine_df(t))

    # DuckDB consumes the live file set with DVs applied
    meta_df = _independent_replay(dest)
    con = duckdb.connect()
    want = con.sql(
        "SELECT count(*) c, sum(id) s FROM meta_df").fetchone()
    eng = t.scan().to_pandas()
    assert want == (len(eng), eng.id.sum())


def test_iceberg_export_compaction_and_alter(tmp_path):
    t = _mk(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    # compaction rewrites fragments → old files removed (status=2),
    # new files added, DVs folded away
    t.merge(rd.from_items(
        [{"op": "D", "lsn": i + 1, "id": i, "name": None, "score": None}
         for i in range(0, 20, 2)]))
    t.optimize("data", force_full=True)
    export_iceberg(t, dest)
    pd.testing.assert_frame_equal(_independent_replay(dest), _engine_df(t))

    # ALTER adds a column with default → schema history grows, files
    # re-export under the new schema state
    t.alter(add_columns=[("flag", pa.string(), "x")])
    v = export_iceberg(t, dest)
    with open(os.path.join(dest, "metadata", f"v{v}.metadata.json")) as f:
        meta = json.load(f)
    assert len(meta["schemas"]) == 2
    assert meta["current-schema-id"] == 1
    got = _independent_replay(dest)
    eng = t.scan().to_pandas().sort_values("id", ignore_index=True)
    assert list(got.id) == list(eng.id)
    # time-travel: snapshot history intact, parent chain linked
    snaps = meta["snapshots"]
    assert [s.get("parent-snapshot-id") for s in snaps[1:]] == \
        [s["snapshot-id"] for s in snaps[:-1]]
    assert meta["last-sequence-number"] == len(snaps)


def test_iceberg_pinned_version_export(tmp_path):
    """Exporting an OLD pinned moonray version ships that snapshot's
    content, not the latest."""
    t = _mk(tmp_path / "tbl")
    v_pre = t.latest_version()
    t.merge(rd.from_items(
        [{"op": "D", "lsn": 1, "id": i, "name": None, "score": None}
         for i in range(10)]))
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest, version=v_pre)
    got = _independent_replay(dest)
    assert list(got.id) == list(range(40))


def test_data_manifest_carries_column_bounds(tmp_path):
    """Data manifest entries ship lower/upper bounds (spec field-ids
    125-130, single-value LE encoding) derived from the engine's zone
    maps — external Iceberg readers can min/max-prune. Carried entries
    survive re-export; deletes manifests stay bounds-free."""
    import ray.data as rd

    t = MoonrayTable.create(str(tmp_path / "tblb"), key_col="id",
                            schema=SCHEMA, zone_cols=("score",),
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)} for i in range(40)]))
    dest = str(tmp_path / "iceb")
    export_iceberg(t, dest)

    def data_entries(dest):
        with open(os.path.join(dest, "metadata", "version-hint.text")) as f:
            v = int(f.read().strip())
        with open(os.path.join(dest, "metadata",
                               f"v{v}.metadata.json")) as f:
            meta = json.load(f)
        snap = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == meta["current-snapshot-id"])
        sj, _, manifests = read_ocf(snap["manifest-list"])
        out = []
        for m in manifests:
            schema_json, _, entries = read_ocf(m["manifest_path"])
            out.append((m["content"], schema_json, entries))
        return meta, out

    meta, manifests = data_entries(dest)
    ice_fields = next(s for s in meta["schemas"]
                      if s["schema-id"] == meta["current-schema-id"])["fields"]
    score_fid = next(f["id"] for f in ice_fields if f["name"] == "score")

    datas = [(sj, es) for c, sj, es in manifests if c == 0]
    assert datas
    sj, entries = datas[0]
    ids = {f["field-id"] for f in json.loads(sj)["fields"][-1]["type"]["fields"]}
    lows, highs = [], []
    for e in entries:
        if e["data_file"]["file_format"] == "PUFFIN":
            continue  # file-index blobs carry no column bounds
        lb = e["data_file"]["lower_bounds"]
        ub = e["data_file"]["upper_bounds"]
        assert lb and ub
        lo = next(kv["value"] for kv in lb if kv["key"] == score_fid)
        hi = next(kv["value"] for kv in ub if kv["key"] == score_fid)
        lows.append(struct.unpack("<d", lo)[0])
        highs.append(struct.unpack("<d", hi)[0])
    assert min(lows) == 0.0 and max(highs) == 39.0
    # entry schema carries the spec bounds field-ids
    entry_fields = json.loads(sj)["fields"]
    df_fields = next(f for f in entry_fields if f["name"] == "data_file")
    fids = {x["field-id"] for x in df_fields["type"]["fields"]}
    assert {125, 128}.issubset(fids)

    # incremental re-export with a merge: carried entries re-encode,
    # new entries get bounds, replay still exact
    t.merge(rd.from_items(
        [{"id": 100 + i, "name": f"x{i}", "score": 100.0 + i, "op": "I",
          "lsn": 50 + i} for i in range(8)]))
    export_iceberg(t, dest)
    got = read_iceberg_table(dest)
    assert got.num_rows == 48
    _, manifests2 = data_entries(dest)
    for c, sjx, es in manifests2:
        if c != 0:
            for e in es:
                assert "lower_bounds" not in e["data_file"]


def test_index_puffins_answer_point_lookups_from_export_alone(tmp_path):
    """File-index puffin blobs (reference iceberg_table_syncer.rs:47-52
    / persisted_bucket_hash_map.rs): the export alone answers point
    lookups — bucket-routed, candidate-verified, DV-filtered."""
    from moonray.sinks.iceberg import iceberg_index_lookup

    t = _mk(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    got = iceberg_index_lookup(dest, [3, 17, 39]).to_pandas() \
        .sort_values("id", ignore_index=True)
    assert got["id"].tolist() == [3, 17, 39]
    assert got["name"].tolist() == ["n3", "n17", "n39"]
    # absent key → no row
    assert len(iceberg_index_lookup(dest, [4040])) == 0

    # merge: delete 3, update 17 — the incremental export re-ships the
    # index and the lookup reflects the new state (DV'd row excluded)
    t.merge(rd.from_items([
        {"op": "D", "lsn": 100, "id": 3, "name": None, "score": None},
        {"op": "U", "lsn": 101, "id": 17, "name": "updated",
         "score": 9.5},
    ]))
    export_iceberg(t, dest)
    got = iceberg_index_lookup(dest, [3, 17, 39]).to_pandas() \
        .sort_values("id", ignore_index=True)
    assert got["id"].tolist() == [17, 39]
    assert got.loc[got["id"] == 17, "name"].item() == "updated"

    # the replay reader still reconstructs the table exactly (index
    # entries are skipped as row sources)
    pd.testing.assert_frame_equal(_independent_replay(dest), _engine_df(t))

    # index entries sit in the DATA manifest as content-0 PUFFIN files
    # (reference utils.rs is_file_index) and survive expiry GC
    from moonray.sinks.iceberg import expire_iceberg_snapshots

    expire_iceberg_snapshots(dest, keep_last=1)
    got2 = iceberg_index_lookup(dest, [17]).to_pandas()
    assert got2["name"].tolist() == ["updated"]

    # column projection works
    thin = iceberg_index_lookup(dest, [39], columns=["id", "score"])
    assert thin.column_names == ["id", "score"]
    assert thin.to_pylist() == [{"id": 39, "score": 39.0}]


def test_index_puffins_composite_key_lookup(tmp_path):
    """Composite (id, name) identity: puffins hash the derived _ckey
    (absent from exported parquet) — lookup re-encodes probe tuples
    AND fetched rows (review finding: this path KeyError'd before)."""
    from moonray.sinks.iceberg import iceberg_index_lookup

    t = MoonrayTable.create(str(tmp_path / "tblc"),
                            key_cols=["id", "name"], schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i % 10, "name": f"n{i}", "score": float(i)}
         for i in range(40)]))
    dest = str(tmp_path / "icec")
    export_iceberg(t, dest)
    got = iceberg_index_lookup(dest, [(3, "n3"), (3, "n13")]).to_pandas()
    assert sorted(got["score"]) == [3.0, 13.0]
    assert len(iceberg_index_lookup(dest, [(3, "nope")])) == 0


def test_index_lookup_empty_export_is_loud(tmp_path):
    import pytest as _pytest

    from moonray.sinks.iceberg import iceberg_index_lookup

    t = _mk(tmp_path / "tble")
    t.merge(rd.from_items(
        [{"op": "D", "lsn": 100 + i, "id": i, "name": None, "score": None}
         for i in range(40)]))
    t.optimize("data", force_full=True)   # folds DVs, drops empty frags
    dest = str(tmp_path / "icee")
    export_iceberg(t, dest)
    with _pytest.raises((ValueError, FileNotFoundError)):
        iceberg_index_lookup(dest, [3])

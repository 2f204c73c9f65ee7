"""fsck: manifest claims vs file reality, each corruption class planted
and detected."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from moonray import MoonrayTable
from moonray.dv import dv_paths_of


def _mk(root: str, n: int = 200) -> MoonrayTable:
    t = MoonrayTable.create(
        root, key_col="id",
        schema=pa.schema([("id", pa.int64()), ("score", pa.float64()),
                          ("v", pa.string())]),
        zone_cols=("score",), index_partitions=4, rows_per_fragment=64)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "score": pa.array([float(i) for i in range(n)]),
        "v": pa.array([f"v{i}" for i in range(n)]),
    })))
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D"] * 5, pa.string()),
        "lsn": pa.array([10] * 5, pa.int64()),
        "id": pa.array([3, 30, 60, 90, 120], pa.int64()),
        "score": pa.array([0.0] * 5),
        "v": pa.array([""] * 5),
    })))
    return t


def test_fsck_clean_table_and_clone(tmp_path):
    t = _mk(str(tmp_path / "t"))
    rep = t.fsck()
    assert rep["ok"] and rep["issues"] == []
    assert rep["fragments_checked"] == len(t.manifest()["fragments"])
    # ext refs of a shallow clone verify against the SOURCE root
    from moonray.clone import clone_table

    c = clone_table(t, str(tmp_path / "c"))
    assert c.fsck()["ok"]


def test_fsck_detects_missing_and_tampered_files(tmp_path):
    t = _mk(str(tmp_path / "t"))
    m = t.manifest()
    # missing DV file
    victim = next(f for f in m["fragments"] if dv_paths_of(f))
    os.remove(os.path.join(t.root, dv_paths_of(victim)[0]))
    rep = t.fsck(deep=False)
    assert not rep["ok"]
    assert any("missing DV file" in i for i in rep["issues"])


def test_fsck_detects_row_count_and_zone_drift(tmp_path):
    t = _mk(str(tmp_path / "t"))
    m = t.manifest()
    frag = m["fragments"][0]
    path = os.path.join(t.root, frag["path"])
    # tamper: rewrite the fragment with an extra row whose score sits
    # far outside the zone map (duplicate the last row, bump score —
    # fragment parquets carry internal columns too, so build from orig)
    orig = pq.read_table(path)
    extra = orig.slice(len(orig) - 1, 1).set_column(
        orig.column_names.index("score"), "score", pa.array([1e9]))
    pq.write_table(pa.concat_tables([orig, extra]), path)
    rep = t.fsck()
    assert not rep["ok"]
    text = "\n".join(rep["issues"])
    assert "footer rows" in text
    assert "zone map" in text and "does not contain actual" in text


def test_cli_fsck_exit_codes(tmp_path, capsys):
    from moonray.jobs.__main__ import main

    t = _mk(str(tmp_path / "t"), n=64)
    assert main(["fsck", "--table", t.root]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["ok"]
    # break it: drop an index file
    m = t.manifest()
    rel = next(iter(m["index"]["partitions"].values()))[0]
    os.remove(os.path.join(t.root, rel))
    assert main(["fsck", "--table", t.root, "--metadata-only"]) == 3


def test_vacuum_removes_only_orphans(tmp_path):
    """VACUUM (vacuum.py): unreferenced artifacts go, every file any
    retained version references stays — time travel included."""
    import os
    import shutil

    import pyarrow as pa
    import ray.data as rd

    from moonray.table import MoonrayTable

    root = str(tmp_path / "t")
    t = MoonrayTable.create(root, key_col="k",
                            schema=pa.schema([("k", pa.int64()),
                                              ("v", pa.int64())]),
                            rows_per_fragment=32, index_partitions=2)
    t.bulk_load(rd.from_arrow(pa.table({
        "k": pa.array(range(100), pa.int64()),
        "v": pa.array(range(100), pa.int64())})))
    t.build_column_index("v")
    v1 = t.latest_version()
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D"] * 5, pa.string()),
        "lsn": pa.array([1] * 5, pa.int64()),
        "k": pa.array(range(5), pa.int64()),
        "v": pa.array([0] * 5, pa.int64())})), job_id="m1")

    # a healthy multi-version table has NO orphans
    rep = t.vacuum(grace_seconds=0, dry_run=True)
    assert rep["orphans"] == []

    # plant orphans: a stray fragment copy, a stray DV, a stray bloom
    frag = t.manifest()["fragments"][0]["path"]
    shutil.copy(os.path.join(root, frag),
                os.path.join(root, "fragments/orphan-copy.parquet"))
    with open(os.path.join(root, "dv/orphan.npy"), "wb") as f:
        f.write(b"x" * 16)
    with open(os.path.join(root, "colindex/v/orphan.bloom"), "wb") as f:
        f.write(b"y" * 16)

    rep = t.vacuum(grace_seconds=0, dry_run=True)
    assert sorted(rep["orphans"]) == ["colindex/v/orphan.bloom",
                                      "dv/orphan.npy",
                                      "fragments/orphan-copy.parquet"]
    # grace window keeps fresh files
    rep2 = t.vacuum(grace_seconds=3600, dry_run=True)
    assert rep2["orphans"] == [] and rep2["kept_recent"] == 3

    rep = t.vacuum(grace_seconds=0)
    assert rep["deleted"] == 3
    # both versions still scan exactly (time travel intact)
    assert t.scan(version=v1).count() == 100
    assert t.scan().count() == 95
    assert t.fsck()["ok"]
    # point scans through the (referenced, untouched) bloom index
    got = [r["k"] for b in t.scan(predicate_in={"v": [50]})
           .iter_batches(batch_format="pyarrow") for r in b.to_pylist()]
    assert got == [50]

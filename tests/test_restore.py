"""restore(): rollback to a retained snapshot as a new linear commit,
with full-replacement changelog semantics (DV-shrink resurrection)."""

import json

import pyarrow as pa
import pytest
import ray.data as rd

from moonray import MoonrayTable
from moonray.sync import sync_incremental


def _mk(root: str, n: int = 120) -> MoonrayTable:
    t = MoonrayTable.create(
        root, key_col="id",
        schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        index_partitions=4, rows_per_fragment=32)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(n)]),
    })))
    return t


def _changes(ids, vals=None, op="I", lsn=10_000) -> rd.Dataset:
    vals = vals if vals is not None else [""] * len(ids)
    return rd.from_arrow(pa.table({
        "op": pa.array([op] * len(ids), pa.string()),
        "lsn": pa.array([lsn] * len(ids), pa.int64()),
        "id": pa.array(ids, pa.int64()),
        "v": pa.array(vals, pa.string()),
    }))


def _rows(t) -> dict:
    out = {}
    for b in t.scan().iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["id"]] = r["v"]
    return out


def test_restore_undoes_bad_commits_and_keeps_history(tmp_path):
    t = _mk(str(tmp_path / "t"))
    good = t.latest_version()
    want = _rows(t)
    t.merge(_changes([1, 2], ["BAD", "BAD"]))          # bad update
    t.merge(_changes([5, 6], op="D", lsn=10_001))      # bad delete
    bad_head = t.latest_version()
    assert _rows(t) != want

    v = t.restore(good)
    assert v == bad_head + 1
    assert _rows(t) == want                    # resurrection included
    # history is append-only: the bad head is still time-travelable
    assert t.scan(version=bad_head).count() == 118
    # LSN stays monotone
    assert t.manifest()["commit_lsn"] >= 10_001
    # idempotent replay
    assert t.restore(good, job_id="r1") == t.restore(good, job_id="r1")
    # restoring to the current state is a no-op
    head = t.latest_version()
    assert t.restore(head) == head
    # the restored state's files survive an aggressive expire
    t.expire_snapshots(keep_last=1)
    assert _rows(t) == want


def test_restore_changelog_feeds_a_downstream_view(tmp_path):
    """The strongest correctness bar: a changelog consumer that synced
    the BAD state must converge to the restored state — including rows
    the restore resurrects (DV shrink), which fragment diffing misses."""
    src = _mk(str(tmp_path / "src"))
    dst = _mk(str(tmp_path / "dst"), n=0)
    good = src.latest_version()
    src.merge(_changes([3], ["BAD"]))
    src.merge(_changes([10, 11], op="D", lsn=10_002))
    sync_incremental(src, dst)
    assert _rows(dst) == _rows(src)            # dst mirrors the bad state

    src.restore(good)
    sync_incremental(src, dst)
    assert _rows(dst) == _rows(src)            # dst converged to restored
    assert _rows(dst)[10] == "v10"             # resurrected row arrived


def test_restore_across_alter_brings_old_schema_back(tmp_path):
    t = _mk(str(tmp_path / "t"), n=40)
    good = t.latest_version()
    t.alter(add_columns=[("extra", pa.string(), "x")])
    assert "extra" in t.schema().names
    t.restore(good)
    assert "extra" not in t.schema().names
    assert t.scan().count() == 40


def test_cli_restore_by_tag(tmp_path, capsys):
    from moonray.jobs.__main__ import main

    t = _mk(str(tmp_path / "t"), n=40)
    t.tag("good")
    t.merge(_changes([0], ["BAD"]))

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    out = run("restore", "--table", t.root, "--ref", "good")
    assert out["restored_to"] == t.ref_version("good")
    assert _rows(t)[0] == "v0"
    with pytest.raises(SystemExit):
        main(["restore", "--table", t.root])

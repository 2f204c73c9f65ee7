"""Branch refs: fork → write → publish fast-forward → drop, the
drop+recreate pointer regression, name rules, and isolation of the
parent during branch work."""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray import MoonrayTable


def _mk(root: str, n: int = 100) -> MoonrayTable:
    t = MoonrayTable.create(
        root, key_col="id",
        schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        index_partitions=4, rows_per_fragment=32)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(n)]),
    })))
    return t


def _rows(t) -> dict:
    out = {}
    for b in t.scan().iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["id"]] = r["v"]
    return out


def _change(ids, vals, op="I", lsn=10_000):
    return rd.from_arrow(pa.table({
        "op": pa.array([op] * len(ids)),
        "lsn": pa.array([lsn] * len(ids), pa.int64()),
        "id": pa.array(ids, pa.int64()),
        "v": pa.array(vals),
    }))


def test_branch_write_publish_drop(tmp_path):
    t = _mk(str(tmp_path / "t"))
    before = _rows(t)

    br = t.create_branch("feature-x")
    assert t.branches() == ["feature-x"]
    br.merge(_change([1, 500], ["patched", "new"]))
    br.merge(_change([2], [""], op="D", lsn=10_001))

    # parent untouched while the branch diverges
    assert _rows(t) == before
    assert _rows(br) != before

    t.publish_branch("feature-x")
    got = _rows(t)
    assert got[1] == "patched" and got[500] == "new" and 2 not in got
    assert len(got) == len(before) + 1 - 1

    # publish is idempotent
    v = t.latest_version()
    assert t.publish_branch("feature-x") == v

    t.drop_branch("feature-x", )
    assert t.branches() == []
    with pytest.raises(FileNotFoundError):
        t.branch("feature-x")


def test_publish_with_drop_and_recreate_same_name(tmp_path):
    """The sync pointer is keyed per branch INCARNATION: after a
    publish+drop, a new branch under the same name must replay ALL its
    commits, not resume from the dead branch's pointer."""
    t = _mk(str(tmp_path / "t"))
    b1 = t.create_branch("hotfix")
    b1.merge(_change([1], ["first"]))
    b1.merge(_change([2], ["first2"], lsn=10_001))
    b1.merge(_change([3], ["first3"], lsn=10_002))
    t.publish_branch("hotfix", drop=True)
    assert _rows(t)[1] == "first"

    b2 = t.create_branch("hotfix")
    b2.merge(_change([10], ["second"]))  # b2's FIRST commit (low version)
    t.publish_branch("hotfix", drop=True)
    assert _rows(t)[10] == "second"  # lost if the old pointer survived


def test_branch_at_tag_and_fork_isolation(tmp_path):
    t = _mk(str(tmp_path / "t"), n=20)
    t.tag("golden")
    t.merge(_change([0], ["after-tag"]))
    br = t.create_branch("from-golden", ref="golden")
    assert _rows(br)[0] == "v0"  # forked BEFORE the post-tag merge
    # fork version survives parent expiry (clone pin)
    t.expire_snapshots(keep_last=1)
    assert _rows(br)[0] == "v0"
    t.drop_branch("from-golden")


def test_branch_name_rules(tmp_path):
    t = _mk(str(tmp_path / "t"), n=10)
    with pytest.raises(ValueError):
        t.create_branch("main")
    with pytest.raises(ValueError):
        t.create_branch("bad/name")
    with pytest.raises(FileNotFoundError):
        t.branch("nope")
    with pytest.raises(FileNotFoundError):
        t.drop_branch("nope")


def test_branch_on_remote_root(tmp_path):
    """Branch lifecycle on a mock:// object-store root: the branch
    root inherits the scheme, list/publish/drop go through the commit
    store."""
    t = _mk("mock://" + str(tmp_path / "obj"))
    before = _rows(t)
    br = t.create_branch("rb")
    assert t.branches() == ["rb"]
    br.merge(_change([1, 500], ["patched", "new"]))
    assert _rows(t) == before
    t.publish_branch("rb", drop=True)
    got = _rows(t)
    assert got[1] == "patched" and got[500] == "new"
    assert t.branches() == []


def test_branch_vacuum_safety(tmp_path):
    """Parent vacuum must never sweep branch bytes, and the branch
    stays readable after it."""
    t = _mk(str(tmp_path / "t"))
    br = t.create_branch("keep")
    br.merge(_change([1], ["branch-only"]))
    rep = t.vacuum(grace_seconds=0)
    assert _rows(br)[1] == "branch-only"
    assert all("branches/" not in p for p in rep["orphans"])

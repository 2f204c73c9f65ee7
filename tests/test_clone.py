"""Shallow clone: zero-copy create, copy-on-write divergence, pin-based
source retention, localization. (moonray/clone.py; the Delta
SHALLOW-CLONE / Iceberg snapshot-re-registration analogue.)"""

import os
import shutil

import pyarrow as pa
import pytest
import ray.data as rd

from moonray import MoonrayTable, clone_table, localize_clone, release_clone
from moonray.filecache import EXT_PREFIX, data_path, ext_ref


def _mk(root: str, n: int = 300) -> MoonrayTable:
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            zone_cols=("id",), index_partitions=4,
                            rows_per_fragment=64)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(n)], pa.string()),
    })))
    return t


def _rows(t, version=None) -> dict:
    out = {}
    for b in t.scan(version=version).iter_batches(batch_format="pyarrow"):
        for i, v in zip(b["id"].to_pylist(), b["val"].to_pylist()):
            out[i] = v
    return out


def _changes(ids, val, op="I", lsn=10_000) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "op": pa.array([op] * len(ids), pa.string()),
        "lsn": pa.array([lsn] * len(ids), pa.int64()),
        "id": pa.array(ids, pa.int64()),
        "val": pa.array([val] * len(ids), pa.string()),
    }))


def test_ext_ref_roundtrip(tmp_path):
    r = ext_ref(str(tmp_path), "fragments/f1.parquet")
    assert r.startswith(EXT_PREFIX)
    assert data_path("/elsewhere", r) == str(tmp_path / "fragments/f1.parquet")
    # already-external refs pass through (clone of clone)
    assert ext_ref("/other/root", r) == r
    with pytest.raises(ValueError):
        ext_ref("/bad::root", "x")


def test_clone_is_zero_copy_and_scan_equal(tmp_path):
    src = _mk(str(tmp_path / "src"))
    c = clone_table(src, str(tmp_path / "dst"))
    assert _rows(c) == _rows(src)
    # no data bytes were copied: the clone's fragment dir is empty and
    # every fragment/index ref is external
    assert os.listdir(os.path.join(c.root, "fragments")) == []
    m = c.manifest()
    assert all(f["path"].startswith(EXT_PREFIX) for f in m["fragments"])
    assert all(r.startswith(EXT_PREFIX)
               for rels in m["index"]["partitions"].values() for r in rels)
    # point lookups ride the external index
    hit = c.lookup([5])
    assert hit.num_rows == 1 and hit["val"][0].as_py() == "v5"
    with pytest.raises(ValueError):
        clone_table(src, str(tmp_path / "dst"))  # dst occupied


def test_clone_copy_on_write_diverges(tmp_path):
    src = _mk(str(tmp_path / "src"))
    src_before = _rows(src)
    src_v = src.latest_version()
    c = clone_table(src, str(tmp_path / "dst"))
    c.merge(_changes([1, 2, 3], "patched"))
    c.merge(_changes([7], "x", op="D", lsn=10_001))
    got = _rows(c)
    assert got[1] == "patched" and 7 not in got
    # the source never observes clone writes
    assert src.latest_version() == src_v
    assert _rows(src) == src_before
    # clone's new fragments/DVs are local, untouched entries still ext
    m = c.manifest()
    kinds = {f["path"].startswith(EXT_PREFIX) for f in m["fragments"]}
    assert kinds == {True, False}


def test_source_expiry_respects_clone_pin(tmp_path):
    src = _mk(str(tmp_path / "src"))
    v = src.latest_version()
    c = clone_table(src, str(tmp_path / "dst"))
    # source moves on: rewrite everything, then expire aggressively
    src.merge(_changes(list(range(0, 300, 3)), "newer"))
    src.optimize("full")
    src.expire_snapshots(keep_last=1)
    # the cloned version (and its files) survive the expire via the pin
    assert v in src.versions()
    rows = _rows(c)
    assert rows[5] == "v5" and len(rows) == 300
    # release the pin and expire again: now the old files are fair game
    release_clone(src, c.root)
    src.expire_snapshots(keep_last=1)
    with pytest.raises(Exception):
        _rows(c)


def test_localize_clone_detaches_from_source(tmp_path):
    src = _mk(str(tmp_path / "src"))
    c = clone_table(src, str(tmp_path / "dst"))
    c.merge(_changes([10, 11], "patched"))
    expect = _rows(c)
    localize_clone(c)
    assert not any(r.startswith(EXT_PREFIX)
                   for r in __import__("moonray.manifest", fromlist=["x"])
                   .referenced_files(c.manifest()))
    release_clone(src, c.root)
    shutil.rmtree(src.root)  # source gone entirely
    assert _rows(c) == expect
    assert c.lookup([10])["val"][0].as_py() == "patched"


def test_clone_of_clone_points_at_original_bytes(tmp_path):
    src = _mk(str(tmp_path / "src"), n=128)
    c1 = clone_table(src, str(tmp_path / "c1"))
    c2 = clone_table(c1, str(tmp_path / "c2"))
    # c2's refs resolve into the ORIGINAL root (pass-through), so no
    # double indirection builds up
    for f in c2.manifest()["fragments"]:
        assert f["path"].startswith(f"{EXT_PREFIX}{src.root}::")
    assert _rows(c2) == _rows(src)


def test_cli_clone_localize_roundtrip(tmp_path, capsys):
    import json

    from moonray.jobs.__main__ import main

    def run(*argv):
        assert main(list(argv)) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    src = _mk(str(tmp_path / "src"), n=128)
    dst = str(tmp_path / "dst")
    out = run("clone", "--table", src.root, "--dest", dst)
    assert out["cloned_from"]["root"] == src.root
    out = run("localize", "--table", dst, "--release-source", src.root)
    assert out["localized"] == dst and out["released_pin_on"] == src.root
    shutil.rmtree(src.root)
    c = MoonrayTable.open(dst)
    assert len(_rows(c)) == 128


def test_cluster_and_compact_on_clone(tmp_path):
    """Maintenance on a clone reads ext fragments and writes local
    replacements — the localization path piecemeal."""
    src = _mk(str(tmp_path / "src"), n=256)
    c = clone_table(src, str(tmp_path / "dst"))
    expect = _rows(c)
    c.cluster(cols=("id",))
    assert _rows(c) == expect
    # clustering rewrote the data locally; source files no longer needed
    assert not any(f["path"].startswith(EXT_PREFIX)
                   for f in c.manifest()["fragments"])
    assert _rows(src) == expect  # source untouched


def test_clone_at_tag(tmp_path):
    src = _mk(str(tmp_path / "src"), n=128)
    src.tag("golden")
    src.merge(_changes([1], "later"))
    c = clone_table(src, str(tmp_path / "dst"), ref="golden")
    assert _rows(c)[1] == "v1"  # pre-merge snapshot
    with pytest.raises(ValueError):
        clone_table(src, str(tmp_path / "dst2"), ref="golden", version=1)


def test_clone_expire_race_detected_via_gc_epoch(tmp_path):
    """The pin-vs-expire race: if an expire was already past its final
    pin read when the clone pinned, the GC epoch moved and clone_table
    verifies the files — detecting loss instead of committing dangling
    ext refs. Simulated by expiring + deleting BETWEEN epoch read and
    pin (the worst interleaving)."""
    from moonray import manifest as mf
    from moonray.clone import _clone_token

    src = _mk(str(tmp_path / "src"))
    v = src.latest_version()
    src.merge(_changes(list(range(0, 300, 3)), "newer"))
    src.optimize("full")

    # worst interleaving, hand-driven: read epoch (quiescent), then an
    # expire runs to completion (it never sees the pin), THEN pin+load
    epoch0 = mf.gc_epoch(src.root)
    src.expire_snapshots(keep_last=1)  # deletes v's manifest AND files
    with pytest.raises((FileNotFoundError, KeyError, Exception)):
        clone_table(src, str(tmp_path / "dst"), version=v)
    # the failed clone left no pin behind
    import os

    assert not os.path.exists(os.path.join(
        src.root, "pins", _clone_token(str(tmp_path / "dst"))))
    # epoch advanced, so a clone that DID span the window would verify
    assert mf.gc_epoch(src.root) > epoch0


def test_expire_recomputes_when_pin_lands_mid_compute(tmp_path, monkeypatch):
    """A pin landing between expire's pin read and its delete phase is
    honored: the retained-set loop re-reads pins and restarts."""
    from moonray import manifest as mf

    src = _mk(str(tmp_path / "src"))
    v = src.latest_version()
    src.merge(_changes(list(range(0, 300, 3)), "newer"))
    src.optimize("full")

    real = mf.referenced_files
    fired = {"done": False}

    def inject(manifest):
        # first call = mid-compute; land a pin exactly there
        if not fired["done"]:
            fired["done"] = True
            mf.pin(src.root, v, "late-pin")
        return real(manifest)

    monkeypatch.setattr(mf, "referenced_files", inject)
    src.expire_snapshots(keep_last=1)
    monkeypatch.setattr(mf, "referenced_files", real)
    # v survived: manifest retained and all its files readable
    assert v in src.versions()
    assert src.scan(version=v).count() == 300


def test_catalog_drop_releases_clone_pin(tmp_path):
    """Dropping a registered clone releases its source pin — including
    after further commits on the clone (cloned_from survives commits)."""
    import os

    from moonray.catalog import MoonrayCatalog
    from moonray.clone import _clone_token

    src = _mk(str(tmp_path / "src"), n=128)
    cat = MoonrayCatalog(str(tmp_path / "cat"))
    c = clone_table(src, str(tmp_path / "cat" / "c1"))
    cat.register_table("c1", c.root)
    c.merge(_changes([1], "x"))           # lineage must survive commits
    assert "cloned_from" in c.manifest()
    pin = os.path.join(src.root, "pins", _clone_token(c.root))
    assert os.path.exists(pin)
    cat.drop_table("c1")
    assert not os.path.exists(pin)

"""Bloom-filter column index sidecars (moonray/colindex.py): pruning
power, end-to-end scan correctness, conservative behavior for unindexed
fragments/missing indexes, the distributed consult path, incremental
rebuild, and the remote (mock://) root."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from moonray import colindex
from moonray.table import MoonrayTable


def _mk(root, n=1000, rpf=64):
    schema = pa.schema([("id", pa.int64()), ("name", pa.string()),
                        ("v", pa.int64())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            rows_per_fragment=rpf, index_partitions=4)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "name": pa.array([f"user-{i:05d}" for i in range(n)], pa.string()),
        "v": pa.array(range(n), pa.int64())})))
    return t


def _ids(ds):
    return sorted(r["id"] for b in ds.iter_batches(batch_format="pyarrow",
                                                   batch_size=8192)
                  for r in b.to_pylist())


def test_prunes_fragments_and_scan_stays_exact(tmp_path):
    t = _mk(str(tmp_path / "t"))
    summary = t.build_column_index("name")
    assert summary["indexed"] == summary["fragments"] == 16
    want = [7, 900]
    got = _ids(t.scan(predicate_in={"name": ["user-00007", "user-00900"]}))
    assert got == want
    pruned = colindex.prune_fragments(
        t.root, t.manifest()["fragments"],
        {"name": ["user-00007", "user-00900"]}, t.schema())
    # the two values live in two distinct fragments; fpp=1% could keep
    # a couple more, never fewer
    assert 2 <= len(pruned) <= 4
    # no-index scan agrees (use_column_index off)
    assert _ids(t.scan(predicate_in={"name": ["user-00007", "user-00900"]},
                       use_column_index=False)) == want


def test_unindexed_new_fragments_are_kept(tmp_path):
    t = _mk(str(tmp_path / "t"))
    t.build_column_index("name")
    # new rows after the build: their fragments have no sidecar
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["I"], pa.string()),
        "lsn": pa.array([1], pa.int64()),
        "id": pa.array([5000], pa.int64()),
        "name": pa.array(["brand-new"], pa.string()),
        "v": pa.array([1], pa.int64())})), job_id="m1")
    assert _ids(t.scan(predicate_in={"name": ["brand-new"]})) == [5000]
    # incremental rebuild: only the new fragment is read
    s = t.build_column_index("name")
    assert s["built"] == 1
    assert _ids(t.scan(predicate_in={"name": ["brand-new"]})) == [5000]


def test_missing_index_is_noop(tmp_path):
    t = _mk(str(tmp_path / "t"), n=200)
    want = _ids(t.scan(predicate_in={"name": ["user-00003"]}))
    assert want == [3]
    assert colindex.load_index(t.root, "name") is None


def test_distributed_consult_path(tmp_path):
    # 32 fragments > _DISTRIBUTED_MIN_FRAGS → ray-task consult
    t = _mk(str(tmp_path / "t"), n=2048, rpf=64)
    t.build_column_index("name")
    frags = t.manifest()["fragments"]
    assert len(frags) >= colindex._DISTRIBUTED_MIN_FRAGS
    vals = ["user-00000", "user-01024", "user-02000"]
    pruned = colindex.prune_fragments(t.root, frags, {"name": vals},
                                      t.schema())
    assert 3 <= len(pruned) <= 6
    assert _ids(t.scan(predicate_in={"name": vals})) == [0, 1024, 2000]


def test_no_false_negatives_bulk(tmp_path):
    """Every present value must survive pruning (bloom has no false
    negatives by construction) — probe every 17th row."""
    t = _mk(str(tmp_path / "t"), n=1000)
    t.build_column_index("name")
    for i in range(0, 1000, 17):
        got = _ids(t.scan(predicate_in={"name": [f"user-{i:05d}"]}))
        assert got == [i], f"row {i} lost"


def test_absent_value_prunes_everything(tmp_path):
    t = _mk(str(tmp_path / "t"), n=500)
    t.build_column_index("name")
    pruned = colindex.prune_fragments(
        t.root, t.manifest()["fragments"],
        {"name": ["nope-1", "nope-2"]}, t.schema())
    # fpp=1% per fragment per value → almost surely all pruned; allow 1
    assert len(pruned) <= 1
    assert _ids(t.scan(predicate_in={"name": ["nope-1"]})) == []


def test_int_column_index(tmp_path):
    t = _mk(str(tmp_path / "t"), n=600)
    t.build_column_index("v")
    assert _ids(t.scan(predicate_in={"v": [123, 456]})) == [123, 456]
    pruned = colindex.prune_fragments(
        t.root, t.manifest()["fragments"], {"v": [123]}, t.schema())
    # v is monotone with the fragment layout → zone maps would also
    # prune; the bloom must agree (1 fragment + fpp slack)
    assert len(pruned) <= 2


def test_compaction_outputs_unindexed_until_rebuild(tmp_path):
    t = _mk(str(tmp_path / "t"), n=512, rpf=32)
    t.build_column_index("name")
    t.optimize("data", target_bytes=1 << 22, min_group=2)
    # compacted fragments are new paths → no sidecars → kept (correct)
    assert _ids(t.scan(predicate_in={"name": ["user-00100"]})) == [100]
    s = t.build_column_index("name")
    assert s["built"] >= 1
    assert _ids(t.scan(predicate_in={"name": ["user-00100"]})) == [100]


def test_remote_root(tmp_path):
    t = _mk(str(tmp_path / "t"), n=300)
    remote = MoonrayTable.open("mock://" + t.root)
    remote.build_column_index("name")
    assert _ids(remote.scan(predicate_in={"name": ["user-00042"]})) == [42]
    pruned = colindex.prune_fragments(
        remote.root, remote.manifest()["fragments"],
        {"name": ["user-00042"]}, remote.schema())
    assert len(pruned) <= 2


def test_unknown_column_raises(tmp_path):
    t = _mk(str(tmp_path / "t"), n=100)
    with pytest.raises(ValueError, match="no column"):
        t.build_column_index("nope")


def test_rebuild_gcs_orphaned_sidecars(tmp_path):
    import glob
    import os

    t = _mk(str(tmp_path / "t"), n=512, rpf=32)
    t.build_column_index("name")
    n_before = len(glob.glob(os.path.join(t.root, "colindex/name/*.bloom")))
    t.optimize("data", target_bytes=1 << 22, min_group=2)
    s = t.build_column_index("name")
    assert s["gc_sidecars"] > 0
    n_after = len(glob.glob(os.path.join(t.root, "colindex/name/*.bloom")))
    # old fragments' sidecars removed; only live entries remain on disk
    assert n_after == s["indexed"] < n_before + s["built"]
    assert _ids(t.scan(predicate_in={"name": ["user-00100"]})) == [100]


def test_missing_sidecar_is_conservative(tmp_path):
    import glob
    import os

    t = _mk(str(tmp_path / "t"), n=300)
    t.build_column_index("name")
    for f in glob.glob(os.path.join(t.root, "colindex/name/*.bloom")):
        os.unlink(f)
    # stale index references GC'd sidecars → every fragment kept, scan
    # stays exact (never raises, never drops rows)
    assert _ids(t.scan(predicate_in={"name": ["user-00042"]})) == [42]
    pruned = colindex.prune_fragments(
        t.root, t.manifest()["fragments"], {"name": ["user-00042"]},
        t.schema())
    assert len(pruned) == len(t.manifest()["fragments"])


def test_row_group_bloom_prunes_inside_fragment(tmp_path):
    """Sidecar v2 carries one bloom PER ROW GROUP: on a single-fragment
    table with SHUFFLED values (rg min/max stats span everything and
    prune nothing) the consult must narrow 8 row groups to ~1."""
    import moonray.table as mt
    from moonray.colindex import _hash_values, read_sidecar, rgs_maybe

    rng = np.random.default_rng(5)
    order = rng.permutation(512)
    schema = pa.schema([("id", pa.int64()), ("name", pa.string())])
    t = MoonrayTable.create(str(tmp_path / "t"), key_col="id",
                            schema=schema, index_partitions=4,
                            rows_per_fragment=512)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(512), pa.int64()),
        "name": pa.array([f"user-{order[i]:05d}" for i in range(512)],
                         pa.string())})))
    m = t.manifest()
    assert len(m["fragments"]) == 1 and m["fragments"][0]["rg_rows"] == 64
    t.build_column_index("name")

    entry = colindex.load_index(t.root, "name")["frags"][
        m["fragments"][0]["path"]]
    h = _hash_values(["user-00123"], pa.string())
    mask = rgs_maybe(read_sidecar(t.root, entry), h, list(range(8)))
    assert 1 <= sum(mask) <= 2  # the true row group + fpp slack
    kept = mt._rgs_bloom_maybe(t.root, {"name": (entry, h)},
                               list(range(8)))
    assert 1 <= len(kept) <= 2

    # e2e: the scan stays exact through the in-task rg consult
    got = _ids(t.scan(predicate_in={"name": ["user-00123"]}))
    assert got == [int(np.flatnonzero(order == 123)[0])]


def test_corrupt_sidecar_degrades_to_keep(tmp_path):
    """Review finding (session 4): a truncated sidecar whose header is
    intact must degrade to keep-the-fragment, never crash a scan."""
    import glob
    import os

    t = _mk(str(tmp_path / "t"), n=300)
    t.build_column_index("name")
    for f in glob.glob(os.path.join(t.root, "colindex/name/*.bloom")):
        data = open(f, "rb").read()
        with open(f, "wb") as out:
            out.write(data[:len(data) // 2])  # header ok, payload cut
    assert _ids(t.scan(predicate_in={"name": ["user-00042"]})) == [42]
    pruned = colindex.prune_fragments(
        t.root, t.manifest()["fragments"], {"name": ["user-00042"]},
        t.schema())
    assert len(pruned) == len(t.manifest()["fragments"])


def test_maintain_if_needed_refreshes_indexes(tmp_path):
    """The background-maintenance loop keeps bloom indexes fresh:
    fragments born from merges AND from the compaction it just ran are
    indexed in the same pass (build runs after optimize), dead
    fragments' sidecars GC'd."""
    t = _mk(str(tmp_path / "t"), n=512, rpf=32)
    t.build_column_index("name")
    # enough small fragments that the compact trigger fires
    for i in range(3):
        t.merge(rd.from_arrow(pa.table({
            "op": pa.array(["I"] * 4, pa.string()),
            "lsn": pa.array([i + 1] * 4, pa.int64()),
            "id": pa.array(range(9000 + 4 * i, 9004 + 4 * i), pa.int64()),
            "name": pa.array([f"late-{j}" for j in range(4)], pa.string()),
            "v": pa.array([0] * 4, pa.int64())})), job_id=f"m{i}")
    rep = t.maintain_if_needed()
    assert any(a.startswith("colindex(name:") for a in rep["actions"])
    idx = colindex.load_index(t.root, "name")
    live = {f["path"] for f in t.manifest()["fragments"]}
    assert set(idx["frags"]) == live  # every live fragment indexed
    assert _ids(t.scan(predicate_in={"name": ["late-1"]})) != []

    # steady state: nothing new → no colindex action
    rep2 = t.maintain_if_needed()
    assert not any(a.startswith("colindex") for a in rep2["actions"])


def test_steady_state_build_skips_republish(tmp_path):
    """Review finding (session 4, round 2): a maintenance tick on a
    quiet table must not republish index.json."""
    import os

    t = _mk(str(tmp_path / "t"), n=200)
    t.build_column_index("name")
    idx_path = os.path.join(t.root, "colindex/name/index.json")
    before = os.path.getmtime(idx_path)
    s = t.build_column_index("name")
    assert s["built"] == 0 and s["gc_sidecars"] == 0
    assert os.path.getmtime(idx_path) == before


def test_maintain_expire_not_triggered_by_colindex(tmp_path):
    """A colindex refresh after a plain merge must not trim the
    time-travel horizon (expire fires only on CORE maintenance)."""
    t = _mk(str(tmp_path / "t"), n=128, rpf=64)
    t.build_column_index("name")
    v0 = t.latest_version()
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["I"], pa.string()),
        "lsn": pa.array([1], pa.int64()),
        "id": pa.array([9999], pa.int64()),
        "name": pa.array(["late"], pa.string()),
        "v": pa.array([0], pa.int64())})), job_id="m1")
    rep = t.maintain_if_needed(expire_keep_last=1)
    assert any(a.startswith("colindex") for a in rep["actions"])
    assert not any(a.startswith("expire") for a in rep["actions"])
    assert t.scan(version=v0).count() == 128  # old version retained

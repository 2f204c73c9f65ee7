"""Resume-check job markers: find_version_by_job at the head of every
merge/maintenance call resolves from one jobs/ directory listing plus
at most one version read — not a read of EVERY version JSON, which at
10^4+ commits between expiries made the resume check O(history) store
reads inside the MERGE loop (the reference resolves replay idempotency
from its WAL/LSN state, not by scanning snapshots:
src/moonlink/src/storage/wal.rs:670-760).

Marker-first commit ordering (marker put, then version put) guarantees
a committed version always carries its committing job's marker; stale
markers from lost races or crashes are validated against the version
JSON's job_id and skipped; legacy/unmarked versions are covered by a
scan restricted to exactly the unmarked set.
"""

import json
import os

import pyarrow as pa
import pytest
import ray.data as rd

from moonray import manifest as mf
from moonray.commitstore import LocalCommitStore
from moonray.table import MoonrayTable


def _mk(root: str) -> MoonrayTable:
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    return MoonrayTable.create(root, key_col="id", schema=schema,
                               index_partitions=2, rows_per_fragment=32)


def _load(n: int, start: int = 0) -> rd.Dataset:
    return rd.from_arrow(pa.table({
        "id": pa.array(range(start, start + n), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(start, start + n)],
                        pa.string()),
    }))


def test_marker_fast_path_bounds_version_reads(tmp_path, monkeypatch):
    t = _mk(str(tmp_path / "tbl"))
    for i in range(6):
        t.bulk_load(_load(32, start=32 * i), job_id=f"load-{i}")
    head = t.latest_version()

    reads = []
    real_read = LocalCommitStore.read

    def counting_read(self, rel):
        reads.append(rel)
        return real_read(self, rel)

    monkeypatch.setattr(LocalCommitStore, "read", counting_read)
    # committed job: one listing + exactly one version read
    assert mf.find_version_by_job(t.root, "load-3") is not None
    version_reads = [r for r in reads if r.startswith("versions/v")]
    assert len(version_reads) == 1

    # unknown job on a fully-marked table: ZERO version reads
    reads.clear()
    assert mf.find_version_by_job(t.root, "never-ran") is None
    assert not [r for r in reads if r.startswith("versions/v")]
    assert t.latest_version() == head


def test_markers_written_and_resume_idempotent(tmp_path):
    t = _mk(str(tmp_path / "tbl"))
    t.bulk_load(_load(64), job_id="load-A")
    v = t.latest_version()
    store = mf._store(t.root)
    assert store.exists(mf._job_marker_rel("load-A", v))
    # resume: same job id returns the committed version, no new commit
    assert t.bulk_load(_load(64), job_id="load-A") == v
    assert t.latest_version() == v


def test_legacy_unmarked_versions_still_found(tmp_path):
    t = _mk(str(tmp_path / "tbl"))
    t.bulk_load(_load(64), job_id="load-A")
    v = t.latest_version()
    store = mf._store(t.root)
    for rel in store.list("jobs"):
        store.delete(rel)  # simulate a table written before markers
    assert mf.find_version_by_job(t.root, "load-A") == v
    assert mf.find_version_by_job(t.root, "missing") is None


def test_stale_marker_from_lost_race_is_skipped(tmp_path):
    t = _mk(str(tmp_path / "tbl"))
    t.bulk_load(_load(64), job_id="load-A")
    v = t.latest_version()
    store = mf._store(t.root)
    # loser of a version race: marker exists, version JSON belongs to
    # load-A; and an aborted attempt whose version never landed
    store.put_if_absent(mf._job_marker_rel("loser-job", v), b"")
    store.put_if_absent(mf._job_marker_rel("crashed-job", v + 7), b"")
    assert mf.find_version_by_job(t.root, "loser-job") is None
    assert mf.find_version_by_job(t.root, "crashed-job") is None
    assert mf.find_version_by_job(t.root, "load-A") == v


def test_expiry_sweeps_markers_of_expired_versions(tmp_path):
    t = _mk(str(tmp_path / "tbl"))
    for i in range(5):
        t.bulk_load(_load(32, start=32 * i), job_id=f"load-{i}")
    store = mf._store(t.root)
    store.put_if_absent(mf._job_marker_rel("crashed-job", 999), b"")
    out = mf.expire_snapshots(t.root, keep_last=2)
    kept = set(out["kept_versions"])
    live = mf._marker_versions(store.list("jobs"))
    assert set(live) <= kept
    assert not store.exists(mf._job_marker_rel("crashed-job", 999))
    # retained versions keep their markers → fast path intact
    assert mf.find_version_by_job(t.root, "load-4") == t.latest_version()
    # expired job: gone (same answer the version-scan gave once the
    # version JSON was deleted)
    assert mf.find_version_by_job(t.root, "load-0") is None

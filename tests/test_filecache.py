"""Remote-file cache (ObjectStorageCache analogue): fetch-once reuse,
LRU eviction, and the table read path (fragment + DV + index) serving a
'remote' root through the cache via the mock:// scheme."""

import os

import pyarrow as pa
import ray.data as rd

import moonray.filecache as fc
from moonray.table import MoonrayTable, _read_fragment

SCHEMA = pa.schema([("id", pa.int64()), ("name", pa.string())])


def test_cache_fetch_once_and_lru_eviction(tmp_path):
    src = tmp_path / "remote"
    src.mkdir()
    for i in range(4):
        (src / f"f{i}.bin").write_bytes(bytes([i]) * 1000)
    cache = fc.FileCache(str(tmp_path / "cache"), capacity_bytes=2500)
    fetches = {"n": 0}

    def fetch(root, rel, dst):
        fetches["n"] += 1
        import shutil

        shutil.copyfile(os.path.join(str(src), rel), dst)

    p = cache.get("mock://x", "f0.bin", fetch)
    assert open(p, "rb").read() == b"\x00" * 1000
    cache.get("mock://x", "f0.bin", fetch)  # hit
    assert fetches["n"] == 1 and cache.hits == 1
    # exceed capacity → LRU files evicted, newest survives
    for i in range(1, 4):
        cache.get("mock://x", f"f{i}.bin", fetch)
    assert fetches["n"] == 4
    cached = os.listdir(cache.dir)
    assert len(cached) <= 2  # 2500 bytes capacity / 1000-byte files
    assert any("f3.bin" in c for c in cached)
    # evicted file refetches
    cache.get("mock://x", "f0.bin", fetch)
    assert fetches["n"] == 5


def test_remote_fragment_read_through_cache(tmp_path, monkeypatch):
    """Build a table locally, then read its fragments as if the root
    were an object store: _read_fragment(mock://root, ...) must produce
    identical rows and fetch each file exactly once across scans."""
    root = str(tmp_path / "t")
    t = MoonrayTable.create(root, key_col="id", schema=SCHEMA,
                            index_partitions=2, rows_per_fragment=8)
    t.bulk_load(rd.from_items([{"id": i, "name": f"n{i}"} for i in range(24)]))
    t.merge(rd.from_items([
        {"op": "D", "lsn": 1, "id": 5, "name": None}]))  # a DV file too
    m = t.manifest()

    monkeypatch.setattr(fc, "_CACHE",
                        fc.FileCache(str(tmp_path / "cache"), 1 << 20))
    fc._FETCH_COUNTS.clear()
    remote = f"mock://{root}"
    rows = []
    for f in m["fragments"]:
        from moonray.dv import dv_paths_of

        tbl = _read_fragment(remote, f["path"], dv_paths_of(f),
                             SCHEMA, {}, False)
        rows.extend(tbl.to_pylist())
    assert sorted(r["id"] for r in rows) == [i for i in range(24) if i != 5]
    first_counts = dict(fc._FETCH_COUNTS)
    # second pass: all cache hits, zero new fetches
    for f in m["fragments"]:
        from moonray.dv import dv_paths_of

        _read_fragment(remote, f["path"], dv_paths_of(f), SCHEMA, {}, False)
    assert fc._FETCH_COUNTS == first_counts
    assert all(v == 1 for v in fc._FETCH_COUNTS.values())

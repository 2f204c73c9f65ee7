"""Driver-side manifest microbench at production-ish fragment counts.

The cluster never sees this — it measures the DRIVER cost of the
segmented-manifest commit/load path (manifest.py) at fragment counts a
100 TB table actually has (10^5-10^6 at the 512 MiB default fragment
size), which the Ray-level scale_stress toy (60-600 fragments) cannot
reach. Reports, for N synthetic fragments:

- first segmented commit: wall + metadata bytes (writes every chunk)
- steady-state append commit (+16 fragments): wall + NEW bytes
- scattered-DV merge commit (5% of fragments touched): wall + NEW bytes
- load_manifest: cold (reads + parses all chunks) and warm (seg cache)

Run:  python scripts/manifest_bench.py [N ...]   (default 200000)
Appends kind="manifest_bench" records to BENCH_SCALING_HISTORY.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fragments(n: int) -> list[dict]:
    return [{
        "id": f"frag-{i:08d}",
        "path": f"fragments/frag-{i:08d}.parquet",
        "rows": 1_000_000,
        "bytes": 512 * (1 << 20),
        "rg_rows": 65536,
        "created_version": 1,
        "zones": {"phash": [i * 97, i * 97 + 5000],
                  "w": [64, 4096], "h": [64, 4096]},
        "dv": [],
        "dv_count": 0,
    } for i in range(n)]


def _dir_bytes(root: str) -> int:
    total = 0
    for sub in ("versions", "segments"):
        d = os.path.join(root, sub)
        if os.path.isdir(d):
            total += sum(os.path.getsize(os.path.join(d, f))
                         for f in os.listdir(d)
                         if os.path.isfile(os.path.join(d, f)))
    return total


def run_one(n: int) -> dict:
    from moonray import manifest as mf

    root = tempfile.mkdtemp(prefix="moonray-mfbench-")
    mf.init_table_dirs(root)
    frags = _fragments(n)
    base = {
        "version": 1, "parent": None, "op": "append", "commit_lsn": 1,
        "job_id": "j1", "key_col": "image_id", "key_cols": None,
        "identity": "keys", "zone_cols": ["phash", "w", "h"],
        "index": {"num_partitions": 64, "partitions": {}},
        "rows_per_fragment": 1_000_000, "schema_ipc": "00",
        "column_defaults": {},
    }
    out = {"n_fragments": n}

    t0 = time.perf_counter()
    mf.commit_manifest(root, dict(base, fragments=frags))
    out["first_commit_s"] = round(time.perf_counter() - t0, 3)
    b1 = _dir_bytes(root)
    out["first_commit_mib"] = round(b1 / (1 << 20), 2)

    # steady-state append: +16 fragments at the tail
    frags2 = frags + _fragments(16)
    for i, f in enumerate(frags2[n:]):
        f["id"] = f"frag-app-{i:08d}"
    t0 = time.perf_counter()
    mf.commit_manifest(root, dict(base, version=2, parent=1,
                                  fragments=frags2))
    out["append_commit_s"] = round(time.perf_counter() - t0, 3)
    b2 = _dir_bytes(root)
    out["append_new_kib"] = round((b2 - b1) / 1024, 1)

    # scattered DV merge: 5% of fragments gain a DV ref
    import copy

    frags3 = [dict(f) for f in frags2]
    for i in range(0, n, 20):
        frags3[i] = dict(frags3[i], dv=[f"dv/d{i}.npy"], dv_count=100)
    t0 = time.perf_counter()
    mf.commit_manifest(root, dict(base, version=3, parent=2,
                                  fragments=frags3))
    out["dv_commit_s"] = round(time.perf_counter() - t0, 3)
    b3 = _dir_bytes(root)
    out["dv_new_kib"] = round((b3 - b2) / 1024, 1)
    out["total_meta_mib"] = round(b3 / (1 << 20), 2)

    mf._SEG_CACHE.clear()
    t0 = time.perf_counter()
    m = mf.load_manifest(root, 3)
    out["load_cold_s"] = round(time.perf_counter() - t0, 3)
    assert len(m["fragments"]) == n + 16
    assert sum(f["dv_count"] for f in m["fragments"]) == 100 * ((n + 19) // 20)
    t0 = time.perf_counter()
    mf.load_manifest(root, 3)
    out["load_warm_s"] = round(time.perf_counter() - t0, 3)

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    sizes = [int(x) for x in sys.argv[1:]] or [200_000]
    hist = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_HISTORY.jsonl")
    for n in sizes:
        r = run_one(n)
        r.update({"kind": "manifest_bench", "t": time.time()})
        print(json.dumps(r))
        with open(hist, "a") as f:
            f.write(json.dumps(r) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

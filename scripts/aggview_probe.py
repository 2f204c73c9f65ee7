"""Aggregate-view sync cost is O(changed rows), not O(table): apply the
SAME change set to sources of increasing size and time sync_aggregate.

Evidence for the IVM scale contract (aggview.py docstring): the sync
round reads only the changelog + per-group point lookups + tied-extreme
rescans, so its wall time must stay ~flat while the source grows 10×.
Writes one JSONL record (kind="aggview_probe") per size to
BENCH_SCALING_HISTORY.jsonl when run from the repo root.

Usage: python scripts/aggview_probe.py [sizes...]   (default 100000 1000000)
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

N_GROUPS = 4096
N_CHANGES = 2000


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from moonray.aggview import build_aggregate_view, sync_aggregate
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    sizes = [int(s) for s in sys.argv[1:]] or [100_000, 1_000_000]
    aggs = {"cnt": ("count", None), "sum_x": ("sum", "x"),
            "min_x": ("min", "x"), "max_x": ("max", "x"),
            "nd_x": ("count_distinct", "x")}
    results = []
    for n in sizes:
        rng = np.random.default_rng(7)
        schema = pa.schema([("id", pa.int64()), ("g", pa.int64()),
                            ("x", pa.int64())])
        src = MoonrayTable.create(
            scratch_root("aggprobe-src-"), key_col="id", schema=schema,
            zone_cols=("g",), rows_per_fragment=65536,
            index_partitions=16)
        src.bulk_load(rd.from_arrow(pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "g": pa.array(rng.integers(0, N_GROUPS, n).astype(np.int64)),
            "x": pa.array(rng.integers(0, 1_000_000, n)
                          .astype(np.int64))})))
        t0 = time.perf_counter()
        dst = build_aggregate_view(src, scratch_root("aggprobe-view-"),
                                   group_cols=["g"], aggs=aggs)
        build_s = time.perf_counter() - t0

        # the SAME logical change set at every size: 1/3 deletes of
        # existing ids, 2/3 inserts of new ids (some extreme deletes
        # land, exercising the rescan path)
        dels = rng.choice(n, N_CHANGES // 3, replace=False).astype(np.int64)
        n_ins = N_CHANGES - len(dels)
        ins = np.arange(n + 1, n + 1 + n_ins, dtype=np.int64)
        ops = pa.table({
            "op": pa.array(["D"] * len(dels) + ["I"] * n_ins, pa.string()),
            "lsn": pa.array(np.ones(N_CHANGES, np.int64), pa.int64()),
            "id": pa.array(np.r_[dels, ins]),
            "g": pa.array(rng.integers(0, N_GROUPS, N_CHANGES)
                          .astype(np.int64)),
            "x": pa.array(rng.integers(0, 1_000_000, N_CHANGES)
                          .astype(np.int64))})
        src.merge(rd.from_arrow(ops), job_id="probe-1")

        stats: dict = {}
        t0 = time.perf_counter()
        sync_aggregate(src, dst, group_cols=["g"], aggs=aggs, stats=stats)
        sync_s = time.perf_counter() - t0
        rec = {"kind": "aggview_probe", "rows": n, "groups": N_GROUPS,
               "changes": N_CHANGES, "build_s": round(build_s, 3),
               "sync_s": round(sync_s, 3), **stats}
        results.append(rec)
        print(json.dumps(rec))

    hist = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_SCALING_HISTORY.jsonl")
    with open(hist, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    ray.shutdown()


if __name__ == "__main__":
    main()

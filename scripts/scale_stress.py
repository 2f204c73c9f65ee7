"""10x scale-stress: load + MERGE + cluster at 48k and 480k images.

Smokes out driver-side O(n) (manifest size, per-bucket summaries,
boundary-sample constants) by measuring, at both scales:

- per-phase wall time (workload scales 10x; wall should too, not worse)
- driver process peak RSS (must grow FAR slower than 10x — the driver
  holds metadata, never payload)
- manifest JSON size + fragment count (metadata ∝ fragments, and
  fragments ∝ data / rows_per_fragment — linear in FILES, whose count
  the rows_per_fragment knob controls, not in rows)

Appends one record per scale to BENCH_SCALING_HISTORY.jsonl with
kind="scale_stress". Run:  python scripts/scale_stress.py [mult ...]
"""

from __future__ import annotations

import json
import os
import resource
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_IMAGES = 48_000
BASE_CHANGES = 30_000


def rss_mib() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def run_one(n_images: int, n_changes: int, sizes=None) -> dict:
    from moonray.fixtures import (IMAGE_SCHEMA, make_changes_dataset,
                                  make_images_dataset)
    from moonray.table import MoonrayTable

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="moonray-stress-", dir=base)
    out: dict = {"n_images": n_images, "n_changes": n_changes,
                 "payload": "thin" if sizes else "full",
                 "rss_mib_start": round(rss_mib(), 1)}
    try:
        t0 = time.perf_counter()
        t = MoonrayTable.create(root, key_col="image_id",
                                schema=IMAGE_SCHEMA,
                                zone_cols=("phash", "w", "h"),
                                index_partitions=32,
                                rows_per_fragment=1024)
        t.bulk_load(make_images_dataset(n_images, seed=42, sizes=sizes))
        out["load_s"] = round(time.perf_counter() - t0, 2)
        out["rss_mib_after_load"] = round(rss_mib(), 1)

        t1 = time.perf_counter()
        t.merge(make_changes_dataset(n_changes, n_images, seed=42, sizes=sizes))
        out["merge_s"] = round(time.perf_counter() - t1, 2)
        out["merge_rows_per_s"] = round(n_changes / out["merge_s"], 1)
        out["rss_mib_after_merge"] = round(rss_mib(), 1)

        t2 = time.perf_counter()
        t.cluster()
        out["cluster_s"] = round(time.perf_counter() - t2, 2)
        out["rss_mib_after_cluster"] = round(rss_mib(), 1)

        d = t.describe()
        out["cardinality"] = d["cardinality"]
        out["num_fragments"] = d["num_fragments"]
        out["table_gib"] = round(d["bytes"] / (1 << 30), 3)
        vdir = os.path.join(root, "versions")
        mpath = os.path.join(vdir, sorted(
            f for f in os.listdir(vdir) if f.endswith(".json"))[-1])
        out["manifest_kib"] = round(os.path.getsize(mpath) / 1024, 1)
        out["total_s"] = round(time.perf_counter() - t0, 2)
        out["rows_per_s"] = round((n_images + n_changes) / out["total_s"], 1)

        # Metadata write amplification: a small steady-state commit on a
        # big table must write O(changed) metadata bytes, not O(table).
        # Segmented manifests (manifest.py) are what makes this hold —
        # pre-segmentation, every commit re-serialized the full fragment
        # list, so this number grew linearly with the table. Measured as
        # the bytes of NEW files under versions/ + segments/ created by
        # one 512-row merge.
        def _meta_files() -> dict:
            files = {}
            for sub in ("versions", "segments"):
                sd = os.path.join(root, sub)
                if os.path.isdir(sd):
                    for fn in os.listdir(sd):
                        p = os.path.join(sd, fn)
                        if os.path.isfile(p):
                            files[f"{sub}/{fn}"] = os.path.getsize(p)
            return files

        pre = _meta_files()
        t3 = time.perf_counter()
        t.merge(make_changes_dataset(128, n_images, seed=99, sizes=sizes))
        out["small_commit_s"] = round(time.perf_counter() - t3, 2)
        post = _meta_files()
        new = {f: sz for f, sz in post.items() if f not in pre}
        out["small_commit_meta_kib"] = round(sum(new.values()) / 1024, 1)
        # component breakdown: version JSON (O(chunks)), rewritten core
        # chunks (O(touched chunks) — appends touch the tail chunk
        # only; DV scatter touches none), dv-state (O(frags with DVs))
        out["small_commit_vjson_kib"] = round(sum(
            sz for f, sz in new.items() if f.startswith("versions/")) / 1024, 1)
        out["small_commit_core_kib"] = round(sum(
            sz for f, sz in new.items()
            if f.startswith("segments/seg-")) / 1024, 1)
        out["small_commit_dvstate_kib"] = round(sum(
            sz for f, sz in new.items()
            if f.startswith("segments/dvs-")) / 1024, 1)
        out["total_meta_kib"] = round(sum(post.values()) / 1024, 1)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def run_curate(n_base: int, sizes=None) -> dict:
    """Curation-flagship stress: dup-family corpus → bulk load →
    curate_table (quality gate → pHash LSH families → distributed
    components → one MERGE of D rows). Driver holds the drop summary
    only — RSS must stay ~flat at 10×."""
    from moonray.fixtures import IMAGE_SCHEMA, make_images_with_dup_families
    from moonray.pipelines.curation import curate_table
    from moonray.table import MoonrayTable

    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    root = tempfile.mkdtemp(prefix="moonray-curate-stress-", dir=base)
    out: dict = {"n_base": n_base,
                 "payload": "thin" if sizes else "full",
                 "rss_mib_start": round(rss_mib(), 1)}
    try:
        t0 = time.perf_counter()
        t = MoonrayTable.create(root, key_col="image_id",
                                schema=IMAGE_SCHEMA,
                                zone_cols=("phash", "w", "h"),
                                index_partitions=32,
                                rows_per_fragment=1024)
        t.bulk_load(make_images_with_dup_families(n_base, seed=42,
                                                  sizes=sizes))
        out["load_s"] = round(time.perf_counter() - t0, 2)
        n_loaded = t.describe()["cardinality"]
        out["rows_loaded"] = n_loaded
        out["rss_mib_after_load"] = round(rss_mib(), 1)

        t1 = time.perf_counter()
        curate_table(t, lsn=5_000_000)
        out["curate_s"] = round(time.perf_counter() - t1, 2)
        out["curate_rows_per_s"] = round(n_loaded / out["curate_s"], 1)
        out["rss_mib_after_curate"] = round(rss_mib(), 1)
        d = t.describe()
        out["kept"] = d["cardinality"]
        out["dropped"] = n_loaded - d["cardinality"]
        out["total_s"] = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> int:
    import ray

    # --thin: 32/64-px payloads — scales the ROW/METADATA axis (fragment
    # count, manifest size, index entries, boundary samples, bucket
    # summaries: everything driver-side) to 10x without the ~100 GiB
    # peak scratch a full-payload 480k run needs (this box shares one
    # 126 GiB tmpfs with RAM; peak scratch during cluster is ~3.3x live
    # bytes: v1 fragments + merge outputs + IPC runs + new fragments).
    # Payload-byte scaling is covered by a separate full-payload run at
    # a multiple that fits (e.g. `scale_stress.py 1 5`).
    thin = "--thin" in sys.argv
    sizes = (32, 64) if thin else None
    # chunk geometry scaled to this toy's fragment counts (60-600) the
    # way the default (target 1024) is scaled to 10^6-10^7 fragments:
    # the table must span MANY chunks for chunk reuse to be measurable
    from moonray import manifest as _mf

    _mf._SEG_INLINE_MAX = int(os.environ.get(
        "MOONRAY_MANIFEST_INLINE_MAX", "24"))
    _mf._SEG_TARGET = int(os.environ.get(
        "MOONRAY_MANIFEST_SEGMENT_TARGET", "48"))
    pipeline = "merge"
    if "--pipeline" in sys.argv:
        pipeline = sys.argv[sys.argv.index("--pipeline") + 1]
    args = [a for a in sys.argv[1:] if not a.startswith("--")
            and a != pipeline]
    mults = [int(m) for m in args] or [1, 10]
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    if pipeline == "curate":
        recs = []
        for m in mults:
            r = run_curate(20_000 * m, sizes=sizes)
            r.update({"kind": "scale_stress_curate", "mult": m,
                      "num_cpus": num_cpus, "t": time.time()})
            print(json.dumps(r))
            recs.append(r)
            hist = os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_SCALING_HISTORY.jsonl")
            with open(hist, "a") as f:
                f.write(json.dumps(r) + "\n")
        if len(recs) >= 2:
            a, b = recs[0], recs[-1]
            print(json.dumps({
                "kind": "scale_stress_curate_summary",
                "data_scale": b["n_base"] / a["n_base"],
                "wall_scale": round(b["total_s"] / a["total_s"], 2),
                "curate_scale": round(b["curate_s"] / a["curate_s"], 2),
                "rss_scale": round(b["rss_mib_after_curate"]
                                   / a["rss_mib_after_curate"], 2),
                "drop_rate_a": round(a["dropped"] / a["rows_loaded"], 4),
                "drop_rate_b": round(b["dropped"] / b["rows_loaded"], 4),
            }))
        ray.shutdown()
        return 0
    recs = []
    for m in mults:
        r = run_one(BASE_IMAGES * m, BASE_CHANGES * m, sizes=sizes)
        r.update({"kind": "scale_stress", "mult": m, "num_cpus": num_cpus,
                  "t": time.time()})
        print(json.dumps(r))
        recs.append(r)
        hist = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SCALING_HISTORY.jsonl")
        with open(hist, "a") as f:
            f.write(json.dumps(r) + "\n")
    if len(recs) >= 2:
        a, b = recs[0], recs[-1]
        scale = b["n_images"] / a["n_images"]
        print(json.dumps({
            "kind": "scale_stress_summary",
            "data_scale": scale,
            "wall_scale": round(b["total_s"] / a["total_s"], 2),
            "rss_scale": round(b["rss_mib_after_cluster"]
                               / a["rss_mib_after_cluster"], 2),
            "manifest_scale": round(b["manifest_kib"] / a["manifest_kib"], 2),
            "fragment_scale": round(b["num_fragments"] / a["num_fragments"], 2),
            # the segmented-manifest claim: ~flat as the table grows
            "small_commit_meta_scale": round(
                b["small_commit_meta_kib"]
                / max(a["small_commit_meta_kib"], 0.1), 2),
        }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())

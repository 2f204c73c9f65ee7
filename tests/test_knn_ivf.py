"""IVF-bucketed ANN recall vs the exact brute-force baseline."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.knn import knn_cosine, knn_cosine_ivf


def _dataset(n=1500, d=32, seed=3):
    rng = np.random.default_rng(seed)
    # clustered data (ANN-friendly): 8 gaussian blobs
    centers = rng.normal(size=(8, d))
    assign = rng.integers(0, 8, n)
    vecs = centers[assign] + 0.3 * rng.normal(size=(n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs],
                              pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl), vecs


def test_ivf_recall_vs_exact():
    ds, vecs = _dataset()
    queries = [(int(i), vecs[i]) for i in range(8)]
    exact = knn_cosine(ds, queries, k=10)
    approx = knn_cosine_ivf(ds, queries, k=10, n_centroids=16, n_probe=4)

    def to_sets(t):
        out = {}
        for r in t.to_pylist():
            out.setdefault(r["qid"], set()).add(r["nid"])
        return out

    ex, ap = to_sets(exact), to_sets(approx)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    # every result list is exactly k long and excludes the query itself
    for q, ids in ap.items():
        assert len(ids) == 10 and q not in ids


def test_persisted_ivf_layout_prunes_io_and_recalls():
    """The persisted IVF layout must (a) keep recall vs brute force and
    (b) read bytes/files proportional to PROBED buckets, not the corpus
    (VERDICT r2: the query-time-assignment IVF streamed 100% of the
    corpus)."""
    from moonray.functions.knn import IvfIndex, build_ivf_layout
    from moonray.util import scratch_root

    ds, vecs = _dataset()
    root = scratch_root("mr-ivf-")
    idx = build_ivf_layout(ds, root, n_centroids=16, seed=7)
    reopened = IvfIndex.open(root)

    queries = [(int(i), vecs[i]) for i in range(8)]
    exact = knn_cosine(ds, queries, k=10)
    approx, stats = reopened.search(queries, k=10, n_probe=4,
                                    with_stats=True)

    def to_sets(t):
        out = {}
        for r in t.to_pylist():
            out.setdefault(r["qid"], set()).add(r["nid"])
        return out

    ex, ap = to_sets(exact), to_sets(approx)
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9, recalls
    for q, ids in ap.items():
        assert len(ids) == 10 and q not in ids

    # I/O pruning: the 8 clustered query points probe ≤ 8×4 of 16
    # buckets; with blob-clustered data the probed share of bytes must
    # be well under the whole corpus. (Empty centroids write no dir, so
    # buckets_total may be < n_centroids.)
    assert 4 <= stats["buckets_total"] <= 16
    assert stats["buckets_read"] < stats["buckets_total"]
    assert stats["bytes_read"] < stats["bytes_total"]
    assert stats["files_read"] < stats["files_total"]
    # proportionality: bytes_read within 2x of the probed-bucket share
    share = stats["buckets_read"] / stats["buckets_total"]
    assert stats["bytes_read"] <= 2.0 * share * stats["bytes_total"]

    # single focused query set probes n_probe=2 of 16 buckets → tiny read
    one, s1 = reopened.search([(0, vecs[0])], k=5, n_probe=2,
                              with_stats=True)
    assert s1["buckets_read"] <= 2
    assert s1["bytes_read"] < 0.5 * s1["bytes_total"]
    assert len(one) == 5


def test_ann_join_big_big_recall_and_shape():
    """ann_join: LARGE query side against the persisted layout — no
    query broadcast. Recall vs per-query brute force ≥0.9 on clustered
    data; output is (qid, nid, rank) with exactly k rows per query and
    1-based contiguous ranks."""
    from moonray.functions.knn import ann_join, build_ivf_layout
    from moonray.util import scratch_root

    ds, vecs = _dataset()
    root = scratch_root("mr-annjoin-")
    idx = build_ivf_layout(ds, root, n_centroids=16, seed=7)

    n_q = 64
    rng = np.random.default_rng(11)
    q_vecs = vecs[:n_q] + 0.01 * rng.normal(size=(n_q, vecs.shape[1]))
    left = rd.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(n_q) + 10_000, pa.int64()),
        "embedding": pa.array([v.tolist() for v in q_vecs],
                              pa.list_(pa.float32()))}))

    got = ann_join(left, idx, k=10, n_probe=4).to_pandas()
    assert set(got.columns) == {"qid", "nid", "rank"}

    exact = knn_cosine(ds, [(int(i + 10_000), q_vecs[i])
                            for i in range(n_q)], k=10, exclude_self=False)
    ex, ap = {}, {}
    for r in exact.to_pylist():
        ex.setdefault(r["qid"], set()).add(r["nid"])
    for _, r in got.iterrows():
        ap.setdefault(int(r["qid"]), set()).add(int(r["nid"]))
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.9, sorted(recalls)[:5]

    per_q = got.groupby("qid")["rank"].agg(["count", "min", "max"])
    assert (per_q["count"] == 10).all()
    assert (per_q["min"] == 1).all() and (per_q["max"] == 10).all()


def test_ann_join_exclude_self():
    """Self-join of the corpus against its own layout with
    exclude_self: a row is never its own neighbor."""
    from moonray.functions.knn import ann_join, build_ivf_layout
    from moonray.util import scratch_root

    ds, _ = _dataset(n=400)
    root = scratch_root("mr-annjoin-self-")
    idx = build_ivf_layout(ds, root, n_centroids=8, seed=7)
    got = ann_join(ds, idx, k=5, n_probe=3, exclude_self=True).to_pandas()
    assert (got["qid"] != got["nid"]).all()
    assert (got.groupby("qid")["rank"].count() == 5).all()


def test_ivf_append_incremental():
    """append() lands new rows in the existing bucket dirs without a
    rebuild: appended vectors are findable, I/O pruning still holds,
    row accounting updates, and stale staging from a crashed append is
    swept."""
    import glob
    import os

    from moonray.functions.knn import IvfIndex, build_ivf_layout
    from moonray.util import scratch_root

    ds, vecs = _dataset(n=1200)
    root = scratch_root("mr-ivf-app-")
    idx = build_ivf_layout(ds, root, n_centroids=16, seed=7)
    n0 = idx.meta["n_rows"]

    # fresh vectors near existing blobs, ids disjoint from the base set
    rng = np.random.default_rng(11)
    new_vecs = vecs[rng.integers(0, len(vecs), 300)] + \
        0.05 * rng.normal(size=(300, 32))
    new_tbl = pa.table({
        "vec_id": pa.array(np.arange(10_000, 10_300), pa.int64()),
        "embedding": pa.array([v.tolist() for v in new_vecs],
                              pa.list_(pa.float32())),
    })
    # plant crashed-append litter: the next append must sweep it
    dead = os.path.join(root, "_staging-deadbeef")
    os.makedirs(dead, exist_ok=True)
    out = idx.append(rd.from_arrow(new_tbl))
    assert out["appended_rows"] == 300 and out["files_moved"] >= 1
    assert not os.path.exists(dead)
    assert idx.meta["n_rows"] == n0 + 300
    assert idx.meta["n_appended"] == 300
    assert not glob.glob(os.path.join(root, "_staging-*"))

    # a reopened index sees the appended rows: querying AT an appended
    # vector must return its own id among the top hits
    reopened = IvfIndex.open(root)
    queries = [(int(10_000 + i), new_vecs[i]) for i in range(8)]
    res, stats = reopened.search(queries, k=5, n_probe=4,
                                 exclude_self=False, with_stats=True)
    by_q = {}
    for r in res.to_pylist():
        by_q.setdefault(r["qid"], []).append((r["rank"], r["nid"]))
    for qid, _ in queries:
        hits = [nid for _, nid in sorted(by_q[qid])]
        assert qid in hits[:2], (qid, hits)
    # pruning still holds after append
    assert stats["buckets_read"] < stats["buckets_total"]
    assert stats["bytes_read"] < stats["bytes_total"]


def test_ivf_compact_buckets_after_appends():
    import glob
    import os

    from moonray.functions.knn import IvfIndex, build_ivf_layout
    from moonray.util import scratch_root

    ds, vecs = _dataset(n=800)
    root = scratch_root("mr-ivf-cmp-")
    idx = build_ivf_layout(ds, root, n_centroids=8, seed=7)

    rng = np.random.default_rng(5)
    for r in range(4):  # four appends fragment the buckets
        nv = vecs[rng.integers(0, len(vecs), 100)]
        idx.append(rd.from_arrow(pa.table({
            "vec_id": pa.array(np.arange(20_000 + r * 100,
                                         20_100 + r * 100), pa.int64()),
            "embedding": pa.array([v.tolist() for v in nv],
                                  pa.list_(pa.float32())),
        })))
    queries = [(int(i), vecs[i]) for i in range(6)]
    before = idx.search(queries, k=10, n_probe=3).to_pylist()
    n_files_before = len(glob.glob(os.path.join(root, "bucket=*",
                                                "*.parquet")))
    out = idx.compact_buckets(min_files=3)
    assert out["buckets_compacted"] >= 1 and out["files_removed"] >= 1
    n_files_after = len(glob.glob(os.path.join(root, "bucket=*",
                                               "*.parquet")))
    assert n_files_after < n_files_before
    # identical results: compaction moves bytes, never rows
    after = idx.search(queries, k=10, n_probe=3).to_pylist()
    key = lambda r: (r["qid"], r["rank"], r["nid"])
    assert sorted(before, key=key) == sorted(after, key=key)


def test_compact_crash_window_recovers_and_results_stay_correct():
    """Simulate a crash between a compaction's publish and its
    original-file unlinks: duplicates are visible but (a) search
    results are identical (dup-tolerant reduces), and (b) the next
    append/compact replays the journal and removes the duplicates."""
    import glob
    import json
    import os
    import shutil

    from moonray.functions.knn import build_ivf_layout
    from moonray.util import scratch_root

    ds, vecs = _dataset(n=600)
    root = scratch_root("mr-ivf-crash-")
    idx = build_ivf_layout(ds, root, n_centroids=8, seed=7)
    queries = [(int(i), vecs[i]) for i in range(6)]
    before = idx.search(queries, k=10, n_probe=3).to_pylist()

    # hand-craft the crash state in one bucket: a consolidated copy of
    # the bucket's files PLUS the originals PLUS the journal
    bdir = sorted(glob.glob(os.path.join(root, "bucket=*")))[0]
    files = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
    import pyarrow.parquet as pq

    merged = pa.concat_tables([pq.read_table(f) for f in files])
    name = "compacted-deadbeef.parquet"
    pq.write_table(merged, os.path.join(bdir, name))
    with open(os.path.join(bdir, name.replace(".parquet",
                                              ".folded.json")), "w") as f:
        json.dump({"compacted": name,
                   "folded": [os.path.basename(x) for x in files]}, f)

    # (a) duplicates visible, results unchanged
    during = idx.search(queries, k=10, n_probe=3).to_pylist()
    key = lambda r: (r["qid"], r["rank"], r["nid"])
    assert sorted(during, key=key) == sorted(before, key=key)

    # (b) recovery replays the journal: originals gone, journal gone
    assert idx.recover_buckets() == 1
    left = {os.path.basename(p)
            for p in glob.glob(os.path.join(bdir, "*.parquet"))}
    assert name in left
    assert not (left & {os.path.basename(x) for x in files})
    assert not glob.glob(os.path.join(bdir, "*.folded.json"))
    after = idx.search(queries, k=10, n_probe=3).to_pylist()
    assert sorted(after, key=key) == sorted(before, key=key)

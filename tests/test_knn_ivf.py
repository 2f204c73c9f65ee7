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

"""LSH-bucketed embedding near-dup pairs vs the exact brute-force
baseline (recall check on clustered vectors)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import embedding_near_dups, embedding_near_dups_lsh


def _dataset(n=800, d=24, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(30, d))
    assign = rng.integers(0, 30, n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, d))
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
    })
    return rd.from_arrow(tbl)


def _pairs(t):
    return {(r["a"], r["b"]) for r in pa.concat_tables(
        [b for b in t.iter_batches(batch_format="pyarrow", batch_size=8192)]
    ).to_pylist()}


def test_lsh_pairs_recall_vs_exact():
    ds = _dataset()
    exact = _pairs(embedding_near_dups(ds, threshold=0.9))
    approx = _pairs(embedding_near_dups_lsh(ds, threshold=0.9,
                                            n_tables=8, n_bits=8))
    assert exact, "fixture should contain high-similarity pairs"
    # no false positives: every LSH pair passes the exact threshold
    assert approx <= exact
    # high recall from multi-table probing
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.8, (recall, len(exact), len(approx))

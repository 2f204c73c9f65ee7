"""semantic_dedup (SemDeDup-style cluster-then-prune) — brute-force
numpy oracle implementing the exact drop rule, chain semantics, and
trained-centroid determinism."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import semantic_dedup


def _mk_ds(mat, ids=None):
    n = len(mat)
    ids = np.arange(n, dtype=np.int64) if ids is None else ids
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32()))}))


def _oracle(mat, centroids, threshold):
    m = np.asarray(mat, np.float64)
    m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    c = np.asarray(centroids, np.float64)
    c = c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    cl = np.argmax(m @ c.T, axis=1)
    keep = []
    for j in range(len(m)):
        same = [i for i in range(j) if cl[i] == cl[j]]
        if not any(float(m[i] @ m[j]) >= threshold for i in same):
            keep.append((j, int(cl[j])))
    return sorted(keep)


def _run(ds, **kw):
    out = ds_to_rows(semantic_dedup(ds, **kw))
    return sorted((r["vec_id"], r["cluster"]) for r in out)


def ds_to_rows(ds):
    return [r for b in ds.iter_batches(batch_format="pyarrow",
                                       batch_size=8192)
            for r in b.to_pylist()]


def test_matches_bruteforce_fixed_centroids():
    rng = np.random.default_rng(11)
    base = rng.normal(size=(40, 16))
    # plant near-dups: rows 40..49 are jittered copies of rows 0..9
    dups = base[:10] + rng.normal(scale=0.01, size=(10, 16))
    mat = np.vstack([base, dups]).astype(np.float32)
    cents = rng.normal(size=(4, 16))
    got = _run(_mk_ds(mat), threshold=0.9, centroids=cents)
    want = _oracle(mat, cents, 0.9)
    assert got == want
    assert len(got) < len(mat)  # the planted dups actually dropped


def test_chain_semantics_any_earlier():
    """a~b, b~c, a≁c: ALL-earlier rule drops both b and c (b via a,
    c via b even though b itself was dropped)."""
    def unit(deg):
        r = np.deg2rad(deg)
        return np.array([np.cos(r), np.sin(r), 0.0])

    a, b, c = unit(0), unit(25), unit(50)  # cos25≈0.906, cos50≈0.643
    assert a @ b >= 0.9 and b @ c >= 0.9 and a @ c < 0.9
    mat = np.stack([a, b, c]).astype(np.float32)
    got = _run(_mk_ds(mat), threshold=0.9,
               centroids=np.array([[1.0, 0.5, 0.0]]))
    assert [v for v, _ in got] == [0]


def test_id_order_not_row_order_wins():
    rng = np.random.default_rng(3)
    v = rng.normal(size=16)
    mat = np.stack([v + rng.normal(scale=0.01, size=16),
                    v]).astype(np.float32)
    # ids reversed vs row order: id 5 is row 0, id 2 is row 1 —
    # the LOWER ID (row 1) must survive
    got = _run(_mk_ds(mat, ids=np.array([5, 2], dtype=np.int64)),
               threshold=0.9, centroids=np.ones((1, 16)))
    assert [v for v, _ in got] == [2]


def test_trained_centroids_deterministic():
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(60, 8)).astype(np.float32)
    r1 = _run(_mk_ds(mat), threshold=0.95, n_clusters=3, seed=42)
    r2 = _run(_mk_ds(mat), threshold=0.95, n_clusters=3, seed=42)
    assert r1 == r2 and len(r1) > 0

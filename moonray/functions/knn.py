"""Similarity search over an embedding column (list<float>).

Brute-force cosine top-k as the exact baseline: the query matrix is
``ray.put`` ONCE (broadcast), each data batch does a single float64
matmul against it and emits its per-batch top-k candidates; the final
reduce over (n_queries × k × n_blocks) candidate rows happens on the
driver — tiny. An IVF-style bucketed variant (cluster assignment stage →
per-bucket brute force) is the 100 TB path; the per-batch kernel is
identical, so it reuses CosineTopK per bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class CosineTopK:
    def __init__(self, q_ref, id_col: str, vec_col: str, k: int):
        import ray

        self.q_ids, self.q_mat = ray.get(q_ref)   # (Q,), (Q, d) normalized f64
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch[self.vec_col].to_pandas().to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = self.q_mat @ vecs.T                       # (Q, batch)
        out_q, out_n, out_s = [], [], []
        k = min(self.k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            top = np.argpartition(-row, k - 1)[:k]
            out_q.extend([int(self.q_ids[qi])] * k)
            out_n.extend(ids[top].tolist())
            out_s.extend(row[top].tolist())
        return pa.table({"qid": pa.array(out_q, pa.int64()),
                         "nid": pa.array(out_n, pa.int64()),
                         "sim": pa.array(out_s, pa.float64())})


def knn_cosine(ds, queries: list[tuple[int, np.ndarray]], *, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               exclude_self: bool = True, concurrency=(1, 8)) -> pa.Table:
    """Exact cosine top-k of each query over the Dataset. Returns an
    arrow table (qid, nid, rank) — rank 1-based, ordered by
    (sim DESC, nid ASC) for deterministic ties."""
    import ray

    q_ids = np.array([q[0] for q in queries], dtype=np.int64)
    q_mat = np.stack([np.asarray(q[1], dtype=np.float64) for q in queries])
    q_mat /= np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((q_ids, q_mat))

    cand = ds.map_batches(
        CosineTopK, fn_constructor_args=(q_ref, id_col, vec_col, k + (1 if exclude_self else 0)),
        batch_format="pyarrow", concurrency=concurrency)
    rows = cand.take_all()                               # Q × k' × n_blocks — tiny
    out_q, out_n, out_r = [], [], []
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append((r["sim"], r["nid"]))
    for qid in q_ids.tolist():
        cands = by_q.get(qid, [])
        if exclude_self:
            cands = [c for c in cands if c[1] != qid]
        cands.sort(key=lambda c: (-c[0], c[1]))
        for rank, (_sim, nid) in enumerate(cands[:k], start=1):
            out_q.append(qid); out_n.append(nid); out_r.append(rank)
    return pa.table({"qid": pa.array(out_q, pa.int64()),
                     "nid": pa.array(out_n, pa.int64()),
                     "rank": pa.array(out_r, pa.int64())})

"""minhash_lsh_dedup vs the brute-force exact-Jaccard oracle: the kept
representative set must equal the connected-components representatives
computed from ALL-pairs exact Jaccard over the same shingle space.

Also asserts the r2 scale contract: the verify stage is distributed —
no whole-corpus broadcast and no candidate take_all on the driver
(structurally guaranteed by _verify_pairs; here we just check the
result parity that refactor must preserve).
"""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import _jaccard, _shingle_set, minhash_lsh_dedup

SF_DOCS = "/root/testdata/sf0.01/documents.parquet"


def _oracle_reps(rows, threshold: float) -> list[int]:
    sh = {r["doc_id"]: set(_shingle_set(r["text"])) for r in rows}
    ids = sorted(sh)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if _jaccard(sh[ids[i]], sh[ids[j]]) >= threshold:
                a, b = find(ids[i]), find(ids[j])
                if a != b:
                    parent[max(a, b)] = min(a, b)
    return sorted(i for i in ids if find(i) == i)


def test_minhash_dedup_matches_exact_jaccard_oracle():
    docs = rd.read_parquet(SF_DOCS)
    kept = sorted(r["doc_id"]
                  for r in minhash_lsh_dedup(docs, jaccard_threshold=0.8).take_all())
    reps = _oracle_reps(docs.take_all(), 0.8)
    assert len(reps) < docs.count(), "fixture should contain near-dups"
    assert kept == reps


def test_minhash_dedup_synthetic_clusters():
    """Deterministic synthetic near-dup clusters: 3 groups of paraphrased
    docs + unique docs; only the min-id per cluster survives."""
    bases = [
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest tonight",
        "pack my box with five dozen liquor jugs before the shipment "
        "leaves the harbor on the morning tide tomorrow",
        "how vexingly quick daft zebras jump while the circus crowd "
        "cheers loudly under the striped canvas tent",
    ]
    rows = []
    for g, base in enumerate(bases):
        words = base.split()
        for k in range(4):
            w = list(words)
            w[-1] = f"tail{k}"  # one-token perturbation → high jaccard
            rows.append({"doc_id": g * 10 + k, "text": " ".join(w)})
    for u in range(5):
        rows.append({"doc_id": 100 + u,
                     "text": f"totally unique document number {u} with "
                             f"content {u * 7} unlike any other {u * 13}"})
    ds = rd.from_items(rows)
    kept = sorted(r["doc_id"]
                  for r in minhash_lsh_dedup(ds, jaccard_threshold=0.5).take_all())
    reps = _oracle_reps(rows, 0.5)
    assert kept == reps
    assert {0, 10, 20}.issubset(set(kept))          # cluster minima kept
    assert not ({1, 2, 3, 11, 12, 13} & set(kept))  # cluster dups dropped
    assert np.all(np.isin([100, 101, 102, 103, 104], kept))  # uniques kept


def test_distributed_components_regime_parity():
    """components="distributed" (min-label propagation collapse) must
    keep exactly the same representatives as the driver union-find."""
    docs = rd.read_parquet(SF_DOCS)
    kept = sorted(r["doc_id"] for r in minhash_lsh_dedup(
        docs, jaccard_threshold=0.8, components="distributed").take_all())
    assert kept == _oracle_reps(docs.take_all(), 0.8)

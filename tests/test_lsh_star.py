"""LSH quadratic-corner regressions (round-4 VERDICT item 2): a
pathological duplicate family (N copies of one boilerplate doc) must
cost O(N), not O(N²), in candidate emission — star-linking for
minhash_lsh_dedup, digest-class collapse + exact member expansion for
minhash_lsh_join."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import (MinHashBands, minhash_lsh_dedup,
                                     minhash_lsh_join, star_pairs)


def test_star_pairs_emits_linear_candidates():
    """One equal-signature run of n ids → exactly n-1 (hub, member)
    pairs, hub = run min."""
    n = 10_000
    t = pa.table({
        "band": pa.array(np.zeros(n, np.int32)),
        "bhash": pa.array(np.full(n, 12345, np.uint64)),
        "id": pa.array(np.arange(n), pa.int64()),
        "_bktb": pa.array(np.zeros(n, np.int32)),
    })
    out = star_pairs(t)
    assert len(out) == n - 1                      # O(n), was n(n-1)/2
    assert out["a"].to_pylist() == [0] * (n - 1)  # hub = run min id
    assert sorted(out["b"].to_pylist()) == list(range(1, n))

    # two runs in one bucket: each contributes its own star
    t2 = pa.table({
        "band": pa.array(np.array([0] * 3 + [1] * 4, np.int32)),
        "bhash": pa.array(np.full(7, 9, np.uint64)),
        "id": pa.array([5, 3, 9, 2, 8, 4, 6], pa.int64()),
        "_bktb": pa.array(np.zeros(7, np.int32)),
    })
    got = sorted(zip(star_pairs(t2)["a"].to_pylist(),
                     star_pairs(t2)["b"].to_pylist()))
    assert got == [(2, 4), (2, 6), (2, 8), (3, 5), (3, 9)]


def test_dedup_flood_family_collapses_to_min_id():
    """A 3000-copy family dedups to its min id; distinct docs survive."""
    n_copies = 3000
    boiler = ("subscribe to our newsletter for the latest updates and "
              "offers delivered straight to your inbox every week")
    rows = [{"doc_id": i, "text": boiler} for i in range(n_copies)]
    rows += [{"doc_id": 100_000 + u,
              "text": f"unique document number {u} about topic {u * 3} "
                      f"with distinct content {u * 7} and flavor {u * 11}"}
             for u in range(5)]
    kept = sorted(r["doc_id"] for r in minhash_lsh_dedup(
        rd.from_items(rows), jaccard_threshold=0.8).take_all())
    assert kept == [0] + [100_000 + u for u in range(5)]


def test_join_flood_expands_to_exact_member_pairs():
    """Identical boilerplate on both sides: candidates collapse to one
    witness pair, but the OUTPUT must still be every (a, b) member
    pair — the digest-class expansion is exact."""
    boiler = ("click here to accept cookies and continue to the site "
              "content without personalized advertising preferences")
    na, nb = 40, 30
    a_rows = [{"doc_id": i, "text": boiler} for i in range(na)]
    a_rows.append({"doc_id": 900,
                   "text": "completely different single doc on side a "
                           "about mountain hiking trails in autumn"})
    b_rows = [{"doc_id": 500 + j, "text": boiler} for j in range(nb)]
    got = {(r["a"], r["b"]) for r in minhash_lsh_join(
        rd.from_items(a_rows), rd.from_items(b_rows),
        jaccard_threshold=0.8).take_all()}
    want = {(i, 500 + j) for i in range(na) for j in range(nb)}
    assert got == want


def test_digest_equal_iff_equal_shingle_sets():
    mb = MinHashBands("text", "doc_id", 64, 16, with_digest=True)
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",
        ], pa.string()),
    })
    out = mb(t)
    by_id = {}
    for bid, d1, d2 in zip(out["id"].to_pylist(), out["d1"].to_pylist(),
                           out["d2"].to_pylist()):
        by_id.setdefault(bid, set()).add((d1, d2))
    assert all(len(v) == 1 for v in by_id.values())  # digest is per-doc
    assert by_id[1] == by_id[2]
    assert by_id[1] != by_id[3]

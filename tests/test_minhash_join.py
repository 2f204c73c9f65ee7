"""minhash_lsh_join (cross-corpus near-dup join / decontamination) vs
the brute-force exact-Jaccard cross-product oracle: the verified pair
set must equal ALL (a in A, b in B) pairs with token-3-gram Jaccard ≥
threshold over the same shingle space.
"""

import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import _jaccard, _shingle_set, minhash_lsh_join

SF_DOCS = "/root/testdata/sf0.01/documents.parquet"


def _oracle_pairs(rows_a, rows_b, threshold: float) -> set[tuple[int, int]]:
    sa = {r["doc_id"]: set(_shingle_set(r["text"])) for r in rows_a}
    sb = {r["doc_id"]: set(_shingle_set(r["text"])) for r in rows_b}
    return {(i, j) for i in sa for j in sb
            if _jaccard(sa[i], sb[j]) >= threshold}


def test_join_matches_exact_cross_oracle_on_fixture():
    docs = rd.read_parquet(SF_DOCS)
    evald = docs.filter(lambda r: r["doc_id"] % 5 == 0)
    train = docs.filter(lambda r: r["doc_id"] % 5 != 0)
    got = {(r["a"], r["b"])
           for r in minhash_lsh_join(train, evald,
                                     jaccard_threshold=0.8).take_all()}
    want = _oracle_pairs(train.take_all(), evald.take_all(), 0.8)
    assert want, "fixture should contain cross-side near-dups"
    assert got == want


def test_join_handles_overlapping_doc_ids():
    """The two corpora may reuse the same doc_id space: side-local id
    namespacing must keep them apart."""
    text1 = ("the quick brown fox jumps over the lazy dog and then runs "
             "far away into the deep dark forest tonight")
    text2 = ("completely unrelated text about cooking pasta with garlic "
             "olive oil and fresh basil leaves from the garden")
    a = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([text1, text2], pa.string()),
    }))
    b = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([text2 + " tonight", text1 + " again"], pa.string()),
    }))
    got = {(r["a"], r["b"]) for r in
           minhash_lsh_join(a, b, jaccard_threshold=0.7).take_all()}
    assert got == {(1, 2), (2, 1)}

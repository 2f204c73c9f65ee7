"""Persisted MinHash-LSH text index (functions/textlsh): incremental
near-dup detection against an indexed corpus — build, probe, append,
signature-estimate semantics, and agreement with the exact batch join
on unambiguous fixtures."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.textlsh import (LshIndex, build_lsh_index,
                                       dedup_incremental)

BASES = [
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep dark forest tonight under a pale moon",
    "pack my box with five dozen liquor jugs before the shipment "
    "leaves the harbor on the morning tide tomorrow at first light",
    "how vexingly quick daft zebras jump while the circus crowd "
    "cheers loudly under the striped canvas tent all afternoon",
]


def _corpus_a():
    rows = [{"doc_id": i, "text": BASES[i % 3] + f" series {i // 3}"}
            for i in range(30)]
    return rows


def _corpus_b():
    rows = []
    # exact copies of A docs 0-4 (est_jaccard exactly 1.0)
    for j in range(5):
        rows.append({"doc_id": 1000 + j,
                     "text": BASES[j % 3] + f" series {j // 3}"})
    # near copies (one token changed) of A docs 6-8
    for j in range(3):
        base = BASES[j % 3] + f" series {(6 + j) // 3}"
        w = base.split()
        w[-1] = "changed"
        rows.append({"doc_id": 2000 + j, "text": " ".join(w)})
    # fresh docs
    for u in range(6):
        rows.append({"doc_id": 3000 + u,
                     "text": f"completely unrelated document {u} about "
                             f"topic {u * 7} with flavor {u * 13} and "
                             f"subject {u * 29} entirely its own"})
    return rows


def test_build_probe_append_roundtrip(tmp_path):
    idx = build_lsh_index(rd.from_items(_corpus_a()),
                          str(tmp_path / "lsh"))
    hits = idx.probe(rd.from_items(_corpus_b()),
                     jaccard_threshold=0.7).to_pylist()
    by_a = {}
    for h in hits:
        by_a.setdefault(h["a"], []).append(h)
    # exact copies: estimate is exactly 1.0 against their original
    for j in range(5):
        ests = {h["b"]: h["est_jaccard"] for h in by_a[1000 + j]}
        assert any(abs(e - 1.0) < 1e-12 for e in ests.values())
    # near copies detected
    for j in range(3):
        assert (2000 + j) in by_a
    # fresh docs clean
    assert not any(3000 <= a < 4000 for a in by_a)

    # incremental dedup filter keeps exactly the fresh docs
    kept = sorted(r["doc_id"] for r in dedup_incremental(
        rd.from_items(_corpus_b()), idx,
        jaccard_threshold=0.7).take_all())
    assert kept == [3000 + u for u in range(6)]

    # append corpus B; a later batch matching a B doc now hits it
    idx2 = LshIndex(str(tmp_path / "lsh"))
    added = idx2.append(rd.from_items(_corpus_b()))
    assert added == len(_corpus_b())
    probe_c = idx2.probe(rd.from_items(
        [{"doc_id": 9000,
          "text": "completely unrelated document 2 about topic 14 "
                  "with flavor 26 and subject 58 entirely its own"}]),
        jaccard_threshold=0.9).to_pylist()
    assert any(h["b"] == 3002 for h in probe_c)


def test_probe_matches_exact_batch_join_on_fixture(tmp_path):
    """On fixtures whose pairs are far from the threshold on both
    sides, the signature estimate and the exact batch join agree."""
    from moonray.functions.dedup import minhash_lsh_join

    a_rows, b_rows = _corpus_a(), _corpus_b()
    idx = build_lsh_index(rd.from_items(a_rows), str(tmp_path / "lsh2"))
    got = {(h["a"], h["b"]) for h in idx.probe(
        rd.from_items(b_rows), jaccard_threshold=0.7).to_pylist()}
    want = {(b, a) for a, b in
            ((r["a"], r["b"]) for r in minhash_lsh_join(
                rd.from_items(a_rows), rd.from_items(b_rows),
                jaccard_threshold=0.7).take_all())}
    assert got == want


def test_probe_is_deterministic(tmp_path):
    idx = build_lsh_index(rd.from_items(_corpus_a()),
                          str(tmp_path / "lsh3"))
    h1 = sorted(map(tuple, (r.values() for r in idx.probe(
        rd.from_items(_corpus_b())).to_pylist())))
    h2 = sorted(map(tuple, (r.values() for r in idx.probe(
        rd.from_items(_corpus_b())).to_pylist())))
    assert h1 == h2

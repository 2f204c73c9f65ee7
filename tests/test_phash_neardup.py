"""Perceptual-hash near-dup detection vs a brute-force O(n²) oracle.
Byte-band LSH is exact for hamming ≤ 7 (pigeonhole over 8 bands)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.multimodal import phash_near_dups


def _brute(ids, hashes, k):
    M = (1 << 64) - 1
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d = bin((int(hashes[i]) & M) ^ (int(hashes[j]) & M)).count("1")
            if d <= k:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, d))
    return out


def _mk_corpus(seed=7, n=300, dup_every=10):
    rng = np.random.RandomState(seed)
    base = rng.randint(-(1 << 62), 1 << 62, size=n, dtype=np.int64)
    ids = [f"img-{i:05d}" for i in range(n)]
    hashes = list(base)
    # near dups: flip 1-3 bits of every dup_every-th hash
    for i in range(0, n, dup_every):
        h = int(base[i])
        for bit in rng.choice(64, size=(i // dup_every) % 3 + 1, replace=False):
            h ^= 1 << int(bit)
        ids.append(f"img-{i:05d}-v2")
        hashes.append(np.int64(np.uint64(h % (1 << 64)).astype(np.int64)))
    return ids, hashes


def test_phash_near_dups_match_bruteforce():
    ids, hashes = _mk_corpus()
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(ids, pa.string()),
        "phash": pa.array(hashes, pa.int64())}))
    got = {(r["a"], r["b"], r["hamming"])
           for b in phash_near_dups(ds, max_hamming=6).iter_batches(
               batch_format="pyarrow", batch_size=8192)
           for r in b.to_pylist()}
    want = _brute(ids, hashes, 6)
    assert got == want
    assert len(want) >= 25  # the synthesized dups were actually found


def test_phash_near_dups_zero_distance_and_bounds():
    ds = rd.from_arrow(pa.table({
        "image_id": pa.array(["a", "b", "c"], pa.string()),
        "phash": pa.array([5, 5, -7], pa.int64())}))
    rows = [r for b in phash_near_dups(ds, max_hamming=0).iter_batches(
        batch_format="pyarrow") for r in b.to_pylist()]
    assert rows == [{"a": "a", "b": "b", "hamming": 0}]
    import pytest

    with pytest.raises(ValueError, match="max_hamming"):
        phash_near_dups(ds, max_hamming=8)

"""Byte-stability of the hash kernels.

splitmix64 output is LOAD-BEARING persisted state: key-index partition
assignment (keyindex), shuffle plans (merge/cluster resume), dedup
content hashes and minhash band digests are all derived from it. Any
"optimization" of the kernel must stay bit-identical — this test pins
the algebraic definition against the in-place-optimized implementation.
"""

import numpy as np

from moonray.util import hash_key_array, splitmix64


def _splitmix64_reference(x: np.ndarray) -> np.ndarray:
    # the textbook temporary chain (public-domain constants), kept here
    # as the executable spec
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15))
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def test_splitmix64_bit_identical_to_reference_chain():
    rng = np.random.default_rng(7)
    for arr in (
        np.array([], dtype=np.uint64),
        np.array([0, 1, 2**63, 2**64 - 1], dtype=np.uint64),
        rng.integers(0, 2**63, size=100_000, dtype=np.uint64),
        rng.integers(0, 2**31, size=1000).astype(np.int64),  # dtype upcast
        rng.integers(0, 2**63, size=(16, 333), dtype=np.uint64),  # 2-D
    ):
        got = splitmix64(arr)
        assert got.dtype == np.uint64
        np.testing.assert_array_equal(got, _splitmix64_reference(arr))


def test_splitmix64_does_not_mutate_input():
    x = np.arange(64, dtype=np.uint64)
    before = x.copy()
    splitmix64(x)
    np.testing.assert_array_equal(x, before)


def test_splitmix64_broadcast_view_input():
    # minhash feeds seg[None, :] ^ seeds[:, None] — exercise a broadcast
    # product shape explicitly
    seg = np.arange(97, dtype=np.uint64)
    seeds = np.arange(1, 9, dtype=np.uint64)
    m = splitmix64(seg[None, :] ^ seeds[:, None])
    assert m.shape == (8, 97)
    np.testing.assert_array_equal(
        m, _splitmix64_reference(seg[None, :] ^ seeds[:, None]))


def test_hash_key_array_pinned_values():
    # golden values: if these move, every persisted index/shuffle plan
    # written by older code silently mismatches on read
    import pyarrow as pa

    h = hash_key_array(pa.array([0, 1, 42], pa.int64()))
    np.testing.assert_array_equal(
        h, _splitmix64_reference(np.array([0, 1, 42], dtype=np.uint64)))


def test_minhash_shingle_hashes_match_loop_tokenizer():
    """_shingle_hashes_batch's polars tokenization must reach hash
    values identical to the original per-row findall loop (band hashes
    derive from these)."""
    import re

    import pyarrow as pa

    from moonray.functions.dedup import TOKEN_RE, MinHashBands
    from moonray.util import splitmix64 as _sm

    def loop_impl(mb, texts, n=3):
        # canonical order: lower THEN extract — pinned including on
        # chars whose lowercase folds into ASCII (Kelvin K below)
        tok_lists = [re.findall(r"[a-z0-9]+", x.lower()) for x in texts]
        flat = [t for toks in tok_lists for t in toks]
        th = (hash_key_array(pa.array(flat, pa.string())) if flat
              else np.empty(0, np.uint64))
        C1, C2, C3 = (np.uint64(0x9E3779B97F4A7C15),
                      np.uint64(0xC2B2AE3D27D4EB4F),
                      np.uint64(0x165667B19E3779F9))
        out, off = [], 0
        for toks in tok_lists:
            h = th[off:off + len(toks)]
            off += len(toks)
            if len(h) == 0:
                out.append(np.zeros(1, np.uint64))
            elif len(h) < n:
                out.append(_sm(np.array(
                    [np.bitwise_xor.reduce(h * C1)], np.uint64)))
            else:
                mixed = (h[:-2] * C1) ^ (h[1:-1] * C2) ^ (h[2:] * C3)
                out.append(np.unique(_sm(mixed)))
        return out

    texts = ["", "one", "two words", "The QUICK brown fox the quick",
             "naïve café 模型 mixed 123abc tokens here and more of them",
             "a b a b a b a b", "x" * 500 + " y z w",
             "the Kthe end", "İstanbul is large"]
    mb = MinHashBands("text", "doc_id", 64, 16)
    got = mb._shingle_hashes_batch(texts)
    want = loop_impl(mb, texts)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)

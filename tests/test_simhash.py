"""SimHash oracle: exact parity vs a per-doc pure-numpy reference
implementation (same token hash family), plus the hamming properties
that make SimHash useful — identical docs collide, near-identical docs
stay within a small radius, unrelated docs sit near 32 bits apart.
"""

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.dedup import TOKEN_RE, simhash_fingerprints
from moonray.util import hash_key_array


def _reference_simhash(text: str) -> int:
    """Per-doc reference: one token at a time, explicit vote loop."""
    toks = re.findall(r"[a-z0-9]+", text.lower())  # canonical order
    votes = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int(hash_key_array(pa.array([t], pa.string()))[0])
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(64):
        if votes[b] > 0:
            v |= 1 << b
    return np.int64(np.uint64(v)).item()


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_simhash_matches_reference_and_hamming_properties():
    base = ("the quick brown fox jumps over the lazy dog near the " * 6
            + "riverbank in the early morning light")
    near = base.replace("lazy", "sleepy").replace("quick", "swift")
    texts = [base, base, near, "", "completely different words about "
             "spacecraft telemetry compression algorithms and orbital "
             "mechanics simulations running on clusters " * 3]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string())}))
    got = {r["doc_id"]: r["simhash"]
           for r in simhash_fingerprints(ds).take_all()}
    # exact parity with the per-doc reference implementation
    for i, t in enumerate(texts):
        assert got[i] == _reference_simhash(t), i
    assert got[0] == got[1]                      # identical → identical
    assert 0 < _hamming(got[0], got[2]) <= 12    # near-dup → small radius
    assert _hamming(got[0], got[4]) >= 20        # unrelated → far apart

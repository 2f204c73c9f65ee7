"""Z-order key computation (bit interleaving) for clustering.

Not present in the reference (its physical order is flush order — see
SURVEY.md §2.8); required by the north rule: interleave the bits of
``(phash, w, h)`` so a global sort co-locates perceptually/dimensionally
similar images, then per-fragment zone maps make range predicates prune.

Each column is min-max scaled to 16 bits from the table's global zone
maps (no extra pass over the data), interleaved MSB-first, then salted
in the LOW bits with the key hash: hot ranges (e.g. 5% of keys sharing
phash top-8 bits — the FIXTURES.md skew knob) would otherwise produce
millions of equal sort keys and skew Ray's range-partitioned sort; the
salt spreads ties uniformly while leaving the Z-order prefix intact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import hash_key_array

ZKEY = "_zkey"
_BITS = 16


def _scale_u16(vals: np.ndarray, lo: float, hi: float) -> np.ndarray:
    v = vals.astype(np.float64)
    if hi <= lo:
        return np.zeros(len(v), dtype=np.uint64)
    u = np.clip((v - lo) / (hi - lo), 0.0, 1.0)
    return (u * 65535.0).astype(np.uint64)


def interleave_bits(cols: list[np.ndarray]) -> np.ndarray:
    """Interleave n uint64 columns' low 16 bits → uint64 Z-value."""
    n = len(cols)
    z = np.zeros(len(cols[0]), dtype=np.uint64)
    one = np.uint64(1)
    for b in range(_BITS):
        for i, c in enumerate(cols):
            bit = (c >> np.uint64(b)) & one
            z |= bit << np.uint64(b * n + (n - 1 - i))
    return z


def hilbert_index(cols: list[np.ndarray], bits: int = _BITS) -> np.ndarray:
    """Vectorized d-dimensional Hilbert curve index from per-column
    ``bits``-bit uint64 coordinates (Skilling's transpose algorithm,
    public domain: J. Skilling, "Programming the Hilbert curve", AIP
    2004). Better locality than Z-order at the cost of a few bit passes;
    selectable via ``cluster(curve="hilbert")``."""
    n = len(cols)
    X = [c.astype(np.uint64).copy() for c in cols]
    one = np.uint64(1)
    # inverse undo excess work
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        P = Q - one
        for i in range(n):
            flip = (X[i] & Q) != 0
            # invert low bits of X[0] where flip
            X[0] = np.where(flip, X[0] ^ P, X[0])
            # exchange low bits of X[i] and X[0] where not flip
            t = (X[0] ^ X[i]) & P
            t = np.where(flip, np.uint64(0), t)
            X[0] ^= t
            X[i] ^= t
        Q >>= one
    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = np.uint64(1) << np.uint64(bits - 1)
    while Q > one:
        t = np.where((X[n - 1] & Q) != 0, t ^ (Q - one), t)
        Q >>= one
    for i in range(n):
        X[i] ^= t
    # interleave transposed coordinates MSB-first → single index
    h = np.zeros_like(X[0])
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            h = (h << one) | ((X[i] >> np.uint64(b)) & one)
    return h


class AddZKey:
    """map_batches stage: append the salted space-filling-curve key
    column (Z-order bit interleave by default, Hilbert optional)."""

    def __init__(self, cols: list[str], ranges: dict[str, tuple[float, float]],
                 key_col: str | None, salt_bits: int = 8, curve: str = "z"):
        assert curve in ("z", "hilbert"), curve
        self.cols = cols
        self.ranges = ranges
        self.key_col = key_col
        self.salt_bits = salt_bits
        self.curve = curve

    def __call__(self, batch: pa.Table) -> pa.Table:
        scaled = []
        for c in self.cols:
            vals = batch[c].to_numpy(zero_copy_only=False)
            lo, hi = self.ranges[c]
            scaled.append(_scale_u16(vals, lo, hi))
        if self.curve == "hilbert":
            z = hilbert_index(scaled)
        else:
            z = interleave_bits(scaled)
        if self.key_col is not None:
            salt = hash_key_array(batch[self.key_col])
        else:
            # identity='none' tables have no key column: salt from the
            # pre-scale values themselves (identical tuples stay tied,
            # which is the best any deterministic salt can do)
            mixed = scaled[0].copy()
            for s in scaled[1:]:
                mixed = (mixed * np.uint64(0x9E3779B97F4A7C15)) ^ s
            from moonray.util import splitmix64

            salt = splitmix64(mixed)
        salt &= np.uint64((1 << self.salt_bits) - 1)
        z = (z << np.uint64(self.salt_bits)) | salt
        return batch.append_column(ZKEY, pa.array(z.astype(np.int64) & np.int64(2**63 - 1)))

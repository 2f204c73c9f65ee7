"""Deterministic text embeddings (feature hashing / "hashing trick").

The embedding operators (semantic dedup, ANN, label-consistency) read a
given embedding column; a real pipeline has to PRODUCE one from text.
With no neural encoders in the container, the deterministic public
equivalent is the feature-hashing embedder (Weinberger et al. 2009):
token uni- and bigrams hash to one of ``dim`` signed buckets, counts
scatter-add, the vector L2-normalizes. Cosine over these vectors
approximates n-gram overlap — exactly the geometry the downstream
dedup/ANN stages consume — and the whole stage is a stateless
map_batches (the actor shape mirrors a model-server stage: constants in
``__init__``, one vectorized pass per batch).

Vectorization: one polars tokenize (the module-wide canonical
lower-then-extract), one explode, one uint64 hash per token; bigram
hashes combine CONSECUTIVE token hashes arithmetically (splitmix64 of
h_i*C ^ h_{i+1}) instead of building concatenated strings; the
embedding matrix fills with two np.add.at scatters. No per-row loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import splitmix64

_BIGRAM_C = np.uint64(0x9E3779B97F4A7C15)


class HashingEmbedder:
    """map_batches stage: adds ``embedding`` (list<float32>, unit L2
    norm; the zero vector for token-free docs) from ``text_col``."""

    def __init__(self, dim: int = 64, seed: int = 0,
                 text_col: str = "text", bigrams: bool = True):
        if dim < 2:
            raise ValueError("dim >= 2")
        self.dim = np.uint64(dim)
        self.seed = np.uint64(seed & ((1 << 64) - 1))
        self.text_col = text_col
        self.bigrams = bigrams

    def _accumulate(self, M: np.ndarray, ii: np.ndarray,
                    h: np.ndarray) -> None:
        bucket = (h % self.dim).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) & np.uint64(1),
                        -1.0, 1.0).astype(np.float64)
        np.add.at(M, (ii, bucket), sign)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import polars as pl

        from moonray.util import canonical_tokens, hash_key_array

        texts = batch[self.text_col].combine_chunks()
        n = len(texts)
        M = np.zeros((n, int(self.dim)), dtype=np.float64)
        if n:
            toks = canonical_tokens(texts)
            ex = pl.DataFrame({"i": pl.int_range(0, n, eager=True),
                               "tok": toks}).explode("tok") \
                .drop_nulls("tok")
            ii = ex["i"].to_numpy()
            # hash through hash_key_array (the HASH_IMPL stability
            # guard), not a raw polars .hash call
            h = hash_key_array(ex["tok"].to_arrow().cast(pa.string())) \
                if len(ex) else np.empty(0, np.uint64)
            h = splitmix64(h ^ self.seed)
            if len(h):
                self._accumulate(M, ii, h)
                if self.bigrams:
                    # consecutive tokens of the SAME doc
                    same = ii[1:] == ii[:-1]
                    hb = splitmix64(h[:-1] * _BIGRAM_C ^ h[1:])[same]
                    self._accumulate(M, ii[1:][same], hb)
            norms = np.linalg.norm(M, axis=1)
            nz = norms > 0
            M[nz] /= norms[nz, None]
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(M.astype(np.float32).ravel(), pa.float32()),
            int(self.dim)).cast(pa.list_(pa.float32()))
        return batch.append_column("embedding", emb)


def embed_documents(ds, *, dim: int = 64, seed: int = 0,
                    text_col: str = "text", bigrams: bool = True):
    """documents Dataset → same rows + a deterministic ``embedding``
    column (unit-norm float32 list). Stateless task pool."""
    from moonray.util import as_fn

    return ds.map_batches(
        as_fn(HashingEmbedder(dim=dim, seed=seed, text_col=text_col,
                              bigrams=bigrams)),
        batch_format="pyarrow", batch_size=1024)

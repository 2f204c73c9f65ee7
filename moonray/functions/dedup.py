"""Deduplication operators over document-shaped tables.

- exact_dedup: content-hash partition + per-group first (min id) — the
  canonical exact dedup (hash shuffle of keys only, payload follows its
  bucket once).
- minhash_lsh_dedup: word-shingle MinHash → banded LSH buckets →
  candidate pairs → exact-Jaccard verify → connected components →
  keep cluster representative (min id). The scale path: only
  (band_hash, id) pairs shuffle; pair verification is per-bucket.
- simhash64: 64-bit SimHash fingerprints (near-dup by hamming radius).
- embedding_near_dups: cosine-similarity pairs over an embedding column
  via broadcast matrix (numpy matmul per batch) — brute-force baseline;
  at 100 TB scale the same stage runs per LSH/IVF bucket.

All hash functions are deterministic across processes (splitmix64 /
md5), never Python's builtin hash.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from moonray.util import (as_fn, default_buckets, hash_key_array,
                          list_to_matrix, splitmix64)

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


# ---------------- exact dedup ----------------

class AddContentHash:
    def __init__(self, text_col: str, prefix_len: int | None):
        self.text_col = text_col
        self.prefix_len = prefix_len

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        if self.prefix_len:
            texts = [t[: self.prefix_len] for t in texts]
        hs = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        return batch.append_column("_chash", pa.array(hs, pa.string()))


class KeepFirstPerHash:
    def __init__(self, id_col: str):
        self.id_col = id_col

    def __call__(self, group: pa.Table) -> pa.Table:
        t = group.sort_by([(self.id_col, "ascending")])
        hashes = np.asarray(t["_chash"].combine_chunks())
        _, first = np.unique(hashes, return_index=True)
        return t.take(pa.array(np.sort(first))).drop_columns(["_chash", "_bkt"])


def exact_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                prefix_len: int | None = None, buckets: int | None = None):
    """Keep the min-id row per content hash (md5 of text, optionally of a
    prefix). groupby shuffles hash buckets, not one group per document;
    bucket count scales with the cluster (util.default_buckets)."""
    buckets = buckets or default_buckets()

    def bucketed(b: pa.Table) -> pa.Table:
        h = np.array([int(x[:8], 16) for x in b["_chash"].to_pylist()], dtype=np.uint64)
        return b.append_column("_bkt", pa.array((h % np.uint64(buckets)).astype(np.int32)))

    withh = ds.map_batches(as_fn(AddContentHash(text_col, prefix_len), "add_chash"),
                           batch_format="pyarrow")
    withb = withh.map_batches(bucketed, batch_format="pyarrow")
    return withb.groupby("_bkt").map_groups(
        as_fn(KeepFirstPerHash(id_col), "keep_first"), batch_format="pyarrow")


# ---------------- MinHash + LSH ----------------

def _shingle_set(text: str, n: int = 3) -> list[int]:
    toks = [t.lower() for t in TOKEN_RE.findall(text)]
    if len(toks) < n:
        shingles = {" ".join(toks)} if toks else {""}
    else:
        shingles = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return [int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")
            for s in shingles]


_SH_C1, _SH_C2, _SH_C3 = (np.uint64(0x9E3779B97F4A7C15),
                          np.uint64(0xC2B2AE3D27D4EB4F),
                          np.uint64(0x165667B19E3779F9))


class MinHashBands:
    """map_batches: doc → (band_id, band_hash, id) rows. num_perm hash
    functions simulated by splitmix64 with per-permutation seed mixes.

    Fully vectorized: all tokens of a batch are hashed in ONE call
    (polars string hash via util.hash_key_array), shingle hashes come
    from a vectorized 3-token mix, and the (num_perm × n_shingles)
    min-reduction is one numpy expression per doc. The exact-Jaccard
    verify step intentionally keeps its own (md5) shingle space — any
    injective shingle hash yields the same Jaccard value."""

    def __init__(self, text_col: str, id_col: str, num_perm: int, bands: int):
        assert num_perm % bands == 0
        self.text_col = text_col
        self.id_col = id_col
        self.num_perm = num_perm
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.seeds = splitmix64(np.arange(1, num_perm + 1, dtype=np.uint64))

    def _shingle_hashes_batch(self, texts: list[str], n: int = 3) -> list[np.ndarray]:
        tok_lists = [[t.lower() for t in TOKEN_RE.findall(x)] for x in texts]
        flat = [t for toks in tok_lists for t in toks]
        if flat:
            th = hash_key_array(pa.array(flat, pa.string()))
        else:
            th = np.empty(0, np.uint64)
        out, off = [], 0
        for toks in tok_lists:
            h = th[off:off + len(toks)]
            off += len(toks)
            if len(h) == 0:
                out.append(np.zeros(1, np.uint64))
            elif len(h) < n:
                out.append(splitmix64(
                    np.array([np.bitwise_xor.reduce(h * _SH_C1)], np.uint64)))
            else:
                mixed = (h[:-2] * _SH_C1) ^ (h[1:-1] * _SH_C2) ^ (h[2:] * _SH_C3)
                out.append(np.unique(splitmix64(mixed)))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_band, out_hash, out_id = [], [], []
        ids = batch[self.id_col].to_pylist()
        shingles = self._shingle_hashes_batch(batch[self.text_col].to_pylist())
        for sh, did in zip(shingles, ids):
            # (num_perm, n_shingles) → min per permutation, one expression
            sig = splitmix64(sh[None, :] ^ self.seeds[:, None]).min(axis=1)
            for b in range(self.bands):
                band = sig[b * self.rows_per_band:(b + 1) * self.rows_per_band]
                h = hashlib.md5(band.tobytes() + bytes([b])).hexdigest()[:16]
                out_band.append(b)
                out_hash.append(h)
                out_id.append(did)
        return pa.table({"band": pa.array(out_band, pa.int32()),
                         "bhash": pa.array(out_hash, pa.string()),
                         "id": pa.array(out_id, pa.int64())})


def _jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


def minhash_lsh_dedup(ds, *, text_col: str = "text", id_col: str = "doc_id",
                      num_perm: int = 64, bands: int = 16,
                      jaccard_threshold: float = 0.8):
    """Near-dup dedup: returns the Dataset filtered to cluster
    representatives (min id per near-dup cluster).

    Scale notes: the LSH shuffle carries only (band, bhash, id); the
    verify step re-reads candidate docs via a broadcast text lookup —
    acceptable while candidates ≪ corpus (true for near-dup detection);
    the connected-components union-find runs on the driver over verified
    PAIRS (tiny). At 100 TB the verify stage would fetch texts from the
    table by id instead of a broadcast dict."""
    import ray
    import ray.data as rd

    band_rows = ds.map_batches(
        as_fn(MinHashBands(text_col, id_col, num_perm, bands), "minhash_bands"),
        batch_format="pyarrow")

    n_buckets = default_buckets()

    def add_bucket(b: pa.Table) -> pa.Table:
        h = hash_key_array(b["bhash"]) % np.uint64(n_buckets)
        return b.append_column("_bktb", pa.array(h.astype(np.int32)))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """One call per hash BUCKET of band-hashes (a per-(band,bhash)
        groupby would invoke Python once per ~unique signature): sort by
        (band, bhash), find equal-signature runs vectorized, emit the
        within-run id pairs."""
        t = group.sort_by([("band", "ascending"), ("bhash", "ascending"),
                           ("id", "ascending")])
        bh = np.asarray(t["bhash"].combine_chunks())
        bd = t["band"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        new_run = np.ones(len(t), dtype=bool)
        new_run[1:] = (bd[1:] != bd[:-1]) | (bh[1:] != bh[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(t))
        a_out, b_out = [], []
        for s, e in zip(starts, ends):
            if e - s > 1:
                run = ids[s:e]
                for i in range(len(run)):
                    for j in range(i + 1, len(run)):
                        a_out.append(run[i]); b_out.append(run[j])
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    bucket_pairs.__name__ = "bucket_pairs"
    cand = (band_rows.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bktb").map_groups(bucket_pairs, batch_format="pyarrow"))
    pairs = {(r["a"], r["b"]) for r in cand.take_all()}

    # verify with exact jaccard (broadcast text lookup)
    texts = {r[id_col]: r[text_col]
             for r in ds.select_columns([id_col, text_col]).take_all()}
    texts_ref = ray.put(texts)

    def verify(batch: pa.Table) -> pa.Table:
        lookup = ray.get(texts_ref)
        keep_a, keep_b = [], []
        for a, b in zip(batch["a"].to_pylist(), batch["b"].to_pylist()):
            sa = set(_shingle_set(lookup[a]))
            sb = set(_shingle_set(lookup[b]))
            if _jaccard(sa, sb) >= jaccard_threshold:
                keep_a.append(a); keep_b.append(b)
        return pa.table({"a": pa.array(keep_a, pa.int64()),
                         "b": pa.array(keep_b, pa.int64())})

    if pairs:
        pair_ds = rd.from_items([{"a": a, "b": b} for a, b in sorted(pairs)])
        verified = pair_ds.map_batches(verify, batch_format="pyarrow").take_all()
    else:
        verified = []

    # connected components (union-find on the driver over verified pairs)
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for r in verified:
        ra, rb = find(r["a"]), find(r["b"])
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    drop = {x for x in parent if find(x) != x}

    def keep_reps(batch: pa.Table) -> pa.Table:
        ids = np.array(batch[id_col].to_pylist())
        mask = ~np.isin(ids, list(drop)) if drop else np.ones(len(ids), bool)
        return batch.filter(pa.array(mask))

    keep_reps.__name__ = "keep_reps"
    return ds.map_batches(keep_reps, batch_format="pyarrow")


# ---------------- exact n-gram Jaccard pairs ----------------

class ShingleJaccardPairs:
    """map_batches over documents: each batch's token-3-gram shingle
    sets vs the broadcast full corpus — emit (a < b) pairs with exact
    Jaccard ≥ threshold. The EXACT baseline; minhash_lsh_dedup is the
    sub-quadratic scale path (same shingle definition, so LSH output is
    verifiable against this)."""

    def __init__(self, corpus_ref, id_col: str, text_col: str,
                 threshold: float, n: int):
        import ray

        self.ids, self.sets = ray.get(corpus_ref)  # ids sorted; list[set]
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        ids = batch[self.id_col].to_pylist()
        for did, text in zip(ids, batch[self.text_col].to_pylist()):
            sa = set(_shingle_set(text, self.n))
            for other, sb in zip(self.ids, self.sets):
                if other <= did:
                    continue
                if _jaccard(sa, sb) >= self.threshold:
                    out_a.append(did)
                    out_b.append(other)
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64())})


def ngram_jaccard_pairs(ds, *, text_col: str = "text", id_col: str = "doc_id",
                        threshold: float = 0.5, n: int = 3, concurrency=(1, 8)):
    """All (a < b) document pairs with token-n-gram Jaccard ≥ threshold.
    Corpus shingle sets are built once on the driver and broadcast
    (ray.put); each batch compares against them."""
    import ray

    rows = ds.select_columns([id_col, text_col]).take_all()
    rows.sort(key=lambda r: r[id_col])
    ids = [r[id_col] for r in rows]
    sets = [set(_shingle_set(r[text_col], n)) for r in rows]
    corpus_ref = ray.put((ids, sets))
    return ds.map_batches(
        ShingleJaccardPairs,
        fn_constructor_args=(corpus_ref, id_col, text_col, threshold, n),
        batch_format="pyarrow", concurrency=concurrency)


# ---------------- SimHash ----------------

class SimHash64:
    """map_batches: append a 64-bit SimHash fingerprint column.

    Vectorized like MinHashBands: ALL tokens of the batch are hashed in
    one call (polars string hash via util.hash_key_array — any
    deterministic 64-bit token hash yields a valid SimHash family), the
    per-token ±1 bit votes are one (tokens × 64) expression, and per-doc
    vote sums come from np.add.reduceat over the token-count boundaries
    — no per-token Python/md5 loop."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        tok_lists = [[t.lower() for t in TOKEN_RE.findall(x)] for x in texts]
        counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
        flat = [t for toks in tok_lists for t in toks]
        votes = np.zeros((len(texts), 64), dtype=np.int64)
        if flat:
            hs = hash_key_array(pa.array(flat, pa.string()))
            sign = (((hs[:, None] >> np.arange(64, dtype=np.uint64))
                     & np.uint64(1)).astype(np.int64) * 2 - 1)
            starts = np.cumsum(counts) - counts
            nonempty = counts > 0
            # reduceat over the starts of non-empty docs: each segment
            # ends where the next non-empty doc begins (empty docs own
            # zero token rows, so boundaries stay exact)
            votes[nonempty] = np.add.reduceat(sign, starts[nonempty], axis=0)
        pos = votes > 0
        val = np.zeros(len(texts), dtype=np.uint64)
        for i in range(64):
            val |= pos[:, i].astype(np.uint64) << np.uint64(i)
        return batch.append_column(
            "simhash", pa.array(val.astype(np.int64), pa.int64()))


def simhash_fingerprints(ds, text_col: str = "text"):
    # stateless → plain tasks (an actor pool would pay startup for no
    # per-worker state; actors are for stages that load models/indexes)
    return ds.map_batches(as_fn(SimHash64(text_col), "simhash64"),
                          batch_format="pyarrow")


# ---------------- embedding near-dups ----------------

class CosinePairs:
    """map_batches over embeddings: each batch's vectors vs the broadcast
    full matrix (numpy float64 matmul); emit (a < b) pairs ≥ threshold."""

    def __init__(self, mat_ref, ids_ref, id_col: str, vec_col: str, threshold: float):
        import ray

        self.mat = ray.get(mat_ref)        # (N, d) float64, L2-normalized
        self.ids = ray.get(ids_ref)        # (N,) int64
        self.id_col = id_col
        self.vec_col = vec_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = list_to_matrix(batch[self.vec_col])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        sims = vecs @ self.mat.T                       # (batch, N)
        rows, cols = np.nonzero(sims >= self.threshold)
        a = ids[rows]
        b = self.ids[cols]
        keep = a < b                                    # dedup + drop self-pairs
        return pa.table({"a": pa.array(a[keep], pa.int64()),
                         "b": pa.array(b[keep], pa.int64())})


def embedding_near_dups(ds, *, id_col: str = "vec_id", vec_col: str = "embedding",
                        threshold: float = 0.3, concurrency=(1, 8)):
    """All pairs with cosine ≥ threshold. The comparison matrix is
    ray.put ONCE; each batch does one matmul against it."""
    import ray

    rows = ds.select_columns([id_col, vec_col]).take_all()
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(ids)
    mat_ref, ids_ref = ray.put(mat[order]), ray.put(ids[order])
    return ds.map_batches(
        CosinePairs, fn_constructor_args=(mat_ref, ids_ref, id_col, vec_col, threshold),
        batch_format="pyarrow", concurrency=concurrency)


class _HyperplaneBuckets:
    """map_batches: random-hyperplane LSH signature per vector → one row
    per (probe-table, bucket, id, vec). Multiple independent tables
    boost recall (a near-dup pair collides in ≥1 table w.h.p.)."""

    def __init__(self, planes_ref, id_col: str, vec_col: str):
        import ray

        self.planes = ray.get(planes_ref)   # (tables, bits, d) float64
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = list_to_matrix(batch[self.vec_col])
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        n_tables, bits, _d = self.planes.shape
        out_t, out_b, out_id, out_vec = [], [], [], []
        weights = (1 << np.arange(bits)).astype(np.int64)
        for ti in range(n_tables):
            signs = (vecs @ self.planes[ti].T) > 0      # (n, bits)
            codes = signs.astype(np.int64) @ weights
            out_t.extend([ti] * len(ids))
            out_b.extend(codes.tolist())
            out_id.extend(ids.tolist())
            out_vec.extend(vecs.tolist())
        return pa.table({
            "tbl": pa.array(out_t, pa.int32()),
            "bucket": pa.array(out_b, pa.int64()),
            "id": pa.array(out_id, pa.int64()),
            "vec": pa.array(out_vec, pa.list_(pa.float64())),
        })


def embedding_near_dups_lsh(ds, *, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.3, n_tables: int = 8,
                            n_bits: int = 8, seed: int = 11,
                            concurrency=(1, 8)):
    """Sub-quadratic near-dup pairs — the 100 TB scale path the
    brute-force ``embedding_near_dups`` baselines: random-hyperplane LSH
    buckets vectors, exact cosine verification runs only WITHIN buckets
    (each ≪ corpus), pairs dedupe across probe tables. Recall vs the
    exact baseline is tested (test_embedding_lsh.py)."""
    import ray

    # dimensionality probe (cheap: one row)
    first = ds.take(1)[0]
    d = len(first[vec_col])
    rng = np.random.default_rng(seed)
    planes_ref = ray.put(rng.normal(size=(n_tables, n_bits, d)))

    bucketed = ds.map_batches(
        _HyperplaneBuckets, fn_constructor_args=(planes_ref, id_col, vec_col),
        batch_format="pyarrow", concurrency=concurrency)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        """Per (tbl, bucket) hash-bucket group (32-way outer bucketing
        keeps Python call counts bounded): exact cosine within each
        equal-bucket run."""
        t = group.sort_by([("tbl", "ascending"), ("bucket", "ascending"),
                           ("id", "ascending")])
        tb = t["tbl"].to_numpy(zero_copy_only=False)
        bk = t["bucket"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        new_run = np.ones(len(t), dtype=bool)
        new_run[1:] = (tb[1:] != tb[:-1]) | (bk[1:] != bk[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], len(t))
        a_out, b_out = [], []
        vecs = None
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            if vecs is None:
                vecs = list_to_matrix(t["vec"])
            sub = vecs[s:e]
            sims = sub @ sub.T
            ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            run_ids = ids[s:e]
            for i, j in zip(ii, jj):
                a, b = int(run_ids[i]), int(run_ids[j])
                if a != b:
                    a_out.append(min(a, b)); b_out.append(max(a, b))
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64())})

    bucket_pairs.__name__ = "lsh_bucket_pairs"

    n_outer = default_buckets()

    def outer_bucket(b: pa.Table) -> pa.Table:
        h = (splitmix64(b["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
                        ^ (b["tbl"].to_numpy(zero_copy_only=False).astype(np.uint64)
                           * np.uint64(0x9E3779B97F4A7C15))) % np.uint64(n_outer))
        return b.append_column("_bkt", pa.array(h.astype(np.int32)))

    pairs = (bucketed.map_batches(outer_bucket, batch_format="pyarrow")
             .groupby("_bkt").map_groups(bucket_pairs, batch_format="pyarrow"))

    # global dedupe: same (a,b) may surface from several probe tables →
    # one more tiny groupby on the pair key
    n_pair = default_buckets()

    def pair_bucket(b: pa.Table) -> pa.Table:
        h = (splitmix64(b["a"].to_numpy(zero_copy_only=False).astype(np.uint64) * np.uint64(31)
                        ^ b["b"].to_numpy(zero_copy_only=False).astype(np.uint64))
             % np.uint64(n_pair))
        return b.append_column("_pb", pa.array(h.astype(np.int32)))

    def uniq(group: pa.Table) -> pa.Table:
        ab = np.stack([group["a"].to_numpy(zero_copy_only=False),
                       group["b"].to_numpy(zero_copy_only=False)], axis=1)
        u = np.unique(ab, axis=0)
        return pa.table({"a": pa.array(u[:, 0], pa.int64()),
                         "b": pa.array(u[:, 1], pa.int64())})

    uniq.__name__ = "uniq_pairs"
    return (pairs.map_batches(pair_bucket, batch_format="pyarrow")
            .groupby("_pb").map_groups(uniq, batch_format="pyarrow"))

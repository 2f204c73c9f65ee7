"""Persisted MinHash-LSH text index — incremental near-dup detection
against an INDEXED corpus.

The batch paths (minhash_lsh_dedup / minhash_lsh_join) recompute band
signatures for every document on every run; a production ingest
pipeline dedups INCREMENTALLY: the historical corpus is indexed once,
and each new batch probes the index, appends its own signatures, and
continues. This module is the text twin of the persisted IVF layout
(functions/knn.build_ivf_layout / IvfIndex): a hive-partitioned
parquet layout whose probes read only the row groups their band
hashes can live in.

Layout (under ``root``)::

    meta.json                      {num_perm, bands, sig_buckets}
    band={b}/part-*.parquet        (bhash i64-bitview, id) sorted by
                                   bhash — probe prunes row groups by
                                   footer min/max against the sorted
                                   probe-hash array
    sigs/bucket={k}/part-*.parquet (id, sig fixed_size_list<u64-view
                                   int64, num_perm>) sorted by id

Verification semantics: candidate pairs (≥1 band collision, exactly
the LSH guarantee of the batch paths) are scored by the SIGNATURE
Jaccard estimate — mean(sig_new[i] == sig_old[i]) — the standard
persisted-index practice (storing shingle sets would store the
corpus). The estimator is unbiased with σ = sqrt(J(1-J)/num_perm)
(~0.04 at num_perm=64); identical documents score exactly 1.0. Batch
paths keep their EXACT shingle-set verification; choose the threshold
margin accordingly when mixing the two.

Writes are staged + atomically renamed (like IvfIndex.append):
probes never see a half-written file. Within one append task the
SIGNATURE files land before the band files, so a crash between the
two leaves orphan signatures (harmless — nothing routes to them)
rather than band entries whose signature fetch would silently miss
forever; a retried Ray task then re-writes both.
"""

from __future__ import annotations

import json
import os
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from moonray.functions.dedup import MinHashBands
from moonray.util import as_fn


def _band_dir(root: str, b: int) -> str:
    return os.path.join(root, f"band={b}")


def _sig_dir(root: str, k: int) -> str:
    return os.path.join(root, "sigs", f"bucket={k}")


class _BandsAndSigs:
    """map_batches stage: docs → one row per doc carrying its band
    hashes AND full signature (the banding math of MinHashBands, kept
    bit-identical by reusing it)."""

    def __init__(self, text_col: str, id_col: str, num_perm: int,
                 bands: int):
        self.inner = MinHashBands(text_col, id_col, num_perm, bands)
        self.num_perm = num_perm
        self.bands = bands
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def _list_col(mat: np.ndarray, width: int) -> pa.Array:
        # (n, width) uint64 → list<int64> straight from the flat
        # buffer (FixedSizeListArray view + vectorized offsets cast) —
        # the per-row list(mat.view(...)) form allocated ~width Python
        # objects per doc on the 100 TB build path. Cast to the
        # variable-width list type so index files stay byte-identical
        # to the pre-vectorization layout.
        flat = pa.array(np.ascontiguousarray(mat).reshape(-1).view(np.int64))
        return pa.FixedSizeListArray.from_arrays(flat, width) \
            .cast(pa.list_(pa.int64()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({
                "id": pa.array([], pa.int64()),
                "bhash": pa.array([], pa.list_(pa.int64())),
                "sig": pa.array([], pa.list_(pa.int64())),
            })
        ids = batch[self.id_col].cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # THE shared signature/band math (MinHashBands.signatures) —
        # the persisted index and the batch paths can never drift
        sigs, acc, _flat, _offsets = self.inner.signatures(
            batch[self.text_col].to_pylist())
        return pa.table({
            "id": pa.array(ids, pa.int64()),
            "bhash": self._list_col(acc, self.bands),
            "sig": self._list_col(sigs, self.num_perm),
        })


def _write_sorted(path_dir: str, t: pa.Table, sort_col: str,
                  rg_rows: int = 4096) -> None:
    os.makedirs(path_dir, exist_ok=True)
    t = t.sort_by(sort_col)
    tmp = os.path.join(path_dir, f".tmp-{uuid.uuid4().hex}")
    pq.write_table(t, tmp, row_group_size=rg_rows, compression="snappy")
    os.replace(tmp, os.path.join(path_dir,
                                 f"part-{uuid.uuid4().hex}.parquet"))


class _IndexWriter:
    """map_batches stage: (id, bhash, sig) rows → index part files as
    a side effect, tiny count row out (the FragmentWriter shape).
    Signature files are written BEFORE band files — see append."""

    def __init__(self, root: str, bands: int, sig_buckets: int):
        self.root = root
        self.bands = bands
        self.sig_buckets = sig_buckets

    def __call__(self, t: pa.Table) -> pa.Table:
        from moonray.util import cap_kernel_threads, splitmix64

        cap_kernel_threads()
        if len(t) == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        ids = t["id"].to_numpy(zero_copy_only=False)
        bkt = (splitmix64(ids.astype(np.uint64))
               % np.uint64(self.sig_buckets)).astype(np.int64)
        for k in np.unique(bkt):
            sel = np.flatnonzero(bkt == k)
            _write_sorted(_sig_dir(self.root, int(k)), pa.table({
                "id": pa.array(ids[sel], pa.int64()),
                "sig": t["sig"].take(pa.array(sel)),
            }), "id")
        bha = t["bhash"].combine_chunks()
        bh = np.asarray(bha.flatten()).reshape(len(t), self.bands)
        for b in range(self.bands):
            _write_sorted(_band_dir(self.root, b), pa.table({
                "bhash": pa.array(bh[:, b], pa.int64()),
                "id": pa.array(ids, pa.int64()),
            }), "bhash")
        return pa.table({"rows": pa.array([len(t)], pa.int64())})


class LshIndex:
    def __init__(self, root: str):
        self.root = root
        with open(os.path.join(root, "meta.json")) as f:
            self.meta = json.load(f)

    # ------------------------------------------------------ append
    def append(self, ds, *, text_col: str = "text",
               id_col: str = "doc_id") -> int:
        """Index a new batch of documents, fully DISTRIBUTED (one
        map_batches pipeline, like IvfIndex.append — the corpus never
        funnels through the driver): per-band sorted hash files +
        per-bucket sorted signature files, each staged → renamed so
        probes never see partial files. SIGNATURES LAND FIRST — a
        crash between the two writes must leave orphan signatures
        (harmless) rather than band entries whose sig fetch silently
        misses forever. Returns docs added. Many appends mean many
        small part files per band; compact by rebuilding the index
        (build into a fresh root) when probe footers dominate."""
        m = self.meta
        writer = _IndexWriter(self.root, m["bands"], m["sig_buckets"])
        rows = (ds.map_batches(
            as_fn(_BandsAndSigs(text_col, id_col, m["num_perm"],
                                m["bands"]), "bands_and_sigs"),
            batch_format="pyarrow")
            .map_batches(as_fn(writer, "lsh_index_writer"),
                         batch_format="pyarrow", batch_size=8192))
        return int(sum(r["rows"] for r in rows.take_all()))

    # ------------------------------------------------------- probe
    def _probe_band_files(self, b: int, probe_sorted: np.ndarray
                          ) -> list[tuple[np.ndarray, np.ndarray]]:
        """(matching band hash, indexed id) arrays from band ``b``,
        reading ONLY row groups whose footer [min, max] intersects the
        sorted probe-hash array — the I/O-pruning contract."""
        d = _band_dir(self.root, b)
        if not os.path.isdir(d):
            return []
        out = []
        for fn in sorted(os.listdir(d)):
            if not fn.endswith(".parquet"):
                continue
            pf = pq.ParquetFile(os.path.join(d, fn), memory_map=True)
            need = []
            for g in range(pf.num_row_groups):
                st = pf.metadata.row_group(g).column(0).statistics
                if st is None or not st.has_min_max:
                    need.append(g)
                    continue
                lo = np.searchsorted(probe_sorted, st.min, "left")
                if lo < len(probe_sorted) and probe_sorted[lo] <= st.max:
                    need.append(g)
            if not need:
                continue
            t = pf.read_row_groups(need, columns=["bhash", "id"])
            h = t["bhash"].to_numpy(zero_copy_only=False)
            hit = np.isin(h, probe_sorted, assume_unique=False)
            if hit.any():
                out.append((h[hit],
                            t["id"].to_numpy(zero_copy_only=False)[hit]))
        return out

    def probe(self, ds, *, text_col: str = "text",
              id_col: str = "doc_id",
              jaccard_threshold: float = 0.8):
        """(new_id, indexed_id, est_jaccard) for every new doc whose
        estimated Jaccard against an INDEXED doc clears the threshold.
        Candidates = ≥1 band collision (the LSH guarantee); scoring =
        signature agreement. Driver holds only candidate pairs and the
        touched signatures — never the index or corpus."""
        import ray

        m = self.meta
        rows = ds.map_batches(
            as_fn(_BandsAndSigs(text_col, id_col, m["num_perm"],
                                m["bands"]), "bands_and_sigs"),
            batch_format="pyarrow").materialize()
        # per-band probe tasks (band partitions are independent)
        sigs_new: dict[int, np.ndarray] = {}
        new_bh = []
        for t in rows.iter_batches(batch_format="pyarrow",
                                   batch_size=65536):
            ids = t["id"].to_numpy(zero_copy_only=False)
            bh = (np.stack([np.asarray(x) for x in t["bhash"].to_pylist()])
                  if len(t) else np.empty((0, m["bands"]), np.int64))
            new_bh.append((ids, bh))
            for i, d in zip(ids, t["sig"].to_pylist()):
                sigs_new[int(i)] = np.asarray(d, dtype=np.int64)
        if not sigs_new:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})

        idx = self
        # the probe set ships ONCE (ray.put), not once per band task —
        # the single-put broadcast doctrine (see functions/knn.py)
        new_bh_ref = ray.put(new_bh)

        @ray.remote
        def probe_band(b: int, probe_pairs) -> list[tuple[int, int]]:
            from moonray.util import cap_kernel_threads

            cap_kernel_threads()
            # probe_pairs arrives auto-dereferenced from the ONE
            # ray.put'd copy all band tasks share
            # probe_pairs: (new ids, their hash in THIS band)
            nids = np.concatenate([p[0] for p in probe_pairs])
            nh = np.concatenate([p[1][:, b] for p in probe_pairs])
            order = np.argsort(nh)
            nh_s, nids_s = nh[order], nids[order]
            cands = []
            for mh, mid in idx._probe_band_files(b, np.unique(nh_s)):
                lo = np.searchsorted(nh_s, mh, "left")
                hi = np.searchsorted(nh_s, mh, "right")
                for j in range(len(mh)):
                    for p in range(int(lo[j]), int(hi[j])):
                        cands.append((int(nids_s[p]), int(mid[j])))
            return cands

        cand_lists = ray.get([probe_band.remote(b, new_bh_ref)
                              for b in range(m["bands"])])
        cands = sorted({c for lst in cand_lists for c in lst})
        if not cands:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "est_jaccard": pa.array([], pa.float64())})
        # fetch the candidate INDEXED signatures (bucket-routed, sorted
        # files pruned by id range)
        from moonray.util import splitmix64

        old_ids = np.array(sorted({b for _a, b in cands}), np.int64)
        bkt = (splitmix64(old_ids.astype(np.uint64))
               % np.uint64(m["sig_buckets"])).astype(np.int64)
        sig_old: dict[int, np.ndarray] = {}
        for k in np.unique(bkt):
            want = np.sort(old_ids[bkt == k])
            d = _sig_dir(self.root, int(k))
            if not os.path.isdir(d):
                continue
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                pf = pq.ParquetFile(os.path.join(d, fn), memory_map=True)
                need = []
                for g in range(pf.num_row_groups):
                    st = pf.metadata.row_group(g).column(0).statistics
                    if st is None or not st.has_min_max:
                        need.append(g)
                        continue
                    lo = np.searchsorted(want, st.min, "left")
                    if lo < len(want) and want[lo] <= st.max:
                        need.append(g)
                if not need:
                    continue
                t = pf.read_row_groups(need)
                ids = t["id"].to_numpy(zero_copy_only=False)
                hit = np.isin(ids, want)
                for i, s in zip(ids[hit],
                                t["sig"].take(
                                    pa.array(np.flatnonzero(hit))
                                ).to_pylist()):
                    sig_old[int(i)] = np.asarray(s, dtype=np.int64)
        a_out, b_out, j_out = [], [], []
        for a, bb in cands:
            so = sig_old.get(bb)
            if so is None:
                continue
            est = float(np.mean(sigs_new[a] == so))
            if est >= jaccard_threshold:
                a_out.append(a)
                b_out.append(bb)
                j_out.append(est)
        return pa.table({"a": pa.array(a_out, pa.int64()),
                         "b": pa.array(b_out, pa.int64()),
                         "est_jaccard": pa.array(j_out, pa.float64())})


def build_lsh_index(ds, root: str, *, text_col: str = "text",
                    id_col: str = "doc_id", num_perm: int = 64,
                    bands: int = 16, sig_buckets: int = 32) -> "LshIndex":
    """Create the layout and index ``ds``. One meta.json + the first
    append; further batches go through ``LshIndex.append``. Refuses a
    non-empty root: stale part files from a previous build (possibly
    under different num_perm/bands, or over a corpus since edited)
    would silently mix into probes — rebuild into a FRESH root."""
    assert num_perm % bands == 0
    os.makedirs(root, exist_ok=True)
    existing = [f for f in os.listdir(root) if not f.startswith(".")]
    if existing:
        raise ValueError(
            f"refusing to build an LSH index into non-empty {root!r} "
            f"(found {sorted(existing)[:3]}...): stale band/signature "
            "files would mix into probes — use a fresh directory, or "
            "LshIndex(root).append(...) to extend the existing index")
    meta = {"num_perm": num_perm, "bands": bands,
            "sig_buckets": sig_buckets, "version": 1}
    tmp = os.path.join(root, ".meta.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(root, "meta.json"))
    idx = LshIndex(root)
    idx.append(ds, text_col=text_col, id_col=id_col)
    return idx


def dedup_incremental(ds, index: LshIndex, *, text_col: str = "text",
                      id_col: str = "doc_id",
                      jaccard_threshold: float = 0.8):
    """The ingest-side filter: new docs minus those matching an INDEXED
    doc at the threshold. Within-batch duplicates are the batch paths'
    job (minhash_lsh_dedup) — compose as gate-then-dedup."""
    import ray

    hits = index.probe(ds, text_col=text_col, id_col=id_col,
                       jaccard_threshold=jaccard_threshold)
    drop = pa.array(sorted(set(hits["a"].to_pylist())), pa.int64())
    drop_ref = ray.put(drop)

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = ray.get(drop_ref)
        if len(d) == 0:
            return b
        return b.filter(pc.invert(pc.is_in(
            b[id_col].cast(pa.int64()), value_set=d)))

    keep.__name__ = "drop_indexed_near_dups"
    return ds.map_batches(keep, batch_format="pyarrow")

"""Distributed inverted text index + ranked keyword search.

The reference engine serves key point-lookups through a persisted
GlobalIndex (src/moonlink/src/storage/index — hash-partitioned file
index); this module applies the same persisted-index idea to the
*content* of a text corpus: a one-off build pass tokenizes every
document and writes token-partitioned posting lists, and every
subsequent keyword query reads ONLY the partitions its query tokens
hash to (I/O pruning, like the IVF ANN layout in knn.py).

Layout on disk (same hive pattern as ``build_ivf_layout``)::

    root/postings/part=<p>/*.parquet   (token, doc_id, tf, dl) sorted by token
    root/textindex.json                {n_docs, avgdl, partitions, ...}

Scale contract (100 TB):
- the build is two linear passes (tokenize → one range shuffle on
  (part, token) → partitioned write); postings rows are THIN
  (token + 3 ints) regardless of document size;
- a query touches len(query_tokens) partitions at most; inside a
  partition, files are token-sorted so parquet row-group stats prune
  to the matching groups;
- scoring never broadcasts the corpus: df comes from a count over the
  matched postings only, per-doc scores are a thin groupby-sum, and
  top-k is a per-block partial reduce (O(blocks × k) to the driver).

Tokenization is the canonical module-wide order (lower → extract
``[a-z0-9]+``) so every SQL oracle can recompute it with
``regexp_extract_all(lower(text), '[a-z0-9]+')``.

Two scoring modes:
- ``idf_int``: integer tf-idf (score = Σ tf * (N*1000 // df)) —
  integer-exact, so the DuckDB oracle matches value-for-value;
- ``bm25``: real BM25 (k1=1.2, b=0.75) using the per-posting document
  length; float scores, pinned by a brute-force pytest oracle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from moonray.util import hash_key_array

_META = "textindex.json"

BM25_K1 = 1.2
BM25_B = 0.75


def _tokenize_fn(text_col: str, id_col: str, partitions: int):
    """map_batches: documents → (part, token, doc_id, tf, dl) postings.

    Fully vectorized: polars lowercase + extract_all + explode, one
    group_by for per-(doc, token) tf, list-length for dl. Carrying dl
    on every posting row costs 4 bytes and removes the doc-length join
    BM25 would otherwise need at query time."""

    def tokenize(batch: pa.Table) -> pa.Table:
        import polars as pl

        from moonray.util import canonical_tokens

        ids = batch[id_col].to_numpy(zero_copy_only=False)
        toks = canonical_tokens(batch[text_col]).rename("tok")
        dl = toks.list.len().cast(pl.Int32)
        df = pl.DataFrame({"doc_id": pl.Series(ids, dtype=pl.Int64),
                           "dl": dl, "tok": toks})
        out = (df.explode("tok").drop_nulls("tok")
               .group_by(["doc_id", "tok"])
               .agg(pl.len().cast(pl.Int32).alias("tf"),
                    pl.first("dl")))
        tbl = out.to_arrow()
        tok_arr = tbl["tok"].combine_chunks().cast(pa.string())
        part = (hash_key_array(tok_arr) % np.uint64(partitions)).astype(
            np.int32)
        return pa.table({
            "part": pa.array(part, pa.int32()),
            "token": tok_arr,
            "doc_id": tbl["doc_id"].cast(pa.int64()),
            "tf": tbl["tf"].cast(pa.int32()),
            "dl": tbl["dl"].cast(pa.int32()),
        })

    return tokenize


def build_text_index(ds, root: str, *, text_col: str = "text",
                     id_col: str = "doc_id", partitions: int = 8,
                     concurrency=None) -> "TextIndex":
    """Build the persisted inverted index. One tokenize pass, one
    range shuffle on (part, token) so every output file is
    token-sorted (row-group stats prune at query time), one
    partitioned write. n_docs comes from the input count; avgdl from a
    thin column read over the postings just written (sum(tf) = total
    tokens — no second tokenize pass)."""
    import ray.data

    n_docs = ds.count()
    postings = ds.map_batches(
        _tokenize_fn(text_col, id_col, partitions),
        batch_format="pyarrow", concurrency=concurrency)
    pdir = os.path.join(root, "postings")
    os.makedirs(pdir, exist_ok=True)
    postings.sort(["part", "token"]).write_parquet(
        pdir, partition_cols=["part"])

    total_tokens = 0
    all_files = _parquet_files([
        os.path.join(pdir, d) for d in os.listdir(pdir)
        if d.startswith("part=")])
    for b in ray.data.read_parquet(all_files, columns=["tf"]).iter_batches(
            batch_format="pyarrow"):
        total_tokens += int(
            np.sum(b["tf"].to_numpy(zero_copy_only=False), dtype=np.int64))
    meta = {"n_docs": int(n_docs),
            "avgdl": float(total_tokens) / max(1, int(n_docs)),
            "partitions": int(partitions),
            "text_col": text_col, "id_col": id_col}
    tmp = os.path.join(root, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(root, _META))
    return TextIndex.open(root)


def _parquet_files(dirs: list[str]) -> list[str]:
    out: list[str] = []
    for d in dirs:
        out.extend(sorted(
            os.path.join(d, fn) for fn in os.listdir(d)
            if fn.endswith(".parquet")))
    return out


def _norm_tokens(tokens) -> list[str]:
    """Queries go through the SAME canonical tokenization as the build
    (lower → [a-z0-9]+ runs), so 'Spark' finds 'spark'."""
    import re

    out: list[str] = []
    for t in tokens:
        out.extend(re.findall(r"[a-z0-9]+", str(t).lower()))
    # preserve order, drop repeats (AND semantics / per-token idf)
    seen: set[str] = set()
    uniq = [t for t in out if not (t in seen or seen.add(t))]
    return uniq


class TextIndex:
    """Query surface over a persisted inverted-index root."""

    def __init__(self, root: str, meta: dict):
        self.root = root
        self.meta = meta
        self.partitions = int(meta["partitions"])

    @classmethod
    def open(cls, root: str) -> "TextIndex":
        with open(os.path.join(root, _META)) as f:
            return cls(root, json.load(f))

    # -- partition routing ------------------------------------------------
    def _part_of(self, token: str) -> int:
        return int(hash_key_array(pa.array([token], pa.string()))[0]
                   % np.uint64(self.partitions))

    def _part_dirs(self, tokens: list[str]) -> list[str]:
        parts = sorted({self._part_of(t) for t in tokens})
        dirs = [os.path.join(self.root, "postings", f"part={p}")
                for p in parts]
        return [d for d in dirs if os.path.isdir(d)]

    def postings(self, tokens: list[str]):
        """Dataset of posting rows for ``tokens`` — reads ONLY the
        partitions the tokens hash to, with the token filter pushed
        into the parquet scan (files are token-sorted, so row-group
        stats prune inside each file)."""
        import pyarrow.compute as pc
        import ray.data

        files = _parquet_files(self._part_dirs(tokens))
        if not files:
            return ray.data.from_arrow(pa.table({
                "token": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
                "tf": pa.array([], pa.int32()),
                "dl": pa.array([], pa.int32())}))
        return ray.data.read_parquet(
            files, columns=["token", "doc_id", "tf", "dl"],
            filter=pc.field("token").isin(tokens))

    # -- queries -----------------------------------------------------------
    def search_and(self, tokens) -> pa.Table:
        """Boolean AND: doc_ids containing EVERY query token, ascending.
        Postings are unique per (token, doc), so a doc matches iff its
        posting count over the query tokens equals len(tokens)."""
        toks = _norm_tokens(tokens)
        if not toks:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        need = len(toks)

        def full_match(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.equal(batch["count()"], need)
            return batch.filter(keep).select(["doc_id"])

        rows = (self.postings(toks).groupby("doc_id").count()
                .map_batches(full_match, batch_format="pyarrow")
                .take_all())
        ids = sorted(r["doc_id"] for r in rows)
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    def _df(self, toks: list[str]) -> dict:
        """df per token = posting rows per token, counted over the
        matched postings only (thin groupby, len(toks) rows out)."""
        out = {t: 0 for t in toks}
        for r in self.postings(toks).groupby("token").count().take_all():
            out[r["token"]] = int(r["count()"])
        return out

    def search_ranked(self, tokens, *, k: int = 10,
                      scoring: str = "idf_int") -> pa.Table:
        """Top-k docs by summed per-token score; ties break on doc_id
        ascending. ``idf_int``: integer tf-idf, SQL-exact
        (score = Σ tf * (N*1000 // df)). ``bm25``: real BM25 floats."""
        toks = _norm_tokens(tokens)
        schema_score = (pa.int64() if scoring == "idf_int"
                        else pa.float64())
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "score": pa.array([], schema_score)})
        if not toks:
            return empty
        df = self._df(toks)
        toks = [t for t in toks if df[t] > 0]
        if not toks:
            return empty
        n_docs = int(self.meta["n_docs"])
        avgdl = float(self.meta["avgdl"])

        if scoring == "idf_int":
            w = {t: (n_docs * 1000) // df[t] for t in toks}

            def score_fn(batch: pa.Table) -> pa.Table:
                tok = batch["token"].to_pylist()
                tf = batch["tf"].to_numpy(zero_copy_only=False).astype(
                    np.int64)
                wt = np.array([w[t] for t in tok], np.int64)
                return pa.table({
                    "doc_id": batch["doc_id"],
                    "s": pa.array(tf * wt, pa.int64())})
        elif scoring == "bm25":
            idf = {t: float(np.log(
                (n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0))
                for t in toks}

            def score_fn(batch: pa.Table) -> pa.Table:
                tok = batch["token"].to_pylist()
                tf = batch["tf"].to_numpy(zero_copy_only=False).astype(
                    np.float64)
                dl = batch["dl"].to_numpy(zero_copy_only=False).astype(
                    np.float64)
                it = np.array([idf[t] for t in tok], np.float64)
                s = it * (tf * (BM25_K1 + 1.0)) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl))
                return pa.table({
                    "doc_id": batch["doc_id"],
                    "s": pa.array(s, pa.float64())})
        else:
            raise ValueError(f"unknown scoring {scoring!r}")

        per_doc = (self.postings(toks)
                   .map_batches(score_fn, batch_format="pyarrow")
                   .groupby("doc_id").sum("s"))

        def partial_topk(batch: pa.Table) -> pa.Table:
            # O(k) rows leave each block: sort by (-score, doc_id)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            s = batch["sum(s)"].to_numpy(zero_copy_only=False)
            order = np.lexsort((ids, -s))[:k]
            return pa.table({"doc_id": pa.array(ids[order], pa.int64()),
                             "score": pa.array(s[order], schema_score)})

        cand = per_doc.map_batches(
            partial_topk, batch_format="pyarrow").take_all()
        rows = sorted(((r["doc_id"], r["score"]) for r in cand),
                      key=lambda x: (-x[1], x[0]))[:k]
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "score": pa.array([r[1] for r in rows], schema_score)})

    # -- observability (pytest I/O-pruning oracle, same shape as
    # IvfIndex._stats) ------------------------------------------------------
    def stats(self, tokens) -> dict:
        toks = _norm_tokens(tokens)
        probed = self._part_dirs(toks)
        alldirs = [os.path.join(self.root, "postings", d)
                   for d in os.listdir(os.path.join(self.root, "postings"))
                   if d.startswith("part=")]

        def du(dirs):
            files = bts = 0
            for d in dirs:
                for fn in os.listdir(d):
                    if fn.endswith(".parquet"):
                        files += 1
                        bts += os.path.getsize(os.path.join(d, fn))
            return files, bts

        fr, br = du(probed)
        ft, bt = du(alldirs)
        return {"parts_probed": len(probed), "parts_total": len(alldirs),
                "files_read": fr, "bytes_read": br,
                "files_total": ft, "bytes_total": bt}

"""Exact substring deduplication (ExactSubstr — Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better",
arXiv:2107.06499).

Spec (deterministic, oracle-checkable): a length-``t`` character window
starting at position ``p`` of doc ``d`` is DUPLICATED iff the same
``t``-gram occurs at some earlier ``(doc_id, pos)`` (lexicographic —
cross-doc or earlier in the same doc, measured over the ORIGINAL
corpus). Every character covered by a duplicated window is removed;
each distinct repeated substring therefore survives only at its first
occurrence. ``t`` defaults to the paper's 50.

Distributed shape (the paper's suffix array is a single-machine
structure; this is the Ray-Data-first equivalent):

  1. ``map_batches``: docs → THIN ``(id, pos, h1, h2, bkt)`` window
     rows — one row per character position, two independent 64-bit
     polynomial hash lanes over codepoints (≈128-bit t-gram identity;
     the only place collision could diverge from the string-keyed
     oracle, odds negligible). Fully vectorized: one utf-32 encode per
     batch, ``t`` fused multiply-adds over the whole batch buffer — no
     per-doc loop, windows never cross doc boundaries.
  2. ``groupby(bkt).map_groups``: sort by (h1, h2, id, pos); every row
     after the first of its (h1, h2) run is a duplicated window →
     emit ``(id, pos)`` marks. Only thin rows shuffle.
  3. docs ∪ marks → ``groupby(id-hash bucket).map_groups``: per-doc
     interval union of ``[pos, pos+t)`` (diff-array + cumsum), cut the
     covered codepoints, re-encode. Unmarked docs pass through
     vectorized; the per-doc Python loop touches ONLY docs that
     actually contain duplicated spans.

Scale note: stage 1 emits one 28-byte row per corpus character —
an O(28 × total chars) shuffle. That is the price of the EXACT
all-positions spec (the paper pays the same in suffix-array space at
8 bytes/char single-node). At 100 TB run it per-shard first (intra-
shard dedup collapses boilerplate mass), or pre-filter candidate docs
with minhash_lsh_dedup and run this only over near-dup clusters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import as_fn, default_buckets, hash_key_array

# two independent odd bases for the polynomial lanes
_BASE1 = np.uint64(0x00000100000001B3)
_BASE2 = np.uint64(0x9E3779B97F4A7C15)


def _pow_vec(base: np.uint64, t: int) -> np.ndarray:
    """[base^(t-1), ..., base^1, base^0] mod 2^64."""
    out = np.empty(t, dtype=np.uint64)
    acc = 1
    for i in range(t - 1, -1, -1):
        out[i] = np.uint64(acc & 0xFFFFFFFFFFFFFFFF)
        acc = (acc * int(base)) & 0xFFFFFFFFFFFFFFFF
    return out


class TGramWindowRows:
    """map_batches: docs → one thin row per valid t-gram window."""

    def __init__(self, id_col: str, text_col: str, t: int, buckets: int):
        self.id_col, self.text_col = id_col, text_col
        self.t, self.buckets = t, buckets
        self.p1 = _pow_vec(_BASE1, t)
        self.p2 = _pow_vec(_BASE2, t)

    def _empty(self, id_type: pa.DataType) -> pa.Table:
        return pa.table({
            self.id_col: pa.array([], id_type),
            "_pos": pa.array([], pa.int64()),
            "_h1": pa.array([], pa.uint64()),
            "_h2": pa.array([], pa.uint64()),
            "_bkt": pa.array([], pa.int64()),
        })

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self.t
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = batch[self.text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        pys = texts.to_pylist()
        n_docs = len(pys)
        if n_docs == 0:
            return self._empty(ids.type)
        lens = np.fromiter((len(s) if s is not None else 0 for s in pys),
                           np.int64, count=n_docs)
        total = int(lens.sum())
        if total < t:
            return self._empty(ids.type)
        # one encode for the whole batch; positions are CODEPOINTS
        # (matches SQL substr/length semantics, safe cut points)
        buf = np.frombuffer(
            "".join(s for s in pys if s).encode("utf-32-le"),
            dtype=np.uint32).astype(np.uint64)
        ends = np.cumsum(lens)
        starts = ends - lens
        nw = total - t + 1
        g = np.arange(nw, dtype=np.int64)
        # doc owning position g = first doc whose end > g (empty docs
        # have start == end and are skipped by side="right")
        doc = np.searchsorted(ends, g, side="right")
        valid = (g + t) <= ends[doc]
        acc1 = np.zeros(nw, dtype=np.uint64)
        acc2 = np.zeros(nw, dtype=np.uint64)
        for j in range(t):  # t fused multiply-adds, wraparound mod 2^64
            seg = buf[j:j + nw]
            acc1 += seg * self.p1[j]
            acc2 += seg * self.p2[j]
        doc_v = doc[valid]
        h1 = acc1[valid]
        return pa.table({
            self.id_col: ids.take(pa.array(doc_v, pa.int64())),
            "_pos": pa.array(g[valid] - starts[doc_v], pa.int64()),
            "_h1": pa.array(h1, pa.uint64()),
            "_h2": pa.array(acc2[valid], pa.uint64()),
            "_bkt": pa.array((h1 % np.uint64(self.buckets)).astype(np.int64)),
        })


def _mark_duplicated(id_col: str):
    def mark_dups(g: pa.Table) -> pa.Table:
        s = g.sort_by([("_h1", "ascending"), ("_h2", "ascending"),
                       (id_col, "ascending"), ("_pos", "ascending")])
        n = len(s)
        if n == 0:
            return s.select([id_col, "_pos"])
        h1 = s["_h1"].to_numpy(zero_copy_only=False)
        h2 = s["_h2"].to_numpy(zero_copy_only=False)
        dup = np.zeros(n, dtype=bool)
        dup[1:] = (h1[1:] == h1[:-1]) & (h2[1:] == h2[:-1])
        return s.filter(pa.array(dup)).select([id_col, "_pos"])

    mark_dups.__name__ = "mark_duplicated_windows"
    return mark_dups


def _cut_spans(id_col: str, text_col: str, t: int):
    def cut(g: pa.Table) -> pa.Table:
        pos_all = g["_pos"].to_numpy(zero_copy_only=False)
        is_doc = pos_all < 0
        docs_t = g.filter(pa.array(is_doc))
        marks_t = g.filter(pa.array(~is_doc)).sort_by(
            [(id_col, "ascending"), ("_pos", "ascending")])
        ids_d = docs_t[id_col].to_numpy(zero_copy_only=False)
        texts = docs_t[text_col].to_pylist()
        n = len(ids_d)
        n_chars = np.fromiter((len(s) if s is not None else 0 for s in texts),
                              np.int64, count=n)
        removed = np.zeros(n, dtype=np.int64)
        spans = np.zeros(n, dtype=np.int64)
        mids = marks_t[id_col].to_numpy(zero_copy_only=False)
        if len(mids):
            mpos = marks_t["_pos"].to_numpy(zero_copy_only=False)
            lo = np.searchsorted(mids, ids_d, side="left")
            hi = np.searchsorted(mids, ids_d, side="right")
            out = list(texts)
            for i in np.flatnonzero(hi > lo):  # ONLY docs with marks
                p = mpos[lo[i]:hi[i]]
                L = int(n_chars[i])
                diff = np.zeros(L + 1, dtype=np.int32)
                np.add.at(diff, p, 1)
                np.add.at(diff, p + t, -1)
                cover = np.cumsum(diff[:L]) > 0
                edges = np.diff(np.r_[np.int8(0), cover.view(np.int8)])
                spans[i] = int(np.count_nonzero(edges == 1))
                removed[i] = int(np.count_nonzero(cover))
                cp = np.frombuffer(out[i].encode("utf-32-le"), np.uint32)
                out[i] = cp[~cover].tobytes().decode("utf-32-le")
            texts = out
        return pa.table({
            id_col: docs_t[id_col],
            text_col: pa.array(texts, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
            "removed_chars": pa.array(removed, pa.int64()),
            "n_spans": pa.array(spans, pa.int64()),
        })

    cut.__name__ = "cut_duplicated_spans"
    return cut


def exact_substring_dedup(ds, *, id_col: str = "doc_id",
                          text_col: str = "text", t: int = 50,
                          num_buckets: int | None = None):
    """→ Dataset[(id, text, n_chars, removed_chars, n_spans)] — every
    doc, with all duplicated-window characters removed from ``text``
    (the first occurrence of each repeated substring survives) and the
    per-doc cut accounting. ``n_spans`` counts the maximal merged
    removed intervals. Docs shorter than ``t`` pass through untouched.
    """
    B = num_buckets or default_buckets()
    win = ds.select_columns([id_col, text_col]).map_batches(
        as_fn(TGramWindowRows(id_col, text_col, t, B), "tgram_windows"),
        batch_format="pyarrow")
    marks = win.groupby("_bkt").map_groups(_mark_duplicated(id_col),
                                           batch_format="pyarrow")

    def doc_rows(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        dbkt = (hash_key_array(b[id_col]) % np.uint64(B)).astype(np.int64)
        return pa.table({id_col: b[id_col], text_col: txt.cast(pa.string()),
                         "_pos": pa.array(np.full(len(b), -1, np.int64)),
                         "_dbkt": pa.array(dbkt)})

    doc_rows.__name__ = "doc_rows"

    def mark_rows(b: pa.Table) -> pa.Table:
        dbkt = (hash_key_array(b[id_col]) % np.uint64(B)).astype(np.int64)
        return pa.table({id_col: b[id_col],
                         text_col: pa.nulls(len(b), pa.string()),
                         "_pos": b["_pos"], "_dbkt": pa.array(dbkt)})

    mark_rows.__name__ = "mark_rows"

    u = (ds.select_columns([id_col, text_col])
           .map_batches(doc_rows, batch_format="pyarrow")
           .union(marks.map_batches(mark_rows, batch_format="pyarrow")))
    return u.groupby("_dbkt").map_groups(_cut_spans(id_col, text_col, t),
                                         batch_format="pyarrow")


def exact_substring_oracle_sql(t: int = 50, *, table: str = "documents",
                               id_col: str = "doc_id",
                               text_expr: str = "text") -> str:
    """DuckDB oracle for the STATS columns (the cleaned text itself is
    pinned by the brute-force pytest oracle; SQL reconstructs counts).
    1-based substr/generate_series; engine positions are 0-based — the
    outputs carry no positions, so the offset never surfaces."""
    return f"""
        WITH docs AS (SELECT {id_col}, {text_expr} AS txt,
                             CAST(length({text_expr}) AS BIGINT) AS n_chars
                      FROM {table}),
        wins AS (SELECT {id_col},
                        unnest(generate_series(1, n_chars - {t} + 1)) AS pos,
                        txt
                 FROM docs WHERE n_chars >= {t}),
        grams AS (SELECT {id_col}, pos, substr(txt, pos, {t}) AS gram
                  FROM wins),
        marked AS (SELECT {id_col}, pos FROM grams
                   QUALIFY row_number() OVER (PARTITION BY gram
                                              ORDER BY {id_col}, pos) > 1),
        chars AS (SELECT DISTINCT {id_col}, c FROM (
                    SELECT {id_col},
                           unnest(generate_series(pos, pos + {t} - 1)) AS c
                    FROM marked)),
        isl AS (SELECT {id_col}, c,
                       c - row_number() OVER (PARTITION BY {id_col}
                                              ORDER BY c) AS grp
                FROM chars),
        st AS (SELECT {id_col}, CAST(count(*) AS BIGINT) AS removed_chars,
                      CAST(count(DISTINCT grp) AS BIGINT) AS n_spans
               FROM isl GROUP BY {id_col})
        SELECT d.{id_col}, d.n_chars,
               CAST(coalesce(s.removed_chars, 0) AS BIGINT) AS removed_chars,
               CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans
        FROM docs d LEFT JOIN st s USING ({id_col})
    """

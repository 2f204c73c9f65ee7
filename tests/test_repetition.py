"""Gopher-style repetition signals vs a DuckDB oracle (line split /
trim / first-occurrence accounting mirrored exactly — the same
hash-for-hash parity standard the driver applies to SQL-checked
queries, run locally over the sf0.01 documents table)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from moonray.functions.text import (repetition_filter, repetition_oracle_sql,
                                    repetition_stats, repetition_stats_batch)

SF = "/root/testdata/sf0.01"


def _multiline_docs() -> pa.Table:
    """sf0.01 docs are single-line; glue their texts into multi-line
    documents with PLANTED duplicate lines (deterministic mix of
    duplicate-free, partially-repetitive and spammy docs, plus tabs/CR
    padding to exercise the trim parity) so the oracle comparison is
    non-trivial."""
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    docs = []
    for i in range(200):
        base = [texts[(i * 7 + j) % len(texts)][:80] for j in range(6)]
        if i % 3 == 1:
            base += [base[0], base[1] + "\t", "  " + base[0] + " \r"]
        if i % 5 == 2:
            base = base[:2] + ["REPEATED LINE"] * (i % 11)
        if i % 17 == 3:
            base += ["", "   ", "\t\r"]
        docs.append("\n".join(base))
    return pa.table({"doc_id": pa.array(range(200), pa.int64()),
                     "text": pa.array(docs, pa.string()),
                     "lang": pa.array(["en"] * 200, pa.string()),
                     "source": pa.array(["synth"] * 200, pa.string()),
                     "n_chars": pa.array([len(d) for d in docs], pa.int64())})


def test_repetition_stats_matches_duckdb_oracle():
    t = _multiline_docs()
    got = (repetition_stats(rd.from_arrow(t))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", t)
    want = (con.execute(repetition_oracle_sql()).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    for c in ("n_lines", "n_distinct_lines", "dup_line_permille",
              "dup_char_permille"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c
    # the comparison must exercise real signal, not all-zeros
    assert (want["dup_line_permille"] > 0).sum() >= 50
    assert (want["dup_char_permille"] > 0).sum() >= 50
    assert (want["dup_line_permille"] == 0).sum() >= 50


def test_repetition_signals_and_filter():
    spam = "buy now\n" * 20 + "unique line\n"
    clean = "\n".join(f"distinct sentence number {i}" for i in range(20))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([spam, clean], pa.string())})
    out = repetition_stats_batch(t).to_pylist()
    by = {r["doc_id"]: r for r in out}
    assert by[1]["n_lines"] == 21 and by[1]["n_distinct_lines"] == 2
    assert by[1]["dup_line_permille"] == 1000 * 19 // 21
    assert by[2]["dup_line_permille"] == 0 == by[2]["dup_char_permille"]

    kept = repetition_filter(rd.from_arrow(t)).to_pandas()
    assert kept["doc_id"].tolist() == [2]


def test_repetition_empty_and_blank_docs():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["", " \t\r\n \n"], pa.string())})
    out = repetition_stats_batch(t).to_pylist()
    for r in out:
        assert r["n_lines"] == 0 and r["dup_line_permille"] == 0
        assert r["dup_char_permille"] == 0


def _brute_topn(text: str, n: int) -> int:
    import re as _re
    from collections import Counter

    from moonray.functions.text import TOKEN_RE

    toks = _re.findall(r"[a-z0-9]+", text.lower())  # canonical order
    total = sum(len(t) for t in toks)
    grams = Counter(tuple(toks[i:i + n]) for i in range(len(toks) - n + 1))
    covered = max((c * sum(len(t) for t in g)
                   for g, c in grams.items() if c >= 2), default=0)
    return 1000 * covered // max(total, 1)


def test_ngram_repetition_matches_bruteforce():
    import pyarrow.parquet as pq

    from moonray.functions.text import ngram_repetition_batch

    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()[:120]
    # plant heavy phrase-stamped spam + borderline repeats
    texts += ["buy cheap pills now " * 30,
              "alpha beta gamma " * 2 + "delta " * 5,
              "one two one two three one two", "", "single",
              "a b a b a b a b a b"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    got = ngram_repetition_batch(t)
    for n in (2, 3, 4):
        col = got[f"top{n}gram_char_permille"].to_pylist()
        want = [_brute_topn(x, n) for x in texts]
        assert col == want, f"n={n}"
    # the planted spam must actually trip the Gopher gate (a 4-token
    # cycle's best 2-gram covers 10/16 of the chars → 625‰, far over
    # the 200‰ threshold)
    from moonray.functions.text import NG_TOP_THRESH_PERMILLE

    spam_idx = 120
    assert got["top2gram_char_permille"][spam_idx].as_py() == 625
    assert got["top2gram_char_permille"][spam_idx].as_py() \
        > NG_TOP_THRESH_PERMILLE[2]


def test_ngram_repetition_filter_drops_spam():
    from moonray.functions.text import ngram_repetition_filter

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(
                      ["free money free money free money free money",
                       "a perfectly ordinary sentence about nothing much"],
                      pa.string())})
    kept = ngram_repetition_filter(rd.from_arrow(t)).to_pandas()
    assert kept["doc_id"].tolist() == [2]

"""Inverted text index: build + boolean/ranked search vs DuckDB and
brute-force oracles, query tokenization parity, and the I/O-pruning
contract (reads ∝ probed partitions, not the corpus)."""

import math
import re

import duckdb
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"
DOCS = f"{SF}/documents.parquet"


@pytest.fixture(scope="module")
def index(tmp_path_factory):
    import ray.data as rd

    from moonray.functions.textindex import build_text_index

    root = str(tmp_path_factory.mktemp("tix"))
    ds = rd.read_parquet(DOCS)
    return build_text_index(ds, root, partitions=8)


def _brute_postings(tokens):
    """(token, doc_id) -> (tf, dl) over the raw corpus, same canonical
    tokenization (lower → [a-z0-9]+)."""
    tbl = pq.read_table(DOCS, columns=["doc_id", "text"])
    out, dls = {}, {}
    for did, text in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        dls[did] = len(toks)
        for t in toks:
            if t in tokens:
                out[(t, did)] = out.get((t, did), 0) + 1
    return out, dls


def test_and_search_matches_duckdb(index):
    got = index.search_and(["spark", "window", "vector"])["doc_id"].to_pylist()
    want = [r[0] for r in duckdb.sql(f"""
        WITH toks AS (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                 FROM read_parquet('{DOCS}'))
        SELECT doc_id FROM toks WHERE tok IN ('spark','window','vector')
        GROUP BY doc_id HAVING count(DISTINCT tok) = 3 ORDER BY doc_id
        """).fetchall()]
    assert got == want and len(want) > 0


def test_query_tokenization_parity(index):
    """Queries fold through the same canonical tokenizer as the build:
    case, punctuation splits, and multi-word strings all normalize."""
    base = index.search_and(["spark", "vector"])["doc_id"].to_pylist()
    assert index.search_and(["SPARK", "Vector"])["doc_id"].to_pylist() == base
    assert index.search_and(["spark, vector!"])["doc_id"].to_pylist() == base
    # repeats collapse (AND of a token with itself)
    assert index.search_and(["spark", "spark", "vector"])[
        "doc_id"].to_pylist() == base


def test_ranked_idf_int_matches_duckdb(index):
    got = index.search_ranked(["spark", "vector", "merge"], k=20,
                              scoring="idf_int")
    want = duckdb.sql(f"""
        WITH toks AS (SELECT doc_id,
                 unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
                 FROM read_parquet('{DOCS}')),
        tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks
               WHERE tok IN ('spark','vector','merge') GROUP BY 1, 2),
        df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        n AS (SELECT count(*) AS n FROM read_parquet('{DOCS}'))
        SELECT doc_id, CAST(sum(tf * ((n.n*1000)//df.df)) AS BIGINT) AS score
        FROM tf JOIN df USING(tok), n
        GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 20
        """).fetchall()
    assert [(r["doc_id"], r["score"]) for r in got.to_pylist()] == want


def test_bm25_matches_brute_force(index):
    """Real-BM25 scores vs an independent per-doc recompute (math.log,
    plain Python) — same ranking, scores equal to 1e-9."""
    toks = ("spark", "vector")
    post, dls = _brute_postings(set(toks))
    n = len(dls)
    avgdl = sum(dls.values()) / n
    df = {t: sum(1 for (tt, _) in post if tt == t) for t in toks}
    scores = {}
    for (t, did), tf in post.items():
        idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        scores[did] = scores.get(did, 0.0) + idf * (tf * 2.2) / (
            tf + 1.2 * (1 - 0.75 + 0.75 * dls[did] / avgdl))
    want = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:10]
    got = index.search_ranked(list(toks), k=10, scoring="bm25").to_pylist()
    assert [r["doc_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert abs(r["score"] - w[1]) < 1e-9


def test_io_pruning(index):
    """A query touches only the partitions its tokens hash to."""
    s1 = index.stats(["spark"])
    assert s1["parts_total"] == 8
    assert s1["parts_probed"] == 1
    assert 0 < s1["bytes_read"] < 0.5 * s1["bytes_total"]
    # more tokens may touch more partitions but never all of them by
    # construction of this query
    s2 = index.stats(["spark", "vector"])
    assert s2["parts_probed"] <= 2


def test_empty_and_missing_tokens(index):
    assert index.search_and([]).num_rows == 0
    assert index.search_and(["zzzznotoken"]).num_rows == 0
    assert index.search_ranked([], k=5).num_rows == 0
    r = index.search_ranked(["zzzznotoken"], k=5)
    assert r.num_rows == 0
    # a missing token ANDed in removes every doc
    assert index.search_and(["spark", "zzzznotoken"]).num_rows == 0
    # ranked ignores missing tokens (df=0 contributes nothing)
    r2 = index.search_ranked(["spark", "zzzznotoken"], k=5,
                             scoring="idf_int")
    r3 = index.search_ranked(["spark"], k=5, scoring="idf_int")
    assert r2.to_pylist() == r3.to_pylist()

"""Exact substring dedup (ExactSubstr, arXiv:2107.06499) vs two
oracles: a brute-force Python reference (full cleaned-TEXT parity,
unicode included) and the DuckDB stats oracle the contract query uses
(same SQL run locally over a registered view)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.substr import (exact_substring_dedup,
                                      exact_substring_oracle_sql)


def brute_force(docs: list[tuple[int, str]], t: int):
    """Dict-based reference: first (doc_id, pos) per t-gram over the
    ORIGINAL corpus; later occurrences mark [pos, pos+t) for removal."""
    first: dict[str, tuple] = {}
    marks: dict[int, list[int]] = {d: [] for d, _ in docs}
    for d, txt in sorted(docs):
        for p in range(len(txt) - t + 1):
            g = txt[p:p + t]
            if g in first:
                marks[d].append(p)
            else:
                first[g] = (d, p)
    out = {}
    for d, txt in docs:
        cover = np.zeros(len(txt), dtype=bool)
        for p in marks[d]:
            cover[p:p + t] = True
        kept = "".join(c for c, m in zip(txt, cover) if not m)
        edges = np.diff(np.r_[np.int8(0), cover.view(np.int8)])
        out[d] = (kept, len(txt), int(cover.sum()),
                  int(np.count_nonzero(edges == 1)))
    return out


def _corpus(t: int) -> list[tuple[int, str]]:
    shared = "the quick brown fox jumps over the lazy dog " * 3  # ≥ 2t
    uni = "naïve café ☃ déjà-vu έξυπνο ΚΕΛΒΙΝ δοκιμή 😀 " * 3
    rng = np.random.default_rng(7)

    def rand(n):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, n))

    return [
        (1, rand(40) + shared + rand(30)),          # first occurrence wins
        (2, rand(35) + shared + rand(25)),          # cross-doc dup
        (3, shared),                                # doc fully duplicated
        (4, "ab" * 80),                             # period-2 self-repeat
        (5, rand(t - 1)),                           # shorter than t
        (6, ""),                                    # empty
        (7, rand(20) + uni + rand(10)),             # unicode first
        (8, uni + rand(50)),                        # unicode dup at pos 0
        (9, rand(120)),                             # clean doc
        (10, rand(10) + shared[:t] + rand(5) + shared[:t] + rand(8)),
    ]


def test_exact_substring_matches_brute_force():
    t = 25
    docs = _corpus(t)
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([s for _, s in docs], pa.string())}))
    got = {r["doc_id"]: r for r in
           exact_substring_dedup(ds, t=t, num_buckets=8).take_all()}
    want = brute_force(docs, t)
    assert set(got) == set(want)
    for d, (txt, n, rem, sp) in want.items():
        r = got[d]
        assert r["text"] == txt, f"doc {d} cleaned text"
        assert (r["n_chars"], r["removed_chars"], r["n_spans"]) == \
            (n, rem, sp), f"doc {d} stats"
    # the corpus must exercise real removals, unicode ones included
    assert want[3][2] > 0 and want[4][2] > 0 and want[8][2] > 0


def test_exact_substring_stats_match_duckdb_oracle():
    t = 25
    docs = _corpus(t)
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([s for _, s in docs], pa.string())})
    got = (exact_substring_dedup(rd.from_arrow(tbl), t=t, num_buckets=8)
           .to_pandas()
           .drop(columns=["text"])
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("documents", tbl)
    want = (con.execute(exact_substring_oracle_sql(t)).fetchdf()
            .sort_values("doc_id").reset_index(drop=True))
    assert list(got.columns) == list(want.columns)
    for c in ("n_chars", "removed_chars", "n_spans"):
        assert got[c].astype("int64").tolist() == \
            want[c].astype("int64").tolist(), c


def test_exact_substring_on_sf_documents():
    """sf0.001 documents end-to-end: stats vs the SQL oracle over the
    real parquet (the contract query shape), text spot-invariants."""
    sf = "/root/testdata/sf0.001"
    t = 50
    ds = rd.read_parquet(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"])
    res = exact_substring_dedup(ds, t=t).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(exact_substring_oracle_sql(t)).fetchdf()
    g = res.drop(columns=["text"]).sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("doc_id").reset_index(drop=True)
    for c in ("n_chars", "removed_chars", "n_spans"):
        assert g[c].astype("int64").tolist() == \
            w[c].astype("int64").tolist(), c
    by_id = res.set_index("doc_id")
    assert (by_id["n_chars"] - by_id["removed_chars"] ==
            by_id["text"].str.len()).all()

"""TextStats / QualityScore vectorization parity.

Both stages were rewritten from per-row Python regex loops to polars
kernels (_token_stats_columns). Their outputs feed driver SQL oracles
(hash-compared), so the rewrite must be byte-identical — this test pins
the vectorized stages against the original loop implementations, kept
here as the executable spec, over real sf0.001 documents plus
adversarial edge cases (empty text, no tokens, unicode, ties in the
language scores).
"""

import hashlib
import re

import pyarrow as pa
import pytest

from moonray.functions.text import (LANG_ORDER, LANG_STOPWORDS, PUNCT_RE,
                                    QF_MIN_TOKENS, QF_MIN_UNIQ_PERMILLE,
                                    QF_SW_HI, QF_SW_LO, TOKEN_RE, QualityScore,
                                    TextStats)

SF_DIR = "/root/testdata/sf0.001"


def _text_stats_loop_spec(batch: pa.Table) -> pa.Table:
    tok, punct = re.compile(TOKEN_RE), re.compile(PUNCT_RE)
    n_tokens, uniq_tokens, punct_count, token_chars = [], [], [], []
    fingerprint, lang_pred = [], []
    for t in batch["text"].to_pylist():
        toks = tok.findall(t)
        # canonical lowered stream: lower THEN extract — the order the
        # SQL oracle expresses (and the vectorized impl matches); raw
        # counts (n_tokens/token_chars) stay on the original text,
        # exactly like the oracle's mixed expressions
        low = re.findall(r"[a-z0-9]+", t.lower())
        n_tokens.append(len(toks))
        uniq_tokens.append(len(set(low)))
        punct_count.append(len(punct.findall(t)))
        token_chars.append(sum(len(x) for x in toks))
        fingerprint.append(hashlib.md5(t.lower().encode()).hexdigest())
        scores = {lang: sum(1 for x in low if x in set(sw))
                  for lang, sw in LANG_STOPWORDS.items()}
        pred = LANG_ORDER[0]
        for lang in LANG_ORDER:
            if scores[lang] > scores[pred]:
                pred = lang
        lang_pred.append(pred)
    return (batch
            .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
            .append_column("uniq_tokens", pa.array(uniq_tokens, pa.int64()))
            .append_column("punct_count", pa.array(punct_count, pa.int64()))
            .append_column("token_chars", pa.array(token_chars, pa.int64()))
            .append_column("fingerprint", pa.array(fingerprint, pa.string()))
            .append_column("lang_pred", pa.array(lang_pred, pa.string())))


def _quality_loop_spec(batch: pa.Table) -> pa.Table:
    tok = re.compile(TOKEN_RE)
    sw = frozenset(LANG_STOPWORDS["en"])
    n_tok, sw_pm, uq_pm, mtl = [], [], [], []
    for t in batch["text"].to_pylist():
        toks = re.findall(r"[a-z0-9]+", t.lower())  # canonical order
        n = len(toks)
        n_tok.append(n)
        sw_pm.append(1000 * sum(1 for x in toks if x in sw) // max(1, n))
        uq_pm.append(1000 * len(set(toks)) // max(1, n))
        # oracle: alnum chars of the ORIGINAL text over the lowered
        # token count (the SQL mixes streams; mirror it exactly)
        mtl.append(10 * len(re.findall(r"[A-Za-z0-9]", t)) // max(1, n))
    ok = [int(n >= QF_MIN_TOKENS and QF_SW_LO <= s <= QF_SW_HI
              and u >= QF_MIN_UNIQ_PERMILLE)
          for n, s, u in zip(n_tok, sw_pm, uq_pm)]
    return (batch
            .append_column("n_tokens", pa.array(n_tok, pa.int64()))
            .append_column("stopword_permille", pa.array(sw_pm, pa.int64()))
            .append_column("uniq_permille", pa.array(uq_pm, pa.int64()))
            .append_column("mean_token_len_x10", pa.array(mtl, pa.int64()))
            .append_column("quality_ok", pa.array(ok, pa.int64())))


EDGE_TEXTS = [
    "",                                  # empty doc
    "!!! ??? ...",                       # punctuation only, zero tokens
    "The the THE tHe",                   # case folding + uniq
    "der die das und der die",           # de beats en
    "le la DES et el los de y",          # es/fr tie → earlier LANG_ORDER wins
    "naïve café — 模型 training 123abc", # unicode outside [A-Za-z0-9]
    "a " * 500 + "of and the",           # long repetitive doc
    "x" * 10_000,                        # single giant token
    "tab\tsep\nnew\r\nlines of the and", # whitespace variety
    "The quick brown fox jumps of and a the done it was with great care",
    "the Kthe end of and a",        # Kelvin sign folds into ASCII k
    "İstanbul the of and a is",     # dotted I lowers to i+U+0307
]


def _edge_batch() -> pa.Table:
    return pa.table({
        "doc_id": pa.array(range(len(EDGE_TEXTS)), pa.int64()),
        "text": pa.array(EDGE_TEXTS, pa.string()),
    })


def _docs_batch() -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"])


@pytest.mark.parametrize("mk", [_edge_batch, _docs_batch])
def test_text_stats_matches_loop_spec(mk):
    batch = mk()
    assert TextStats()(batch).equals(_text_stats_loop_spec(batch))


@pytest.mark.parametrize("mk", [_edge_batch, _docs_batch])
def test_quality_score_matches_loop_spec(mk):
    batch = mk()
    assert QualityScore()(batch).equals(_quality_loop_spec(batch))


def test_stages_match_duckdb_oracle_on_edge_texts():
    """The decisive check: both stages vs the ACTUAL SQL oracles over
    the edge batch (incl. the Kelvin-sign case-fold, where the mixed
    original/lowered token streams must match the SQL expression by
    expression).

    KNOWN PLATFORM DIVERGENCE, excluded here: dotted İ (U+0130).
    Python's and Rust/polars' full case mapping lower it to
    'i' + U+0307 (combining dot) while DuckDB's lower() uses the simple
    mapping ('i'), so the token streams differ no matter which
    tokenization order we pick. Engine↔engine parity on İ is pinned by
    the loop-spec tests above instead."""
    import duckdb

    texts = [t for t in EDGE_TEXTS if "İ" not in t]
    docs = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })

    from moonray.functions.text import (quality_filter_oracle_sql,
                                        text_stats_oracle_sql)
    con = duckdb.connect()
    con.register("documents", docs)

    got = TextStats()(docs).to_pandas().sort_values("doc_id",
                                                    ignore_index=True)
    want = con.execute(text_stats_oracle_sql()).fetchdf().sort_values(
        "doc_id", ignore_index=True)
    for c in ("n_tokens", "uniq_tokens", "punct_count", "token_chars",
              "fingerprint", "lang_pred"):
        assert got[c].tolist() == want[c].tolist(), c

    scored = QualityScore()(docs).to_pandas()
    want_q = con.execute(quality_filter_oracle_sql()).fetchdf()
    got_q = scored[scored.quality_ok == 1].sort_values(
        "doc_id", ignore_index=True)
    want_q = want_q.sort_values("doc_id", ignore_index=True)
    assert got_q["doc_id"].tolist() == want_q["doc_id"].tolist()
    for c in ("n_tokens", "stopword_permille", "uniq_permille",
              "mean_token_len_x10"):
        assert got_q[c].tolist() == want_q[c].tolist(), c

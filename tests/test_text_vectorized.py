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
        low = [x.lower() for x in toks]
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
        toks = [x.lower() for x in tok.findall(t)]
        n = len(toks)
        n_tok.append(n)
        sw_pm.append(1000 * sum(1 for x in toks if x in sw) // max(1, n))
        uq_pm.append(1000 * len(set(toks)) // max(1, n))
        mtl.append(10 * sum(len(x) for x in toks) // max(1, n))
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

"""Text analysis stages: token stats, quality flags, language-ID
heuristic, document fingerprinting.

Every metric here is defined to be EXACTLY reproducible in ANSI SQL
(DuckDB) so the driver's oracle can hash-compare: integer counts and
hex digests only — no floats. Stages are callable config objects
(regexes compiled ONCE on the driver, shipped in the pickled task
closure — the setup-once-per-worker pattern of moonlink's converters,
src/moonlink_connectors/src/rest_ingest/json_converter.rs) run as
TASK pools via util.as_fn: per-stage state here is a few compiled
patterns, and an actor pool would add ~1-2 s of spin-up per pipeline
for nothing (measured on the knn stages). Actor pools stay the right
shape only for genuinely expensive init (model load, index build).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

TOKEN_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.,;:!?]"

# language → stopword set; scoring order (tie-break) is fixed: en,de,es,fr,zh
LANG_STOPWORDS = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "es": ("el", "los", "de", "y"),
    "fr": ("le", "la", "des", "et"),
    "zh": ("zh1", "zh2", "zh3", "zh4"),  # placeholder — no latin stopwords
}
LANG_ORDER = ["en", "de", "es", "fr", "zh"]


def _token_stats_columns(texts: pa.ChunkedArray | pa.Array,
                         *, lang_scores: bool):
    """Vectorized token statistics for a text column (the shared engine
    under TextStats and QualityScore — both were per-row Python regex
    loops, the anti-pattern class VERDICT r2 flagged in the dedup map
    stages). One polars pass computes counts; tokens are lowered +
    exploded ONCE and language/stopword membership is a single is_in +
    bincount per language, not a Python set probe per token.

    Returns (n_tokens_raw, n_tokens_low, uniq_tokens, punct_count,
    token_chars, lowered polars Series, scores) — scores is an
    (n, len(LANG_ORDER)) int64 occurrence-count matrix when lang_scores
    else just the en-stopword occurrence counts.

    TWO token counts because the SQL oracles mix streams: TextStats'
    oracle counts tokens on the ORIGINAL text
    (regexp_extract_all(text, '[A-Za-z0-9]+')) while QualityScore's
    counts the LOWERED stream (len of regexp_extract_all(lower(text),
    '[a-z0-9]+')). The two differ exactly on characters whose lowercase
    folds into ASCII (Kelvin K → k, İ → i+U+0307) — each stage must use
    ITS oracle's count or the driver hash-compare breaks on such
    inputs. token_chars == alnum-char count of the original text
    (tokens partition exactly the alphanumeric characters)."""
    import numpy as np
    import polars as pl

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    s = pl.from_arrow(texts)
    low = s.str.to_lowercase()
    n_tokens_raw = s.str.count_matches(TOKEN_RE).cast(pl.Int64).to_numpy()
    punct_count = s.str.count_matches(PUNCT_RE).cast(pl.Int64).to_numpy()
    token_chars = s.str.count_matches("[A-Za-z0-9]").cast(pl.Int64).to_numpy()
    toks = low.str.extract_all("[a-z0-9]+")
    n_tokens_low = toks.list.len().cast(pl.Int64).to_numpy()
    uniq_tokens = toks.list.n_unique().cast(pl.Int64).to_numpy()
    # empty docs: n_unique counts nothing, matches len(set()) == 0
    uniq_tokens = np.where(n_tokens_low == 0, 0, uniq_tokens)

    n = len(s)
    ex = pl.DataFrame({"i": pl.int_range(0, n, eager=True),
                       "tok": toks}).explode("tok").drop_nulls("tok")
    ii = ex["i"].to_numpy()
    langs = LANG_ORDER if lang_scores else ["en"]
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        hit = ex["tok"].is_in(list(LANG_STOPWORDS[lang])).to_numpy()
        if hit.any():
            scores[:, j] = np.bincount(ii[hit], minlength=n)
    return (n_tokens_raw, n_tokens_low, uniq_tokens, punct_count,
            token_chars, low, scores)


class TextStats:
    """map_batches stage over documents: adds
    n_tokens, uniq_tokens, punct_count, token_chars, fingerprint,
    lang_pred — all ints/strings, SQL-reproducible. Vectorized via
    _token_stats_columns; the only per-row work left is the md5
    fingerprint (a C digest per doc, matching DuckDB md5(lower(text)))."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        # n_tokens on the ORIGINAL text — this stage's SQL oracle says
        # len(regexp_extract_all(text, TOKEN_RE)); uniq/lang on lowered
        (n_tokens, _n_low, uniq_tokens, punct_count, token_chars, low,
         scores) = _token_stats_columns(batch["text"], lang_scores=True)
        # first-strict-max over LANG_ORDER == np.argmax first-win ties
        lang_pred = np.array(LANG_ORDER)[np.argmax(scores, axis=1)]
        fingerprint = [hashlib.md5(t.encode()).hexdigest()
                       for t in low.to_list()]
        return (batch
                .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
                .append_column("uniq_tokens", pa.array(uniq_tokens, pa.int64()))
                .append_column("punct_count", pa.array(punct_count, pa.int64()))
                .append_column("token_chars", pa.array(token_chars, pa.int64()))
                .append_column("fingerprint", pa.array(fingerprint, pa.string()))
                .append_column("lang_pred",
                               pa.array(lang_pred.tolist(), pa.string())))


def text_stats(ds, concurrency=None):
    """documents Dataset → stats-annotated Dataset (task pool)."""
    from moonray.util import as_fn

    return ds.map_batches(as_fn(TextStats()), batch_format="pyarrow",
                          concurrency=concurrency, batch_size=1024)


QF_MIN_TOKENS = 20
QF_SW_LO, QF_SW_HI = 20, 200       # stopword permille band
QF_MIN_UNIQ_PERMILLE = 300         # de-boilerplate: unique-token ratio


class QualityScore:
    """map_batches stage: heuristic document-quality signals as
    SQL-exact integers (the C4/Gopher-style length + stopword-band +
    repetition filters, integer-scaled so the DuckDB oracle matches
    hash-for-hash): n_tokens, stopword_permille (en stopwords),
    uniq_permille (unique/total tokens), mean_token_len_x10,
    quality_ok. Vectorized via _token_stats_columns (polars regex
    kernels + one stopword is_in/bincount) — no per-row Python."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        # n_tokens on the LOWERED stream — this stage's SQL oracle says
        # len(regexp_extract_all(lower(text), '[a-z0-9]+'))
        (_n_raw, n_tok, uniq, _punct, tchars, _low,
         scores) = _token_stats_columns(batch["text"], lang_scores=False)
        denom = np.maximum(n_tok, 1)
        sw_pm = 1000 * scores[:, 0] // denom
        uq_pm = 1000 * uniq // denom
        mtl = 10 * tchars // denom
        ok = ((n_tok >= QF_MIN_TOKENS) & (sw_pm >= QF_SW_LO)
              & (sw_pm <= QF_SW_HI)
              & (uq_pm >= QF_MIN_UNIQ_PERMILLE)).astype(np.int64)
        return (batch
                .append_column("n_tokens", pa.array(n_tok, pa.int64()))
                .append_column("stopword_permille", pa.array(sw_pm, pa.int64()))
                .append_column("uniq_permille", pa.array(uq_pm, pa.int64()))
                .append_column("mean_token_len_x10", pa.array(mtl, pa.int64()))
                .append_column("quality_ok", pa.array(ok, pa.int64())))


def quality_filter(ds, concurrency=None):
    """documents Dataset → only docs passing the quality band, with the
    integer score columns attached. The canonical pre-training filter
    stage: length floor, stopword-ratio band (too few = non-language,
    too many = boilerplate), unique-token floor (repetition)."""
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b["quality_ok"], pa.scalar(1, pa.int64())))

    from moonray.util import as_fn

    return ds.map_batches(as_fn(QualityScore()), batch_format="pyarrow",
                          concurrency=concurrency,
                          batch_size=1024).map_batches(
        keep, batch_format="pyarrow")


def quality_filter_oracle_sql() -> str:
    toks = f"regexp_extract_all(lower(text), '[a-z0-9]+')"
    sw = f"len(list_filter({toks}, x -> x IN {tuple(LANG_STOPWORDS['en'])!r}))"
    return f"""
WITH scored AS (
  SELECT doc_id, text, lang, source, n_chars,
    len({toks}) AS n_tokens,
    1000 * {sw} // greatest(1, len({toks})) AS stopword_permille,
    1000 * len(list_distinct({toks})) // greatest(1, len({toks})) AS uniq_permille,
    10 * length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
       // greatest(1, len({toks})) AS mean_token_len_x10
  FROM documents)
SELECT *, CAST(n_tokens >= {QF_MIN_TOKENS}
     AND stopword_permille BETWEEN {QF_SW_LO} AND {QF_SW_HI}
     AND uniq_permille >= {QF_MIN_UNIQ_PERMILLE} AS BIGINT) AS quality_ok
FROM scored
WHERE n_tokens >= {QF_MIN_TOKENS}
  AND stopword_permille BETWEEN {QF_SW_LO} AND {QF_SW_HI}
  AND uniq_permille >= {QF_MIN_UNIQ_PERMILLE}
"""


def text_stats_oracle_sql(extra_cols: str = "") -> str:
    """DuckDB SQL computing the same columns (see TextStats)."""
    score = {lang: f"len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> x IN {tuple(sw)!r}))"
             for lang, sw in LANG_STOPWORDS.items()}
    # NB: token regex is case-insensitive on lowered text → '[a-z0-9]+'
    lang_case = (
        "CASE "
        + f"WHEN {score['zh']} > {score['en']} AND {score['zh']} > {score['de']} AND {score['zh']} > {score['es']} AND {score['zh']} > {score['fr']} THEN 'zh' "
        + f"WHEN {score['fr']} > {score['en']} AND {score['fr']} > {score['de']} AND {score['fr']} > {score['es']} THEN 'fr' "
        + f"WHEN {score['es']} > {score['en']} AND {score['es']} > {score['de']} THEN 'es' "
        + f"WHEN {score['de']} > {score['en']} THEN 'de' "
        + "ELSE 'en' END"
    )
    return f"""
SELECT doc_id, text, lang, source, n_chars,
  len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_tokens,
  len(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS uniq_tokens,
  len(regexp_extract_all(text, '{PUNCT_RE}')) AS punct_count,
  length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS token_chars,
  md5(lower(text)) AS fingerprint,
  {lang_case} AS lang_pred
FROM documents{extra_cols}
"""


def vocab_top_tokens(ds, *, text_col: str = "text", k: int = 1000):
    """Vocabulary build: the k most frequent lowercase tokens with
    counts. The classic wordcount shape done scale-right: each batch
    pre-aggregates its own token counts with one Arrow group_by
    (combiner), so the global shuffle carries (token, partial_count)
    uniques per batch instead of one row per token OCCURRENCE; the
    global groupby sums partials and a (count desc, token) sort +
    limit picks a deterministic top-k even across ties. Returns a
    Dataset[token:string, n:int64]."""
    import re as _re

    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    tok = _re.compile(TOKEN_RE)

    def partial_counts(b: pa.Table) -> pa.Table:
        toks = []
        for t in b[text_col].to_pylist():
            toks.extend(tok.findall(t.lower()))
        if not toks:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        t = pa.table({"token": pa.array(toks, pa.string())})
        g = t.group_by("token").aggregate([("token", "count")])
        return pa.table({"token": g["token"],
                         "n": g["token_count"].cast(pa.int64())})

    partial_counts.__name__ = "partial_token_counts"
    totals = (ds.select_columns([text_col])
              .map_batches(partial_counts, batch_format="pyarrow")
              .groupby("token").aggregate(Sum("n", alias_name="n_total")))
    out = totals.sort(["n_total", "token"], descending=[True, False]).limit(k)

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"token": b["token"],
                         "n": pc.cast(b["n_total"], pa.int64())})

    rename.__name__ = "rename_vocab_cols"
    return out.map_batches(rename, batch_format="pyarrow")


# ---- PII redaction (training-data scrubbing) ----
# Patterns are deliberately RE2-compatible (no lookaround/backrefs) and
# digit-classes explicit ([0-9], not \d) so the DuckDB oracle
# (regexp_replace ... 'g') and Python `re` agree byte-for-byte.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\+[0-9]{1,2} [0-9]{3} [0-9]{3} [0-9]{4}", "[PHONE]"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
]


class RedactPII:
    """Actor-pool stage: scrub emails / phone numbers / IPv4 addresses
    from a text column, counting replacements per kind. Patterns
    compile once per actor (__init__), applied in PII_PATTERNS order —
    email first so an address's host part is never half-eaten by the
    IP rule. Output: id, redacted text, one int64 count per kind."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re as _re2

        self.id_col, self.text_col = id_col, text_col
        self.pats = [(name, _re2.compile(pat), repl)
                     for name, pat, repl in PII_PATTERNS]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col]
        counts: dict[str, list[int]] = {n: [] for n, _, _ in self.pats}
        out_text = []
        for t in batch[self.text_col].to_pylist():
            for name, rx, repl in self.pats:
                t, n = rx.subn(repl, t)
                counts[name].append(n)
            out_text.append(t)
        cols = {self.id_col: ids,
                self.text_col: pa.array(out_text, pa.string())}
        for name, _, _ in self.pats:
            cols[f"n_{name}"] = pa.array(counts[name], pa.int64())
        return pa.table(cols)


def redact_pii(ds, *, id_col: str = "doc_id", text_col: str = "text",
               concurrency=None):
    """Distributed PII scrub: stateless per-batch task pool, no
    shuffle — the scrubbing stage every released text corpus runs
    before training. SQL-parity oracle: chained DuckDB regexp_replace
    with the same PII_PATTERNS."""
    from moonray.util import as_fn

    return ds.map_batches(as_fn(RedactPII(id_col=id_col, text_col=text_col)),
                          batch_format="pyarrow", concurrency=concurrency)


def redact_pii_oracle_sql(text_expr: str = "text") -> str:
    """DuckDB equivalent of redact_pii over ``text_expr`` (chained
    regexp_replace, counts via regexp_extract_all BEFORE each
    replacement, exactly the engine's sequential semantics)."""
    e_pat, p_pat, i_pat = (p for _, p, _ in PII_PATTERNS)
    return f"""
        WITH base AS (SELECT doc_id, {text_expr} AS t0 FROM documents),
        s1 AS (SELECT doc_id,
                      CAST(len(regexp_extract_all(t0, '{e_pat}')) AS BIGINT)
                          AS n_email,
                      regexp_replace(t0, '{e_pat}', '[EMAIL]', 'g') AS t1
               FROM base),
        s2 AS (SELECT doc_id, n_email,
                      CAST(len(regexp_extract_all(t1, '{p_pat}')) AS BIGINT)
                          AS n_phone,
                      regexp_replace(t1, '{p_pat}', '[PHONE]', 'g') AS t2
               FROM s1)
        SELECT doc_id,
               regexp_replace(t2, '{i_pat}', '[IP]', 'g') AS text,
               n_email,
               n_phone,
               CAST(len(regexp_extract_all(t2, '{i_pat}')) AS BIGINT) AS n_ipv4
        FROM s2
    """


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style, Rae et al. 2021 table A1)
# --------------------------------------------------------------------------

REP_MAX_DUP_LINE_PERMILLE = 300   # Gopher: duplicate line fraction ≤ 0.30
REP_MAX_DUP_CHAR_PERMILLE = 200   # Gopher: duplicate line char fraction ≤ 0.20


def repetition_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document line-repetition signals, SQL-exact integers:

    - ``n_lines``: non-empty lines (newline-split, trimmed of " \\t\\r")
    - ``n_distinct_lines``
    - ``dup_line_permille``: 1000 * duplicate-occurrence lines / lines
    - ``dup_char_permille``: 1000 * chars in duplicate occurrences /
      chars in all kept lines

    The boilerplate/spam gate of the Gopher rules (duplicate line
    fraction, duplicate line character fraction). Fully vectorized:
    arrow split + list_parent_indices, one 64-bit line hash, lexsort to
    find first occurrences — no per-document Python loop. Integer
    permille (floor) so the DuckDB oracle matches hash-for-hash, like
    QualityScore above."""
    import numpy as np
    import pyarrow.compute as pc

    from moonray.util import hash_key_array

    n_docs = len(batch)
    lines = pc.split_pattern(batch[text_col].combine_chunks(), "\n")
    flat = pc.list_flatten(lines)
    parent = pc.list_parent_indices(lines)
    trimmed = pc.utf8_trim(flat, " \t\r")
    keep = pc.not_equal(trimmed, "")
    par = parent.to_numpy(zero_copy_only=False)[
        keep.to_numpy(zero_copy_only=False)]
    kept = trimmed.filter(keep)
    lh = hash_key_array(kept)
    ln = pc.utf8_length(kept).to_numpy(zero_copy_only=False)

    order = np.lexsort((lh, par))
    sp, sl, sn = par[order], lh[order], ln[order]
    is_first = np.r_[True, (sp[1:] != sp[:-1]) | (sl[1:] != sl[:-1])] \
        if len(sp) else np.zeros(0, dtype=bool)
    n_lines = np.bincount(par, minlength=n_docs).astype(np.int64)
    n_distinct = np.bincount(sp[is_first], minlength=n_docs).astype(np.int64)
    dup_chars = np.bincount(sp[~is_first], weights=sn[~is_first],
                            minlength=n_docs).astype(np.int64)
    tot_chars = np.bincount(sp, weights=sn, minlength=n_docs).astype(np.int64)
    denom_l = np.maximum(n_lines, 1)
    denom_c = np.maximum(tot_chars, 1)
    return (batch
            .append_column("n_lines", pa.array(n_lines))
            .append_column("n_distinct_lines", pa.array(n_distinct))
            .append_column("dup_line_permille", pa.array(
                1000 * (n_lines - n_distinct) // denom_l))
            .append_column("dup_char_permille", pa.array(
                1000 * dup_chars // denom_c)))


def repetition_stats(ds, *, text_col: str = "text", concurrency=None):
    """documents Dataset → repetition-annotated Dataset (task pool;
    stateless, doc-local — no shuffle)."""
    def add(b: pa.Table) -> pa.Table:
        return repetition_stats_batch(b, text_col)

    add.__name__ = "repetition_stats"
    return ds.map_batches(add, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=1024)


def repetition_filter(ds, *, text_col: str = "text",
                      max_dup_line_permille: int = REP_MAX_DUP_LINE_PERMILLE,
                      max_dup_char_permille: int = REP_MAX_DUP_CHAR_PERMILLE,
                      concurrency=None):
    """Drop boilerplate/spammy documents by the Gopher repetition gates
    (both thresholds inclusive keeps)."""
    import pyarrow.compute as pc

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.and_(
            pc.less_equal(b["dup_line_permille"], max_dup_line_permille),
            pc.less_equal(b["dup_char_permille"], max_dup_char_permille)))

    return repetition_stats(ds, text_col=text_col,
                            concurrency=concurrency).map_batches(
        keep, batch_format="pyarrow")


def repetition_oracle_sql() -> str:
    """DuckDB equivalent of repetition_stats over the documents view
    (line split / trim / non-empty, first-occurrence accounting and
    integer permille all mirrored exactly)."""
    return r"""
        WITH raw AS (
          SELECT doc_id,
                 trim(unnest(string_split(text, chr(10))),
                      ' ' || chr(9) || chr(13)) AS line
          FROM documents
        ), lines AS (
          SELECT doc_id, line, length(line) AS n_ch,
                 row_number() OVER (PARTITION BY doc_id, line
                                    ORDER BY line) AS occ
          FROM raw WHERE line <> ''
        ), per AS (
          SELECT doc_id,
                 count(*) AS n_lines,
                 count(DISTINCT line) AS n_distinct_lines,
                 sum(CASE WHEN occ > 1 THEN n_ch ELSE 0 END) AS dup_chars,
                 sum(n_ch) AS tot_chars
          FROM lines GROUP BY doc_id
        )
        SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
               coalesce(p.n_lines, 0) AS n_lines,
               coalesce(p.n_distinct_lines, 0) AS n_distinct_lines,
               coalesce(1000 * (p.n_lines - p.n_distinct_lines)
                        // greatest(p.n_lines, 1), 0) AS dup_line_permille,
               coalesce(1000 * p.dup_chars
                        // greatest(p.tot_chars, 1), 0) AS dup_char_permille
        FROM documents d LEFT JOIN per p USING (doc_id)
    """


NG_TOP_THRESH_PERMILLE = {2: 200, 3: 180, 4: 160}  # Gopher table A1 gates


def ngram_repetition_batch(batch: pa.Table, text_col: str = "text",
                           ns: tuple = (2, 3, 4)) -> pa.Table:
    """Per-document top-n-gram character coverage (the word-level half
    of the Gopher repetition rules): for each n, the fraction of token
    characters covered by the most repetition-heavy n-gram —
    ``max over grams occurring ≥2 times of (count × gram_chars)``
    divided by total token chars, as integer permille. Docs built from
    one phrase stamped over and over score near 1000; natural text
    scores near 0.

    Tokens are TOKEN_RE words (same token space as QualityScore and the
    MinHash shingles). The heavy math is vectorized: one 64-bit token
    hash pass, sequence-sensitive rolling gram hashes (splitmix64
    chain), rolling char sums via cumsum, lexsort run-length counting,
    np.maximum.at per-doc reduction."""
    import numpy as np

    from moonray.util import hash_key_array, splitmix64

    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    # canonical lower-then-extract order (same as every SQL oracle and
    # dedup._shingle_set; tokenize-then-lower diverges on case folds)
    tok_lists = [re.findall(r"[a-z0-9]+", x.lower()) for x in texts]
    counts = np.array([len(t) for t in tok_lists], dtype=np.int64)
    flat = [t for toks in tok_lists for t in toks]
    th = (hash_key_array(pa.array(flat, pa.string())) if flat
          else np.empty(0, np.uint64))
    lens = np.array([len(t) for t in flat], dtype=np.int64)
    parent = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    tot_chars = np.bincount(parent, weights=lens,
                            minlength=n_docs).astype(np.int64)
    denom = np.maximum(tot_chars, 1)
    cs = np.concatenate([[0], np.cumsum(lens)])

    out = batch
    for n in ns:
        m = len(th) - n + 1
        acc = np.zeros(n_docs, dtype=np.int64)
        if m > 0:
            g = th[:m] * np.uint64(0x9E3779B97F4A7C15)
            for j in range(1, n):
                g = splitmix64(g) ^ th[j:j + m]
            gchars = (cs[n:] - cs[:-n]).astype(np.int64)
            valid = parent[:m] == parent[n - 1:]
            wp, wg, wc = parent[:m][valid], g[valid], gchars[valid]
            if len(wp):
                order = np.lexsort((wg, wp))
                sp, sg, sc = wp[order], wg[order], wc[order]
                run_start = np.flatnonzero(
                    np.r_[True, (sp[1:] != sp[:-1]) | (sg[1:] != sg[:-1])])
                run_len = np.diff(np.r_[run_start, len(sp)])
                covered = np.where(run_len >= 2,
                                   run_len * sc[run_start], 0)
                np.maximum.at(acc, sp[run_start], covered)
        out = out.append_column(f"top{n}gram_char_permille",
                                pa.array(1000 * acc // denom))
    return out


def ngram_repetition_stats(ds, *, text_col: str = "text", ns=(2, 3, 4),
                           concurrency=None):
    """documents Dataset → top-n-gram coverage columns (task pool,
    doc-local, no shuffle)."""
    def add(b: pa.Table) -> pa.Table:
        return ngram_repetition_batch(b, text_col, tuple(ns))

    add.__name__ = "ngram_repetition_stats"
    return ds.map_batches(add, batch_format="pyarrow",
                          concurrency=concurrency, batch_size=1024)


def ngram_repetition_filter(ds, *, text_col: str = "text",
                            thresholds: dict | None = None,
                            concurrency=None):
    """Drop documents breaching ANY top-n-gram gate (defaults: Gopher's
    0.20 / 0.18 / 0.16 for n = 2 / 3 / 4, inclusive keeps). Composes
    with repetition_filter (line gates) for the full rule set."""
    import pyarrow.compute as pc

    th = dict(NG_TOP_THRESH_PERMILLE if thresholds is None else thresholds)
    ns = tuple(sorted(th))

    def keep(b: pa.Table) -> pa.Table:
        mask = None
        for n in ns:
            part = pc.less_equal(b[f"top{n}gram_char_permille"], th[n])
            mask = part if mask is None else pc.and_(mask, part)
        return b.filter(mask)

    return ngram_repetition_stats(ds, text_col=text_col, ns=ns,
                                  concurrency=concurrency).map_batches(
        keep, batch_format="pyarrow")

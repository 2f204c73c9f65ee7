"""Batched model inference: a deterministic quality classifier.

Production corpus curation runs a learned quality model (a fastText /
logistic classifier in the CCNet / Gopher pipelines) over every
document. The container has no model runtimes, so the model here is a
logistic regression with FIXED published integer weights over the same
integer-permille text features the quality gates use — which keeps the
*inference pattern* real (weights loaded once per actor in
``__init__``, one vectorized feature pass + one dot product per batch)
while staying DuckDB-reproducible.

SQL-exactness doctrine: every feature is an INTEGER (permille / x10
fixed-point, floor division), the weights are integers, so the logit
``z_millis = w · x`` is an exact int64 on both sides and the decision
``quality_pred = (z_millis >= 0)`` has no float boundary at all. The
float sigmoid is exposed for ranking (``score`` column) but
deliberately excluded from the contract query — 1-ulp libm differences
between numpy and DuckDB would break an exact hash compare.

Features (oracle expressions in ``quality_classifier_oracle_sql``):
  n_tok_cap   = least(n_tokens_lowered, 500)
  sw_permille = 1000 * en_stopword_hits // max(1, n_tokens_lowered)
  uq_permille = 1000 * unique_tokens    // max(1, n_tokens_lowered)
  mtl_x10     = 10 * alnum_chars        // max(1, n_tokens_lowered)
  punct_permille = 1000 * punct_count   // max(1, length(text))
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# published model: intercept + 5 integer weights (millis per feature
# unit). Chosen so the synthetic fixture corpus splits on real quality
# axes: length helps, stopword mass in the natural-language band helps,
# boilerplate (low uniqueness) and punctuation spam hurt.
QC_WEIGHTS = {
    "intercept": -2400,
    "n_tok_cap": 6,          # up to +3000 at the 500-token cap
    "sw_permille": 10,       # natural language carries stopwords
    "uq_permille": 2,        # de-boilerplate
    "mtl_x10": -8,           # runaway mean token length = junk/code
    "punct_permille": -12,   # punctuation spam
}


def _features(texts: pa.ChunkedArray | pa.Array) -> dict[str, np.ndarray]:
    from moonray.functions.text import _token_stats_columns

    (_n_raw, n_low, uniq, punct, token_chars, low,
     scores) = _token_stats_columns(texts, lang_scores=False)
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    import pyarrow.compute as pc
    n_chars = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
    denom = np.maximum(1, n_low)
    return {
        "n_tok_cap": np.minimum(n_low, 500),
        "sw_permille": 1000 * scores[:, 0] // denom,
        "uq_permille": 1000 * uniq // denom,
        "mtl_x10": 10 * token_chars // denom,
        "punct_permille": 1000 * punct // np.maximum(1, n_chars),
    }


class QualityClassifier:
    """map_batches actor stage: loads the model once (``__init__``),
    scores whole batches vectorized (``__call__``). Adds
    z_millis (int64 logit), quality_pred (int64 decision) and score
    (float64 sigmoid, ranking only — see module doctrine)."""

    def __init__(self, weights: dict | None = None):
        w = dict(QC_WEIGHTS if weights is None else weights)
        self._b = np.int64(w.pop("intercept"))
        self._names = sorted(w)
        self._w = np.array([w[k] for k in self._names], dtype=np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        texts = batch["text"].combine_chunks()
        # NULL text → NULL logit/decision/score (SQL semantics: every
        # oracle feature expression is NULL-propagating). Compute on
        # nulls filled with '' and mask the outputs — the polars count
        # kernels would otherwise yield NaN that int64-casts to garbage.
        null_mask = None
        if texts.null_count:
            null_mask = pc.is_null(texts).to_numpy(zero_copy_only=False)
            texts = pc.fill_null(texts, "")
        f = _features(texts)
        X = np.stack([f[k].astype(np.int64) for k in self._names], axis=1)
        z = X @ self._w + self._b
        # saturate past ±60 sigma — sigmoid is 1.0/0.0 to the ulp there
        score = 1.0 / (1.0 + np.exp(-np.clip(z / 1000.0, -60.0, 60.0)))
        return (batch
                .append_column("z_millis",
                               pa.array(z, pa.int64(), mask=null_mask))
                .append_column("quality_pred",
                               pa.array((z >= 0).astype(np.int64),
                                        mask=null_mask))
                .append_column("score", pa.array(score, pa.float64(),
                                                 mask=null_mask)))


def quality_classifier_scores(ds, *, concurrency=None, batch_size=1024):
    """documents Dataset → classifier-annotated Dataset (actor pool:
    model weights live once per actor)."""
    return ds.map_batches(QualityClassifier, batch_format="pyarrow",
                          concurrency=concurrency or (1, 8),
                          batch_size=batch_size)


def quality_classifier_oracle_sql(table: str = "documents") -> str:
    """Integer-exact DuckDB oracle for (doc_id, z_millis, quality_pred);
    the float score column is intentionally not part of the contract."""
    from moonray.functions.text import LANG_STOPWORDS

    toks = "regexp_extract_all(lower(text), '[a-z0-9]+')"
    sw = (f"len(list_filter({toks}, x -> x IN "
          f"{tuple(LANG_STOPWORDS['en'])!r}))")
    w = QC_WEIGHTS
    return f"""
        WITH f AS (
          SELECT doc_id,
            least(len({toks}), 500) AS n_tok_cap,
            1000 * {sw} // greatest(1, len({toks})) AS sw_permille,
            1000 * len(list_distinct({toks}))
                 // greatest(1, len({toks})) AS uq_permille,
            10 * length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g'))
               // greatest(1, len({toks})) AS mtl_x10,
            1000 * len(regexp_extract_all(text, '[.,;:!?]'))
                 // greatest(1, length(text)) AS punct_permille
          FROM {table})
        SELECT doc_id,
               {w['intercept']}
                 + {w['n_tok_cap']} * n_tok_cap
                 + {w['sw_permille']} * sw_permille
                 + {w['uq_permille']} * uq_permille
                 + {w['mtl_x10']} * mtl_x10
                 + {w['punct_permille']} * punct_permille AS z_millis,
               CAST(z_millis >= 0 AS BIGINT) AS quality_pred
        FROM f
    """

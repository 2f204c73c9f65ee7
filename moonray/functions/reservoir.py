"""Exact-k distributed sampling (uniform and weighted), deterministic.

`functions/sample.py` draws FRACTIONS (stateless hash filters — the
right tool for mixture ratios); training-data pipelines also need
EXACT-k draws: "give me exactly 100k eval documents, reproducibly, at
any cluster size". Both variants here are priority samples, so they
distribute as algebraic bottom-k/top-k (every batch reduces to ≤ k
rows before the single-group merge — the same partial-reduce shape as
functions/topk) and are pure functions of (corpus, seed):

- ``uniform_sample_exact``: priority = splitmix64(hash(key) ^ seed),
  keep the k SMALLEST — a deterministic "bottom-k sketch" draw,
  uniform over distinct keys.
- ``weighted_sample_exact``: Efraimidis–Spirakis (2006) weighted
  sampling without replacement — u = hash-uniform in (0,1), priority
  = log(u)/w (the order-equivalent log form of the textbook u^(1/w),
  immune to its large-weight rounding collapse at 1.0), keep the k
  LARGEST. Inclusion probability scales with weight; weight ≤ 0 rows
  are excluded.

Exactness: when the corpus has ≥ k qualifying rows, exactly k return.
Ties are impossible for distinct keys (64-bit injective-by-construction
priorities); duplicate keys share a priority, so uniqueness of
``key_col`` is the caller's contract (assert with
functions/validate.check_constraints when in doubt).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import hash_key_array, splitmix64


def _priorities(col, seed: int) -> np.ndarray:
    h = splitmix64(hash_key_array(col)
                   ^ np.uint64(seed & ((1 << 64) - 1)))
    return h


def _bottomk_stage(ds, k: int, score_fn, ascending: bool):
    """Per-batch partial ≤k rows by score, then one final merge —
    the exchange carries ≤ k rows per batch."""
    clash = {"_pri", "_g"} & set(ds.schema().names or [])
    if clash:
        raise ValueError(f"input already has reserved column(s) "
                         f"{sorted(clash)}")

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return b.append_column("_pri", pa.array([], pa.float64()))
        pri = score_fn(b)
        valid = np.flatnonzero(~np.isnan(pri))  # NaN = excluded row
        order = valid[np.argsort(pri[valid], kind="stable")]
        keep = order[:k] if ascending else order[::-1][:k]
        keep = np.sort(keep)
        return b.take(pa.array(keep)).append_column(
            "_pri", pa.array(pri[keep], pa.float64()))

    partial.__name__ = "partial_bottomk"

    def final(grp: pa.Table) -> pa.Table:
        pri = grp["_pri"].to_numpy(zero_copy_only=False)
        keep = np.argsort(pri, kind="stable")
        keep = keep[:k] if ascending else keep[::-1][:k]
        return grp.take(pa.array(np.sort(keep))).drop_columns(["_pri", "_g"])

    final.__name__ = "final_bottomk"

    def tag(b: pa.Table) -> pa.Table:
        return b.append_column("_g", pa.array(np.zeros(len(b), np.int8)))

    tag.__name__ = "tag_const_group"
    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("_g").map_groups(final, batch_format="pyarrow"))


def uniform_sample_exact(ds, k: int, key_col: str, *, seed: int = 0):
    """Exactly min(k, n) rows, uniform over distinct keys,
    deterministic in (corpus, seed) at any partitioning."""

    def score(b: pa.Table) -> np.ndarray:
        # float64 of a 64-bit hash keeps 53 significant bits — ties
        # across DISTINCT keys would need a 2^-53 collision; accepted
        # and disclosed (the draw stays deterministic either way)
        return _priorities(b[key_col], seed).astype(np.float64)

    return _bottomk_stage(ds, k, score, ascending=True)


def uniform_sample_per_group(ds, k: int, key_col: str, group_col: str, *,
                             seed: int = 0):
    """Exactly min(k, group size) rows PER GROUP (stratified exact-k):
    the same deterministic bottom-k priorities, selected group-wise
    through the algebraic group-top-k kernel — the exchange carries
    ≤ k rows per group per batch."""
    from moonray.functions.topk import top_k_per_group

    if "_pri" in (ds.schema().names or []):
        raise ValueError("input already has a '_pri' column (reserved)")

    def add_pri(b: pa.Table) -> pa.Table:
        # bit-shift keeps order and stays positive in int64; negate so
        # top-k-DESC selects the SMALLEST priorities
        pri = (_priorities(b[key_col], seed) >> np.uint64(1)) \
            .astype(np.int64)
        return b.append_column("_pri", pa.array(-pri))

    add_pri.__name__ = "add_sample_priority"
    out = top_k_per_group(ds.map_batches(add_pri, batch_format="pyarrow"),
                          group=group_col, by="_pri", tie=key_col, k=k)
    return out.drop_columns(["_pri"])


def weighted_sample_exact(ds, k: int, key_col: str, weight_col: str, *,
                          seed: int = 0):
    """Efraimidis–Spirakis without replacement: P(i in sample) grows
    with weight_col; rows with weight <= 0 or null never selected."""

    def score(b: pa.Table) -> np.ndarray:
        h = _priorities(b[key_col], seed)
        # uniform in (0,1): +0.5 keeps u strictly inside the interval
        u = (h.astype(np.float64) + 0.5) / 2.0 ** 64
        w = b[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        w = np.where(np.isfinite(w) & (w > 0), w, np.nan)
        # log-space priority log(u)/w — the same order as the textbook
        # u**(1/w) (log is monotone), WITHOUT its large-weight rounding
        # collapse: for w where 1/w underflows, u**(1/w) rounds to
        # exactly 1.0 for many distinct u and the resulting ties break
        # by block arrival order (non-deterministic under Ray); the
        # ratio keeps full float resolution, preserving the
        # pure-function-of-(corpus, seed) guarantee
        with np.errstate(invalid="ignore"):
            return np.log(u) / w  # NaN marks excluded rows

    return _bottomk_stage(ds, k, score, ascending=False)

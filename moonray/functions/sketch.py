"""Distributed cardinality + quantile statistics (exact baselines and
mergeable-sketch scale paths).

The reference keeps per-table aggregates as internal state (zone stats,
src/moonlink/src/storage/mooncake_table.rs snapshot counters); a
training-data engine needs corpus-level statistics as first-class
operators. Doctrine mirrors functions/dedup.py: every approximate scale
path ships next to an exact baseline the oracle can check.

- ``distinct_count_exact``: hash-partitioned exact COUNT(DISTINCT) —
  per-batch ``np.unique`` combiner shrinks the shuffle to one row per
  (batch, value), a groupby dedups globally, a count finishes. The
  shuffle is ∝ distinct values, never ∝ rows.
- ``distinct_count_hll``: HyperLogLog (Flajolet et al. 2007, with the
  small-range linear-counting correction) — per batch a 2^p-register
  partial (one ``np.maximum.reduceat`` pass), one tiny row per batch to
  the driver, registers fold by max. Constant memory at any row count;
  the standard mergeable-sketch answer at 100 TB.
- ``quantiles_cents_exact``: exact distributed quantiles over a
  bounded integer domain (cents): groupby value → counts (shuffle ∝
  domain size, ≤ ~100k rows regardless of data size), driver cumsum →
  ``percentile_disc`` semantics, bit-exact vs SQL.
- ``quantiles_sampled``: deterministic hash-sampled quantiles for
  unbounded domains — rows kept when splitmix64(key) clears a rate
  threshold, exact quantile over the sample; error bound pinned by
  test (ε ~ 1/sqrt(sample), Hoeffding).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import splitmix64


# ----------------------------------------------------------- distinct


def distinct_count_exact(ds, col: str, out_col: str | None = None):
    """Exact distinct count of ``col``; returns a 1-row Dataset
    ``{out_col: n}``. Partial-dedup inside map_batches, global dedup via
    groupby, then a count-rows aggregate — never materializes values on
    the driver."""
    out_col = out_col or f"n_{col}"

    def uniq(b: pa.Table) -> pa.Table:
        # Arrow-native dedup: keeps the column type exact (a numpy
        # detour coerces nullable int64 → float64, crashing on nulls and
        # collapsing distinct keys above 2^53). Nulls drop, matching
        # SQL COUNT(DISTINCT).
        import pyarrow.compute as pc

        v = pc.unique(b[col].combine_chunks().drop_null())
        return pa.table({col: v})

    uniq.__name__ = "partial_unique"
    import ray.data as rd
    from ray.data.aggregate import Count

    deduped = (ds.map_batches(uniq, batch_format="pyarrow")
               .groupby(col).aggregate(Count(alias_name="_c")))
    n = deduped.count()
    return rd.from_arrow(pa.table({out_col: pa.array([n], pa.int64())}))


def _hll_registers(vals: np.ndarray, p: int,
                   prehashed: bool = False) -> np.ndarray:
    """One HLL partial: register index = top p hash bits, rank =
    leading-zero run of the remaining (64-p)-bit field + 1 (Flajolet et
    al. 2007). p ≥ 11 keeps the remainder under 2^53, so the float64
    log2 is EXACT — no lossy 64-bit float trick. The fold is a sort +
    one ``np.maximum.reduceat`` pass, all vectorized. ``prehashed``:
    vals are already uniform uint64 hashes (hash_key_array output)."""
    if p < 11:
        raise ValueError("p >= 11 keeps the remainder field float64-exact")
    m = 1 << p
    h = vals if prehashed else splitmix64(vals.astype(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = (h & np.uint64((1 << (64 - p)) - 1)).astype(np.int64)
    rank = np.full(len(w), 64 - p + 1, dtype=np.uint8)
    nz = w > 0
    rank[nz] = (64 - p - np.floor(
        np.log2(w[nz].astype(np.float64))).astype(np.int64)).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    if len(idx):
        order = np.argsort(idx, kind="stable")
        idx_s, rank_s = idx[order], rank[order]
        starts = np.flatnonzero(np.r_[True, idx_s[1:] != idx_s[:-1]])
        regs[idx_s[starts]] = np.maximum.reduceat(rank_s, starts)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)  # large-m constant; p >= 11 enforced
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting, small range
    return float(est)


def distinct_count_hll(ds, col: str, p: int = 12, out_col: str | None = None):
    """HyperLogLog approximate distinct count (σ ≈ 1.04/sqrt(2^p); p=12 →
    ~1.6%). One 4 KiB register row per input block reaches the driver;
    registers fold by elementwise max (the sketch's merge is exact, so
    the result is identical to single-machine HLL over the same rows)."""
    out_col = out_col or f"n_{col}_approx"

    def partial(b: pa.Table) -> pa.Table:
        # hash_key_array handles any key type (int fast path, string via
        # polars/blake2b) and a null-free Arrow slice keeps ints exact
        from moonray.util import hash_key_array

        h = hash_key_array(b[col].combine_chunks().drop_null())
        regs = _hll_registers(h, p, prehashed=True)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    partial.__name__ = "hll_partial"
    import ray.data as rd

    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    # tiny driver fold: one 2^p-byte row per block, not per input row
    for batch in (ds.map_batches(partial, batch_format="pyarrow")
                  .iter_batches(batch_format="pyarrow")):
        for blob in batch["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
    est = int(round(_hll_estimate(regs)))
    return rd.from_arrow(pa.table({out_col: pa.array([est], pa.int64())}))


# ----------------------------------------------------------- quantiles


def quantiles_cents_exact(ds, col: str, qs: tuple[float, ...] = (0.5, 0.9, 0.99)):
    """Exact ``percentile_disc`` over floor(col*100+0.5) cents.

    Scale shape: the groupby shuffle carries one row per distinct cent
    value per batch (bounded by the value DOMAIN, not the row count);
    the driver touches only the ≤domain-sized (value, count) table.
    Returns rows (q, value_cents) with q as exact string keys so the
    oracle can join on them."""
    import pyarrow.compute as pc

    def to_cents(b: pa.Table) -> pa.Table:
        cents = np.floor(b[col].to_numpy(zero_copy_only=False) * 100
                         + 0.5).astype(np.int64)
        t = pa.table({"cents": pa.array(cents, pa.int64())})
        g = t.group_by("cents", use_threads=False).aggregate(
            [("cents", "count", pc.CountOptions(mode="all"))])
        return pa.table({"cents": g["cents"],
                         "n": g["cents_count"].cast(pa.int64())})

    to_cents.__name__ = "cents_counts"
    from ray.data.aggregate import Sum

    counts = (ds.map_batches(to_cents, batch_format="pyarrow")
              .groupby("cents").aggregate(Sum("n", alias_name="n")))
    t = counts.to_arrow_refs()
    import ray
    import ray.data as rd

    tbl = pa.concat_tables([ray.get(r) for r in t]).sort_by("cents")
    vals = tbl["cents"].to_numpy(zero_copy_only=False)
    cum = np.cumsum(tbl["n"].to_numpy(zero_copy_only=False))
    total = int(cum[-1]) if len(cum) else 0
    out_q, out_v = [], []
    for q in qs:
        # percentile_disc: smallest value with cume_dist >= q
        rank = int(np.ceil(q * total)) if total else 0
        pos = int(np.searchsorted(cum, max(rank, 1), side="left"))
        out_q.append(f"{q:g}")
        out_v.append(int(vals[pos]) if total else None)
    return rd.from_arrow(pa.table({"q": pa.array(out_q, pa.string()),
                                   "value_cents": pa.array(out_v, pa.int64())}))


def quantiles_sampled(ds, col: str, key_col: str,
                      qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                      rate: float = 0.1):
    """Approximate quantiles via deterministic hash sampling: keep rows
    where splitmix64(key) < rate (reproducible across runs/cluster
    sizes), exact quantile over the sample. ε ≈ sqrt(ln(2/δ)/2n) rank
    error — the unbounded-domain scale path where cents-domain exact
    doesn't apply."""
    thr = np.uint64(min(int(rate * (1 << 64)), (1 << 64) - 1))
    keep_all = rate >= 1.0

    def sample(b: pa.Table) -> pa.Table:
        from moonray.util import hash_key_array

        keep = (np.ones(len(b), bool) if keep_all
                else hash_key_array(b[key_col]) < thr)
        return pa.table({col: pa.array(
            b[col].to_numpy(zero_copy_only=False)[keep])})

    sample.__name__ = "hash_sample"
    import ray
    import ray.data as rd

    refs = ds.map_batches(sample, batch_format="pyarrow").to_arrow_refs()
    vals = np.sort(np.concatenate(
        [ray.get(r)[col].to_numpy(zero_copy_only=False) for r in refs]
        or [np.array([], dtype=np.float64)]))
    out_q, out_v = [], []
    for q in qs:
        out_q.append(f"{q:g}")
        if len(vals):
            pos = min(int(np.ceil(q * len(vals))) - 1, len(vals) - 1)
            out_v.append(float(vals[max(pos, 0)]))
        else:
            out_v.append(None)
    return rd.from_arrow(pa.table({"q": pa.array(out_q, pa.string()),
                                   "value": pa.array(out_v, pa.float64())}))


def distinct_count_exact_by(ds, group_col: str, col: str,
                            out_col: str | None = None):
    """Exact per-group COUNT(DISTINCT col): per-batch (group, value)
    pair dedup shrinks the shuffle to distinct pairs per batch, one
    groupby dedups globally, a second tiny groupby counts per group."""
    out_col = out_col or f"n_{col}"

    def uniq_pairs(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null VALUES drop (SQL count(DISTINCT) ignores them) but null
        # GROUP KEYS survive as their own group. Known divergence from
        # SQL GROUP BY: a group whose values are ALL null disappears
        # instead of reporting 0 (a join-style count).
        t = b.select([group_col, col]).filter(pc.is_valid(b[col]))
        return t.group_by([group_col, col], use_threads=False).aggregate([])

    uniq_pairs.__name__ = "partial_unique_pairs"
    from ray.data.aggregate import Count

    pairs = (ds.map_batches(uniq_pairs, batch_format="pyarrow")
             .groupby([group_col, col]).aggregate(Count(alias_name="_c"))
             .drop_columns(["_c"]))
    return pairs.groupby(group_col).aggregate(Count(alias_name=out_col))


def distinct_count_hll_by(ds, group_col: str, col: str, p: int = 12,
                          out_col: str | None = None):
    """Per-group HyperLogLog: each batch emits ONE register row per
    group present in it (2^p bytes each); a groupby folds registers by
    elementwise max inside map_groups. Constant memory per group at any
    row count — the grouped-cardinality sketch for wide key domains
    where exact per-group dedup would shuffle too many pairs."""
    out_col = out_col or f"n_{col}_approx"

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from moonray.util import hash_key_array

        # null values drop; null group keys survive (see uniq_pairs)
        t = b.select([group_col, col]).filter(pc.is_valid(b[col]))
        if len(t) == 0:
            return pa.table({group_col: pa.array([], b.schema.field(group_col).type),
                             "regs": pa.array([], pa.binary())})
        keys = t[group_col].combine_chunks()
        h = hash_key_array(t[col])
        import pyarrow.compute as pc

        order = pc.sort_indices(keys)
        keys_np = keys.take(order)
        h = h[order.to_numpy(zero_copy_only=False)]
        grp = keys_np.to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, grp[1:] != grp[:-1]])
        ends = np.r_[starts[1:], len(grp)]
        out_k, out_r = [], []
        for s, e in zip(starts, ends):
            out_k.append(grp[s])
            out_r.append(_hll_registers(h[s:e], p, prehashed=True).tobytes())
        return pa.table({group_col: pa.array(out_k, b.schema.field(group_col).type),
                         "regs": pa.array(out_r, pa.binary())})

    partial.__name__ = "hll_partial_by"

    def fold(grp: pa.Table) -> pa.Table:
        m = 1 << p
        regs = np.zeros(m, dtype=np.uint8)
        for blob in grp["regs"].to_pylist():
            regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
        return pa.table({
            group_col: grp[group_col].slice(0, 1),
            out_col: pa.array([int(round(_hll_estimate(regs)))], pa.int64()),
        })

    fold.__name__ = "hll_fold"
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col).map_groups(fold, batch_format="pyarrow"))

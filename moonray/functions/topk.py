"""Group-wise top-k — the distributed window-function pattern
(row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k).

Doctrine: top-k is algebraic, so every batch first reduces itself to at
most k rows PER GROUP (vectorized lexsort + segment-rank, no Python
loop), and only those survivors enter the groupby shuffle — the
exchange carries O(groups × k) rows per batch, never the corpus. The
final per-group merge re-runs the identical selection on ≤ k×n_blocks
rows. Ties break on the ``tie`` column ascending so results are total
and SQL-reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _topk_table(t: pa.Table, group: str, by: str, tie: str, k: int) -> pa.Table:
    """Keep the top-k rows per group ordered by (by DESC, tie ASC) —
    one lexsort + one segment-rank pass, vectorized."""
    if len(t) == 0:
        return t
    g = t[group].to_numpy(zero_copy_only=False)
    v = t[by].to_numpy(zero_copy_only=False)
    u = t[tie].to_numpy(zero_copy_only=False)
    # descending 'by' via dense-rank inversion — unary negation would
    # silently wrap unsigned dtypes (0 ranks top) and reject strings
    _, inv = np.unique(v, return_inverse=True)
    desc = inv.max() - inv
    # lexsort keys, last is primary: group asc, value desc, tie asc
    order = np.lexsort((u, desc, g))
    g_s = g[order]
    new_grp = np.r_[True, g_s[1:] != g_s[:-1]]
    seg_start = np.maximum.accumulate(np.where(new_grp, np.arange(len(g_s)), 0))
    rank = np.arange(len(g_s)) - seg_start  # 0-based rank within group
    return t.take(pa.array(order[rank < k]))


def top_k_per_group(ds, group: str, by: str, tie: str, k: int = 5,
                    final_fn=None):
    """Top-k rows per group by ``by`` DESC (ties → ``tie`` ASC).
    Per-batch partial top-k → groupby(group) → final top-k.
    ``final_fn(grp) -> pa.Table`` replaces the final per-group pass
    when the caller wants to fuse extra work into the same groupby
    (e.g. ann_join's rank assignment) — it receives one group's rows
    (already partial-reduced) and owns the top-k selection."""

    def partial(b: pa.Table) -> pa.Table:
        return _topk_table(b, group, by, tie, k)

    partial.__name__ = "partial_topk"

    def final(grp: pa.Table) -> pa.Table:
        return _topk_table(grp, group, by, tie, k)

    final.__name__ = "final_topk"
    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(group).map_groups(final_fn or final,
                                       batch_format="pyarrow"))

"""Distributed connected components over an edge Dataset.

The near-dup operators (minhash_lsh_dedup, phash_near_dups,
embedding LSH) end with "collapse verified pairs into clusters". At
test scale a driver-side union-find is fine; at 100 TB the verified
pair set itself can be billions of rows (web corpora hold huge
duplicate families), so the collapse must be distributed too. This is
the scale path: BSP min-label propagation —

    label(v) ← min(label(v), min over neighbors u of label(u))

iterated to a fixed point. Each round is two thin hash shuffles
(co-partition labels with edge endpoints, then a min-aggregate by
node); every row that moves is a pair of int64s. Rounds needed equal
the maximum cluster DIAMETER — near-dup clusters are star-/clique-like
(every member overlaps a common template), so diameter is small; the
``max_iters`` guard raises rather than silently returning a
half-converged labeling. Convergence is detected from the per-round
SUM of labels: labels only ever decrease, so an unchanged sum is a
fixed point — one cheap aggregate, no old-vs-new join.

Reference context: moonlink has no graph stage (its dedup is
key-identity, merge.rs winners); this operator serves the
training-data pipeline additions in the task brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import default_buckets


def _hash_bucket(col: pa.ChunkedArray | pa.Array, n: int) -> pa.Array:
    """splitmix64 bucket of an int64 id column (must match across the
    label and edge streams so co-partitioning lines up)."""
    x = np.asarray(col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                   else col).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return pa.array((x % np.uint64(n)).astype(np.int32))


def connected_components(edges, *, a_col: str = "a", b_col: str = "b",
                         max_iters: int = 32, buckets: int | None = None):
    """Compute connected components of the undirected graph given by an
    edge Dataset. Returns a Dataset of ``(id, component)`` — one row per
    distinct node, ``component`` = the minimum node id in its component
    (the same canonical representative the driver union-find picks, so
    the two paths are interchangeable and parity-testable).

    Scale contract: per round, the data in motion is (|E| + |V|) thin
    int64 pairs through two hash shuffles; the driver sees one float
    per round (the label sum). Skewed hub nodes are bounded by the
    bucket fan-out (a bucket holds *hash-of-node* groups, and the
    per-bucket kernel is vectorized over runs, not per-node Python).
    """
    import ray.data as rd

    n_buckets = buckets or default_buckets()

    # ---- symmetrize edges once; drop self-loops ----------------------
    def sym(t: pa.Table) -> pa.Table:
        a = np.asarray(t[a_col].combine_chunks()
                       if isinstance(t[a_col], pa.ChunkedArray)
                       else t[a_col]).astype(np.int64)
        b = np.asarray(t[b_col].combine_chunks()
                       if isinstance(t[b_col], pa.ChunkedArray)
                       else t[b_col]).astype(np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"node": pa.array(np.concatenate([a, b])),
                         "nbr": pa.array(np.concatenate([b, a]))})

    sym.__name__ = "symmetrize_edges"
    e = edges.map_batches(sym, batch_format="pyarrow").materialize()
    if e.count() == 0:
        return rd.from_arrow(pa.table({"id": pa.array([], pa.int64()),
                                       "component": pa.array([], pa.int64())}))

    # ---- initial labels: label(v) = v, one row per distinct node -----
    def node_ids(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(t["node"])
        return pa.table({"id": u, "lab": u})

    node_ids.__name__ = "init_labels"

    def bucket_of(col_name):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("_bkt", _hash_bucket(t[col_name], n_buckets))

        f.__name__ = f"bucket_{col_name}"
        return f

    def dedup_ids(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = pc.unique(g["id"])
        return pa.table({"id": u, "lab": u})

    dedup_ids.__name__ = "dedup_node_ids"
    labels = (e.map_batches(node_ids, batch_format="pyarrow")
              .map_batches(bucket_of("id"), batch_format="pyarrow")
              .groupby("_bkt").map_groups(dedup_ids, batch_format="pyarrow")
              .materialize())

    # ---- iterate to fixed point --------------------------------------
    def propagate(g: pa.Table) -> pa.Table:
        """One co-partitioned bucket holding label rows (kind=1, with
        lab) and edge rows (kind=0, with nbr) of the same node-hash
        range: look up each edge row's node label vectorized
        (searchsorted over the bucket's sorted label ids) and emit
        (nbr, lab) messages plus the (id, lab) self-messages."""
        kind = g["_k"].to_numpy(zero_copy_only=False)
        node = g["_n"].to_numpy(zero_copy_only=False)
        val = g["_v"].to_numpy(zero_copy_only=False)
        is_lab = kind == 1
        lab_ids, lab_vals = node[is_lab], val[is_lab]
        order = np.argsort(lab_ids)
        lab_ids, lab_vals = lab_ids[order], lab_vals[order]
        en, ev = node[~is_lab], val[~is_lab]   # edge rows: _v = nbr
        pos = np.searchsorted(lab_ids, en)
        # every edge endpoint has a label row by construction
        msg_lab = lab_vals[pos]
        return pa.table({
            "id": pa.array(np.concatenate([ev, lab_ids])),
            "lab": pa.array(np.concatenate([msg_lab, lab_vals])),
        })

    propagate.__name__ = "propagate_labels"

    def min_by_id(g: pa.Table) -> pa.Table:
        t = g.sort_by([("id", "ascending"), ("lab", "ascending")])
        ids = t["id"].to_numpy(zero_copy_only=False)
        labs = t["lab"].to_numpy(zero_copy_only=False)
        first = np.ones(len(ids), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        return pa.table({"id": pa.array(ids[first]),
                         "lab": pa.array(labs[first])})

    min_by_id.__name__ = "min_label_by_id"

    def tag_labels(t: pa.Table) -> pa.Table:
        return pa.table({"_k": pa.array(np.ones(len(t), np.int8)),
                         "_n": t["id"], "_v": t["lab"],
                         "_bkt": _hash_bucket(t["id"], n_buckets)})

    def tag_edges(t: pa.Table) -> pa.Table:
        return pa.table({"_k": pa.array(np.zeros(len(t), np.int8)),
                         "_n": t["node"], "_v": t["nbr"],
                         "_bkt": _hash_bucket(t["node"], n_buckets)})

    tag_labels.__name__ = "tag_label_rows"
    tag_edges.__name__ = "tag_edge_rows"

    def lane_sums(t: pa.Table) -> pa.Table:
        """Per-block label sum in four 16-bit lanes: a direct int64 SUM
        of 63-bit hash labels overflows (Ray falls back to pickled
        Python objects); each lane total stays < n·2¹⁶, exact in int64
        to ~10¹⁴ nodes, and the driver recombines the exact big-int."""
        lab = t["lab"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table({
            f"l{i}": pa.array(
                [int(((lab >> np.uint64(16 * i))
                      & np.uint64(0xFFFF)).sum(dtype=np.uint64))],
                pa.int64())
            for i in range(4)})

    lane_sums.__name__ = "label_lane_sums"

    def exact_label_sum(lab_ds) -> int:
        s = lab_ds.map_batches(lane_sums, batch_format="pyarrow").sum(
            ["l0", "l1", "l2", "l3"])
        return sum(s[f"sum(l{i})"] << (16 * i) for i in range(4))

    prev_sum = None
    for _round in range(max_iters):
        merged = (labels.map_batches(tag_labels, batch_format="pyarrow")
                  .union(e.map_batches(tag_edges, batch_format="pyarrow")))
        msgs = merged.groupby("_bkt").map_groups(propagate,
                                                 batch_format="pyarrow")
        labels = (msgs.map_batches(bucket_of("id"), batch_format="pyarrow")
                  .groupby("_bkt").map_groups(min_by_id,
                                              batch_format="pyarrow")
                  .materialize())
        # labels only decrease → unchanged sum ⟺ fixed point
        cur_sum = exact_label_sum(labels)
        if cur_sum == prev_sum:
            return labels.map_batches(
                lambda t: t.rename_columns(["id", "component"]),
                batch_format="pyarrow")
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "cluster diameter exceeds the bound; raise max_iters")

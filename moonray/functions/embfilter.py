"""Embedding label-consistency curation (noisy-label pruning).

LAION/DataComp-style corpus curation scores each (item, label/caption)
pair by how well the item's embedding agrees with its assigned class,
and drops low-agreement pairs (mislabeled / mismatched captions). With
no CLIP in the container, the deterministic equivalent over the
``embeddings`` table is centroid agreement: cosine(v, mean vector of
v's own label). Everything is two streaming passes:

1. centroid pass — per batch, per-label partial (sum-vector, count)
   rows; the exchange is O(batches × labels) thin rows (vector sums in
   float64), folded into per-label mean centroids. Labels are a small
   domain (classes), so the fold lands on the driver like every other
   broadcast-side build in this repo.
2. score pass — centroid matrix broadcast into the map tasks (a few
   KiB; shipped once per task by closure capture), one float64 matmul
   per batch: cos(v_i, C[label_i]) vectorized for the whole batch.

The drop rule (cos < threshold) is row-local given the centroids, so
the filter composes with any downstream pipeline without a shuffle.

SQL-oracle notes: both sides compute in float64; DuckDB associates
sums differently than numpy, so scores agree to ~1e-14 relative — the
contract query outputs the integer decision set (vec_id, label) with a
threshold chosen away from any score (same doctrine as
functions/dedup.semantic_dedup)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import list_to_matrix


def _label_centroids(ds, emb_col: str, label_col: str) -> dict[int, np.ndarray]:
    """Per-label mean vectors (float64). One streaming pass; the
    shuffle carries one (label, sum, n) row per batch per label."""

    def partials(b: pa.Table) -> pa.Table:
        # NULL labels: drop up front (matches the SQL oracle's equi-join
        # on lab, which excludes NULL-label rows). Without this,
        # to_numpy turns the null into NaN and astype(int64) into an
        # arbitrary sentinel that silently pollutes some real label's
        # centroid.
        if b[label_col].null_count:
            b = b.filter(pa.compute.is_valid(b[label_col]))
        if len(b) == 0:  # empty blocks (repartition, DV-emptied frags)
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "svec": pa.array([], pa.list_(pa.float64()))})
        m = list_to_matrix(b[emb_col], dtype=np.float64)
        lab = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(lab, kind="stable")
        ls = lab[order]
        starts = np.r_[0, np.flatnonzero(ls[1:] != ls[:-1]) + 1]
        sums = np.add.reduceat(m[order], starts, axis=0)
        ns = np.diff(np.r_[starts, len(ls)])
        return pa.table({
            "label": pa.array(ls[starts]),
            "n": pa.array(ns.astype(np.int64)),
            "svec": pa.array(list(sums), pa.list_(pa.float64())),
        })

    partials.__name__ = "centroid_partials"
    thin = ds.map_batches(partials, batch_format="pyarrow").take_all()
    acc: dict[int, list] = {}
    for r in thin:
        s = np.asarray(r["svec"], dtype=np.float64)
        e = acc.get(r["label"])
        if e is None:
            acc[r["label"]] = [s, r["n"]]
        else:
            e[0] += s
            e[1] += r["n"]
    return {lab: s / n for lab, (s, n) in acc.items()}


def label_centroid_scores(ds, *, emb_col: str = "embedding",
                          label_col: str = "label",
                          id_col: str = "vec_id"):
    """(id, label, cos) for every row: cosine between the row's
    embedding and its own label's mean vector, float64 end-to-end."""
    cents = _label_centroids(ds, emb_col, label_col)
    if not cents:  # every label NULL → no row can score
        labs = np.array([0], dtype=np.int64)
        C, cnorm = np.zeros((1, 1)), np.zeros(1)
    else:
        labs = np.array(sorted(cents), dtype=np.int64)
        C = np.stack([cents[l] for l in labs])      # (L, d)
        cnorm = np.linalg.norm(C, axis=1)

    def score(b: pa.Table) -> pa.Table:
        # NULL-label rows are excluded like the oracle's equi-join
        # drops them (and like the centroid pass above)
        if b[label_col].null_count:
            b = b.filter(pa.compute.is_valid(b[label_col]))
        if len(b) == 0:
            return pa.table({id_col: b[id_col], label_col: b[label_col],
                             "cos": pa.array([], pa.float64())})
        m = list_to_matrix(b[emb_col], dtype=np.float64)
        norms = np.linalg.norm(m, axis=1)
        lab = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        li = np.minimum(np.searchsorted(labs, lab), len(labs) - 1)
        # 0/0 stays NaN — the SQL oracle's zero-norm rows divide to NaN
        # and a NaN never clears a >= threshold, so keep sets agree
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = (np.einsum("ij,ij->i", m, C[li])
                   / (norms * cnorm[li]))
        # a label value with no centroid (possible only if every row of
        # that label was dropped elsewhere) scores NaN, never a
        # wrong-centroid match
        cos[labs[li] != lab] = np.nan
        return pa.table({id_col: b[id_col], label_col: b[label_col],
                         "cos": pa.array(cos)})

    score.__name__ = "centroid_cosine"
    return ds.map_batches(score, batch_format="pyarrow")


def label_consistency_keep(ds, threshold: float, *,
                           emb_col: str = "embedding",
                           label_col: str = "label",
                           id_col: str = "vec_id"):
    """Rows whose embedding agrees with their label centroid:
    (id, label) where cos >= threshold."""
    import pyarrow.compute as pc

    scored = label_centroid_scores(ds, emb_col=emb_col,
                                   label_col=label_col, id_col=id_col)

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b["cos"], threshold)) \
                .select([id_col, label_col])

    keep.__name__ = "consistency_keep"
    return scored.map_batches(keep, batch_format="pyarrow")


def label_consistency_oracle_sql(threshold: float,
                                 table: str = "embeddings",
                                 id_col: str = "vec_id",
                                 label_col: str = "label",
                                 emb_col: str = "embedding") -> str:
    """DuckDB equivalent: per-label element-wise AVG centroid via
    unnest + generate_subscripts, cosine per row, threshold keep."""
    return f"""
        WITH u AS (
          SELECT {id_col} AS id, {label_col} AS lab,
                 unnest(CAST({emb_col} AS DOUBLE[])) AS val,
                 generate_subscripts({emb_col}, 1) AS ord
          FROM {table}
        ),
        cent AS (
          SELECT lab, ord, AVG(val) AS cval
          FROM u GROUP BY lab, ord
        ),
        dots AS (
          SELECT u.id, u.lab,
                 SUM(u.val * c.cval) AS d,
                 SUM(u.val * u.val) AS nv,
                 SUM(c.cval * c.cval) AS nc
          FROM u JOIN cent c ON u.lab = c.lab AND u.ord = c.ord
          GROUP BY u.id, u.lab
        )
        SELECT id AS {id_col}, lab AS {label_col}
        FROM dots
        WHERE d / (sqrt(nv) * sqrt(nc)) >= {threshold}
    """

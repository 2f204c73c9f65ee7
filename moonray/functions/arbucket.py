"""Aspect-ratio bucket batching for image training pipelines.

Multi-resolution image training (SDXL-style) groups images whose
aspect ratios are close into shared-shape batches so a batch can be
resized/cropped to one (bucket_w, bucket_h) without extreme
distortion. This is the assignment + batch-numbering step: decode-free
(uses the stored w/h metadata columns), deterministic, and
oracle-checkable.

Spec:
- bucket(img) = argmin_j |w·bh_j − h·bw_j| / (h·bh_j)  (linear
  ratio distance — every term is IEEE-double exact on both the engine
  and the SQL-oracle side, unlike log/ln which is libm-dependent),
  ties → smallest bucket index.
- within a bucket (optionally within (bucket, shard_col)) images are
  ordered by id; batch_id = rank // batch_size, slot = rank %
  batch_size. The tail batch may be short.

Distributed shape: one vectorized ``map_batches`` assignment (an
n×m distance matrix per batch, m = #buckets), then ONE shuffle of THIN
(bucket, id) rows — payload bytes never move; the trainer joins
batch_id back by id or reads the assignment table side-by-side.
Scale note: ``groupby(bucket)`` has only m groups — at 10^9+ images
pass ``shard_col`` (any stable partition column: source shard, path
prefix, id range) so batch numbering runs per (bucket, shard) and no
single reduce sees a whole bucket; production batch assemblers are
per-shard for exactly this reason.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from moonray.util import as_fn

# SDXL-style 1024^2-area resolution buckets (public training recipe);
# (w, h) pairs spanning portrait → square → landscape
DEFAULT_ASPECT_BUCKETS = (
    (512, 2048), (576, 1792), (640, 1536), (704, 1344), (768, 1280),
    (832, 1152), (896, 1088), (1024, 1024), (1088, 896), (1152, 832),
    (1280, 768), (1344, 704), (1536, 640), (1792, 576), (2048, 512),
)


class AssignAspectBucket:
    """map_batches: + (_bidx, bucket_w, bucket_h) via the exact
    ratio-distance argmin (first-match on ties = smallest index)."""

    def __init__(self, w_col: str, h_col: str, buckets):
        self.w_col, self.h_col = w_col, h_col
        self.bw = np.asarray([b[0] for b in buckets], np.int64)
        self.bh = np.asarray([b[1] for b in buckets], np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch[self.w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = batch[self.h_col].to_numpy(zero_copy_only=False).astype(np.int64)
        num = np.abs(w[:, None] * self.bh[None, :]
                     - h[:, None] * self.bw[None, :]).astype(np.float64)
        den = (h[:, None] * self.bh[None, :]).astype(np.float64)
        j = np.argmin(num / den, axis=1)
        return (batch
                .append_column("_bidx", pa.array(j.astype(np.int64)))
                .append_column("bucket_w", pa.array(self.bw[j]))
                .append_column("bucket_h", pa.array(self.bh[j])))


def aspect_bucket_batches(ds, *, id_col: str = "image_id",
                          w_col: str = "w", h_col: str = "h",
                          batch_size: int = 64,
                          buckets=DEFAULT_ASPECT_BUCKETS,
                          shard_col: str | None = None):
    """→ Dataset[(id, w, h, bucket_w, bucket_h, batch_id, slot)] (+
    shard_col when given; batch_id is then per (bucket, shard))."""
    cols = [id_col, w_col, h_col] + ([shard_col] if shard_col else [])
    thin = ds.select_columns(cols).map_batches(
        as_fn(AssignAspectBucket(w_col, h_col, buckets), "assign_aspect"),
        batch_format="pyarrow")
    keys = ["_bidx"] + ([shard_col] if shard_col else [])

    def number_batches(g: pa.Table) -> pa.Table:
        s = g.sort_by([(id_col, "ascending")])
        rank = np.arange(len(s), dtype=np.int64)
        return (s.append_column("batch_id",
                                pa.array(rank // batch_size))
                 .append_column("slot", pa.array(rank % batch_size))
                 .drop_columns(["_bidx"]))

    number_batches.__name__ = "number_batches"
    return thin.groupby(keys).map_groups(number_batches,
                                         batch_format="pyarrow")


def aspect_bucket_oracle_sql(*, table: str = "images",
                             id_col: str = "image_id",
                             batch_size: int = 64,
                             buckets=DEFAULT_ASPECT_BUCKETS) -> str:
    """DuckDB oracle: same exact ratio-distance argmin (integer
    numerators, one IEEE-double division) + window-ranked batching."""
    vals = ", ".join(f"({i}, {bw}, {bh})"
                     for i, (bw, bh) in enumerate(buckets))
    return f"""
        WITH b(i, bw, bh) AS (VALUES {vals}),
        assign AS (
          SELECT {id_col}, w, h, i, bw, bh FROM {table} CROSS JOIN b
          QUALIFY row_number() OVER (
            PARTITION BY {id_col}
            ORDER BY CAST(abs(w * bh - h * bw) AS DOUBLE)
                     / CAST(h * bh AS DOUBLE), i) = 1),
        ranked AS (
          SELECT {id_col}, w, h, bw, bh,
                 row_number() OVER (PARTITION BY i ORDER BY {id_col}) - 1
                     AS rn
          FROM assign)
        SELECT {id_col}, w, h, bw AS bucket_w, bh AS bucket_h,
               CAST(rn // {batch_size} AS BIGINT) AS batch_id,
               CAST(rn % {batch_size} AS BIGINT) AS slot
        FROM ranked
    """

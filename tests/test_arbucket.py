"""Aspect-ratio bucket batching vs a DuckDB window-function oracle
(the exact ratio-distance argmin is IEEE-double identical on both
sides, so parity is value-for-value)."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.functions.arbucket import (DEFAULT_ASPECT_BUCKETS,
                                        aspect_bucket_batches,
                                        aspect_bucket_oracle_sql)


def _images(n=400, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    sizes = np.array([64, 96, 128, 192, 256, 384, 512])
    return pa.table({
        "image_id": pa.array([f"img-{i:06d}" for i in range(n)]),
        "w": pa.array(rng.choice(sizes, n).astype(np.int32)),
        "h": pa.array(rng.choice(sizes, n).astype(np.int32)),
        "shard": pa.array((rng.integers(0, 3, n)).astype(np.int64)),
    })


def _cmp(tbl, got, want):
    got = got.sort_values("image_id").reset_index(drop=True)
    want = want.sort_values("image_id").reset_index(drop=True)
    assert sorted(got.columns) == sorted(want.columns)
    for c in sorted(want.columns):
        assert got[c].tolist() == want[c].tolist(), c


def test_aspect_bucket_batches_match_duckdb():
    tbl = _images()
    got = (aspect_bucket_batches(rd.from_arrow(tbl), batch_size=32)
           .to_pandas())
    con = duckdb.connect()
    con.register("images", tbl)
    want = con.execute(aspect_bucket_oracle_sql(batch_size=32)).fetchdf()
    _cmp(tbl, got, want)
    # non-trivial: multiple buckets used, full and tail batches exist
    assert want[["bucket_w", "bucket_h"]].drop_duplicates().shape[0] >= 5
    assert (want.groupby(["bucket_w", "batch_id"]).size() == 32).any()


def test_aspect_bucket_sharded():
    tbl = _images(300, seed=3)
    got = (aspect_bucket_batches(rd.from_arrow(tbl), batch_size=16,
                                 shard_col="shard").to_pandas())
    vals = ", ".join(f"({i}, {bw}, {bh})" for i, (bw, bh)
                     in enumerate(DEFAULT_ASPECT_BUCKETS))
    con = duckdb.connect()
    con.register("images", tbl)
    want = con.execute(f"""
        WITH b(i, bw, bh) AS (VALUES {vals}),
        assign AS (
          SELECT image_id, w, h, shard, i, bw, bh
          FROM images CROSS JOIN b
          QUALIFY row_number() OVER (PARTITION BY image_id
            ORDER BY CAST(abs(w * bh - h * bw) AS DOUBLE)
                     / CAST(h * bh AS DOUBLE), i) = 1),
        ranked AS (
          SELECT image_id, w, h, shard, bw, bh,
                 row_number() OVER (PARTITION BY i, shard
                                    ORDER BY image_id) - 1 AS rn
          FROM assign)
        SELECT image_id, w, h, shard, bw AS bucket_w, bh AS bucket_h,
               CAST(rn // 16 AS BIGINT) AS batch_id,
               CAST(rn % 16 AS BIGINT) AS slot
        FROM ranked""").fetchdf()
    _cmp(tbl, got, want)


def test_aspect_bucket_tie_breaks_to_lowest_index():
    # buckets 0 and 1 share a ratio: every image ties, index 0 must win
    tbl = pa.table({"image_id": pa.array([f"i{i}" for i in range(8)]),
                    "w": pa.array(np.int32([50, 100, 30, 80] * 2)),
                    "h": pa.array(np.int32([100, 50, 90, 80] * 2))})
    got = (aspect_bucket_batches(
        rd.from_arrow(tbl), batch_size=4,
        buckets=((64, 128), (128, 256), (128, 64), (96, 96)))
        .to_pandas())
    assert set(map(tuple, got[["bucket_w", "bucket_h"]].values)) <= \
        {(64, 128), (128, 64), (96, 96)}
    assert not ((got["bucket_w"] == 128) & (got["bucket_h"] == 256)).any()

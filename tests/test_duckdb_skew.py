"""DuckDB union-read parity (scan served to an external SQL engine with
row-exact DV exclusion) + skew-aware clustering of hot phash ranges
(north rule: salting breaks million-way key ties)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from moonray.fixtures import IMAGE_SCHEMA, make_changes_dataset, make_images_dataset
from moonray.table import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("age", pa.int32()),
])


def test_duckdb_view_matches_scan_with_dvs(tmp_path):
    import duckdb

    t = MoonrayTable.create(str(tmp_path / "ddb"), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": i} for i in range(40)]))
    # leave live DVs (no compaction): the view must exclude exactly them
    t.merge(rd.from_items(
        [{"op": "D", "lsn": i + 1, "id": i * 3, "name": None, "age": None}
         for i in range(8)]), job_id="d1")
    assert t.describe()["deleted_rows"] > 0  # DVs really present

    con = duckdb.connect()
    t.duckdb_view(con, "tbl")
    got = con.sql("SELECT id, name, age FROM tbl ORDER BY id").fetchall()
    scan = sorted(
        (r["id"], r["name"], r["age"])
        for b in t.scan().iter_batches(batch_format="pyarrow", batch_size=1024)
        for r in b.to_pylist())
    assert [tuple(r) for r in got] == scan
    assert len(got) == 40 - 8


def test_cluster_balances_hot_phash_range(tmp_path):
    """50% of keys share the top-8 phash bits (extreme skew). Quantile
    Z-key cuts + key-hash salt must still produce balanced fragments —
    no fragment more than 2× the target size."""
    t = MoonrayTable.create(str(tmp_path / "skew"), key_col="image_id",
                            schema=IMAGE_SCHEMA, zone_cols=("phash", "w", "h"),
                            index_partitions=8, rows_per_fragment=64)
    t.bulk_load(make_images_dataset(600, seed=42, hot_pct=50))
    t.cluster()
    m = t.manifest()
    sizes = [f["rows"] for f in m["fragments"]]
    assert max(sizes) <= 2 * 64, sizes
    # at least half the fragments are full-sized (no dust from skew)
    assert sum(1 for s in sizes if s >= 48) >= len(sizes) // 2, sizes
    # the hot range really exists in the data
    from moonray.fixtures import HOT_PHASH_PREFIX

    phashes = np.concatenate([
        b["phash"].to_numpy(zero_copy_only=False)
        for b in t.scan(columns=["phash"]).iter_batches(
            batch_format="pyarrow", batch_size=4096)])
    tops = (phashes.astype(np.uint64) >> np.uint64(56)).astype(np.int64)
    assert (tops == HOT_PHASH_PREFIX).mean() > 0.35
    # state preserved
    assert t.describe()["cardinality"] == 600

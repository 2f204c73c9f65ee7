"""Regression tests for the round-2 ADVICE.md hardening items:
overlapping DV deltas, sync floors vs snapshot expiry, delete_range as
the hint-safe primary API, and version_as_of under mixed-version
(missing committed_at) manifests."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _mk_table(prefix, rows=200, rpf=64):
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    t = MoonrayTable.create(scratch_root(prefix), key_col="k",
                            schema=schema, rows_per_fragment=rpf,
                            index_partitions=4)
    t.bulk_load(rd.from_arrow(pa.table(
        {"k": np.arange(rows, dtype=np.int64),
         "v": np.zeros(rows, dtype=np.int64)})))
    return t


def _merge_round(t, keys, lsn, op="I"):
    import ray.data as rd

    t.merge(rd.from_arrow(pa.table({
        "op": pa.array([op] * len(keys)),
        "lsn": pa.array([lsn] * len(keys), pa.int64()),
        "k": pa.array(keys, pa.int64()),
        "v": pa.array([lsn] * len(keys), pa.int64()),
    })), job_id=f"adv-{lsn}-{op}")


def test_load_dv_union_dedups_overlapping_deltas(tmp_path):
    """Merge writes disjoint DV deltas, but lookup's setdiff1d
    (assume_unique) must not silently corrupt if that invariant is ever
    violated — load_dv_union dedups."""
    from moonray.dv import load_dv_union, save_dv
    from moonray.manifest import init_table_dirs

    root = str(tmp_path / "t")
    init_table_dirs(root)
    save_dv(root, "dv/a.npy", np.array([3, 1, 7], dtype=np.uint32))
    save_dv(root, "dv/b.npy", np.array([7, 2, 1], dtype=np.uint32))
    got = load_dv_union(root, ["dv/a.npy", "dv/b.npy"])
    assert got.tolist() == [1, 2, 3, 7]


def test_sync_floor_survives_source_expiry():
    """A routine expire_snapshots on the source must not break the
    incremental sync path: sync advances a changelog floor that expiry
    honors (keeps every version ≥ the smallest floor)."""
    from moonray.sync import sync_incremental
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    src = _mk_table("mr-floor-src-")
    dst = MoonrayTable.create(scratch_root("mr-floor-dst-"),
                              key_col="k", schema=src.schema(),
                              rows_per_fragment=64, index_partitions=4)
    sync_incremental(src, dst)

    # source advances several commits, then expires aggressively
    for lsn in (1, 2, 3):
        _merge_round(src, [lsn, lsn + 100], lsn)
    src.expire_snapshots(keep_last=1)
    # the floor kept the (synced, head] manifests → incremental works
    sync_incremental(src, dst)
    a = src.scan().to_pandas().sort_values(["k"], ignore_index=True)
    b = dst.scan().to_pandas().sort_values(["k"], ignore_index=True)
    pd.testing.assert_frame_equal(a, b)


def test_sync_missing_manifest_is_clear_error():
    """With the floor cleared (simulating a pre-floor source or manual
    intervention), an expired changelog surfaces as a 'resync required'
    RuntimeError, not a bare FileNotFoundError."""
    from moonray import manifest as mf
    from moonray.sync import _src_floor_token, sync_incremental
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    src = _mk_table("mr-floorless-src-")
    dst = MoonrayTable.create(scratch_root("mr-floorless-dst-"),
                              key_col="k", schema=src.schema(),
                              rows_per_fragment=64, index_partitions=4)
    sync_incremental(src, dst)
    for lsn in (1, 2, 3):
        _merge_round(src, [lsn], lsn)
    mf.clear_floor(src.root, _src_floor_token(dst, "default"))
    src.expire_snapshots(keep_last=1)
    with pytest.raises(RuntimeError, match="Resync required"):
        sync_incremental(src, dst)


def test_delete_range_matches_delete_where_oracle():
    t = _mk_table("mr-delrange-", rows=100)
    t.delete_range({"k": (10, 29)}, lsn=5)
    got = sorted(t.scan().to_pandas().k.tolist())
    assert got == [k for k in range(100) if not (10 <= k <= 29)]
    with pytest.raises(ValueError, match="refuse"):
        t.delete_range({}, lsn=6)


def test_version_as_of_stops_at_first_newer_timestamp():
    """A manifest missing committed_at AFTER timestamped ones (mixed
    writers) must never win for an early ts."""
    t = _mk_table("mr-asof-", rows=20)
    _merge_round(t, [1], 1)
    v1 = t.latest_version()
    ts1 = t.manifest(v1)["committed_at"]
    _merge_round(t, [2], 2)
    v2 = t.latest_version()
    # strip committed_at from the NEWEST manifest in place
    p = os.path.join(t.root, "versions", f"v{v2:08d}.json")
    with open(p) as f:
        m = json.load(f)
    del m["committed_at"]
    with open(p, "w") as f:
        json.dump(m, f)
    assert t.version_as_of(ts1) == v1


# ---------------- round-4 ADVICE items ----------------


def test_range_constraint_counts_nan_like_sql():
    """DuckDB orders NaN above everything, so NaN > hi is a range
    violation there; Arrow's unordered-NaN compare must not diverge."""
    import duckdb
    import ray.data as rd

    from moonray.functions.validate import check_constraints

    vals = [1.0, 2.0, float("nan"), 50.0, None, float("nan")]
    t = pa.table({"x": pa.array(vals, pa.float64())})
    rep = {(r["constraint"], r["column"]): r["n_violations"]
           for r in check_constraints(
               rd.from_arrow(t), ranges={"x": (0.0, 10.0)}).take_all()}
    con = duckdb.connect()
    con.register("t", t)
    want = con.sql(
        "SELECT count(*) FROM t WHERE x < 0.0 OR x > 10.0").fetchone()[0]
    assert rep[("range", "x")] == want == 3  # 50.0 + two NaN


def test_embfilter_null_labels_excluded_like_oracle():
    """NULL labels must drop out of both the centroid and score passes
    (the SQL oracle's equi-join on label excludes them) — never be
    int-cast into a real label's centroid."""
    import ray.data as rd

    from moonray.functions.embfilter import label_consistency_keep

    rng = np.random.default_rng(5)
    a = rng.normal(0, 0.01, (20, 4)) + np.array([1, 0, 0, 0])
    b = rng.normal(0, 0.01, (20, 4)) + np.array([0, 1, 0, 0])
    emb = np.vstack([a, b]).astype(np.float64)
    labels = pa.array([0] * 20 + [1] * 15 + [None] * 5, pa.int64())
    t = pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "label": labels,
        "embedding": pa.array([list(r) for r in emb],
                              pa.list_(pa.float64())),
    })
    kept = label_consistency_keep(
        rd.from_arrow(t).repartition(3), 0.9).to_pandas()
    # every non-null-label row agrees with its centroid; null-label
    # rows (ids 35-39) are excluded exactly like the oracle
    assert sorted(kept["vec_id"]) == list(range(35))


def test_weighted_sample_huge_weights_partition_invariant():
    """1/w underflow made u**(1/w) round to 1.0 for many rows; ties then
    broke by block arrival order. log-space priorities keep the draw a
    pure function of (corpus, seed) at any partitioning."""
    import ray.data as rd

    from moonray.functions.reservoir import weighted_sample_exact

    n = 2000
    t = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(np.full(n, 1e300))})
    a = sorted(weighted_sample_exact(
        rd.from_arrow(t).repartition(2), 50, "k", "w",
        seed=9).to_pandas()["k"])
    b = sorted(weighted_sample_exact(
        rd.from_arrow(t).repartition(13), 50, "k", "w",
        seed=9).to_pandas()["k"])
    assert a == b and len(a) == 50


def test_analyze_validate_bad_column_raises_eagerly():
    """A bad column name raises KeyError on the driver (service → 400),
    not a RayTaskError from inside a map task (service → 500)."""
    import pytest as _pytest

    t = _mk_table("mr-badcol-", rows=50)
    with _pytest.raises(KeyError, match="no_such"):
        t.analyze(["no_such"])
    with _pytest.raises(KeyError, match="no_such"):
        t.validate(not_null=("no_such",))

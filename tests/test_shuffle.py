"""Storage-backed shuffle unit tests: run-file round-trip, bucket
partitioning, and exactly-once side effects under task retries
(content-derived file names)."""

import os

import numpy as np
import pyarrow as pa

from moonray.shuffle import BUCKET_COL, RunWriter, read_bucket
from moonray.util import content_id


def _batch(ids, buckets):
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "payload": pa.array([f"p{i}" for i in ids], pa.string()),
        BUCKET_COL: pa.array(buckets, pa.int32()),
    })


def test_run_roundtrip_and_partitioning(tmp_path):
    root = str(tmp_path)
    w = RunWriter(root, "job1", "s", id_cols=("id",))
    out = w(_batch([1, 2, 3, 4, 5, 6], [0, 1, 0, 2, 1, 0]))
    assert sorted(out["bucket"].to_pylist()) == [0, 1, 2]
    b0 = read_bucket(root, "job1", "s", 0)
    assert sorted(b0["id"].to_pylist()) == [1, 3, 6]
    assert read_bucket(root, "job1", "s", 1)["id"].to_pylist() == [2, 5]
    assert read_bucket(root, "job1", "s", 7) is None
    # bucket column never leaks into runs
    assert BUCKET_COL not in b0.column_names


def test_retried_map_task_is_exactly_once(tmp_path):
    """A Ray task retry re-executes the same batch; content-derived run
    names must overwrite, not duplicate."""
    root = str(tmp_path)
    w = RunWriter(root, "job1", "s", id_cols=("id",))
    batch = _batch([10, 11, 12], [3, 3, 3])
    w(batch)
    w(batch)  # the retry
    d = os.path.join(root, "staging", "job1", "shuffle", "s", "b00003")
    runs = [p for p in os.listdir(d) if p.endswith(".arrow")]
    assert len(runs) == 1
    assert len(read_bucket(root, "job1", "s", 3)) == 3


def test_content_id_distinguishes_batches():
    a = pa.table({"id": pa.array([1, 2, 3], pa.int64())})
    b = pa.table({"id": pa.array([1, 2, 4], pa.int64())})
    c = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64())})
    assert content_id(a, "id") == content_id(a, "id")
    assert content_id(a, "id") != content_id(b, "id")
    assert content_id(a, "id") != content_id(c, "id")


def test_write_fragment_retry_idempotent(tmp_path):
    from moonray.fragments import write_fragment
    from moonray.manifest import init_table_dirs

    root = str(tmp_path)
    init_table_dirs(root)
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array(["a", "b", "c"], pa.string())})
    m1, _ = write_fragment(root, "j", t, key_col="id", zone_cols=("id",))
    m2, _ = write_fragment(root, "j", t, key_col="id", zone_cols=("id",))
    assert m1["id"] == m2["id"]  # same content → same fragment id
    frags = os.listdir(os.path.join(root, "fragments"))
    assert len([f for f in frags if f.endswith(".parquet")]) == 1
    sidecars = os.listdir(os.path.join(root, "staging", "j", "meta"))
    assert len(sidecars) == 1

"""IO-level fault injection (reference
filesystem_accessor_chaos_wrapper.rs + accessor_config.rs retry):
seeded transient read/write/commit faults, injected delays, and
partial remote fetches — the real pipelines (merge, cluster, export,
scan) must produce chaos-free-identical results while faults
demonstrably fire underneath."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from moonray import chaos
from moonray.table import MoonrayTable

SCHEMA = pa.schema([("id", pa.int64()), ("name", pa.string()),
                    ("score", pa.float64())])

CHAOS_CFG = {"seed": 20260820, "read_error_prob": 0.4,
             "write_error_prob": 0.4, "partial_fetch_prob": 0.5,
             "delay_ms": [0, 2]}


def _build(root, with_chaos: bool):
    os.makedirs(root, exist_ok=True)
    if with_chaos:
        with open(os.path.join(root, "CHAOS.json"), "w") as f:
            json.dump(CHAOS_CFG, f)
    t = MoonrayTable.create(root, key_col="id", schema=SCHEMA,
                            zone_cols=("score",), index_partitions=4,
                            rows_per_fragment=16)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "score": float(i)}
         for i in range(120)]))
    t.merge(rd.from_items(
        [{"op": "U", "lsn": 1000 + i, "id": i, "name": f"u{i}",
          "score": i + 0.5} for i in range(0, 120, 3)]
        + [{"op": "D", "lsn": 2000 + i, "id": i, "name": None,
            "score": None} for i in range(1, 120, 5)]))
    t.optimize("data")
    t.cluster()
    return t


def _df(t):
    return (t.scan().to_pandas()
            .sort_values("id", ignore_index=True)[["id", "name", "score"]])


def test_pipelines_green_and_exact_under_chaos(tmp_path):
    chaos.reset_for_tests()
    want = _df(_build(str(tmp_path / "clean"), with_chaos=False))
    t = _build(str(tmp_path / "chaotic"), with_chaos=True)
    got = _df(t)
    pd.testing.assert_frame_equal(got, want)
    # chaos demonstrably fired (log lines come from every process)
    assert chaos.fired_count(t.root) > 0

    # export under chaos: the Iceberg replay still reconstructs exactly
    from moonray.sinks.iceberg import export_iceberg, read_iceberg_table

    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    back = read_iceberg_table(dest).to_pandas() \
        .sort_values("id", ignore_index=True)[["id", "name", "score"]]
    pd.testing.assert_frame_equal(back, want)

    # point lookups work under read chaos
    rows = t.lookup([0, 2]).to_pylist()
    assert {r["id"] for r in rows} == {0, 2}


def test_partial_fetch_retries_on_mock_remote(tmp_path):
    """A truncated remote fetch must be thrown away and refetched —
    never land in the worker file cache."""
    chaos.reset_for_tests()
    src = tmp_path / "remote"
    src.mkdir()
    payload = b"x" * 4096
    (src / "obj.bin").write_bytes(payload)
    with open(src / "CHAOS.json", "w") as f:
        json.dump({"seed": 1, "partial_fetch_prob": 1.0}, f)
    from moonray.filecache import FileCache, _mock_fetch

    cache = FileCache(cache_dir=str(tmp_path / "cache"))
    root = f"mock://{src}"
    p = cache.get(root, "obj.bin", _mock_fetch)
    assert open(p, "rb").read() == payload        # full bytes, not torn
    assert chaos.fired_count(root) > 0


def test_commit_chaos_preserves_conflict_semantics(tmp_path):
    """put_if_absent under chaos: the transient fault is absorbed, the
    object commits once, and a REAL second writer still conflicts."""
    chaos.reset_for_tests()
    from moonray.commitstore import CommitConflict, LocalCommitStore

    root = str(tmp_path / "store")
    os.makedirs(root)
    with open(os.path.join(root, "CHAOS.json"), "w") as f:
        json.dump({"seed": 3, "commit_error_prob": 1.0}, f)
    st = LocalCommitStore(root)
    st.put_if_absent("versions/v1.json", b"{}")
    assert open(os.path.join(root, "versions/v1.json")).read() == "{}"
    with pytest.raises(CommitConflict):
        st.put_if_absent("versions/v1.json", b"{}")


def test_transient_classification():
    """Control-flow OSErrors must escape the retry absorber
    immediately."""
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("chaos: transient")
        return "ok"

    assert chaos.with_io_retries(flaky) == "ok"
    assert calls["n"] == 2

    def missing():
        raise FileNotFoundError("nope")

    calls2 = {"n": 0}

    def count_missing():
        calls2["n"] += 1
        raise FileNotFoundError("nope")

    with pytest.raises(FileNotFoundError):
        chaos.with_io_retries(count_missing)
    assert calls2["n"] == 1  # not retried

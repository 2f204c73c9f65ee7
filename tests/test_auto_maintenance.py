"""Engine-side auto-maintenance triggers (reference thresholds:
compaction at >=16 small files or >=50% deleted rows,
compaction_config.rs:47-54; index merge at >=16 small index files,
index_merge_config.rs:50-88; evaluated by the background loop,
snapshot_maintenance.rs:42-199)."""

import pyarrow as pa
import ray.data as rd

from moonray.table import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("age", pa.int32()),
])


def _mk(root, rpf=8):
    return MoonrayTable.create(str(root), key_col="id", schema=SCHEMA,
                               index_partitions=4, rows_per_fragment=rpf)


def test_small_file_pressure_triggers_compaction(tmp_path):
    t = _mk(tmp_path / "t1")
    # 20 tiny fragments (rpf=8 → 160 rows in ~20 files)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": 1} for i in range(160)]))
    due = t.maintenance_due()
    assert due["compact"] and due["small_fragments"] >= 16
    before = t.describe()["num_fragments"]
    res = t.maintain_if_needed()
    assert "compact" in res["actions"]
    after = t.describe()
    assert after["num_fragments"] < before
    assert after["cardinality"] == 160
    # pressure relieved → idempotent no-op
    assert t.maintain_if_needed()["actions"] == []


def test_dv_debt_triggers_compaction(tmp_path):
    t = _mk(tmp_path / "t2", rpf=64)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": 1} for i in range(128)]))
    # delete >50% of one fragment's rows
    t.merge(rd.from_items(
        [{"op": "D", "lsn": i + 1, "id": i, "name": None, "age": None}
         for i in range(40)]))
    due = t.maintenance_due()
    assert due["compact"] and due["dv_heavy_fragments"] >= 1
    res = t.maintain_if_needed()
    assert "compact" in res["actions"]
    d = t.describe()
    assert d["deleted_rows"] == 0 and d["cardinality"] == 88


def test_unclustered_tail_triggers_incremental_cluster(tmp_path):
    """Opt-in cluster_tail_frags threshold: enough fragments outside the
    Z-sorted set fire cluster(scope='incremental') — sort-the-tail
    maintenance layered on the reference's compaction policy."""
    t = MoonrayTable.create(str(tmp_path / "t4"), key_col="id", schema=SCHEMA,
                            zone_cols=("age",), index_partitions=4,
                            rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": i % 7} for i in range(64)]))
    t.cluster(cols=["age"])  # establish the sorted set
    assert t.maintenance_due(cluster_tail_frags=4)["cluster"] is False
    # merges grow an unsorted tail
    for r in range(4):
        t.merge(rd.from_items(
            [{"op": "I", "lsn": 100 * (r + 1) + i, "id": 1000 + 100 * r + i,
              "name": "x", "age": (i + r) % 7} for i in range(8)]))
    due = t.maintenance_due(cluster_tail_frags=4)
    assert due["cluster"] and due["unclustered_fragments"] >= 4
    res = t.maintain_if_needed(cluster_tail_frags=4)
    assert "cluster_incremental" in res["actions"]
    m = t.manifest()
    assert all(f["id"].startswith("z-") for f in m["fragments"])
    assert t.scan().count() == 64 + 32
    # default policy (no threshold) never fires the cluster pass
    assert t.maintenance_due()["cluster"] is False


def test_index_delta_pressure_triggers_index_merge(tmp_path):
    t = _mk(tmp_path / "t3", rpf=64)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": 1} for i in range(64)]))
    # each merge adds index delta files per touched partition
    for r in range(6):
        t.merge(rd.from_items(
            [{"op": "U", "lsn": 1000 * (r + 1) + i, "id": i,
              "name": f"r{r}-{i}", "age": r} for i in range(16)]))
    due = t.maintenance_due()
    assert due["index_files"] >= 16 and due["index_merge"]
    res = t.maintain_if_needed(expire_keep_last=1)
    assert "index_merge" in res["actions"]
    d = t.describe()
    assert d["index_files"] <= 4  # one folded file per partition
    assert d["cardinality"] == 64
    rows = {r["id"]: r for batch in t.scan().iter_batches(
        batch_format="pyarrow", batch_size=1024) for r in batch.to_pylist()}
    assert rows[0]["name"] == "r5-0"  # last writer survived the fold

"""JSON ingest converter → MERGE round (the REST-ingest path parity:
JSON events with op insert/upsert/delete applied to a table)."""

import json

import pyarrow as pa
import ray.data as rd

from moonray.sources.json_ingest import json_changes
from moonray.table import MoonrayTable

SCHEMA = pa.schema([
    ("id", pa.int64()), ("name", pa.string()), ("age", pa.int32()),
])


def test_json_changes_merge(tmp_path):
    t = MoonrayTable.create(str(tmp_path / "j"), key_col="id", schema=SCHEMA,
                            index_partitions=4, rows_per_fragment=8)
    t.bulk_load(rd.from_items(
        [{"id": i, "name": f"n{i}", "age": i} for i in range(10)]))

    events = [
        {"op": "insert", "lsn": 1, "row": {"id": 100, "name": "new", "age": 1}},
        {"op": "upsert", "lsn": 2, "row": {"id": 3, "name": "up", "age": 33}},
        {"op": "delete", "lsn": 3, "row": {"id": 5}},
        {"op": "delete", "lsn": 4, "row": {"id": 999}},  # delete_if_exists
        {"op": "upsert", "lsn": 5, "row": {"id": 100, "name": "newer"}},  # partial row
    ]
    ds = rd.from_items([{"json": json.dumps(e)} for e in events])
    t.merge(json_changes(ds, SCHEMA), job_id="rest-1")

    tbl = pa.concat_tables([b for b in t.scan().iter_batches(
        batch_format="pyarrow", batch_size=1024)])
    rows = {r["id"]: r for r in tbl.to_pylist()}
    assert set(rows) == (set(range(10)) - {5}) | {100}
    assert rows[3]["name"] == "up" and rows[3]["age"] == 33
    assert rows[100]["name"] == "newer" and rows[100]["age"] is None  # last-writer

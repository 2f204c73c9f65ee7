"""Avro-binary and MoonlinkRow-protobuf converters: encode → decode
round-trips, schema mapping parity with the reference converter rules,
and the Ray map_batches stages end-to-end (including a merge into a
table — the Kafka/proto ingest path)."""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.sources.avro_ingest import (AvroSchemaError, AvroToRows,
                                         avro_to_arrow_schema, decode_avro,
                                         encode_avro, parse_avro_schema)
from moonray.sources.proto_ingest import (ProtoToRows, decode_moonlink_row,
                                          encode_moonlink_row)

AVRO_SCHEMA = """
{"type": "record", "name": "doc", "fields": [
  {"name": "id", "type": "long"},
  {"name": "name", "type": "string"},
  {"name": "score", "type": ["null", "double"]},
  {"name": "tags", "type": {"type": "array", "items": "string"}},
  {"name": "props", "type": {"type": "map", "values": "int"}},
  {"name": "kind", "type": {"type": "enum", "name": "k",
                            "symbols": ["A", "B"]}},
  {"name": "blob", "type": "bytes"}
]}
"""


def test_avro_roundtrip_and_arrow_schema():
    s = parse_avro_schema(AVRO_SCHEMA)
    arrow = avro_to_arrow_schema(s)
    assert arrow.field("id").type == pa.int64()
    assert arrow.field("score").type == pa.float64() and arrow.field("score").nullable
    assert arrow.field("tags").type == pa.list_(pa.string())
    assert arrow.field("kind").type == pa.string()
    rec = {"id": 7, "name": "café", "score": None, "tags": ["x", "y"],
           "props": {"a": 1, "b": -2}, "kind": "B", "blob": b"\x00\xff"}
    out = decode_avro(s, encode_avro(s, rec))
    assert out["id"] == 7 and out["name"] == "café" and out["score"] is None
    assert out["tags"] == ["x", "y"] and dict(out["props"]) == {"a": 1, "b": -2}
    assert out["kind"] == "B" and out["blob"] == b"\x00\xff"
    rec2 = dict(rec, score=-3.5, tags=[], props={})
    out2 = decode_avro(s, encode_avro(s, rec2))
    assert out2["score"] == -3.5 and out2["tags"] == [] and out2["props"] == []


def test_avro_rejects_multi_branch_union():
    s = parse_avro_schema(
        '{"type":"record","name":"r","fields":'
        '[{"name":"x","type":["null","int","string"]}]}')
    with pytest.raises(AvroSchemaError):
        avro_to_arrow_schema(s)


def test_avro_stage_to_merge(tmp_path):
    """Kafka-shaped flow: avro datums → rows → MERGE into a table."""
    from moonray.table import MoonrayTable

    s = parse_avro_schema(
        '{"type":"record","name":"c","fields":['
        '{"name":"id","type":"long"},{"name":"name","type":"string"},'
        '{"name":"age","type":"int"}]}')
    datums = [encode_avro(s, {"id": i, "name": f"n{i}", "age": 20 + i})
              for i in range(10)]
    src = rd.from_arrow(pa.table({
        "value": pa.array(datums, pa.binary()),
        "offset": pa.array(range(10), pa.int64()),
    }))
    rows = src.map_batches(
        AvroToRows('{"type":"record","name":"c","fields":['
                   '{"name":"id","type":"long"},{"name":"name","type":"string"},'
                   '{"name":"age","type":"int"}]}', keep_cols=("offset",)),
        batch_format="pyarrow")

    t = MoonrayTable.create(str(tmp_path / "t"), key_col="id",
                            schema=pa.schema([("id", pa.int64()),
                                              ("name", pa.string()),
                                              ("age", pa.int32())]),
                            index_partitions=4, rows_per_fragment=8)

    def to_changes(b: pa.Table) -> pa.Table:
        return pa.table({
            "op": pa.array(["I"] * len(b), pa.string()),
            "lsn": b["offset"].cast(pa.int64()),  # kafka offset as LSN
            "id": b["id"], "name": b["name"], "age": b["age"].cast(pa.int32()),
        })

    t.merge(rows.map_batches(to_changes, batch_format="pyarrow"))
    got = sorted(r["id"] for b in t.scan().iter_batches(batch_format="pyarrow")
                 for r in b.to_pylist())
    assert got == list(range(10))


def test_proto_roundtrip():
    row = encode_moonlink_row([
        (42, "int32"), (-7, "int64"), (1.5, "float32"), (2.25, "float64"),
        (-123456789012345678901234567890, "decimal128"), (True, "bool"),
        (b"raw", "bytes"), (None, "null"),
        ([1, 2, 3], "array:int64"), ((1, b"s"), "struct:int32,bytes"),
    ])
    vals = decode_moonlink_row(row)
    assert vals[0] == 42 and vals[1] == -7
    assert abs(vals[2] - 1.5) < 1e-6 and vals[3] == 2.25
    assert vals[4] == -123456789012345678901234567890
    assert vals[5] is True and vals[6] == b"raw" and vals[7] is None
    assert vals[8] == [1, 2, 3] and vals[9] == (1, b"s")


def test_proto_stage():
    schema = pa.schema([("id", pa.int64()), ("name", pa.string()),
                        ("ok", pa.bool_())])
    datums = [encode_moonlink_row([(i, "int64"), (f"n{i}".encode(), "bytes"),
                                   (i % 2 == 0, "bool")]) for i in range(6)]
    src = rd.from_arrow(pa.table({"value": pa.array(datums, pa.binary())}))
    out = pa.concat_tables(src.map_batches(
        ProtoToRows(schema), batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow", batch_size=64)).sort_by("id")
    assert out["id"].to_pylist() == list(range(6))
    assert out["name"].to_pylist() == [f"n{i}" for i in range(6)]
    assert out["ok"].to_pylist() == [True, False, True, False, True, False]


def test_avro_timestamp_millis_naive_is_utc_wall_time(monkeypatch):
    """Naive datetimes encode as UTC wall time for BOTH millis and
    micros logical types, independent of the host timezone (review
    finding: timestamp-millis used value.timestamp() — local TZ)."""
    import datetime
    import json
    import os
    import time as _time

    from moonray.sources.avro_ingest import (decode_avro, encode_avro,
                                             parse_avro_schema)

    monkeypatch.setenv("TZ", "America/New_York")
    _time.tzset()
    try:
        sch = parse_avro_schema(json.dumps({
            "type": "record", "name": "r", "fields": [
                {"name": "ms", "type": {"type": "long",
                                        "logicalType": "timestamp-millis"}},
                {"name": "us", "type": {"type": "long",
                                        "logicalType": "timestamp-micros"}},
            ]}))
        naive = datetime.datetime(2020, 1, 1, 0, 0)
        out = decode_avro(sch, encode_avro(sch, {"ms": naive, "us": naive}))
        want_us = 1577836800 * 1_000_000  # 2020-01-01T00:00Z
        assert out["ms"] == want_us       # millis decode scales to µs
        assert out["us"] == want_us
    finally:
        monkeypatch.delenv("TZ")
        _time.tzset()

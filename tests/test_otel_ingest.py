"""OTLP metrics converter: gauge / sum / histogram data points →
typed Arrow point rows (reference otel_to_moonlink_pb.rs +
otel_schema.rs), plus the append-only table ingest path and the
HTTP /otel/{t} endpoint."""

import json
import urllib.request

import pyarrow as pa
import pytest

from moonray.sources.otel_ingest import (OTEL_POINT_SCHEMA, OtelToRows,
                                         export_request_to_table, otel_changes)

REQ = {
    "resourceMetrics": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "checkout"}},
            {"key": "pid", "value": {"intValue": "4242"}},
        ]},
        "scopeMetrics": [{
            "scope": {"name": "app.metrics"},
            "metrics": [
                {"name": "cpu_load", "unit": "1", "gauge": {"dataPoints": [
                    {"timeUnixNano": "1000000001", "asDouble": 0.75,
                     "attributes": [{"key": "core",
                                     "value": {"intValue": "0"}}]},
                    {"timeUnixNano": "1000000002", "asInt": "2"},
                ]}},
                {"name": "requests_total", "description": "req counter",
                 "sum": {"aggregationTemporality": 2, "isMonotonic": True,
                         "dataPoints": [
                             {"startTimeUnixNano": "5", "timeUnixNano": "9",
                              "asInt": "123"}]}},
                {"name": "latency_ms", "unit": "ms", "histogram": {
                    "aggregationTemporality": 1, "dataPoints": [
                        {"timeUnixNano": "77", "count": "10", "sum": 55.5,
                         "bucketCounts": ["1", "4", "5"],
                         "explicitBounds": [10.0, 100.0],
                         "attributes": [{"key": "ok",
                                         "value": {"boolValue": True}}]}]}},
            ],
        }],
    }],
}


def test_export_request_flattens_all_point_kinds():
    t = export_request_to_table(REQ)
    assert t.schema.equals(OTEL_POINT_SCHEMA)
    rows = t.to_pylist()
    assert [r["metric_type"] for r in rows] == [
        "gauge", "gauge", "sum", "histogram"]
    g0, g1, s, h = rows
    assert g0["name"] == "cpu_load" and g0["value_double"] == 0.75
    assert g0["time_unix_nano"] == 1000000001 and g0["temporality"] == -1
    assert g0["attributes"] == [{"key": "core", "string_value": None,
                                 "int_value": 0, "double_value": None,
                                 "bool_value": None}]
    assert {a["key"]: a["int_value"] for a in g0["resource_attributes"]
            }["pid"] == 4242
    assert g1["value_int"] == 2 and g1["value_double"] is None
    assert s["value_int"] == 123 and s["is_monotonic"] is True
    assert s["temporality"] == 2 and s["start_time_unix_nano"] == 5
    assert h["count"] == 10 and h["hist_sum"] == 55.5
    assert h["bucket_counts"] == [1, 4, 5]
    assert h["explicit_bounds"] == [10.0, 100.0]
    assert h["attributes"][0]["bool_value"] is True
    assert all(r["scope_name"] == "app.metrics" for r in rows)


def test_otel_append_only_table_roundtrip(tmp_path):
    import ray.data as rd

    from moonray import MoonrayTable

    t = MoonrayTable.create(str(tmp_path / "metrics"), key_col=None,
                            identity="none", schema=OTEL_POINT_SCHEMA,
                            rows_per_fragment=64)
    payloads = rd.from_items([{"payload": json.dumps(REQ)}] * 3)
    t.merge(otel_changes(payloads, lsn0=1))
    assert t.scan().count() == 12
    got = pa.concat_tables(b for b in t.scan().iter_batches(
        batch_format="pyarrow", batch_size=1024))
    assert got.filter(
        pa.compute.equal(got["metric_type"], "histogram")).num_rows == 3
    # deletes stay forbidden on the metrics stream
    with pytest.raises(Exception, match="append-only"):
        t.merge(rd.from_items([{
            "op": "D", "lsn": 99, **{f.name: None for f in OTEL_POINT_SCHEMA}}]))


def test_otel_http_endpoint(tmp_path):
    from moonray.service import start_in_thread

    server, base = start_in_thread(str(tmp_path / "wh"))
    try:
        def call(method, url, body=None):
            data = json.dumps(body).encode() if body is not None else None
            req = urllib.request.Request(
                url, data=data, method=method,
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req) as resp:
                return resp.status, json.loads(resp.read())

        st, _ = call("POST", f"{base}/tables/metrics", {
            "schema": [[f.name, str(f.type)] for f in OTEL_POINT_SCHEMA
                       if f.name in ("name", "time_unix_nano",
                                     "value_double", "value_int")],
            "identity": "none",
        })
        assert st == 200
        st, r = call("POST", f"{base}/otel/metrics", REQ)
        assert st == 200 and r["rows"] == 4
        st, sc = call("GET", f"{base}/tables/metrics/scan?limit=10")
        assert st == 200 and len(sc["rows"]) == 4
        names = sorted(r["name"] for r in sc["rows"])
        assert names == ["cpu_load", "cpu_load", "latency_ms",
                         "requests_total"]
    finally:
        server.shutdown()

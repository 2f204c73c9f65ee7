"""OTLP metrics source: OTLP/HTTP JSON ``ExportMetricsServiceRequest``
→ Arrow point rows, one row per data point.

Re-expresses the reference's OTEL ingestion path
(src/moonlink_service/src/otel/otel_to_moonlink_pb.rs — gauge / sum /
histogram data points flattened to MoonlinkRow, one row per point, with
typed AnyValue attributes; schema in src/moonlink_service/src/otel/
otel_schema.rs). Differences: we parse the standard OTLP JSON encoding
(this container has no protobuf/tonic stack) and keep the reference's
column layout minus exemplars/entity-refs; attributes keep the typed
AnyValue struct {string,int,double,bool} the reference uses.

Metrics tables are append-only streams — pair with
``MoonrayTable.create(identity='none')`` exactly like the reference,
which never deletes OTEL rows.
"""

from __future__ import annotations

import base64
import json

import pyarrow as pa

_ATTR_TYPE = pa.list_(pa.struct([
    ("key", pa.string()),
    ("string_value", pa.string()),
    ("int_value", pa.int64()),
    ("double_value", pa.float64()),
    ("bool_value", pa.bool_()),
]))

# one row per data point (reference: number_point_row / histogram rows in
# otel_to_moonlink_pb.rs; temporality -1 = unspecified for gauges)
OTEL_POINT_SCHEMA = pa.schema([
    ("metric_type", pa.string()),          # gauge | sum | histogram
    ("name", pa.string()),
    ("description", pa.string()),
    ("unit", pa.string()),
    ("scope_name", pa.string()),
    ("start_time_unix_nano", pa.int64()),
    ("time_unix_nano", pa.int64()),
    ("temporality", pa.int32()),
    ("is_monotonic", pa.bool_()),
    ("value_int", pa.int64()),             # number points (int flavor)
    ("value_double", pa.float64()),        # number points (double flavor)
    ("count", pa.int64()),                 # histogram
    ("hist_sum", pa.float64()),            # histogram
    ("bucket_counts", pa.list_(pa.int64())),
    ("explicit_bounds", pa.list_(pa.float64())),
    ("attributes", _ATTR_TYPE),
    ("resource_attributes", _ATTR_TYPE),
])


def _i(v) -> int:
    # OTLP JSON carries int64 as decimal strings
    return int(v) if v is not None else 0


def _any_value(v: dict):
    if not isinstance(v, dict):
        return (None, None, None, None)
    s = v.get("stringValue")
    if s is None and "bytesValue" in v:  # keep bytes readable
        s = base64.b64decode(v["bytesValue"]).hex()
    i = v.get("intValue")
    return (s,
            int(i) if i is not None else None,
            v.get("doubleValue"),
            v.get("boolValue"))


def _attrs(kvs) -> list[dict]:
    out = []
    for kv in kvs or []:
        s, i, d, b = _any_value(kv.get("value", {}))
        out.append({"key": kv.get("key", ""), "string_value": s,
                    "int_value": i, "double_value": d, "bool_value": b})
    return out


def _base(mtype: str, metric: dict, scope_name: str, res_attrs, dp: dict) -> dict:
    return {
        "metric_type": mtype,
        "name": metric.get("name", ""),
        "description": metric.get("description", ""),
        "unit": metric.get("unit", ""),
        "scope_name": scope_name,
        "start_time_unix_nano": _i(dp.get("startTimeUnixNano")),
        "time_unix_nano": _i(dp.get("timeUnixNano")),
        "temporality": -1,
        "is_monotonic": False,
        "value_int": None, "value_double": None,
        "count": None, "hist_sum": None,
        "bucket_counts": None, "explicit_bounds": None,
        "attributes": _attrs(dp.get("attributes")),
        "resource_attributes": res_attrs,
    }


def export_request_rows(req: dict) -> list[dict]:
    """Flatten one OTLP-JSON ExportMetricsServiceRequest into point-row
    dicts (reference loop shape: resource_metrics → scope_metrics →
    metric → data points, otel_to_moonlink_pb.rs:16-120)."""
    rows: list[dict] = []
    for rm in req.get("resourceMetrics", []):
        res_attrs = _attrs((rm.get("resource") or {}).get("attributes"))
        for sm in rm.get("scopeMetrics", []):
            scope_name = (sm.get("scope") or {}).get("name", "")
            for metric in sm.get("metrics", []):
                if "gauge" in metric:
                    for dp in metric["gauge"].get("dataPoints", []):
                        r = _base("gauge", metric, scope_name, res_attrs, dp)
                        r.update(_number_value(dp))
                        rows.append(r)
                elif "sum" in metric:
                    body = metric["sum"]
                    for dp in body.get("dataPoints", []):
                        r = _base("sum", metric, scope_name, res_attrs, dp)
                        r.update(_number_value(dp))
                        r["temporality"] = int(
                            body.get("aggregationTemporality", 0))
                        r["is_monotonic"] = bool(body.get("isMonotonic", False))
                        rows.append(r)
                elif "histogram" in metric:
                    body = metric["histogram"]
                    for dp in body.get("dataPoints", []):
                        r = _base("histogram", metric, scope_name, res_attrs, dp)
                        r["temporality"] = int(
                            body.get("aggregationTemporality", 0))
                        r["count"] = _i(dp.get("count"))
                        r["hist_sum"] = dp.get("sum")
                        r["bucket_counts"] = [
                            _i(c) for c in dp.get("bucketCounts", [])]
                        r["explicit_bounds"] = [
                            float(x) for x in dp.get("explicitBounds", [])]
                        rows.append(r)
    return rows


def _number_value(dp: dict) -> dict:
    out = {}
    if "asInt" in dp:
        out["value_int"] = _i(dp["asInt"])
    if "asDouble" in dp:
        out["value_double"] = float(dp["asDouble"])
    return out


def export_request_to_table(req: dict) -> pa.Table:
    rows = export_request_rows(req)
    return pa.Table.from_pylist(rows, schema=OTEL_POINT_SCHEMA)


class OtelToRows:
    """map_batches stage: batches with a ``payload`` string column (one
    OTLP-JSON request per row — the HTTP body stream) → point rows.
    Stateless parse; class form keeps the actor-pool shape of the other
    converter stages (sources/avro_ingest.AvroToRows)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for payload in batch["payload"].to_pylist():
            rows.extend(export_request_rows(json.loads(payload)))
        return pa.Table.from_pylist(rows, schema=OTEL_POINT_SCHEMA)


def otel_changes(ds, *, lsn0: int = 1):
    """OTLP payload Dataset → append-only change Dataset (op='I') ready
    for MoonrayTable.merge on an identity='none' table — metrics
    streams are append-only in the reference too. The WHOLE ingest
    commits as one transaction at ``lsn0`` (a per-row dense numbering
    would need a global ordered scan; distributed batches would repeat
    the range and corrupt read-at-LSN semantics)."""

    def tag(batch: pa.Table) -> pa.Table:
        t = OtelToRows()(batch)
        n = len(t)
        ops = pa.array(["I"] * n, pa.string())
        lsns = pa.array([lsn0] * n, pa.int64())
        return t.add_column(0, "lsn", lsns).add_column(0, "op", ops)

    return ds.map_batches(tag, batch_format="pyarrow")

"""Engine-metrics OTEL export (reference latency_exporter.rs /
snapshot_creation.rs analogue): lineage counters flatten to OTLP-JSON,
parse back through moonray's own OTLP ingest, and complete the loop
into an append-only metrics table served by the HTTP service."""

import pyarrow as pa
import ray.data as rd

from moonray.observability import export_table_metrics, read_lineage
from moonray.sources.otel_ingest import export_request_rows
from moonray.table import MoonrayTable


def _merged_table(tmp_path):
    schema = pa.schema([("id", pa.int64()), ("v", pa.string())])
    t = MoonrayTable.create(str(tmp_path / "t"), key_col="id",
                            schema=schema, index_partitions=4,
                            rows_per_fragment=16)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(50), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(50)], pa.string())})))
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["U"] * 10, pa.string()),
        "lsn": pa.array(range(1, 11), pa.int64()),
        "id": pa.array(range(10), pa.int64()),
        "v": pa.array(["u"] * 10, pa.string())})))
    return t


def test_export_otlp_roundtrip(tmp_path):
    t = _merged_table(tmp_path)
    assert read_lineage(t.root), "merge must have recorded lineage"
    out = str(tmp_path / "metrics.json")
    req = export_table_metrics(t.root, out_path=out,
                               resource={"deployment": "test"})
    import json
    import os

    assert os.path.exists(out) and json.load(open(out)) == req

    # parse back through moonray's own OTLP ingest (format proof)
    rows = export_request_rows(req)
    by_name: dict = {}
    for r in rows:
        by_name.setdefault(r["name"], []).append(r)
    hist = by_name["moonray.stage.wall_seconds"]
    assert all(r["metric_type"] == "histogram" and r["count"] >= 1
               and len(r["bucket_counts"]) == 7 for r in hist)
    stages = {a["string_value"] for r in hist
              for a in r["attributes"] if a["key"] == "stage"}
    assert "reduce" in stages or "shuffle" in stages or len(stages) >= 1
    sums = [n for n in by_name if n.startswith("moonray.stage.")
            and n != "moonray.stage.wall_seconds"]
    assert sums, "counter sums must be exported"
    for n in sums:
        for r in by_name[n]:
            assert r["metric_type"] == "sum" and r["is_monotonic"]
            assert (r["value_int"] or 0) >= 0
    res = {a["key"]: a["string_value"] for r in rows
           for a in r["resource_attributes"]}
    assert res["service.name"] == "moonray"
    assert res["deployment"] == "test"


def test_metrics_loop_into_service_table(tmp_path):
    """The reference serves engine metrics through its own OTEL
    endpoint; moonray does the same: export → POST /otel/{t} semantics
    (service handler) → scan the metrics table."""
    from moonray.service import MoonrayService

    t = _merged_table(tmp_path)
    req = export_table_metrics(t.root)

    svc = MoonrayService(str(tmp_path / "wh"))
    svc.create_table("engine_metrics", {
        "schema": [["name", "string"], ["metric_type", "string"],
                   ["value_int", "int64"], ["value_double", "float64"]],
        "identity": "none"})
    # the service route parses the SAME OTLP-JSON shape we export
    out = svc.otel_ingest("engine_metrics", req)
    assert out["rows"] == len(export_request_rows(req)) > 0
    got = svc._table("engine_metrics").scan().take_all()
    assert {r["name"] for r in got} >= {"moonray.stage.wall_seconds"}

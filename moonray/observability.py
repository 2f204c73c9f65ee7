"""Engine-metrics OTEL export — lineage counters → OTLP-JSON.

The reference exports per-operation latency histograms and counters
through an OTEL pipeline (src/moonlink/src/observability/
latency_exporter.rs — BaseLatencyExporter::record per table op — and
snapshot_creation.rs's per-phase histograms; served by the
moonlink_service OTEL endpoint). moonray already RECORDS the
equivalents — every job's lineage log carries per-stage wall time and
counters (rows merged, fragments written, bytes scanned;
moonray/checkpoint.py) — but round 2 shipped no exporter. This module
closes that: it flattens a table's lineage logs into a standard
OTLP-JSON ``ExportMetricsServiceRequest`` that any OTLP/HTTP collector
accepts — including moonray's own ``POST /otel/{t}`` route, so a
moonray warehouse can ingest its own engine telemetry as an
append-only metrics table (the same loop the reference runs).

Metric mapping:

- ``moonray.stage.wall_seconds`` — histogram, one series per stage
  kind, explicit bounds (0.1, 0.5, 1, 5, 30, 120) — the latency
  histogram analogue;
- ``moonray.stage.<counter>`` — monotonic cumulative sums of every
  numeric counter the stages record, attributes {job, stage, unit}.
"""

from __future__ import annotations

import glob
import json
import os
import time

_BOUNDS = [0.1, 0.5, 1.0, 5.0, 30.0, 120.0]


def read_lineage(root: str) -> list[dict]:
    """All lineage records of all jobs under a table root."""
    from moonray.storage import stage_path

    out: list[dict] = []
    lin_dir = os.path.dirname(stage_path(root, "lineage", "x.jsonl"))
    for p in sorted(glob.glob(os.path.join(lin_dir, "*.jsonl"))):
        with open(p) as f:
            out.extend(json.loads(ln) for ln in f if ln.strip())
    return out


def _attr(key: str, val) -> dict:
    if isinstance(val, bool):
        return {"key": key, "value": {"boolValue": val}}
    if isinstance(val, int):
        return {"key": key, "value": {"intValue": str(val)}}
    if isinstance(val, float):
        return {"key": key, "value": {"doubleValue": val}}
    return {"key": key, "value": {"stringValue": str(val)}}


def lineage_to_otlp(records: list[dict], *,
                    resource: dict | None = None,
                    now_unix_nano: int | None = None) -> dict:
    """Lineage records → one OTLP-JSON ExportMetricsServiceRequest."""
    now = now_unix_nano if now_unix_nano is not None else time.time_ns()
    done = [r for r in records if r.get("status") == "done"]

    # latency histogram per stage kind
    hists: dict[str, dict] = {}
    for r in done:
        w = r.get("wall_sec")
        if w is None:
            continue
        h = hists.setdefault(r["stage"], {
            "count": 0, "sum": 0.0,
            "buckets": [0] * (len(_BOUNDS) + 1)})
        h["count"] += 1
        h["sum"] += float(w)
        i = next((i for i, b in enumerate(_BOUNDS) if w <= b), len(_BOUNDS))
        h["buckets"][i] += 1

    hist_points = []
    for stage, h in sorted(hists.items()):
        hist_points.append({
            "attributes": [_attr("stage", stage)],
            "timeUnixNano": str(now),
            "count": str(h["count"]),
            "sum": h["sum"],
            "bucketCounts": [str(c) for c in h["buckets"]],
            "explicitBounds": _BOUNDS,
        })

    # cumulative counter sums per (stage, counter)
    skip = {"job", "stage", "unit", "status", "t", "wall_sec"}
    sums: dict[tuple[str, str], float] = {}
    int_valued: dict[tuple[str, str], bool] = {}
    for r in done:
        for k, v in r.items():
            if k in skip or not isinstance(v, (int, float)) \
                    or isinstance(v, bool):
                continue
            key = (r["stage"], k)
            sums[key] = sums.get(key, 0) + v
            int_valued[key] = int_valued.get(key, True) and isinstance(v, int)

    metrics: list[dict] = []
    if hist_points:
        metrics.append({
            "name": "moonray.stage.wall_seconds",
            "description": "per-stage wall time",
            "unit": "s",
            "histogram": {"aggregationTemporality": 2,
                          "dataPoints": hist_points},
        })
    for (stage, counter), total in sorted(sums.items()):
        dp: dict = {"attributes": [_attr("stage", stage)],
                    "timeUnixNano": str(now)}
        if int_valued[(stage, counter)]:
            dp["asInt"] = str(int(total))
        else:
            dp["asDouble"] = float(total)
        metrics.append({
            "name": f"moonray.stage.{counter}",
            "description": f"cumulative {counter} across jobs",
            "unit": "1",
            "sum": {"aggregationTemporality": 2, "isMonotonic": True,
                    "dataPoints": [dp]},
        })

    res_attrs = [_attr("service.name", "moonray")]
    for k, v in (resource or {}).items():
        res_attrs.append(_attr(k, v))
    return {"resourceMetrics": [{
        "resource": {"attributes": res_attrs},
        "scopeMetrics": [{
            "scope": {"name": "moonray.engine"},
            "metrics": metrics,
        }],
    }]}


def export_table_metrics(root: str, *, out_path: str | None = None,
                         resource: dict | None = None) -> dict:
    """Flatten a table root's lineage into one OTLP request; optionally
    write it to ``out_path`` (the file a collector sidecar would
    scrape / a curl would POST to any OTLP/HTTP endpoint — including
    moonray's own /otel/{t} route)."""
    req = lineage_to_otlp(read_lineage(root),
                          resource={"moonray.table_root": root,
                                    **(resource or {})})
    if out_path:
        from moonray.util import atomic_write_json

        atomic_write_json(out_path, req)
    return req

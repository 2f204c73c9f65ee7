"""End-to-end HTTP service shim: create a table over HTTP, ingest JSON
rows (insert/upsert/delete — rest_api.rs:1073-1075 operation set), run
maintenance, scan back, drop. Uses a real ThreadingHTTPServer on an
ephemeral port inside the test's Ray session."""

import json
import urllib.request

import pytest

from moonray.service import start_in_thread


@pytest.fixture()
def svc(tmp_path):
    server, base = start_in_thread(str(tmp_path / "wh"))
    yield base
    server.shutdown()


def _call(method, url, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as ex:
        return ex.code, json.loads(ex.read())


def test_http_roundtrip(svc):
    st, h = _call("GET", f"{svc}/health")
    assert st == 200 and h["status"] == "healthy"

    st, r = _call("POST", f"{svc}/tables/events", {
        "schema": [["id", "int64"], ["name", "string"], ["score", "float64"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 4,
    })
    assert st == 200 and r == {"created": "events"}
    # duplicate create → 409
    st, _ = _call("POST", f"{svc}/tables/events", {
        "schema": [["id", "int64"]], "key_col": "id"})
    assert st == 409

    st, s = _call("GET", f"{svc}/schema/events")
    assert st == 200 and ["id", "int64"] in s["schema"]

    st, r = _call("POST", f"{svc}/ingest/events", {
        "operation": "insert",
        "data": [{"id": i, "name": f"n{i}", "score": float(i)}
                 for i in range(10)]})
    assert st == 200 and r["rows"] == 10

    st, r = _call("POST", f"{svc}/ingest/events", {
        "operation": "upsert", "data": {"id": 3, "name": "upd", "score": 99.0}})
    assert st == 200
    st, r = _call("POST", f"{svc}/ingest/events", {
        "operation": "delete", "data": {"id": 7}})
    assert st == 200

    st, d = _call("GET", f"{svc}/tables/events")
    assert st == 200 and d["cardinality"] == 9

    st, r = _call("POST", f"{svc}/tables/events/maintain", {})
    assert st == 200 and "actions" in r
    st, r = _call("POST", f"{svc}/tables/events/optimize", {"mode": "full"})
    assert st == 200

    st, sc = _call("GET", f"{svc}/tables/events/scan?limit=100")
    assert st == 200
    rows = {r["id"]: r for r in sc["rows"]}
    assert len(rows) == 9 and rows[3]["name"] == "upd" and 7 not in rows

    st, hist = _call("GET", f"{svc}/tables/events/history")
    assert st == 200 and len(hist["history"]) >= 1

    # index-served point lookup over HTTP
    st, lk = _call("POST", f"{svc}/tables/events/lookup",
                   {"keys": [3, 7, 999], "columns": ["id", "name"]})
    assert st == 200
    assert {r["id"]: r["name"] for r in lk["rows"]} == {3: "upd"}

    # changelog read over HTTP: everything since the empty table
    st, ch = _call("GET", f"{svc}/tables/events/changes?from=0")
    assert st == 200
    net = {}
    for r in ch["rows"]:
        net[r["id"]] = net.get(r["id"], 0) + (1 if r["change_type"] == "insert" else -1)
    assert sum(net.values()) == 9
    st, _ = _call("GET", f"{svc}/tables/events/changes")
    assert st == 400  # from= is required

    # bad operation → 400; unknown table → 404; unknown route → 404
    st, _ = _call("POST", f"{svc}/ingest/events",
                  {"operation": "replace", "data": {"id": 1}})
    assert st == 400
    st, _ = _call("GET", f"{svc}/tables/nope")
    assert st == 404
    st, _ = _call("GET", f"{svc}/bogus")
    assert st == 404

    st, r = _call("DELETE", f"{svc}/tables/events")
    assert st == 200
    st, t = _call("GET", f"{svc}/tables")
    assert st == 200 and t["tables"] == {}

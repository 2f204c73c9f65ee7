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


def test_scanplan_union_read(svc):
    """/scanplan hands out the union-read STATE (fragment parquet paths +
    DV delta files) — the scan_table_begin analogue: an external SQL
    engine reconstructs exact rows with plain pyarrow+numpy, no
    row-JSON proxying. Pins survive snapshot expiry until scan_end."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    _call("POST", f"{svc}/tables/ev2", {
        "schema": [["id", "int64"], ["name", "string"]],
        "key_col": "id", "rows_per_fragment": 4, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/ev2", {
        "operation": "insert",
        "data": [{"id": i, "name": f"n{i}"} for i in range(12)]})
    _call("POST", f"{svc}/ingest/ev2", {
        "operation": "delete", "data": [{"id": 3}, {"id": 7}]})

    st, plan = _call("GET", f"{svc}/tables/ev2/scanplan?pin=1")
    assert st == 200 and plan["pin_token"] and plan["fragments"]
    assert any(f["dv_paths"] for f in plan["fragments"])  # the delete's DV

    def union_read(p):
        rows = {}
        for f in p["fragments"]:
            t = pq.read_table(os.path.join(p["root"], f["path"]))
            dead = np.zeros(0, np.uint32)
            for rel in f["dv_paths"]:
                dead = np.union1d(dead, np.load(os.path.join(p["root"], rel)))
            live = t.filter(pa.array(~np.isin(
                np.asarray(t["_rowoff"].combine_chunks()), dead)))
            rows.update({r["id"]: r["name"] for r in live.to_pylist()})
        return rows

    got = union_read(plan)
    assert len(got) == 10 and 3 not in got and got[0] == "n0"

    # move the table forward, expire old snapshots — the pinned plan
    # must stay readable (ReadState pin lifecycle)
    _call("POST", f"{svc}/ingest/ev2", {
        "operation": "upsert", "data": {"id": 0, "name": "upd"}})
    _call("POST", f"{svc}/tables/ev2/optimize", {"mode": "full"})
    st, r = _call("POST", f"{svc}/tables/ev2/expire", {"keep_last": 1})
    assert st == 200
    assert union_read(plan) == got  # pinned snapshot intact
    st, r = _call("POST", f"{svc}/tables/ev2/scan_end",
                  {"token": plan["pin_token"]})
    assert st == 200
    # lsn-resolved plan of the current state sees the upsert
    st, plan2 = _call("GET", f"{svc}/tables/ev2/scanplan")
    assert st == 200 and plan2["pin_token"] is None
    assert union_read(plan2)[0] == "upd"


def test_kafka_avro_routes(svc):
    """Kafka-shaped ingest: register an Avro schema (creates the table),
    push base64 Avro datums, read back (reference /kafka/{t} routes +
    avro_converter.rs)."""
    import base64

    from moonray.sources.avro_ingest import encode_avro, parse_avro_schema

    schema_json = ('{"type":"record","name":"click","fields":['
                   '{"name":"id","type":"long"},'
                   '{"name":"page","type":"string"},'
                   '{"name":"ms","type":"double"}]}')
    st, r = _call("POST", f"{svc}/kafka/clicks/schema", {
        "avro_schema": schema_json, "key_field": "id",
        "rows_per_fragment": 8, "index_partitions": 2})
    assert st == 200 and ["id", "int64"] in r["schema"]

    schema = parse_avro_schema(schema_json)
    recs = [base64.b64encode(encode_avro(
        schema, {"id": i, "page": f"/p{i % 3}", "ms": float(i)})).decode()
        for i in range(7)]
    st, r = _call("POST", f"{svc}/kafka/clicks/ingest", {"records": recs})
    assert st == 200 and r["rows"] == 7
    st, sc = _call("GET", f"{svc}/tables/clicks/scan?limit=100")
    assert st == 200
    rows = {r["id"]: r for r in sc["rows"]}
    assert len(rows) == 7 and rows[4]["page"] == "/p1" and rows[4]["ms"] == 4.0
    # ingest without a registered schema → 409
    st, _ = _call("POST", f"{svc}/kafka/unknown/ingest", {"records": recs})
    assert st == 409


def test_kafka_schema_survives_service_restart(tmp_path):
    """The Avro schema persists in the catalog registry — a restarted
    service (new process over the same warehouse) keeps ingesting."""
    import base64

    from moonray.service import MoonrayService
    from moonray.sources.avro_ingest import encode_avro, parse_avro_schema

    wh = str(tmp_path / "wh")
    schema_json = ('{"type":"record","name":"r","fields":['
                   '{"name":"id","type":"long"},'
                   '{"name":"v","type":"double"}]}')
    svc1 = MoonrayService(wh)
    svc1.kafka_schema("m1", {"avro_schema": schema_json, "key_field": "id",
                             "rows_per_fragment": 8, "index_partitions": 2})
    schema = parse_avro_schema(schema_json)
    recs = [base64.b64encode(encode_avro(schema, {"id": i, "v": float(i)})
                             ).decode() for i in range(3)]
    svc1.kafka_ingest("m1", {"records": recs})

    svc2 = MoonrayService(wh)  # fresh process analogue
    svc2.kafka_ingest("m1", {"records": [base64.b64encode(
        encode_avro(schema, {"id": 99, "v": 9.9})).decode()]})
    assert svc2._table("m1").scan().count() == 4
    # re-registering a MISMATCHED schema is rejected
    import pytest

    from moonray.service import ServiceError

    bad = ('{"type":"record","name":"r","fields":['
           '{"name":"id","type":"string"}]}')
    with pytest.raises(ServiceError, match="does not match"):
        svc2.kafka_schema("m1", {"avro_schema": bad})


def test_ingestpb_route(svc):
    """POST /ingestpb: binary MoonlinkRow protobuf datums (base64)
    decoded positionally onto the table schema (rest_api.rs:417)."""
    import base64

    from moonray.sources.proto_ingest import encode_moonlink_row

    st, _ = _call("POST", f"{svc}/tables/pb", {
        "schema": [["id", "int64"], ["name", "string"], ["score", "float64"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 4,
    })
    assert st == 200
    datums = [base64.b64encode(encode_moonlink_row(
        [(i, "int64"), (f"n{i}".encode(), "bytes"), (float(i) / 2, "float64")]
    )).decode() for i in range(6)]
    st, r = _call("POST", f"{svc}/ingestpb/pb",
                  {"operation": "insert", "data": datums})
    assert st == 200 and r["rows"] == 6
    st, r = _call("POST", f"{svc}/ingestpb/pb", {
        "operation": "upsert",
        "data": base64.b64encode(encode_moonlink_row(
            [(2, "int64"), (b"upd", "bytes"), (9.5, "float64")])).decode()})
    assert st == 200
    st, s = _call("GET", f"{svc}/tables/pb/scan?limit=100")
    rows = {r["id"]: r for r in s["rows"]}
    assert len(rows) == 6 and rows[2]["name"] == "upd"
    assert rows[3]["score"] == 1.5
    # malformed datum → 400
    st, _ = _call("POST", f"{svc}/ingestpb/pb",
                  {"operation": "insert", "data": "!!notb64!!"})
    assert st == 400


def test_async_ingest_wal_buffering_and_flush(svc):
    """request_mode=async acks without committing (rows invisible),
    /flush folds the WAL into one merge (rows visible), WAL empty."""
    st, _ = _call("POST", f"{svc}/tables/buf", {
        "schema": [["id", "int64"], ["v", "string"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 4})
    assert st == 200
    _call("POST", f"{svc}/ingest/buf", {
        "operation": "insert",
        "data": [{"id": i, "v": f"a{i}"} for i in range(4)]})
    st, r = _call("POST", f"{svc}/ingest/buf", {
        "operation": "upsert", "request_mode": "async",
        "data": {"id": 1, "v": "upd"}})
    assert st == 200 and r["buffered"] and r["pending_events"] == 1
    st, r = _call("POST", f"{svc}/ingest/buf", {
        "operation": "delete", "request_mode": "async",
        "data": {"id": 3}})
    assert st == 200 and r["pending_events"] == 2
    # not yet visible
    st, s = _call("GET", f"{svc}/tables/buf/scan?limit=100")
    assert {r["id"]: r["v"] for r in s["rows"]}[1] == "a1"
    # flush folds the two events in ack order
    st, r = _call("POST", f"{svc}/tables/buf/flush", {})
    assert st == 200 and r["folded_events"] == 2
    st, s = _call("GET", f"{svc}/tables/buf/scan?limit=100")
    rows = {r["id"]: r["v"] for r in s["rows"]}
    assert rows == {0: "a0", 1: "upd", 2: "a2"}


def test_async_ingest_survives_service_crash(tmp_path):
    """Kill the service after async-ingest acks but before any fold; a
    restarted service over the same warehouse replays the WAL and the
    state matches what a never-crashed sync ingest would produce
    (reference recovery, wal.rs:670-760). Idempotency: a second
    recovery fold of the same seq range must not duplicate."""
    from moonray.service import MoonrayService
    from moonray.wal import EventWal

    wh = str(tmp_path / "wh")
    svc1 = MoonrayService(wh)
    import pyarrow as pa

    svc1.create_table("t", {"schema": [["id", "int64"], ["v", "string"]],
                            "key_col": "id", "rows_per_fragment": 8,
                            "index_partitions": 4})
    svc1.ingest("t", {"operation": "insert",
                      "data": [{"id": i, "v": f"a{i}"} for i in range(5)]})
    svc1.ingest("t", {"operation": "upsert", "request_mode": "async",
                      "data": [{"id": 0, "v": "upd0"}, {"id": 9, "v": "new9"}]})
    svc1.ingest("t", {"operation": "delete", "request_mode": "async",
                      "data": {"id": 4}})
    committed_before = {r["id"]: r["v"]
                        for r in svc1._table("t").scan().take_all()}
    assert committed_before == {i: f"a{i}" for i in range(5)}
    del svc1  # crash: events ack'd, never folded

    t_root = MoonrayService(wh)._table("t").root
    # (recovery already ran in that constructor — assert on a fresh one)
    svc2 = MoonrayService(wh)
    got = {r["id"]: r["v"] for r in svc2._table("t").scan().take_all()}
    assert got == {0: "upd0", 1: "a1", 2: "a2", 3: "a3", 9: "new9"}
    assert len(EventWal(t_root)) == 0  # truncated after the fold
    # fold again → no-op
    assert svc2._fold_wal("t", svc2._table("t"))["folded_events"] == 0


def test_scanplan_server_side_zone_pruning(svc):
    """?ranges= / ?in= prune the scanplan's fragment list by zone maps
    server-side; the echo in pruned_by tells the consumer the plan is
    partial. Union-reading the pruned plan + the owed row filter
    reproduces the exact answer."""
    import json as _json
    import os
    from urllib.parse import quote

    import numpy as np
    import pyarrow.parquet as pq

    _call("POST", f"{svc}/tables/zp1", {
        "schema": [["id", "int64"], ["v", "int64"]],
        "key_col": "id", "zone_cols": ["v"],
        "rows_per_fragment": 8, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/zp1", {
        "operation": "insert",
        "data": [{"id": i, "v": i} for i in range(64)]})

    st, full = _call("GET", f"{svc}/tables/zp1/scanplan")
    st2, pruned = _call("GET", f"{svc}/tables/zp1/scanplan?ranges="
                        + quote(_json.dumps({"v": [0, 9]})))
    assert st == st2 == 200
    assert 0 < len(pruned["fragments"]) < len(full["fragments"])
    assert pruned["pruned_by"]["ranges"] == {"v": [0, 9]}

    ids = set()
    for f in pruned["fragments"]:
        t = pq.read_table(os.path.join(pruned["root"], f["path"]),
                          columns=["id", "v"])
        v = np.asarray(t["v"].combine_chunks())
        ids.update(np.asarray(t["id"].combine_chunks())[
            (v >= 0) & (v <= 9)].tolist())
    assert ids == set(range(10))

    st3, by_in = _call("GET", f"{svc}/tables/zp1/scanplan?in="
                       + quote(_json.dumps({"v": [3, 60]})))
    assert st3 == 200
    assert 0 < len(by_in["fragments"]) < len(full["fragments"])
    assert by_in["pruned_by"]["in"] == {"v": [3, 60]}


def test_scanplan_bad_pruning_spec_is_400_and_leaks_no_pin(svc):
    """Malformed or type-mismatched ?ranges=/?in= are client errors
    (400), and a pin taken before the failure is rolled back — a leaked
    pin would block snapshot expiry forever with no token to release."""
    import json as _json
    from urllib.parse import quote

    from moonray.manifest import pinned_versions

    _call("POST", f"{svc}/tables/zp2", {
        "schema": [["id", "int64"], ["v", "int64"]],
        "key_col": "id", "zone_cols": ["v"],
        "rows_per_fragment": 8, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/zp2", {
        "operation": "insert",
        "data": [{"id": i, "v": i} for i in range(16)]})
    st0, desc = _call("GET", f"{svc}/tables/zp2")
    root = None
    # recover the table root from a scanplan (no pin)
    _, plan = _call("GET", f"{svc}/tables/zp2/scanplan")
    root = plan["root"]
    before = pinned_versions(root)

    st1, body1 = _call("GET", f"{svc}/tables/zp2/scanplan?ranges=notjson")
    assert st1 == 400 and "ranges" in body1["error"]

    st2, body2 = _call(
        "GET", f"{svc}/tables/zp2/scanplan?pin=1&ranges="
        + quote(_json.dumps({"v": ["a", None]})))
    assert st2 == 400
    assert pinned_versions(root) == before   # the pin was rolled back

    st3, plan3 = _call("GET", f"{svc}/tables/zp2/scanplan?ranges="
                       + quote(_json.dumps({"v": [0, 3]})))
    assert st3 == 200 and plan3["fragments"]


def test_scanplan_by_ref(svc):
    """?ref= resolves a named tag server-side; unknown refs 404; ref
    with version/lsn is a 400."""
    _call("POST", f"{svc}/tables/refs1", {
        "schema": [["id", "int64"], ["name", "string"]],
        "key_col": "id", "rows_per_fragment": 4, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/refs1", {
        "operation": "insert",
        "data": [{"id": i, "name": f"n{i}"} for i in range(8)]})

    from moonray.table import MoonrayTable

    st, info = _call("GET", f"{svc}/tables/refs1/scanplan")
    t = MoonrayTable.open(info["root"])
    tagged_v = t.tag("rel")

    _call("POST", f"{svc}/ingest/refs1", {
        "operation": "insert", "data": [{"id": 100, "name": "late"}]})

    st, plan = _call("GET", f"{svc}/tables/refs1/scanplan?ref=rel")
    assert st == 200 and plan["version"] == tagged_v
    st, cur = _call("GET", f"{svc}/tables/refs1/scanplan")
    assert st == 200 and cur["version"] > tagged_v

    st, _ = _call("GET", f"{svc}/tables/refs1/scanplan?ref=nope")
    assert st == 404
    st, _ = _call("GET", f"{svc}/tables/refs1/scanplan?ref=rel&version=1")
    assert st == 400


def test_scanplan_bloom_pruning(svc):
    """A bloom column index prunes the scanplan fragment list for ?in=
    predicates on NON-zone, high-cardinality columns — where zone maps
    keep everything."""
    import json as _json
    from urllib.parse import quote

    from moonray.table import MoonrayTable

    _call("POST", f"{svc}/tables/bp1", {
        "schema": [["id", "int64"], ["name", "string"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/bp1", {
        "operation": "insert",
        "data": [{"id": i, "name": f"user-{i:04d}"} for i in range(64)]})

    q = "?in=" + quote(_json.dumps({"name": ["user-0042"]}))
    st, before = _call("GET", f"{svc}/tables/bp1/scanplan{q}")
    st2, full = _call("GET", f"{svc}/tables/bp1/scanplan")
    assert st == st2 == 200
    # name has no zone map → nothing prunes before the index exists
    assert len(before["fragments"]) == len(full["fragments"]) >= 8

    MoonrayTable.open(full["root"]).build_column_index("name")
    st3, after = _call("GET", f"{svc}/tables/bp1/scanplan{q}")
    assert st3 == 200
    assert 1 <= len(after["fragments"]) <= 2  # the hit + fpp slack
    assert after["pruned_by"]["in"] == {"name": ["user-0042"]}


def test_scanplan_bloom_type_mismatch_is_400_no_pin_leak(svc):
    """Review finding (session 4): IN-list values that don't cast to a
    bloom-indexed column's type must 400 and release the pin (ArrowInvalid
    is a ValueError, which the TypeError-only cleanup used to miss)."""
    import json as _json
    from urllib.parse import quote

    from moonray.table import MoonrayTable

    _call("POST", f"{svc}/tables/bp2", {
        "schema": [["id", "int64"], ["name", "string"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/bp2", {
        "operation": "insert",
        "data": [{"id": i, "name": f"u{i}"} for i in range(16)]})
    st, full = _call("GET", f"{svc}/tables/bp2/scanplan")
    t = MoonrayTable.open(full["root"])
    t.build_column_index("name")

    q = "?pin=1&in=" + quote(_json.dumps({"name": [123]}))
    st, body = _call("GET", f"{svc}/tables/bp2/scanplan{q}")
    assert st == 400, body
    # the pin written before pruning must have been released
    from moonray.commitstore import store_for
    import os as _os
    scan_pins = [r for r in store_for(t.root).list("pins")
                 if _os.path.basename(r).startswith("scan-")]
    assert not scan_pins


def test_vacuum_and_colindex_routes(svc):
    import os

    _call("POST", f"{svc}/tables/vc1", {
        "schema": [["id", "int64"], ["name", "string"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/vc1", {
        "operation": "insert",
        "data": [{"id": i, "name": f"u{i}"} for i in range(32)]})

    st, r = _call("POST", f"{svc}/tables/vc1/colindex", {"col": "name"})
    assert st == 200 and r["indexed"] == r["fragments"] > 0
    st, _ = _call("POST", f"{svc}/tables/vc1/colindex", {"col": "nope"})
    assert st == 400
    st, _ = _call("POST", f"{svc}/tables/vc1/colindex", {})
    assert st == 400

    st, full = _call("GET", f"{svc}/tables/vc1/scanplan")
    with open(os.path.join(full["root"], "fragments/orphan.parquet"),
              "wb") as f:
        f.write(b"junk")
    st, r = _call("POST", f"{svc}/tables/vc1/vacuum",
                  {"grace_seconds": 0, "dry_run": True})
    assert st == 200 and r["orphans"] == ["fragments/orphan.parquet"]
    st, r = _call("POST", f"{svc}/tables/vc1/vacuum", {"grace_seconds": 0})
    assert st == 200 and r["deleted"] == 1
    st, d = _call("GET", f"{svc}/tables/vc1")
    assert st == 200 and d["cardinality"] == 32


def test_analyze_and_validate_routes(svc):
    _call("POST", f"{svc}/tables/av1", {
        "schema": [["id", "int64"], ["name", "string"], ["v", "float64"]],
        "key_col": "id", "rows_per_fragment": 8, "index_partitions": 2,
    })
    _call("POST", f"{svc}/ingest/av1", {
        "operation": "insert",
        "data": [{"id": i, "name": f"u{i % 5}", "v": float(i)}
                 for i in range(32)]})

    st, r = _call("POST", f"{svc}/tables/av1/analyze",
                  {"columns": ["id", "name"]})
    assert st == 200
    prof = {c["column"]: c for c in r["columns"]}
    assert prof["id"]["n_rows"] == 32 and prof["id"]["n_distinct"] == 32
    assert prof["name"]["n_distinct"] == 5
    st, _ = _call("POST", f"{svc}/tables/av1/analyze",
                  {"columns": ["nope"]})
    assert st == 400

    # default unique = identity key; clean table → ok
    st, r = _call("POST", f"{svc}/tables/av1/validate", {})
    assert st == 200 and r["ok"] is True
    assert r["constraints"] == [{"constraint": "unique", "column": "id",
                                 "n_violations": 0}]
    # a violated range reports ok=False with the count
    st, r = _call("POST", f"{svc}/tables/av1/validate",
                  {"ranges": {"v": [0, 10]}, "unique": []})
    assert st == 200 and r["ok"] is False
    assert r["constraints"][0]["n_violations"] == 21

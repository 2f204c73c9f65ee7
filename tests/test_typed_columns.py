"""Extended Arrow types end-to-end (round-4 VERDICT item 1): decimal,
date32, time64, timestamp(µs), FixedSizeBinary[16]/UUID, list and
struct columns through table schema, fragment IO, zone maps, identity
hashing, MERGE, predicate pruning, point lookup, and the Iceberg/Delta
export round trips — the reference's ingest data model
(src/moonlink/src/row/moonlink_type.rs:5-21)."""

import datetime
import decimal
import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

D = decimal.Decimal
EPOCH = datetime.date(1970, 1, 1)


def _typed_table(n: int, shift: int = 0) -> pa.Table:
    ks = np.arange(n, dtype=np.int64) + shift
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "price": pa.array([D(f"{(int(k) * 7) % 1000}.{int(k) % 100:02d}")
                           for k in ks], pa.decimal128(12, 2)),
        "day": pa.array([int(k) % 3000 for k in ks], pa.date32()),
        "ts": pa.array([int(k) * 1_000_000 for k in ks],
                       pa.timestamp("us")),
        "tod": pa.array([int(k) * 1000 % 86_400_000_000 for k in ks],
                        pa.time64("us")),
        "uid": pa.array([hashlib.md5(str(k).encode()).digest()
                         for k in ks], pa.binary(16)),
        "tags": pa.array([[f"t{int(k) % 3}", f"u{int(k) % 5}"]
                          for k in ks], pa.list_(pa.string())),
        "meta": pa.array([{"w": int(k) % 640, "h": int(k) % 480}
                          for k in ks],
                         pa.struct([("w", pa.int32()), ("h", pa.int32())])),
    })


def _mk_typed(prefix: str, n: int = 600, rpf: int = 100):
    import ray.data as rd

    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    t = MoonrayTable.create(
        scratch_root(prefix), key_col="k", schema=_typed_table(0).schema,
        zone_cols=("price", "day", "ts", "uid"), rows_per_fragment=rpf,
        index_partitions=4)
    t.bulk_load(rd.from_arrow(_typed_table(n)))
    return t


def _expected_after_merge(n: int) -> dict[int, dict]:
    rows = {r["k"]: r for r in _typed_table(n).to_pylist()}
    for k in range(0, n, 5):          # deletes
        rows.pop(k, None)
    upd = {r["k"]: r for r in _typed_table(n, shift=0).to_pylist()}
    for k in range(1, n, 5):          # updates: price += 1000.01, day += 7
        r = dict(upd[k])
        r["price"] = r["price"] + D("1000.01")
        r["day"] = r["day"] + datetime.timedelta(days=7)
        rows[k] = r
    for k in range(n, n + 50):        # inserts past the tail
        rows[k] = _typed_table(1, shift=k).to_pylist()[0]
    return rows


def _changes(n: int) -> pa.Table:
    base = _typed_table(n)
    dels = base.filter(pc.equal(pa.array(base["k"].to_numpy(zero_copy_only=False) % 5), 0))
    ups = base.filter(pc.equal(pa.array(base["k"].to_numpy(zero_copy_only=False) % 5), 1))
    ups = (ups.set_column(ups.column_names.index("price"), "price",
                          pc.cast(pc.add(ups["price"], pa.scalar(
                              D("1000.01"), pa.decimal128(12, 2))),
                              pa.decimal128(12, 2)))
           .set_column(ups.column_names.index("day"), "day",
                       pc.cast(pc.cast(pc.add(pc.cast(ups["day"], pa.int32()),
                                              7), pa.int32()), pa.date32())))
    ins = _typed_table(50, shift=n)
    parts = []
    for op, t in (("D", dels), ("U", ups), ("I", ins)):
        lsn = pa.array(t["k"].to_numpy(zero_copy_only=False) + 10_000,
                       pa.int64())
        cols = {"op": pa.array([op] * len(t), pa.string()), "lsn": lsn}
        for c in t.column_names:
            cols[c] = (t[c] if op != "D" or c == "k"
                       else pa.nulls(len(t), t.schema.field(c).type))
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


@pytest.fixture(scope="module")
def merged():
    import ray.data as rd

    t = _mk_typed("mr-typed-", n=600)
    t.merge(rd.from_arrow(_changes(600)), job_id="typed-merge")
    return t, _expected_after_merge(600)


def _assert_rows_equal(got_rows: list[dict], want: dict[int, dict]):
    assert len(got_rows) == len(want)
    for r in got_rows:
        w = want[r["k"]]
        for c, v in w.items():
            assert r[c] == v, (r["k"], c, r[c], v)


def test_typed_merge_scan_exact(merged):
    t, want = merged
    _assert_rows_equal(t.scan().take_all(), want)


def test_typed_zone_pruning_prunes_and_matches(merged):
    t, want = merged
    m = t.manifest()
    # decimal range: updated rows carry price >= 1000.01 — the range
    # must both PRUNE fragments and return the exact row set
    lo = D("1000.00")
    pruned = t.scan(predicate_ranges={"price": (lo, None)})
    from moonray.table import _zones_overlap

    from moonray import types as ty

    schema = t.schema()
    enc = ty.encode_ranges({"price": (lo, None)}, schema)
    kept = [f for f in m["fragments"] if _zones_overlap(f["zones"], enc)]
    assert 0 < len(kept) < len(m["fragments"]), "range should prune"
    got = pruned.to_pandas()
    got = got[got["price"] >= lo]
    want_ks = sorted(k for k, r in want.items() if r["price"] >= lo)
    assert sorted(got["k"]) == want_ks

    # date range with ISO-string bounds + exact_filter pushdown
    day_lo, day_hi = "1970-04-01", datetime.date(1970, 6, 1)
    ds = t.scan(predicate_ranges={"day": (day_lo, day_hi)},
                exact_filter=True)
    got_ks = sorted(r["k"] for r in ds.take_all())
    want_ks = sorted(k for k, r in want.items()
                     if datetime.date(1970, 4, 1) <= r["day"]
                     <= datetime.date(1970, 6, 1))
    assert got_ks == want_ks


def test_typed_predicate_in_uuid(merged):
    t, want = merged
    uids = [hashlib.md5(b"17").digest(), hashlib.md5(b"23").digest()]
    got = t.scan(predicate_in={"uid": uids}).take_all()
    got_ks = sorted(r["k"] for r in got)
    assert got_ks == [k for k in (17, 23) if k in want]


def test_typed_lookup_point_reads(merged):
    t, want = merged
    keys = [1, 6, 599, 607]
    got = t.lookup([k for k in keys if k in want])
    _assert_rows_equal(got.to_pylist(),
                       {k: want[k] for k in keys if k in want})
    assert len(t.lookup([0])) == 0  # deleted key


def test_typed_iceberg_export_roundtrip(merged, tmp_path):
    import duckdb

    from moonray.sinks.iceberg import export_iceberg
    from moonray.sources.iceberg_read import read_iceberg_dataset

    t, want = merged
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    back = read_iceberg_dataset(dest)
    got = pa.concat_tables(list(back.iter_batches(batch_format="pyarrow",
                                                  batch_size=4096)))
    _assert_rows_equal(got.to_pylist(), want)
    # typed bound pruning on the export: decimal range reads fewer files
    pruned = read_iceberg_dataset(dest,
                                  ranges={"price": (D("1000.00"), None)})
    rows = pruned.take_all()
    assert {r["k"] for r in rows} >= {k for k, r in want.items()
                                      if r["price"] >= D("1000.00")}
    # metadata declares the extended types
    import json

    meta_dir = os.path.join(dest, "metadata")
    mfile = sorted(f for f in os.listdir(meta_dir) if f.endswith(".json"))[-1]
    meta = json.load(open(os.path.join(meta_dir, mfile)))
    fields = {f["name"]: f["type"] for f in meta["schemas"][-1]["fields"]}
    assert fields["price"] == "decimal(12, 2)"
    assert fields["day"] == "date"
    assert fields["ts"] == "timestamp"
    assert fields["tod"] == "time"
    assert fields["uid"] == "uuid"
    assert fields["tags"]["type"] == "list"
    assert fields["meta"]["type"] == "struct"


def test_typed_delta_export_roundtrip(merged, tmp_path):
    import ray.data as rd

    from moonray.sinks.delta import export_delta, read_delta_paths
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    # Delta has no TIME type: exporting a time64 column raises loudly
    t_full, _want = merged
    with pytest.raises(ValueError, match="no Delta mapping"):
        export_delta(t_full, str(tmp_path / "delta-bad"))

    base = _typed_table(200).drop_columns(["tod"])
    t = MoonrayTable.create(
        scratch_root("mr-typed-delta-"), key_col="k", schema=base.schema,
        zone_cols=("price", "day"), rows_per_fragment=64,
        index_partitions=2)
    t.bulk_load(rd.from_arrow(base))
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    import pyarrow.parquet as pq

    got = pa.concat_tables([pq.read_table(p).drop_columns(["_rowoff"])
                            if "_rowoff" in pq.read_table(p).column_names
                            else pq.read_table(p)
                            for p in read_delta_paths(dest)])
    want = {r["k"]: r for r in base.to_pylist()}
    got = got.select([c for c in got.column_names
                      if c in base.column_names])
    _assert_rows_equal(got.to_pylist(), want)
    import json

    log = open(os.path.join(dest, "_delta_log",
                            f"{0:020d}.json")).read().splitlines()
    meta = next(json.loads(l)["metaData"] for l in log
                if "metaData" in json.loads(l))
    fields = {f["name"]: f["type"]
              for f in json.loads(meta["schemaString"])["fields"]}
    assert fields["price"] == "decimal(12,2)"
    assert fields["day"] == "date"
    assert fields["ts"] == "timestampNtz"
    assert fields["uid"] == "binary"


def test_typed_composite_key_identity():
    """Composite (uuid, date) key: _ckey encoding must be injective for
    FSB + date values (hex + ISO forms)."""
    import ray.data as rd

    from moonray.identity import encode_key_column
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    n = 120
    base = _typed_table(n).select(["uid", "day", "price", "k"])
    t = MoonrayTable.create(
        scratch_root("mr-typedck-"), key_cols=["uid", "day"],
        schema=base.schema, rows_per_fragment=50, index_partitions=2)
    t.bulk_load(rd.from_arrow(base))
    # UPDATE half the rows through the composite key
    upd = base.filter(pc.less(base["k"], 60))
    upd = upd.set_column(upd.column_names.index("price"), "price",
                         pc.cast(pc.add(upd["price"], pa.scalar(
                             D("5.00"), pa.decimal128(12, 2))),
                             pa.decimal128(12, 2)))
    ch = pa.table({
        "op": pa.array(["U"] * len(upd), pa.string()),
        "lsn": pa.array(np.arange(len(upd)) + 1, pa.int64()),
        **{c: upd[c] for c in upd.column_names},
    })
    t.merge(rd.from_arrow(ch), job_id="typed-ck")
    got = t.scan().to_pandas().sort_values("k")
    assert len(got) == n
    base_pd = base.to_pandas().sort_values("k")
    bumped = got["k"] < 60
    assert (got.loc[bumped, "price"].to_numpy()
            == (base_pd.loc[base_pd["k"] < 60, "price"]
                + D("5.00")).to_numpy()).all()
    # injectivity probe: ckey of distinct (uid, day) rows is distinct
    enc = encode_key_column(base, ["uid", "day"])
    assert len(set(enc.to_pylist())) == n


def test_struct_list_key_encoding_injective():
    from moonray.identity import encode_key_column

    t = pa.table({
        "s": pa.array([{"x": 1, "y": "a"}, {"x": 1, "y": "b"},
                       {"x": 2, "y": "a"}],
                      pa.struct([("x", pa.int64()), ("y", pa.string())])),
        "l": pa.array([[1, 2], [1], [2, 1]], pa.list_(pa.int64())),
    })
    es = encode_key_column(t, ["s"]).to_pylist()
    el = encode_key_column(t, ["l"]).to_pylist()
    assert len(set(es)) == 3 and len(set(el)) == 3


def test_nonstandard_temporal_units_zone_and_hash():
    """date64 (ms) / timestamp(ms) / time32(s) columns must zone-map
    and hash in the CANONICAL encoded units (days / µs) — raw-unit
    zones pruned every fragment for day-scale bounds (review finding),
    and time32 had no int64 cast at all."""
    import ray.data as rd

    from moonray import types as ty
    from moonray.table import MoonrayTable, _zones_overlap
    from moonray.util import hash_key_array, scratch_root

    n = 200
    tbl = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "d64": pa.array((np.arange(n) + 18000) * 86_400_000,
                        pa.date64()),
        "tsms": pa.array(np.arange(n) * 1000, pa.timestamp("ms")),
        "t32": pa.array((np.arange(n) % 86_400).astype(np.int32))
        .cast(pa.time32("s")),
    })
    # hashing: canonical units mean date64 hashes equal date32 of the
    # same day, and time32(s) equals time64(us) of the same instant
    h64 = hash_key_array(tbl["d64"].combine_chunks())
    h32 = hash_key_array(pa.array(np.arange(n, dtype=np.int32) + 18000,
                                  pa.date32()))
    assert (h64 == h32).all()
    a32 = hash_key_array(tbl["t32"].combine_chunks())
    a64 = hash_key_array(pa.array((np.arange(n) % 86_400) * 1_000_000,
                                  pa.time64("us")))
    assert (a32 == a64).all()

    # zones + pruning end-to-end
    t = MoonrayTable.create(scratch_root("mr-tunits-"), key_col="k",
                            schema=tbl.schema, zone_cols=("d64", "tsms"),
                            rows_per_fragment=50, index_partitions=2)
    t.bulk_load(rd.from_arrow(tbl))
    m = t.manifest()
    z = m["fragments"][0]["zones"]
    assert 17990 < z["d64"][0] < 18260          # days, not epoch-ms
    assert z["tsms"][1] == (n - 1) * 1_000_000  # µs, not raw ms ticks
    lo, hi = datetime.date(2019, 4, 14), "2019-05-10"
    enc = ty.encode_ranges({"d64": (lo, hi)}, t.schema())
    kept = [f for f in m["fragments"] if _zones_overlap(f["zones"], enc)]
    assert 0 < len(kept) < len(m["fragments"])
    got = sorted(r["k"] for r in
                 t.scan(predicate_ranges={"d64": (lo, hi)},
                        exact_filter=True).take_all())
    want = [k for k in range(n)
            if datetime.date(2019, 4, 14)
            <= EPOCH + datetime.timedelta(days=18000 + k)
            <= datetime.date(2019, 5, 10)]
    assert got == want


def test_scanplan_typed_ranges_over_http(merged):
    """service.scan_plan must encode typed predicate bounds into the
    zone-JSON domain before pruning (review finding: raw Decimal / ISO
    bounds vs encoded zones silently dropped matching fragments)."""
    from moonray.service import MoonrayService

    t, want = merged
    svc = MoonrayService.__new__(MoonrayService)
    svc._tables = {"typed": t}
    svc._table = lambda name: t
    import json as _json

    plan = svc.scan_plan("typed", {
        "ranges": [_json.dumps({"price": ["1000.00", None],
                                "day": ["1970-04-01", "1970-06-01"]})],
    })
    m = t.manifest()
    assert 0 < len(plan["fragments"]) < len(m["fragments"])
    # every key the predicate matches must live in a planned fragment
    planned = {f["path"] for f in plan["fragments"]}
    lo_p, lo_d, hi_d = (decimal.Decimal("1000.00"),
                        datetime.date(1970, 4, 1),
                        datetime.date(1970, 6, 1))
    want_ks = {k for k, r in want.items()
               if r["price"] >= lo_p and lo_d <= r["day"] <= hi_d}
    got_ks = set()
    import pyarrow.parquet as pq_
    for f in plan["fragments"]:
        part = pq_.read_table(os.path.join(t.root, f["path"]),
                              columns=["k"])
        got_ks.update(part["k"].to_pylist())
    assert want_ks <= got_ks


def test_fsck_deep_on_typed_table(merged):
    from moonray.fsck import fsck

    t, _want = merged
    rep = fsck(t, deep=True)
    assert rep["ok"], rep["issues"]


def test_uuid_keyed_table_export_lookup_and_colindex(tmp_path):
    """FSB16 (uuid) as THE key column: engine lookup, bloom column
    index consult, and the export-side index-puffin point lookup must
    all hash/compare the binary keys consistently."""
    import ray.data as rd

    from moonray.sinks.iceberg import export_iceberg, iceberg_index_lookup
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    n = 300
    uids = [hashlib.md5(f"u{i}".encode()).digest() for i in range(n)]
    tbl = pa.table({
        "uid": pa.array(uids, pa.binary(16)),
        "price": pa.array([D(f"{i}.25") for i in range(n)],
                          pa.decimal128(12, 2)),
        "lab": pa.array([f"l{i % 7}" for i in range(n)], pa.string()),
    })
    t = MoonrayTable.create(scratch_root("mr-uuidkey-"), key_col="uid",
                            schema=tbl.schema, zone_cols=("price",),
                            rows_per_fragment=64, index_partitions=4)
    t.bulk_load(rd.from_arrow(tbl))
    # engine point lookup on binary keys
    got = t.lookup([uids[5], uids[250]])
    assert sorted(got["price"].to_pylist()) == [D("5.25"), D("250.25")]

    # bloom column index over the uuid column (non-key equality shape:
    # index it as a value column too via predicate_in on uid itself)
    t.build_column_index("lab")
    got2 = t.scan(predicate_in={"lab": ["l3"]}).take_all()
    assert {r["lab"] for r in got2} == {"l3"}
    assert len(got2) == len([i for i in range(n) if i % 7 == 3])

    # export: index puffins answer uuid point lookups externally
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    ext = iceberg_index_lookup(dest, [uids[5], uids[250]]).to_pandas()
    assert sorted(ext["price"]) == [D("5.25"), D("250.25")]
    assert len(iceberg_index_lookup(dest, [b"\x00" * 16])) == 0


def test_map_column_merge_and_exports(tmp_path):
    """Map columns (reference moonlink_type Map): schema, fragment IO,
    MERGE, and both export type mappings (no zones — maps are
    unordered)."""
    import json

    import ray.data as rd

    from moonray.sinks.delta import export_delta
    from moonray.sinks.iceberg import export_iceberg, read_iceberg_table
    from moonray.table import MoonrayTable
    from moonray.util import scratch_root

    n = 120
    mt = pa.map_(pa.string(), pa.int64())
    tbl = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "props": pa.array([[(f"p{i % 3}", i), ("z", i * 2)]
                           for i in range(n)], mt),
    })
    t = MoonrayTable.create(scratch_root("mr-map-"), key_col="k",
                            schema=tbl.schema, rows_per_fragment=50,
                            index_partitions=2)
    t.bulk_load(rd.from_arrow(tbl))
    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["U", "D"], pa.string()),
        "lsn": pa.array([1, 2], pa.int64()),
        "k": pa.array([3, 7], pa.int64()),
        "props": pa.array([[("upd", 99)], None], mt),
    })), job_id="map-merge")
    rows = {r["k"]: r["props"] for r in t.scan().take_all()}
    assert len(rows) == n - 1 and 7 not in rows
    assert rows[3] == [("upd", 99)]
    assert rows[4] == [("p1", 4), ("z", 8)]

    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)
    back = read_iceberg_table(dest)
    got = {r["k"]: r["props"] for r in back.to_pylist()}
    assert got == rows
    meta_dir = os.path.join(dest, "metadata")
    mfile = sorted(f for f in os.listdir(meta_dir)
                   if f.endswith(".json"))[-1]
    meta = json.load(open(os.path.join(meta_dir, mfile)))
    f_props = next(f for f in meta["schemas"][-1]["fields"]
                   if f["name"] == "props")
    assert f_props["type"]["type"] == "map"
    assert f_props["type"]["key"] == "string"

    ddest = str(tmp_path / "delta")
    export_delta(t, ddest)
    log = open(os.path.join(ddest, "_delta_log",
                            f"{0:020d}.json")).read().splitlines()
    md = next(json.loads(l)["metaData"] for l in log
              if "metaData" in json.loads(l))
    fm = {f["name"]: f["type"]
          for f in json.loads(md["schemaString"])["fields"]}
    assert fm["props"]["type"] == "map"

"""Round-5 hardening regressions: HASH_IMPL versioning, Delta
timestampNtz protocol gating, exact µs encoding, decimal null guard,
map-key coercion, oracle-scale guards, and the minhash LSH recovery
rounds / auto components regime."""

import datetime as dt
import decimal
import json
import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from moonray import MoonrayTable
from moonray import manifest as mf
from moonray.functions import dedup
from moonray.functions.dedup import MinHashBands, minhash_lsh_dedup
from moonray.util import HASH_IMPL


# ---------------------------------------------------------- HASH_IMPL

def test_hash_impl_records_temporal_lane():
    assert "temporal1" in HASH_IMPL


def test_stale_hash_impl_rejected_loudly(tmp_path):
    root = str(tmp_path / "tbl")
    t = MoonrayTable.create(root, key_col="id", schema=pa.schema(
        [("id", pa.int64()), ("v", pa.string())]), index_partitions=2)
    t.bulk_load(rd.from_items([{"id": i, "v": f"x{i}"} for i in range(8)]))
    v = mf.latest_version(root)
    path = os.path.join(root, "versions", f"v{v:08d}.json")
    m = json.load(open(path))
    m["hash_impl"] = "splitmix64+polars0"  # pre-temporal-lane engine
    with open(path, "w") as f:
        json.dump(m, f)
    with pytest.raises(RuntimeError, match="hash impl"):
        mf.load_manifest(root)


# ------------------------------------------------- Delta protocol gate

def _mk_table(root, schema, rows):
    t = MoonrayTable.create(str(root), key_col="id", schema=schema,
                            index_partitions=2, rows_per_fragment=8)
    t.bulk_load(rd.from_items(rows))
    return t


def _log_actions(dest, v):
    with open(os.path.join(dest, "_delta_log", f"{v:020d}.json")) as f:
        return [json.loads(x) for x in f]


def test_delta_ntz_schema_gets_feature_protocol(tmp_path):
    from moonray.sinks.delta import export_delta

    schema = pa.schema([("id", pa.int64()), ("ts", pa.timestamp("us"))])
    t = _mk_table(tmp_path / "tbl", schema, [
        {"id": i, "ts": dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)}
        for i in range(10)])
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    proto = next(a["protocol"] for a in _log_actions(dest, 0)
                 if "protocol" in a)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "timestampNtz" in proto["readerFeatures"]
    assert "timestampNtz" in proto["writerFeatures"]
    # legacy writer-2 implied features carried through the upgrade
    assert {"appendOnly", "invariants"} <= set(proto["writerFeatures"])


def test_delta_plain_schema_keeps_legacy_protocol_and_upgrades_on_alter(
        tmp_path):
    from moonray.sinks.delta import export_delta

    schema = pa.schema([("id", pa.int64()), ("v", pa.string())])
    t = _mk_table(tmp_path / "tbl", schema,
                  [{"id": i, "v": f"x{i}"} for i in range(10)])
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    proto0 = next(a["protocol"] for a in _log_actions(dest, 0)
                  if "protocol" in a)
    assert proto0 == {"minReaderVersion": 1, "minWriterVersion": 2}

    # ALTER adds a naive timestamp → the next commit must ratchet the
    # protocol before any reader sees the NTZ schema
    t.alter(add_columns=[("seen", pa.timestamp("us"))])
    v = export_delta(t, dest)
    protos = [a["protocol"] for a in _log_actions(dest, v)
              if "protocol" in a]
    assert len(protos) == 1
    assert protos[0]["minReaderVersion"] == 3
    assert "timestampNtz" in protos[0]["readerFeatures"]


# ------------------------------------------ exact temporal µs encoding

def test_ts_encoding_exact_far_future_and_pre_epoch():
    from moonray.types import zone_encode_value

    for d in (dt.datetime(2300, 5, 17, 3, 4, 5, 123457),
              dt.datetime(1234, 5, 17, 3, 4, 5, 999999),
              dt.datetime(2300, 1, 1, tzinfo=dt.timezone.utc)):
        typ = pa.timestamp("us", tz="UTC" if d.tzinfo else None)
        # Arrow's own scalar conversion is the independent exact oracle
        assert zone_encode_value(d, typ) == pa.scalar(d, typ).value


def test_decimal_to_unscaled_rejects_nulls():
    from moonray.types import decimal_to_unscaled

    col = pa.array([decimal.Decimal("1.23"), None],
                   pa.decimal128(10, 2))
    with pytest.raises(ValueError, match="null"):
        decimal_to_unscaled(col)
    ok = pa.array([decimal.Decimal("1.23"), decimal.Decimal("-4.50")],
                  pa.decimal128(10, 2))
    assert decimal_to_unscaled(ok).tolist() == [123, -450]


def test_map_key_coercion():
    from moonray.types import coerce_value, needs_coercion

    t = pa.map_(pa.date32(), pa.int64())
    assert needs_coercion(t)
    v = coerce_value({"2024-01-02": 5, "2024-03-04": 7}, t)
    arr = pa.array([v], t)
    items = arr[0].as_py()
    assert dict(items) == {dt.date(2024, 1, 2): 5, dt.date(2024, 3, 4): 7}


# ------------------------------------------------- oracle-scale guards

_REAL_GUARD = dedup._guard_oracle_scale


def _tiny_guard(ds, what, twin, force, limit=100_000):
    return _REAL_GUARD(ds, what, twin, force, limit=5)


def test_ngram_jaccard_pairs_guard(monkeypatch):
    docs = rd.from_items([{"doc_id": i, "text": f"doc {i} body"}
                          for i in range(8)])
    monkeypatch.setattr(dedup, "_guard_oracle_scale", _tiny_guard)
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.ngram_jaccard_pairs(docs)
    # force=True runs (and still returns a Dataset)
    assert dedup.ngram_jaccard_pairs(docs, force=True).count() >= 0


def test_embedding_near_dups_guard(monkeypatch):
    vecs = rd.from_items([{"vec_id": i, "embedding": [float(i), 1.0]}
                          for i in range(8)])
    monkeypatch.setattr(dedup, "_guard_oracle_scale", _tiny_guard)
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.embedding_near_dups(vecs)
    assert dedup.embedding_near_dups(vecs, force=True).count() >= 0


def test_knn_cosine_query_guard():
    from moonray.functions.knn import knn_cosine

    ds = rd.from_items([{"vec_id": i, "embedding": [float(i), 1.0]}
                        for i in range(4)])
    too_many = [(q, np.array([1.0, 0.0])) for q in range(100_001)]
    with pytest.raises(ValueError, match="brute-force"):
        knn_cosine(ds, too_many, k=1)


# ------------------------------- LSH recovery rounds + auto components

# the _bander seam: band on a SEPARATE column holding only a group
# token, so every doc sharing it collides in EVERY band while the
# exact verify (over the real text) disagrees — the
# all-band-collision-below-threshold shape that masks member pairs
# behind a failing hub, which real minhash can't be made to produce
# deterministically. A plain MinHashBands pointed at that column is
# fully importable on workers (a test-module subclass is not).
_MASK_DOCS = [
    # hub A: shares the banding token but nothing else → exact verify
    # fails against both B and C
    {"doc_id": 1, "band_text": "alpha",
     "text": "alpha z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"},
    {"doc_id": 2, "band_text": "alpha",
     "text": "alpha w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"},
    {"doc_id": 3, "band_text": "alpha",
     "text": "alpha w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"},
    {"doc_id": 4, "band_text": "beta",
     "text": "beta unrelated filler body entirely distinct"},
]


def test_recovery_rounds_rescue_hub_masked_pair():
    ds = rd.from_items(_MASK_DOCS)
    bander = MinHashBands("band_text", "doc_id", 16, 4)
    kept = sorted(r["doc_id"] for r in minhash_lsh_dedup(
        ds, num_perm=16, bands=4, _bander=bander).take_all())
    # doc 3 is an exact dup of doc 2: the failing hub (doc 1) must not
    # mask the 2–3 edge
    assert kept == [1, 2, 4]


def test_recovery_disabled_reproduces_single_pass_miss():
    ds = rd.from_items(_MASK_DOCS)
    bander = MinHashBands("band_text", "doc_id", 16, 4)
    kept = sorted(r["doc_id"] for r in minhash_lsh_dedup(
        ds, num_perm=16, bands=4, recover_rounds=0,
        _bander=bander).take_all())
    # without recovery the masked edge is lost — this pins WHY the
    # rounds exist; if this starts failing with [1, 2, 4], star_pairs
    # gained an exact guarantee and the rounds can go
    assert kept == [1, 2, 3, 4]


def test_components_regimes_parity():
    rows = []
    bases = [
        "the quick brown fox jumps over the lazy dog tonight in the "
        "deep dark forest beyond the silver river bend",
        "pack my box with five dozen liquor jugs before the morning "
        "shipment leaves the harbor on the rising tide",
    ]
    for g, base in enumerate(bases):
        words = base.split()
        for k in range(3):
            w = list(words)
            w[-1] = f"tail{k}"
            rows.append({"doc_id": g * 10 + k, "text": " ".join(w)})
    for u in range(4):
        rows.append({"doc_id": 100 + u,
                     "text": f"unique document {u} content {u * 7} "
                             f"unlike any other {u * 13}"})
    ds = rd.from_items(rows)
    outs = {}
    for regime, kw in [("driver", {}), ("distributed", {}),
                       ("auto_small", {}),
                       ("auto_forced_dist", {"driver_pairs_max": 0})]:
        comp = {"driver": "driver", "distributed": "distributed",
                "auto_small": "auto", "auto_forced_dist": "auto"}[regime]
        outs[regime] = sorted(r["doc_id"] for r in minhash_lsh_dedup(
            ds, components=comp, **kw).take_all())
    assert len(set(map(tuple, outs.values()))) == 1
    assert len(outs["driver"]) == 2 + 4  # one rep per cluster + uniques


def test_delta_ntz_detection_checks_types_not_names(tmp_path):
    """A column merely NAMED timestampNtz must not ratchet the
    protocol; a nested (list<timestamp-naive>) column must."""
    from moonray.sinks.delta import _needed_protocol, _schema_string

    named = pa.schema([("id", pa.int64()), ("timestampNtz", pa.string())])
    assert _needed_protocol(_schema_string(named)) == {
        "minReaderVersion": 1, "minWriterVersion": 2}
    nested = pa.schema([("id", pa.int64()),
                        ("ts_list", pa.list_(pa.timestamp("us")))])
    p = _needed_protocol(_schema_string(nested))
    assert p["minReaderVersion"] == 3
    assert "timestampNtz" in p["readerFeatures"]


def test_entry_catalog_reserved_name_and_toctou(tmp_path):
    from moonray.catalog import MoonrayCatalog, _EntryRegistry

    wh = str(tmp_path / "wh")
    cat = MoonrayCatalog(wh, backend="entry")
    schema = pa.schema([("id", pa.int64())])
    with pytest.raises(ValueError, match="reserved"):
        cat.create_table("catalog", key_col="id", schema=schema)
    # TOCTOU: entry listed but deleted before read → omitted, no raise
    reg = _EntryRegistry(wh)
    reg.insert("ghost", {"root": f"{wh}/ghost"})
    real_read = reg._store().__class__.read

    class _Store(reg._store().__class__):
        def read(self, rel):
            if rel.endswith("ghost.json"):
                raise FileNotFoundError(rel)
            return real_read(self, rel)

    import moonray.catalog as catmod
    orig = catmod._EntryRegistry._store
    try:
        catmod._EntryRegistry._store = lambda self: _Store(self.warehouse)
        assert "ghost" not in reg.entries()
    finally:
        catmod._EntryRegistry._store = orig

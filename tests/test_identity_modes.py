"""Identity modes (reference IdentityProp, moonlink_row.rs:270-277):
composite-key merge, full-row identity, append-only (identity='none')
delete rejection — plus maintenance on each mode.
"""

import pyarrow as pa
import pytest
import ray.data as rd

from moonray.table import MoonrayTable

SCHEMA = pa.schema([
    ("region", pa.string()), ("id", pa.int64()),
    ("name", pa.string()), ("score", pa.float64()),
])


def _rows(t, version=None):
    batches = [b for b in t.scan(version).iter_batches(batch_format="pyarrow",
                                                       batch_size=4096)]
    if not batches:
        return []
    return sorted(pa.concat_tables(batches).to_pylist(),
                  key=lambda r: (r["region"], r["id"]))


def test_composite_key_merge(tmp_path):
    t = MoonrayTable.create(str(tmp_path / "ck"), key_cols=["region", "id"],
                            schema=SCHEMA, index_partitions=4,
                            rows_per_fragment=8, zone_cols=("score",))
    t.bulk_load(rd.from_items([
        {"region": r, "id": i, "name": f"{r}{i}", "score": float(i)}
        for r in ("eu", "us") for i in range(10)]))
    # same id exists in both regions — composite identity must
    # distinguish them: update (eu, 3), delete (us, 3), insert (ap, 3)
    t.merge(rd.from_items([
        {"op": "U", "lsn": 1, "region": "eu", "id": 3, "name": "upd", "score": 99.0},
        {"op": "D", "lsn": 2, "region": "us", "id": 3, "name": None, "score": None},
        {"op": "I", "lsn": 3, "region": "ap", "id": 3, "name": "new", "score": 7.0},
    ]))
    rows = {(r["region"], r["id"]): r for r in _rows(t)}
    assert len(rows) == 20  # 20 - 1 deleted + 1 inserted
    assert rows[("eu", 3)]["name"] == "upd" and rows[("eu", 3)]["score"] == 99.0
    assert ("us", 3) not in rows
    assert rows[("ap", 3)]["name"] == "new"
    assert rows[("us", 4)]["name"] == "us4"  # untouched sibling key
    # maintenance preserves state on the composite index
    t.optimize("full")
    t.cluster(cols=["score"])
    rows2 = {(r["region"], r["id"]): r for r in _rows(t)}
    assert rows2 == rows
    # second merge AFTER maintenance probes the rebuilt composite index
    t.merge(rd.from_items([
        {"op": "D", "lsn": 10, "region": "eu", "id": 3, "name": None, "score": None}]))
    assert ("eu", 3) not in {(r["region"], r["id"]) for r in _rows(t)}
    # key columns are undroppable
    with pytest.raises(ValueError):
        t.alter(drop_columns=["region"])


def test_full_row_identity_dedup(tmp_path):
    t = MoonrayTable.create(str(tmp_path / "fr"), identity="full_row",
                            schema=SCHEMA, index_partitions=4,
                            rows_per_fragment=8)
    t.bulk_load(rd.from_items([
        {"region": "eu", "id": 1, "name": "a", "score": 1.0},
        {"region": "eu", "id": 2, "name": "b", "score": 2.0}]))
    # merging the IDENTICAL row upserts it (delete old + append new):
    # cardinality stays 2 — full-row identity matched
    t.merge(rd.from_items([
        {"op": "U", "lsn": 1, "region": "eu", "id": 1, "name": "a", "score": 1.0}]))
    assert len(_rows(t)) == 2
    # a row differing in ANY column is a different identity → appended
    t.merge(rd.from_items([
        {"op": "U", "lsn": 2, "region": "eu", "id": 1, "name": "a", "score": 9.0}]))
    assert len(_rows(t)) == 3


def test_append_only_identity_none(tmp_path):
    t = MoonrayTable.create(str(tmp_path / "ao"), identity="none",
                            schema=SCHEMA, index_partitions=4,
                            rows_per_fragment=8, zone_cols=("score",))
    t.bulk_load(rd.from_items([
        {"region": "eu", "id": i, "name": f"n{i}", "score": float(i)}
        for i in range(20)]))
    assert t.describe()["index_files"] == 0  # no key index maintained
    v = t.merge(rd.from_items([
        {"op": "I", "lsn": 5, "region": "us", "id": i, "name": f"u{i}",
         "score": float(i)} for i in range(5)]))
    assert t.manifest(v)["commit_lsn"] == 5
    assert len(_rows(t)) == 25
    # duplicate append is NOT deduped (rows have no identity)
    t.merge(rd.from_items([
        {"op": "I", "lsn": 6, "region": "eu", "id": 0, "name": "n0", "score": 0.0}]))
    assert len(_rows(t)) == 26
    # deletes/updates forbidden
    with pytest.raises(Exception):
        t.merge(rd.from_items([
            {"op": "D", "lsn": 7, "region": "eu", "id": 0, "name": None,
             "score": None}]))
    x = t.stream_begin("ao-x")
    with pytest.raises(ValueError):
        x.delete(rd.from_items([{"region": "eu", "id": 0}]))
    x.abort()
    # maintenance works without an index
    t.optimize("data", target_bytes=1 << 30, min_group=2)
    t.cluster(cols=["score"])
    assert len(_rows(t)) == 26


def test_create_validation(tmp_path):
    with pytest.raises(ValueError):
        MoonrayTable.create(str(tmp_path / "x1"), schema=SCHEMA, identity="keys")
    with pytest.raises(ValueError):
        MoonrayTable.create(str(tmp_path / "x2"), schema=SCHEMA,
                            identity="none", key_col="id")
    with pytest.raises(ValueError):
        MoonrayTable.create(str(tmp_path / "x3"), schema=SCHEMA,
                            key_cols=["id", "missing"])
    with pytest.raises(ValueError):
        MoonrayTable.create(str(tmp_path / "x4"), schema=SCHEMA,
                            identity="full_row", key_col="id")

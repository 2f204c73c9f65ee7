"""REST catalog client e2e: control plane over a live HTTP service,
data plane direct (open_table returns a local MoonrayTable against the
shared warehouse) — the Glue/REST-catalog split the reference's
metadata-store + rest_api table routes implement."""

import pyarrow as pa
import pytest

from moonray.catalog_client import CatalogError, RestCatalog
from moonray.service import start_in_thread

SCHEMA = pa.schema([("id", pa.int64()), ("name", pa.string()),
                    ("score", pa.float64())])


@pytest.fixture()
def cat(tmp_path):
    server, base = start_in_thread(str(tmp_path / "wh"))
    yield RestCatalog(base)
    server.shutdown()


def test_rest_catalog_roundtrip(cat):
    assert cat.list_tables() == {}
    t = cat.create_table("ev", schema=SCHEMA, key_col="id",
                         rows_per_fragment=8, index_partitions=4)
    assert cat.table_exists("ev")
    assert cat.schema("ev").names == ["id", "name", "score"]

    # control-plane write through the service...
    r = cat.ingest("ev", "insert",
                   [{"id": i, "name": f"n{i}", "score": float(i)}
                    for i in range(10)])
    assert r["rows"] == 10
    cat.ingest("ev", "upsert", [{"id": 3, "name": "upd", "score": 99.0}])
    cat.ingest("ev", "delete", [{"id": 7}])

    # ...is visible on the direct data plane (shared storage root)
    t = cat.open_table("ev")
    got = t.scan().to_pandas().set_index("id")
    assert len(got) == 9 and 7 not in got.index
    assert got.loc[3, "name"] == "upd"

    # data-plane write (local merge) is visible over the control plane
    import ray.data as rd

    ch = pa.table({"op": ["I"], "lsn": [10_000], "id": [77],
                   "name": ["direct"], "score": [1.5]})
    t.merge(rd.from_arrow(ch))
    assert cat.describe("ev")["cardinality"] == 10

    cat.optimize("ev", "full")
    assert cat.open_table("ev").scan().count() == 10

    cat.drop_table("ev")
    assert not cat.table_exists("ev")
    with pytest.raises(KeyError):
        cat.open_table("ev")


def test_rest_catalog_errors(cat):
    with pytest.raises(CatalogError) as ei:
        cat.drop_table("nope")
    assert ei.value.status == 404
    cat.create_table("t1", schema=SCHEMA, key_col="id")
    with pytest.raises(CatalogError) as ei:
        cat.create_table("t1", schema=SCHEMA, key_col="id")
    assert ei.value.status == 409

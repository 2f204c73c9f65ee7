"""Iceberg REST catalog: spec-level server routes over the moonray
service + the client (the reference's rest_catalog.rs role,
src/moonlink/src/storage/table/iceberg/rest_catalog.rs) — export a
table to Iceberg format, register it, list/load/read it back through
the catalog, and check the spec error model on the failure paths."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from moonray.iceberg_catalog import IcebergCatalogError, IcebergRestCatalog
from moonray.service import start_in_thread
from moonray.sinks.iceberg import export_iceberg
from moonray.table import MoonrayTable


@pytest.fixture()
def svc(tmp_path):
    server, base = start_in_thread(str(tmp_path / "wh"))
    yield base
    server.shutdown()


@pytest.fixture()
def exported(tmp_path):
    root = str(tmp_path / "tbl")
    dest = str(tmp_path / "ice")
    schema = pa.schema([("id", pa.int64()), ("val", pa.string())])
    t = MoonrayTable.create(root, key_col="id", schema=schema,
                            index_partitions=2, rows_per_fragment=32)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(100), pa.int64()),
        "val": pa.array([f"v{i}" for i in range(100)], pa.string()),
    })))
    export_iceberg(t, dest)
    return t, dest


def test_catalog_lifecycle_and_read(svc, exported):
    t, dest = exported
    cat = IcebergRestCatalog(svc)
    assert cat.config() == {"defaults": {}, "overrides": {}}
    cat.create_namespace("lake")
    assert cat.list_namespaces() == ["lake"]

    res = cat.register_export("lake", "imgs", dest)
    assert res["metadata-location"].endswith(".metadata.json")
    assert res["metadata"]["format-version"] == 3
    assert cat.list_tables("lake") == ["imgs"]
    assert cat.table_exists("lake", "imgs")

    got = cat.read_dataset("lake", "imgs").take_all()
    assert sorted(r["id"] for r in got) == list(range(100))

    # column pruning flows through the catalog read
    cols = cat.read_dataset("lake", "imgs", columns=["val"]).take(1)
    assert set(cols[0]) == {"val"}

    cat.drop_table("lake", "imgs")
    assert not cat.table_exists("lake", "imgs")
    cat.drop_namespace("lake")
    assert cat.list_namespaces() == []


def test_reregister_advances_to_new_export(svc, exported):
    t, dest = exported
    cat = IcebergRestCatalog(svc)
    cat.create_namespace("lake")
    loc1 = cat.register_export("lake", "imgs", dest)["metadata-location"]

    t.merge(rd.from_arrow(pa.table({
        "op": pa.array(["D"] * 3, pa.string()),
        "lsn": pa.array([1, 2, 3], pa.int64()),
        "id": pa.array([0, 1, 2], pa.int64()),
        "val": pa.array([None] * 3, pa.string()),
    })))
    export_iceberg(t, dest)
    loc2 = cat.register_export("lake", "imgs", dest)["metadata-location"]
    assert loc2 != loc1  # immutable metadata files; the pointer advanced

    got = cat.read_dataset("lake", "imgs").take_all()
    assert sorted(r["id"] for r in got) == list(range(3, 100))


def test_cli_export_registers_in_catalog(svc, exported, capsys):
    t, dest = exported
    from moonray.jobs.__main__ import main

    assert main(["export-iceberg", "--table", t.root, "--dest", dest,
                 "--register-catalog", svc, "--ident", "lake.imgs"]) == 0
    import json

    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["registered"]["identifier"] == "lake.imgs"

    cat = IcebergRestCatalog(svc)
    assert cat.list_tables("lake") == ["imgs"]
    assert cat.read_dataset("lake", "imgs").count() == 100


def test_spec_error_model(svc, tmp_path):
    cat = IcebergRestCatalog(svc)
    with pytest.raises(IcebergCatalogError) as ei:
        cat.load_table("nope", "imgs")
    assert ei.value.code == 404 and ei.value.etype == "NoSuchNamespaceException"

    cat.create_namespace("lake")
    with pytest.raises(IcebergCatalogError) as ei:
        cat.create_namespace("lake")
    assert ei.value.code == 409 and ei.value.etype == "AlreadyExistsException"

    with pytest.raises(IcebergCatalogError) as ei:
        cat.load_table("lake", "imgs")
    assert ei.value.code == 404 and ei.value.etype == "NoSuchTableException"

    with pytest.raises(IcebergCatalogError) as ei:
        cat.register_table("lake", "imgs",
                           str(tmp_path / "missing.metadata.json"))
    assert ei.value.code == 400

    # non-empty namespace refuses to drop
    meta = tmp_path / "ok.metadata.json"
    meta.write_text("{}")
    cat.register_table("lake", "imgs", str(meta))
    with pytest.raises(IcebergCatalogError) as ei:
        cat.drop_namespace("lake")
    assert ei.value.code == 409 and ei.value.etype == "NamespaceNotEmptyException"

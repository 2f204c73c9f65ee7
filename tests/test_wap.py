"""Write-audit-publish composed from primitives: zero-copy clone as the
stage, writes + audit on the stage, changelog sync back to prod."""

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from moonray import MoonrayTable, clone_table, release_clone
from moonray.sync import sync_incremental


def _mk(root: str, n: int = 200) -> MoonrayTable:
    t = MoonrayTable.create(
        root, key_col="id",
        schema=pa.schema([("id", pa.int64()), ("v", pa.string())]),
        index_partitions=4, rows_per_fragment=64)
    t.bulk_load(rd.from_arrow(pa.table({
        "id": pa.array(range(n), pa.int64()),
        "v": pa.array([f"v{i}" for i in range(n)]),
    })))
    return t


def _rows(t) -> dict:
    out = {}
    for b in t.scan().iter_batches(batch_format="pyarrow"):
        for r in b.to_pylist():
            out[r["id"]] = r["v"]
    return out


def test_write_audit_publish_roundtrip(tmp_path):
    prod = _mk(str(tmp_path / "prod"))
    prod_before = _rows(prod)

    # WRITE: stage is a zero-copy clone; the risky batch lands there
    stage = clone_table(prod, str(tmp_path / "stage"))
    stage.merge(rd.from_arrow(pa.table({
        "op": pa.array(["I"] * 3 + ["D"]),
        "lsn": pa.array([10_000] * 4, pa.int64()),
        "id": pa.array([1, 2, 500, 7], pa.int64()),
        "v": pa.array(["patched", "patched", "new-row", ""]),
    })))
    assert _rows(prod) == prod_before  # prod untouched during audit

    # AUDIT on the stage (e.g. no empty values may survive)
    bad = stage.scan().map_batches(
        lambda b: b.filter(pc.equal(b["v"], "")),
        batch_format="pyarrow").count()
    assert bad == 0

    # PUBLISH: changelog (0, head] = exactly the staged writes (the v0
    # clone baseline contributes nothing) syncs back into prod
    sync_incremental(stage, prod)
    got = _rows(prod)
    assert got[1] == "patched" and got[2] == "patched"
    assert got[500] == "new-row" and 7 not in got
    assert len(got) == len(prod_before) + 1 - 1

    # publish is idempotent: nothing new to sync
    v = prod.latest_version()
    sync_incremental(stage, prod)
    assert prod.latest_version() == v

    release_clone(prod, stage.root)

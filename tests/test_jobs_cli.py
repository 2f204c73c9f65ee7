"""jobs CLI e2e (in-process main(): the ray job submit surface) —
create → load → delete-range → merge → sync → describe/lookup."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _run(capsys, *argv) -> dict:
    from moonray.jobs.__main__ import main

    assert main(list(argv)) == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_cli_delete_range_and_sync(tmp_path, capsys):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    schema_json = '[["k","int64"],["bal","float64"]]'
    _run(capsys, "create", "--table", src, "--key", "k",
         "--schema-json", schema_json, "--zone-cols", "bal",
         "--rows-per-fragment", "256")
    inp = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"k": pa.array(range(1000), pa.int64()),
                             "bal": pa.array(np.arange(1000) * 1.5)}), inp)
    out = _run(capsys, "load", "--table", src, "--input", inp,
               "--job-id", "l1")
    assert out["cardinality"] == 1000

    # conjunction delete: bal in [0, 300] → keys 0..200 (201 rows)
    out = _run(capsys, "delete-range", "--table", src,
               "--ranges-json", '{"bal": [0, 300]}', "--lsn", "5")
    assert out["cardinality"] == 799 and out["deleted_rows"] == 201

    _run(capsys, "create", "--table", dst, "--key", "k",
         "--schema-json", schema_json, "--rows-per-fragment", "256")
    out = _run(capsys, "sync", "--table", src, "--into", dst)
    assert out["dst_version"] >= 1
    out = _run(capsys, "describe", "--table", dst)
    assert out["cardinality"] == 799

    # idempotent CLI resync: no new source commits → dst unchanged
    _run(capsys, "sync", "--table", src, "--into", dst)
    out = _run(capsys, "describe", "--table", dst)
    assert out["cardinality"] == 799

    # deleted keys miss through the CLI lookup too
    out = _run(capsys, "lookup", "--table", src,
               "--keys-json", "[100, 150, 900]")
    assert [r["k"] for r in out] == [900]

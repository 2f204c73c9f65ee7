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


def test_cli_delete_range_int64_exact_and_empty_refused(tmp_path, capsys):
    import pytest

    src = str(tmp_path / "big")
    _run(capsys, "create", "--table", src, "--key", "k",
         "--schema-json", '[["k","int64"],["v","int64"]]',
         "--rows-per-fragment", "64")
    big = 1 << 53  # beyond float64's exact-integer range
    inp = str(tmp_path / "big.parquet")
    pq.write_table(pa.table({"k": pa.array([big, big + 1, big + 2], pa.int64()),
                             "v": pa.array([big, big + 1, big + 2], pa.int64())}),
                   inp)
    _run(capsys, "load", "--table", src, "--input", inp, "--job-id", "l")
    # bounds [2^53+1, 2^53+1]: float() coercion would round to 2^53 and
    # delete the WRONG row; native ints must delete exactly one row
    out = _run(capsys, "delete-range", "--table", src,
               "--ranges-json", json.dumps({"v": [big + 1, big + 1]}),
               "--lsn", "9")
    assert out["deleted_rows"] == 1
    rows = _run(capsys, "lookup", "--table", src,
                "--keys-json", json.dumps([big, big + 1, big + 2]))
    assert sorted(r["k"] for r in rows) == [big, big + 2]

    with pytest.raises(SystemExit, match="full-table delete"):
        _run(capsys, "delete-range", "--table", src,
             "--ranges-json", "{}", "--lsn", "10")


def test_cli_export_iceberg(tmp_path, capsys):
    src = str(tmp_path / "src")
    _run(capsys, "create", "--table", src, "--key", "k",
         "--schema-json", '[["k","int64"],["bal","float64"]]',
         "--rows-per-fragment", "64")
    inp = str(tmp_path / "in.parquet")
    pq.write_table(pa.table({"k": pa.array(range(200), pa.int64()),
                             "bal": pa.array(np.arange(200) * 1.5)}), inp)
    _run(capsys, "load", "--table", src, "--input", inp, "--job-id", "l1")
    _run(capsys, "delete-range", "--table", src,
         "--ranges-json", '{"k": [0, 49]}', "--lsn", "5")
    dest = str(tmp_path / "ice")
    out = _run(capsys, "export-iceberg", "--table", src, "--dest", dest)
    assert out["iceberg_metadata_version"] == 1
    from moonray.sinks.iceberg import read_iceberg_table

    got = read_iceberg_table(dest)
    assert sorted(got["k"].to_pylist()) == list(range(50, 200))


def test_cli_curate(tmp_path, capsys):
    """curate subcommand: table in, quality-gated + dup-collapsed table
    out, through the DV delete path."""
    import ray.data as rd

    from moonray.fixtures import IMAGE_SCHEMA, make_images_with_dup_families
    from moonray.table import MoonrayTable

    root = str(tmp_path / "imgs")
    t = MoonrayTable.create(root, key_col="image_id", schema=IMAGE_SCHEMA,
                            zone_cols=("phash",), index_partitions=4,
                            rows_per_fragment=64)
    ds = make_images_with_dup_families(30, seed=42)
    t.bulk_load(ds)
    n0 = t.scan().count()

    out = _run(capsys, "curate", "--table", root, "--lsn", "9000",
               "--job-id", "cur-1")
    assert out["version"] >= 2
    assert out["cardinality"] < n0
    got = {r["image_id"] for r in
           MoonrayTable.open(root).scan()
           .select_columns(["image_id"]).take_all()}
    assert any(i.endswith("-d1") for i in got)      # best-res reps kept
    assert not any(i.endswith("-d2") for i in got)  # low-res dups gone


def test_cli_colindex_and_agg_view(tmp_path, capsys):
    src, view = str(tmp_path / "src2"), str(tmp_path / "view2")
    schema_json = '[["k","int64"],["g","int64"],["x","int64"]]'
    _run(capsys, "create", "--table", src, "--key", "k",
         "--schema-json", schema_json, "--rows-per-fragment", "64")
    inp = str(tmp_path / "in2.parquet")
    pq.write_table(pa.table({
        "k": pa.array(range(500), pa.int64()),
        "g": pa.array([i % 5 for i in range(500)], pa.int64()),
        "x": pa.array(range(500), pa.int64())}), inp)
    _run(capsys, "load", "--table", src, "--input", inp, "--job-id", "l1")

    out = _run(capsys, "build-colindex", "--table", src, "--col", "x")
    assert out["indexed"] == out["fragments"] > 1

    aggs = '{"cnt": ["count", null], "sum_x": ["sum", "x"]}'
    out = _run(capsys, "agg-view", "--table", src, "--into", view,
               "--group-cols", "g", "--aggs-json", aggs)
    assert out["cardinality"] == 5

    chg = str(tmp_path / "chg.parquet")
    pq.write_table(pa.table({
        "op": pa.array(["I", "D"], pa.string()),
        "lsn": pa.array([1, 1], pa.int64()),
        "k": pa.array([900, 0], pa.int64()),
        "g": pa.array([7, 0], pa.int64()),
        "x": pa.array([42, 0], pa.int64())}), chg)
    _run(capsys, "merge", "--table", src, "--changes", chg,
         "--job-id", "m1")
    out = _run(capsys, "agg-view-sync", "--table", src, "--into", view,
               "--group-cols", "g", "--aggs-json", aggs)
    assert out["changed_groups"] == 2
    out = _run(capsys, "describe", "--table", view)
    assert out["cardinality"] == 6  # group 7 was born

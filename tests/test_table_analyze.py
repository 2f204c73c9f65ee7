"""table.analyze / table.validate surface + jobs CLI analyze/validate:
profiles and constraint reports over LIVE rows (DV-excluded), checked
against DuckDB over the table's own scan."""

import json

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa


def _mk_table(root: str):
    import ray.data as rd

    from moonray import MoonrayTable

    t = MoonrayTable.create(root, key_col="k",
                            schema=pa.schema([("k", pa.int64()),
                                              ("grp", pa.string()),
                                              ("bal", pa.float64())]),
                            rows_per_fragment=128)
    n = 600
    t.bulk_load(rd.from_arrow(pa.table({
        "k": pa.array(range(n), pa.int64()),
        "grp": pa.array([f"g{v % 7}" for v in range(n)], pa.string()),
        "bal": pa.array(np.arange(n) * 1.5),
    })))
    # deletes must drop out of the profile (live rows only)
    t.delete_range({"k": (0, 99)}, lsn=10)
    return t


def test_analyze_matches_duckdb_over_live_rows(tmp_path):
    from moonray.functions.profile import profile_columns_oracle_sql

    t = _mk_table(str(tmp_path / "t"))
    prof = t.analyze(["k", "grp", "bal"])
    got = prof.to_pandas().sort_values("column", ignore_index=True)
    dtypes = dict(zip(got["column"], got["dtype"]))
    live = t.scan().to_pandas()
    assert len(live) == 500
    con = duckdb.connect()
    con.register("live", live)
    want = (con.sql(profile_columns_oracle_sql("live", ["k", "grp", "bal"],
                                               dtypes)).df()
            .sort_values("column", ignore_index=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)
    assert got.set_index("column").loc["k", "n_rows"] == 500


def test_validate_defaults_to_identity_key(tmp_path):
    t = _mk_table(str(tmp_path / "t"))
    rep = {(r["constraint"], r["column"]): r["n_violations"]
           for r in t.validate(not_null=("grp",),
                               in_set={"grp": [f"g{i}" for i in range(7)]},
                               ranges={"bal": (0.0, 1e6)}).take_all()}
    assert rep[("unique", "k")] == 0        # MERGE invariant holds
    assert rep[("not_null", "grp")] == 0
    assert rep[("in_set", "grp")] == 0
    assert rep[("range", "bal")] == 0


def test_cli_analyze_and_validate(tmp_path, capsys):
    from moonray.jobs.__main__ import main

    root = str(tmp_path / "t")
    _mk_table(root)
    assert main(["analyze", "--table", root, "--columns", "k,grp"]) == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["column"] for r in rows} == {"k", "grp"}
    assert all(r["n_rows"] == 500 for r in rows)

    assert main(["validate", "--table", root]) == 0
    ok = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ok == [{"constraint": "unique", "column": "k",
                   "n_violations": 0}]
    # a violated constraint exits 4 and reports the count
    assert main(["validate", "--table", root,
                 "--ranges-json", '{"bal": [0, 10]}']) == 4
    bad = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["constraint"]: r["n_violations"] for r in bad}["range"] > 0


def test_validate_composite_key_defaults_to_tuple(tmp_path):
    """A healthy composite-key table must validate clean: uniqueness is
    the key TUPLE, never each column independently."""
    import ray.data as rd

    from moonray import MoonrayTable

    root = str(tmp_path / "ck")
    t = MoonrayTable.create(root, key_cols=("region", "id"),
                            schema=pa.schema([("region", pa.string()),
                                              ("id", pa.int64()),
                                              ("v", pa.float64())]),
                            rows_per_fragment=64)
    t.bulk_load(rd.from_arrow(pa.table({
        # 'region' and 'id' each repeat; only the TUPLE is unique
        "region": pa.array(["eu"] * 100 + ["us"] * 100, pa.string()),
        "id": pa.array(list(range(100)) * 2, pa.int64()),
        "v": pa.array(np.zeros(200)),
    })))
    rep = t.validate().take_all()
    assert rep == [{"constraint": "unique", "column": "region,id",
                    "n_violations": 0}]

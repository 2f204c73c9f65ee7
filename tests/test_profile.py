"""Column profiler (ANALYZE) + top-values vs live DuckDB oracles,
including a null-bearing synthetic table (the TPC-H fixtures carry no
nulls, so null accounting needs its own corpus)."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
CUST_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal",
             "c_mktsegment"]


def _compare(got_ds, sql, con):
    got = got_ds.to_pandas()
    want = con.sql(sql).df()
    got = got[sorted(got.columns)].sort_values(
        by=list(sorted(got.columns)), ignore_index=True)
    want = want[sorted(want.columns)].sort_values(
        by=list(sorted(want.columns)), ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_profile_customer_matches_duckdb():
    import ray.data as rd

    from moonray.functions.profile import (profile_columns,
                                           profile_columns_oracle_sql)

    ds = rd.read_parquet(f"{SF}/customer.parquet", columns=CUST_COLS)
    prof = profile_columns(ds, CUST_COLS)
    dtypes = {r["column"]: r["dtype"] for r in prof.take_all()}
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS FROM '{SF}/customer.parquet'")
    _compare(prof, profile_columns_oracle_sql("customer", CUST_COLS,
                                              dtypes), con)


def test_profile_nulls_and_exact_mode():
    import ray.data as rd

    from moonray.functions.profile import (profile_columns,
                                           profile_columns_oracle_sql)

    rng = np.random.default_rng(11)
    n = 5000
    ints = rng.integers(0, 400, n)
    strs = np.array([f"v{x}" for x in rng.integers(0, 50, n)], dtype=object)
    fl = rng.normal(size=n).round(3)
    t = pa.table({
        "a": pa.array([None if i % 7 == 0 else int(v)
                       for i, v in enumerate(ints)], pa.int64()),
        "s": pa.array([None if i % 11 == 0 else str(v)
                       for i, v in enumerate(strs)], pa.string()),
        "f": pa.array([None if i % 13 == 0 else float(v)
                       for i, v in enumerate(fl)], pa.float64()),
    })
    ds = rd.from_arrow(t).repartition(6)
    con = duckdb.connect()
    con.register("tbl", t)
    for mode in ("hash64", "exact"):
        prof = profile_columns(ds, ["a", "s", "f"], distinct=mode)
        dtypes = {r["column"]: r["dtype"] for r in prof.take_all()}
        _compare(prof,
                 profile_columns_oracle_sql("tbl", ["a", "s", "f"], dtypes),
                 con)


def test_top_values_matches_duckdb():
    import ray.data as rd

    from moonray.functions.profile import top_values, top_values_oracle_sql

    ds = rd.read_parquet(f"{SF}/customer.parquet",
                         columns=["c_mktsegment"]).repartition(4)
    got = top_values(ds, "c_mktsegment", k=3)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS FROM '{SF}/customer.parquet'")
    _compare(got, top_values_oracle_sql("customer", "c_mktsegment", 3), con)


def test_top_values_tie_break_and_nulls():
    import ray.data as rd

    from moonray.functions.profile import top_values

    t = pa.table({"v": pa.array(["b", "a", "b", "a", "c", None, "c", "d"])})
    got = top_values(rd.from_arrow(t).repartition(3), "v", k=3).take_all()
    # counts: a=2 b=2 c=2 d=1; ties break value-ascending
    assert [(r["value"], r["cnt"]) for r in got] == [
        ("a", 2), ("b", 2), ("c", 2)]

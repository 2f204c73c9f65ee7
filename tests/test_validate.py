"""Constraint validation vs live DuckDB oracles, including NULL
semantics (nulls violate only not_null) and duplicate-key listing."""

import duckdb
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _cmp(got_ds, sql, con):
    got = got_ds.to_pandas()
    want = con.sql(sql).df()
    want.columns = list(got.columns)
    got = got.sort_values(list(got.columns), ignore_index=True)
    want = want.sort_values(list(want.columns), ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lineitem_constraints_match_duckdb():
    import ray.data as rd

    from moonray.functions.validate import (check_constraints,
                                            check_constraints_oracle_sql)

    kw = dict(unique=("l_orderkey",), not_null=("l_shipdate",),
              ranges={"l_quantity": (1.0, 25.0)},
              in_set={"l_returnflag": ["A", "N"]})
    ds = rd.read_parquet(f"{SF}/lineitem.parquet")
    got = check_constraints(ds, **kw)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    _cmp(got, check_constraints_oracle_sql("lineitem", **kw), con)
    # the fixture must exercise both zero and non-zero counts
    viol = {r["constraint"]: r["n_violations"] for r in got.take_all()}
    assert viol["unique"] > 0 and viol["not_null"] == 0


def test_null_semantics():
    import ray.data as rd

    from moonray.functions.validate import (check_constraints,
                                            check_constraints_oracle_sql)

    t = pa.table({
        "k": pa.array([1, 1, None, 2, 3, None], pa.int64()),
        "v": pa.array([0.5, None, 9.0, 2.0, None, 1.0], pa.float64()),
        "c": pa.array(["a", "b", None, "z", "a", "a"], pa.string()),
    })
    kw = dict(unique=("k",), not_null=("k", "v", "c"),
              ranges={"v": (0.0, 5.0)}, in_set={"c": ["a", "b"]})
    got = check_constraints(rd.from_arrow(t).repartition(3), **kw)
    con = duckdb.connect()
    con.register("tbl", t)
    _cmp(got, check_constraints_oracle_sql("tbl", **kw), con)
    viol = {(r["constraint"], r["column"]): r["n_violations"]
            for r in got.take_all()}
    assert viol[("unique", "k")] == 1          # nulls never count
    assert viol[("range", "v")] == 1           # only the non-null 9.0
    assert viol[("in_set", "c")] == 1          # only 'z'
    assert viol[("not_null", "k")] == 2


def test_dup_keys_lists_multiplicities():
    import ray.data as rd

    from moonray.functions.validate import dup_keys

    t = pa.table({"k": pa.array([1, 2, 2, 3, 3, 3, None], pa.int64())})
    got = dup_keys(rd.from_arrow(t).repartition(4), "k").take_all()
    assert {(r["k"], r["cnt"]) for r in got} == {(2, 2), (3, 3)}


def test_composite_unique_and_no_in_set_oracle():
    """Regressions: (1) the oracle must be valid SQL when in_set is
    absent (UNION ALL names come from the first arm); (2) tuple unique
    counts composite violations, not per-column ones."""
    import ray.data as rd

    from moonray.functions.validate import (check_constraints,
                                            check_constraints_oracle_sql)

    t = pa.table({
        "a": pa.array([1, 1, 1, 2, None], pa.int64()),
        "b": pa.array(["x", "x", "y", "x", "x"], pa.string()),
    })
    kw = dict(unique=(("a", "b"),), not_null=("a",))
    got = check_constraints(rd.from_arrow(t).repartition(3), **kw)
    con = duckdb.connect()
    con.register("tbl", t)
    _cmp(got, check_constraints_oracle_sql("tbl", **kw), con)
    viol = {(r["constraint"], r["column"]): r["n_violations"]
            for r in got.take_all()}
    # (1,'x') repeats once; 'a' alone repeats 3x but must NOT count
    assert viol[("unique", "a,b")] == 1
    assert viol[("not_null", "a")] == 1

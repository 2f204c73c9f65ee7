"""General row-level equi-join (native hash-shuffle join surface) vs
live DuckDB oracles across join types."""

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _cmp(ds, sql, con, sort_cols):
    got = ds.to_pandas()
    want = con.sql(sql).df()
    got = got[sorted(got.columns)].sort_values(sort_cols,
                                               ignore_index=True)
    want = want[sorted(want.columns)].sort_values(sort_cols,
                                                  ignore_index=True)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def _con():
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return con


def _sides():
    import ray.data as rd

    cust = rd.read_parquet(f"{SF}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    orders = rd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey", "o_orderkey",
                                      "o_totalprice"])
    return cust, orders


def test_left_outer_matches_duckdb():
    from moonray.functions.join import equi_join

    cust, orders = _sides()
    j = equi_join(cust, orders, on="c_custkey", right_on="o_custkey",
                  how="left_outer", num_partitions=4)
    # NB Dataset.join emits the LEFT key column only (o_custkey is
    # consumed by right_on) — the oracle projects to match
    _cmp(j, """
        SELECT c_custkey, c_name, o_orderkey, o_totalprice
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """, _con(), ["c_custkey", "o_orderkey"])


def test_anti_and_semi_match_duckdb():
    """Every sf0.001 customer has orders, so thin the right side to
    make the anti set non-empty — both sets must then be non-trivial
    for the oracle to prove anything."""
    import pyarrow.compute as pc

    from moonray.functions.join import equi_join

    cust, orders = _sides()
    some = orders.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(b["o_custkey"], 1), 0)),
        batch_format="pyarrow")
    pred = "o_custkey % 2 = 0"
    anti = equi_join(cust, some, on="c_custkey", right_on="o_custkey",
                     how="left_anti", num_partitions=4)
    _cmp(anti, f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND {pred})
    """, _con(), ["c_custkey"])
    assert anti.count() > 0
    semi = equi_join(cust, some, on="c_custkey", right_on="o_custkey",
                     how="left_semi", num_partitions=4)
    _cmp(semi, f"""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND {pred})
    """, _con(), ["c_custkey"])
    assert 0 < semi.count() < cust.count()


def test_inner_with_suffix_collision():
    import pyarrow as pa
    import ray.data as rd

    from moonray.functions.join import equi_join

    l = rd.from_arrow(pa.table({"k": [1, 2], "v": ["a", "b"]}))
    r = rd.from_arrow(pa.table({"k": [2, 2], "v": [10, 20]}))
    j = equi_join(l, r, on="k", how="inner",
                  num_partitions=2).take_all()
    assert sorted((d["k"], d["v"], d["v_r"]) for d in j) == [
        (2, "b", 10), (2, "b", 20)]


def test_bad_how_rejected():
    import pytest

    from moonray.functions.join import equi_join

    cust, orders = _sides()
    with pytest.raises(ValueError, match="how must be"):
        equi_join(cust, orders, on="c_custkey", how="cross")

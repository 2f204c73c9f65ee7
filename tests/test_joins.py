"""Join operators vs brute-force numpy/duckdb oracles at sf0.001.

The driver's DuckDB oracle also checks these at sf0.01; here each shape
gets an independent in-process oracle so `pytest -x -q` alone pins the
semantics (including tie/edge behavior the SQL can under-specify).
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _df_like(df: pd.DataFrame) -> pd.DataFrame:
    return df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True)


def _df(ds) -> pd.DataFrame:
    return _df_like(ds.to_pandas())


def test_broadcast_region_enrich_matches_pandas_oracle():
    from moonray.pipelines.joins import broadcast_region_enrich

    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    region = pq.read_table(f"{SF}/region.parquet").to_pandas()
    j = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    j = j.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    j["cents"] = np.floor(j["c_acctbal"] * 100 + 0.5).astype(np.int64)
    want = (j.groupby("r_name").agg(n_cust=("cents", "size"),
                                    acctbal_cents=("cents", "sum"))
            .reset_index())
    got = _df(broadcast_region_enrich(SF))
    pd.testing.assert_frame_equal(got, _df_like(want))


def test_order_lineitem_revenue_matches_pandas_oracle():
    from moonray.pipelines.joins import order_lineitem_revenue

    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"]).to_pandas()
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"]).to_pandas()
    li["rev"] = np.floor(li["l_extendedprice"] * (1.0 - li["l_discount"])
                         * 100 + 0.5).astype(np.int64)
    j = orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    want = (j.groupby("o_orderpriority")
            .agg(revenue_cents=("rev", "sum"), n_items=("rev", "size"))
            .reset_index())
    got = _df(order_lineitem_revenue(SF, buckets=8))
    pd.testing.assert_frame_equal(got, _df_like(want))


def test_asof_join_matches_row_loop_oracle():
    from moonray.pipelines.joins import asof_purchase_last_click

    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    clicks = ev[ev.event_type == "click"]
    rows = []
    for _, p in ev[ev.event_type == "purchase"].iterrows():
        c = clicks[(clicks.user_id == p.user_id) & (clicks.ts <= p.ts)]
        if len(c):
            rows.append({"event_id": p.event_id, "user_id": p.user_id,
                         "ts": p.ts, "prior_ts": c.ts.max()})
    want = pd.DataFrame(rows)
    want["ts"] = want["ts"].astype("datetime64[us]")
    want["prior_ts"] = want["prior_ts"].astype("datetime64[us]")
    got = _df(asof_purchase_last_click(SF, buckets=8))
    pd.testing.assert_frame_equal(got, _df_like(want))


def test_band_pairs_matches_quadratic_oracle():
    from moonray.pipelines.joins import events_band_pairs

    ev = pq.read_table(
        f"{SF}/events.parquet",
        columns=["event_id", "user_id", "ts"]).to_pandas()
    w = pd.Timedelta(hours=6)
    j = ev.merge(ev, on="user_id", suffixes=("_a", "_b"))
    j = j[(j.ts_b > j.ts_a) & (j.ts_b <= j.ts_a + w)]
    want = pd.DataFrame({
        "a_event_id": j.event_id_a.to_numpy(),
        "b_event_id": j.event_id_b.to_numpy(),
        "user_id": j.user_id.to_numpy(),
        "gap_us": ((j.ts_b - j.ts_a) // pd.Timedelta(microseconds=1)
                   ).astype(np.int64).to_numpy(),
    })
    got = _df(events_band_pairs(SF, buckets=8))
    pd.testing.assert_frame_equal(got, _df_like(want))


def test_asof_tie_and_no_match_semantics():
    """Engine-level tie rules the SQL under-specifies: a click at exactly
    the purchase ts matches (<=); purchases with no prior click drop."""
    import pyarrow as pa
    import ray.data as rd

    from moonray.pipelines import joins

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        "ts": pa.array([100, 100, 50, 10], pa.timestamp("us")),
        "event_type": pa.array(["click", "purchase", "purchase", "purchase"]),
    })
    import os
    import tempfile

    d = tempfile.mkdtemp(prefix="joins-tie-")
    pq.write_table(t, os.path.join(d, "events.parquet"))
    got = _df(joins.asof_purchase_last_click(d, buckets=4))
    # purchase 2 matches the tie click (ts==100); purchase 3 (earlier)
    # and purchase 4 (other user) have no prior click
    assert got.event_id.tolist() == [2]
    assert got.prior_ts.astype("int64").tolist() == [100]

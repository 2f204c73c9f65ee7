"""Watermark windows (late-data accounting) vs a live DuckDB oracle,
plus hand-built arrival orders that force cross-bucket carries."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"
W = 3600 * 1_000_000
D = 1800 * 1_000_000


def _cmp(ds, sql, con):
    got = ds.to_pandas().sort_values("wstart", ignore_index=True)
    want = con.sql(sql).df().sort_values("wstart", ignore_index=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)],
                                  want[sorted(want.columns)],
                                  check_dtype=False)


def test_events_match_duckdb():
    import ray.data as rd

    from moonray.functions.watermark import (ARRIVAL_EXPR,
                                             add_scrambled_arrival,
                                             watermark_windows,
                                             watermark_windows_oracle_sql)

    ds = add_scrambled_arrival(rd.read_parquet(f"{SF}/events.parquet"))
    got = watermark_windows(ds, window_us=W, delay_us=D, bucket_rows=64,
                            arrival_col="arrival")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{SF}/events.parquet'")
    _cmp(got, watermark_windows_oracle_sql(W, D,
                                           arrival_expr=ARRIVAL_EXPR), con)
    # the fixture must actually produce late events for the oracle to
    # prove the lateness rule
    tot = got.to_pandas()
    assert tot["n_late"].sum() > 0 and tot["n_on_time"].sum() > 0


def test_cross_bucket_carry_forces_lateness():
    """An early arrival with a FAR-future event time pushes the
    watermark past every later window — later arrivals land late even
    though their own buckets never saw the big timestamp."""
    import ray.data as rd

    from moonray.functions.watermark import watermark_windows

    w, d = 1000, 0
    n = 300
    us = np.full(n, 5_000_000, dtype=np.int64)  # closes everything
    us[1:] = np.arange(1, n, dtype=np.int64)    # tiny in-order times
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(us, pa.timestamp("us")),
        "value": pa.array(np.ones(n)),
    })
    got = (watermark_windows(rd.from_arrow(t).repartition(6),
                             window_us=w, delay_us=d, bucket_rows=16)
           .to_pandas().set_index("wstart").sort_index())
    # arrival 0 (the future event) is on time; every later arrival is
    # late because the watermark is already 5e6
    assert got["n_late"].sum() == n - 1
    assert got["n_on_time"].sum() == 1
    assert got.loc[5_000_000, "n_on_time"] == 1


def test_no_delay_vs_infinite_delay_extremes():
    import ray.data as rd

    from moonray.functions.watermark import watermark_windows

    ds = rd.read_parquet(f"{SF}/events.parquet")
    never_late = watermark_windows(ds, window_us=W,
                                   delay_us=1 << 50).to_pandas()
    assert never_late["n_late"].sum() == 0
    # and on-time counts then equal the plain tumbling counts
    assert (never_late["n_on_time"].sum()
            == ds.count())


def test_random_arrival_orders_match_brute_force():
    """Property check: for random (arrival, ts, value) streams the
    distributed two-phase scan equals a serial replay."""
    import ray.data as rd

    from moonray.functions.watermark import watermark_windows

    rng = np.random.default_rng(29)
    for trial in range(4):
        n = int(rng.integers(50, 400))
        w = int(rng.integers(5, 50))
        d = int(rng.integers(0, 80))
        arr = rng.permutation(np.arange(n) * int(rng.integers(1, 9)))
        us = rng.integers(0, 500, n)
        val = rng.integers(0, 1000, n) / 100.0
        t = pa.table({
            "event_id": pa.array(arr, pa.int64()),
            "ts": pa.array(us, pa.timestamp("us")),
            "value": pa.array(val),
        })
        got = (watermark_windows(
            rd.from_arrow(t).repartition(int(rng.integers(1, 8))),
            window_us=w, delay_us=d, bucket_rows=int(rng.integers(4, 64)))
            .to_pandas().sort_values("wstart", ignore_index=True))

        # serial replay
        order = np.argsort(arr, kind="stable")
        su, sv = us[order], val[order]
        wm = np.maximum.accumulate(su)
        ws = (su // w) * w
        late = (wm - d) >= (ws + w)
        cents = np.floor(sv * 100 + 0.5).astype(np.int64)
        import collections
        acc = collections.defaultdict(lambda: [0, 0, 0])
        for i in range(n):
            a = acc[int(ws[i])]
            if late[i]:
                a[2] += 1
            else:
                a[0] += 1
                a[1] += int(cents[i])
        want = sorted((k, *v) for k, v in acc.items())
        have = list(got.itertuples(index=False, name=None))
        assert [tuple(x) for x in have] == want, f"trial {trial}"

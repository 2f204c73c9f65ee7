"""Cardinality + quantile operators: exact paths vs independent
oracles; sketch paths vs error bounds and merge laws."""

import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_distinct_exact_matches_pandas():
    import ray.data as rd

    from moonray.functions.sketch import distinct_count_exact

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    got = distinct_count_exact(ds, "user_id").take_all()[0]["n_user_id"]
    want = pq.read_table(f"{SF}/events.parquet",
                         columns=["user_id"]).to_pandas().user_id.nunique()
    assert got == want


def test_hll_registers_merge_law_and_accuracy():
    from moonray.functions.sketch import _hll_estimate, _hll_registers

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 62, size=300_000, dtype=np.int64)
    true_n = len(np.unique(vals))
    whole = _hll_registers(vals, p=12)
    # merge law: chunked partials folded by max == one-shot registers
    folded = np.zeros_like(whole)
    for chunk in np.array_split(vals, 7):
        folded = np.maximum(folded, _hll_registers(chunk, p=12))
    assert np.array_equal(folded, whole)
    est = _hll_estimate(whole)
    assert abs(est - true_n) / true_n < 0.05  # 3σ for p=12 is ~4.9%


def test_hll_e2e_small_range_linear_counting():
    import ray.data as rd

    from moonray.functions.sketch import distinct_count_hll

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    got = distinct_count_hll(ds, "user_id").take_all()[0]["n_user_id_approx"]
    want = pq.read_table(f"{SF}/events.parquet",
                         columns=["user_id"]).to_pandas().user_id.nunique()
    # tiny cardinality → linear-counting regime → essentially exact
    assert abs(got - want) <= max(1, 0.02 * want)


def test_quantiles_cents_exact_matches_numpy_disc():
    import ray.data as rd

    from moonray.functions.sketch import quantiles_cents_exact

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    got = {r["q"]: r["value_cents"]
           for r in quantiles_cents_exact(ds, "value").take_all()}
    vals = np.sort(np.floor(
        pq.read_table(f"{SF}/events.parquet", columns=["value"])
        ["value"].to_numpy() * 100 + 0.5).astype(np.int64))
    for q in (0.5, 0.9, 0.99):
        want = vals[int(np.ceil(q * len(vals))) - 1]  # percentile_disc
        assert got[f"{q:g}"] == want, q


def test_quantiles_sampled_rank_error_bound():
    import ray.data as rd

    from moonray.functions.sketch import quantiles_sampled

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "value"])
    got = {r["q"]: r["value"]
           for r in quantiles_sampled(ds, "value", "event_id",
                                      rate=0.5).take_all()}
    vals = np.sort(pq.read_table(f"{SF}/events.parquet",
                                 columns=["value"])["value"].to_numpy())
    n = len(vals)
    for q in (0.5, 0.9):
        # rank of the sampled answer must sit within ±5 rank-percent
        pos = np.searchsorted(vals, got[f"{q:g}"], side="right") / n
        assert abs(pos - q) < 0.05, (q, pos)
    # rate=1.0 degenerates to exact percentile_disc
    exact = {r["q"]: r["value"]
             for r in quantiles_sampled(ds, "value", "event_id",
                                        rate=1.0).take_all()}
    for q in (0.5, 0.9, 0.99):
        want = vals[int(np.ceil(q * n)) - 1]
        assert exact[f"{q:g}"] == want


def test_distinct_exact_nullable_and_large_keys():
    """Regression: numpy float64 detour crashed on nulls and collapsed
    keys above 2^53; Arrow-native dedup must count exactly and drop
    nulls like SQL COUNT(DISTINCT)."""
    import pyarrow as pa
    import ray.data as rd

    from moonray.functions.sketch import distinct_count_exact

    big = (1 << 53)
    ds = rd.from_arrow(pa.table({
        "k": pa.array([big, big + 1, None, 7, 7], pa.int64())}))
    got = distinct_count_exact(ds, "k").take_all()[0]["n_k"]
    assert got == 3


def test_hll_string_keys():
    import pyarrow as pa
    import ray.data as rd

    from moonray.functions.sketch import distinct_count_hll

    ds = rd.from_arrow(pa.table({
        "s": pa.array([f"key-{i % 37}" for i in range(500)], pa.string())}))
    got = distinct_count_hll(ds, "s").take_all()[0]["n_s_approx"]
    assert abs(got - 37) <= 2


def test_distinct_by_group_exact_and_hll():
    import ray.data as rd

    from moonray.functions.sketch import (distinct_count_exact_by,
                                          distinct_count_hll_by)

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    got = {r["event_type"]: r["n_user_id"]
           for r in distinct_count_exact_by(ds, "event_type",
                                            "user_id").take_all()}
    df = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    want = df.groupby("event_type").user_id.nunique().to_dict()
    assert got == want

    approx = {r["event_type"]: r["n_user_id_approx"]
              for r in distinct_count_hll_by(ds, "event_type",
                                             "user_id").take_all()}
    assert set(approx) == set(want)
    for k, n in want.items():
        assert abs(approx[k] - n) <= max(1, 0.05 * n), k

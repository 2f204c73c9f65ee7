"""Exact-k deterministic sampling: partitioning invariance, exact
counts, brute-force priority parity, and weighted inclusion bias."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def test_uniform_exact_k_and_partition_invariance():
    import ray.data as rd

    from moonray.functions.reservoir import uniform_sample_exact

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang"])
    a = sorted(r["doc_id"] for r in
               uniform_sample_exact(ds.repartition(2), 40,
                                    "doc_id", seed=7).take_all())
    b = sorted(r["doc_id"] for r in
               uniform_sample_exact(ds.repartition(11), 40,
                                    "doc_id", seed=7).take_all())
    assert len(a) == 40 and a == b
    c = sorted(r["doc_id"] for r in
               uniform_sample_exact(ds, 40, "doc_id", seed=8).take_all())
    assert c != a  # a new seed is a new draw


def test_uniform_matches_brute_force_priorities():
    import ray.data as rd

    from moonray.functions.reservoir import _priorities, uniform_sample_exact
    from moonray.util import hash_key_array

    ids = pa.array(np.arange(1000), pa.int64())
    t = pa.table({"doc_id": ids})
    got = sorted(r["doc_id"] for r in uniform_sample_exact(
        rd.from_arrow(t).repartition(7), 25, "doc_id", seed=3).take_all())
    pri = _priorities(ids, 3).astype(np.float64)
    want = sorted(np.asarray(ids)[np.argsort(pri, kind="stable")[:25]]
                  .tolist())
    assert got == want


def test_k_larger_than_corpus_returns_all():
    import ray.data as rd

    from moonray.functions.reservoir import uniform_sample_exact

    t = pa.table({"doc_id": pa.array(range(7), pa.int64())})
    got = uniform_sample_exact(rd.from_arrow(t), 100, "doc_id").take_all()
    assert sorted(r["doc_id"] for r in got) == list(range(7))


def test_weighted_bias_and_exclusions():
    import ray.data as rd

    from moonray.functions.reservoir import weighted_sample_exact

    n = 4000
    heavy = np.arange(n) < 400  # 10% of keys carry 50x weight
    t = pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "w": pa.array(np.where(heavy, 50.0, 1.0)),
    })
    got = weighted_sample_exact(rd.from_arrow(t).repartition(5),
                                400, "k", "w", seed=1).to_pandas()
    assert len(got) == 400
    frac_heavy = (got["k"] < 400).mean()
    # heavy keys hold ~85% of total weight; uniform would give 10%
    assert frac_heavy > 0.55

    # zero/negative/NaN weights can never be drawn
    t2 = pa.table({"k": pa.array(range(10), pa.int64()),
                   "w": pa.array([1.0] * 5 + [0.0, -1.0, float("nan"),
                                              1.0, 1.0])})
    got2 = weighted_sample_exact(rd.from_arrow(t2), 10, "k", "w").to_pandas()
    assert sorted(got2["k"]) == [0, 1, 2, 3, 4, 8, 9]


def test_per_group_exact_k():
    import ray.data as rd

    from moonray.functions.reservoir import (uniform_sample_exact,
                                             uniform_sample_per_group)

    t = pa.table({
        "k": pa.array(range(900), pa.int64()),
        "g": pa.array([f"g{v % 3}" for v in range(900)], pa.string()),
    })
    ds = rd.from_arrow(t).repartition(6)
    got = uniform_sample_per_group(ds, 20, "k", "g").to_pandas()
    assert got.groupby("g").size().to_dict() == {
        "g0": 20, "g1": 20, "g2": 20}
    # per-group draw == global bottom-k restricted to that group
    # (same priorities, same seed)
    one = uniform_sample_exact(
        rd.from_arrow(t.filter(
            pa.compute.equal(t["g"], "g1"))), 20, "k").to_pandas()
    assert sorted(got[got["g"] == "g1"]["k"]) == sorted(one["k"])
    # a tiny group returns all its rows
    t2 = pa.table({"k": pa.array(range(10), pa.int64()),
                   "g": pa.array(["a"] * 8 + ["b"] * 2, pa.string())})
    got2 = uniform_sample_per_group(rd.from_arrow(t2), 5, "k", "g") \
        .to_pandas()
    assert got2.groupby("g").size().to_dict() == {"a": 5, "b": 2}

"""Label-consistency embedding curation vs a live DuckDB oracle
(centroid via unnest+generate_subscripts) and score-law sanity."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_keep_set_matches_duckdb():
    import ray.data as rd

    from moonray.functions.embfilter import (label_consistency_keep,
                                             label_consistency_oracle_sql)

    ds = rd.read_parquet(f"{SF}/embeddings.parquet").repartition(5)
    got = label_consistency_keep(ds, 0.10).to_pandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS FROM '{SF}/embeddings.parquet'")
    want = con.sql(label_consistency_oracle_sql(0.10)).df()
    got = got.sort_values(["vec_id"], ignore_index=True)
    want = want.sort_values(["vec_id"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the threshold must actually split the corpus both ways, else the
    # oracle proves nothing
    n = con.sql("SELECT count(*) FROM embeddings").fetchone()[0]
    assert 0 < len(got) < n


def test_scores_bounded_and_batchsize_invariant():
    import ray.data as rd

    from moonray.functions.embfilter import label_centroid_scores

    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    a = label_centroid_scores(ds.repartition(2)).to_pandas()
    b = label_centroid_scores(ds.repartition(9)).to_pandas()
    a = a.sort_values("vec_id", ignore_index=True)
    b = b.sort_values("vec_id", ignore_index=True)
    assert np.all(np.abs(a["cos"]) <= 1.0 + 1e-12)
    # centroid partials fold over different batch splits → same scores
    # (float64 associativity drift only)
    assert np.allclose(a["cos"], b["cos"], rtol=0, atol=1e-12)
    assert (a["vec_id"] == b["vec_id"]).all()


def test_planted_mislabels_are_dropped():
    """Plant two well-separated clusters, mislabel a few rows — the
    filter must drop exactly the mislabeled rows at a mid threshold."""
    import ray.data as rd
    import pyarrow as pa

    from moonray.functions.embfilter import label_consistency_keep

    rng = np.random.default_rng(3)
    d, n = 16, 400
    c0 = np.zeros(d); c0[0] = 1.0
    c1 = np.zeros(d); c1[1] = 1.0
    vecs = np.where((np.arange(n) % 2 == 0)[:, None],
                    c0 + rng.normal(0, 0.05, (n, d)),
                    c1 + rng.normal(0, 0.05, (n, d)))
    labels = (np.arange(n) % 2).astype(np.int32)
    bad = np.array([10, 77, 200, 333])
    labels[bad] = 1 - labels[bad]
    t = pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    kept = label_consistency_keep(
        rd.from_arrow(t).repartition(4), 0.5).to_pandas()
    dropped = set(range(n)) - set(kept["vec_id"])
    assert dropped == set(bad.tolist())


def test_empty_partitions_and_zero_vectors():
    """Empty blocks must be skipped, and a zero-norm vector scores NaN
    (never passing a threshold — the SQL oracle's 0/0 behavior)."""
    import pyarrow as pa
    import ray.data as rd

    from moonray.functions.embfilter import (label_centroid_scores,
                                             label_consistency_keep)

    n, d = 5, 4
    vecs = np.eye(n, d)  # NB row 4 is already all-zero (d < n)
    vecs[3] = 0.0  # second zero-norm row
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32)),
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1, 1], pa.int32()),
    })
    ds = rd.from_arrow(t).repartition(12)  # more partitions than rows
    scored = label_centroid_scores(ds).to_pandas() \
        .sort_values("vec_id", ignore_index=True)
    assert np.isnan(scored.loc[3, "cos"])
    kept = label_consistency_keep(ds, -1.0).to_pandas()
    # NaN never clears >= -1.0: both zero-norm rows drop
    assert set(kept["vec_id"]) == {0, 1, 2}

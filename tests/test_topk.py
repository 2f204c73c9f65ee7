"""Group-wise top-k vs a pandas window oracle, incl. tie + small-group
edges and the partial-reduction invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _norm(df):
    return df[sorted(df.columns)].sort_values(
        by=sorted(df.columns), ignore_index=True)


def test_topk_matches_pandas_window_oracle():
    import ray.data as rd

    from moonray.functions.topk import top_k_per_group

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "lang", "n_chars"])
    got = _norm(top_k_per_group(ds, "lang", "n_chars", "doc_id", k=5)
                .to_pandas())
    df = pq.read_table(f"{SF}/documents.parquet",
                       columns=["doc_id", "lang", "n_chars"]).to_pandas()
    df = df.sort_values(["lang", "n_chars", "doc_id"],
                        ascending=[True, False, True])
    want = _norm(df.groupby("lang").head(5))
    pd.testing.assert_frame_equal(got, want)


def test_topk_partial_is_lossless():
    """The per-batch partial may never drop a row the global top-k
    needs: running _topk_table over slices then over the union equals
    one global pass."""
    from moonray.functions.topk import _topk_table

    rng = np.random.default_rng(3)
    n = 5000
    t = pa.table({
        "g": pa.array(rng.integers(0, 7, n), pa.int64()),
        "v": pa.array(rng.integers(0, 50, n), pa.int64()),  # many ties
        "id": pa.array(np.arange(n), pa.int64()),
    })
    whole = _topk_table(t, "g", "v", "id", 5)
    parts = [_topk_table(t.slice(i, 500), "g", "v", "id", 5)
             for i in range(0, n, 500)]
    merged = _topk_table(pa.concat_tables(parts), "g", "v", "id", 5)
    assert _norm(whole.to_pandas()).equals(_norm(merged.to_pandas()))


def test_topk_groups_smaller_than_k():
    from moonray.functions.topk import _topk_table

    t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([10, 20, 5], pa.int64()),
                  "id": pa.array([1, 2, 3], pa.int64())})
    out = _topk_table(t, "g", "v", "id", 5).to_pandas()
    assert len(out) == 3  # everything survives when |group| < k


def test_topk_unsigned_and_string_by_columns():
    """Regression: unary-negation descending sort corrupted unsigned
    'by' columns (0 wrapped to the top) and rejected strings."""
    from moonray.functions.topk import _topk_table

    t = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                  "v": pa.array([0, 5, 3], pa.uint64()),
                  "id": pa.array([1, 2, 3], pa.int64())})
    out = _topk_table(t, "g", "v", "id", 2).to_pandas()
    assert sorted(out.v.tolist()) == [3, 5]
    s = pa.table({"g": pa.array([1, 1, 1], pa.int64()),
                  "v": pa.array(["a", "c", "b"], pa.string()),
                  "id": pa.array([1, 2, 3], pa.int64())})
    out = _topk_table(s, "g", "v", "id", 2).to_pandas()
    assert sorted(out.v.tolist()) == ["b", "c"]

"""Quality-classifier batched inference vs the integer-exact DuckDB
oracle, plus the actor-pattern invariants (weights load once, decision
is a pure integer function)."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_logits_match_duckdb_exactly():
    import ray.data as rd

    from moonray.functions.classify import (quality_classifier_oracle_sql,
                                            quality_classifier_scores)

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    got = (quality_classifier_scores(ds)
           .to_pandas()[["doc_id", "z_millis", "quality_pred"]]
           .sort_values("doc_id", ignore_index=True))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{SF}/documents.parquet'")
    want = (con.sql(quality_classifier_oracle_sql()).df()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # integer-exact: no tolerance at all on the logit
    assert (got["z_millis"].to_numpy()
            == want["z_millis"].to_numpy()).all()
    # both classes must occur or the decision column proves nothing
    assert 0 < got["quality_pred"].sum() < len(got)


def test_sigmoid_consistent_with_logit():
    import ray.data as rd

    from moonray.functions.classify import quality_classifier_scores

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    df = quality_classifier_scores(ds).to_pandas()
    z = df["z_millis"].to_numpy() / 1000.0
    assert np.allclose(df["score"], 1 / (1 + np.exp(-z)), atol=0, rtol=1e-12)
    assert ((df["score"] >= 0.5) == (df["quality_pred"] == 1)).all()


def test_custom_weights_flow_through():
    import pyarrow as pa

    from moonray.functions.classify import QualityClassifier

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["the and of a short doc"], pa.string())})
    always = QualityClassifier({"intercept": 10**6, "n_tok_cap": 0,
                                "sw_permille": 0, "uq_permille": 0,
                                "mtl_x10": 0, "punct_permille": 0})(t)
    assert always["quality_pred"][0].as_py() == 1
    never = QualityClassifier({"intercept": -10**6, "n_tok_cap": 0,
                               "sw_permille": 0, "uq_permille": 0,
                               "mtl_x10": 0, "punct_permille": 0})(t)
    assert never["quality_pred"][0].as_py() == 0


def test_null_text_propagates_null():
    """NULL text rows produce NULL logit/decision/score (matching the
    oracle's NULL-propagating SQL expressions), never int-cast NaN."""
    import duckdb
    import pyarrow as pa
    import ray.data as rd

    from moonray.functions.classify import (quality_classifier_oracle_sql,
                                            quality_classifier_scores)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["the and of a normal document here",
                          None, "short"], pa.string()),
    })
    got = (quality_classifier_scores(rd.from_arrow(t))
           .to_pandas().sort_values("doc_id", ignore_index=True))
    assert pd.isna(got.loc[1, "z_millis"]) and pd.isna(got.loc[1, "score"])
    assert not pd.isna(got.loc[0, "z_millis"])
    con = duckdb.connect()
    con.register("documents", t)
    want = (con.sql(quality_classifier_oracle_sql()).df()
            .sort_values("doc_id", ignore_index=True))
    pd.testing.assert_frame_equal(
        got[["doc_id", "z_millis", "quality_pred"]], want,
        check_dtype=False)

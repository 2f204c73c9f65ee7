"""Feature-hashing text embedder: determinism, geometry, and the
end-to-end link into the embedding-consuming operators."""

import numpy as np
import pyarrow as pa

SF = "/root/testdata/sf0.001"


def _mat(df):
    return np.stack([np.asarray(v, np.float64)
                     for v in df.sort_values("doc_id")["embedding"]])


def test_deterministic_across_batch_splits_and_unit_norm():
    import ray.data as rd

    from moonray.functions.embed import embed_documents

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    a = _mat(embed_documents(ds.repartition(2), dim=32).to_pandas())
    b = _mat(embed_documents(ds.repartition(9), dim=32).to_pandas())
    assert np.array_equal(a, b)  # bit-identical: pure per-row function
    norms = np.linalg.norm(a, axis=1)
    assert np.allclose(norms[norms > 0], 1.0, atol=1e-6)


def test_geometry_shared_content_is_closer():
    import ray.data as rd

    from moonray.functions.embed import embed_documents

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog near the river",
            "the quick brown fox jumps over the lazy dog near a bridge",
            "completely unrelated text about parquet manifests and rust",
        ]),
    })
    m = _mat(embed_documents(rd.from_arrow(docs), dim=64).to_pandas())
    near = float(m[0] @ m[1])
    far = max(float(m[0] @ m[2]), float(m[1] @ m[2]))
    assert near > 0.5 > far


def test_seed_changes_embedding_space():
    import ray.data as rd

    from moonray.functions.embed import embed_documents

    ds = rd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).limit(50)
    a = _mat(embed_documents(ds, dim=32, seed=0).to_pandas())
    b = _mat(embed_documents(ds, dim=32, seed=1).to_pandas())
    assert not np.array_equal(a, b)


def test_e2e_links_into_knn_and_semantic_dedup():
    """documents → embed → brute-force kNN + semantic dedup run on the
    PRODUCED column — the full text-to-vector pipeline, no synthetic
    embeddings table involved."""
    import ray.data as rd

    from moonray.functions.dedup import semantic_dedup
    from moonray.functions.embed import embed_documents
    from moonray.functions.knn import knn_cosine

    ds = embed_documents(
        rd.read_parquet(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).limit(100),
        dim=32)
    first = ds.take(3)
    queries = [(r["doc_id"], np.asarray(r["embedding"], np.float64))
               for r in first]
    top = knn_cosine(ds.map_batches(
        lambda b: b.select(["doc_id", "embedding"])
        .rename_columns(["vec_id", "embedding"]), batch_format="pyarrow"),
        queries, k=5)
    got = top.to_pandas()
    assert set(got["qid"]) == {r["doc_id"] for r in first}
    assert (got.groupby("qid").size() == 5).all()

    cents = np.stack([q[1] for q in queries])
    kept = semantic_dedup(
        ds.map_batches(lambda b: b.select(["doc_id", "embedding"])
                       .rename_columns(["vec_id", "embedding"]),
                       batch_format="pyarrow"),
        threshold=0.95, centroids=cents)
    assert 0 < kept.count() <= 100

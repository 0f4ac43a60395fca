import numpy as np
import pytest

from network_feature_extractor_spark.operators import similarity


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_cosine_topk_matches_numpy(spark, emb):
    pdf = emb.toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    got = similarity.cosine_topk(emb, queries, k=5).toPandas()

    norms = np.linalg.norm(vecs, axis=1)
    for q in range(3):
        qi = np.where(ids == q)[0][0]
        cos = vecs @ vecs[qi] / np.maximum(norms * norms[qi], 1e-12)
        cos[qi] = -np.inf  # exclude self
        order = np.argsort(-cos, kind="stable")
        top = set(ids[order[:5]].tolist())
        g = got[got["query_id"] == q].sort_values("rank")
        assert len(g) == 5
        # allow tie-reordering at the boundary: scores must match
        exp_scores = np.sort(cos[order[:5]])[::-1]
        assert np.allclose(np.sort(g["cosine"])[::-1], exp_scores, rtol=1e-5)
        assert len(set(g["vec_id"]) & top) >= 4


def test_lsh_topk_subset_quality(spark, emb):
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = similarity.cosine_topk(emb, queries, k=3).toPandas()
    approx = similarity.cosine_topk_lsh(emb, queries, k=3).toPandas()
    # LSH results are a subset of the bucket; their scores can't beat exact
    for q in range(3):
        e = exact[exact["query_id"] == q]["cosine"].max()
        a = approx[approx["query_id"] == q]["cosine"].max()
        assert a <= e + 1e-9


def test_near_dup_pairs_threshold(spark, emb):
    pairs = similarity.embedding_near_dup_pairs(emb, threshold=0.5).toPandas()
    assert (pairs["cosine"] >= 0.5).all()
    assert (pairs["a"] < pairs["b"]).all()


def test_cosine_column_helper(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [0.0, 1.0]), (2, [1.0, 1.0], [1.0, 1.0])],
        ["id", "a", "b"],
    )
    got = similarity.with_cosine(df, "a", "b").toPandas().set_index("id")
    assert abs(got.loc[1, "cosine"]) < 1e-12
    assert abs(got.loc[2, "cosine"] - 1.0) < 1e-12

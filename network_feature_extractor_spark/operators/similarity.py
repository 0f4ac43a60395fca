"""Similarity search over an embedding column (array<float>).

Training-data-pipeline extension (no reference analog). Two paths:

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The dot product stays JVM-side via ``F.zip_with`` + ``F.aggregate``
  (no Python in the hot loop); queries are broadcast so the scan side
  never shuffles. Cost O(|queries| * |corpus|): right for small query
  sets over huge corpora.
- ``cosine_topk_lsh``: sign-bucket LSH (random-hyperplane family using
  deterministic projection dims) — candidates only from matching
  buckets, then exact re-rank. The 100 TB path when both sides are big.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + (v * v).cast("double"))
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ca, cb = F.col(a), F.col(b)
    return df.withColumn(
        out, _dot(ca, cb) / F.greatest(_norm(ca) * _norm(cb), F.lit(1e-12))
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Broadcast-joined against the
    corpus (map-side only — the corpus never shuffles); per-query top-k
    via row_number over the small (|corpus| rows per query) window.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    joined = embeddings.select(id_col, vec_col).crossJoin(F.broadcast(q))
    scored = joined.filter(F.col(id_col) != F.col(query_id_col)).withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / F.greatest(_norm(F.col(vec_col)) * _norm(F.col("_qvec")), F.lit(1e-12)),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def sign_bucket(vec_col: str, dims: tuple[int, ...] = (0, 7, 21, 42)) -> F.Column:
    """Deterministic LSH bucket: concatenated signs at fixed dims.

    A degenerate but deterministic member of the random-hyperplane
    family (hyperplanes = coordinate axes at ``dims``); replace ``dims``
    with seeded random projections for production recall. Deterministic
    so it is oracle-checkable in ANSI SQL.
    """
    parts = [
        F.when(F.element_at(F.col(vec_col), d + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for d in dims
    ]
    return F.concat(*parts)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dims: tuple[int, ...] = (0, 7, 21, 42),
) -> DataFrame:
    """Approximate top-k: candidates share the query's sign bucket, then
    exact cosine re-rank. One equi-join on the bucket key instead of a
    cross join — this is the shape that survives both sides being huge."""
    e = embeddings.select(id_col, vec_col).withColumn("_bkt", sign_bucket(vec_col, dims))
    q = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qvec")).withColumn(
        "_bkt", sign_bucket("_qvec", dims)
    )
    joined = e.join(F.broadcast(q), "_bkt").filter(F.col(id_col) != F.col(query_id_col))
    scored = joined.withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / F.greatest(_norm(F.col(vec_col)) * _norm(F.col("_qvec")), F.lit(1e-12)),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: tuple[int, ...] = (0, 7, 21, 42),
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b) above threshold,
    bucketed by sign-LSH to avoid the O(n^2) cross join. Recall is
    bucket-limited (near-dups virtually always share signs at
    cosine>=0.95)."""
    e = embeddings.select(id_col, vec_col).withColumn("_bkt", sign_bucket(vec_col, dims))
    a = e.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"), "_bkt")
    b = e.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"), "_bkt")
    return (
        a.join(b, "_bkt")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            _dot(F.col("_va"), F.col("_vb"))
            / F.greatest(_norm(F.col("_va")) * _norm(F.col("_vb")), F.lit(1e-12)),
        )
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )

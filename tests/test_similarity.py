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


def test_cosine_topk_bounded_equals_single_window(spark, emb):
    """Two-level exact top-k (per-partition reduce + tiny re-rank) must
    return the IDENTICAL rows and cosine doubles as the one-window form:
    (cosine desc, id asc) is a total order, so the global top-k is
    contained in the union of partition top-ks."""
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    cols = ["query_id", "rank"]
    b = (
        similarity.cosine_topk(emb, queries, k=5)
        .toPandas().sort_values(cols).reset_index(drop=True)
    )
    u = (
        similarity.cosine_topk(emb, queries, k=5, bounded=False)
        .toPandas().sort_values(cols).reset_index(drop=True)
    )
    assert (b["vec_id"].values == u["vec_id"].values).all()
    assert (b["cosine"].values == u["cosine"].values).all()  # bit-identical


def test_partition_topk_invariant_under_repartition(spark, emb):
    """The two-level top-k must return the same global result whatever
    the physical partitioning of the scored frame (1 partition == the
    degenerate single-reduce case; 16 partitions at 500 rows exercises
    partial per-partition winners)."""
    from pyspark.sql import functions as F

    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    q = queries.select("query_id", F.col("embedding").alias("_qvec"))
    scored = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            similarity._dot(F.col("embedding"), F.col("_qvec"))
            / F.greatest(
                similarity._norm(F.col("embedding"))
                * similarity._norm(F.col("_qvec")),
                F.lit(1e-12),
            ),
        )
        .select("query_id", "vec_id", "cosine")
    )
    results = []
    for p in (1, 3, 16):
        reduced = similarity._partition_topk(
            scored.repartition(p), 5, "query_id", "vec_id"
        )
        w = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy(
            "query_id"
        ).orderBy(F.col("cosine").desc(), F.col("vec_id"))
        out = (
            reduced.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .toPandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        results.append(out)
    for r in results[1:]:
        assert (r["vec_id"].values == results[0]["vec_id"].values).all()
        assert (r["cosine"].values == results[0]["cosine"].values).all()


def test_lsh_topk_subset_quality(spark, emb):
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = similarity.cosine_topk(emb, queries, k=3).toPandas()
    # coarse buckets (4 bits) so every query has candidates at this scale
    approx = similarity.cosine_topk_lsh(
        emb, queries, k=3, n_tables=2, n_bits=4
    ).toPandas()
    # LSH results are a subset of the bucket; their scores can't beat exact
    for q in range(3):
        e = exact[exact["query_id"] == q]["cosine"].max()
        a = approx[approx["query_id"] == q]["cosine"]
        assert len(a) > 0
        assert a.max() <= e + 1e-9


def test_near_dup_planted_exact_dups_always_found(spark, emb):
    # exact duplicates share every sign bucket in every table -> recall 1
    dups = emb.filter("vec_id < 10").selectExpr(
        "vec_id + 1000 as vec_id", "embedding"
    )
    corpus = emb.select("vec_id", "embedding").unionByName(dups)
    pairs = similarity.embedding_near_dup_pairs(
        corpus, threshold=0.99, n_tables=2, n_bits=8
    ).toPandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    for i in range(10):
        assert (i, i + 1000) in got
    assert (pairs["cosine"] >= 0.99).all()


def test_near_dup_recall_vs_brute_force(spark):
    # clustered synthetic corpus: 20 bases x tight perturbed copies
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 64))
    rows = []
    vid = 0
    for i in range(20):
        for _ in range(3):
            v = base[i] + rng.normal(scale=0.02, size=64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    vecs = np.array([r[1] for r in rows])
    nrm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = nrm @ nrm.T
    brute = {
        (a, b)
        for a in range(vid)
        for b in range(a + 1, vid)
        if cos[a, b] >= 0.95
    }
    got_df = similarity.embedding_near_dup_pairs(
        df, threshold=0.95, n_tables=8, n_bits=4
    ).toPandas()
    got = {(a, b) for a, b in zip(got_df["a"], got_df["b"])}
    assert got <= brute  # re-rank is exact -> no false positives
    assert len(got & brute) >= 0.9 * len(brute)  # multi-table OR recall


def test_hyperplane_weights_deterministic_and_bounded(spark):
    w1 = similarity.hyperplane_weights(2, 4, 8, seed="s")
    w2 = similarity.hyperplane_weights(2, 4, 8, seed="s")
    assert w1 == w2
    assert w1 != similarity.hyperplane_weights(2, 4, 8, seed="other")
    flat = [x for t in w1 for p in t for x in p]
    assert all(-1.0 <= x < 1.0 for x in flat)


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


def test_ivf_topk_subset_of_exact_and_recall(spark, emb):
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = similarity.cosine_topk(emb, queries, k=3).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, k=3, n_centroids=4, nprobe=2
    ).toPandas()
    for q in range(3):
        a = approx[approx["query_id"] == q]["cosine"]
        e = exact[exact["query_id"] == q]["cosine"].max()
        assert len(a) > 0
        assert a.max() <= e + 1e-9  # re-rank is exact: can't beat brute force


def test_ivf_assignment_deterministic(spark, emb):
    cents = similarity.ivf_centroids(emb, n_centroids=4)
    a1 = similarity.ivf_assign(emb, cents).toPandas().set_index("vec_id")["cent_id"]
    a2 = similarity.ivf_assign(emb, cents).toPandas().set_index("vec_id")["cent_id"]
    assert (a1.sort_index() == a2.sort_index()).all()
    assert similarity.ivf_centroids(emb, n_centroids=4).count() == 4


def test_ivf_assign_expr_arrow_window_paths_identical(spark, emb):
    """The three nprobe=1 assignment forms — row-local expression fold,
    Arrow numpy twin, and the old broadcast+row_number window — must
    assign every vector the SAME centroid (same cosine doubles, same
    min-cent_id tie-break)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cents = similarity.ivf_centroids(emb, n_centroids=8)
    rows = cents.collect()
    expr = (
        similarity._ivf_assign_expr(emb, rows, "vec_id", "embedding")
        .toPandas().set_index("vec_id")["cent_id"].sort_index()
    )
    arrow = (
        similarity._ivf_assign_arrow(emb, rows, "vec_id", "embedding")
        .toPandas().set_index("vec_id")["cent_id"].sort_index()
    )
    joined = emb.select("vec_id", "embedding").crossJoin(F.broadcast(cents))
    scored = joined.withColumn(
        "_cos",
        similarity._dot(F.col("embedding"), F.col("cvec"))
        / F.greatest(
            similarity._norm(F.col("embedding")) * similarity._norm(F.col("cvec")),
            F.lit(1e-12),
        ),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("cent_id"))
    window = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 1)
        .select("vec_id", "cent_id")
        .toPandas().set_index("vec_id")["cent_id"].sort_index()
    )
    assert (expr.astype("int64") == window.astype("int64")).all()
    assert (arrow.astype("int64") == window.astype("int64")).all()


def test_ivf_kmeans_update_matches_numpy_exactly(spark, emb):
    """One Lloyd iteration == a numpy replica, EXACTLY: assignments by
    (cosine desc, cent_id asc) argmax, update as exact int64 sums of
    floor(x * 2^20) divided by n * 2^20 — the quantized accumulation
    that makes the refined centroids engine-portable rationals."""
    pdf = emb.toPandas().sort_values("vec_id").reset_index(drop=True)
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()

    seeds = similarity.ivf_centroids(emb, n_centroids=4).toPandas()
    seeds = seeds.sort_values("cent_id").reset_index(drop=True)
    C = np.stack(seeds["cvec"].to_numpy()).astype(np.float64)
    cids = seeds["cent_id"].to_numpy()

    cos = (vecs @ C.T) / np.maximum(
        np.linalg.norm(vecs, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :],
        1e-12,
    )
    asg = cids[np.argmax(cos, axis=1)]  # first max == min cent_id (sorted)

    Q = 1 << 20
    qv = np.floor(vecs * Q).astype(np.int64)
    expected = {}
    for c in np.unique(asg):
        sel = qv[asg == c]
        expected[c] = sel.sum(axis=0).astype(np.float64) / (len(sel) * Q)

    got = (
        similarity.ivf_centroids_kmeans(emb, n_centroids=4, n_iter=1)
        .toPandas().sort_values("cent_id").reset_index(drop=True)
    )
    assert sorted(got["cent_id"]) == sorted(expected)
    for _, r in got.iterrows():
        assert (np.array(r["cvec"]) == expected[r["cent_id"]]).all(), r["cent_id"]


def test_ivf_kmeans_deterministic_and_shaped(spark, emb):
    a = similarity.ivf_centroids_kmeans(emb, n_centroids=4, n_iter=2).toPandas()
    b = similarity.ivf_centroids_kmeans(emb, n_centroids=4, n_iter=2).toPandas()
    a = a.sort_values("cent_id").reset_index(drop=True)
    b = b.sort_values("cent_id").reset_index(drop=True)
    assert len(a) <= 4 and len(a) == len(b)
    for x, y in zip(a["cvec"], b["cvec"]):
        assert len(x) == 64
        assert (np.array(x) == np.array(y)).all()


def test_lsh_buckets_highdim_bit_identical_to_expression_path(spark, emb):
    """The Arrow-batched high-dim bucketing must assign every (vector,
    table) the SAME bucket as the expression path — left-assoc double
    accumulation on both sides makes the sign bits bit-identical."""
    kw = dict(n_tables=3, n_bits=12, dim=64, seed="hp")
    a = (
        similarity.lsh_buckets(emb, **kw)
        .select("vec_id", "tbl", "bucket")
        .toPandas()
        .sort_values(["vec_id", "tbl"])
        .reset_index(drop=True)
    )
    b = (
        similarity.lsh_buckets_highdim(emb, **kw)
        .select("vec_id", "tbl", "bucket")
        .toPandas()
        .sort_values(["vec_id", "tbl"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) == emb.count() * 3
    assert (a["vec_id"].to_numpy() == b["vec_id"].to_numpy()).all()
    assert (a["bucket"].to_numpy() == b["bucket"].to_numpy()).all()


def test_lsh_buckets_highdim_scales_to_wide_vectors(spark):
    """dim=512 smoke: plan stays literal-free (no 512-element arrays in
    the plan) and identical vectors share every bucket."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=512).astype("float32").tolist()
    rows = [(0, base), (1, base), (2, rng.normal(size=512).astype("float32").tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.lsh_buckets_highdim(df, n_tables=2, n_bits=16, dim=512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan or "mapInPandas" in plan.lower()
    pdf = out.toPandas()
    b0 = pdf[pdf["vec_id"] == 0].set_index("tbl")["bucket"]
    b1 = pdf[pdf["vec_id"] == 1].set_index("tbl")["bucket"]
    assert (b0.sort_index() == b1.sort_index()).all()
    assert len(pdf) == 6 and pdf["bucket"].str.len().eq(16).all()


def test_ivf_topk_with_kmeans_refinement(spark, emb):
    """Refined-centroid IVF keeps the exactness contract of the re-rank
    (scores never beat brute force) and still returns k rows per query."""
    queries = emb.filter("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    exact = similarity.cosine_topk(emb, queries, k=3).toPandas()
    approx = similarity.ivf_topk(
        emb, queries, k=3, n_centroids=4, nprobe=2, kmeans_iters=2
    ).toPandas()
    for q in range(3):
        a = approx[approx["query_id"] == q]["cosine"]
        e = exact[exact["query_id"] == q]["cosine"].max()
        assert len(a) > 0
        assert a.max() <= e + 1e-9


def test_cosine_topk_nan_embeddings_bounded_equals_unbounded(spark):
    """A NaN vector component makes the cosine NaN; NaN ranks FIRST in a
    Spark desc window but LAST in the pandas level-1 sort, so without the
    shared NaN filter the bounded and single-window forms would diverge
    (r4 ADVICE). Both must now drop NaN-cosine rows and agree exactly."""
    import math

    from pyspark.sql import functions as F

    rows = [(i, [float(i + d) for d in range(4)]) for i in range(20)]
    rows.append((99, [float("nan"), 1.0, 1.0, 1.0]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    b = (
        similarity.cosine_topk(emb, queries, k=5, bounded=True)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    u = (
        similarity.cosine_topk(emb, queries, k=5, bounded=False)
        .toPandas().sort_values("rank").reset_index(drop=True)
    )
    assert len(b) == 5 and len(u) == 5
    assert (b["vec_id"].values == u["vec_id"].values).all()
    assert (b["cosine"].values == u["cosine"].values).all()
    assert 99 not in set(b["vec_id"])  # NaN row excluded, not top-ranked
    assert not any(math.isnan(c) for c in b["cosine"])


def test_pair_verify_arrow_bit_identical_to_expression(spark, emb):
    """r8: the Arrow pair-verification must produce BIT-identical
    cosines to the expression (interpreted-HOF) form — same left-assoc
    accumulation from 0.0, same greatest/NaN semantics — so the
    near-dup output is unchanged by the physical form."""
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.operators import similarity as S

    e = S.lsh_buckets(emb, "vec_id", "embedding", n_tables=2, n_bits=4)
    a = e.select("tbl", "bucket", F.col("vec_id").alias("a"), F.col("embedding").alias("_va"))
    b = e.select("tbl", "bucket", F.col("vec_id").alias("b"), F.col("embedding").alias("_vb"))
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "_va", "_vb")
    )
    expr = (
        cand.withColumn(
            "cosine",
            S._dot(F.col("_va"), F.col("_vb"))
            / F.greatest(S._norm(F.col("_va")) * S._norm(F.col("_vb")), F.lit(1e-12)),
        )
        .filter(F.col("cosine") >= 0.3)
        .select("a", "b", "cosine")
        .distinct()
        .toPandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    arrow = (
        S._verify_pairs_cosine_arrow(cand, 0.3)
        .distinct()
        .toPandas()
        .sort_values(["a", "b"]).reset_index(drop=True)
    )
    assert len(expr) == len(arrow) and len(expr) > 0
    assert (expr["a"].values == arrow["a"].values).all()
    assert (expr["b"].values == arrow["b"].values).all()
    assert (expr["cosine"].values == arrow["cosine"].values).all()  # bit-exact

import itertools

import pytest

from network_feature_extractor_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the sleepy dog"),  # near dup
        (3, "spark shuffles partitions across many executors fast"),
        (4, "completely different text about databases and queries here"),
        (5, "spark shuffles partitions across many executors fast today"),  # near dup of 3
    ]
    return spark.createDataFrame(base, ["doc_id", "text"])


def test_exact_dedup(spark, docs):
    kept = dedup.exact_dedup(docs).toPandas()
    assert sorted(kept["doc_id"]) == [0, 2, 3, 4, 5]
    groups = dedup.exact_dup_groups(docs).toPandas()
    assert len(groups) == 1 and groups["keeper_id"].iloc[0] == 0


def test_ngram_jaccard_pairs(spark, docs):
    pairs = dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.5).toPandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got  # identical -> jaccard 1.0
    assert (3, 5) in got
    assert (0, 4) not in got and (3, 4) not in got
    j01 = pairs[(pairs["a"] == 0) & (pairs["b"] == 1)]["jaccard"].iloc[0]
    assert abs(j01 - 1.0) < 1e-12


def test_minhash_lsh_finds_near_dups(spark, docs):
    cand = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=8, shingle_n=2).toPandas()
    got = {(a, b) for a, b in zip(cand["a"], cand["b"])}
    assert (0, 1) in got  # identical docs always collide in every band
    # disjoint docs must not collide
    assert (0, 4) not in got


def test_minhash_signature_identical_docs_equal(spark, docs):
    sig = dedup.minhash_signatures(docs, num_hashes=8, shingle_n=2).toPandas()
    s0 = sig[sig["doc_id"] == 0].iloc[0, 1:].tolist()
    s1 = sig[sig["doc_id"] == 1].iloc[0, 1:].tolist()
    assert s0 == s1


def test_simhash_hamming(spark, docs):
    pairs = dedup.simhash_near_pairs(docs, max_hamming=16).toPandas()
    got = {(a, b): h for a, b, h in zip(pairs["a"], pairs["b"], pairs["hamming"])}
    assert got.get((0, 1)) == 0  # identical -> distance 0
    if (3, 5) in got:
        assert got[(3, 5)] <= 16
    # sanity: hamming symmetric bound
    for (a, b), h in got.items():
        assert 0 <= h <= 16 and a < b


def test_simhash_values_deterministic(spark, docs):
    a = dedup.simhash_64(docs).toPandas().set_index("doc_id")["simhash"]
    b = dedup.simhash_64(docs).toPandas().set_index("doc_id")["simhash"]
    assert (a.sort_index() == b.sort_index()).all()
    assert a[0] == a[1]


def _simhash_py(text: str) -> int:
    """Independent reference: frequency-weighted bit votes over the first
    8 bytes of each token's md5 (same spec as operators/dedup.simhash_64,
    implemented the imperative way)."""
    import hashlib

    votes = [0] * 64
    for tok in text.lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = sum(1 << b for b in range(64) if votes[b] > 0)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_matches_python_reference(spark, docs):
    got = dedup.simhash_64(docs).toPandas().set_index("doc_id")["simhash"]
    pdf = docs.toPandas()
    for _, row in pdf.iterrows():
        assert got[row["doc_id"]] == _simhash_py(row["text"]), row["doc_id"]


def test_simhash_empty_doc_is_zero(spark):
    d = spark.createDataFrame([(0, "hello world"), (1, " "), (2, "")], ["doc_id", "text"])
    got = dedup.simhash_64(d).toPandas().set_index("doc_id")["simhash"]
    assert got[1] == 0 and got[2] == 0 and got[0] != 0


def test_jaccard_df_cap_kills_hot_shingle_fanout(spark):
    # 400 docs all sharing one boilerplate token; each also has a unique
    # token. Uncapped, the boilerplate alone fans out ~80k join rows; with
    # the cap the hot shingle is dropped and no pair survives.
    rows = [(i, f"boilerplate unique{i}") for i in range(400)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.ngram_jaccard_pairs(d, n=1, threshold=0.1, df_cap=10).toPandas()
    assert len(capped) == 0
    # near-dups sharing *rare* shingles still pair up under the cap
    rows2 = rows + [(1000, "rare shared tokens here"), (1001, "rare shared tokens here")]
    d2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    capped2 = dedup.ngram_jaccard_pairs(d2, n=1, threshold=0.9, df_cap=10).toPandas()
    got = {(a, b) for a, b in zip(capped2["a"], capped2["b"])}
    assert got == {(1000, 1001)}


def test_jaccard_df_cap_matches_stopword_removal(spark, docs):
    # cap=3 on the fixture: 'the' (df 3 of 6 docs <= cap stays), any token
    # above the cap is treated as a stopword on BOTH sides of the ratio.
    import itertools as it

    cap = 2
    pdf = docs.toPandas()
    toksets = {r["doc_id"]: set(r["text"].lower().split()) for _, r in pdf.iterrows()}
    dfreq = {}
    for s in toksets.values():
        for t in s:
            dfreq[t] = dfreq.get(t, 0) + 1
    kept = {d: {t for t in s if dfreq[t] <= cap} for d, s in toksets.items()}
    expected = {}
    for a, b in it.combinations(sorted(kept), 2):
        if not kept[a] or not kept[b]:
            continue
        inter = len(kept[a] & kept[b])
        if inter == 0:
            continue
        j = inter / len(kept[a] | kept[b])
        if j >= 0.2:
            expected[(a, b)] = j
    got_df = dedup.ngram_jaccard_pairs(docs, n=1, threshold=0.2, df_cap=cap).toPandas()
    got = {(a, b): j for a, b, j in zip(got_df["a"], got_df["b"], got_df["jaccard"])}
    assert set(got) == set(expected)
    for k in expected:
        assert abs(got[k] - expected[k]) < 1e-12


def test_exact_dedup_degenerate_input_no_window(spark):
    # the dedup worst case: one text duplicated massively. Keeper selection
    # must be algebraic (groupBy min + semi join), never a row_number window
    # that routes the whole duplicate group through one task.
    from pyspark.sql import functions as F

    d = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 99_990, F.lit("boilerplate body"))
        .otherwise(F.concat(F.lit("unique "), F.col("id"))).alias("text"),
    )
    out = dedup.exact_dedup(d)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # no per-hash window partition anywhere
    pdf = out.toPandas()
    assert len(pdf) == 11  # 1 keeper for the hot text + 10 uniques
    assert pdf["doc_id"].min() == 0  # lowest id kept for the hot text


def test_exact_dedup_double_ingested_rows(spark):
    # the same (id, text) row ingested twice must collapse to ONE output
    # row (it ties with itself at min id in the semi-join)
    d = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (3, "b"), (3, "b")], ["doc_id", "text"]
    )
    got = dedup.exact_dedup(d).toPandas()
    assert sorted(got["doc_id"]) == [1, 3]
    assert len(got) == 2


def test_exact_dedup_null_text_keeps_one(spark):
    # null join keys never match themselves: without the sentinel hash the
    # semi-join would silently DROP every null-text doc instead of keeping
    # the lowest-id one
    d = spark.createDataFrame(
        [(0, "x"), (1, None), (2, None)], "doc_id long, text string"
    )
    got = sorted(r.doc_id for r in dedup.exact_dedup(d).collect())
    assert got == [0, 1]


def test_simhash_block_cap_kills_identical_corpus_fanout(spark):
    # all-identical corpus -> one signature -> every 16-bit block bucket
    # holds all docs. With the cap, no quadratic self-join survives.
    rows = [(i, "same exact text in every doc") for i in range(300)]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = dedup.simhash_near_pairs(d, max_hamming=3, max_bucket=50).toPandas()
    assert len(capped) == 0  # hot buckets dropped, bounded recall tradeoff
    # pairs in small buckets still survive alongside the hot corpus
    rows2 = rows + [(1000, "a rare different document"), (1001, "a rare different document")]
    d2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    got = dedup.simhash_near_pairs(d2, max_hamming=3, max_bucket=50).toPandas()
    assert {(a, b) for a, b in zip(got["a"], got["b"])} == {(1000, 1001)}


def test_minhash_lsh_cap_uses_broadcast_anti_join(spark, docs):
    # plan shape: bucket capping must be a broadcast anti-join after a
    # partial-aggregable count, not a count-over-window on the bucket
    out = dedup.minhash_lsh_pairs(docs, num_hashes=16, bands=4, shingle_n=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti, BuildRight" in plan or "LeftAnti" in plan
    # the only Windows allowed are the shingle lead() windows, whose
    # partition key is the doc id — never (band, bucket)
    assert "windowspecdefinition(band" not in plan.lower()


def test_dedup_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    kept = dedup.exact_dedup(docs).count()
    assert 0 < kept <= n
    pairs = dedup.ngram_jaccard_pairs(docs.limit(100), n=3, threshold=0.9)
    for a, b, j in itertools.islice(pairs.collect(), 5):
        assert a < b and 0.9 <= j <= 1.0


def test_dup_clusters_components(spark):
    # components: {1,2,3} (chain), {10,11}, singleton edge-less docs absent
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["a", "b"]
    )
    got = (
        dedup.dup_clusters(pairs)
        .toPandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dup_clusters_long_chain_converges(spark):
    # worst-case diameter: a 40-node path; label must propagate end to end
    pairs = spark.createDataFrame([(i, i + 1) for i in range(40)], ["a", "b"])
    got = dedup.dup_clusters(pairs, max_iter=50).toPandas()
    assert (got["cluster_id"] == 0).all()
    assert len(got) == 41


def _union_find(edges, nodes):
    """Independent ground truth: plain python union-find -> node: comp min."""
    parent = {n: n for n in nodes}

    def find(n):
        while parent[n] != n:
            parent[n] = parent[parent[n]]
            n = parent[n]
        return n

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def test_dup_clusters_bigstar_matches_union_find(spark):
    """large-star/small-star == union-find ground truth on adversarial
    shapes: long chain (diameter), giant star (hub skew), random graph,
    plus separate cliques."""
    import random

    rnd = random.Random(13)
    shapes = {
        "chain": [(i, i + 1) for i in range(60)],
        "star": [(0, i) for i in range(1, 200)],
        "cliques": [(a, b) for base in (300, 400) for a in range(base, base + 6)
                    for b in range(a + 1, base + 6)],
        "random": [(rnd.randrange(500, 560), rnd.randrange(500, 560)) for _ in range(80)],
    }
    edges = [e for es in shapes.values() for e in es if e[0] != e[1]]
    nodes = sorted({n for e in edges for n in e})
    exp = _union_find(edges, nodes)

    pairs = spark.createDataFrame(edges, ["a", "b"])
    got = (
        dedup.dup_clusters_bigstar(pairs)
        .toPandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    assert got == exp
    # and it agrees with the min-label implementation
    got2 = (
        dedup.dup_clusters(pairs, max_iter=80)
        .toPandas()
        .set_index("doc_id")["cluster_id"]
        .to_dict()
    )
    assert got2 == exp


def test_dup_clusters_bigstar_converges_fast_on_chain(spark):
    """The whole point of big-star: a 100-node path must converge in
    O(log^2 n) rounds, far below a diameter's worth of iterations."""
    pairs = spark.createDataFrame([(i, i + 1) for i in range(100)], ["a", "b"])
    got = dedup.dup_clusters_bigstar(pairs, max_iter=12).toPandas()
    assert len(got) == 101
    assert (got["cluster_id"] == 0).all()


def test_dup_clusters_nonconvergence_surfaces(spark):
    """r3 ADVICE: exhausting max_iter must not silently emit a broken
    labeling — bigstar raises (duplicate doc_id rows with conflicting
    cluster_ids are structurally invalid), min-label propagation warns
    (labels stay one-per-doc but may split a component)."""
    import warnings

    import pytest

    pairs = spark.createDataFrame([(i, i + 1) for i in range(100)], ["a", "b"])
    with pytest.raises(RuntimeError, match="not stable"):
        dedup.dup_clusters_bigstar(pairs, max_iter=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        dedup.dup_clusters(pairs, max_iter=2).count()
    assert any("no fixpoint" in str(x.message) for x in w)


def test_semantic_dedup_end_to_end(spark):
    """Docs with (near-)identical embeddings collapse to the lowest-id
    representative; distinct docs survive untouched."""
    import numpy as np

    rng = np.random.default_rng(5)
    base1 = rng.normal(size=64).astype("float32")
    base2 = rng.normal(size=64).astype("float32")
    rows = [
        (0, base1.tolist()), (1, base1.tolist()), (7, base1.tolist()),  # cluster -> keep 0
        (2, base2.tolist()), (5, base2.tolist()),                        # cluster -> keep 2
        (3, rng.normal(size=64).astype("float32").tolist()),             # singletons
        (4, rng.normal(size=64).astype("float32").tolist()),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    docs = emb.selectExpr("vec_id as doc_id", "concat('doc ', vec_id) as text")
    kept = dedup.semantic_dedup(
        docs, emb, threshold=0.999, n_tables=4, n_bits=8, dim=64
    ).toPandas()
    assert sorted(kept["doc_id"]) == [0, 2, 3, 4]


def test_drop_hot_buckets_invariants(spark):
    """For ANY bucketed input: buckets over the cap vanish entirely,
    buckets at or below it pass through byte-identical."""
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.operators.buckets import drop_hot_buckets

    # bucket b has (b*7 % 23) + 1 rows -> mix of sizes 1..23
    rows = [(b, i) for b in range(30) for i in range((b * 7) % 23 + 1)]
    df = spark.createDataFrame(rows, ["bucket", "payload"])
    cap = 10
    out = drop_hot_buckets(df, ["bucket"], cap).toPandas()
    in_counts = {b: (b * 7) % 23 + 1 for b in range(30)}
    out_counts = out.groupby("bucket").size().to_dict()
    for b, n in in_counts.items():
        if n > cap:
            assert b not in out_counts, b
        else:
            assert out_counts.get(b) == n, b


def test_ensure_min_scan_parallelism_is_noop_on_wide_input(spark):
    from network_feature_extractor_spark.operators.buckets import (
        ensure_min_scan_parallelism,
    )

    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    wide = spark.range(1000).repartition(par * 2)
    assert ensure_min_scan_parallelism(narrow, "id").rdd.getNumPartitions() == par
    out = ensure_min_scan_parallelism(wide, "id")
    assert out is wide  # identity: no shuffle injected on large inputs


def test_ensure_min_scan_parallelism_file_scans_no_physical_planning(
    spark, tmp_path
):
    """File-backed inputs decide via the file index + FS metadata only
    (r3 verdict: the old rdd.getNumPartitions() forced a physical-plan
    translation per call). Many-file scan -> identity no-op; single
    small file -> repartition to defaultParallelism."""
    from network_feature_extractor_spark.operators.buckets import (
        _estimated_scan_splits,
        ensure_min_scan_parallelism,
    )

    par = spark.sparkContext.defaultParallelism
    many = str(tmp_path / "many")
    one = str(tmp_path / "one")
    spark.range(1000).repartition(par * 2).write.parquet(many)
    spark.range(1000).coalesce(1).write.parquet(one)

    wide = spark.read.parquet(many)
    assert _estimated_scan_splits(wide) >= par
    assert ensure_min_scan_parallelism(wide, "id") is wide

    narrow = spark.read.parquet(one)
    assert _estimated_scan_splits(narrow) == 1
    assert (
        ensure_min_scan_parallelism(narrow, "id").rdd.getNumPartitions() == par
    )


def test_scan_splits_tolerates_suffixed_maxpartitionbytes(spark, tmp_path):
    """Spark accepts '128m'/'128MB'/'1g' spellings for
    spark.sql.files.maxPartitionBytes; the split estimator must parse
    them (r4 ADVICE: int(...rstrip('b')) raised ValueError and killed
    the guard instead of degrading)."""
    from network_feature_extractor_spark.operators.buckets import (
        _estimated_scan_splits,
        _parse_byte_size,
    )

    assert _parse_byte_size("134217728") == 134217728
    assert _parse_byte_size("134217728b") == 134217728
    assert _parse_byte_size("128m") == 128 << 20
    assert _parse_byte_size("128MB") == 128 << 20
    assert _parse_byte_size("1g") == 1 << 30
    assert _parse_byte_size("64k") == 64 << 10
    # mis-parses degrade to the 128 MiB default, never raise
    assert _parse_byte_size("garbage") == 134217728
    assert _parse_byte_size(None) == 134217728

    one = str(tmp_path / "one_sfx")
    spark.range(1000).coalesce(1).write.parquet(one)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")
        assert _estimated_scan_splits(spark.read.parquet(one)) == 1
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        assert _estimated_scan_splits(spark.read.parquet(one)) == 1
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_paragraph_dedup_first_occurrence_and_rebuild(spark):
    rows = [
        (0, "shared header\n\nunique zero\n\nshared footer"),
        (1, "shared header\n\nunique one"),
        (2, "shared header\n\nshared footer"),  # everything seen in doc 0
        (3, "unique three\n\n\n\nunique three"),  # within-doc dup + empty para
        (4, ""),  # no paragraphs at all -> absent from output
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = dedup.paragraph_dedup(df).toPandas().set_index("doc_id").sort_index()
    assert list(got.index) == [0, 1, 2, 3]  # doc 4 had zero paragraphs
    assert got.loc[0, "n_paras"] == 3 and got.loc[0, "n_kept"] == 3
    assert got.loc[0, "dedup_text"] == rows[0][1]
    assert got.loc[1, "n_kept"] == 1
    assert got.loc[1, "dedup_text"] == "unique one"
    assert got.loc[2, "n_kept"] == 0 and got.loc[2, "dedup_text"] == ""
    # \n\n\n\n collapses (sep regex \n\n+); within-doc dup keeps FIRST
    assert got.loc[3, "n_paras"] == 2 and got.loc[3, "n_kept"] == 1
    assert got.loc[3, "dedup_text"] == "unique three"


def test_paragraph_dedup_order_preserved(spark):
    # keeper is corpus-wide (min doc_id, min para_idx); surviving
    # paragraphs must rebuild in ORIGINAL positional order even when the
    # dropped ones interleave
    rows = [
        (10, "b\n\nz"),
        (20, "q\n\nb\n\nr\n\nz\n\ns"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = dedup.paragraph_dedup(df).toPandas().set_index("doc_id")
    assert got.loc[20, "dedup_text"] == "q\n\nr\n\ns"
    assert got.loc[20, "n_paras"] == 5 and got.loc[20, "n_kept"] == 3

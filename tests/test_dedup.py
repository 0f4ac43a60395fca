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


def test_dedup_on_real_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    kept = dedup.exact_dedup(docs).count()
    assert 0 < kept <= n
    pairs = dedup.ngram_jaccard_pairs(docs.limit(100), n=3, threshold=0.9)
    for a, b, j in itertools.islice(pairs.collect(), 5):
        assert a < b and 0.9 <= j <= 1.0

"""Large-scale deduplication operators over a documents table.

Not present in the reference (its only dedup is the keyed flow dict,
SURVEY.md §2.2 P6) — these are the training-data-pipeline extensions:
exact, MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine
near-dup. All are pure DataFrame ops (shuffle-conscious: shingle
explosion -> band bucketing -> candidate-pair join, never an O(n^2)
cross join), portable hashing via md5 so results are engine-independent
and oracle-checkable.

Scale notes (100 TB corpus):
- exact dedup is one hash-groupBy (single shuffle on a 32-hex key).
- MinHash bands shuffle shingles once, then join candidate buckets —
  band cardinality bounds the join fan-out; hot bands (boilerplate
  docs) are capped via a per-band count filter.
- embedding near-dup uses LSH-ish sign buckets to avoid the cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .buckets import drop_hot_buckets, ensure_min_scan_parallelism


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id doc per exact text hash.

    Keeper selection is ``groupBy(hash).agg(min(id))`` + left-semi join —
    NOT a row_number window. The window form serializes every duplicate
    group into one task, and the single worst-case dedup input (a
    boilerplate text duplicated 10^9 times) is exactly where that
    degenerates. min() is algebraic (map-side combinable), so the hot
    hash costs one value per input partition; the semi join hashes on
    (hash, id), which spreads the hot hash across its distinct ids.
    """
    # null texts hash to a sentinel (not dropped: a null join key never
    # matches itself, so a plain md5 would silently discard null-text docs)
    d = docs.withColumn("_h", F.coalesce(F.md5(F.col(text_col)), F.lit("<null>")))
    keepers = d.groupBy("_h").agg(F.min(id_col).alias(id_col))
    # dropDuplicates: a double-ingested row (same id, same text) ties with
    # itself at min(id) and would otherwise survive the semi-join twice.
    # Keyed on (_h, id) it is map-side combinable — no hot-hash task.
    return (
        d.join(keepers, ["_h", id_col], "left_semi")
        .dropDuplicates(["_h", id_col])
        .drop("_h")
    )


def exact_dup_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Duplicate-group report: md5 -> n_docs, keeper id (min)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min(id_col).alias("keeper_id"),
        )
        .filter(F.col("n_docs") > 1)
    )


def _tokens(text_col: str):
    """Lower-cased whitespace tokens, empties removed."""
    return F.array_remove(F.split(F.lower(F.col(text_col)), r"[ \t\n\x0B\f\r]+"), "")


def shingles(
    docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    distinct: bool = True,
) -> DataFrame:
    """Word n-gram shingles per doc: (id, shingle), distinct by default.

    ``distinct=False`` skips the dedup exchange for consumers whose
    aggregate is already duplicate-invariant (min/max — the MinHash
    case: min over a multiset equals min over its set), saving a full
    shuffle of the shingle stream (guide §2.4). Scan-parallelism guard
    (operators/buckets.py): the tokenize + explode map stage is the
    expensive part and scan parallelism equals the file layout; the
    n>1 window then reuses the guard's HashPartitioning(id) — no
    second exchange."""
    docs = ensure_min_scan_parallelism(docs, id_col)
    d = docs.select(id_col, F.posexplode(_tokens(text_col)).alias("pos", "tok"))
    w = Window.partitionBy(id_col).orderBy("pos")
    cols = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    out = (
        d.select(id_col, F.concat_ws(" ", *cols).alias("shingle"), *[c.alias(f"_l{i}") for i, c in enumerate(cols[1:])])
        .filter(F.col(f"_l{n - 2}").isNotNull() if n > 1 else F.lit(True))
        .select(id_col, "shingle")
    )
    return out.distinct() if distinct else out


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_cap: int | None = None,
) -> DataFrame:
    """All doc pairs (a<b) with n-gram Jaccard >= threshold.

    Inverted-index join on shingle (one shuffle), then
    |intersection| / (|A|+|B|-|intersection|). Hot shingles (stopword
    n-grams shared by everything) are the skew killer at corpus scale: a
    shingle in k docs fans out k^2 join rows. ``df_cap`` drops shingles
    whose document frequency exceeds the cap *before* the self-join —
    stopword-style removal applied consistently to both the intersection
    and the per-doc sizes, so the Jaccard stays a true set ratio over
    the retained shingle universe. The hot set is tiny by construction
    (few shingles can exceed the cap), so the removal is a broadcast
    anti join — no extra shuffle of the inverted index.
    """
    sh = shingles(docs, n=n, text_col=text_col, id_col=id_col)
    if df_cap is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > df_cap)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("sz"))

    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature per doc: for seed i, min(md5(shingle || ':' || i)).

    Using the hex-string min of a salted md5 keeps the signature portable
    across engines (same values in any ANSI SQL) while preserving the
    MinHash property (md5 ~ random permutation of the shingle universe).
    Output: (id, sig_0..sig_{k-1}).

    r8: the shingle stream is NOT deduplicated first — min() over a
    multiset equals min() over its set, so the explicit distinct was a
    pure extra shuffle of every (id, shingle) string; the signature now
    costs one map-combinable aggregate on one exchange (plus the scan
    guard inside ``shingles``, a no-op at real scale).
    """
    sh = shingles(
        docs, n=shingle_n, text_col=text_col, id_col=id_col, distinct=False
    )
    aggs = [
        F.min(F.md5(F.concat(F.col("shingle"), F.lit(f":{i}")))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy(id_col).agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signature split into ``bands`` bands of ``num_hashes/bands`` rows;
    docs sharing any full band land in the same bucket; bucket self-join
    yields candidates (a<b, distinct across bands). ``max_bucket`` guards
    against degenerate buckets (empty/boilerplate docs) — dropped buckets
    are a recall tradeoff, logged at the caller.
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, shingle_n, text_col, id_col)
    # r8: one posexplode + a keyed repartition barrier instead of a
    # bands-way union — same fix as simhash_near_pairs: the signature
    # DAG evaluates ONCE, and the hot-bucket groupBy plus both
    # self-join sides reuse the one (band, bucket) exchange.
    band_arr = F.array(
        *[
            F.struct(
                F.lit(bidx).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"sig_{bidx * rows + r}") for r in range(rows)],
                    )
                ).alias("bucket"),
            )
            for bidx in range(bands)
        ]
    )
    banded = (
        sig.select(F.col(id_col).alias("_id"), F.explode(band_arr).alias("_b"))
        .select("_id", F.col("_b.band").alias("band"), F.col("_b.bucket").alias("bucket"))
        .repartition("band", "bucket")
    )

    banded = drop_hot_buckets(banded, ["band", "bucket"], max_bucket)
    a = banded.select("band", "bucket", F.col("_id").alias("a"))
    b = banded.select("band", "bucket", F.col("_id").alias("b"))
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "a",
    id_b: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a near-dup pair graph -> (doc_id,
    cluster_id) with cluster_id = min doc id in the component — the
    cluster-resolution step every dedup pipeline runs after pair
    generation (keep one doc per cluster).

    Iterative min-label propagation: each round joins labels across
    edges and takes the min (one shuffle per round); converges in
    O(graph diameter) rounds, early-stops on a fixpoint check. Near-dup
    graphs are unions of small cliques/chains (diameter is tiny), so
    rounds ~ 3-5 in practice; ``max_iter`` bounds adversarial chains.
    Each round's labels are localCheckpoint()ed: the plan stays O(1)
    deep instead of growing by a join per round (lineage blowup is the
    classic iterative-Spark failure). For web-scale graphs with giant
    components swap in large-star/small-star; the interface is the same.
    """
    edges = pairs.select(F.col(id_a).alias("x"), F.col(id_b).alias("y"))
    edges = (
        edges.unionByName(edges.select(F.col("y").alias("x"), F.col("x").alias("y")))
        .distinct()
        # evaluate the (possibly expensive) pair-generation DAG ONCE:
        # every iteration joins against edges, and without this the
        # upstream near-dup join would replay per round
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.y == labels.id)
            .groupBy("x")
            .agg(F.min("cluster_id").alias("_nbr"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.x, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("_nbr"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # non-converged labels are still one-row-per-doc but cluster_id
        # may not be the component min (an adversarial chain longer than
        # max_iter): downstream keeper logic would keep extra docs.
        # Surface it instead of silently under-deduping.
        import warnings

        warnings.warn(
            f"dup_clusters: no fixpoint after max_iter={max_iter} rounds; "
            "labels may split components — raise max_iter or use "
            "dup_clusters_bigstar",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def dup_clusters_bigstar(
    pairs: DataFrame,
    id_a: str = "a",
    id_b: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) -> (doc_id, cluster_id = component min). Same contract as
    ``dup_clusters``; this is the swap-in for GIANT components.

    Why it scales where min-label propagation doesn't: each round is a
    groupBy on node id emitting edges to the group min, so per-round work
    is O(edges) with degree-bounded groups and the diameter collapses
    doubly-exponentially (O(log^2 n) rounds worst case, ~4-6 in
    practice). The iterative min-label loop in ``dup_clusters`` instead
    routes every member of a component through label joins for
    O(diameter) rounds — fine for near-dup cliques, degenerate for a
    web-scale chain/giant component.

    large-star: for every node u, connect each neighbor v > u to
    m = min(N(u) ∪ {u}).  small-star: with edges oriented high->low,
    connect each neighbor (and u itself) to m = min(N_<=(u) ∪ {u}).
    Fixpoint = edge multiset stable (count + order-free hash checksum);
    the converged edge set is a star per component pointing at its min.
    Each round localCheckpoints to keep the plan O(1) deep.
    """
    x, y = F.col("x"), F.col("y")
    edges = (
        pairs.select(F.col(id_a).alias("x"), F.col(id_b).alias("y"))
        .filter(x != y)
        .select(F.least(x, y).alias("x"), F.greatest(x, y).alias("y"))
        .distinct()
        # canonical orientation high -> low (small-star input shape)
        .select(F.col("y").alias("x"), F.col("x").alias("y"))
        .localCheckpoint()
    )

    def _signature(e: DataFrame) -> tuple[int, int]:
        row = e.agg(
            F.count("*").alias("n"),
            # bit_xor: order-free and overflow-free under ANSI mode
            F.coalesce(F.expr("bit_xor(xxhash64(x, y))"), F.lit(0)).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    sig = _signature(edges)
    converged = False
    for _ in range(max_iter):
        # ---- large-star: undirected neighborhoods, attach v>u to
        # m = min(N(u) ∪ {u}). Per-node min via groupBy (map-side
        # combinable) + equi-join back — NOT a window over the node:
        # a giant star's hub would buffer its whole neighborhood in one
        # window task, while a skewed equi-join is AQE-splittable.
        und = edges.unionByName(
            edges.select(F.col("y").alias("x"), F.col("x").alias("y"))
        )
        mins = und.groupBy("x").agg(F.min("y").alias("_mn"))
        large = (
            und.join(mins, "x")
            .filter(y > x)
            .select(
                F.col("y").alias("x"),
                F.least(F.col("_mn"), F.col("x")).alias("y"),
            )
            .filter(F.col("x") != F.col("y"))
            .distinct()
        )
        # ---- small-star: edges are high->low after large-star; connect
        # every low neighbor and u itself to m = min(N_<(u) ∪ {u}) = min(N_<)
        mins2 = large.groupBy("x").agg(F.min("y").alias("_mn"))
        nbr = (
            large.join(mins2, "x")
            .select(F.col("y").alias("x"), F.col("_mn").alias("y"))
        )
        self_ = mins2.select("x", F.col("_mn").alias("y"))
        small = (
            nbr.unionByName(self_)
            .filter(F.col("x") != F.col("y"))
            .distinct()
            .localCheckpoint()
        )
        edges = small
        new_sig = _signature(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # a non-converged edge set is NOT a star per component: nodes can
        # carry several conflicting cluster_ids and downstream
        # semantic_dedup would consume them without error (r3 ADVICE).
        # O(log^2 n) convergence means exhaustion signals a real problem
        # — fail loudly instead of emitting duplicate doc_id rows.
        raise RuntimeError(
            f"dup_clusters_bigstar: edge multiset not stable after "
            f"max_iter={max_iter} rounds — raise max_iter (convergence "
            "is O(log^2 n) rounds, so exhaustion at 50 indicates "
            "pathological input or a bug, not a big graph)"
        )

    # converged stars point high -> low at the component min; every
    # non-root node appears exactly once as x
    labels = edges.select(F.col("x").alias("doc_id"), F.col("y").alias("cluster_id"))
    roots = (
        edges.select(F.col("y").alias("doc_id"))
        .distinct()
        .join(labels.select("doc_id"), "doc_id", "left_anti")
        .withColumn("cluster_id", F.col("doc_id"))
    )
    return labels.unionByName(roots)


_SIMHASH_BITS = 64


def simhash_64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc — pure DataFrame ops, zero Python in the path.

    Per token occurrence: 64-bit hash = first 16 hex chars of md5
    (portable across engines); each bit votes +1/-1 weighted by token
    frequency; sign of the vote vector is the fingerprint (signed-long
    two's complement). Near-dups differ in few bits
    (``F.bit_count(a ^ b)``).

    Shape: explode tokens -> 16 hex-digit columns -> 64 conditional
    bit-vote sums in ONE hash aggregate (map-side combinable) -> left
    join back so token-less docs keep signature 0. The bit-b vote total
    is ``2*sum(bit_b) - n``, so only 0/1 sums and one count shuffle.

    Parallelize guard: the map side (one md5 + 16 digit decodes + 64 bit
    votes per token) is the expensive stage, and scan parallelism is
    fixed by the input's file layout — a small single-file corpus would
    run it in ONE task. When the scan has fewer partitions than the
    cluster has slots, pay one cheap shuffle of the raw docs to spread
    the compute; a 100 TB input (thousands of scan partitions) is left
    untouched (operators/buckets.py:ensure_min_scan_parallelism; measured
    ~3.0 -> ~2.2 s median on the single-file sf0.1 table at 32 cores in a
    same-window A/B — the shuffle itself eats part of the win at this
    tiny scale). An element_at lookup-table variant of the bit votes was
    also tried and measured consistently SLOWER — literal arrays are
    rebuilt per row in codegen — hence the plain shift/and form.
    """
    docs = ensure_min_scan_parallelism(docs, id_col)
    toks = docs.select(id_col, F.explode(_tokens(text_col)).alias("tok"))
    # materialize the hash prefix as a named column so md5 is evaluated
    # once per token (not once per digit expression)
    hashed = toks.select(id_col, F.substring(F.md5(F.col("tok")), 1, 16).alias("_h"))
    # hex digit j (0 = leftmost of the 16-char prefix) carries bits 63-4j-3..63-4j
    digits = hashed.select(
        id_col,
        *[
            (
                F.instr(F.lit("0123456789abcdef"), F.substring(F.col("_h"), j + 1, 1))
                - F.lit(1)
            ).alias(f"_d{j}")
            for j in range(16)
        ],
    )

    def bit(b: int):
        j = 15 - b // 4
        k = b % 4
        return F.shiftright(F.col(f"_d{j}"), k).bitwiseAND(F.lit(1))

    agg = digits.groupBy(id_col).agg(
        F.count("*").alias("_n"),
        *[F.sum(bit(b)).alias(f"_s{b}") for b in range(_SIMHASH_BITS)],
    )
    # signed-long assembly: bit 63 contributes -2^63 (two's complement)
    contrib = [
        F.when(
            F.col(f"_s{b}") * 2 > F.col("_n"),
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
        for b in range(_SIMHASH_BITS)
    ]
    sig_expr = contrib[0]
    for c in contrib[1:]:
        sig_expr = sig_expr + c
    sigs = agg.select(id_col, sig_expr.alias("simhash"))
    return (
        docs.select(id_col)
        .join(sigs, id_col, "left")
        .select(id_col, F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 100_000,
) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming, found by
    block-permutation LSH: split the 64-bit hash into 4 16-bit blocks;
    any pair within distance 3 shares at least one exact block
    (pigeonhole). Join per block, verify with bit_count.

    ``max_bucket`` drops 16-bit block buckets with more rows than the cap
    (groupBy-count -> broadcast anti-join, never a window over the hot
    bucket): a corpus of near-identical or empty docs collapses to few
    signatures, and one hot block bucket otherwise fans out quadratically.
    Dropping a bucket is a recall tradeoff — the pigeonhole completeness
    guarantee (every pair within ``max_hamming`` found) holds only for
    pairs whose shared block survived the cap; boilerplate-heavy corpora
    should exact-dedup first or raise the cap.
    """
    sh = simhash_64(docs, text_col=text_col, id_col=id_col)
    # r8: ONE posexplode instead of a 4-way union of selects over `sh`,
    # and a keyed repartition barrier on the join key. The old shape
    # re-evaluated the signature DAG once per downstream reference
    # (4 union branches x [hot-count, anti-probe, self-join a, b] = up
    # to 16 post-exchange re-executions; only the exchanges were
    # reused), then shuffled the block stream three more times (hot
    # count + both self-join sides). The barrier IS the join's own
    # hash partitioning, so the hot-bucket groupBy and both self-join
    # sides all read the ONE reused exchange with no further shuffle
    # (measured: near-pairs phase 3.6 s -> ~1.5 s at sf1.0, 32 cores).
    band = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_idx"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("block"),
            )
            for i in range(4)
        ]
    )
    blocks = (
        sh.select(
            F.col(id_col).alias("_id"), F.col("simhash"), F.explode(band).alias("_b")
        )
        .select("_id", "simhash", F.col("_b.block_idx").alias("block_idx"), F.col("_b.block").alias("block"))
        .repartition("block_idx", "block")
    )
    blocks = drop_hot_buckets(blocks, ["block_idx", "block"], max_bucket)
    a = blocks.select("block_idx", "block", F.col("_id").alias("a"), F.col("simhash").alias("ha"))
    b = blocks.select("block_idx", "block", F.col("_id").alias("b"), F.col("simhash").alias("hb"))
    return (
        a.join(b, ["block_idx", "block"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def semantic_dedup(
    docs: DataFrame,
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """End-to-end semantic dedup: embedding-cosine near-dup pairs
    (bucketed hyperplane LSH, similarity.embedding_near_dup_pairs) ->
    connected components (large-star/small-star) -> keep the lowest-id
    doc per cluster. ``embeddings`` rows are keyed by ``vec_id_col``
    matching ``docs``'s ``id_col``.

    Every stage is the bounded-join form: LSH bucket equi-joins (never
    all-pairs), degree-bounded component rounds, and a final broadcast-
    friendly anti-join of the loser set (losers = components' non-min
    members; for realistic near-dup rates this is a small fraction of
    the corpus — and never larger than it).
    """
    from .similarity import embedding_near_dup_pairs

    pairs = embedding_near_dup_pairs(
        embeddings, threshold=threshold, id_col=vec_id_col, vec_col=vec_col,
        **lsh_kwargs,
    )
    clusters = dup_clusters_bigstar(pairs, id_a="a", id_b="b")
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n\n+",
    join_sep: str = "\n\n",
) -> DataFrame:
    """Sub-document (paragraph-level) exact dedup — the RefinedWeb /
    MassiveText line-level pass: split each document on ``sep``, keep
    the corpus-wide FIRST occurrence of every distinct paragraph
    (lowest (doc id, paragraph position)), and rebuild each document
    from its surviving paragraphs in original order. Catches the
    boilerplate that whole-document dedup misses (headers, navbars,
    license blocks repeated across millions of otherwise-distinct
    pages).

    Returns one row per input document: ``n_paras``, ``n_kept``, and
    ``dedup_text`` (empty string when every paragraph was a repeat).

    100 TB shape: the paragraph explode and md5 are map-side codegen
    (two passes total — keeper build + probe side, the same two-sided
    shape as ``exact_dedup``); keeper selection is ``groupBy(hash).agg(min(struct(id,
    pos)))`` — algebraic, map-combinable, so a boilerplate paragraph
    repeated 10^9 times costs one row per input partition, NOT a single
    hot window task (same argument as ``exact_dedup`` above). Keepers
    come back as a LEFT-join flag on (hash, id, pos) — not a semi-join,
    so dropped paragraphs still reach the per-doc regroup and
    ``n_paras``/``n_kept``/rebuild all come out of ONE groupBy(doc id)
    (a semi-join form costs a second full explode + doc exchange just
    for ``n_paras``). The join hashes on (hash, id, pos), spreading any
    hot hash across its occurrences; document rebuild state is a
    ``collect_list`` bounded by the document's own paragraph count —
    per-document, never corpus-sized."""
    # r8: the split + posexplode + per-paragraph md5 map stage is the
    # expensive part; parallelize it when the scan's file layout is
    # narrower than the cluster (no-op at real scale)
    docs = ensure_min_scan_parallelism(docs, id_col)
    t = F.col(text_col)
    p = docs.select(
        F.col(id_col),
        F.posexplode(F.split(t, sep)).alias("para_idx", "para"),
    ).filter(F.col("para") != "").withColumn("_h", F.md5(F.col("para")))
    keepers = (
        p.groupBy("_h")
        .agg(F.min(F.struct(F.col(id_col), F.col("para_idx"))).alias("_first"))
        .select(
            F.col("_h").alias("_kh"),
            F.col(f"_first.{id_col}").alias("_kid"),
            F.col("_first.para_idx").alias("_kidx"),
            F.lit(True).alias("_keep"),
        )
    )
    flagged = p.join(
        keepers,
        (F.col("_h") == F.col("_kh"))
        & (F.col(id_col) == F.col("_kid"))
        & (F.col("para_idx") == F.col("_kidx")),
        "left",
    ).select(
        id_col, "para_idx", "para", F.coalesce("_keep", F.lit(False)).alias("_keep")
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        # array_sort on struct orders by para_idx (first field); the
        # filter/transform lambdas are interpreted per element but
        # bounded by the document's own paragraph count
        F.concat_ws(
            join_sep,
            F.expr(
                "transform(filter(array_sort(collect_list("
                "struct(para_idx, _keep, para))), x -> x._keep), x -> x.para)"
            ),
        ).alias("dedup_text"),
    )

"""Similarity search over an embedding column (array<float>).

Training-data-pipeline extension (no reference analog). Two paths:

- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  The dot product stays JVM-side via ``F.zip_with`` + ``F.aggregate``
  (no Python in the hot loop); queries are broadcast so the scan side
  never shuffles. Cost O(|queries| * |corpus|): right for small query
  sets over huge corpora.
- random-hyperplane LSH (``lsh_buckets`` / ``cosine_topk_lsh`` /
  ``embedding_near_dup_pairs``): seeded hyperplanes (md5-derived, so
  any SQL engine reproduces them bit-for-bit), ``n_bits`` per table for
  precision, ``n_tables`` OR-ed tables for recall, a per-bucket row cap
  against degenerate buckets. Candidates come only from bucket
  equi-joins — never an O(n^2) cross join — then exact cosine re-rank.
  This is the shape that survives both sides being huge: at 10^10
  vectors with 16-bit tables the expected bucket holds ~n/65536 rows
  and the join fan-out is sum-of-squares over buckets, controlled by
  ``max_bucket``.

Numeric discipline: every dot product casts elements to double BEFORE
multiplying and accumulates left-to-right from 0.0 — the exact
operation order an ANSI-SQL oracle (``0.0 + e[1]*w1 + ...``) performs,
so engine and oracle produce bit-identical doubles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .buckets import drop_hot_buckets, ensure_min_scan_parallelism


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ca, cb = F.col(a), F.col(b)
    return df.withColumn(
        out, _dot(ca, cb) / F.greatest(_norm(ca) * _norm(cb), F.lit(1e-12))
    )


def _partition_topk(
    slim: DataFrame, k: int, query_id_col: str, id_col: str
) -> DataFrame:
    """Per-scan-partition top-k by (cosine desc, id asc) — a narrow
    mapInPandas pass (NO shuffle) that reduces each partition's
    |partition| * |queries| scored rows to <= k * |queries| survivors.
    Scores were computed JVM-side; Arrow roundtrips float64 exactly, so
    no double changes a bit on the way through. The running best-set is
    pruned per Arrow batch, bounding memory at k * |queries| rows."""
    import pandas as pd

    schema = slim.schema

    def gen(batches):
        best: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            best = pdf if best is None else pd.concat([best, pdf], ignore_index=True)
            best = (
                best.sort_values(
                    [query_id_col, "cosine", id_col],
                    ascending=[True, False, True],
                    kind="mergesort",
                )
                .groupby(query_id_col, sort=False)
                .head(k)
                .reset_index(drop=True)
            )
        if best is not None and len(best):
            yield best

    return slim.mapInPandas(gen, schema=schema)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bounded: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: (query_id, embedding). Broadcast-joined against the
    corpus (map-side only — the corpus never shuffles for scoring).

    ``bounded=True`` (default — the 100 TB shape, r3 verdict #2): a
    two-level top-k. Level 1 keeps the per-scan-partition top-k without
    any shuffle (``_partition_topk``); level 2 re-ranks the surviving
    <= k * n_partitions rows per query with the row_number window. The
    window partition is now bounded by k * P, never |corpus| — the r3
    plan put every query's full scored corpus into ONE window task.
    ``bounded=False`` keeps the single-window form (the differential
    twin for tests; identical output because (cosine desc, id asc) is a
    total order, so the global top-k is a subset of every partition
    top-k union)."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    joined = embeddings.select(id_col, vec_col).crossJoin(F.broadcast(q))
    scored = joined.filter(F.col(id_col) != F.col(query_id_col)).withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / F.greatest(_norm(F.col(vec_col)) * _norm(F.col("_qvec")), F.lit(1e-12)),
    )
    # NaN cosines (a NaN component in either vector) would rank FIRST in
    # the Spark desc window but LAST in the pandas level-1 sort — drop
    # them before EITHER path so bounded == unbounded by construction
    # (a NaN similarity is meaningless as a top-k result anyway)
    slim = scored.select(query_id_col, id_col, "cosine").filter(
        ~F.isnan(F.col("cosine"))
    )
    if bounded:
        slim = _partition_topk(slim, k, query_id_col, id_col)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col)
    )
    return (
        slim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# --------------------------------------------------------------- LSH family


def hyperplane_weights(
    n_tables: int, n_bits: int, dim: int, seed: str = "hp"
) -> list[list[list[float]]]:
    """Seeded random hyperplanes: w[t][p][d] = md5-uint32/2^31 - 1 in
    [-1, 1). md5-derived so the weights are exact dyadic rationals any
    engine regenerates identically; seeded so tables are independent."""
    W = []
    for t in range(n_tables):
        planes = []
        for p in range(n_bits):
            row = []
            for d in range(dim):
                hx = hashlib.md5(f"{seed}:{t}:{p}:{d}".encode()).hexdigest()[:8]
                row.append(int(hx, 16) / 2**31 - 1.0)
            planes.append(row)
        W.append(planes)
    return W


def _bucket_expr(vec_col: str, planes: list[list[float]]) -> Column:
    """Sign-bit string of the vector against each hyperplane."""
    bits = []
    for row in planes:
        w = F.array(*[F.lit(x) for x in row])
        dot = _dot(F.col(vec_col), w)
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int = 16,
    dim: int = 64,
    seed: str = "hp",
) -> DataFrame:
    """(id, vec, tbl, bucket) — one row per (vector, table). The explode
    of an n_tables-element struct array is map-side only; no shuffle.

    Parallelize guard: see operators/buckets.py:ensure_min_scan_parallelism
    (the n_tables*n_bits dot products per row are the expensive stage)."""
    df = ensure_min_scan_parallelism(df, id_col)
    W = hyperplane_weights(n_tables, n_bits, dim, seed)
    per_table = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"), _bucket_expr(vec_col, W[t]).alias("bucket")
            )
            for t in range(n_tables)
        ]
    )
    return df.select(id_col, vec_col, F.explode(per_table).alias("_tb")).select(
        id_col,
        vec_col,
        F.col("_tb.tbl").alias("tbl"),
        F.col("_tb.bucket").alias("bucket"),
    )


def lsh_buckets_highdim(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int = 16,
    dim: int = 64,
    seed: str = "hp",
) -> DataFrame:
    """Arrow-batched twin of ``lsh_buckets`` for HIGH-dimensional
    embeddings. The expression form embeds n_tables*n_bits*dim plan
    literals — fine at dim 64, but at dim >= 512 that's a megabyte of
    plan and a codegen blowup. Here the md5-derived weight tensor is
    built once driver-side (n_tables*n_bits*dim*8 bytes, e.g. 2 MB at
    dim 4096) and shipped in the task closure; each Arrow batch computes
    all sign bits with vectorized numpy.

    Bucket values are BIT-IDENTICAL to ``lsh_buckets``: the dot products
    accumulate left-assoc from 0.0 over cast-to-double terms — the exact
    evaluation order of the ``F.aggregate`` expression — so a vector
    lands in the same bucket whichever path computed it (tested).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # same guard as the expression path: the n_tables*n_bits*dim sign-bit
    # batch is the compute-heavy stage, and scan parallelism == file
    # layout (a single-file corpus would run it in ONE Arrow task)
    df = ensure_min_scan_parallelism(df, id_col)
    W = np.array(hyperplane_weights(n_tables, n_bits, dim, seed), dtype=np.float64)
    Wf = np.ascontiguousarray(W.reshape(n_tables * n_bits, dim).T)  # (D, T*P)

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[id_col],
            in_fields[vec_col],
            T.StructField("tbl", T.IntegerType(), False),
            T.StructField("bucket", T.StringType(), False),
        ]
    )
    tp = n_tables * n_bits

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            E = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (N, D)
            # left-assoc accumulation: acc = 0.0 + x0*w0 + x1*w1 + ...
            # (same rounding as the F.aggregate expression; a GEMM's
            # pairwise summation could flip near-zero sign bits)
            acc = np.zeros((n, tp))
            for d in range(dim):
                acc += E[:, d : d + 1] * Wf[d]
            codes = np.where(acc >= 0, ord("1"), ord("0")).astype(np.uint8)
            buckets = (
                np.ascontiguousarray(codes.reshape(n * n_tables, n_bits))
                .view(f"S{n_bits}")
                .ravel()
                .astype(str)
            )
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                    vec_col: np.repeat(pdf[vec_col].to_numpy(), n_tables),
                    "tbl": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets,
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema=out_schema)


def _cap_buckets(b: DataFrame, max_bucket: int) -> DataFrame:
    """Drop degenerate buckets (> max_bucket rows) — bounded recall
    tradeoff, same guard as dedup.minhash_lsh_pairs. groupBy-count ->
    broadcast anti-join so the hot bucket is never buffered by one task
    (see operators/buckets.py)."""
    return drop_hot_buckets(b, ["tbl", "bucket"], max_bucket)


def cosine_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_tables: int = 4,
    n_bits: int = 16,
    dim: int = 64,
    seed: str = "hp",
    max_bucket: int = 100_000,
) -> DataFrame:
    """Approximate top-k: candidates share a bucket with the query in at
    least one table (OR-construction), then exact cosine re-rank. One
    equi-join on (tbl, bucket) instead of a cross join."""
    e = _cap_buckets(
        lsh_buckets(embeddings, id_col, vec_col, n_tables, n_bits, dim, seed),
        max_bucket,
    )
    q = lsh_buckets(
        queries.select(F.col(query_id_col), F.col(vec_col)),
        query_id_col, vec_col, n_tables, n_bits, dim, seed,
    ).withColumnRenamed(vec_col, "_qvec")
    cand = (
        e.join(F.broadcast(q), ["tbl", "bucket"])
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, vec_col, "_qvec")
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / F.greatest(_norm(F.col(vec_col)) * _norm(F.col("_qvec")), F.lit(1e-12)),
    )
    # OR-construction can surface the same (query, vec) pair from
    # several tables: dedupe AFTER scoring and projecting to the slim
    # (query, id, cosine) shape — duplicate pairs score identically
    # map-side, so the distinct's exchange carries ~24-byte rows instead
    # of both embedding vectors (r4 plan audit). Then the two-level
    # top-k (same shape as cosine_topk): a hot query whose buckets hold
    # n_tables * max_bucket rows never routes them all to one window
    # task — level 1 reduces per partition, the rank window sees
    # <= k * P rows per query.
    slim = _partition_topk(
        scored.select(query_id_col, id_col, "cosine")
        .filter(~F.isnan(F.col("cosine")))  # same NaN contract as cosine_topk
        .distinct(),
        k,
        query_id_col,
        id_col,
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        slim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


# ---------------------------------------------------------------- IVF family


def ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic one-shot IVF centroids: the ``n_centroids`` corpus
    vectors with the smallest md5(id) — a reproducible pseudo-random
    subset (no iterative k-means: driver-coordinated iterations don't
    pay for themselves as a coarse quantizer, and determinism buys
    engine-portable oracle checks). Output: (cent_id, cvec)."""
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k + driver merge, NOT a single-partition global
    # sort (which an unpartitioned row_number window would force)
    return (
        embeddings.select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cvec"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h")
        .limit(n_centroids)
        .drop("_h")
    )


def _left_assoc_norm(vec) -> float:
    """Python twin of ``_norm``: left-assoc sum of squares from 0.0 over
    cast-to-double terms, then IEEE sqrt — Python floats ARE doubles, so
    this is bit-identical to the expression path (and any ANSI-SQL
    ``SQRT(0.0 + x1*x1 + ...)``)."""
    import math

    acc = 0.0
    for v in vec:
        x = float(v)
        acc = acc + x * x
    return math.sqrt(acc)


def _ivf_assign_expr(
    df: DataFrame, cent_rows, id_col: str, vec_col: str
) -> DataFrame:
    """nprobe=1 assignment as ONE row-local expression: the centroid set
    folds into a single array<struct> literal (ConstantFolding — every
    element is foldable, so codegen references one constant object, no
    per-row rebuild), ``transform`` scores the vector against each
    centroid, and ``aggregate`` keeps the running (max cos, min cent_id)
    — the exact ordering of a ``row_number() OVER (ORDER BY cos DESC,
    cent_id)`` window, with ZERO exchange: the corpus never shuffles and
    is never duplicated n_centroids x (the r3 scale-killer). Centroid
    norms are precomputed driver-side with the same left-assoc float64
    arithmetic, halving per-row work without changing a bit."""
    cast_t = "string" if isinstance(cent_rows[0]["cent_id"], str) else "long"
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(r["cent_id"]).cast(cast_t).alias("cent_id"),
                F.array(*[F.lit(float(x)) for x in r["cvec"]]).alias("cvec"),
                F.lit(_left_assoc_norm(r["cvec"])).alias("cnorm"),
            )
            for r in cent_rows
        ]
    )
    vnorm = _norm(F.col(vec_col))
    scored = F.transform(
        cent_arr,
        lambda c: F.struct(
            (
                _dot(F.col(vec_col), c["cvec"])
                / F.greatest(vnorm * c["cnorm"], F.lit(1e-12))
            ).alias("cos"),
            c["cent_id"].alias("cent_id"),
        ),
    )
    zero = F.struct(
        F.lit(float("-inf")).alias("cos"),
        F.lit(None).cast(cast_t).alias("cent_id"),
    )
    best = F.aggregate(
        scored,
        zero,
        lambda acc, s: F.when(
            (s["cos"] > acc["cos"])
            | ((s["cos"] == acc["cos"]) & (s["cent_id"] < acc["cent_id"])),
            s,
        ).otherwise(acc),
    )
    return df.select(id_col, vec_col).withColumn("cent_id", best["cent_id"])


def _ivf_assign_arrow(
    df: DataFrame, cent_rows, id_col: str, vec_col: str
) -> DataFrame:
    """Arrow-batched twin of ``_ivf_assign_expr`` for HIGH-dim or
    many-centroid cases where the plan literal would blow up (same
    tradeoff as ``lsh_buckets_highdim``). The weight tensor ships in the
    task closure; scoring accumulates left-assoc per dimension so the
    cosine doubles are bit-identical to the expression path (tested).
    Still zero shuffle: one mapInPandas over the scan."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # sort by cent_id so np.argmax's first-max tie-break == min cent_id
    rows = sorted(cent_rows, key=lambda r: r["cent_id"])
    cent_ids = [r["cent_id"] for r in rows]
    C = np.array([[float(x) for x in r["cvec"]] for r in rows], dtype=np.float64)
    CT = np.ascontiguousarray(C.T)  # (D, C)
    cnorm = np.array([_left_assoc_norm(r["cvec"]) for r in rows])
    dim = CT.shape[0]

    in_fields = {f.name: f for f in df.schema.fields}
    out_schema = T.StructType(
        [
            in_fields[id_col],
            in_fields[vec_col],
            T.StructField(
                "cent_id",
                T.StringType() if isinstance(cent_ids[0], str) else T.LongType(),
                False,
            ),
        ]
    )
    cent_id_arr = np.array(cent_ids)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            E = np.array(pdf[vec_col].tolist(), dtype=np.float64)  # (N, D)
            # left-assoc accumulation per dim — F.aggregate's rounding
            dots = np.zeros((n, CT.shape[1]))
            vsq = np.zeros(n)
            for d in range(dim):
                dots += E[:, d : d + 1] * CT[d]
                vsq = vsq + E[:, d] * E[:, d]
            vnorm = np.sqrt(vsq)
            cos = dots / np.maximum(vnorm[:, None] * cnorm[None, :], 1e-12)
            idx = np.argmax(cos, axis=1)  # first max == min cent_id on ties
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    vec_col: pdf[vec_col].to_numpy(),
                    "cent_id": cent_id_arr[idx],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(gen, schema=out_schema)


# expression-vs-Arrow crossover, measured (sf0.1, 2k vecs, 32 cores,
# same window): 8 cents expr 0.25s / arrow 0.23s; 32 cents 0.58/0.21;
# 64 cents 1.12/0.22; 256 cents 4.2/0.28 (old row_number window: 6.9).
# transform/aggregate higher-order functions evaluate INTERPRETED per
# array element (same lesson as the element_at bit-vote experiment), so
# the expr path only wins where Python-worker spin-up dominates — tiny
# centroid sets. Both paths are zero-exchange and bit-identical.
_IVF_EXPR_MAX_FLOATS = 1_024


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``nprobe`` highest-cosine centroids.

    nprobe=1 (the corpus side — the BIG side of IVF) is computed
    row-locally with ZERO exchange: the centroid set is collected (small
    by construction) and the argmax runs as a fold over a constant
    centroid array (``_ivf_assign_expr``; Arrow twin beyond the
    plan-literal budget). The r3 plan routed |corpus| * n_centroids rows
    — embedding vectors included — through a row_number window's hash
    exchange; at 256 centroids that was 256x the corpus bytes through
    one shuffle for an argmax that needs none.

    nprobe>1 (the query side — small by construction) keeps the
    broadcast cross-join + per-vector rank window.
    """
    if nprobe == 1:
        cent_rows = centroids.collect()
        if not cent_rows:
            raise ValueError("ivf_assign: empty centroid set")
        if len(cent_rows) * len(cent_rows[0]["cvec"]) <= _IVF_EXPR_MAX_FLOATS:
            return _ivf_assign_expr(df, cent_rows, id_col, vec_col)
        return _ivf_assign_arrow(df, cent_rows, id_col, vec_col)
    joined = df.select(id_col, vec_col).crossJoin(F.broadcast(centroids))
    scored = joined.withColumn(
        "_cos",
        _dot(F.col(vec_col), F.col("cvec"))
        / F.greatest(_norm(F.col(vec_col)) * _norm(F.col("cvec")), F.lit(1e-12)),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("_cos").desc(), F.col("cent_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(id_col, vec_col, "cent_id")
    )


# quantized-accumulation scale for k-means means: floor(x * 2^20).
# Exact in double for any float32 input; per-cluster sums become exact
# int64 arithmetic, so the refined centroids are identical rationals in
# ANY engine (no float-summation-order dependence) — the property that
# makes an ITERATIVE algorithm DuckDB-oracle-checkable.
_KMEANS_Q = 1 << 20


def ivf_centroids_kmeans(
    embeddings: DataFrame,
    n_centroids: int = 256,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd-refined IVF centroids — the quantizer quality upgrade over
    the one-shot ``ivf_centroids`` seed, kept deterministic AND
    engine-portable:

    - init: the md5-smallest ``n_centroids`` corpus vectors (exact
      ``ivf_centroids`` seed);
    - assign: the zero-exchange nprobe=1 argmax (``ivf_assign``) — the
      corpus never shuffles;
    - update: per-(cluster, dim) means over ``floor(x * 2^20)``
      quantized int64 values. Integer sums are EXACT in any engine, and
      ``sum / (n * 2^20)`` divides exact integers in IEEE double — the
      refined centroids are bit-identical wherever they're computed, so
      iteration 2's cosine comparisons (and every tie-break) agree with
      a SQL re-derivation. Plain float means would differ in the last
      ulp per summation order and could flip boundary assignments.

    Scale shape per iteration: one zero-exchange assignment pass + one
    posexplode feeding a map-side-combinable partial aggregate — the
    exchange carries ~n_centroids * dim rows per map task (a few KB),
    never corpus bytes. Centroids localCheckpoint between iterations so
    the assign's collect() doesn't replay prior rounds. Empty clusters
    are dropped (standard Lloyd's degeneracy; harmless for a coarse
    quantizer). Returns (cent_id, cvec) like ``ivf_centroids`` — cent_id
    stays the SEED centroid's id (the cluster's identity is its seed),
    so cluster identities are stable across engines and iterations."""
    cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col).localCheckpoint()
    q = F.lit(float(_KMEANS_Q))
    for _ in range(n_iter):
        asg = ivf_assign(embeddings, cents, nprobe=1, id_col=id_col, vec_col=vec_col)
        exploded = asg.select(
            "cent_id", F.posexplode(vec_col).alias("pos", "_x")
        ).select(
            "cent_id",
            "pos",
            F.floor(F.col("_x").cast("double") * q).cast("long").alias("_q"),
        )
        dims = exploded.groupBy("cent_id", "pos").agg(
            F.sum("_q").alias("_s"), F.count("*").alias("_n")
        )
        cents = (
            dims.select(
                "cent_id",
                "pos",
                (
                    F.col("_s").cast("double")
                    / (F.col("_n").cast("double") * q)
                ).alias("_m"),
            )
            .groupBy("cent_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "_m"))),
                    lambda s: s["_m"],
                ).alias("cvec")
            )
            .localCheckpoint()
        )
    return cents


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 256,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in one centroid cell;
    each query probes its ``nprobe`` nearest cells; exact cosine re-rank
    within the probed cells. The 100 TB shape: one broadcast assignment
    pass over the corpus, then an equi-join on cent_id whose fan-out is
    |corpus|/n_centroids per probe — no cross join anywhere.

    ``kmeans_iters``: Lloyd-refine the md5 seed before indexing
    (``ivf_centroids_kmeans``) — tighter cells = better recall per
    probe, at kmeans_iters extra zero-exchange passes over the corpus."""
    if kmeans_iters > 0:
        cents = ivf_centroids_kmeans(
            embeddings, n_centroids, kmeans_iters, id_col, vec_col
        )
    else:
        cents = ivf_centroids(embeddings, n_centroids, id_col, vec_col)
    e_asg = ivf_assign(embeddings, cents, nprobe=1, id_col=id_col, vec_col=vec_col)
    q_asg = ivf_assign(
        queries.select(F.col(query_id_col), F.col(vec_col)),
        cents, nprobe=nprobe, id_col=query_id_col, vec_col=vec_col,
    ).withColumnRenamed(vec_col, "_qvec")
    # no distinct needed: the corpus side is assigned nprobe=1 (each
    # vector lives in exactly ONE cell) and a query's probed cells are
    # distinct, so every (query, vec) pair joins at most once — the r3
    # plan paid a full exchange of candidate rows WITH both vectors just
    # to dedupe rows that were already unique (r4 plan audit)
    cand = (
        e_asg.join(F.broadcast(q_asg), "cent_id")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, vec_col, "_qvec")
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col(vec_col), F.col("_qvec"))
        / F.greatest(_norm(F.col(vec_col)) * _norm(F.col("_qvec")), F.lit(1e-12)),
    )
    # two-level top-k: a probed cell holds ~|corpus| / n_centroids rows
    # (8M per query at 10^9 x 256) — never route a whole cell's scored
    # rows to one window task; level 1 reduces per partition first
    slim = _partition_topk(
        scored.select(query_id_col, id_col, "cosine"), k, query_id_col, id_col
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        slim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cosine", "rank")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_tables: int = 4,
    n_bits: int = 16,
    dim: int = 64,
    seed: str = "hp",
    max_bucket: int = 100_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a<b) above threshold,
    candidates from multi-table hyperplane buckets (exact duplicates and
    very-high-cosine pairs share all sign bits with overwhelming
    probability; recall grows with n_tables). Per-bucket ``max_bucket``
    bounds the within-bucket self-join at corpus scale."""
    # r8: keyed repartition barrier on the join key BEFORE the cap and
    # self-join — the n_tables*n_bits*dim sign-bit computation (the
    # expensive interpreted-HOF stage) otherwise re-executes once per
    # downstream reference (hot-count, anti-probe, self-join a and b),
    # and the self-join would shuffle the bucket stream twice more. The
    # barrier IS the join's hash partitioning: one evaluation, one
    # exchange, reused by the cap's groupBy and both join sides.
    e = _cap_buckets(
        lsh_buckets(embeddings, id_col, vec_col, n_tables, n_bits, dim, seed)
        .repartition("tbl", "bucket"),
        max_bucket,
    )
    a = e.select("tbl", "bucket", F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = e.select("tbl", "bucket", F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    cand = (
        a.join(b, ["tbl", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "_va", "_vb")  # prune before the Arrow boundary (§4.1)
    )
    return _verify_pairs_cosine_arrow(cand, threshold).distinct()


def _verify_pairs_cosine_arrow(cand: DataFrame, threshold: float) -> DataFrame:
    """Exact-cosine verification of candidate pairs in vectorized numpy
    (r8): the expression form evaluates the dot/norm higher-order
    aggregates INTERPRETED per element — ~3 x dim interpreted ops per
    pair, the CLAUDE.md HOF pitfall — and dominated sim_near_dup's wall
    (low-bit buckets fan out ~10^6 candidates). Bit-identical to the
    expression form: the accumulations run left-assoc from 0.0 over the
    same cast-to-double products (the lsh_buckets_highdim discipline —
    a GEMM's pairwise summation could flip a filter-boundary cosine),
    `greatest` becomes np.maximum (same NaN propagation), and a NaN
    cosine passes the keep-filter exactly like Spark's NaN-is-greatest
    comparison semantics. Differentially tested against the expression
    form in tests/test_similarity.py."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    in_fields = {f.name: f for f in cand.schema.fields}
    out_schema = T.StructType(
        [
            in_fields["a"],
            in_fields["b"],
            T.StructField("cosine", T.DoubleType(), True),
        ]
    )
    thr = float(threshold)

    def gen(batches):
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            A = np.array(pdf["_va"].tolist(), dtype=np.float64)
            B = np.array(pdf["_vb"].tolist(), dtype=np.float64)
            dim_n = A.shape[1]
            dot = np.zeros(n)
            na = np.zeros(n)
            nb = np.zeros(n)
            for d in range(dim_n):
                dot += A[:, d] * B[:, d]
                na += A[:, d] * A[:, d]
                nb += B[:, d] * B[:, d]
            cos = dot / np.maximum(np.sqrt(na) * np.sqrt(nb), 1e-12)
            # Spark comparison semantics: NaN is greater than any double,
            # so `cosine >= threshold` keeps NaN rows — mirror that
            keep = (cos >= thr) | np.isnan(cos)
            yield pd.DataFrame(
                {
                    "a": pdf["a"].to_numpy()[keep],
                    "b": pdf["b"].to_numpy()[keep],
                    "cosine": cos[keep],
                }
            )

    return cand.mapInPandas(gen, schema=out_schema)

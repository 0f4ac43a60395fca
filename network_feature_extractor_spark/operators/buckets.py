"""Shared hot-bucket guard for the LSH family (dedup + similarity).

Every bucketed candidate-pair operator (MinHash bands, SimHash blocks,
hyperplane tables) has the same degenerate input: a corpus of
near-identical / empty documents collapses into one bucket, and the
within-bucket self-join goes quadratic. The guard drops buckets whose
population exceeds ``max_bucket`` BEFORE the self-join.

Shape matters at 100 TB: counting with
``F.count().over(Window.partitionBy(bucket))`` routes the entire hot
bucket through ONE task just to learn it should be discarded — the
exact skew the cap exists to prevent. Instead: ``groupBy(bucket).count()``
(map-side combinable, so the hot bucket costs one long per partition)
-> filter to the hot set (tiny by construction: at most n_rows/max_bucket
buckets can exceed the cap) -> broadcast anti-join. No task ever holds a
hot bucket's rows.

Dropped buckets are a bounded recall tradeoff; callers document it
(boilerplate-heavy corpora should pre-filter or raise the cap).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def drop_hot_buckets(
    df: DataFrame, bucket_cols: Sequence[str], max_bucket: int
) -> DataFrame:
    """Remove all rows of buckets with more than ``max_bucket`` rows."""
    cols = list(bucket_cols)
    hot = (
        df.groupBy(*cols)
        .agg(F.count("*").alias("_bc"))
        .filter(F.col("_bc") > max_bucket)
        .select(*cols)
    )
    return df.join(F.broadcast(hot), cols, "left_anti")


def ensure_min_scan_parallelism(df: DataFrame, key_col: str) -> DataFrame:
    """Parallelize guard for compute-heavy map stages over small inputs.

    Scan parallelism is fixed by the input's file layout; a single-file
    corpus runs hash-heavy per-row work (md5-per-token signatures,
    n_tables*n_bits dot products) in ONE task. When the scan has fewer
    partitions than the cluster has slots, pay one cheap shuffle of the
    raw rows to spread the compute; a large input (scan partitions >=
    slots — the 100 TB case) passes through untouched.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, key_col)
    return df

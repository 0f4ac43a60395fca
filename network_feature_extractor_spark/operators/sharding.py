"""Deterministic shuffle-to-shards layout — the global-shuffle step a
pretraining data pipeline runs after curation/packing so that training
reads draw an unbiased stream from every shard.

Reference analog: the rotation/sharding sink (SURVEY.md §2.1 S5,
``/root/reference/src/output/file_rotation.py:77-120``) rotates output
files by size/time on one node; at cluster scale the equivalent layout
step is a SEEDED GLOBAL PERMUTATION materialized as N shards with a
stable within-shard order. Instead of materializing a global rank
(which would need a global sort), each row gets a seeded md5 hash of
its key: the shard id is the hash's top 32 bits mod ``n_shards``
(uniform occupancy) and the within-shard order is the hash string
itself — exactly the restriction of the md5-order global permutation
to that shard, so concatenating shards in any interleaving yields a
stream with the permutation's mixing properties. Re-runs, retries, and
SQL oracles reproduce the identical layout bit-for-bit.

100 TB shape: shard/order assignment is a pure map-side projection
(zero shuffle, zero UDF, codegens); the writer adds exactly ONE
exchange — clustering rows by shard id — then sorts within partitions
and streams to a partitioned sink, so the whole layout pass is
scan -> project -> exchange -> sort -> write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 8


def shard_assign(
    df: DataFrame,
    n_shards: int,
    key_col: str = "doc_id",
    seed: str = "shard",
    shard_col: str = "shard_id",
    order_col: str = "shard_order",
) -> DataFrame:
    """Add ``shard_col`` (long in [0, n_shards)) and ``order_col`` (the
    seeded md5 hex string whose sort order IS the permutation) — pure
    map-side, deterministic in (seed, key). Change ``seed`` to draw an
    independent permutation (epoch reshuffles)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    for c in (shard_col, order_col):
        if c in df.columns:
            raise ValueError(f"shard_assign: input already has a {c!r} column")
    h = F.md5(F.concat_ws(":", F.lit(seed), F.col(key_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, _HEX_DIGITS), 16, 10).cast("long")
        % F.lit(n_shards)
    )
    return df.withColumn(order_col, h).withColumn(shard_col, shard)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_col: str = "doc_id",
    seed: str = "shard",
) -> None:
    """Materialize the shuffled layout: one ``shard_id=K`` directory per
    shard, rows inside each file in permutation order (``shard_order``
    then ``key_col`` as the tie-break for duplicate keys).

    The sortWithinPartitions leads with ``shard_id`` so the dynamic-
    partition writer sees its required clustering already satisfied and
    adds NO extra sort of its own — one exchange, one sort, total.
    """
    out = shard_assign(df, n_shards, key_col, seed)
    (
        out.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "shard_order", key_col)
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(path)
    )

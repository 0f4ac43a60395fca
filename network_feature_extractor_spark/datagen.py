"""Deterministic synthetic transcripts (the `turns` table).

Shape from BASELINE.json ``input_hint``:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp)``; distribution rules from FIXTURES.md §1 (Zipf-ish
conversation sizes with hot-conv skew, role alternation, heavy-tailed text
lengths, burst / normal / session-break time gaps, duplicate-ts tie-break
cases).

Generation is *distributed and partition-order independent*: each
conversation is produced by an RNG seeded purely from (seed, conv index),
inside ``mapInPandas`` over ``spark.range(n_convs)`` — so any executor
count yields byte-identical data. No driver-side materialization.

This replaces the reference's live packet source
(``ebpf/packet_capture.c``, ``src/core/packet_capture.py``) for tests and
benchmarks; in production the source is simply an Iceberg/parquet table
scan (see sources/tables.py).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

SNAPSHOTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("snap_ts", T.TimestampType(), False),
        T.StructField("f_a", T.DoubleType(), False),
        T.StructField("f_b", T.DoubleType(), False),
    ]
)

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(
    ["search", "python", "browser", "calculator", "sql", "shell", "editor", "api"]
)
_WORDS = np.array(
    "the quick brown fox jumps over lazy dog while spark shuffles "
    "partitions of tokenized transcript turns across executors".split()
)
BASE_EPOCH = 1_704_067_200.0  # 2024-01-01T00:00:00Z
HOT_EVERY = 500  # every 500th conversation is "hot" (skew driver)


def _gen_conv(rng: np.random.Generator, conv_idx: int) -> pd.DataFrame:
    hot = conv_idx % HOT_EVERY == 0 and conv_idx > 0
    if hot:
        n = int(rng.integers(1_000, 5_000))
    else:
        # Zipf-ish small conversations, 3..30 turns
        n = int(min(30, 3 + rng.zipf(1.6) % 28))

    # roles: user/assistant alternation with occasional system/tool and repeats
    roles = np.where(np.arange(n) % 2 == 0, "user", "assistant")
    flip = rng.random(n)
    roles = np.where(flip < 0.05, "system", roles)
    roles = np.where((flip >= 0.05) & (flip < 0.12), "tool", roles)
    # repeats: 8% of turns copy the previous role
    rep = rng.random(n) < 0.08
    for i in np.flatnonzero(rep):
        if i > 0:
            roles[i] = roles[i - 1]

    # text lengths: heavy tail (lognormal), clipped to [1, 4000]
    lens = np.clip(rng.lognormal(4.0, 1.2, size=n).astype(np.int64), 1, 4000)
    word_idx = rng.integers(0, len(_WORDS), size=n)
    texts = [
        (str(_WORDS[w]) + " ") * (1 + ln // (len(_WORDS[w]) + 1))
        for w, ln in zip(word_idx, lens)
    ]
    texts = [t[:ln] for t, ln in zip(texts, lens)]

    # tool: non-null on ~15% of assistant turns
    tool_draw = rng.random(n)
    tool_pick = TOOLS[rng.integers(0, len(TOOLS), size=n)]
    tools = np.where((roles == "assistant") & (tool_draw < 0.15), tool_pick, None)

    # gaps: mixture of bursts (<=0.1s), normal (0.1-60s), session breaks (>300s)
    kind = rng.random(n)
    gaps = np.where(
        kind < 0.35,
        rng.uniform(0.001, 0.1, size=n),
        np.where(
            kind < 0.92,
            rng.uniform(0.1, 60.0, size=n),
            rng.uniform(301.0, 3600.0, size=n),
        ),
    )
    gaps[0] = 0.0
    # exact-duplicate ts pairs (~3% of turns repeat the previous timestamp)
    dup = rng.random(n) < 0.03
    gaps = np.where(dup, 0.0, gaps)
    offs = np.cumsum(gaps)
    # microsecond grid so parquet round-trips losslessly
    start = BASE_EPOCH + float(rng.integers(0, 30 * 86400))
    ts = np.round((start + offs) * 1e6).astype("int64")

    return pd.DataFrame(
        {
            "conv_id": f"conv-{conv_idx:08d}",
            "turn_idx": np.arange(n, dtype=np.int32),
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": pd.to_datetime(ts, unit="us"),
        }
    )


def generate_turns(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic turns table with ~12 turns/conv average
    (plus hot conversations of 1k-5k turns every ``HOT_EVERY``)."""
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for conv_idx in batch["id"].to_numpy():
                rng = np.random.default_rng(seed * 1_000_003 + int(conv_idx))
                yield _gen_conv(rng, int(conv_idx))

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=TURNS_SCHEMA)
    )


def generate_snapshots(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Independent snapshot fixture for as-of join tests (FIXTURES.md §2).

    Includes: conversations with zero snapshots (every 7th), snapshots at
    timestamps before / between / exactly-equal-to turn timestamps
    (equal-ts = the leakage tie-break case), and dense snapshots for hot
    conversations.
    """
    parts = partitions or max(8, spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for conv_idx in batch["id"].to_numpy():
                conv_idx = int(conv_idx)
                if conv_idx % 7 == 3:  # zero-snapshot conversations
                    continue
                rng = np.random.default_rng(seed * 1_000_003 + conv_idx)
                turns = _gen_conv(rng, conv_idx)
                srng = np.random.default_rng(seed * 2_000_003 + conv_idx)
                hot = conv_idx % HOT_EVERY == 0 and conv_idx > 0
                k = int(srng.integers(20, 60)) if hot else int(srng.integers(1, 5))
                tmin = turns["ts"].iloc[0]
                tmax = turns["ts"].iloc[-1]
                span = max((tmax - tmin).total_seconds(), 1.0)
                snap_off = srng.uniform(-0.1 * span, 1.1 * span, size=k)
                snap_ts = tmin + pd.to_timedelta(
                    np.round(snap_off * 1e6), unit="us"
                )
                # force one snapshot exactly at a turn ts (strict-precedence case)
                if k >= 2 and len(turns) >= 2:
                    snap_ts = snap_ts.insert(0, turns["ts"].iloc[len(turns) // 2])
                    k += 1
                out.append(
                    pd.DataFrame(
                        {
                            "conv_id": f"conv-{conv_idx:08d}",
                            "snap_ts": snap_ts,
                            "f_a": np.round(srng.uniform(0, 100, size=k), 3),
                            "f_b": float(conv_idx) + np.arange(k, dtype=float) / 100.0,
                        }
                    )
                )
            if out:
                yield pd.concat(out, ignore_index=True)

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=SNAPSHOTS_SCHEMA)
    )

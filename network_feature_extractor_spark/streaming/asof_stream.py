"""Streaming point-in-time as-of attach (SURVEY.md §2.5 J1, streamed).

The batch engine attaches the latest *strictly earlier* snapshot to each
turn with a union + running-last window (operators/asof.py). The
streaming twin keeps that running "latest snapshot" as keyed state in
``applyInPandasWithState`` — the same shape as the reference's live
per-flow state reads (``src/core/flow_tracker.py:1515-1536``: every
update sees state built strictly from prior packets).

Input: ONE tagged stream per the batch union trick —

    conv_id, kind (0 = turn, 1 = snapshot), ts,
    turn_idx (turn rows), snap_value (snapshot rows)

Per micro-batch and key the rows are ordered by (ts, kind, snap_value)
— turns sort before snapshots at equal ts, so the strict no-leak
tie-break is positional, exactly like the batch plan — then the
snapshot column is forward-filled (vectorized, no per-row Python) with
the carried state as the seed. Snapshot state then advances to the
batch's latest snapshot.

Ordering caveat (inherent to streaming as-of, not this implementation):
rows are ordered within a micro-batch and state carries across batches
in processing order, so a snapshot arriving in a *later* batch than a
turn with a later event time will not be attached retroactively. Feed
the stream in per-key event-time order (e.g. time-ranged files, ordered
topics) for exact batch parity — property-tested in
tests/test_streaming.py on a drained availableNow stream.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TAGGED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("kind", T.IntegerType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("turn_idx", T.LongType(), True),
        T.StructField("snap_value", T.DoubleType(), True),
    ]
)

ASOF_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.LongType(), False),
        T.StructField("snap_value", T.DoubleType(), True),
        T.StructField("asof_ts", T.DoubleType(), True),
    ]
)

ASOF_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts", T.DoubleType(), True),
        T.StructField("last_val", T.DoubleType(), True),
    ]
)


def _epoch(s: pd.Series) -> pd.Series:
    # micros/1e6 — bit-identical to the engine's cast(timestamp as double)
    return s.astype("datetime64[us]").astype("int64") / 1e6


def _attach(
    key: Tuple[str], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    last_ts, last_val = state.get if state.exists else (None, None)

    frames = [pdf for pdf in pdfs if len(pdf)]
    if not frames:
        return
    pdf = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    pdf = pdf.assign(_ets=_epoch(pdf["ts"])).sort_values(
        ["_ets", "kind", "snap_value"], kind="mergesort"
    )

    # strict as-of by construction: turns (kind 0) precede snapshots at
    # equal ts, and ffill only looks backward
    filled_val = pdf["snap_value"].ffill()
    filled_ts = pdf["_ets"].where(pdf["kind"] == 1).ffill()
    if last_val is not None:
        filled_val = filled_val.fillna(last_val)
        filled_ts = filled_ts.fillna(last_ts)

    is_turn = (pdf["kind"] == 0).to_numpy()
    out = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": pdf["turn_idx"].to_numpy()[is_turn],
            "snap_value": filled_val.to_numpy()[is_turn],
            "asof_ts": filled_ts.to_numpy()[is_turn],
        }
    )

    snaps = pdf[pdf["kind"] == 1]
    if len(snaps):
        state.update((float(snaps["_ets"].iloc[-1]), float(snaps["snap_value"].iloc[-1])))
    yield out


def streaming_asof_attach(tagged_stream: DataFrame) -> DataFrame:
    """Attach the latest strictly-preceding snapshot value to each turn
    of a tagged (turns ∪ snapshots) stream; see module docstring."""
    return tagged_stream.groupBy("conv_id").applyInPandasWithState(
        _attach,
        outputStructType=ASOF_OUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tag_for_asof(turns: DataFrame, snaps: DataFrame, value_col: str) -> DataFrame:
    """Batch/stream-agnostic helper: union turns and snapshots into the
    tagged shape ``streaming_asof_attach`` consumes."""
    from pyspark.sql import functions as F

    t = turns.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.lit(0).alias("kind"),
        F.col("ts"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        F.lit(None).cast("double").alias("snap_value"),
    )
    s = snaps.select(
        F.col("conv_id").cast("string").alias("conv_id"),
        F.lit(1).alias("kind"),
        F.col("snap_ts").alias("ts"),
        F.lit(None).cast("long").alias("turn_idx"),
        F.col(value_col).cast("double").alias("snap_value"),
    )
    return t.unionByName(s)

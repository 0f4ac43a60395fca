"""Streaming exact dedup (§2.9 x training-data extension).

The batch engine's exact dedup (``operators/dedup.exact_dedup``) keeps
the min-id doc per text hash over the WHOLE corpus — on an unbounded
stream that state never expires. The streaming-native contract bounds
state by event time instead: ``dropDuplicatesWithinWatermark`` keeps the
FIRST arrival per content hash and drops any duplicate whose event time
lands within the watermark horizon — the same state-expiry shape as the
reference's flow-cache inactivity eviction (flow_tracker.py's timeout
sweep): per-key state lives while the key is "hot", then expires.

Duplicates farther apart than the horizon are NOT caught (state for the
first copy has expired) — that is the documented tradeoff; global
exactness on history is a batch backfill concern (run exact_dedup over
the accumulated table), the stream handles the within-horizon dedup that
keeps a training-data feed clean in flight.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    docs_stream: DataFrame,
    watermark: str = "10 minutes",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Drop within-watermark exact duplicates by content hash.

    State per distinct hash is one row, expired once the watermark
    passes its event time + horizon — bounded at any stream length by
    (arrival rate x horizon), not history. Null text hashes to a
    sentinel (same null-keeps-one contract as the batch operator: join
    keys drop nulls silently, so hash first)."""
    h = F.coalesce(F.md5(F.col(text_col)), F.lit("__null__"))
    return (
        docs_stream.withColumn("_h", h)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_h"])
        .drop("_h")
    )

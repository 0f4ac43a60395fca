"""Structured Streaming variant (SURVEY.md §2.9).

The reference is a continuous system: unbounded packet stream, keyed
state, inactivity timeouts (``src/core/flow_tracker.py:984-1036``). The
Spark-native equivalents:

- session aggregation: ``F.session_window(ts, gap)`` + watermark — the
  built-in exact analog of per-key inactivity expiry (W5). Used for the
  algebraic FlowStats-analog columns.
- custom stateful path: ``applyInPandasWithState`` with an event-time
  timeout for semantics session_window can't express (running
  transition counts emitted per turn).

Both read the same turns schema from any streaming source; tests drive
them with a file source over the deterministic generator output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.stats import stddev_pop_moments

DEFAULT_GAP = "300 seconds"
DEFAULT_WATERMARK = "10 minutes"


def streaming_session_features(
    turns_stream: DataFrame,
    gap: str = DEFAULT_GAP,
    watermark: str = DEFAULT_WATERMARK,
) -> DataFrame:
    """Per-(conv, session-window) algebraic features on a stream.

    Emits one row per closed session once the watermark passes the gap —
    the streaming twin of operators/aggregates.session_features (subset:
    the algebraic columns; distribution features are a batch concern).
    """
    ln = F.length("text").cast("double")
    return (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.session_window(F.col("ts"), gap).alias("sw"))
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.sum(ln).alias("total_text_len"),
            F.avg(ln).alias("len_mean"),
            stddev_pop_moments(ln).alias("len_std"),
            F.min(ln).alias("len_min"),
            F.max(ln).alias("len_max"),
            F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).cast("long").alias("cnt_user"),
            F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).cast("long").alias("cnt_assistant"),
        )
        .select(
            "conv_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_turns",
            "total_text_len",
            "len_mean",
            "len_std",
            "len_min",
            "len_max",
            "cnt_user",
            "cnt_assistant",
        )
    )


def file_stream_source(spark, path: str, schema) -> DataFrame:
    """Bounded-backpressure file source (ingest-queue analog S3):
    maxFilesPerTrigger caps per-batch intake like the reference's
    bounded packet queue."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "4")
        .parquet(path)
    )

"""Sessionization, bursts, active/idle (SURVEY.md §2.4 W3/W4/W5).

Reference semantics:
- W5 flow expiry: a flow closes after ``timeout`` seconds of inactivity
  (per-protocol 60-300 s, ``config/config.yaml:33-54``; sweep at
  ``src/core/flow_tracker.py:642-669``). Batch analog: a *session* starts
  whenever the gap to the previous turn exceeds the timeout.
- W3 bursts: consecutive packets with IAT <= 0.1 s form a burst
  (``src/feature_extraction/timing_metrics.py:448-494``).
- W4 active/idle: gaps above ``activity_timeout`` (1.0 s,
  ``src/feature_extraction/timing_metrics.py:101``) are idle time; spans
  between them are active periods.

All three are the gaps-and-islands primitive (functions/islands.py) at
three thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.islands import with_island_id
from ..functions.stats import epoch_seconds, stddev_pop_moments

SESSION_GAP_S = 300.0  # TCP-timeout analog, config/config.yaml:36
BURST_GAP_S = 0.1  # timing_metrics.py:105
ACTIVITY_TIMEOUT_S = 1.0  # timing_metrics.py:101


def with_session_id(
    df: DataFrame,
    key: str = "conv_id",
    ts_col: str = "ts",
    gap: float = SESSION_GAP_S,
    order_cols: list[str] | None = None,
    out: str = "session_id",
) -> DataFrame:
    return with_island_id(
        df,
        [key],
        ts_col,
        gap,
        out,
        order_cols=order_cols or [ts_col, "turn_idx"],
        gap_col="gap_prev",
    )


def burst_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    threshold: float = BURST_GAP_S,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per key: burst_count, mean/std/max/min burst duration (seconds).

    A burst = maximal run of rows whose gap to the previous row is
    <= threshold; single-row islands are bursts of duration 0.

    Deliberate deviation from the reference: ``_detect_bursts``
    (``src/feature_extraction/timing_metrics.py:448-494``) seeds every
    run with IAT index 0 regardless of its value, requires >= 2 IATs per
    burst, and measures duration between IAT *indices* (dropping the
    run's final packet) — index-arithmetic quirks of the scaffold code,
    not plausible intent. We implement the standard gaps-and-islands
    semantics (documented here so parity checks know to compare against
    the islands oracle in tests/test_sessionize.py, not the quirk).
    """
    d = with_island_id(
        df, key_cols, ts_col, threshold, "_burst_id", order_cols=order_cols
    )
    per_burst = d.groupBy(*key_cols, "_burst_id").agg(
        (F.max(epoch_seconds(ts_col)) - F.min(epoch_seconds(ts_col))).alias("burst_dur")
    )
    return per_burst.groupBy(*key_cols).agg(
        F.count("*").alias("burst_count"),
        F.avg("burst_dur").alias("burst_dur_mean"),
        stddev_pop_moments(F.col("burst_dur")).alias("burst_dur_std"),
        F.max("burst_dur").alias("burst_dur_max"),
        F.min("burst_dur").alias("burst_dur_min"),
    )


def active_idle_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    activity_timeout: float = ACTIVITY_TIMEOUT_S,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per key: active_periods, total_active_time, idle_periods,
    total_idle_time — FlowStats fields ``src/core/flow_tracker.py:236-240``.

    idle time = sum of gaps > timeout; active time = sum of island spans;
    idle_periods = islands - 1.
    """
    d = with_island_id(
        df,
        key_cols,
        ts_col,
        activity_timeout,
        "_act_id",
        order_cols=order_cols,
        gap_col="_gap",
    )
    per_island = d.groupBy(*key_cols, "_act_id").agg(
        (F.max(epoch_seconds(ts_col)) - F.min(epoch_seconds(ts_col))).alias("_span"),
        F.sum(F.when(F.col("_gap") > activity_timeout, F.col("_gap")).otherwise(0.0)).alias(
            "_idle_in"
        ),
    )
    return per_island.groupBy(*key_cols).agg(
        F.count("*").alias("active_periods"),
        F.sum("_span").alias("total_active_time"),
        (F.count("*") - F.lit(1)).cast("long").alias("idle_periods"),
        F.sum("_idle_in").alias("total_idle_time"),
    )


def active_idle_subflow_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    activity_timeout: float = ACTIVITY_TIMEOUT_S,
    order_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Fused W4 active/idle + subflow metrics: a subflow IS an activity
    island (same keys, same timeout — CICFlowMeter convention), so one
    island pass and one two-level aggregation yields both feature sets.
    Column-identical to joining ``active_idle_stats`` with the separate
    subflow aggregation (equivalence-tested in tests/test_sessionize.py);
    the registry uses this so the timing module costs two island passes
    (bursts at 0.1 s + this) instead of three."""
    d = with_island_id(
        df,
        key_cols,
        ts_col,
        activity_timeout,
        "_act_id",
        order_cols=order_cols,
        gap_col="_gap",
    )
    per_island = d.groupBy(*key_cols, "_act_id").agg(
        (F.max(epoch_seconds(ts_col)) - F.min(epoch_seconds(ts_col))).alias("_span"),
        F.sum(F.when(F.col("_gap") > activity_timeout, F.col("_gap")).otherwise(0.0)).alias(
            "_idle_in"
        ),
        F.count("*").alias("_t"),
        F.sum(
            F.col("text_len") if text_col == "text" and "text_len" in df.columns
            else F.length(text_col).cast("double")
        ).alias("_c"),
    )
    return per_island.groupBy(*key_cols).agg(
        F.count("*").alias("active_periods"),
        F.sum("_span").alias("total_active_time"),
        (F.count("*") - F.lit(1)).cast("long").alias("idle_periods"),
        F.sum("_idle_in").alias("total_idle_time"),
        F.count("*").cast("long").alias("subflow_count"),
        F.avg(F.col("_t").cast("double")).alias("subflow_turns_mean"),
        F.avg("_c").alias("subflow_chars_mean"),
    )

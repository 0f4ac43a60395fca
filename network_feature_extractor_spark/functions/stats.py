"""Shared statistical column expressions.

All formulas follow the reference's semantics (SURVEY.md §2.3):

- std is **population** form via moments: ``sqrt(E[x^2] - mean^2)``
  (reference finalize math, ``src/core/flow_tracker.py:552-589``). We
  compute it from explicit sum/sum-of-squares rather than
  ``F.stddev_pop`` so the algorithm is identical to the reference *and*
  to any ANSI-SQL oracle.
- rates clamp duration to >= 0.001 s
  (``src/feature_extraction/basic_metrics.py:410``).
- ratio denominators clamp to >= 1
  (``src/feature_extraction/basic_metrics.py:433-443``).
- entropy is Shannon ``-sum p*log2(p)`` over a discrete count
  distribution (``src/feature_extraction/basic_metrics.py:331-360``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stddev_pop_moments(x: Column) -> Column:
    """Population std via moments: sqrt(max(E[x²] − E[x]², 0)).

    Single-pass algebraic (map-side combinable), matches the reference's
    incremental sum/sum-of-squares accumulators exactly.
    """
    m2 = F.avg(x * x) - F.avg(x) * F.avg(x)
    return F.sqrt(F.greatest(m2, F.lit(0.0)))


def safe_div(num: Column, den: Column, floor: float = 1.0) -> Column:
    """num / max(den, floor) — the reference's division clamp."""
    return num / F.greatest(den, F.lit(floor))


def clamped_rate(total: Column, duration: Column) -> Column:
    """per-second rate with duration clamped >= 0.001 s."""
    return total / F.greatest(duration, F.lit(0.001))


def entropy_from_counts(cnt: Column, total: Column) -> Column:
    """Per-(key,value) term of Shannon entropy: -(c/t)*log2(c/t).

    Sum these per key to get the distribution entropy (A9). Zero counts
    never appear (groupBy only yields observed values).
    """
    p = cnt.cast("double") / total.cast("double")
    return -(p * F.log2(p))


def text_len_col(df) -> Column:
    """Turn-length expression: reuse a precomputed ``text_len`` column
    when the frame carries one (the materialized per-turn feature frame
    does — an 8-byte read instead of re-scanning the raw text column),
    else derive it from ``text``."""
    if "text_len" in df.columns:
        return F.col("text_len")
    return F.length("text").cast("double")


def epoch_seconds(c: Column | str) -> Column:
    """Epoch seconds (double) from TIMESTAMP or TIMESTAMP_NTZ.

    NTZ can't cast straight to double in Spark 4; routing through
    TIMESTAMP is exact because the engine pins the session timezone to
    UTC (session.py), so NTZ values are interpreted as UTC — matching
    DuckDB's epoch() on naive timestamps.
    """
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("timestamp").cast("double")

"""PySpark-native feature-engineering engine for multi-turn transcripts.

A from-scratch, Spark-first re-expression of the capabilities of the
reference flow-feature extractor (sandeepelayath/Network-Feature-Extractor,
surveyed in SURVEY.md): point-in-time as-of joins, gap-based sessionization,
lag/lead + rolling window features, per-session algebraic aggregation,
distribution-shaped features via Arrow UDFs, and large-scale training-data
operators (dedup, similarity search, text analysis).

Design principles (see SURVEY.md §4, §7):
- DataFrame/SQL first; Catalyst owns the physical plan.
- All keyed mutable state from the reference collapses into
  ``groupBy(...).agg(...)`` and ``Window.partitionBy(...).orderBy(...)``.
- Python only in vectorized Arrow batches (``pandas_udf`` /
  ``applyInPandas``), never row-at-a-time.
- Zero temporal leakage: every point-in-time attachment is strictly
  "latest-preceding" with a deterministic tie-break.
"""

__version__ = "0.1.0"

TURNS_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

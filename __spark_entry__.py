"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (sessionize -> per-turn
windowed features -> per-session FlowStats-analog snapshot -> strict
as-of join) over the sf0.001 events table mapped to the turns shape.
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 with DuckDB-checkable oracles (catalog in
network_feature_extractor_spark/plans/driver_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from network_feature_extractor_spark.plans.driver_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full per-turn feature
    pipeline with leak-free as-of snapshot attach, events-as-turns."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.config import EngineConfig
    from network_feature_extractor_spark.plans.pipeline import run_pipeline

    sf_dir = "/root/testdata/sf0.001"
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    # dense 0-based per-conversation index (the canonical turns shape and
    # the salted window path's blocking precondition) — NOT the global
    # event_id
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    turns = events.select(
        F.col("user_id").cast("string").alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.coalesce(F.col("props"), F.lit("")).alias("text"),
        F.when(F.col("event_type") == "purchase", F.lit("checkout")).alias("tool"),
        F.col("ts"),
    )
    cfg = EngineConfig(session_gap_s=1800.0, asof_hot_threshold=1000)
    # materialize the per-turn frame exactly like the production job: the
    # snapshot modules then re-read it column-pruned instead of replaying
    # the window DAG once per feature module
    import tempfile

    enriched, _snap = run_pipeline(
        turns, cfg, materialize_dir=tempfile.mkdtemp(prefix="entry_pt_")
    )
    return enriched.drop("text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-ANSI oracle per query (omitted for Arrow-UDF/streaming ops
    -> driver records a rows-only check for those)."""
    return dict(ORACLES)

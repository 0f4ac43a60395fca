"""Field-validation predicates (SURVEY.md §2.2 P5).

The reference range-checks every packet/flow field before processing
(``src/core/flow_tracker.py:1176-1215``, ``FlowKey.__post_init__``).
With a typed columnar schema most checks are structural, but the
semantic ones remain: non-negative dense turn_idx, known role values,
non-null timestamp, text present. Exposed as a single predicate column
so the caller chooses to filter, quarantine, or fail."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

VALID_ROLES = ("user", "assistant", "system", "tool")


def turn_validity(roles: tuple[str, ...] = VALID_ROLES) -> Column:
    return (
        F.col("conv_id").isNotNull()
        & (F.length("conv_id") > 0)
        & F.col("turn_idx").isNotNull()
        & (F.col("turn_idx") >= 0)
        & F.col("role").isin(*roles)
        & F.col("ts").isNotNull()
        & F.col("text").isNotNull()
    )


def split_valid(df: DataFrame, roles: tuple[str, ...] = VALID_ROLES) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantined) — the reference drops invalid packets and
    counts them (``flow_tracker.py:1216-1226``); we keep both sides so
    the quarantine is auditable."""
    v = turn_validity(roles)
    return df.filter(v), df.filter(~v)

"""Categorical-sequence features (SURVEY.md §2.3 A7, §2.4 W6-W8, W11).

The reference tracks TCP-flag counters and flag-sequence patterns
(``src/feature_extraction/flag_analysis.py``); the transcript analog is
role/tool values and their transitions:

- A7  per-value counts (fin/syn/... -> cnt_user, cnt_assistant, ...)
  and specific-combination counts (SYN-ACK -> user->assistant, ...).
- W6  ordered trigram pattern (3-way handshake -> user->assistant->tool).
- W7  abnormal bigrams (SYN->SYN -> user->user repeats, etc).
- W8  bigram statistics: distinct transition pairs, sequence complexity
  = distinct / min(n-1, 10) (``flag_analysis.py:510-542``), most-common
  bigram count (``:585-617``).
- W11 top-k via row_number.

Everything is lag() + conditional aggregation — no UDFs, fully
codegen'd, one shuffle shared with the other conv-ordered windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER = ["ts", "turn_idx"]


def with_prev_role(
    df: DataFrame, key: str | list[str] = "conv_id", role_col: str = "role"
) -> DataFrame:
    """Lagged role columns partitioned by the FULL key list: when called
    with (conv_id, session_id) the sequence resets at session boundaries,
    matching the reference's per-flow sequence extraction
    (``flag_analysis.py:_extract_flag_sequence`` — sequences never span
    flow expiry)."""
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(*ORDER)
    return df.withColumn("prev_role", F.lag(role_col).over(w)).withColumn(
        "prev2_role", F.lag(role_col, 2).over(w)
    )


def role_counts(
    df: DataFrame, key_cols: list[str], role_col: str = "role",
    roles: tuple[str, ...] = ("user", "assistant", "system", "tool"),
) -> DataFrame:
    """A7: one conditional-count column per role value (cnt_<role>)."""
    aggs = [
        F.sum(F.when(F.col(role_col) == r, 1).otherwise(0)).cast("long").alias(f"cnt_{r}")
        for r in roles
    ]
    return df.groupBy(*key_cols).agg(*aggs)


def transition_counts(
    df: DataFrame,
    key_cols: list[str],
    role_col: str = "role",
    pairs: tuple[tuple[str, str], ...] = (
        ("user", "assistant"),
        ("assistant", "user"),
        ("assistant", "tool"),
        ("tool", "assistant"),
        ("user", "user"),
        ("assistant", "assistant"),
    ),
) -> DataFrame:
    """A7/W7 exact-combination counts: trans_<a>_<b> per key.

    The (x,x) self-pairs are the reference's "abnormal sequence"
    detectors (SYN->SYN etc., ``flag_analysis.py:544-583``).
    """
    d = with_prev_role(df, key=key_cols, role_col=role_col)
    aggs = [
        F.sum(
            F.when((F.col("prev_role") == a) & (F.col(role_col) == b), 1).otherwise(0)
        ).cast("long").alias(f"trans_{a}_{b}")
        for a, b in pairs
    ]
    return d.groupBy(*key_cols).agg(*aggs)


def bigram_stats(
    df: DataFrame, key_cols: list[str], role_col: str = "role"
) -> DataFrame:
    """W8: distinct bigrams, sequence complexity, most-common-bigram count.

    complexity = distinct_bigrams / min(n_turns - 1, 10), 0 when n < 2
    (``flag_analysis.py:526-537`` normalization).
    """
    d = with_prev_role(df, key=key_cols, role_col=role_col).filter(
        F.col("prev_role").isNotNull()
    )
    per_pair = d.groupBy(
        *key_cols, F.col("prev_role").alias("a"), F.col(role_col).alias("b")
    ).agg(F.count("*").alias("pair_cnt"))
    stats = per_pair.groupBy(*key_cols).agg(
        F.count("*").cast("long").alias("distinct_bigrams"),
        F.max("pair_cnt").cast("long").alias("top_bigram_count"),
        F.sum("pair_cnt").cast("long").alias("n_bigrams"),
    )
    return stats.withColumn(
        "seq_complexity",
        F.col("distinct_bigrams")
        / F.least(F.col("n_bigrams").cast("double"), F.lit(10.0)),
    )


def top_bigram(df: DataFrame, key_cols: list[str], role_col: str = "role") -> DataFrame:
    """W11: the single most common (prev_role, role) pair per key, ties
    broken lexicographically (deterministic)."""
    d = with_prev_role(df, key=key_cols, role_col=role_col).filter(
        F.col("prev_role").isNotNull()
    )
    per_pair = d.groupBy(
        *key_cols, F.col("prev_role").alias("a"), F.col(role_col).alias("b")
    ).agg(F.count("*").alias("pair_cnt"))
    w = Window.partitionBy(*key_cols).orderBy(
        F.col("pair_cnt").desc(), F.col("a"), F.col("b")
    )
    return (
        per_pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(*key_cols, "a", "b", F.col("pair_cnt").alias("top_pair_cnt"))
    )


def with_pattern_flags(
    df: DataFrame,
    key: str = "conv_id",
    role_col: str = "role",
    trigram: tuple[str, str, str] = ("user", "assistant", "tool"),
) -> DataFrame:
    """W6 handshake analog: mark rows completing the trigram pattern
    prev2->prev->current == trigram."""
    d = with_prev_role(df, key=key, role_col=role_col)
    a, b, c = trigram
    return d.withColumn(
        "pattern_hit",
        (
            (F.col("prev2_role") == a)
            & (F.col("prev_role") == b)
            & (F.col(role_col) == c)
        ).cast("int"),
    )


def handshake_per_key(
    df: DataFrame,
    key_cols: list[str],
    role_col: str = "role",
    trigram: tuple[str, str, str] = ("user", "assistant", "tool"),
) -> DataFrame:
    """W6 aggregate: has_handshake (any trigram hit) + hit count per key."""
    d = with_pattern_flags(df, key=key_cols, role_col=role_col, trigram=trigram)
    return d.groupBy(*key_cols).agg(
        F.max("pattern_hit").cast("long").alias("has_handshake"),
        F.sum("pattern_hit").cast("long").alias("handshake_count"),
    )


def composite_sequence_flags(
    df: DataFrame,
    key_cols: list[str],
    role_col: str = "role",
    teardown_values: tuple[str, str] = ("tool", "assistant"),
    abnormal_self: tuple[str, ...] = ("user",),
    abnormal_pairs: tuple[tuple[str, str], ...] = (("assistant", "user"),),
) -> DataFrame:
    """W7 composite per-key flags, reference semantics:

    - ``has_teardown`` (``flag_analysis.py:476-508``): sequence length
      >= 4 AND >= 2 occurrences of each ``teardown_values`` member
      (FIN-ACK / ACK analog — whole-sequence value counts, not adjacency).
    - ``has_abnormal`` / ``abnormal_count`` (``flag_analysis.py:544-583``):
      adjacent positions where the value repeats itself for any
      ``abnormal_self`` member (SYN->SYN, FIN->FIN analogs) or matches an
      ``abnormal_pairs`` combination (SYN-ACK->RST analog); requires a
      sequence of >= 2 (no pairs otherwise, naturally 0).

    Same single window partition as the other sequence features — shares
    their exchange; everything else is conditional aggregation.
    """
    d = with_prev_role(df, key=key_cols, role_col=role_col)
    ta, tb = teardown_values
    abnormal_hit = F.lit(False)
    for v in abnormal_self:
        abnormal_hit = abnormal_hit | (
            (F.col("prev_role") == v) & (F.col(role_col) == v)
        )
    for a, b in abnormal_pairs:
        abnormal_hit = abnormal_hit | (
            (F.col("prev_role") == a) & (F.col(role_col) == b)
        )
    g = d.groupBy(*key_cols).agg(
        F.count("*").alias("_n"),
        F.sum(F.when(F.col(role_col) == ta, 1).otherwise(0)).alias("_cnt_ta"),
        F.sum(F.when(F.col(role_col) == tb, 1).otherwise(0)).alias("_cnt_tb"),
        F.sum(F.when(abnormal_hit, 1).otherwise(0)).cast("long").alias("abnormal_count"),
    )
    return g.select(
        *key_cols,
        (
            (F.col("_n") >= 4) & (F.col("_cnt_ta") >= 2) & (F.col("_cnt_tb") >= 2)
        ).cast("long").alias("has_teardown"),
        (F.col("abnormal_count") > 0).cast("long").alias("has_abnormal"),
        "abnormal_count",
    )


def fused_sequence_features(
    df: DataFrame,
    key_cols: list[str],
    role_col: str = "role",
    tool_col: str = "tool",
    roles: tuple[str, ...] = ("user", "assistant", "system", "tool"),
    pairs: tuple[tuple[str, str], ...] = (
        ("user", "assistant"),
        ("assistant", "user"),
        ("assistant", "tool"),
        ("tool", "assistant"),
        ("user", "user"),
        ("assistant", "assistant"),
    ),
    trigram: tuple[str, str, str] = ("user", "assistant", "tool"),
    teardown_values: tuple[str, str] = ("tool", "assistant"),
    abnormal_self: tuple[str, ...] = ("user",),
    abnormal_pairs: tuple[tuple[str, str], ...] = (("assistant", "user"),),
) -> DataFrame:
    """All single-pass sequence aggregates — transition_counts +
    handshake_per_key + composite_sequence_flags + contains_vs_exact_counts
    — in ONE lagged window and ONE groupBy. Column-identical to joining
    the four operators (property-tested in tests/test_transitions.py);
    the registry uses this so the transition module costs one exchange
    instead of four. bigram_stats/top_bigram stay separate (they need a
    two-level per-pair aggregation)."""
    d = with_prev_role(df, key=key_cols, role_col=role_col)
    cur, prev, prev2 = F.col(role_col), F.col("prev_role"), F.col("prev2_role")

    ta, tb = teardown_values
    abnormal_hit = F.lit(False)
    for v in abnormal_self:
        abnormal_hit = abnormal_hit | ((prev == v) & (cur == v))
    for a, b in abnormal_pairs:
        abnormal_hit = abnormal_hit | ((prev == a) & (cur == b))
    ga, gb, gc = trigram
    pattern_hit = ((prev2 == ga) & (prev == gb) & (cur == gc)).cast("int")
    has_tool = F.col(tool_col).isNotNull()

    aggs = [
        # transition_counts
        *[
            F.sum(F.when((prev == a) & (cur == b), 1).otherwise(0))
            .cast("long")
            .alias(f"trans_{a}_{b}")
            for a, b in pairs
        ],
        # handshake_per_key
        F.max(pattern_hit).cast("long").alias("has_handshake"),
        F.sum(pattern_hit).cast("long").alias("handshake_count"),
        # composite_sequence_flags
        F.count("*").alias("_n"),
        F.sum(F.when(cur == ta, 1).otherwise(0)).alias("_cnt_ta"),
        F.sum(F.when(cur == tb, 1).otherwise(0)).alias("_cnt_tb"),
        F.sum(F.when(abnormal_hit, 1).otherwise(0)).cast("long").alias("abnormal_count"),
        # contains_vs_exact_counts
        F.sum(F.when(has_tool, 1).otherwise(0)).cast("long").alias("cnt_contains_toolcall"),
    ]
    for r in roles:
        aggs.append(
            F.sum(F.when(cur == r, 1).otherwise(0)).cast("long").alias(f"cnt_contains_{r}")
        )
        aggs.append(
            F.sum(F.when((cur == r) & has_tool, 1).otherwise(0))
            .cast("long")
            .alias(f"cnt_exact_{r}_tool")
        )
    g = d.groupBy(*key_cols).agg(*aggs)
    return g.select(
        *key_cols,
        *[f"trans_{a}_{b}" for a, b in pairs],
        "has_handshake",
        "handshake_count",
        (
            (F.col("_n") >= 4) & (F.col("_cnt_ta") >= 2) & (F.col("_cnt_tb") >= 2)
        ).cast("long").alias("has_teardown"),
        (F.col("abnormal_count") > 0).cast("long").alias("has_abnormal"),
        "abnormal_count",
        "cnt_contains_toolcall",
        *[c for r in roles for c in (f"cnt_contains_{r}", f"cnt_exact_{r}_tool")],
    )


def contains_vs_exact_counts(
    df: DataFrame,
    key_cols: list[str],
    role_col: str = "role",
    tool_col: str = "tool",
    roles: tuple[str, ...] = ("user", "assistant", "system", "tool"),
) -> DataFrame:
    """A7 "contains-bit" vs exact-combination counts
    (``flag_analysis.py:641-656``: packets *containing* each flag bit vs
    exact flag-combination counts). Transcript analog: turns mentioning a
    tool at all (any role), per-role totals, and the exact
    (role, has_tool) combination counts."""
    has_tool = F.col(tool_col).isNotNull()
    aggs = [
        F.sum(F.when(has_tool, 1).otherwise(0)).cast("long").alias("cnt_contains_toolcall"),
    ]
    for r in roles:
        aggs.append(
            F.sum(F.when(F.col(role_col) == r, 1).otherwise(0))
            .cast("long")
            .alias(f"cnt_contains_{r}")
        )
        aggs.append(
            F.sum(F.when((F.col(role_col) == r) & has_tool, 1).otherwise(0))
            .cast("long")
            .alias(f"cnt_exact_{r}_tool")
        )
    return df.groupBy(*key_cols).agg(*aggs)

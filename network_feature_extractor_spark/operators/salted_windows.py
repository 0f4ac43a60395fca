"""Skew-salted per-turn windowed features (SURVEY.md §4.2 applied to the
window pipeline, not just the as-of join).

A conversation's per-turn features (plans/pipeline.py:per_turn_features)
are computed in ONE window partition — a 10^8-turn hot conversation
serializes that WindowExec task and can exceed its memory. This module
computes the identical feature set with bounded tasks:

- hot conversations (row count > ``hot_threshold``) are split into
  fixed-size blocks by ``floor(turn_idx / block_rows)`` (turn_idx is
  dense per conversation — input_hint — so blocks are balanced and need
  no pre-window row numbering);
- each block gets the last ``G = max(rolling_k-1, 2)`` rows of its
  predecessor injected as *ghost rows*: exact local context for lag /
  rolling / prev-role expressions;
- running quantities that ghosts can't cover (session splits, role
  counts to date, last_tool, per-role last-ts) are carried via a tiny
  block-level cumulative pass (one row per occupied block) and added as
  offsets / coalesce fallbacks;
- the cold long tail takes the direct single-window path, and when no
  key is hot the whole function short-circuits to it.

Correctness requires ts non-decreasing in turn_idx within a conversation
(the canonical transcript ordering); equivalence with the direct path is
property-tested in tests/test_salted_windows.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..functions.stats import epoch_seconds


def per_turn_features_salted(
    turns: DataFrame,
    cfg: EngineConfig | None = None,
    hot_threshold: int = 5_000_000,
    block_rows: int = 250_000,
) -> DataFrame:
    from ..plans.pipeline import per_turn_features

    cfg = cfg or EngineConfig()
    G = max(cfg.rolling_k - 1, 2)
    if block_rows <= G:
        raise ValueError(
            f"block_rows ({block_rows}) must exceed the ghost span G={G} "
            f"(rolling_k={cfg.rolling_k}) or blocks lose their local context"
        )
    # the block path requires turn_idx to be DENSE per conversation
    # (blocking and ghost selection are index arithmetic); the same count
    # probe validates it, and a hot-but-non-dense conversation falls back
    # to the direct single-window path — correct, just not salted.
    counts = turns.groupBy("conv_id").agg(
        F.count("*").alias("_n"),
        F.min("turn_idx").alias("_min_tix"),
        F.max("turn_idx").alias("_max_tix"),
    )
    hot_keys = counts.filter(
        (F.col("_n") > hot_threshold)
        & (F.col("_max_tix") - F.col("_min_tix") + 1 == F.col("_n"))
    ).select("conv_id", "_min_tix")
    if hot_keys.limit(1).count() == 0:
        return per_turn_features(turns, cfg)
    hot_b = F.broadcast(hot_keys)

    cold = per_turn_features(
        turns.join(hot_b.select("conv_id"), "conv_id", "left_anti"), cfg
    )
    # inner join attaches _min_tix so blocking is offset-normalized
    hot = _hot_path(turns.join(hot_b, "conv_id"), cfg, block_rows)
    return cold.unionByName(hot)


def _hot_path(h: DataFrame, cfg: EngineConfig, block_rows: int) -> DataFrame:
    k = cfg.rolling_k
    G = max(k - 1, 2)
    roles = cfg.enabled_roles

    tix = F.col("turn_idx") - F.col("_min_tix")  # dense 0-based block index
    h = h.withColumn("_blk", F.floor(tix / block_rows))
    ghosts = (
        h.filter((tix % block_rows) >= block_rows - G)
        .withColumn("_blk", F.col("_blk") + 1)
        .withColumn("_ghost", F.lit(1))
    )
    real = h.withColumn("_ghost", F.lit(0))
    u = real.unionByName(ghosts)

    w = Window.partitionBy("conv_id", "_blk").orderBy("ts", "turn_idx")
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    roll = w.rowsBetween(-(k - 1), 0)

    tsd = epoch_seconds("ts")
    ln = F.length("text").cast("double")
    is_real = F.col("_ghost") == 0
    gap = F.coalesce(tsd - F.lag(tsd).over(w), F.lit(0.0))
    m1 = F.avg(ln).over(roll)
    m2 = F.avg(ln * ln).over(roll)

    last_same_role = None
    for r in roles:
        cand = F.max(F.when(F.col("role") == r, tsd)).over(prev)
        this = F.when(F.col("role") == r, cand)
        last_same_role = this if last_same_role is None else F.coalesce(last_same_role, this)

    # pass 1: within-block expressions (ghosts provide exact local context)
    p1 = u.select(
        "*",
        gap.alias("gap_prev"),
        gap.alias("iat"),
        last_same_role.alias("_role_ts_in"),
        m1.alias("rt_len_mean"),
        F.sqrt(F.greatest(m2 - m1 * m1, F.lit(0.0))).alias("rt_len_std"),
        F.min(ln).over(roll).alias("rt_len_min"),
        F.max(ln).over(roll).alias("rt_len_max"),
        F.last("tool", ignorenulls=True).over(cum).alias("_tool_in"),
        F.lag("role").over(w).alias("prev_role"),
        F.lag("role", 2).over(w).alias("prev2_role"),
        # running quantities over REAL rows only (ghosts are duplicates of
        # rows already counted in the carry)
        *[
            F.sum(F.when(is_real & (F.col("role") == r), 1).otherwise(0))
            .over(cum)
            .cast("long")
            .alias(f"_cnt_{r}_in")
            for r in roles
        ],
    ).withColumn(
        "_splits_in",
        F.sum(F.when(is_real & (F.col("gap_prev") > cfg.session_gap_s), 1).otherwise(0))
        .over(cum)
        .cast("long"),
    )
    p1 = p1.filter(is_real).drop("_ghost")

    # block-level carry: per (conv, block) totals of the running
    # quantities, then cumulative over STRICTLY PRIOR blocks.
    #
    # r8: per-block split totals used to be re-derived from pass 1
    # (groupBy(max(_splits_in)) over the p1 branch) — which re-executed
    # the ENTIRE wide window pass (15+ window expressions over rows that
    # carry the text payload) a second time just to count split flags.
    # Instead: a NARROW lag window over (conv, block) counts the
    # in-block splits (rows 2..n see the same predecessor as in p1,
    # since ghosts sort strictly before all real rows), and the
    # block-BOUNDARY split (p1's first real row vs the last ghost ==
    # the previous block's final row) is resolved in the tiny
    # block-level frame from first/last epoch per block. Equivalence is
    # covered by the salted == direct property tests.
    ordkey_tool = F.when(
        F.col("tool").isNotNull(),
        F.struct(F.col("ts"), F.col("turn_idx"), F.col("tool").alias("v")),
    )
    tsd_b = epoch_seconds("ts")
    wnb = Window.partitionBy("conv_id", "_blk").orderBy("ts", "turn_idx")
    nb = h.select(
        "conv_id",
        "_blk",
        "role",
        "tool",
        "ts",
        "turn_idx",
        F.when(
            tsd_b - F.lag(tsd_b).over(wnb) > cfg.session_gap_s, 1
        ).otherwise(0).alias("_splitflag"),
    )
    blockagg = nb.groupBy("conv_id", "_blk").agg(
        *[
            F.sum(F.when(F.col("role") == r, 1).otherwise(0)).cast("long").alias(f"_b_cnt_{r}")
            for r in roles
        ],
        F.max(ordkey_tool).getField("v").alias("_b_tool"),
        *[
            F.max(F.when(F.col("role") == r, tsd_b)).alias(f"_b_ts_{r}")
            for r in roles
        ],
        F.sum("_splitflag").cast("long").alias("_b_splits_in"),
        F.min(tsd_b).alias("_b_first_ets"),
        F.max(tsd_b).alias("_b_last_ets"),
    )
    wseq = Window.partitionBy("conv_id").orderBy("_blk")
    blockagg = blockagg.select(
        "*",
        (
            F.col("_b_splits_in")
            + F.when(
                F.col("_b_first_ets") - F.lag("_b_last_ets").over(wseq)
                > cfg.session_gap_s,
                1,
            ).otherwise(0)
        ).cast("long").alias("_b_splits"),
    )

    wb = Window.partitionBy("conv_id").orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = blockagg.select(
        "conv_id",
        "_blk",
        F.coalesce(F.sum("_b_splits").over(wb), F.lit(0)).cast("long").alias("_c_splits"),
        *[
            F.coalesce(F.sum(f"_b_cnt_{r}").over(wb), F.lit(0))
            .cast("long")
            .alias(f"_c_cnt_{r}")
            for r in roles
        ],
        F.last("_b_tool", ignorenulls=True).over(wb).alias("_c_tool"),
        *[F.max(f"_b_ts_{r}").over(wb).alias(f"_c_ts_{r}") for r in roles],
    )

    j = p1.join(carry, ["conv_id", "_blk"], "left")

    # stitch: offsets for running sums, coalesce for ffill-style carries
    role_carry_ts = None
    for r in roles:
        this = F.when(F.col("role") == r, F.col(f"_c_ts_{r}"))
        role_carry_ts = this if role_carry_ts is None else F.coalesce(role_carry_ts, this)

    out = (
        j.withColumn(
            "session_id",
            (F.col("_splits_in") + F.coalesce(F.col("_c_splits"), F.lit(0))).cast("long"),
        )
        .withColumn(
            "iat_role",
            F.coalesce(
                epoch_seconds("ts") - F.coalesce(F.col("_role_ts_in"), role_carry_ts),
                F.lit(0.0),
            ),
        )
        .withColumn("last_tool", F.coalesce(F.col("_tool_in"), F.col("_c_tool")))
        .withColumn(
            "pattern_hit",
            (
                (F.col("prev2_role") == "user")
                & (F.col("prev_role") == "assistant")
                & (F.col("role") == "tool")
            ).cast("int"),
        )
    )
    for r in roles:
        out = out.withColumn(
            f"cnt_{r}_todate",
            (F.col(f"_cnt_{r}_in") + F.coalesce(F.col(f"_c_cnt_{r}"), F.lit(0))).cast("long"),
        )
    drop = (
        ["_blk", "_min_tix", "_role_ts_in", "_tool_in", "_splits_in", "_c_splits", "_c_tool"]
        + [f"_cnt_{r}_in" for r in roles]
        + [f"_c_cnt_{r}" for r in roles]
        + [f"_c_ts_{r}" for r in roles]
    )
    return out.drop(*drop)

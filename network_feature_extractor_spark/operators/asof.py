"""Point-in-time as-of join (SURVEY.md §2.5 J1) — the engine's core.

Semantics (from the reference's temporal discipline: every packet update
reads flow state built strictly from *prior* packets,
``src/core/flow_tracker.py:1515-1536``): attach to each left row the
latest right row whose timestamp is strictly earlier (``strict=True``) or
earlier-or-equal (``strict=False``). Strict mode is the zero-temporal-
leakage guarantee: a snapshot taken at exactly a turn's timestamp is NOT
visible to that turn.

Spark has no native ASOF JOIN. We build it as a **sort-merge as-of in one
shuffle** via the union trick:

    union(left tagged k_l, right tagged k_r)
      -> Window.partitionBy(key).orderBy(ts, kind, seq)
      -> last(right_cols, ignorenulls=True) over unbounded-preceding
      -> filter back to left rows

The tag ordering encodes strictness: strict => left rows sort *before*
right rows at equal ts, so the running ``last()`` cannot see an equal-ts
snapshot. This compiles to a single Exchange(hashpartition(key)) + Sort +
WindowExec — exactly the "sort-merge as-of join over range-partitioned
(conv_id, ts) sorted partitions" the north rule asks for, with zero
per-row Python.

Skew: a window partition is one conv_id; a pathologically hot
conversation (10^8 turns at 10^12 scale) serializes on one task. AQE
splits skewed *joins* but not window partitions, so ``asof_join_salted``
breaks hot conversations into time blocks: per-block carry-in state is
precomputed by a tiny block-level cumulative window, then each block
windows independently under partition key (conv_id, block). Equivalence
with the direct path is property-tested (tests/test_asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.stats import epoch_seconds


def _right_fill_states(
    right_tagged: DataFrame,
    key: str,
    value_cols: list[str],
    extra_part_cols: list[str] | None = None,
) -> DataFrame:
    """Fold tagged right-side rows into per-row *fill states*.

    Input columns: ``key`` (+ ``extra_part_cols``), ``_ets``, ``_k``,
    ``_ats`` (attach timestamp carried by the row) and ``value_cols``.
    Output: one row per (key[, extra], _ets, _k) carrying a single
    ``_state`` struct = the per-column last-non-null fold of every right
    row up to and including that position (window order ``_ets, _k,
    struct(value_cols)`` — the engine's equal-ts tie-break convention).

    Why: the big union window downstream then needs ONE running
    ``last(_state)`` instead of one running last per value column, and
    left rows carry a single nullable struct slot through the exchange
    instead of |value_cols| fixed-width null slots (guide §2.3 "shuffle
    fewer bytes" + §8 "decide with small rows"). Per-column semantics
    are preserved exactly: state(R).c == last non-null c over rights
    <= R, so last(_state).c at any left row equals the old per-column
    ``last(c, ignorenulls)`` — including nulls before any non-null.
    """
    parts = [key, *(extra_part_cols or [])]
    ord_struct = F.struct(*[F.col(c) for c in value_cols])
    rw = (
        Window.partitionBy(*parts)
        .orderBy("_ets", "_k", ord_struct)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    folded = right_tagged.select(
        *parts,
        "_ets",
        "_k",
        ord_struct.alias("_ord"),
        F.struct(
            F.last("_ats", ignorenulls=True).over(rw).alias("_ts"),
            *[
                F.last(c, ignorenulls=True).over(rw).alias(c)
                for c in value_cols
            ],
        ).alias("_st"),
    )
    # one state per (key, ts, tag): the max-_ord row is LAST in window
    # order among equal-ts rows, so its state folds all of them. The
    # groupBy reuses the fold window's HashPartitioning(key) — no new
    # exchange (subset rule).
    return folded.groupBy(*parts, "_ets", "_k").agg(
        F.max(F.struct(F.col("_ord"), F.col("_st"))).getField("_st").alias("_state")
    )


# minimum value-column count for the folded-state form: the fold adds
# two small stages (right-side window + reduce), worthwhile only when it
# removes several running lasts + several per-row null slots from the
# big union exchange. Measured crossover (sf1.0, 32 cores): 1-2 columns
# lose ~0.3-0.9 s to the extra stages; the 40-column pipeline attach
# gains multiples of that.
_FOLD_MIN_COLS = 4


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "snap_ts",
    value_cols: list[str] | None = None,
    strict: bool = True,
    attach_ts_as: str = "asof_ts",
    fold_states: bool | None = None,
) -> DataFrame:
    """Attach the latest-preceding right-row values to each left row.

    Left rows with no preceding right row get nulls (leading-null case).
    Right values come back under their own names; the matched snapshot
    timestamp (epoch seconds, double) under ``attach_ts_as``.

    Two physical forms, same results (differentially tested):

    - per-column (``fold_states=False``): the classic union window with
      one running ``last(c, ignorenulls)`` per value column — fewest
      stages, right for narrow attaches (1-3 columns).
    - folded (``fold_states=True``, r8): the right side is first folded
      into per-row fill states (`_right_fill_states` — a window +
      groupBy over the SMALL side only), then the big union window runs
      ONE ``last(_state)``, its sort key is plain ``(_ets, _k)`` with no
      |value_cols|-field struct comparator, and left rows carry a single
      nullable struct slot through the big exchange instead of one
      fixed-width null slot per value column (~8 B x |value_cols| x
      |left| shuffle+sort bytes saved — the pipeline's 40-column attach
      saves ~320 B/row). Per-column ``LAST_VALUE(c IGNORE NULLS)``
      semantics (the oracle form) are preserved exactly.

    ``fold_states=None`` picks the folded form iff len(value_cols) >=
    ``_FOLD_MIN_COLS``.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value columns collide with left columns: {overlap}")
    if fold_states is None:
        fold_states = len(value_cols) >= _FOLD_MIN_COLS

    lk, rk = (0, 1) if strict else (1, 0)

    if not fold_states:
        l_tag = (
            left.withColumn("_k", F.lit(lk))
            .withColumn("_ets", epoch_seconds(left_ts))
            .withColumn(attach_ts_as, F.lit(None).cast("double"))
        )
        r_tag = (
            right.withColumnRenamed(right_ts, "_rts")
            .withColumn("_k", F.lit(rk))
            .withColumn("_ets", epoch_seconds(F.col("_rts")))
            .withColumn(attach_ts_as, epoch_seconds(F.col("_rts")))
            .drop("_rts")
        )
        u = l_tag.unionByName(r_tag, allowMissingColumns=True)

        # tie-break equal-ts right rows deterministically by their values
        # (matches the struct-max convention of the salted path)
        w = (
            Window.partitionBy(key)
            .orderBy("_ets", "_k", F.struct(*[F.col(c) for c in value_cols]))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = u.select(
            "*",
            *[
                F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
                for c in value_cols
            ],
            F.last(attach_ts_as, ignorenulls=True).over(w).alias("_f_ts"),
        )
        return filled.filter(F.col("_k") == lk).select(
            *[c for c in left.columns],
            *[F.col(f"_f_{c}").alias(c) for c in value_cols],
            F.col("_f_ts").alias(attach_ts_as),
        )

    l_tag = (
        left.withColumn("_k", F.lit(lk))
        .withColumn("_ets", epoch_seconds(left_ts))
    )
    r_tag = right.select(
        key,
        epoch_seconds(F.col(right_ts)).alias("_ets"),
        F.lit(rk).alias("_k"),
        epoch_seconds(F.col(right_ts)).alias("_ats"),
        *[F.col(c) for c in value_cols],
    )
    r_states = _right_fill_states(r_tag, key, value_cols)
    u = l_tag.unionByName(r_states, allowMissingColumns=True)

    w = (
        Window.partitionBy(key)
        .orderBy("_ets", "_k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*", F.last("_state", ignorenulls=True).over(w).alias("_f")
    )
    left_only = filled.filter(F.col("_k") == lk)
    out = left_only.select(
        *[c for c in left.columns],
        *[F.col(f"_f.{c}").alias(c) for c in value_cols],
        F.col("_f._ts").alias(attach_ts_as),
    )
    return out


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    key: str = "conv_id",
    left_ts: str = "ts",
    right_ts: str = "snap_ts",
    value_cols: list[str] | None = None,
    strict: bool = True,
    attach_ts_as: str = "asof_ts",
    block_seconds: float = 3600.0,
    hot_threshold: int = 100_000,
    fold_states: bool | None = None,
) -> DataFrame:
    """Skew-resistant as-of join: hot conversations are windowed per
    (conv_id, time-block) with precomputed carry-in state; the cold long
    tail takes the direct single-window path.

    The carry-in pass works on *block-level* rows (<= rows/block_seconds
    per conv), so its window partition is tiny even for a 10^8-turn
    conversation; the per-block windows are bounded by block occupancy.

    ``fold_states``: physical-form selector, see ``asof_join`` — the
    same per-column vs folded-state choice applied to both the cold
    path and the per-(conv, block) hot windows.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    if fold_states is None:
        fold_states = len(value_cols) >= _FOLD_MIN_COLS

    counts = left.groupBy(key).agg(F.count("*").alias("_n"))
    hot_keys = counts.filter(F.col("_n") > hot_threshold).select(key)
    # cheap eager probe (column-pruned scan + partial agg): when nothing
    # is hot — the common case — skip the split entirely instead of
    # paying the anti/semi double-scan of the wide left side (measured
    # 2x overhead on 13M rows with zero hot keys).
    if hot_keys.limit(1).count() == 0:
        return asof_join(
            left, right, key, left_ts, right_ts, value_cols, strict,
            attach_ts_as, fold_states=fold_states,
        )
    # hot set is by construction small (few convs can exceed the threshold);
    # broadcast it so the hot/cold split is a map-side semi/anti join.
    hot_b = F.broadcast(hot_keys)

    cold_left = left.join(hot_b, key, "left_anti")
    cold_right = right.join(hot_b, key, "left_anti")
    cold_out = asof_join(
        cold_left, cold_right, key, left_ts, right_ts, value_cols, strict,
        attach_ts_as, fold_states=fold_states,
    )

    hot_left = left.join(hot_b, key, "left_semi")
    hot_right = right.join(hot_b, key, "left_semi")

    blk = lambda ts: F.floor(epoch_seconds(ts) / F.lit(block_seconds))  # noqa: E731

    # 1. per-(conv, block) final snapshot state from right rows
    r = hot_right.withColumn("_blk", blk(right_ts)).withColumn(
        "_rts", epoch_seconds(right_ts)
    )
    ordkey = F.struct(
        F.col("_rts").alias("t"), *[F.col(c).alias(c) for c in value_cols]
    )
    per_block = r.groupBy(key, "_blk").agg(F.max(ordkey).alias("_fin"))

    # 2. carry-in per block (tiny window: one row per occupied block per
    #    hot conv). Carry state must reach every left block — including
    #    blocks with no right rows at all — so it is attached with a
    #    block-level as-of: the cumulative final state of the latest
    #    right-block strictly before each left block.
    cum = (
        Window.partitionBy(key)
        .orderBy("_blk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    block_state = per_block.select(
        key, "_blk", F.last("_fin", ignorenulls=True).over(cum).alias("_state")
    )

    left_blocks = hot_left.withColumn("_blk", blk(left_ts)).select(key, "_blk").distinct()
    # latest right-block strictly before each left block -> carry-in
    lb = left_blocks.withColumn("_k", F.lit(0))
    rb = block_state.withColumn("_k", F.lit(1))
    ub = lb.unionByName(rb, allowMissingColumns=True)
    wub = (
        Window.partitionBy(key)
        .orderBy("_blk", "_k")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = (
        ub.select(
            key, "_blk", "_k", F.last("_state", ignorenulls=True).over(wub).alias("_carry")
        )
        .filter((F.col("_k") == 0) & F.col("_carry").isNotNull())
        .select(key, "_blk", "_carry")
    )

    # 3. per-(conv, block) as-of. Folded form (r8): fold [carry-in
    #    pseudo snapshot, in-block snapshots] into per-row fill states
    #    (tiny frames), then union with left rows and run ONE running
    #    last(_state) per (conv, block) — same shape as the direct
    #    path's folded form: the big exchange carries one nullable
    #    struct slot instead of |value_cols| null slots per left row,
    #    and the big sort key is (_ets, _k) without the value-struct
    #    comparator. Per-column form: the classic union window with one
    #    running last per value column.
    lk, rk = (0, 1) if strict else (1, 0)
    l_tag = (
        hot_left.withColumn("_blk", blk(left_ts))
        .withColumn("_k", F.lit(lk))
        .withColumn("_ets", epoch_seconds(left_ts))
    )
    if not fold_states:
        l_tag = l_tag.withColumn(attach_ts_as, F.lit(None).cast("double"))
        r_tag = (
            r.withColumn("_k", F.lit(rk))
            .withColumn("_ets", F.col("_rts"))
            .withColumn(attach_ts_as, F.col("_rts"))
            .drop("_rts")
            .drop(right_ts)
        )
        c_tag = carry_in.select(
            key,
            "_blk",
            F.lit(-1).alias("_k"),  # carry-in sorts before everything
            (F.col("_blk") * F.lit(block_seconds)).alias("_ets"),
            F.col("_carry.t").alias(attach_ts_as),
            *[F.col(f"_carry.{c}").alias(c) for c in value_cols],
        )
        u = l_tag.unionByName(r_tag, allowMissingColumns=True).unionByName(
            c_tag, allowMissingColumns=True
        )
        w = (
            Window.partitionBy(key, "_blk")
            .orderBy("_ets", "_k", F.struct(*[F.col(c) for c in value_cols]))
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = u.select(
            "*",
            *[
                F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
                for c in value_cols
            ],
            F.last(attach_ts_as, ignorenulls=True).over(w).alias("_f_ts"),
        )
        hot_out = filled.filter(F.col("_k") == lk).select(
            *[c for c in left.columns],
            *[F.col(f"_f_{c}").alias(c) for c in value_cols],
            F.col("_f_ts").alias(attach_ts_as),
        )
        return cold_out.unionByName(hot_out)

    r_tag = r.select(
        key,
        "_blk",
        F.col("_rts").alias("_ets"),
        F.lit(rk).alias("_k"),
        F.col("_rts").alias("_ats"),
        *[F.col(c) for c in value_cols],
    )
    c_tag = carry_in.select(
        key,
        "_blk",
        (F.col("_blk") * F.lit(block_seconds)).alias("_ets"),
        F.lit(-1).alias("_k"),  # carry-in sorts before everything in the block
        F.col("_carry.t").alias("_ats"),
        *[F.col(f"_carry.{c}").alias(c) for c in value_cols],
    )
    states = _right_fill_states(
        c_tag.unionByName(r_tag), key, value_cols, extra_part_cols=["_blk"]
    )
    u = l_tag.unionByName(states, allowMissingColumns=True)
    w = (
        Window.partitionBy(key, "_blk")
        .orderBy("_ets", "_k")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*", F.last("_state", ignorenulls=True).over(w).alias("_f")
    )
    hot_out = filled.filter(F.col("_k") == lk).select(
        *[c for c in left.columns],
        *[F.col(f"_f.{c}").alias(c) for c in value_cols],
        F.col("_f._ts").alias(attach_ts_as),
    )
    return cold_out.unionByName(hot_out)


def tolerance_gate(
    joined: DataFrame,
    left_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: float = 3600.0,
    attach_ts_as: str = "asof_ts",
    flag_col: str | None = "asof_stale",
) -> DataFrame:
    """Max-staleness (TTL) gate over an as-of join's OUTPUT — the
    feature-store ttl convention: a snapshot older than ``tolerance_s``
    at the left row's timestamp is treated as expired and its attached
    values nulled out, exactly as if no snapshot preceded the row.

    Reference analog: the flow tracker expires per-flow state after an
    activity timeout (``src/core/flow_tracker.py:404-432,642-648`` —
    ``is_expired(current_time, timeout)``); a turn arriving after the
    timeout must not see the stale state.

    Works on the output of BOTH ``asof_join`` and ``asof_join_salted``
    (they emit the same columns), as a pure map-side projection — zero
    extra shuffle, whole-stage-codegens into the window's output stage.

    Cross-engine exactness: the left epoch and ``attach_ts_as`` are both
    micros/1e6 doubles, so the staleness ``(l - r) > tolerance_s`` is an
    exact-rounded IEEE subtraction + compare — bit-identical on any
    engine, no rounding guard needed.

    ``flag_col`` (optional) emits TRUE where a snapshot matched but had
    expired — distinguishing "expired" from "never had a snapshot"
    (flag FALSE, values null in both cases after the gate).
    """
    if value_cols is None:
        raise ValueError("tolerance_gate needs the as-of value_cols list")
    if tolerance_s < 0:
        raise ValueError(f"tolerance_s must be >= 0, got {tolerance_s}")
    if flag_col and flag_col in joined.columns:
        # r7 ADVICE: an input already carrying the flag column would
        # yield a duplicate output column (the '_tbound' precedent)
        raise ValueError(
            f"tolerance_gate: input already has a {flag_col!r} column; "
            "pass a different flag_col (or None)"
        )
    stale = F.col(attach_ts_as).isNotNull() & (
        (epoch_seconds(left_ts) - F.col(attach_ts_as)) > F.lit(float(tolerance_s))
    )
    out = joined.select(
        *[
            c
            for c in joined.columns
            if c not in value_cols and c != attach_ts_as
        ],
        *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in value_cols],
        F.when(stale, F.lit(None)).otherwise(F.col(attach_ts_as)).alias(attach_ts_as),
        *([stale.alias(flag_col)] if flag_col else []),
    )
    return out

"""Sequence/transition operator semantics, incl. the session-boundary
reset rule (sequences never span a session split, matching the
reference's per-flow extraction) and the W7 composite flags."""

from datetime import datetime, timedelta

import pytest

from network_feature_extractor_spark.operators import transitions


def _turns(spark, rows):
    """rows: (conv_id, session_id, turn_idx, role[, tool])"""
    base = datetime(2024, 1, 1)
    data = [
        (
            r[0],
            r[1],
            r[2],
            r[3],
            r[4] if len(r) > 4 else None,
            base + timedelta(seconds=r[2]),
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data,
        "conv_id string, session_id long, turn_idx int, role string, "
        "tool string, ts timestamp",
    )


def test_bigrams_reset_at_session_boundary(spark):
    # conv c0: session 0 ends on 'user', session 1 starts with 'assistant'
    # -> the (user, assistant) pair across the boundary must NOT count.
    d = _turns(
        spark,
        [
            ("c0", 0, 0, "user"),
            ("c0", 0, 1, "user"),
            ("c0", 1, 2, "assistant"),
            ("c0", 1, 3, "user"),
        ],
    )
    tc = (
        transitions.transition_counts(d, ["conv_id", "session_id"])
        .toPandas()
        .set_index("session_id")
    )
    assert tc.loc[0, "trans_user_user"] == 1
    assert tc.loc[0, "trans_user_assistant"] == 0  # boundary pair excluded
    assert tc.loc[1, "trans_user_assistant"] == 0
    assert tc.loc[1, "trans_assistant_user"] == 1

    bg = (
        transitions.bigram_stats(d, ["conv_id", "session_id"])
        .toPandas()
        .set_index("session_id")
    )
    # n_bigrams = n_turns - 1 per session (the documented denominator)
    assert bg.loc[0, "n_bigrams"] == 1
    assert bg.loc[1, "n_bigrams"] == 1


def test_composite_teardown_flag(spark):
    # >=4 turns, >=2 tool, >=2 assistant -> teardown
    d = _turns(
        spark,
        [
            ("c0", 0, i, r)
            for i, r in enumerate(["user", "tool", "assistant", "tool", "assistant"])
        ]
        + [("c1", 0, i, r) for i, r in enumerate(["user", "tool", "assistant"])]  # too short
        + [
            ("c2", 0, i, r)
            for i, r in enumerate(["user", "tool", "assistant", "user", "assistant"])
        ],  # only one tool
    )
    out = (
        transitions.composite_sequence_flags(d, ["conv_id", "session_id"])
        .toPandas()
        .set_index("conv_id")
    )
    assert out.loc["c0", "has_teardown"] == 1
    assert out.loc["c1", "has_teardown"] == 0
    assert out.loc["c2", "has_teardown"] == 0


def test_composite_abnormal_flag_and_count(spark):
    d = _turns(
        spark,
        [
            # user->user twice (abnormal_self), assistant->user once (pair)
            ("c0", 0, 0, "user"),
            ("c0", 0, 1, "user"),
            ("c0", 0, 2, "user"),
            ("c0", 0, 3, "assistant"),
            ("c0", 0, 4, "user"),
            # clean conversation
            ("c1", 0, 0, "user"),
            ("c1", 0, 1, "assistant"),
            ("c1", 0, 2, "tool"),
        ],
    )
    out = (
        transitions.composite_sequence_flags(
            d,
            ["conv_id", "session_id"],
            abnormal_self=("user",),
            abnormal_pairs=(("assistant", "user"),),
        )
        .toPandas()
        .set_index("conv_id")
    )
    assert out.loc["c0", "abnormal_count"] == 3
    assert out.loc["c0", "has_abnormal"] == 1
    assert out.loc["c1", "abnormal_count"] == 0
    assert out.loc["c1", "has_abnormal"] == 0


def test_abnormal_resets_at_session_boundary(spark):
    # user | user split across sessions -> not a self-repeat
    d = _turns(
        spark,
        [
            ("c0", 0, 0, "user"),
            ("c0", 1, 1, "user"),
        ],
    )
    out = transitions.composite_sequence_flags(
        d, ["conv_id", "session_id"], abnormal_self=("user",), abnormal_pairs=()
    ).toPandas()
    assert (out["abnormal_count"] == 0).all()


def test_contains_vs_exact_counts(spark):
    d = _turns(
        spark,
        [
            ("c0", 0, 0, "user", None),
            ("c0", 0, 1, "assistant", "search"),
            ("c0", 0, 2, "assistant", None),
            ("c0", 0, 3, "tool", "search"),
        ],
    )
    out = (
        transitions.contains_vs_exact_counts(d, ["conv_id"])
        .toPandas()
        .iloc[0]
    )
    assert out["cnt_contains_toolcall"] == 2  # any role mentioning a tool
    assert out["cnt_contains_assistant"] == 2
    assert out["cnt_exact_assistant_tool"] == 1  # exact (assistant, tool) combo
    assert out["cnt_exact_user_tool"] == 0
    assert out["cnt_exact_tool_tool"] == 1


@pytest.mark.parametrize("op", ["transition_counts", "bigram_stats", "top_bigram"])
def test_single_key_callers_unchanged(spark, op):
    # string key (legacy single-key call) still works
    d = _turns(spark, [("c0", 0, 0, "user"), ("c0", 0, 1, "assistant")])
    fn = getattr(transitions, op)
    out = fn(d, ["conv_id"]).toPandas()
    assert len(out) == 1


def test_fused_sequence_features_equals_individual_ops(spark):
    rows = []
    roles = ["user", "assistant", "tool", "user", "user", "assistant",
             "system", "assistant", "tool", "assistant"]
    for c in range(6):
        for s in range(2):
            for i, r in enumerate(roles[: 4 + c]):
                rows.append((f"c{c}", s, s * 100 + i, r,
                             "search" if (i + c) % 3 == 0 else None))
    d = _turns(spark, rows)
    key = ["conv_id", "session_id"]
    fused = transitions.fused_sequence_features(d, key).toPandas()
    joined = (
        transitions.transition_counts(d, key)
        .join(transitions.handshake_per_key(d, key), key)
        .join(transitions.composite_sequence_flags(d, key), key)
        .join(transitions.contains_vs_exact_counts(d, key), key)
        .toPandas()
    )
    assert set(fused.columns) == set(joined.columns)
    f = fused.sort_values(key).reset_index(drop=True)
    j = joined.sort_values(key).reset_index(drop=True)[fused.columns]
    for c in fused.columns:
        assert (f[c] == j[c]).all(), c

"""Equivalence of the skew-salted per-turn window path with the direct
single-window path — every feature column, tiny blocks so many boundary
cases are exercised."""

import numpy as np
import pandas as pd

from network_feature_extractor_spark.config import EngineConfig
from network_feature_extractor_spark.operators.salted_windows import (
    per_turn_features_salted,
)
from network_feature_extractor_spark.plans.pipeline import per_turn_features

CFG = EngineConfig()

FEATURES = (
    ["gap_prev", "iat", "iat_role", "rt_len_mean", "rt_len_std", "rt_len_min",
     "rt_len_max", "session_id", "pattern_hit"]
    + [f"cnt_{r}_todate" for r in CFG.enabled_roles]
)


def _sorted(df, cols):
    return (
        df.select("conv_id", "turn_idx", *cols)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"], kind="mergesort")
        .reset_index(drop=True)
    )


def _compare(direct, salted):
    assert len(direct) == len(salted)
    for c in FEATURES + ["last_tool", "prev_role", "prev2_role"]:
        g, e = salted[c], direct[c]
        if g.dtype == object:
            assert (g.fillna("<na>") == e.fillna("<na>")).all(), c
        else:
            assert np.allclose(
                g.astype(float), e.astype(float), rtol=1e-9, atol=1e-9, equal_nan=True
            ), c


def test_salted_windows_equal_direct(spark, turns):
    direct = _sorted(per_turn_features(turns, CFG), FEATURES + ["last_tool", "prev_role", "prev2_role"])
    salted = _sorted(
        per_turn_features_salted(turns, CFG, hot_threshold=10, block_rows=7),
        FEATURES + ["last_tool", "prev_role", "prev2_role"],
    )
    _compare(direct, salted)


def test_salted_windows_shortcircuit(spark, turns):
    """No hot keys -> identical plan to the direct path (no extra work)."""
    out = per_turn_features_salted(turns, CFG, hot_threshold=10**9)
    assert out.count() == turns.count()


def test_salted_rejects_block_rows_below_ghost_span(spark, turns):
    import pytest

    with pytest.raises(ValueError, match="ghost span"):
        per_turn_features_salted(turns, CFG, hot_threshold=10, block_rows=4)


def _seq_conv(spark, conv_id, idxs, gap_s=5):
    from datetime import datetime, timedelta

    from network_feature_extractor_spark.datagen import TURNS_SCHEMA

    t0 = datetime(2024, 1, 1)
    rows = [
        (conv_id, ix, ["user", "assistant"][k % 2], "x" * (k % 9 + 1),
         "search" if k % 7 == 0 else None, t0 + timedelta(seconds=k * gap_s))
        for k, ix in enumerate(idxs)
    ]
    return spark.createDataFrame(rows, schema=TURNS_SCHEMA)


def test_salted_non_dense_hot_conv_falls_back_correctly(spark):
    """A hot conversation whose turn_idx is NOT dense (e.g. a global event
    id) must not take the block path — results still match direct."""
    sparse = _seq_conv(spark, "c", [i * 13 + 2 for i in range(30)])
    cols = FEATURES + ["last_tool", "prev_role", "prev2_role"]
    direct = _sorted(per_turn_features(sparse, CFG), cols)
    salted = _sorted(
        per_turn_features_salted(sparse, CFG, hot_threshold=5, block_rows=7), cols
    )
    _compare(direct, salted)


def test_salted_dense_nonzero_min_is_block_pathed(spark):
    """Dense but offset turn_idx (min > 0) is valid for the block path
    (offset-normalized blocking)."""
    shifted = _seq_conv(spark, "c", list(range(100, 140)))
    cols = FEATURES + ["last_tool", "prev_role", "prev2_role"]
    direct = _sorted(per_turn_features(shifted, CFG), cols)
    salted = _sorted(
        per_turn_features_salted(shifted, CFG, hot_threshold=5, block_rows=10), cols
    )
    _compare(direct, salted)


def test_salted_windows_block_boundary_sessions(spark):
    """Session split exactly at a block boundary must carry correctly."""
    from datetime import datetime, timedelta

    from network_feature_extractor_spark.datagen import TURNS_SCHEMA

    t0 = datetime(2024, 1, 1)
    rows = []
    ts = t0
    for i in range(40):
        # big gap every 10 turns -> session split; block_rows=10 aligns
        # splits with block boundaries (the nasty case)
        ts = ts + timedelta(seconds=400 if i % 10 == 0 and i else 5)
        rows.append(("c", i, ["user", "assistant"][i % 2], "x" * (i % 9 + 1),
                     "search" if i % 7 == 0 else None, ts))
    turns = spark.createDataFrame(rows, schema=TURNS_SCHEMA)
    direct = _sorted(per_turn_features(turns, CFG), FEATURES + ["last_tool", "prev_role", "prev2_role"])
    salted = _sorted(
        per_turn_features_salted(turns, CFG, hot_threshold=5, block_rows=10),
        FEATURES + ["last_tool", "prev_role", "prev2_role"],
    )
    _compare(direct, salted)
    assert direct["session_id"].max() == 3

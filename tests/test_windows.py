import numpy as np
import pandas as pd

from network_feature_extractor_spark.operators import windows
from network_feature_extractor_spark.operators.sessionize import with_session_id

from oracle_pandas import per_turn_oracle


def _sorted(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)


def test_iat_and_session_match_pandas_oracle(spark, turns, turns_pd):
    d = with_session_id(turns)
    d = windows.with_iat(d)
    d = windows.with_role_iat(d)
    got = _sorted(
        d.select("conv_id", "turn_idx", "iat", "iat_role", "session_id").toPandas()
    )
    exp = _sorted(per_turn_oracle(turns_pd))
    assert np.allclose(got["iat"], exp["iat"], rtol=1e-9, atol=1e-6)
    assert np.allclose(got["iat_role"], exp["iat_role"], rtol=1e-9, atol=1e-6)
    assert (got["session_id"].to_numpy() == exp["session_id"].to_numpy()).all()


def test_rolling_text_len_matches_pandas(spark, turns, turns_pd):
    got = _sorted(
        windows.with_rolling_text_len(turns, k=5)
        .select("conv_id", "turn_idx", "rt_len_mean", "rt_len_std", "rt_len_min", "rt_len_max")
        .toPandas()
    )
    exp = _sorted(per_turn_oracle(turns_pd))
    for c in ["rt_len_mean", "rt_len_std", "rt_len_min", "rt_len_max"]:
        assert np.allclose(got[c], exp[c], rtol=1e-9, atol=1e-9), c


def test_ffill_matches_pandas(spark, turns, turns_pd):
    got = _sorted(
        windows.with_ffill(turns, "tool", out="last_tool")
        .select("conv_id", "turn_idx", "last_tool")
        .toPandas()
    )
    exp = _sorted(per_turn_oracle(turns_pd))
    ge = got["last_tool"].fillna("<na>")
    ee = pd.Series(exp["last_tool"]).fillna("<na>")
    assert (ge.to_numpy() == ee.to_numpy()).all()


def test_bfill_micro(spark, micro_turns):
    got = (
        windows.with_bfill(micro_turns, "tool", out="next_tool")
        .orderBy("turn_idx")
        .toPandas()
    )
    assert list(got["next_tool"]) == ["search", "search", None]


def test_first_per_role_micro(spark, micro_turns):
    got = windows.first_per_role(micro_turns, "turn_idx").toPandas()
    got = got.set_index("role")["first_turn_idx"]
    assert got["user"] == 0.0
    assert got["assistant"] == 1.0


def test_lead_gap_micro(spark, micro_turns):
    got = windows.with_lead_gap(micro_turns).orderBy("turn_idx").toPandas()
    assert np.allclose(got["gap_next"].iloc[:2], [0.1, 0.1])
    assert pd.isna(got["gap_next"].iloc[2])


def test_turn_validity_split(spark, turns):
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.functions.validate import split_valid

    valid, bad = split_valid(turns)
    assert bad.count() == 0 and valid.count() == turns.count()
    # corrupt some rows -> they land in quarantine
    corrupted = turns.withColumn(
        "role", F.when(F.col("turn_idx") == 0, F.lit("alien")).otherwise(F.col("role"))
    )
    v2, b2 = split_valid(corrupted)
    assert b2.count() > 0
    assert v2.count() + b2.count() == turns.count()

import numpy as np

from network_feature_extractor_spark.operators import aggregates
from network_feature_extractor_spark.operators.sessionize import with_session_id

from oracle_pandas import session_features_oracle

ORACLE_COLS = [
    "start_time", "end_time", "duration", "n_turns", "total_text_len",
    "fwd_turns", "bwd_turns", "fwd_text_len", "bwd_text_len",
    "fwd_len_min", "fwd_len_max", "fwd_len_mean", "fwd_len_std",
    "bwd_len_min", "bwd_len_max", "bwd_len_mean", "bwd_len_std",
    "iat_min", "iat_max", "iat_mean", "iat_std",
    "turns_per_sec", "chars_per_sec", "avg_turn_len", "down_up_ratio",
    "len_dispersion", "len_cov",
]


def test_session_features_match_pandas_oracle(spark, turns, turns_pd):
    d = with_session_id(turns)
    got = (
        aggregates.session_features(d)
        .toPandas()
        .sort_values(["conv_id", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        session_features_oracle(turns_pd)
        .sort_values(["conv_id", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["conv_id"].to_numpy() == exp["conv_id"].to_numpy()).all()
    for c in ORACLE_COLS:
        assert np.allclose(
            got[c].astype(float), exp[c].astype(float), rtol=1e-7, atol=1e-5
        ), f"mismatch in {c}"


def test_micro_session_features_hand_computed(spark, micro_turns):
    """FIXTURES.md canonical micro-fixture: lens 64/64/52, ts 0/.1/.2."""
    d = with_session_id(micro_turns)
    row = aggregates.session_features(d).toPandas().iloc[0]
    assert row["n_turns"] == 3
    assert row["total_text_len"] == 180.0
    assert abs(row["duration"] - 0.2) < 1e-6
    assert row["fwd_turns"] == 2 and row["bwd_turns"] == 1
    assert row["fwd_text_len"] == 116.0 and row["bwd_text_len"] == 64.0
    # fwd lens {64,52}: mean 58, pop std 6
    assert abs(row["fwd_len_mean"] - 58.0) < 1e-9
    assert abs(row["fwd_len_std"] - 6.0) < 1e-9
    # iat: [0.1, 0.1] -> mean .1 std 0
    assert abs(row["iat_mean"] - 0.1) < 1e-6
    assert row["iat_std"] < 1e-6
    # init lens per direction
    assert row["init_fwd_len"] == 64.0 and row["init_bwd_len"] == 64.0
    # rates: 3 turns / 0.2 s
    assert abs(row["turns_per_sec"] - 15.0) < 1e-4
    # gate: n<10 -> ratios 0
    assert row["down_up_ratio"] == 0.0


def test_length_entropy_uniform_vs_constant(spark, micro_turns):
    # all three lengths in one bucket (width big) -> entropy 0
    ent = aggregates.length_entropy(
        with_session_id(micro_turns), ["conv_id"], bucket_width=4000.0
    ).toPandas()
    assert abs(ent["len_entropy"].iloc[0]) < 1e-12
    # width 10: buckets {6:2 (64,64), 5:1 (52)} -> H = -(2/3 log2 2/3 + 1/3 log2 1/3)
    ent2 = aggregates.length_entropy(
        with_session_id(micro_turns), ["conv_id"], bucket_width=10.0
    ).toPandas()
    expect = -(2 / 3 * np.log2(2 / 3) + 1 / 3 * np.log2(1 / 3))
    assert abs(ent2["len_entropy"].iloc[0] - expect) < 1e-9


def test_approx_distinct_and_quantiles_error_bounds(spark, turns):
    """Sketch-tier twins stay within their advertised error of the
    exact operators: HLL++ distinct within ~3*rsd, percentile_approx
    within a few rank positions of the exact numpy-parity quantile."""
    import numpy as np
    from pyspark.sql import functions as F

    from network_feature_extractor_spark.operators.aggregates import (
        approx_distinct_and_quantiles,
    )

    got = (
        approx_distinct_and_quantiles(turns, ["conv_id"], rsd=0.02)
        .toPandas()
        .set_index("conv_id")
    )
    exact = (
        turns.groupBy("conv_id")
        .agg(F.countDistinct("tool").alias("d"))
        .toPandas()
        .set_index("conv_id")["d"]
    )
    pdf = turns.select("conv_id", F.length("text").cast("double").alias("l")).toPandas()
    for conv, row in got.iterrows():
        e = exact[conv]
        assert abs(row[f"approx_distinct_tool"] - e) <= max(1, 0.06 * e), conv
        lens = np.sort(pdf[pdf["conv_id"] == conv]["l"].to_numpy())
        qs = row["approx_len_quantiles"]
        for lvl, q in zip((0.1, 0.25, 0.5, 0.75, 0.9), qs):
            # rank-error contract: the returned value sits within a few
            # positions of the exact order statistic
            target = lens[min(int(lvl * (len(lens) - 1) + 0.5), len(lens) - 1)]
            lo = lens[max(0, int(lvl * len(lens)) - 3)]
            hi = lens[min(len(lens) - 1, int(lvl * len(lens)) + 3)]
            assert lo - 1e-9 <= q <= hi + 1e-9, (conv, lvl, q, target)


def test_decayed_features_matches_numpy(spark, turns, turns_pd):
    """Independent numpy derivation of the half-life decayed aggregates:
    per conv, weight = 2^(-(max_us - us)/hl_us); decayed_count = sum(w),
    decayed_len = sum(len(text) * w)."""
    from pyspark.sql import functions as F

    HL = 120.0
    d = turns.select(
        "conv_id", "ts", F.length("text").cast("double").alias("tlen")
    )
    got = (
        aggregates.decayed_features(
            d, key="conv_id", ts="ts", value_col="tlen", half_life_s=HL
        )
        .toPandas()
        .set_index("conv_id")
        .sort_index()
    )
    pdf = turns_pd.copy()
    pdf["us"] = pdf["ts"].astype("int64") // 1000
    pdf["tlen"] = pdf["text"].str.len().astype(float)
    for conv, g in pdf.groupby("conv_id"):
        w = 2.0 ** (-(g["us"].max() - g["us"].to_numpy()) / (HL * 1e6))
        row = got.loc[conv]
        assert row["n_events"] == len(g)
        assert np.isclose(row["decayed_count"], w.sum(), rtol=1e-9), conv
        assert np.isclose(
            row["decayed_tlen"], (g["tlen"].to_numpy() * w).sum(), rtol=1e-9
        ), conv
    # non-vacuity: decay must actually bite (weights spread below 1)
    assert (got["decayed_count"] < got["n_events"] - 0.5).any()

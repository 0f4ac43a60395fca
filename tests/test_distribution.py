import numpy as np

from network_feature_extractor_spark.operators import distribution
from network_feature_extractor_spark.operators.sessionize import with_session_id


def test_distribution_features_match_numpy(spark, turns, turns_pd):
    d = with_session_id(turns)
    got = (
        distribution.distribution_features(d, key_cols=["conv_id", "session_id"])
        .toPandas()
        .sort_values(["conv_id", "session_id"], kind="mergesort")
        .reset_index(drop=True)
    )
    # recompute sessions + stats in pure numpy
    from oracle_pandas import per_turn_oracle

    pt = per_turn_oracle(turns_pd)
    t = turns_pd.merge(pt[["conv_id", "turn_idx", "session_id"]], on=["conv_id", "turn_idx"])
    for (conv_id, sid), g in t.groupby(["conv_id", "session_id"], sort=True):
        g = g.sort_values(["ts", "turn_idx"], kind="mergesort")
        lens = g["text"].str.len().to_numpy(dtype=float)
        r = got[(got["conv_id"] == conv_id) & (got["session_id"] == sid)].iloc[0]
        qs = np.percentile(lens, [10, 25, 50, 75, 90])
        assert abs(r["len_q50"] - qs[2]) < 1e-9, (conv_id, sid)
        assert abs(r["len_iqr"] - (qs[3] - qs[1])) < 1e-9
        hist, _ = np.histogram(lens, bins=10, range=(0, 4000))
        hp = hist / max(hist.sum(), 1)
        assert abs(r["len_hist_0"] - hp[0]) < 1e-12
        # skew/kurt conventions
        if lens.size >= 3 and lens.std() > 0:
            m, s = lens.mean(), np.sqrt(((lens - lens.mean()) ** 2).mean())
            sk = np.mean(((lens - m) / s) ** 3)
            assert abs(r["len_skew"] - sk) < 1e-7
        if lens.size >= 4 and lens.std() > 0:
            m, s = lens.mean(), np.sqrt(((lens - lens.mean()) ** 2).mean())
            kr = np.mean(((lens - m) / s) ** 4)  # RAW, no -3 (A11)
            assert abs(r["len_kurt_raw"] - kr) < 1e-7


def test_kurtosis_convention_split(spark, micro_turns):
    """Packet-length kurtosis raw, IAT kurtosis excess — A11."""
    d = with_session_id(micro_turns)
    r = distribution.distribution_features(d).toPandas().iloc[0]
    # n=3 < 4 -> kurtosis gated to 0 (reference gates small groups)
    assert r["len_kurt_raw"] == 0.0
    # skew at n=3 is computed: lens 64/64/52
    lens = np.array([64.0, 64.0, 52.0])
    m = lens.mean()
    s = np.sqrt(((lens - m) ** 2).mean())
    assert abs(r["len_skew"] - np.mean(((lens - m) / s) ** 3)) < 1e-9
    # 2 IATs -> kurtosis gated to 0
    assert r["iat_kurt_excess"] == 0.0


def test_fft_gating(spark, turns):
    """FFT features default-off -> zeros; enabled -> gated on >=20 points."""
    d = with_session_id(turns)
    off = distribution.distribution_features(d, fft_enabled=False).toPandas()
    assert (off["fft_periodicity"] == 0).all()

    # dense single-session conversation (30 turns, 1s apart) -> FFT fires
    from datetime import datetime, timedelta

    from network_feature_extractor_spark.datagen import TURNS_SCHEMA

    t0 = datetime(2024, 1, 1)
    rows = [
        ("dense", i, "user" if i % 2 == 0 else "assistant", "x" * (10 + i % 7),
         None, t0 + timedelta(seconds=i))
        for i in range(30)
    ]
    dense = with_session_id(spark.createDataFrame(rows, schema=TURNS_SCHEMA))
    on = distribution.distribution_features(dense, fft_enabled=True).toPandas()
    assert (on["fft_periodicity"] > 0).any()
